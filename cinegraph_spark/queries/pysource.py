"""Query over the S1 paginated-listing Python Data Source
(`sources/listing.py`) — the reference's scraper pagination loop
(`scraping/scraper.py:34-73`) as partition-parallel input splits, with the
P3 title/year parse (default 1800, `scraping/scraper.py:75-88`) applied
downstream. The oracle reproduces the deterministic listing closed-form
with generate_series, so the custom data source's partition planning, row
synthesis, AND the parse are all value-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.queries import register

_PAGES = 10
_PER_PAGE = 50


@register(
    "src_paginated_listing_decades",
    f"""
    WITH items AS (SELECT i FROM generate_series(0, {_PAGES * _PER_PAGE - 1}) t(i)),
    titles AS (
      SELECT CASE WHEN i % 7 = 3 THEN 'Untitled Project ' || i
                  ELSE 'Movie ' || i || ' (' || (1900 + (i * 37) % 126) || ')'
             END AS raw_title
      FROM items
    ),
    parsed AS (
      SELECT CASE WHEN regexp_extract(raw_title, '\\((\\d{{4}})\\)$', 1) = ''
                  THEN 1800
                  ELSE CAST(regexp_extract(raw_title, '\\((\\d{{4}})\\)$', 1) AS INT)
             END AS year
      FROM titles
    )
    SELECT CAST(year - year % 10 AS BIGINT) AS decade,
           count(*) AS n_titles,
           CAST(sum(CASE WHEN year = 1800 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_year
    FROM parsed GROUP BY 1
    """,
    tags=("source", "python-datasource", "s1", "p3"),
)
def src_paginated_listing_decades(spark, sf_dir):
    """S1 through the Spark 4 Python Data Source API: the paginated listing
    reads as one input split per page (the scraper's serial page loop,
    parallelized), then the P3 parse ('Title (year)', default 1800 when the
    year is missing) and a per-decade rollup run as ordinary JVM column
    work. `sf_dir` is unused — this source synthesizes its rows, which is
    exactly what lets the oracle check the custom reader end-to-end."""
    from cinegraph_spark.session import ensure_shipped
    from cinegraph_spark.sources.listing import read_listing

    ensure_shipped(spark)  # executors import the DataSource class
    lst = read_listing(spark, pages=_PAGES, per_page=_PER_PAGE)
    ys = F.regexp_extract("raw_title", r"\((\d{4})\)$", 1)
    year = F.coalesce(F.nullif(ys, F.lit("")).cast("int"), F.lit(1800))
    parsed = lst.select(year.alias("year"))
    return parsed.groupBy(
        (F.col("year") - F.col("year") % 10).cast("long").alias("decade")
    ).agg(
        F.count("*").alias("n_titles"),
        F.sum(F.when(F.col("year") == 1800, 1).otherwise(0))
        .cast("long")
        .alias("n_missing_year"),
    )


@register(
    "src_stream_listing_pages",
    f"""
    WITH items AS (SELECT i FROM generate_series(0, {_PAGES * _PER_PAGE - 1}) t(i)),
    rows_ AS (
      SELECT CAST(i // {_PER_PAGE} AS BIGINT) AS page,
             CASE WHEN i % 7 = 3 THEN 'Untitled Project ' || i
                  ELSE 'Movie ' || i || ' (' || (1900 + (i * 37) % 126) || ')'
             END AS raw_title
      FROM items
    )
    SELECT page, count(*) AS n_titles,
           CAST(sum(CASE WHEN raw_title LIKE 'Untitled%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_missing_year
    FROM rows_ GROUP BY page
    """,
    tags=("source", "python-datasource", "streaming", "s1"),
)
def src_stream_listing_pages(spark, sf_dir):
    """S1 as a STREAMING Python data source (`sources/listing.py::
    ListingStreamReader`): the listing drains through a real readStream →
    availableNow run, with the page number as the resumable offset — the
    scraper's 'continue from the last page' semantics with exactly-once
    replay (readBetweenOffsets) for free. Per-page rollup oracle checks the
    streamed rows end-to-end; the multi-batch/resume contract is pinned in
    tests/test_listing_source.py."""
    from cinegraph_spark.session import scratch_dir

    from cinegraph_spark.session import ensure_shipped
    from cinegraph_spark.sources.listing import read_listing_stream
    from cinegraph_spark.streaming.windows import run_availablenow_to_parquet

    ensure_shipped(spark)
    stream = read_listing_stream(spark, pages=_PAGES, per_page=_PER_PAGE)
    out = run_availablenow_to_parquet(
        spark,
        stream,
        scratch_dir("cg_drain_listing_"),
        output_mode="append",
        # stateless source landing: no eviction-driven emissions
        final_no_data_batch=False,
    )
    return out.groupBy(F.col("page").cast("long").alias("page")).agg(
        F.count("*").alias("n_titles"),
        F.sum(
            F.when(F.col("raw_title").startswith("Untitled"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_missing_year"),
    )


@register(
    "src_textsink_roundtrip",
    """
    WITH titled AS (
      SELECT doc_id, text, 1900 + doc_id % 120 AS year,
             'Doc ' || CAST(doc_id AS VARCHAR) AS title
      FROM documents WHERE text IS NOT NULL AND text <> ''
    )
    SELECT CAST(year AS BIGINT) AS year,
           count(*) AS n_files,
           CAST(sum(len(text)) AS BIGINT) AS sum_chars,
           min(title || ' ' || CAST(year AS VARCHAR)) AS first_movie
    FROM titled GROUP BY year ORDER BY year
    """,
    tags=("source", "sink", "python-datasource", "s3"),
)
def src_textsink_roundtrip(spark, sf_dir):
    """S3 as a REAL custom connector round-trip: every document becomes a
    ``{title}_{year}.txt`` file (spaces→underscores — the reference's
    filename mangle, ``scraping/scraper.py:137-153``) written through the
    Python Data Source WRITER (``sources/textsink.py``: executor tasks
    write their partitions in parallel, the driver commits a manifest
    only after all tasks succeed, abort removes partial output), then the
    corpus is read BACK through the S4 directory reader
    (``read_subtitle_corpus``) and rolled up per year. The oracle derives
    the same rollup from ``documents`` directly, so the hash matches only
    if the sink wrote every file exactly once with exact content and the
    filename mangle round-tripped the title/year."""
    from cinegraph_spark.queries.util import T as _T
    from cinegraph_spark.session import ensure_shipped, scratch_dir
    from cinegraph_spark.sources.text_corpus import read_subtitle_corpus
    from cinegraph_spark.sources.textsink import write_text_files

    ensure_shipped(spark)
    out_dir = scratch_dir("cg_textsink_")
    # NULL text has no file representation, and EMPTY text round-trips to
    # a zero-byte file that Spark's split planner skips on read (every
    # format — an engine-level behavior, see sources/text_corpus.py), so
    # both are excluded on both sides (r17 adversarial sweep)
    d = _T(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    year = (F.lit(1900) + F.pmod("doc_id", F.lit(120))).cast("int")
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    fname = F.concat(
        F.regexp_replace(title, " ", "_"),
        F.lit("_"),
        year.cast("string"),
        F.lit(".txt"),
    )
    write_text_files(
        d.select(fname.alias("fname"), F.col("text").alias("content")),
        out_dir,
    )
    corpus = read_subtitle_corpus(spark, out_dir)
    return (
        corpus.groupBy(F.col("year").cast("long").alias("year"))
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.length("raw_text")).cast("long").alias("sum_chars"),
            F.min("movie").alias("first_movie"),
        )
        .orderBy("year")
    )


#: adversarial documents UNIONed into both round-trip queries: the
#: fixture text carries no newlines/commas/quotes, so without these the
#: escape paths would be untested claims. Mirrored literally in the
#: oracle SQL (newlines via chr(10), quotes doubled).
_ADVERSARIAL_DOCS = [
    (9000001, 'line1,with comma\n"quoted cell"\ntrailing', "xx"),
    (9000002, 'newline\nin the middle; ends with period.', "xx"),
    (9000003, '"starts quoted", has \'single\', und — em\u2014dash \u00e9\u6f22', "xx"),
]

#: JSONL-only: a field-TRAILING newline. The CSV codec cannot carry it —
#: Spark's (univocity) multiLine reader normalizes a quoted field's
#: trailing line separator away (verified empirically, r16), which is
#: exactly why JSONL is the byte-exact interchange default for training
#: text and this row pins that JSONL keeps it.
_JSONL_ONLY_DOCS = [
    (9000004, 'trailing newline survives in jsonl\n', "xx"),
]


def _adversarial_union_sql(docs) -> str:
    rows = []
    for doc_id, text, lang in docs:
        lit = text.replace("'", "''").replace("\n", "' || chr(10) || '")
        rows.append(
            f"SELECT {doc_id} AS doc_id, '{lit}' AS text, '{lang}' AS lang,"
            f" 'synthetic' AS source, CAST(len('{lit}') AS BIGINT) AS n_chars"
        )
    return " UNION ALL ".join(rows)


def _with_adversarial(spark, d, docs):
    from pyspark.sql import functions as F

    from cinegraph_spark.session import local_df

    extra = local_df(
        spark,
        [
            (doc_id, text, lang, "synthetic", len(text))
            for doc_id, text, lang in docs
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return d.select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).unionByName(extra)


@register(
    "src_jsonl_roundtrip",
    f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(len(text)) AS BIGINT) AS sum_text_len,
           substr(md5(string_agg(md5(text), '' ORDER BY doc_id)), 1, 16)
             AS content_hash
    FROM (SELECT doc_id, text, lang, source, n_chars FROM documents
          UNION ALL {_adversarial_union_sql(_ADVERSARIAL_DOCS + _JSONL_ONLY_DOCS)})
    GROUP BY lang ORDER BY lang
    """,
    tags=("source", "format", "jsonl", "roundtrip"),
)
def src_jsonl_roundtrip(spark, sf_dir):
    """Source-format breadth: the documents table round-trips through
    JSON LINES — the interchange format most raw training-data drops
    arrive in — written by Spark's json sink and read back with an
    EXPLICIT schema (schema-on-read inference is banned on the ingest
    path: at 100 TB an inference pass is a full extra scan, and a
    type-flipping row silently retypes the column). The per-lang
    content hash (md5 over doc-ordered md5s) proves byte-exact text
    fidelity through the escape/unescape cycle — newlines, quotes, and
    non-ASCII in `text` survive or the oracle hash (computed on the
    ORIGINAL parquet) misses."""
    from cinegraph_spark.queries.util import T
    from cinegraph_spark.session import scratch_dir

    d = _with_adversarial(
        spark,
        T(spark, sf_dir, "documents"),
        _ADVERSARIAL_DOCS + _JSONL_ONLY_DOCS,
    )
    path = scratch_dir("cg_jsonl_rt_") + "/docs"
    d.write.json(path)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.length("text")).cast("long").alias("sum_text_len"),
            F.substring(
                F.md5(
                    F.concat_ws(
                        "",
                        F.array_sort(
                            F.collect_list(
                                F.struct("doc_id", F.md5("text"))
                            )
                        ).getField("col2"),
                    )
                ),
                1,
                16,
            ).alias("content_hash"),
        )
        .orderBy("lang")
    )


@register(
    "src_csv_roundtrip",
    f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(len(text)) AS BIGINT) AS sum_text_len,
           substr(md5(string_agg(md5(text), '' ORDER BY doc_id)), 1, 16)
             AS content_hash
    FROM (SELECT doc_id, text, lang, source, n_chars FROM documents
          WHERE text IS NOT NULL AND text <> ''
            AND NOT regexp_matches(text, '[\n\r]$')
          UNION ALL {_adversarial_union_sql(_ADVERSARIAL_DOCS)})
    GROUP BY lang ORDER BY lang
    """,
    tags=("source", "format", "csv", "roundtrip"),
)
def src_csv_roundtrip(spark, sf_dir):
    """Source-format breadth: the same byte-exact round-trip through
    CSV, the hard case — `text` carries embedded newlines, commas, and
    quotes, so the writer must quote+escape and the reader must run in
    multiLine mode with an explicit schema (a naive line-split reader
    shreds multi-line records; the content hash would miss). Same
    per-lang content-hash oracle over the ORIGINAL parquet as the JSONL
    twin, so the two queries pin both directions of each codec. One
    documented codec limit, found while pinning this: a quoted field's
    TRAILING newline is normalized away by the multiLine CSV reader, so
    the trailing-newline adversarial row rides only the JSONL twin —
    CSV is not byte-exact for trailing-whitespace-significant text,
    JSONL is. A second codec limit (r17 adversarial sweep): CSV cannot
    distinguish NULL from '' (both surface as an empty cell under the
    default nullValue/emptyValue), so NULL- and empty-text rows are
    excluded on both sides here — JSONL round-trips both exactly (JSON
    null vs \"\") and remains the byte-exact interchange default."""
    from cinegraph_spark.queries.util import T
    from cinegraph_spark.session import scratch_dir

    # the filters mirror the documented codec limits: NULL/'' collapse to
    # one empty cell, and a TRAILING line terminator is normalized away
    # by the multiLine reader — such docs ride the JSONL twin instead
    d = _with_adversarial(
        spark,
        T(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
            & (F.col("text") != "")
            & ~F.col("text").rlike("[\n\r]$")
        ),
        _ADVERSARIAL_DOCS,
    )
    path = scratch_dir("cg_csv_rt_") + "/docs"
    (
        d.write.option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        # Spark's CSV WRITER trims leading/trailing whitespace by default
        # (ignore*WhiteSpace default true on write, even under quoteAll) —
        # a doc ending in a space/tab would lose it silently (r17
        # adversarial sweep); the reader defaults are already false
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )
    back = (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.length("text")).cast("long").alias("sum_text_len"),
            F.substring(
                F.md5(
                    F.concat_ws(
                        "",
                        F.array_sort(
                            F.collect_list(
                                F.struct("doc_id", F.md5("text"))
                            )
                        ).getField("col2"),
                    )
                ),
                1,
                16,
            ).alias("content_hash"),
        )
        .orderBy("lang")
    )
