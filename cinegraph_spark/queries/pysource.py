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
      FROM documents
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
    d = _T(spark, sf_dir, "documents")
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
