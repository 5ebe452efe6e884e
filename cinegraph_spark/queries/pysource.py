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
    )
    return out.groupBy(F.col("page").cast("long").alias("page")).agg(
        F.count("*").alias("n_titles"),
        F.sum(
            F.when(F.col("raw_title").startswith("Untitled"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_missing_year"),
    )
