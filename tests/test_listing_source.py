"""S1 paginated-listing Python Data Source (`sources/listing.py`):
partition planning (one split per page), determinism, and option handling.
The value-level check rides the oracle-parity suite via
`src_paginated_listing_decades`.
"""

from __future__ import annotations

from cinegraph_spark.sources.listing import read_listing


def test_one_partition_per_page(spark):
    df = read_listing(spark, pages=7, per_page=5)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 35


def test_rows_deterministic_and_page_local(spark):
    df = read_listing(spark, pages=3, per_page=4)
    rows = {(r["page"], r["rank"]): r["raw_title"] for r in df.collect()}
    assert len(rows) == 12
    # item 3 (page 0, rank 3) is the 7k+3 missing-year case
    assert rows[(0, 3)] == "Untitled Project 3"
    # item 5 = page 1, rank 1 -> year 1900 + (5*37) % 126 = 1900 + 59
    assert rows[(1, 1)] == "Movie 5 (1959)"
    # re-read is identical (no state between reads)
    again = {(r["page"], r["rank"]): r["raw_title"] for r in df.collect()}
    assert again == rows
