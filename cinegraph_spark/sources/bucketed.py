"""Bucketed-table storage — shuffle-free big↔big joins.

Broadcast handles small↔big joins (`tests/test_plans.py` pins those); when
BOTH sides are fact-scale (lineitem ⋈ orders at 100 TB), the only way to
avoid re-shuffling the larger table on every query is to pre-shuffle ONCE at
write time: ``bucketBy(n, key)`` hash-partitions rows into a fixed number of
per-file buckets, and Spark's scan exposes that as an output partitioning —
two tables bucketed the same way join with ZERO Exchange nodes
(`tests/test_bucketing.py` asserts this on the physical plan).

This is the Spark-native analog of the reference's only physical-layout
decision (Postgres btree/GiST indexes, `db_init.sql:12-13`): layout chosen
at write time to make the serving-side query cheap.

Sizing at 100 TB: buckets ≈ table_size / target_partition (e.g. 100 TB /
256 MB ≈ 400k is too many files — in practice 4–16k buckets and let each
bucket hold multiple row groups; bucket count must MATCH across tables that
join, so pick it per join-key domain, not per table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed) parquet
    table in the session catalog. ``sort=True`` additionally sorts within
    buckets by the key, letting sort-merge joins skip their Sort too."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.
    With matching bucket counts the physical plan contains no Exchange —
    each task reads bucket i of both sides."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
