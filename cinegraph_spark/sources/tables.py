"""Parquet table loading for the driver test tables (TESTDATA.md).

Scale notes: these are plain ``spark.read.parquet`` scans — filter/column
pruning push down to the parquet footer automatically; no schema inference
runs because parquet is self-describing. At 100 TB the same call pattern
holds (directory-of-files per table, partition pruning on directory keys).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cinegraph_spark.schemas import TEST_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one driver test table by name."""
    d = sf_dir or sf_dir_from_env()
    return spark.read.parquet(f"{d}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load all (or selected) driver test tables as a dict."""
    return {n: load_table(spark, n, sf_dir) for n in (names or TEST_TABLES)}


def register_temp_views(
    spark: SparkSession, sf_dir: str | None = None, names: list[str] | None = None
) -> None:
    """Register each test table as a temp view for spark.sql queries."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
