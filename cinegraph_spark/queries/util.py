"""Shared helpers for registry query implementations."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Decimal places for float results on both engines. Cross-engine double
#: aggregation differs in the final ulp (summation order); 4 decimals is far
#: coarser than the ~1e-10 relative error while keeping results meaningful.
ROUND_DECIMALS = 4


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects. Read nanos as long and rebuild the timestamp
    at microsecond precision with exact integer division (``div``, not
    double `/` — ns-since-2024 exceeds double's 53-bit integer range).
    DuckDB truncates ns→µs the same way, so both engines see identical
    instants. Session tz is pinned UTC so instant→string projection matches
    DuckDB's naive timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def r4(col: Column) -> Column:
    """Round a double aggregate for hash-stable cross-engine comparison."""
    return F.round(col, ROUND_DECIMALS)


def dstr(col: Column) -> Column:
    """Project a timestamp as 'yyyy-MM-dd' string (tz/encoding-proof)."""
    return F.date_format(col, "yyyy-MM-dd")


def tstr(col: Column) -> Column:
    """Project a timestamp as 'yyyy-MM-dd HH:mm:ss' string."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
