"""Shared helpers for registry query implementations."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cinegraph_spark.session import bounded_shuffle, scoped_confs  # noqa: F401
# (re-exported: query modules and tests import these from here)

#: Decimal places for float results on both engines. Cross-engine double
#: aggregation differs in the final ulp (summation order); 4 decimals is far
#: coarser than the ~1e-10 relative error while keeping results meaningful.
ROUND_DECIMALS = 4


#: Overflow-free deterministic scramble of doc_id, uniform-ish on [0, 1000):
#: Knuth multiplicative hash (golden-ratio constant 2654435761) after a
#: mod-100003 (prime) reduction so the product stays far below 2^63 in both
#: engines (DuckDB raises on BIGINT overflow rather than wrapping). Shared by
#: the sampling family and analytics' DSIR resampling — lives here because
#: query modules may only cross-import via non-registering shared modules.
SCRAMBLE_SQL = "(doc_id % 100003) * 2654435761 % 1000"


def scramble(col: Column) -> Column:
    """Spark twin of :data:`SCRAMBLE_SQL`."""
    return (col % 100003) * F.lit(2654435761) % 1000


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects. Read nanos as long (the legacy flag is
    scoped: its effect is captured in the analyzed plan, verified by
    tests/test_conf_hygiene.py) and rebuild the timestamp at microsecond
    precision with exact integer division (``div``, not double `/` —
    ns-since-2024 exceeds double's 53-bit integer range). DuckDB truncates
    ns→µs the same way, so both engines see identical instants.

    ``ts`` is produced as TIMESTAMP_NTZ holding the UTC wall clock — the
    session-tz-independent type that matches DuckDB's naive timestamps
    directly, so no query needs the session time zone pinned (the
    ``convert_timezone('UTC', ltz)`` round-trip through the session zone
    cancels it out)."""
    with scoped_confs(spark, **{"spark.sql.legacy.parquet.nanosAsLong": "true"}):
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) file read as long
            df = df.withColumn(
                "ts",
                F.expr("convert_timezone('UTC', timestamp_micros(ts div 1000))"),
            )
        elif ts_type == "timestamp":
            # instant (isAdjustedToUTC / LTZ) — project its UTC wall clock
            df = df.withColumn(
                "ts", F.convert_timezone(None, F.lit("UTC"), F.col("ts"))
            )
        # timestamp_ntz (MICROS, naive — the round-6 testdata): already the
        # session-tz-independent wall clock DuckDB sees; leave as-is.
        df.schema  # force analysis while the read flag is in scope
    return df


def ntz(col: Column) -> Column:
    """Instant (TIMESTAMP) → its UTC wall clock as TIMESTAMP_NTZ,
    independent of the session time zone: the implicit LTZ→NTZ cast (in the
    session zone) cancels against convert_timezone's default source zone
    (also the session zone), leaving a pure instant→UTC mapping."""
    return F.convert_timezone(None, F.lit("UTC"), col)


def r4(col: Column) -> Column:
    """Round a double aggregate for hash-stable cross-engine comparison."""
    return F.round(col, ROUND_DECIMALS)


def dstr(col: Column) -> Column:
    """Project a timestamp as 'yyyy-MM-dd' string (tz/encoding-proof)."""
    return F.date_format(col, "yyyy-MM-dd")


def tstr(col: Column) -> Column:
    """Project a timestamp as 'yyyy-MM-dd HH:mm:ss' string."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
