"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end pipeline slice; ``queries()``
/ ``oracle_sql()`` expose the full declared registry
(``cinegraph_spark/queries/``) — every SURVEY §2 operator with its DuckDB
oracle. See ``cinegraph_spark/queries/__init__.py`` for the conventions
(aliasing, rounding, timestamp projection) that keep the value-hash stable
across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cinegraph_spark.queries import load_all  # noqa: E402
from cinegraph_spark.session import tune  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's end-to-end batch pipeline semantics
    (clean → tokenize → sliding windows → emotion scores → act features,
    SURVEY §3.1/§7 step 5) on /root/testdata/sf0.001."""
    tune(spark)
    specs = load_all()
    return specs["pipeline_movie_features"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2."""
    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; hash-unsafe
    operators (engine-specific hashing: minhash/simhash) are omitted and get
    the driver's rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
