"""Idempotent incremental writes — the Spark-native form of the reference's
offset-based resume (SURVEY §2.9 X4: `scraper.py:232`,
`preprocessing_agent.py:388` skip an already-done prefix by count).

Offsets assume a stable input ordering; at 100 TB with retries and
speculative tasks they double- or zero-process on any reordering. The
durable contract is *keyed idempotency*: anti-join the incoming batch
against the keys already persisted, append only the new rows. Re-running a
failed batch is then a no-op for whatever already landed — the same
guarantee Structured Streaming gets from ``checkpointLocation``
(`streaming/windows.py`), here for batch jobs.

At scale the anti-join reads only the key column of the sink (column
pruning — a few % of the data), and if the sink is partitioned by an
ingest-date/batch column the scan prunes to recent partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def append_new_keys(
    spark: SparkSession, df: DataFrame, path: str, key: str
) -> int:
    """Append to the parquet dataset at ``path`` only the rows whose ``key``
    is not already present. Returns the number of rows written. Safe to
    re-run with overlapping input (idempotent per key); first call creates
    the dataset."""
    try:
        existing_keys = spark.read.parquet(path).select(key)
    except AnalysisException:  # first write — nothing to dedupe against
        # Observation counts rows as the write job streams them past, so the
        # first write costs ONE scan of the (possibly expensive) input plan
        # instead of write-then-recount.
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.parquet(path)
        return int(obs.get["n"])
    fresh = df.join(existing_keys, key, "left_anti")
    # localCheckpoint pins the anti-join result BEFORE the append mutates
    # the same files the plan would otherwise re-scan lazily
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(path)
    return n
