"""Table maintenance — compaction and clustered layout for parquet tables.

The reference never needs this (its biggest table is 40k rows in Postgres),
but any 100 TB parquet lake does: streaming sinks and incremental appends
(`operators/incremental.py`) accumulate small files until scan planning and
open-file overhead dominate; and without a clustered layout, min/max
footer stats prune nothing. These are the engine-side analogs of a
warehouse's OPTIMIZE / CLUSTER BY maintenance commands, expressed with
plain DataFrame primitives:

- :func:`dataset_stats` — file census (count/bytes/avg) driving the
  compact-or-not decision; pure driver metadata, no Spark job.
- :func:`compact` — rewrite to ~target-sized files. Uses ``repartition``
  (round-robin) when no clustering is wanted, or ``repartitionByRange`` +
  ``sortWithinPartitions`` to range-cluster by sort keys so every output
  file owns a disjoint key range — which is exactly what makes parquet
  min/max stats (and partition-less file skipping) effective for range
  predicates on those keys.

Swap semantics: the rewrite lands in a sibling directory and is renamed
into place (old data kept at ``<path>__pre_compact`` until the swap
completes, then removed). At real scale the swap is a catalog pointer
flip (metastore / table-format commit), not a filesystem rename — the
dataflow is identical.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def dataset_stats(path: str) -> dict:
    """File census of a parquet dataset directory: number of data files,
    total bytes, and mean file size. Driver-side metadata only."""
    files = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                files.append(os.path.join(root, n))
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_file_bytes": (total // len(files)) if files else 0,
    }


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: float = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet dataset at ``path`` into ~``target_file_mb``
    files; with ``sort_by``, range-partition on those keys and sort within
    partitions so each output file owns a disjoint key range (footer-stat
    pruning layout). Returns before/after :func:`dataset_stats`.

    The shuffle is one exchange sized by the data/target ratio — the same
    cost OPTIMIZE pays anywhere; at 100 TB you compact per partition (pass
    the partition's path), never the whole table at once.
    """
    tmp = path.rstrip("/") + "__compacting"
    bak = path.rstrip("/") + "__pre_compact"
    # Recover from a prior failed run before touching anything: a stale
    # backup means a previous swap died mid-flight — restore it if the
    # dataset itself is gone, else it is just debris to clear.
    if os.path.exists(bak):
        if not os.path.exists(path):
            os.rename(bak, path)
        else:
            shutil.rmtree(bak)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    before = dataset_stats(path)
    n_out = max(1, math.ceil(before["total_bytes"] / (target_file_mb * (1 << 20))))
    df = spark.read.parquet(path)
    n_rows = df.count()
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(tmp)
    # Validate the rewrite BEFORE the swap so a bad rewrite never replaces
    # good data (the catalog-commit precondition at real scale).
    rewritten = spark.read.parquet(tmp).count()
    if rewritten != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compact aborted: rewrite has {rewritten} rows, source has {n_rows}"
        )
    os.rename(path, bak)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(bak, path)  # close the mid-swap window: restore original
        raise
    shutil.rmtree(bak)
    after = dataset_stats(path)
    return {"before": before, "after": after, "target_files": n_out}


def file_key_ranges(spark: SparkSession, path: str, key: str) -> list[tuple]:
    """Per-file (min, max) of ``key`` — the footer stats a range-clustered
    layout makes disjoint. One map-side aggregation grouped by file name."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
        .collect()
    )
    return sorted((r["lo"], r["hi"]) for r in rows)
