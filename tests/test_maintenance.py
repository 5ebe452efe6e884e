"""Compaction / clustered-layout maintenance operators
(`operators/maintenance.py`): small-file collapse, range clustering with
disjoint per-file key ranges (the footer-stat pruning layout), and content
preservation across the rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.operators.maintenance import (
    compact,
    dataset_stats,
    file_key_ranges,
)
from cinegraph_spark.queries.util import T


@pytest.fixture()
def fragmented_orders(spark, sf_dir, tmp_path):
    """orders written as many small files (the streaming-sink pathology)."""
    path = str(tmp_path / "orders_frag")
    T(spark, sf_dir, "orders").repartition(40).write.parquet(path)
    return path


def test_compact_collapses_small_files_and_preserves_rows(spark, fragmented_orders):
    before_rows = spark.read.parquet(fragmented_orders).count()
    before_sum = (
        spark.read.parquet(fragmented_orders)
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()[0]["s"]
    )
    report = compact(spark, fragmented_orders, target_file_mb=128)
    assert report["before"]["n_files"] >= 40
    assert report["after"]["n_files"] < report["before"]["n_files"]
    assert report["after"]["n_files"] == report["target_files"]
    after = spark.read.parquet(fragmented_orders)
    assert after.count() == before_rows
    assert after.agg(F.sum("o_totalprice").alias("s")).collect()[0]["s"] == pytest.approx(
        before_sum
    )


def test_compact_with_sort_keys_yields_disjoint_file_ranges(spark, sf_dir, tmp_path):
    path = str(tmp_path / "lineitem_cluster")
    T(spark, sf_dir, "lineitem").repartition(16).write.parquet(path)
    compact(spark, path, target_file_mb=0.05, sort_by=["l_shipdate"])
    ranges = file_key_ranges(spark, path, "l_shipdate")
    assert len(ranges) >= 2, "expected multiple range-clustered files"
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1
        assert hi1 <= lo2, "file key ranges overlap — clustering broken"


def test_dataset_stats_counts_only_data_files(spark, fragmented_orders):
    s = dataset_stats(fragmented_orders)
    assert s["n_files"] >= 40
    assert s["total_bytes"] > 0
    assert s["avg_file_bytes"] * s["n_files"] <= s["total_bytes"] + s["n_files"]


def test_compact_recovers_stale_backup_and_validates_rewrite(
    spark, fragmented_orders, tmp_path
):
    """Crash-safety contract: a stale __pre_compact from a dead prior run is
    recovered (restored when the dataset is missing, cleared when not), and
    the swap only happens after the rewrite's row count is validated."""
    import os
    import shutil

    path = fragmented_orders
    bak = path + "__pre_compact"
    tmp = path + "__compacting"
    n = spark.read.parquet(path).count()

    # simulate a crash mid-swap: dataset moved to backup, nothing at path
    os.rename(path, bak)
    report = compact(spark, path, target_file_mb=128)
    assert spark.read.parquet(path).count() == n
    assert not os.path.exists(bak) and not os.path.exists(tmp)
    assert report["after"]["n_files"] <= report["before"]["n_files"]

    # stale debris alongside an intact dataset is cleared, not restored
    os.makedirs(bak)
    os.makedirs(tmp)
    compact(spark, path, target_file_mb=128)
    assert spark.read.parquet(path).count() == n
    assert not os.path.exists(bak) and not os.path.exists(tmp)
    shutil.rmtree(path)


def test_compact_recursive_folds_batch_keyed_landing_zone(
    spark, sf_dir, tmp_path
):
    """r13: a streaming drain's landed zone is batch-id-keyed nested
    directories; compact(recursive=True) folds it FLAT while preserving
    every row — the landed-zone maintenance a long-lived ingest needs."""
    import os

    from cinegraph_spark.queries.util import T

    land = str(tmp_path / "landed")
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    for b in range(3):
        docs.filter(F.col("doc_id") % 3 == b).write.parquet(
            land + f"/batch-{b:08d}"
        )
    want = docs.count()
    before = dataset_stats(land)
    report = compact(
        spark, land, target_file_mb=1, sort_by=["lang", "doc_id"],
        recursive=True,
    )
    assert report["after"]["n_files"] < before["n_files"]
    # folded flat: no batch directories survive
    assert not any(
        d.startswith("batch-") for d in os.listdir(land)
    )
    after = spark.read.parquet(land)
    assert after.count() == want
    assert after.select("doc_id").distinct().count() == want
