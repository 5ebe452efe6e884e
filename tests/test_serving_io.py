"""Atomic sibling-swap contract (operators/serving_io.py) — the shared
write path every serving table (HNSW blobs, IVF centroids, PQ state)
rides. The crash property under test: the live state at ``path`` is
never destroyed by a failed write; only a successful, fully-durable
sibling ever replaces it.
"""

from __future__ import annotations

import pytest

from cinegraph_spark.operators.serving_io import (
    atomic_swap_dir,
    atomic_swap_write,
)


def _ids(spark, path):
    return sorted(r["id"] for r in spark.read.parquet(path).collect())


def test_swap_write_creates_and_replaces(spark, tmp_path):
    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)  # no pre-existing target
    assert _ids(spark, path) == [0, 1, 2]
    atomic_swap_write(spark.range(5, 8), path)  # replace
    assert _ids(spark, path) == [5, 6, 7]
    assert [p.name for p in tmp_path.iterdir() if "__swap__" in p.name] == []


def test_swap_write_can_read_target_lazily(spark, tmp_path):
    """The maintenance shape: the written frame reads the CURRENT table at
    ``path`` (kept-rows union) — legal because the old files persist until
    after the sibling write completes."""
    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    old = spark.read.parquet(path)  # lazy read of the live table
    atomic_swap_write(old.unionByName(spark.range(10, 12)), path)
    assert _ids(spark, path) == [0, 1, 2, 10, 11]


def test_swap_dir_exception_leaves_target_untouched(spark, tmp_path):
    """A failure while populating the sibling must not touch the live
    state; the partial sibling stays on disk for inspection."""
    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    with pytest.raises(RuntimeError, match="boom"):
        with atomic_swap_dir(spark, path) as tmp:
            spark.range(99).write.parquet(tmp + "/partial")
            raise RuntimeError("boom")
    assert _ids(spark, path) == [0, 1, 2]
    siblings = [p.name for p in tmp_path.iterdir() if "__swap__" in p.name]
    assert len(siblings) == 1  # the recovery copy


def test_stale_sibling_never_corrupts_reads_or_later_swaps(spark, tmp_path):
    """A crash-leftover sibling from a previous run is inert: reads of the
    table ignore it and a later successful swap works alongside it."""
    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    spark.range(42).write.parquet(path + "__swap__deadbeefcafe")
    assert _ids(spark, path) == [0, 1, 2]
    atomic_swap_write(spark.range(7, 9), path)
    assert _ids(spark, path) == [7, 8]
