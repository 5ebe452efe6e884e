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


def test_recover_swap_completes_interrupted_swap(spark, tmp_path):
    """Crash between the two renames: both copies parked (__old__ +
    __swap__, same token), path missing. Recovery must prefer the freshly
    written state (it was durably complete before the old one was moved)
    and clear the aside copy."""
    import os

    from cinegraph_spark.operators.serving_io import recover_swap

    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    spark.range(10, 13).write.parquet(path + "__swap__0123456789ab")
    os.rename(path, path + "__old__0123456789ab")  # simulate the window
    out = recover_swap(spark, path)
    assert out == {"action": "restored_new", "token": "0123456789ab"}
    assert _ids(spark, path) == [10, 11, 12]
    assert [p.name for p in tmp_path.iterdir()] == ["t"]


def test_recover_swap_restores_old_when_no_new_copy(spark, tmp_path):
    import os

    from cinegraph_spark.operators.serving_io import recover_swap

    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    os.rename(path, path + "__old__0123456789ab")
    out = recover_swap(spark, path)
    assert out["action"] == "restored_old"
    assert _ids(spark, path) == [0, 1, 2]


def test_recover_swap_is_conservative(spark, tmp_path):
    """A live table is never touched (an orphan __swap__ next to it is a
    kept-for-inspection failed write), and two distinct parked tokens have
    no well-defined winner and must raise."""
    import os

    import pytest as _pytest

    from cinegraph_spark.operators.serving_io import recover_swap

    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    spark.range(42).write.parquet(path + "__swap__deadbeefcafe")
    assert recover_swap(spark, path) == {"action": "none", "token": None}
    assert _ids(spark, path) == [0, 1, 2]
    assert any("__swap__" in p.name for p in tmp_path.iterdir())

    os.rename(path, path + "__old__0123456789ab")
    with _pytest.raises(IOError, match="2 distinct crashed-swap tokens"):
        recover_swap(spark, path)
    assert recover_swap(spark, str(tmp_path / "never_written")) == {
        "action": "none",
        "token": None,
    }


def test_stale_sibling_never_corrupts_reads_or_later_swaps(spark, tmp_path):
    """A crash-leftover sibling from a previous run is inert: reads of the
    table ignore it and a later successful swap works alongside it."""
    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    spark.range(42).write.parquet(path + "__swap__deadbeefcafe")
    assert _ids(spark, path) == [0, 1, 2]
    atomic_swap_write(spark.range(7, 9), path)
    assert _ids(spark, path) == [7, 8]


def test_orphan_old_swept_and_pair_preferred(spark, tmp_path):
    """A post-swap crash (new state live, aside not deleted) leaves an
    orphan __old__: the NEXT swap sweeps it (no unbounded disk leak).
    And recover_swap resolves a multi-token parking lot when exactly one
    token is a complete __old__+__swap__ pair — the only configuration
    provably past the sibling write — preferring it over a lone orphan."""
    import os

    from cinegraph_spark.operators.serving_io import recover_swap

    path = str(tmp_path / "t")
    atomic_swap_write(spark.range(3), path)
    # simulate the post-swap crash window: aside copy never deleted
    spark.range(99).write.parquet(path + "__old__aaaaaaaaaaaa")
    atomic_swap_write(spark.range(5), path)  # next swap sweeps the orphan
    assert not os.path.exists(path + "__old__aaaaaaaaaaaa")
    assert _ids(spark, path) == [0, 1, 2, 3, 4]

    # multi-token recovery: lone __old__ orphan + one complete pair —
    # the pair's swap copy wins (it was durably written before the old
    # state was touched); the orphan is ignored
    spark.range(99).write.parquet(path + "__old__aaaaaaaaaaaa")
    os.rename(path, path + "__old__bbbbbbbbbbbb")
    spark.range(7, 9).write.parquet(path + "__swap__bbbbbbbbbbbb")
    out = recover_swap(spark, path)
    assert out == {"action": "restored_new", "token": "bbbbbbbbbbbb"}
    assert _ids(spark, path) == [7, 8]
