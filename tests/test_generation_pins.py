"""Vacuum-vs-pinned-reader retention race (r18, VERDICT r17 task 6).

r17 proved generation-pinned readers are untorn WHILE maintenance
commits; the remaining window was a reader pinned at generation g while
retention (the commit-time ``keep`` prune or ``vacuum_generations``)
deletes g out from under its scan. The contract, now pinned here and in
the serving_io module docstring: a reader that must outlive retention
declares itself with :func:`pin_generation` — one zero-byte
``_PIN_<gen>_<token>`` marker, honored by BOTH pruning paths — while an
undeclared straggler keeps the standard lakehouse behavior (documented
mid-scan FileNotFound, never silent wrong rows). Crashed readers' stale
pins age out on vacuum's storage clock so retention can never wedge.
Exercised at the layout, IVF and HNSW tiers.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.operators.maintenance import hash_layout_save, layout_read
from cinegraph_spark.operators.serving_io import (
    list_generations,
    pin_generation,
    resolve_generation,
    vacuum_generations,
)


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )


def _emb(spark):
    from cinegraph_spark.queries.util import T

    sf = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    return T(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def test_pin_blocks_commit_time_prune_then_releases(spark, tmp_path):
    """A pinned generation survives any number of keep-window saves; the
    moment the pin releases, the next retention pass reclaims it and a
    version-pinned resolve degrades to the documented loud error."""
    root = str(tmp_path / "t")
    hash_layout_save(_mk(spark, 0, 4), root, "id", 2, keep_generations=2)
    with pin_generation(spark, root) as gen_dir:
        assert gen_dir.rstrip("/").endswith("g00000001")
        # two saves at keep=2 would normally prune generation 1
        hash_layout_save(
            _mk(spark, 10, 14), root, "id", 2, keep_generations=2
        )
        hash_layout_save(
            _mk(spark, 20, 24), root, "id", 2, keep_generations=2
        )
        # the pinned generation is still committed, resolvable, readable
        assert sorted(list_generations(spark, root)) == [1, 2, 3]
        assert _ids(layout_read(spark, root, generation=1)) == [0, 1, 2, 3]
        assert _ids(spark.read.parquet(gen_dir)) == [0, 1, 2, 3]
    # pin released: vacuum reclaims it...
    out = vacuum_generations(spark, root, keep=2, older_than_hours=24.0)
    assert [p.rsplit("/", 1)[-1] for p in out["deleted"]] == ["g00000001"]
    assert out["pinned"] == []
    assert sorted(list_generations(spark, root)) == [2, 3]
    # ...and the straggler contract is a LOUD error, not silent rows
    with pytest.raises(ValueError, match="not retained"):
        resolve_generation(spark, root, 1)


def test_vacuum_honors_live_pin_and_sweeps_stale_pin(spark, tmp_path):
    root = str(tmp_path / "t")
    for lo in (0, 10, 20):
        hash_layout_save(
            _mk(spark, lo, lo + 2), root, "id", 2, keep_generations=9
        )
    with pin_generation(spark, root, version=1) as gen_dir:
        out = vacuum_generations(spark, root, keep=1, older_than_hours=24.0)
        # gen 1 vetoed by the live pin (and reported); gen 2 reclaimed;
        # gen 3 is the newest committed and always survives
        assert [p.rsplit("/", 1)[-1] for p in out["pinned"]] == ["g00000001"]
        assert "g00000002" in {p.rsplit("/", 1)[-1] for p in out["deleted"]}
        assert sorted(list_generations(spark, root)) == [1, 3]
        assert _ids(spark.read.parquet(gen_dir)) == [0, 1]
        # make the pin STALE (a crashed reader): older than the retention
        gens = os.path.join(root, "_gens")
        pin_files = [f for f in os.listdir(gens) if f.startswith("_PIN_")]
        assert len(pin_files) == 1
        stale = time.time() - 48 * 3600
        os.utime(os.path.join(gens, pin_files[0]), (stale, stale))
        out = vacuum_generations(spark, root, keep=1, older_than_hours=24.0)
        # the stale pin is swept WITH its generation — retention never
        # wedges on a dead reader
        assert out["pinned"] == []
        names = {p.rsplit("/", 1)[-1] for p in out["deleted"]}
        assert "g00000001" in names and pin_files[0] in names
        assert sorted(list_generations(spark, root)) == [3]


def test_pin_requires_versioned_root(spark, tmp_path):
    legacy = str(tmp_path / "legacy")
    hash_layout_save(_mk(spark, 0, 3), legacy, "id", 2)
    with pytest.raises(ValueError, match="not a versioned state"):
        with pin_generation(spark, legacy):
            pass


def test_ivf_pinned_probe_survives_retention_storm(spark, tmp_path):
    """IVF tier end-to-end: a probe pinned at generation 1 answers
    identically before and after enough saves + a vacuum to have pruned
    generation 1, because the pin vetoes both pruning paths."""
    from cinegraph_spark.operators.similarity import (
        ivf_centroids_save,
        ivf_index_topk,
    )

    e = _emb(spark)
    half = e.filter(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "cents")
    ivf_centroids_save(half, path, keep_generations=2)
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    with pin_generation(spark, path, version=1):
        before = sorted(
            map(tuple, ivf_index_topk(
                half, q, path, nprobe=2, k=5, generation=1).collect())
        )
        ivf_centroids_save(e, path, keep_generations=2)
        ivf_centroids_save(e, path, keep_generations=2)  # would prune g1
        vacuum_generations(spark, path, keep=2, older_than_hours=24.0)
        after = sorted(
            map(tuple, ivf_index_topk(
                half, q, path, nprobe=2, k=5, generation=1).collect())
        )
        assert after == before
    vacuum_generations(spark, path, keep=2, older_than_hours=24.0)
    with pytest.raises(ValueError, match="not retained"):
        resolve_generation(spark, path, 1)


def test_hnsw_pinned_knn_survives_retention_storm(spark, tmp_path):
    """HNSW tier end-to-end: same contract at the graph-index layout."""
    from cinegraph_spark.operators.hnsw import hnsw_index_knn, hnsw_index_save

    e = _emb(spark).select("vec_id", "v")
    root = str(tmp_path / "idx")
    gen1 = e.filter(F.col("vec_id") % 2 == 0)
    hnsw_index_save(gen1, root, target_rows_per_subindex=128,
                    keep_generations=2)
    q = e.filter(F.col("vec_id") < 3)
    with pin_generation(spark, root, version=1):
        before = sorted(
            map(tuple, hnsw_index_knn(
                spark, root, q, k=3, generation=1).collect()),
            key=lambda t: (t[0], t[3]),
        )
        hnsw_index_save(e, root, target_rows_per_subindex=128,
                        keep_generations=2)
        hnsw_index_save(e, root, target_rows_per_subindex=128,
                        keep_generations=2)  # would prune g1
        vacuum_generations(spark, root, keep=2, older_than_hours=24.0)
        after = sorted(
            map(tuple, hnsw_index_knn(
                spark, root, q, k=3, generation=1).collect()),
            key=lambda t: (t[0], t[3]),
        )
        assert after == before
    out = vacuum_generations(spark, root, keep=2, older_than_hours=24.0)
    assert any(p.endswith("g00000001") for p in out["deleted"])
