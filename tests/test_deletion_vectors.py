"""Deletion vectors (operators/maintenance.py, r15) — merge-on-read
deletes at cost ∝ keys, not data.

Load-bearing claims pinned here:
- ``layout_dv_delete`` masks keys from every read WITHOUT touching any
  data file (untouched mtimes proven), and deletes accumulate across
  calls;
- ``hash_layout_upsert`` resurrects a DV-masked key (the new row is
  visible, not the stale one) and clears the touched partitions'
  DV entries wholesale — the rewrite it does anyway applies them;
- ``layout_dv_compact`` preserves read results exactly, drops emptied
  data directories, clears the sidecar container (steady-state reads go
  back to one fs.exists), and honors a ``parts`` bound;
- identity/mode guards: NULL keys, column layouts, versioned layouts,
  and a versioned layout carrying a sidecar are all refused with named
  errors.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.operators.maintenance import (
    DV_DIR,
    column_layout_save,
    hash_layout_save,
    hash_layout_upsert,
    layout_dv_compact,
    layout_dv_delete,
    layout_pruned_read,
    layout_read,
)

N_PARTS = 8


def _mk(spark, n=100):
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"), (F.col("id") * 2).alias("x")
    )


def _keys(spark, *ids):
    return spark.createDataFrame([(int(i),) for i in ids], "vec_id long")


def _rows(spark, path, **kw):
    return sorted(
        (r["vec_id"], r["x"])
        for r in layout_read(spark, path, **kw).collect()
    )


def _data_mtimes(path):
    out = {}
    for root, _dirs, names in os.walk(path):
        if DV_DIR in os.path.relpath(root, path).split(os.sep):
            continue
        for n in names:
            if n.startswith(("_", ".")):
                continue
            p = os.path.join(root, n)
            out[os.path.relpath(p, path)] = os.stat(p).st_mtime_ns
    return out


@pytest.fixture()
def layout(spark, tmp_path):
    p = str(tmp_path / "layout")
    hash_layout_save(_mk(spark), p, "vec_id", N_PARTS)
    return p


def test_dv_delete_masks_reads_without_touching_data(spark, layout):
    before = _data_mtimes(layout)
    out = layout_dv_delete(spark, layout, _keys(spark, 3, 7, 11))
    assert out["dv_rows"] == 3 and out["touched_partitions"]
    # no data file written, moved, or rewritten — the headline claim
    assert _data_mtimes(layout) == before
    want = sorted((i, 2 * i) for i in range(100) if i not in (3, 7, 11))
    assert _rows(spark, layout) == want
    # sidecar exists and is partitioned like the data
    assert os.path.isdir(os.path.join(layout, DV_DIR))


def test_dv_deletes_accumulate_and_rerun_is_idempotent(spark, layout):
    layout_dv_delete(spark, layout, _keys(spark, 1, 2))
    layout_dv_delete(spark, layout, _keys(spark, 3))
    # re-running an earlier call merges to the same set (recovery path)
    out = layout_dv_delete(spark, layout, _keys(spark, 1, 2))
    assert out["dv_rows"] >= 2
    gone = {1, 2, 3}
    want = sorted((i, 2 * i) for i in range(100) if i not in gone)
    assert _rows(spark, layout) == want


def test_dv_pruned_read_applies_mask_within_parts(spark, layout):
    layout_dv_delete(spark, layout, _keys(spark, 5))
    part = (
        _mk(spark)
        .filter(F.col("vec_id") == 5)
        .select(F.pmod(F.hash("vec_id"), F.lit(N_PARTS)).cast("int").alias("p"))
        .first()["p"]
    )
    got = {
        int(r["vec_id"])
        for r in layout_pruned_read(spark, layout, [int(part)]).collect()
    }
    assert 5 not in got and got  # masked, but the partition still reads
    # empty prune set stays legal with a sidecar present
    assert layout_pruned_read(spark, layout, []).count() == 0


def test_dv_blind_delete_records_tombstone(spark, layout):
    before = _rows(spark, layout)
    out = layout_dv_delete(spark, layout, _keys(spark, 10_000))
    assert out["dv_rows"] == 1
    assert _rows(spark, layout) == before  # absent key: reads unchanged
    rep = layout_dv_compact(spark, layout)
    assert rep["dv_rows_applied"] == 1
    assert not os.path.isdir(os.path.join(layout, DV_DIR))
    assert _rows(spark, layout) == before


def test_upsert_resurrects_masked_key_and_clears_dv(spark, layout):
    layout_dv_delete(spark, layout, _keys(spark, 4, 6))
    up = spark.createDataFrame([(4, 999)], "vec_id long, x long")
    hash_layout_upsert(spark, layout, up)
    rows = dict(_rows(spark, layout))
    assert rows[4] == 999  # the NEW row, not the stale masked one
    # key 6: if it shares 4's partition the rewrite applied its delete
    # physically and cleared its DV entry; else it stays masked — either
    # way the read excludes it
    assert 6 not in rows
    # after compacting whatever DV remains, results are unchanged
    layout_dv_compact(spark, layout)
    assert dict(_rows(spark, layout)) == rows


def test_dv_compact_preserves_reads_and_clears_sidecar(spark, layout):
    layout_dv_delete(spark, layout, _keys(spark, *range(0, 40)))
    before_rows = _rows(spark, layout)
    before_untouched = _data_mtimes(layout)
    rep = layout_dv_compact(spark, layout)
    assert rep["dv_rows_applied"] == 40
    assert sorted(rep["compacted_partitions"]) == rep["compacted_partitions"]
    assert _rows(spark, layout) == before_rows
    assert not os.path.isdir(os.path.join(layout, DV_DIR))
    # only the DV-carrying partitions were rewritten
    touched = {f"part_id={p}" for p in rep["compacted_partitions"]}
    after = _data_mtimes(layout)
    for rel, mt in before_untouched.items():
        if rel.split(os.sep)[0] not in touched:
            assert after[rel] == mt
    # a second compact is a clean no-op
    assert layout_dv_compact(spark, layout)["compacted_partitions"] == []


def test_dv_compact_drops_emptied_directory_and_honors_parts_bound(
    spark, tmp_path
):
    p = str(tmp_path / "small")
    hash_layout_save(_mk(spark, 16), p, "vec_id", N_PARTS)
    # wipe out every key of one partition
    one_part = (
        _mk(spark, 16)
        .withColumn(
            "p", F.pmod(F.hash("vec_id"), F.lit(N_PARTS)).cast("int")
        )
        .filter(F.col("p") == 0)
        .select("vec_id")
    )
    victim_ids = [int(r["vec_id"]) for r in one_part.collect()]
    assert victim_ids, "fixture needs at least one key in partition 0"
    layout_dv_delete(spark, p, one_part)
    rest = set(range(16)) - set(victim_ids)
    assert rest, "fixture needs keys outside partition 0 too"
    layout_dv_delete(spark, p, _keys(spark, *rest))
    # bound the pass to partition 0 only
    rep = layout_dv_compact(spark, p, parts=[0])
    assert rep["compacted_partitions"] == [0]
    assert 0 in rep["dropped_partitions"]
    assert not os.path.isdir(os.path.join(p, "part_id=0"))
    # the rest of the backlog still masks reads (sidecar retained)
    assert _rows(spark, p) == []
    assert os.path.isdir(os.path.join(p, DV_DIR))
    layout_dv_compact(spark, p)
    assert not os.path.isdir(os.path.join(p, DV_DIR))


def test_dv_guards(spark, tmp_path):
    # NULL / uncastable keys refused
    p = str(tmp_path / "layout")
    hash_layout_save(_mk(spark), p, "vec_id", 4)
    bad = spark.createDataFrame([(None,)], "vec_id long")
    with pytest.raises(ValueError, match="NULL or do not cast"):
        layout_dv_delete(spark, p, bad)
    # empty delete set is a no-op
    out = layout_dv_delete(spark, p, bad.limit(0))
    assert out == {"touched_partitions": [], "dv_rows": 0}
    # column layouts have no key identity to mask on
    cp = str(tmp_path / "cells")
    column_layout_save(
        _mk(spark).withColumn("cell", F.col("vec_id") % 3), cp, "cell"
    )
    with pytest.raises(ValueError, match="not a hash-key layout"):
        layout_dv_delete(spark, cp, _keys(spark, 1))
    with pytest.raises(ValueError, match="not a hash-key layout"):
        layout_dv_compact(spark, cp)
    # versioned (latest-wins) layouts refuse deletes
    vp = str(tmp_path / "versioned")
    hash_layout_save(
        _mk(spark).withColumn("_layout_version", F.lit(1).cast("long")),
        vp,
        "vec_id",
        4,
    )
    with pytest.raises(ValueError, match="versioned"):
        layout_dv_delete(spark, vp, _keys(spark, 1))
    # a tampered versioned layout carrying a sidecar refuses upserts
    os.makedirs(os.path.join(vp, DV_DIR, "part_id=0"), exist_ok=True)
    up = spark.createDataFrame([(1, 5)], "vec_id long, x long")
    with pytest.raises(ValueError, match="deletion-vector sidecar"):
        hash_layout_upsert(spark, vp, up, version=2)


def test_dv_stream_delete_drain_replay_converges(spark, tmp_path):
    from cinegraph_spark.operators.maintenance import dv_stream_delete

    p = str(tmp_path / "layout")
    hash_layout_save(_mk(spark), p, "vec_id", N_PARTS)
    src = str(tmp_path / "erasures")
    _keys(spark, *range(0, 30, 3)).repartition(3).write.parquet(src)

    def _arrivals():
        return (
            spark.readStream.schema("vec_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    dv_stream_delete(spark, _arrivals(), p, str(tmp_path / "ck1"))
    gone = set(range(0, 30, 3))
    want = sorted((i, 2 * i) for i in range(100) if i not in gone)
    assert _rows(spark, p) == want
    # full redelivery under a fresh checkpoint: the union merge makes
    # the at-least-once replay a no-op
    dv_stream_delete(spark, _arrivals(), p, str(tmp_path / "ck2"))
    assert _rows(spark, p) == want
    rep = layout_dv_compact(spark, p)
    assert rep["dv_rows_applied"] == len(gone)
    assert _rows(spark, p) == want


def test_dv_travels_with_generation_saves(spark, tmp_path):
    root = str(tmp_path / "gens")
    hash_layout_save(_mk(spark), root, "vec_id", 4, keep_generations=2)
    layout_dv_delete(spark, root, _keys(spark, 1))
    assert dict(_rows(spark, root)).get(1) is None
    # a NEW generation save publishes a clean snapshot; the old
    # generation keeps its own sidecar (immutable-snapshot contract)
    hash_layout_save(_mk(spark), root, "vec_id", 4, keep_generations=2)
    assert dict(_rows(spark, root))[1] == 2
    assert dict(_rows(spark, root, generation=1)).get(1) is None


def test_dv_pruned_read_keeps_partition_filters(spark, layout):
    """The DV anti-join must not cost the pruned read its planning-time
    directory prune: the data scan keeps PartitionFilters on part_id,
    and the sidecar scan is itself pruned to the same partitions."""
    from cinegraph_spark.plans import formatted_plan

    layout_dv_delete(spark, layout, _keys(spark, 3))
    pruned = layout_pruned_read(spark, layout, [1, 6])
    plan = formatted_plan(pruned)
    # both scans (data + sidecar) carry the same partition prune
    assert plan.count("PartitionFilters") >= 2
    for seg in plan.split("PartitionFilters")[1:]:
        pf = seg.split("]", 1)[0].replace(" ", "")
        assert "part_id" in pf and "1,6" in pf


# --- cross-tier ANN erasure (r15 verdict task 4) ------------------------
#
# The serve-path contract an erasure must satisfy, per tier:
#
# - PQ / HNSW serve from state whose CANDIDATE FETCH (PQ) or whose
#   REBUILD INPUT (HNSW) reads the vec_id hash corpus layout, so a
#   layout_dv_delete there is the erasure primitive;
# - IVF's corpus is a COLUMN layout (cell not derivable from the key),
#   which refuses deletion vectors — its erasure primitive is the batch
#   delete (column_layout_upsert(deletes=) + ivf_centroids_update).
#
# Serve-BEFORE-maintenance (the documented split these tests pin):
# - PQ: the final re-rank fetch goes through the DV-masked layout, so an
#   erased key can NEVER appear in a served top-k, even while the stale
#   codes still spend candidate slots on it;
# - IVF: the candidate fetch reads the corpus cells, so the key is gone
#   the moment the cell delete lands, even while the centroid table is
#   stale (a stale centroid only mis-weights the probe);
# - HNSW: the blobs EMBED their vectors and the search never touches the
#   corpus, so an erased key KEEPS APPEARING until hnsw_index_update
#   rebuilds its partition — erasure there is effective at the next
#   maintenance, the eventual-consistency window the operator docstrings
#   state.


def _emb(spark, sf_dir, with_label=False):
    from cinegraph_spark.queries.util import T

    cols = ["vec_id"] + (["label"] if with_label else [])
    return T(spark, sf_dir, "embeddings").select(
        *cols,
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


_TARGET = 7  # present in embeddings at every SF; the query IS its vector


def _target_query(e, alias="qv"):
    return e.filter(F.col("vec_id") == _TARGET).select(
        F.col("v").alias(alias)
    )


def test_hnsw_erasure_effective_at_next_maintenance(spark, sf_dir, tmp_path):
    from cinegraph_spark.operators.hnsw import (
        hnsw_corpus_layout,
        hnsw_index_knn,
        hnsw_index_save,
        hnsw_index_update,
    )

    e = _emb(spark, sf_dir)
    idx, corpus = str(tmp_path / "idx"), str(tmp_path / "corpus")
    # generation-versioned save: serving reads resolve the newest
    # committed generation, the state shape the verdict named
    hnsw_index_save(e, idx, n_partitions=4, keep_generations=2)
    hnsw_corpus_layout(e, corpus, idx)
    q = spark.createDataFrame(
        [(-1, [float(x) for x in _target_query(e).first()["qv"]])],
        "vec_id long, v array<double>",
    )

    def nids():
        return {
            int(r["nid"])
            for r in hnsw_index_knn(spark, idx, q, k=3).collect()
        }

    assert _TARGET in nids()
    layout_dv_delete(spark, corpus, _keys(spark, _TARGET))
    # blob-resident tier: the served top-k STILL carries the key until
    # its partition is rebuilt — the documented eventual-consistency
    # window of serve-before-maintenance
    assert _TARGET in nids()
    hnsw_index_update(corpus, _keys(spark, _TARGET), idx)
    after = nids()
    assert _TARGET not in after
    assert len(after) == 3  # neighbors still fill k


def test_pq_erasure_masked_at_fetch_then_maintained(spark, sf_dir, tmp_path):
    from cinegraph_spark.operators.similarity import (
        _pq_read_state,
        pq_codes_save,
        pq_codes_update,
        pq_corpus_layout,
        pq_index_topk,
        pq_train,
    )

    e = _emb(spark, sf_dir)
    books = pq_train(e, m=8, k=16)
    pqp, corpus = str(tmp_path / "pq"), str(tmp_path / "corpus")
    pq_codes_save(e, books, pqp, n_partitions=4)
    pq_corpus_layout(e, corpus, pqp)
    q = _target_query(e)

    def ids():
        return [
            int(r["vec_id"])
            for r in pq_index_topk(
                corpus, q, pqp, k=3, rerank=64
            ).collect()
        ]

    def codes_ids():
        _, _, _, schema, root = _pq_read_state(spark, pqp)
        return {
            int(r["vec_id"])
            for r in spark.read.schema(schema)
            .parquet(root + "/codes")
            .select("vec_id")
            .collect()
        }

    assert ids()[0] == _TARGET  # exact re-rank: cos_sim 1.0 leads
    layout_dv_delete(spark, corpus, _keys(spark, _TARGET))
    # the re-rank fetch reads the DV-masked layout: the erased key can
    # never be SERVED, even before any codes maintenance...
    assert _TARGET not in ids()
    assert _TARGET in codes_ids()  # ...though stale codes still carry it
    pq_codes_update(corpus, _keys(spark, _TARGET), pqp)
    assert _TARGET not in codes_ids()  # candidate slots reclaimed
    got = ids()
    assert _TARGET not in got and len(got) == 3


def test_ivf_erasure_via_cell_delete(spark, sf_dir, tmp_path):
    from cinegraph_spark.operators.maintenance import column_layout_upsert
    from cinegraph_spark.operators.similarity import (
        ivf_centroids_save,
        ivf_centroids_update,
        ivf_corpus_layout,
        ivf_index_topk,
    )

    e = _emb(spark, sf_dir, with_label=True)
    ivfp, corpus = str(tmp_path / "ivf"), str(tmp_path / "corpus")
    ivf_centroids_save(e, ivfp)
    ivf_corpus_layout(e, corpus)
    q = _target_query(e)

    def ids():
        return [
            int(r["vec_id"])
            for r in ivf_index_topk(
                # probe every cell: the test pins erasure, not recall
                corpus, q, ivfp, nprobe=32, k=3
            ).collect()
        ]

    assert ids()[0] == _TARGET
    # a column layout refuses deletion vectors (the cell is not
    # derivable from the key): erasure is the batch delete path
    with pytest.raises(ValueError, match="column"):
        layout_dv_delete(spark, corpus, _keys(spark, _TARGET))
    deletes = e.filter(F.col("vec_id") == _TARGET).select(
        "vec_id", "label"
    )
    column_layout_upsert(
        spark, corpus, e.filter(F.lit(False)), "vec_id", deletes=deletes
    )
    # source of truth rewritten: the candidate fetch excludes the key
    # even while the centroid table is still stale
    assert _TARGET not in ids()
    ivf_centroids_update(corpus, deletes.select("label"), ivfp)
    got = ids()
    assert _TARGET not in got and len(got) == 3


# --- read-while-maintain isolation (r16 verdict task 6) ------------------
#
# The generation-pinning law across an erasure, per tier:
#
# - HNSW: the blobs EMBED their vectors, so a reader pinned at
#   generation g is a FROZEN snapshot — it must keep serving the full
#   pre-erasure result set, untorn, while erasure + a new save commit
#   g+1. The flip side is the erasure-retention window: the erased
#   vector LIVES inside retained generation blobs until retention drops
#   them (vacuum/keep), which is why keep_generations bounds it.
# - IVF: the candidate fetch reads the LIVE corpus cells at query time,
#   so an erased key vanishes from EVERY pinned generation immediately —
#   a pinned centroids generation pins the probe geometry, never the
#   data. For erasure that is the desirable law (a right-to-be-forgotten
#   delete must not survive in time-travel reads); for reproducibility
#   it is the documented trade of the column-layout tier.


def test_hnsw_pinned_generation_is_untorn_across_erasure(
    spark, sf_dir, tmp_path
):
    from cinegraph_spark.operators.hnsw import (
        hnsw_index_knn,
        hnsw_index_save,
    )
    from cinegraph_spark.operators.serving_io import list_generations

    e = _emb(spark, sf_dir)
    idx = str(tmp_path / "idx")
    hnsw_index_save(e, idx, n_partitions=4, keep_generations=2)
    g = max(list_generations(spark, idx))
    q = spark.createDataFrame(
        [(-1, [float(x) for x in _target_query(e).first()["qv"]])],
        "vec_id long, v array<double>",
    )

    def nids(generation=None):
        return {
            int(r["nid"])
            for r in hnsw_index_knn(
                spark, idx, q, k=3, generation=generation
            ).collect()
        }

    before = nids()
    assert _TARGET in before
    # erasure + maintenance commit a NEW generation (the isolation-grade
    # maintenance path: a full versioned save; the in-place
    # hnsw_index_update documents its mutate-current contract)
    post = e.filter(F.col("vec_id") != _TARGET)
    hnsw_index_save(post, idx, n_partitions=4, keep_generations=2)
    assert max(list_generations(spark, idx)) > g
    # the g-pinned reader sees the FULL pre-erasure set — not torn, not
    # partially maintained
    assert nids(generation=g) == before
    # the default (newest) reader never sees the erased key, k stays full
    after = nids()
    assert _TARGET not in after and len(after) == 3


def test_ivf_erasure_reaches_pinned_generations(spark, sf_dir, tmp_path):
    from cinegraph_spark.operators.maintenance import column_layout_upsert
    from cinegraph_spark.operators.serving_io import list_generations
    from cinegraph_spark.operators.similarity import (
        ivf_centroids_save,
        ivf_corpus_layout,
        ivf_index_topk,
    )

    e = _emb(spark, sf_dir, with_label=True)
    ivfp, corpus = str(tmp_path / "ivf"), str(tmp_path / "corpus")
    ivf_centroids_save(e, ivfp, keep_generations=2)
    g = max(list_generations(spark, ivfp))
    ivf_corpus_layout(e, corpus)
    q = _target_query(e)

    def ids(generation=None):
        return [
            int(r["vec_id"])
            for r in ivf_index_topk(
                corpus, q, ivfp, nprobe=32, k=3, generation=generation
            ).collect()
        ]

    assert _TARGET in ids(generation=g)
    deletes = e.filter(F.col("vec_id") == _TARGET).select("vec_id", "label")
    column_layout_upsert(
        spark, corpus, e.filter(F.lit(False)), "vec_id", deletes=deletes
    )
    # the candidate fetch reads the LIVE corpus: the erased key is gone
    # from the g-pinned read too — erasure beats time-travel, by design
    got_pinned = ids(generation=g)
    assert _TARGET not in got_pinned and len(got_pinned) == 3
    got = ids()
    assert _TARGET not in got and len(got) == 3
