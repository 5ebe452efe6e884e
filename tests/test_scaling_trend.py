"""Measured scale-trend smoke for the capped quadratic families.

Several queries are *structurally* quadratic (pair discovery: LSH banding,
shingle-Jaccard self-join, interval overlap) but carry explicit caps that
bound their work and output to ~linear in the input (bucket cap 64,
shingle max-DF 20, interval banding). The 100 TB design claims rest on
those caps — this test turns the claims into a measured trend: run each
family at sf0.01 and sf0.1 (a 10x input step: documents 500 -> 5000,
events 10k -> 100k) and assert output rows and wall time grow roughly
linearly, not quadratically.

The pins are deliberately LOOSE (slack 4x on a 10x step): local[32] wall
time at these sizes is mostly fixed overhead and JVM noise, and output
density depends on the fixture's planted-dup rate. What the test must
catch is the failure mode where a cap regresses and a family silently
goes quadratic — a 10x input step then shows ~100x growth, far outside
any slack here. sf0.01 runs first so codegen warm-up is charged to the
small run (biasing the RATIO conservative... i.e. toward passing — the
trend bound, not the absolute time, is the signal).
"""

from __future__ import annotations

import os
import time

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
SF_BIG = os.environ.get("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")

#: input step between the two SFs (documents 500->5000, events 10k->100k)
INPUT_RATIO = 10.0
#: slack multiplier on the linear bound — quadratic growth would be ~100x
SLACK = 4.0

FAMILIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "events_interval_overlap_pairs",
    # hierarchical packing (r8): output is 1 row/doc by construction; the
    # trend guards the prefix-sum staying sharded — a regression to the
    # flat per-split window shows up as wall time tracking corpus size
    # through one reducer rather than the partition count
    "pipeline_training_data_prep",
    # r9 additions (VERDICT r8 task 5): the ingest composite (2 streaming
    # drains + anti-join dedup + cohort report — output is a fixed-ish
    # cohort triangle, work is ~linear in events) and the scatter-gather
    # HNSW (output fixed at n_queries*k; sub-index builds are
    # partition-local, so wall tracks corpus/partitions, not corpus²)
    "pipeline_ingest_dedup_retention",
    "vec_ann_hnsw_partitioned_knn",
    # r9 additions: repeated-span removal (1 row/doc out; the dup-gram
    # join is occurrence-bounded — a regression to pair emission would
    # track gram-frequency², not corpus), the incremental MinHash screen
    # (1 row/incoming doc; band-join fan-out is LSH-bounded), and the
    # token-budget selection (rows track the 40% budget; a regression to
    # the one-reducer global window tracks corpus through one task)
    "dedup_repeated_span_mask",
    "dedup_minhash_incremental_screen",
    "sample_token_budget_greedy",
    # r13 additions: the serving-maintenance scenario (layout save +
    # upsert + pruned update + search — every stage is partition-local,
    # so wall tracks corpus/partitions; a regression that re-introduced
    # a full-corpus scan or write per delta would track corpus through
    # one path and break the ratio at bigger steps, while output stays
    # fixed at n_queries*k) and the clustered-layout upsert round-trip
    # (output is 1 row/doc; touched-directory replacement keeps work
    # ~linear in the upsert+delete volume, which scales with the corpus
    # in this scenario)
    "vec_ann_hnsw_incremental_knn",
    "layout_clustered_upsert_roundtrip",
    # the IVF-tier maintenance scenario (cell layout + cell upsert +
    # pruned update + pruned search): every stage is cell-local, so wall
    # tracks corpus/cells; output fixed at k rows
    "vec_ann_ivf_incremental_topk",
    # r13 late additions: the incremental-MV refresh (base agg + delta
    # agg + state-sized merge — output is the group count, work ~linear
    # in facts; a regression that re-scanned base facts per refresh
    # would track facts×refreshes) and the left-outer stream join
    # (output ~1 row per purchase(+matches); watermark-bounded state
    # keeps per-batch work linear in arrivals — unbounded state growth
    # would show superlinear wall on the step)
    "agg_incremental_mv_refresh",
    "stream_join_left_outer_attribution",
    # the streaming MV twin: output is the fixed (type, day) grid; work
    # per batch is a partial agg + state-sized merge — a regression that
    # re-scanned landed history per batch would grow superlinearly
    "stream_mv_incremental_refresh",
    # dynamic-gap sessions: output ~ events/sessions (linear); the
    # session-window state machine is per-user-partition local — a
    # regression to cross-user state or per-event window re-merges
    # would track events² through the state store
    "stream_session_dynamic_gap",
    # r14 additions: the filtered HNSW serving search (output fixed at
    # n_queries*k; work = |admissible| exact scores across the touched
    # sub-indexes — a regression that unpickled every blob or scored
    # the full corpus would track corpus, not admissible share), the
    # full-outer stream join (output ~ purchases + unmatched clicks,
    # linear; both sides' state is watermark-bounded), and the CDC
    # retraction MV at both cadences (output is the surviving group
    # grid; work ~linear in facts + retracted facts — a regression that
    # rescanned base facts per retraction would track facts×batches)
    "vec_ann_hnsw_filtered_knn",
    "stream_join_full_outer_attribution",
    "agg_incremental_mv_retract",
    "stream_mv_cdc_retract",
    # r15 additions: the exact-regime PQ maintenance cycle (output fixed
    # at k; work = save + touched-directory re-encode + |corpus| exact
    # rerank — a regression that re-encoded untouched directories or
    # paid per-delta full scans would track corpus×batches), the
    # generation rollback read (output is the lang group grid; work =
    # two layout saves + one generation-pinned aggregate — a regression
    # that copied or rewrote retained generations on publish would track
    # corpus×generations), and the MV schema evolution (output is the
    # priority grid; work ~linear in facts + group-cardinality widening
    # — a regression that rebuilt the view from base facts on evolve
    # would track facts×measures)
    "vec_ann_pq_incremental_topk",
    "layout_generation_rollback_read",
    "agg_incremental_mv_evolve",
]


@pytest.fixture(scope="module")
def registry():
    from cinegraph_spark.queries import load_all

    return load_all()


@pytest.mark.parametrize("name", FAMILIES)
def test_capped_family_scales_linearly(spark, registry, name):
    if not (os.path.isdir(SF_SMALL) and os.path.isdir(SF_BIG)):
        pytest.skip("both sf0.01 and sf0.1 testdata dirs required")
    spec = registry[name]

    def run(sf_dir):
        t0 = time.perf_counter()
        n = spec.spark(spark, sf_dir).count()
        return n, time.perf_counter() - t0

    n_small, t_small = run(SF_SMALL)
    n_big, t_big = run(SF_BIG)
    assert n_small > 0, f"{name}: vacuous at {SF_SMALL} — fixture changed?"

    row_ratio = n_big / n_small
    assert row_ratio <= INPUT_RATIO * SLACK, (
        f"{name}: output rows grew {row_ratio:.1f}x on a {INPUT_RATIO:.0f}x "
        f"input step ({n_small} -> {n_big}) — cap regressed to quadratic?"
    )

    # floor the small time: at sf0.01 wall is fixed overhead; a tiny
    # denominator would make the ratio meaningless noise
    time_ratio = t_big / max(t_small, 0.5)
    assert time_ratio <= INPUT_RATIO * SLACK, (
        f"{name}: wall time grew {time_ratio:.1f}x on a {INPUT_RATIO:.0f}x "
        f"input step ({t_small:.2f}s -> {t_big:.2f}s) — quadratic work?"
    )


def test_interval_overlap_output_bounded_by_bucket_geometry(spark, registry):
    """The ABSOLUTE law behind events_interval_overlap_pairs' burst cap —
    stronger than the 10x-step ratio above, and distribution-independent:
    however bursty or zipf-skewed the stream, output pairs can never
    exceed the sum, over the BINNED relation's (user, bin) buckets (each
    event sits in its 1-2 touched bins, exactly as the query replicates),
    of C(min(count, CAP), 2). On a zipf sf1 step the RATIO law
    legitimately fails below cap saturation (r17: 64.2x on a 10x step,
    11.77M pairs inside the bucket-geometry bound) — this law is what
    the cap actually promises."""
    if not os.path.isdir(SF_SMALL):
        pytest.skip("testdata dir required")
    from pyspark.sql import functions as F

    from cinegraph_spark.queries.analytics import _OVL_CAP, _OVL_US
    from cinegraph_spark.queries.util import T

    n = registry["events_interval_overlap_pairs"].spark(
        spark, SF_SMALL
    ).count()
    e = T(spark, SF_SMALL, "events")
    ep = F.expr(
        "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
    )
    c = F.least(F.count("*"), F.lit(_OVL_CAP))
    bound = (
        e.select("user_id", ep.alias("ep"))
        .select(
            "user_id",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.expr(f"ep div {_OVL_US}"),
                        F.expr(f"(ep + {_OVL_US - 1}) div {_OVL_US}"),
                    )
                )
            ).alias("bin"),
        )
        .groupBy("user_id", "bin")
        .agg((c * (c - 1) / 2).alias("p"))
        .agg(F.sum("p"))
        .first()[0]
    )
    assert n <= bound, (n, bound)
