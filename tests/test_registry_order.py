"""Pin the driver-facing registry order (load-bearing: the driver's
correctness harness checks ~50 queries per round in registration order).

Round-7 contract: an oldest-green-first regression sweep. The front slots
hold (1) the queries whose code or oracle changed this round (incremental
-dedup signature derivation, z-order clamp, listing-stream read()
contract) plus three round-6 canaries, then (2) every query last
driver-checked in r1, r2, r3 — in that round order — so the ~50-slot
budget re-verifies the longest-unchecked registry tail against current
testdata. Freshness per round is recorded in NOTES.md.
"""

from __future__ import annotations

from cinegraph_spark.queries import DRIVER_PRIORITY, load_all


def test_priority_slots_lead_registry():
    names = list(load_all().keys())
    assert tuple(names[: len(DRIVER_PRIORITY)]) == DRIVER_PRIORITY


def test_round7_changed_then_stalest_lead():
    """Changed-this-round queries, the brand-new round-7 queries (first
    driver row outranks a stale re-check), and the r6 canaries occupy the
    front; the r1-era families (strfn/pipeline/skew/agg-pivot) fill the
    budget right after them; nothing checked green in r5/r6 consumes a
    budget slot beyond the canaries."""
    names = list(load_all().keys())
    front = names[:10]
    for leading in (
        "dedup_incremental_vs_snapshot",
        "layout_zorder_bucket_stats",
        "src_stream_listing_pages",
        "stream_retention_cohorts",
        "events_scd2_point_in_time",
        "dedup_embedding_cc_survivors",
        "pipeline_training_data_prep",
        "text_dsir_importance",
    ):
        assert leading in front
    # the r1 tail starts immediately after the 10-slot head
    assert names[10] == "skew_salted_agg_revenue_per_priority"
    budget = set(names[:50])
    # the stalest families are inside the budget
    assert "strfn_clean_chain" in budget
    assert "pipeline_token_windows" in budget
    assert "tree_build_graph" in budget
    # r5/r6-green queries (non-canary) stay out of the budget
    assert "ts_holt_linear_daily" not in budget
    assert "sketch_histogram_quantiles" not in budget


def test_load_all_idempotent_order():
    first = list(load_all().keys())
    second = list(load_all().keys())
    assert first == second


def test_no_duplicate_names():
    names = list(load_all().keys())
    assert len(names) == len(set(names))
