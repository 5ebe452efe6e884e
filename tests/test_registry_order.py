"""Pin the driver-facing registry order (load-bearing: the driver's
correctness harness checks ~50 queries per round in registration order).

Round-8 contract: the oldest-green-first rotation continues. The front
slots hold the six queries whose code changed this round (the five
streaming queries now draining through the parquet file sink, and the
training-prep composite's hierarchical packing), then every query last
driver-checked in r2, then r3 — registry order within each bucket — so
the ~50-slot budget re-verifies the longest-unchecked tail against
current testdata. Freshness per round is computed from
CORRECTNESS_r0*.json (r7 swept all of r1 and the r2 head).
"""

from __future__ import annotations

from cinegraph_spark.queries import DRIVER_PRIORITY, load_all


def test_priority_slots_lead_registry():
    names = list(load_all().keys())
    assert tuple(names[: len(DRIVER_PRIORITY)]) == DRIVER_PRIORITY


def test_round8_changed_then_stalest_lead():
    """The six changed-code canaries occupy the front; the r2 remainder
    fills the budget right after them; the r3 bucket follows; nothing
    checked green in r5-r7 consumes a budget slot beyond the canaries."""
    names = list(load_all().keys())
    front = names[:10]
    for leading in (
        "stream_retention_cohorts",
        "stream_join_purchase_click_attribution",
        "stream_enrich_purchase_customer",
        "stream_stateful_topk_per_user",
        "src_stream_listing_pages",
        "pipeline_training_data_prep",
        # brand-new r8 queries: first driver row outranks stale re-checks
        "pipeline_ingest_dedup_retention",
        "agg_percentiles_price_tdigest",
        "vec_ann_hnsw_knn",
        "vec_ann_hnsw_partitioned_knn",
    ):
        assert leading in front
    # the r2 tail starts immediately after the 10-slot head
    assert names[10] == "vec_centroid_shift_labels"
    budget = set(names[:50])
    # the stalest families are inside the budget
    assert "media_feature_extract" in budget
    assert "dedup_exact_groups" in budget
    assert "graph_pagerank_copurchase" in budget
    assert "q6_forecast_revenue" in budget
    # r5-r7-green queries (non-canary) stay out of the budget
    assert "ts_holt_linear_daily" not in budget
    assert "sketch_histogram_quantiles" not in budget
    assert "events_scd2_point_in_time" not in budget


def test_load_all_idempotent_order():
    first = list(load_all().keys())
    second = list(load_all().keys())
    assert first == second


def test_no_duplicate_names():
    names = list(load_all().keys())
    assert len(names) == len(set(names))
