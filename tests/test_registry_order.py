"""Pin the driver-facing registry order (load-bearing: the driver's
correctness harness checks ~50 queries per round in registration order).

Round-4 contract: the 17 queries never driver-checked in rounds 1-3 occupy
slots 0-16, the rows-only set re-checks next, and the fallback tail starts
with the oldest (round-1) passes as regression canaries.
"""

from __future__ import annotations

from cinegraph_spark.queries import DRIVER_PRIORITY, load_all


def test_priority_slots_lead_registry():
    names = list(load_all().keys())
    assert tuple(names[: len(DRIVER_PRIORITY)]) == DRIVER_PRIORITY


def test_never_checked_17_occupy_first_slots():
    never_checked = {
        "agg_regr_corr_stats",
        "events_asof_cogroup_pandas",
        "events_interval_overlap_pairs",
        "events_rolling_1h_range_frame",
        "events_scd2_user_state",
        "events_value_ewma_daily",
        "join_lateral_top2_customers_per_nation",
        "join_merge_cdc_customer_orders",
        "join_right_orders_all_customers",
        "media_frame_sample_plan",
        "media_kind_profile",
        "media_payload_checksums",
        "sketch_hll_distinct_users",
        "src_paginated_listing_decades",
        "text_dsir_importance",
        "udf_pandas_grouped_agg_gini",
        "udf_pandas_scalar_net_revenue",
    }
    names = list(load_all().keys())
    assert set(names[:17]) == never_checked


def test_load_all_idempotent_order():
    first = list(load_all().keys())
    second = list(load_all().keys())
    assert first == second


def test_no_duplicate_names():
    names = list(load_all().keys())
    assert len(names) == len(set(names))
