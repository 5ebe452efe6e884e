"""The declared query registry — the engine's test/correctness surface.

Every implemented operator from SURVEY §2 is declared here as a
:class:`QuerySpec`: a named Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The driver's
harness and the local pytest suite both consume this registry, so local
green == driver green.

Conventions (driver contract, see repo README / __spark_entry__.py):

- every computed column is aliased identically in Spark and SQL;
- float aggregates are rounded to a fixed number of decimals on BOTH sides
  (cross-engine double summation differs in the last ulp);
- timestamps in result sets are projected as strings/ints (epoch parts), so
  no engine-specific timezone or datetime encoding can leak into the hash;
- top-k queries always order by a unique tiebreaker before LIMIT so the
  returned *set* is deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered views, or None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: register fn(spark, sf_dir)->DataFrame under ``name``."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


#: Driver-slot priority (round 10). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-10 rationale — exactly per the r9 verdict's tasks 1–2: the 8
#: round-9 queries that are registered and local-oracle-green but absent
#: from every CORRECTNESS_r*.json LEAD (their first driver rows are this
#: round's gate), then the 42-query r6-stale bucket (the oldest latest
#: check after r9 — computed fresh from CORRECTNESS_r0*.json, registry
#: order). 8 + 42 = one full 50-slot round; after it no query's latest
#: check is older than r7. Round-10 changed-code canaries queue after the
#: budget line: the textsink hardening (fail-loud manifest, fname
#: validation, atomic manifest rename) rides src_textsink_roundtrip in
#: the lead-8; graph_cc_neardup_clusters re-queues if its endpoint-union
#: plan changes. Every name here must exist in the registry — load_all
#: asserts.
DRIVER_PRIORITY: tuple[str, ...] = (
    # never driver-checked (registered in r9) — first rows required
    "vec_ann_hnsw_served_knn",
    "dedup_repeated_span_mask",
    "sample_token_budget_greedy",
    "text_vocab_oov_rate",
    "dedup_minhash_incremental_screen",
    "pipeline_stream_neardup_gate",
    "sample_global_shuffle_order",
    "src_textsink_roundtrip",
    # last checked round 6 (registry order) — the oldest-green bucket
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume_by_nation",
    "agg_distinct_parts_per_supplier",
    "window_lag_lead_user_events",
    "scalar_json_events",
    "scalar_datetime_parts_events",
    "strfn_fuzzy_name_pairs_blocked",
    "vec_ann_pq_topk",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_buckets",
    "events_sliding_10min_step5",
    "events_session_windows_30min",
    "events_dedup_latest_per_user_type",
    "events_asof_purchase_click",
    "events_rate_per_type_minute",
    "events_gapfill_hourly_ffill",
    "events_funnel_view_click_purchase",
    "cluster_graph_nodes",
    "cluster_membership",
    "cluster_children_of_root",
    "cluster_leaf_sizes",
    "scalar_variant_nested_events",
    "events_retention_cohorts",
    "events_anomaly_zscore_hourly",
    "events_user_rfm_segments",
    "events_asof_nearest_click",
    "dedup_simhash_portable_hamming",
    "dedup_simhash_portable_buckets",
    "events_session_paths_topk",
    "events_value_ewma_daily",
    "events_asof_cogroup_pandas",
    "events_rolling_1h_range_frame",
    "events_interval_overlap_pairs",
    "events_scd2_user_state",
    "udf_arrow_map_net_revenue",
    "ts_holt_linear_daily",
    "sketch_histogram_quantiles",
    "join_bloom_prefilter_effect",
    "events_multigrain_time_rollup",
    "dq_constraint_report",
    "stats_robust_mad_outliers",
    # --- 50-slot budget line ---
    # round-10 changed-code canaries (oracle-identical by design, local
    # test_oracle_parity covers them; driver rows only if budget allows):
    # graph_cc_neardup_clusters if the endpoint-union distinct is folded
    # into the symmetrized-edge checkpoint (verdict task 5)
    "graph_cc_neardup_clusters",
    "graph_cc_star_neardup_clusters",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return
    the registry reordered for the driver's ~50-query/round budget.

    Order is explicit: :data:`DRIVER_PRIORITY` names first (the queries that
    most need a driver-green row this round), then every remaining query in
    module import order — which is arranged oldest-verified-first (round-1
    families lead) so the budget's tail re-checks the oldest passes as
    regression canaries. Query modules must not import each other at module
    level except via non-registering shared modules (util, neardup_common) —
    a cross-module import triggers the imported module's registrations
    mid-family and silently scrambles the fallback order.
    """
    from cinegraph_spark.queries import (  # noqa: F401
        relational,
        strings,
        pipeline,
        tree,
        vectors,
        textstats,
        dedup,
        events,
        graph,
        tpch_extra,
        cluster,
        relational_extra,
        sampling,
        packing,
        analytics,
        udfs,
        pysource,
        multimodal,
        timeseries,
        layout,
        quality,
    )

    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
