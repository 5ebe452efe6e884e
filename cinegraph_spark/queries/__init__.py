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


#: Freshness snapshot the current rotation was derived from: per-query
#: latest-driver-check rounds computed over CORRECTNESS_r01..r{N}.json for
#: this N. tests/test_registry_order.py re-derives the stale buckets from
#: exactly these files and asserts DRIVER_PRIORITY matches — bump this
#: constant whenever the rotation is rebuilt for a new round, and the test
#: re-validates the new order against the new data with zero literal pins.
ROTATION_BUILT_FROM_ROUND: int = 14

#: Changed-code canaries: queries whose underlying implementation changed
#: since their last driver row. They are allowed to jump the pure
#: freshness order (the test exempts exactly these names from the
#: non-decreasing-freshness invariant) but must sit inside the 50-slot
#: budget.  Round-15: the r14 ADVICE findings landed — the filtered
#: HNSW search dropped its unused per-blob Xn normalization
#: (`hnsw_index_filtered_knn`), merge_agg_state's negative-bin refusal
#: now runs whenever hist_maps is provided, and the swap/vacuum pair
#: gained writer-side race detection plus a storage-clock probe
#: (`serving_io`). Output is oracle-identical by design; one canary per
#: touched path re-proves it under the real driver.
CHANGED_CODE_CANARIES: tuple[str, ...] = (
    "vec_ann_hnsw_filtered_knn",
    "agg_incremental_mv_hist_quantiles",
    "layout_vacuum_retention_roundtrip",
)

#: Driver-slot priority (round 15). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-15 rationale — per the r14 verdict's task 1: the three
#: changed-code canaries lead, then the nine never-driver-checked
#: queries (the exact-oracle PQ incremental maintenance cycle closing
#: the r14 verdict's task 2, the versioned-generation rollback read
#: closing task 4, the MV schema-evolution round-trip closing task 7,
#: the five second-session r15 additions — the IVF and PQ streaming
#: maintenance drains, the bounded weighted SSSP, the versioned-MV
#: time-travel read, the KMV set-operation sketch — and the five
#: third-session additions: the deletion-vector round-trip, the
#: optimistic-concurrency commit retry, the content-defined-chunking
#: overlap report, the streaming erasure drain, and the generation CDC
#: diff, plus the write-side-expectations roundtrip), then the r10-stale
#: bucket the r14 verdict named in registry order — 33 of its 36 fit
#: the budget; the last three (events_multigrain_time_rollup,
#: dq_constraint_report, stats_robust_mad_outliers) carry to r16, so
#: the freshness floor stays r10 for exactly those three.
#: 3 + 14 + 33 = 50.
#: Every name here must exist in the registry — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = CHANGED_CODE_CANARIES + (
    # never driver-checked
    "vec_ann_pq_incremental_topk",
    "layout_generation_rollback_read",
    "agg_incremental_mv_evolve",
    "vec_ann_ivf_stream_update_topk",
    "graph_sssp_weighted",
    "agg_incremental_mv_rollback_read",
    "vec_ann_pq_stream_update_topk",
    "sketch_kmv_distinct_overlap",
    "layout_dv_delete_read",
    "layout_occ_commit_retry",
    "dedup_cdc_chunk_overlap",
    "layout_dv_stream_erasure",
    "layout_generation_cdc_diff",
    "layout_write_expectations",
    # last checked round 10 (registry order)
    "dedup_repeated_span_mask",
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
    "sample_global_shuffle_order",
    "events_retention_cohorts",
    "events_anomaly_zscore_hourly",
    "events_user_rfm_segments",
    "events_asof_nearest_click",
    "dedup_minhash_incremental_screen",
    "pipeline_stream_neardup_gate",
    "dedup_simhash_portable_hamming",
    "dedup_simhash_portable_buckets",
    "events_session_paths_topk",
    "events_value_ewma_daily",
    "events_asof_cogroup_pandas",
    "events_rolling_1h_range_frame",
    "events_interval_overlap_pairs",
    "events_scd2_user_state",
    "udf_arrow_map_net_revenue",
    "src_textsink_roundtrip",
    "ts_holt_linear_daily",
    "sketch_histogram_quantiles",
    "join_bloom_prefilter_effect",
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
