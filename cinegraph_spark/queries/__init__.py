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
ROTATION_BUILT_FROM_ROUND: int = 12

#: Changed-code canaries: queries whose underlying implementation changed
#: since their last driver row. They are allowed to jump the pure
#: freshness order (the test exempts exactly these names from the
#: non-decreasing-freshness invariant) but must sit inside the 50-slot
#: budget.  Round-13: the whole serving-maintenance family was re-plumbed
#: onto partition-pruned corpus layouts (the r12 verdict's weak finding):
#: hnsw_index_update / pq_codes_update / ivf_centroids_update gained a
#: corpus-as-layout-path mode with PartitionFilters-pruned reads, the
#: three incremental queries now exercise it end-to-end, the streaming
#: sink lands arrivals as latest-wins layout merges instead of
#: accumulating batch directories (per-batch cost now bounded — the r12
#: advisory), and the reshard query rides because it calls the changed
#: hnsw_index_update internally. Output is oracle-identical by design
#: (bit-equality with DataFrame mode and full saves pinned in
#: tests/test_hnsw.py / test_ivf_serving.py / test_pq_serving.py).
CHANGED_CODE_CANARIES: tuple[str, ...] = (
    "vec_ann_hnsw_incremental_knn",
    "vec_ann_ivf_incremental_topk",
    "vec_ann_pq_served_topk",
    "vec_ann_hnsw_stream_update_knn",
    "vec_ann_hnsw_reshard_knn",
)

#: Driver-slot priority (round 13). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-13 rationale — per the r12 verdict's tasks 1-3: the five
#: layout-re-plumbed serving-maintenance canaries lead, then the eight
#: never-driver-checked queries (the clustered-layout upsert round-trip,
#: the small-file compaction round-trip, the streaming-ingest landed-zone
#: compaction composite, and the five late-round additions — the
#: left-outer stream-stream join, the incremental materialized-aggregate
#: refresh batch + streaming twins, the weighted-WOR sampler, and the
#: pre-filter vector search — each under its own exact oracle), then the
#: five r8-stale queries the r12 verdict named (draining the oldest
#: bucket entirely — freshness floor rises to r9), then the r9 bucket
#: oldest-first (registry order within the bucket). 5 + 10 + 35 = 50; the
#: remaining 20 r9 queries head the r14 queue (wave-3 added the filtered
#: IVF serving search, wave-4 the dynamic-gap session stream).
#: Every name here must exist in the registry — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = CHANGED_CODE_CANARIES + (
    # never driver-checked
    "layout_clustered_upsert_roundtrip",
    "layout_compact_small_files_stats",
    "pipeline_stream_ingest_compact",
    "stream_join_left_outer_attribution",
    "agg_incremental_mv_refresh",
    "sample_weighted_wor_topk",
    "vec_ann_filtered_topk",
    "stream_mv_incremental_refresh",
    "vec_ann_ivf_filtered_topk",
    "stream_session_dynamic_gap",
    # last checked round 8 (registry order)
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "pipeline_training_data_prep",
    "src_stream_listing_pages",
    "media_feature_extract",
    # last checked round 9 (registry order)
    "agg_rollup_region_nation",
    "agg_cube_status_priority",
    "agg_grouping_sets",
    "join_inner_order_totals_per_segment",
    "join_left_customers_order_counts",
    "join_right_orders_all_customers",
    "join_full_outer_customer_supplier_nations",
    "join_semi_customers_with_open_orders",
    "join_anti_customers_without_orders",
    "join_broadcast_part_lineitem",
    "join_range_theta_price_band",
    "window_topk_orders_per_customer",
    "window_rank_dense_rank",
    "window_running_revenue_per_customer",
    "window_range_frame_acctbal",
    "sort_topk_orders_global",
    "setop_union_intersect_except",
    "setop_intersect_all_linestatus",
    "scalar_orders_by_month",
    "scalar_case_bucketing",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_idle_rich_customers",
    "subq_scalar_orders_above_avg",
    "subq_correlated_top_heavy_customers",
    "subq_not_exists_parts_unordered_1997",
    "window_ntile_percent_cume",
    "window_first_last_nth_order",
    "agg_minby_maxby_nation",
    "sample_hash_mod_documents",
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
