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


#: Driver-slot priority (round 6). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-6 rationale: (1) queries whose code or oracle changed this round —
#: the DSIR negative-zero fix, the streaming reader's micros-unit fix (the
#: round-6 testdata regenerated events.parquet as TIMESTAMP(MICROS); r4/r5
#: hash-failed text_dsir_importance and would have failed the stream join),
#: the LSH bucket cap, and the portable-SimHash refactor; (2) the whole
#: events family, whose shared read path (queries/util.py::_events) changed;
#: (3) rows-only re-checks; the budget's tail falls through to module order
#: (round-1 families lead there → oldest-pass regression canaries).
#: Every name here must exist in the registry — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- code/oracle changed in round 6: verify first --
    "text_dsir_importance",
    "stream_join_purchase_click_attribution",
    "stream_stateful_topk_per_user",
    "dedup_simhash_portable_buckets",  # new: bucketed-LSH exact oracle
    "ts_holt_linear_daily",  # new: applyInPandas recursion, recursive-CTE oracle
    "sketch_histogram_quantiles",  # new: portable histogram quantile sketch
    "layout_zorder_bucket_stats",  # new: Morton clustering extents
    "join_bloom_prefilter_effect",  # new: portable runtime-filter shape
    "stream_enrich_purchase_customer",  # new: stream-static broadcast join
    "strfn_fuzzy_name_pairs_blocked",  # new: blocked entity-resolution join
    "events_multigrain_time_rollup",  # new: grouping-sets time hierarchy
    "dq_constraint_report",  # new: single-pass publish-gate audit
    "src_stream_listing_pages",  # new: streaming Python data source drain
    "stats_robust_mad_outliers",  # new: MAD robust outlier gate
    "dedup_incremental_vs_snapshot",  # new: batch-vs-corpus ingestion dedup
    "udf_arrow_map_net_revenue",  # new: mapInArrow with in-UDF pre-agg
    "dedup_simhash_portable_hamming",  # refactored onto shared sig builder
    "dedup_minhash_lsh_pairs",  # bucket cap added (rows-only)
    "dedup_simhash_buckets",  # rows-only sibling of the new portable twin
    # -- events family: shared reader changed (micros-unit testdata) --
    "events_tumbling_5min",
    "events_sliding_10min_step5",
    "events_session_windows_30min",
    "events_dedup_latest_per_user_type",
    "events_asof_purchase_click",
    "events_rate_per_type_minute",
    "events_gapfill_hourly_ffill",
    "events_funnel_view_click_purchase",
    "events_retention_cohorts",
    "events_anomaly_zscore_hourly",
    "events_user_rfm_segments",
    "events_asof_nearest_click",
    "events_session_paths_topk",
    "events_asof_cogroup_pandas",
    "events_interval_overlap_pairs",
    "events_rolling_1h_range_frame",
    "events_scd2_user_state",
    "events_value_ewma_daily",
    "scalar_json_events",
    "scalar_datetime_parts_events",
    "scalar_variant_nested_events",
    "window_lag_lead_user_events",
    # -- rows-only re-checks (no oracle by design; see COVERAGE.md) --
    "cluster_graph_nodes",
    "cluster_membership",
    "cluster_children_of_root",
    "cluster_leaf_sizes",
    "vec_ann_pq_topk",
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
