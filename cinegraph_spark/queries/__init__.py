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


#: Driver-slot priority (round 4). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order:
#: first the 17 queries rounds 1–3 never reached (all local-parity green),
#: then new round-4 queries, then re-checks of the rows-only set, leaving
#: the tail of the budget for the oldest round-1 passes as regression
#: canaries. Every name here must exist in the registry — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked through r3 (CORRECTNESS_r01–r03) --
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
    # -- new in round 4 (exact oracles, never checked) --
    # (appended by their modules below as they are added)
    # -- rows-only re-checks (no oracle by design; see COVERAGE.md) --
    "cluster_graph_nodes",
    "cluster_membership",
    "cluster_children_of_root",
    "cluster_leaf_sizes",
    "vec_ann_pq_topk",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_buckets",
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
    )

    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
