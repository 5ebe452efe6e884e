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
ROTATION_BUILT_FROM_ROUND: int = 13

#: Changed-code canaries: queries whose underlying implementation changed
#: since their last driver row. They are allowed to jump the pure
#: freshness order (the test exempts exactly these names from the
#: non-decreasing-freshness invariant) but must sit inside the 50-slot
#: budget.  Round-14: every serving-state LOADER gained read-side
#: crash-window auto-recovery (`serving_io.ensure_live` at the top of
#: hnsw_index_knn / ivf_index_topk / _pq_read_state / layout_meta and
#: the hnsw/ivf update paths — the r13 verdict's task 2; the review
#: pass later made the restore rename race-safe), and the
#: outer-attribution drain was refactored into a shared helper when the
#: full-outer form landed. Output is oracle-identical by design
#: (ensure_live is a no-op when the state path exists — pinned with
#: crash-window round-trips in tests/test_serving_io.py); one canary
#: per touched loader re-proves it under the real driver.
CHANGED_CODE_CANARIES: tuple[str, ...] = (
    "vec_ann_hnsw_served_knn",
    "vec_ann_hnsw_incremental_knn",
    "vec_ann_ivf_incremental_topk",
    "vec_ann_ivf_filtered_topk",
    "vec_ann_pq_served_topk",
    "layout_clustered_upsert_roundtrip",
    "stream_join_left_outer_attribution",
)

#: Driver-slot priority (round 14). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-14 rationale — per the r13 verdict's tasks 1-3: the seven
#: read-side-recovery canaries lead (one per touched serving-state
#: loader), then the ten never-driver-checked queries (the full-outer
#: stream-stream join completing the streaming join surface, the
#: spec-faithful q15 tie twin, the vacuum-retention round-trip, the
#: HNSW/PQ filtered searches completing the pre-filter contract across
#: all ANN tiers, the CDC-retraction MV refresh at both cadences, the
#: SQL-scripting procedure report, and the incremental HLL-distinct
#: and histogram-quantile views), then the ENTIRE r9-stale bucket
#: the r13 verdict named (20 queries — freshness floor rises to r10),
#: then the r10 bucket oldest-first (registry order within the bucket).
#: 7 + 10 + 33 = 50.
#: Every name here must exist in the registry — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = CHANGED_CODE_CANARIES + (
    # never driver-checked
    "stream_join_full_outer_attribution",
    "q15_top_supplier_ties",
    "layout_vacuum_retention_roundtrip",
    "vec_ann_hnsw_filtered_knn",
    "vec_ann_pq_filtered_topk",
    "agg_incremental_mv_retract",
    "stream_mv_cdc_retract",
    "script_trailing_quarter_report",
    "agg_incremental_mv_hll_distinct",
    "agg_incremental_mv_hist_quantiles",
    # last checked round 9 (registry order)
    "sample_stratified_topn_per_source",
    "sample_lang_quota",
    "pack_chunks_per_source",
    "pack_chunk_manifest",
    "vec_mips_topk",
    "text_domain_mix_weights",
    "text_bigram_surprisal",
    "sample_train_val_test_split",
    "dedup_minhash_portable_est",
    "sketch_countmin_heavy_hitters",
    "join_lateral_top2_customers_per_nation",
    "sketch_hll_distinct_users",
    "agg_regr_corr_stats",
    "join_merge_cdc_customer_orders",
    "udf_pandas_scalar_net_revenue",
    "udf_pandas_grouped_agg_gini",
    "src_paginated_listing_decades",
    "media_payload_checksums",
    "media_frame_sample_plan",
    "media_kind_profile",
    # last checked round 10 (registry order)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume_by_nation",
    "agg_distinct_parts_per_supplier",
    "window_lag_lead_user_events",
    "scalar_json_events",
    "scalar_datetime_parts_events",
    "strfn_fuzzy_name_pairs_blocked",
    "vec_ann_pq_topk",
    "sample_token_budget_greedy",
    "text_vocab_oov_rate",
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
