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


#: Driver-slot priority (round 8). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-9 rationale — FINISH the oldest-green-first rotation (r7 swept
#: r1 + the r2 head, r8 swept the r2 remainder + the r3 head): after r8
#: exactly 50 queries remain with a latest check older than round 6 — 20
#: last checked in r3 (the TPC-H/subquery/window/sampling/packing tail)
#: and 30 last checked in r5 (the agg/join/window/setop/scalar/media/udf
#: families) — one full 50-slot round. They fill every slot, oldest
#: bucket first, registry order within each bucket (freshness computed
#: from CORRECTNESS_r0*.json). Round-9 changed-code canaries (the
#: parquet-drain hardening touching the five streaming queries + ingest
#: composite, the adaptive-partition HNSW, and the sub-shard packing —
#: all oracle-identical by design AND covered by the local
#: test_oracle_parity mirror) queue immediately after the 50: the
#: packing pair is already inside the stale set, and displacing an
#: r3-stale slot for an r8-green re-check would leave the rotation
#: permanently unfinished. After this round no query's latest check is
#: older than r5. Every name here must exist in the registry — load_all
#: asserts.
DRIVER_PRIORITY: tuple[str, ...] = (
    # last checked round 3 (registry order — the 20 names the r8 budget
    # cut off) — includes pack_chunks/pack_chunk_manifest, whose
    # prefix-sum becomes sub-sharded this round (oracle-identical; the
    # driver row doubles as the canary)
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
    # last checked round 5 (registry order)
    "agg_rollup_region_nation",
    "agg_cube_status_priority",
    "agg_grouping_sets",
    "join_inner_order_totals_per_segment",
    "join_left_customers_order_counts",
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
    "agg_regr_corr_stats",
    "join_lateral_top2_customers_per_nation",
    "join_merge_cdc_customer_orders",
    "join_right_orders_all_customers",
    "media_frame_sample_plan",
    "media_kind_profile",
    "media_payload_checksums",
    "sketch_hll_distinct_users",
    "src_paginated_listing_decades",
    "udf_pandas_grouped_agg_gini",
    "udf_pandas_scalar_net_revenue",
    # --- 50-slot budget line ---
    # brand-new round-9 query (no driver row yet), then changed-code
    # canaries: the streaming queries + ingest composite ride the
    # hardened idempotent parquet drain; the partitioned HNSW derives
    # n_partitions from corpus size
    "vec_ann_hnsw_served_knn",
    "stream_retention_cohorts",
    "stream_join_purchase_click_attribution",
    "stream_enrich_purchase_customer",
    "stream_stateful_topk_per_user",
    "src_stream_listing_pages",
    "pipeline_ingest_dedup_retention",
    "vec_ann_hnsw_partitioned_knn",
    # its broadcast twin rides the same refactored score-emit helper
    "vec_ann_hnsw_knn",
    # brand-new round-9 queries #2/#3 (no driver row yet): cross-doc
    # repeated span removal + token-budget greedy selection — must lead
    # round 10 with vec_ann_hnsw_served_knn if the r9 budget cuts before
    # these slots
    "dedup_repeated_span_mask",
    "sample_token_budget_greedy",
    "text_vocab_oov_rate",
    # NB dedup_minhash_portable_est sits in the stale-50 head above AND is
    # an r9 changed-code canary (its signature builder was factored into
    # _portable_minhash_sigs, shared with the incremental screen) — its
    # driver row this round re-proves the refactor
    "dedup_minhash_incremental_screen",
    # streaming admission gate (foreachBatch transform drain; not in the
    # bench headline — see its docstring)
    "pipeline_stream_neardup_gate",
    "sample_global_shuffle_order",
    # S3 sink as a real Python DataSource WRITER (staged commit/abort);
    # headline-excluded: 5000 tiny files cost ~14 s at sf0.1 — sink
    # machinery, not query dataflow
    "src_textsink_roundtrip",
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
