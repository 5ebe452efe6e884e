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
#: Round-8 rationale — continue the oldest-green-first rotation begun in
#: r7 (which swept all of r1 and the r2 head): (1) six canaries whose
#: code changed THIS round — the five streaming queries now draining
#: through the parquet file sink instead of the memory sink, and the
#: training-prep composite whose packing prefix-sum became hierarchical
#: (both changes are oracle-identical by design; the driver row proves
#: it); (2) the r2 remainder (vec/text/dedup/media tail), then every
#: query last checked in r3 (graph, TPC-H, subquery, window, sampling,
#: packing families), preserving registry order within each round bucket
#: (freshness per round computed from CORRECTNESS_r0*.json). 6+21+39 =
#: 66 names; the ~50-slot budget cuts off mid-r3 and the r3 remainder
#: queues first for round 9. Every name here must exist in the registry
#: — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = (
    # round-8 changed-code canaries (parquet drain / hierarchical packing)
    "stream_retention_cohorts",
    "stream_join_purchase_click_attribution",
    "stream_enrich_purchase_customer",
    "stream_stateful_topk_per_user",
    "src_stream_listing_pages",
    "pipeline_training_data_prep",
    # brand-new round-8 queries (no driver row yet — first check outranks
    # a stale re-check)
    "pipeline_ingest_dedup_retention",
    "agg_percentiles_price_tdigest",
    "vec_ann_hnsw_knn",
    "vec_ann_hnsw_partitioned_knn",
    # last checked round 2 (registry order)
    "vec_centroid_shift_labels",
    "vec_int8_quantize_error",
    "text_token_stats",
    "text_bpe_token_count",
    "text_quality_score",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_source_lang_profile",
    "text_tfidf_top_terms",
    "text_udtf_sentence_split",
    "text_pii_redact",
    "text_quality_filter_gopher",
    "text_repetition_stats",
    "dedup_exact_groups",
    "dedup_exact_survivors",
    "dedup_ngram_jaccard_pairs",
    "dedup_neardup_survivors",
    "dedup_embedding_near_pairs",
    "dedup_contamination_screen",
    "dedup_levenshtein_part_names",
    "media_feature_extract",
    # last checked round 3 (registry order)
    "graph_copurchase_degree_topk",
    "graph_copurchase_triangles",
    "graph_cc_neardup_clusters",
    "graph_cc_star_neardup_clusters",
    "graph_neighbors_of_node",
    "graph_bfs_levels_tree",
    "graph_pagerank_copurchase",
    "graph_recursive_cte_descendants",
    "graph_label_propagation_communities",
    "q4_order_priority_check",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
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
