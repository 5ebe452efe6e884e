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
ROTATION_BUILT_FROM_ROUND: int = 11

#: Changed-code canaries: queries whose underlying implementation changed
#: since their last driver row. They are allowed to jump the pure
#: freshness order (the test exempts exactly these names from the
#: non-decreasing-freshness invariant) but must sit inside the 50-slot
#: budget.  Round-12: hnsw_index_save and hnsw_index_update both changed —
#: every serving-table write now goes through an atomic sibling-swap
#: (write-then-rename; a plain overwrite deleted the live index before the
#: new one existed) and the update path refuses NULL/uncastable delta keys
#: via try_cast (a NULL key hashed to an arbitrary partition while the
#: intended one kept a stale blob). Output is oracle-identical by design
#: (bit-equality pinned in tests/test_hnsw.py) — but changed write paths
#: ride: served exercises save, incremental exercises save+update. The
#: r12 review pass additionally rounded the IVF probe similarity to 9
#: decimals on BOTH sides (a last-ulp centroid difference could flip the
#: probe set), so vec_ann_ivf_topk's changed plan+oracle ride too.
CHANGED_CODE_CANARIES: tuple[str, ...] = (
    "vec_ann_hnsw_served_knn",
    "vec_ann_hnsw_incremental_knn",
    "vec_ann_ivf_topk",
)

#: Driver-slot priority (round 12). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-12 rationale — per the r11 verdict's task 2 plus this round's
#: changed code: the two changed-write-path HNSW canaries lead, then the
#: four never-driver-checked queries (the HNSW re-shard growth loop,
#: the IVF-tier incremental centroids path, the streaming index-
#: maintenance drain, and the PQ codes serving table — rows-only like
#: its vec_ann_pq_topk twin), then the r8-stale bucket oldest-first
#: (registry order within the bucket). 3 + 4 + 43 = 50; the five
#: remaining r8 queries (equal-freshness with the admitted bucket, which
#: the completeness rule permits) head the r13 queue.
#: Every name here must exist in the registry — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = CHANGED_CODE_CANARIES + (
    # never driver-checked
    "vec_ann_hnsw_reshard_knn",
    "vec_ann_ivf_incremental_topk",
    "vec_ann_hnsw_stream_update_knn",
    "vec_ann_pq_served_topk",
    # last checked round 8 (registry order)
    "agg_percentiles_price_tdigest",
    "vec_centroid_shift_labels",
    "vec_int8_quantize_error",
    "vec_ann_hnsw_knn",
    "vec_ann_hnsw_partitioned_knn",
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
    "stream_stateful_topk_per_user",
    "stream_join_purchase_click_attribution",
    "stream_enrich_purchase_customer",
    "stream_retention_cohorts",
    "pipeline_ingest_dedup_retention",
    "graph_copurchase_degree_topk",
    "graph_copurchase_triangles",
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
