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
ROTATION_BUILT_FROM_ROUND: int = 10

#: Changed-code canaries: queries whose underlying implementation changed
#: since their last driver row. They are allowed to jump the pure
#: freshness order (the test exempts exactly these names from the
#: non-decreasing-freshness invariant) but must sit inside the 50-slot
#: budget.  Round-11: connected_components / connected_components_star
#: (operators/graph_algos.py) changed in r9 (self-loop fix) and r10
#: (edge-list staging) with no driver row since r8 — r10 verdict task 2;
#: vec_ann_hnsw_served_knn rides because hnsw_index_save's serving table
#: gained stored identity columns (part_id/n_partitions/m/efc) and the
#: build fn became a pandas-side part_id groupby (still mapInPandas over
#: repartition(n, "vec_id") — a groupBy().applyInPandas form was tried
#: and REJECTED as 2.9× slower). Same membership and deterministic build
#: — oracle-identical by design, bit-equality pinned in tests/test_hnsw.py
#: — but changed plans ride.
CHANGED_CODE_CANARIES: tuple[str, ...] = (
    "graph_cc_neardup_clusters",
    "graph_cc_star_neardup_clusters",
    "vec_ann_hnsw_served_knn",
)

#: Driver-slot priority (round 11). The driver's correctness harness walks
#: the registry in order under a ~50-query budget, so this list pins the
#: front slots explicitly instead of relying on module import order.
#: Round-11 rationale — per the r10 verdict's task 2 plus this round's
#: changed code: the three changed-code canaries lead (two twice-changed
#: CC queries + the re-plumbed HNSW serving save), then the one
#: never-driver-checked query (the new incremental HNSW maintenance
#: path), then the full 46-query r7-stale bucket (the oldest latest-check
#: bucket, registry order within the bucket). 3 + 1 + 46 = 50; after this
#: round no query's latest check is older than r8. Every name here must
#: exist in the registry — load_all asserts.
DRIVER_PRIORITY: tuple[str, ...] = CHANGED_CODE_CANARIES + (
    # never driver-checked (registered r11) — first row required
    "vec_ann_hnsw_incremental_knn",
    # last checked round 7 (registry order) — the oldest-green bucket
    "skew_salted_agg_revenue_per_priority",
    "agg_pivot_status_by_priority",
    "agg_unpivot_lineitem_measures",
    "agg_percentiles_price",
    "strfn_remove_timestamps",
    "strfn_remove_brackets_content",
    "strfn_remove_html_tags",
    "strfn_remove_speaker_labels",
    "strfn_remove_dialog_punctuation",
    "strfn_remove_newlines",
    "strfn_remove_non_alphabetic",
    "strfn_remove_filler_words",
    "strfn_lowercase_text",
    "strfn_normalize_whitespace",
    "strfn_clean_titles",
    "strfn_clean_chain",
    "strfn_title_year_parse",
    "pipeline_token_windows",
    "pipeline_window_scores",
    "pipeline_movie_features",
    "pipeline_scaled_features",
    "pipeline_corpus_centroid",
    "pipeline_dominant_emotion",
    "pipeline_arc_smoothed",
    "tree_build_graph",
    "tree_root_fetch",
    "tree_children_of_root",
    "tree_children_of_node",
    "tree_node_movies",
    "tree_depth_histogram",
    "tree_subtree_rollup",
    "tree_movie_fetch_nested",
    "tree_viz_projection",
    "vec_norm_stats",
    "vec_cosine_topk_to_query",
    "vec_knn_per_query",
    "vec_euclidean_to_label_centroid",
    "vec_representative_topk_per_label",
    "vec_ann_ivf_topk",
    "vec_ann_lsh_topk",
    "dedup_embedding_cc_survivors",
    "events_tumbling_5min",
    "text_dsir_importance",
    "dedup_incremental_vs_snapshot",
    "events_scd2_point_in_time",
    "layout_zorder_bucket_stats",
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
