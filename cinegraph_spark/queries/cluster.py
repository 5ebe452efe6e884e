"""Clustering/hierarchy pipeline queries (C1-C8) — [PROP] operators
(SURVEY §2.6): KMeans micro-clustering, ward tree, rebalance, flatten.
Nondeterministic across environments at the margins (KMeans init
partitioning), so these take the driver's rows-only gate; the structural
invariants are enforced by tests/test_clustering.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.operators.graph_build import build_graph_tables, children_of
from cinegraph_spark.queries import register
from cinegraph_spark.schemas import EMOTIONS, NUM_ACTS

_FEATURE_COLS = [
    f"{e}_act{a}" for a in range(1, NUM_ACTS + 1) for e in EMOTIONS
] + [f"{e}_std" for e in EMOTIONS]

_CACHE: dict[tuple, tuple] = {}


def _tables(spark, sf_dir):
    """Build (and memoize per sf_dir) the document graph tables with a
    fixed k so repeated query calls don't re-run KMeans."""
    key = (id(spark.sparkContext), sf_dir)
    if key not in _CACHE:
        from cinegraph_spark.queries import load_all
        from cinegraph_spark.session import bounded_shuffle

        feats = load_all()["pipeline_movie_features"].spark(spark, sf_dir)
        # KMeans iterations + the summary aggregation execute eagerly in
        # here — bound the plain session's 200 shuffle partitions for them
        with bounded_shuffle(spark):
            _CACHE[key] = build_graph_tables(
                spark, feats, "doc_id", _FEATURE_COLS, k=20, seed=42
            )
    return _CACHE[key]


@register(
    "cluster_graph_nodes",
    None,
    tags=("cluster", "tree", "prop"),
)
def cluster_graph_nodes(spark, sf_dir):
    """The materialized document graph (root/node/leaf rows with dot-paths)
    built by: stub-scored windows → 24-dim features → scale → KMeans(20) →
    ward → rebalance → flatten (C1-C5, C8)."""
    graph, _ = _tables(spark, sf_dir)
    return graph


@register(
    "cluster_membership",
    None,
    tags=("cluster", "prop"),
)
def cluster_membership(spark, sf_dir):
    """Leaf assignment per document (C2 label→members inverted)."""
    _, membership = _tables(spark, sf_dir)
    return membership.orderBy("doc_id")


@register(
    "cluster_children_of_root",
    None,
    tags=("cluster", "tree", "prop"),
)
def cluster_children_of_root(spark, sf_dir):
    """G1 on the *built* tree (vs tree.py's fixture tree): depth-1 children
    of root."""
    graph, _ = _tables(spark, sf_dir)
    return children_of(graph, "root").orderBy("id")


@register(
    "cluster_leaf_sizes",
    None,
    tags=("cluster", "agg", "prop"),
)
def cluster_leaf_sizes(spark, sf_dir):
    """Distribution sanity: docs per leaf (A7-style rollup on the built
    tree)."""
    graph, membership = _tables(spark, sf_dir)
    return (
        membership.groupBy("graph_id")
        .agg(F.count("*").alias("n_docs"))
        .join(graph.select(F.col("id").alias("graph_id"), "path", "name"), "graph_id")
        .orderBy("graph_id")
    )
