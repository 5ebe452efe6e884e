"""End-to-end graph construction + serving queries — the Spark rendition of
the reference's ``construct_graph`` (``graph_creator.py:381-392``) and the
FastAPI serving layer (``api/api.py:35-74``).

Pipeline (one lazy DAG + two deliberate driver-side small steps):

    features(24-dim) ──standard_scale──► KMeans(≤800 micro-clusters)   [wide]
    centroids(≤800×24, a few KB) ──ward──► tree ──rebalance──► flatten  [driver]
    graph/membership rows ──createDataFrame──► serving tables           [tiny]

At 100 TB the wide part is the only part that touches the corpus; the
driver never holds more than (k × d) floats plus the ≤800-node tree —
exactly the reference's own scalability argument, kept intact.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinegraph_spark.operators.clustering import (
    FlatGraph,
    flatten_tree,
    kmeans_assign,
    linkage_to_tree,
    rebalance_tree,
    ward_linkage,
)
from cinegraph_spark.operators.features import standard_scale
from cinegraph_spark.schemas import GRAPH


def build_graph_tables(
    spark: SparkSession,
    features: DataFrame,
    key_col: str,
    feature_cols: list[str],
    k: int | None = None,
    seed: int = 42,
    namer=None,
) -> tuple[DataFrame, DataFrame]:
    """Features → (graph, membership) serving tables.

    Returns ``graph`` (schemas.GRAPH shape) and ``membership``
    (key_col, graph_id) mapping every input row to its leaf node.
    """
    scaled = standard_scale(features, key_col, feature_cols).persist()
    assignments, centers = kmeans_assign(scaled, key_col, feature_cols, k=k, seed=seed)

    # member ordinals: ward/flatten operate on positional indices; establish
    # a deterministic ordinal per key (sorted by key) once.
    keyed = (
        assignments.orderBy(key_col)
        .select(key_col, "cluster")
        .toPandas()
    )
    keys = keyed[key_col].tolist()
    members: dict[int, list[int]] = {}
    for ordinal, cl in enumerate(keyed["cluster"].tolist()):
        members.setdefault(int(cl), []).append(ordinal)

    # driver-side small steps: ward over ≤800 centroids, rebalance, flatten
    Z = ward_linkage(centers)
    tree = rebalance_tree(linkage_to_tree(Z, members))

    scaled_pdf = (
        scaled.orderBy(key_col).select(*feature_cols).toPandas().to_numpy()
    )
    flat: FlatGraph = flatten_tree(
        tree, scaled=scaled_pdf, feature_names=list(feature_cols), namer=namer
    )
    scaled.unpersist()

    graph_df = spark.createDataFrame(
        [(int(i), p, n, t, int(c)) for i, p, n, t, c in flat.nodes], schema=GRAPH
    )
    membership_df = spark.createDataFrame(
        [(keys[ordinal], int(gid)) for ordinal, gid in flat.membership],
        schema=f"{key_col} long, graph_id long",
    )
    return graph_df, membership_df


# --- serving queries (G1/G2/G4/G5/G7) --------------------------------------


def children_of(graph: DataFrame, node_path: str) -> DataFrame:
    """G1 — depth-1 children of a node: the ltree pattern
    ``path ~ '<p>.*{1}'`` (``graph_repo.py:114-123``) as prefix+depth
    filters (sargable, no regex)."""
    prefix = node_path + "."
    return graph.filter(
        F.col("path").startswith(prefix)
        & ~F.col("path").substr(F.lit(len(prefix) + 1), F.lit(10**6)).contains(".")
    )


def root_of(graph: DataFrame) -> DataFrame:
    """G5 — ``WHERE path = 'root'`` (``graph_repo.py:30-33``)."""
    return graph.filter(F.col("path") == "root")


def node_members(membership: DataFrame, items: DataFrame, key_col: str, node_id: int) -> DataFrame:
    """G2 — items attached to one node (``graph_repo.py:125-129``)."""
    return membership.filter(F.col("graph_id") == node_id).join(items, key_col)


def node_with_children(graph: DataFrame, membership: DataFrame, node_id: int) -> DataFrame:
    """G7 — the NodeWithChildren projection (``api/api.py:35-59``): node row
    + nested children array + member ids, one row."""
    node = graph.filter(F.col("id") == node_id)
    node_path = node.select("path")
    kids = graph.join(
        F.broadcast(node_path.select(F.col("path").alias("_pp"))),
        F.col("path").startswith(F.concat("_pp", F.lit(".")))
        & ~F.expr("substring(path, length(_pp) + 2, 1000000)").contains("."),
    ).select(
        F.struct("id", "name", "type", "path", "children_count").alias("child")
    )
    kids_arr = kids.agg(F.sort_array(F.collect_list("child")).alias("children_nodes"))
    members = (
        membership.filter(F.col("graph_id") == node_id)
        .agg(F.sort_array(F.collect_list(F.col(membership.columns[0]))).alias("member_ids"))
    )
    return node.crossJoin(kids_arr).crossJoin(members)


def subtree(graph: DataFrame, node_path: str) -> DataFrame:
    """All descendants of a node (path-prefix scan — the GiST-index query
    shape, answered by a sargable prefix filter)."""
    return graph.filter(
        (F.col("path") == node_path)
        | F.col("path").startswith(node_path + ".")
    )
