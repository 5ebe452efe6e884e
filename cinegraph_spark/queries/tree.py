"""Tree / graph queries (G1-G8, SURVEY §2.7) — the reference's serving-side
query language (ltree materialized paths, ``db/repositories/graph_repo.py``).

The graph fixture is derived deterministically from the star schema's
natural hierarchy: root → region → nation, with customers attached to
nation nodes as the "movies" (FK ``graph_id``, G2 analog). Node ids:
root=0, region=1+r_regionkey, nation=10+n_nationkey, and paths are
dot-separated id strings exactly like the reference's ltree
(``graph_repo.py:81-82`` builds ``parent.path || '.' || id``).

Scale note: the reference's graph is ≤800 nodes — in Spark the graph table
is broadcast-sized by construction; child lookups are prefix filters that
Catalyst turns into cheap scans (and partition pruning on ``path`` prefix
ranges at larger graph sizes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T

# --- shared fixture construction -------------------------------------------

_GRAPH_CTE = """
graph AS (
  SELECT CAST(0 AS BIGINT) AS id, 'root' AS path, 'root' AS name,
         'root' AS type,
         (SELECT CAST(count(*) AS INT) FROM region) AS children_count
  UNION ALL
  SELECT CAST(1 + r_regionkey AS BIGINT),
         'root.' || CAST(1 + r_regionkey AS VARCHAR),
         r_name, 'node',
         (SELECT CAST(count(*) AS INT) FROM nation n
          WHERE n.n_regionkey = region.r_regionkey)
  FROM region
  UNION ALL
  SELECT CAST(10 + n_nationkey AS BIGINT),
         'root.' || CAST(1 + n_regionkey AS VARCHAR) || '.' ||
                    CAST(10 + n_nationkey AS VARCHAR),
         n_name, 'leaf',
         (SELECT CAST(count(*) AS INT) FROM customer c
          WHERE c.c_nationkey = nation.n_nationkey)
  FROM nation
)
"""


def build_graph_df(spark, sf_dir):
    """The graph table as a DataFrame (schemas.GRAPH shape)."""
    region = T(spark, sf_dir, "region")
    nation = T(spark, sf_dir, "nation")
    customer = T(spark, sf_dir, "customer")

    n_regions = region.groupBy().agg(F.count("*").cast("int").alias("cc"))
    root = n_regions.select(
        F.lit(0).cast("long").alias("id"),
        F.lit("root").alias("path"),
        F.lit("root").alias("name"),
        F.lit("root").alias("type"),
        F.col("cc").alias("children_count"),
    )

    nations_per_region = nation.groupBy("n_regionkey").agg(
        F.count("*").cast("int").alias("cc")
    )
    regions = (
        region.join(
            nations_per_region,
            region.r_regionkey == nations_per_region.n_regionkey,
            "left",
        )
        .select(
            (F.lit(1) + F.col("r_regionkey")).cast("long").alias("id"),
            F.concat(
                F.lit("root."), (F.lit(1) + F.col("r_regionkey")).cast("string")
            ).alias("path"),
            F.col("r_name").alias("name"),
            F.lit("node").alias("type"),
            F.coalesce("cc", F.lit(0)).alias("children_count"),
        )
    )

    cust_per_nation = customer.groupBy("c_nationkey").agg(
        F.count("*").cast("int").alias("cc")
    )
    nations = (
        nation.join(
            cust_per_nation,
            nation.n_nationkey == cust_per_nation.c_nationkey,
            "left",
        )
        .select(
            (F.lit(10) + F.col("n_nationkey")).cast("long").alias("id"),
            F.concat(
                F.lit("root."),
                (F.lit(1) + F.col("n_regionkey")).cast("string"),
                F.lit("."),
                (F.lit(10) + F.col("n_nationkey")).cast("string"),
            ).alias("path"),
            F.col("n_name").alias("name"),
            F.lit("leaf").alias("type"),
            F.coalesce("cc", F.lit(0)).alias("children_count"),
        )
    )
    return root.unionByName(regions).unionByName(nations)


@register(
    "tree_build_graph",
    f"WITH {_GRAPH_CTE} SELECT id, path, name, type, children_count FROM graph",
    tags=("tree", "build"),
)
def tree_build_graph(spark, sf_dir):
    """S7/G3 — materialize the graph table with pre-assigned ids and
    dot-paths (no two-phase insert dance: ids are deterministic up front,
    SURVEY §4 'two-phase insert' row)."""
    return build_graph_df(spark, sf_dir)


@register(
    "tree_root_fetch",
    f"WITH {_GRAPH_CTE} SELECT id, path, name, children_count FROM graph WHERE path = 'root'",
    tags=("tree", "lookup"),
)
def tree_root_fetch(spark, sf_dir):
    """G5/P5 — root lookup ``WHERE path = 'root'`` (``graph_repo.py:30-33``)."""
    return build_graph_df(spark, sf_dir).filter(F.col("path") == "root").select(
        "id", "path", "name", "children_count"
    )


@register(
    "tree_children_of_root",
    f"""
    WITH {_GRAPH_CTE}
    SELECT id, path, name, type, children_count FROM graph
    WHERE path LIKE 'root.%' AND path NOT LIKE 'root.%.%'
    """,
    tags=("tree", "children"),
)
def tree_children_of_root(spark, sf_dir):
    """G1 — depth-1 children: the ltree pattern ``path ~ 'root.*{1}'``
    (``graph_repo.py:117``) as a prefix + depth filter."""
    g = build_graph_df(spark, sf_dir)
    return g.filter(
        F.col("path").like("root.%") & ~F.col("path").like("root.%.%")
    ).select("id", "path", "name", "type", "children_count")


@register(
    "tree_children_of_node",
    f"""
    WITH {_GRAPH_CTE}
    SELECT id, path, name, type, children_count FROM graph
    WHERE path LIKE 'root.3.%' AND path NOT LIKE 'root.3.%.%'
    """,
    tags=("tree", "children"),
)
def tree_children_of_node(spark, sf_dir):
    """G1 parameterized — children exactly one level under node 'root.3'."""
    g = build_graph_df(spark, sf_dir)
    return g.filter(
        F.col("path").like("root.3.%") & ~F.col("path").like("root.3.%.%")
    ).select("id", "path", "name", "type", "children_count")


@register(
    "tree_node_movies",
    """
    SELECT CAST(10 + c_nationkey AS BIGINT) AS graph_id, c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_nationkey = 5
    """,
    tags=("tree", "fk"),
)
def tree_node_movies(spark, sf_dir):
    """G2/P6 — FK fetch: members attached to one tree node
    (``graph_repo.py:125-129``)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 5)
    return c.select(
        (F.lit(10) + F.col("c_nationkey")).cast("long").alias("graph_id"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
    )


@register(
    "tree_depth_histogram",
    f"""
    WITH {_GRAPH_CTE}
    SELECT CAST(len(path) - len(replace(path, '.', '')) + 1 AS BIGINT) AS depth,
           count(*) AS n_nodes,
           CAST(sum(children_count) AS BIGINT) AS total_children
    FROM graph GROUP BY 1
    """,
    tags=("tree", "agg"),
)
def tree_depth_histogram(spark, sf_dir):
    """Path-depth distribution — depth derived from the materialized path."""
    g = build_graph_df(spark, sf_dir)
    depth = (
        F.length("path") - F.length(F.regexp_replace("path", r"\.", "")) + 1
    ).cast("long")
    return g.groupBy(depth.alias("depth")).agg(
        F.count("*").alias("n_nodes"),
        F.sum("children_count").cast("long").alias("total_children"),
    )


@register(
    "tree_subtree_rollup",
    """
    SELECT CAST(1 + r_regionkey AS BIGINT)            AS region_node,
           'root.' || CAST(1 + r_regionkey AS VARCHAR) AS path,
           CAST(count(c_custkey) AS BIGINT)            AS n_descendant_members,
           round(coalesce(sum(c_acctbal), 0.0), 4)     AS subtree_acctbal
    FROM region LEFT JOIN nation   ON n_regionkey = r_regionkey
                LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY r_regionkey
    """,
    tags=("tree", "rollup"),
)
def tree_subtree_rollup(spark, sf_dir):
    """A7 — subtree member rollup per region node (count = sum over
    children, ``graph_creator.py:231``)."""
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    return (
        r.join(F.broadcast(n), F.col("n_regionkey") == F.col("r_regionkey"), "left")
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("r_regionkey")
        .agg(
            F.count("c_custkey").alias("n_descendant_members"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 4).alias(
                "subtree_acctbal"
            ),
        )
        .select(
            (F.lit(1) + F.col("r_regionkey")).cast("long").alias("region_node"),
            F.concat(
                F.lit("root."), (F.lit(1) + F.col("r_regionkey")).cast("string")
            ).alias("path"),
            "n_descendant_members",
            "subtree_acctbal",
        )
    )


@register(
    "tree_movie_fetch_nested",
    """
    SELECT CAST(10 + c_nationkey AS BIGINT) AS node_id,
           CAST(count(*) AS BIGINT)         AS n_members,
           array_to_string(list(CAST(c_custkey AS VARCHAR) ORDER BY c_custkey), ',') AS member_ids
    FROM customer GROUP BY c_nationkey
    """,
    tags=("tree", "nested"),
)
def tree_movie_fetch_nested(spark, sf_dir):
    """G4 — the selectinload analog: node + ordered member list in one
    aggregation (join + collect_list replaces the reference's two queries,
    ``graph_repo.py:183-199``). Projected as a CSV string for hashing."""
    c = T(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n_members"),
        F.array_join(
            F.sort_array(F.collect_list(F.col("c_custkey"))).cast(
                "array<string>"
            ),
            ",",
        ).alias("member_ids"),
    ).select(
        (F.lit(10) + F.col("c_nationkey")).cast("long").alias("node_id"),
        "n_members",
        "member_ids",
    )


@register(
    "tree_viz_projection",
    f"""
    WITH {_GRAPH_CTE}
    SELECT id, name,
           CAST(least(greatest(children_count * 2, 8), 20) AS BIGINT) AS val,
           CAST(len(path) - len(replace(path, '.', '')) AS BIGINT)    AS level
    FROM graph
    """,
    tags=("tree", "projection"),
)
def tree_viz_projection(spark, sf_dir):
    """G8 — frontend viz transform: node size ``clamp(children_count*2,
    8, 20)`` (``frontend/src/utils/transform.ts:3-37``)."""
    g = build_graph_df(spark, sf_dir)
    return g.select(
        "id",
        "name",
        F.least(F.greatest(F.col("children_count") * 2, F.lit(8)), F.lit(20))
        .cast("long")
        .alias("val"),
        (F.length("path") - F.length(F.regexp_replace("path", r"\.", "")))
        .cast("long")
        .alias("level"),
    )
