"""Relational core query battery (SURVEY §2.10).

The reference has no generic relational operators (its only joins are FK
lookups in the serving layer, ``db/repositories/graph_repo.py``); these are
the engine capabilities Spark provides natively, each declared with a DuckDB
oracle. Scale guidance per query is in the docstrings — broadcast the dims,
shuffle only on high-cardinality keys, let AQE handle skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T, dstr, r4, tstr

# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-hashagg. Map-side partial aggregation on
    (returnflag, linestatus) — 6 groups — so the shuffle is a few rows per
    task regardless of input size; the filter pushes to the parquet scan."""
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-12-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.sum("l_extendedprice")).alias("sum_base_price"),
        r4(F.sum(disc_price)).alias("sum_disc_price"),
        r4(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.avg("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                  AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k. Customer
    side is small after the segment filter — AQE converts it to a broadcast
    join at runtime; the final top-10 is a TakeOrdered, no full sort."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r4(F.sum(revenue)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            dstr(F.col("o_orderdate")).alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_supplier_volume_by_nation",
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("relational", "join", "agg"),
)
def q5_supplier_volume_by_nation(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with two broadcast dims. nation/region are
    explicitly broadcast (tiny, fixed-size); customer⋈orders⋈lineitem shuffle
    on their keys. The local-supplier predicate rides the supplier join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "agg_distinct_parts_per_supplier",
    """
    SELECT l_suppkey,
           count(DISTINCT l_partkey)               AS n_parts,
           count(DISTINCT l_orderkey)              AS n_orders,
           CAST(count(*) AS BIGINT)                AS n_items,
           round(sum(l_quantity), 4)               AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
    tags=("relational", "agg", "distinct"),
)
def agg_distinct_parts_per_supplier(spark, sf_dir):
    """Distinct aggregation: Spark expands distinct aggs into a two-stage
    plan (partial distinct per key, then merge) — no driver-side distinct."""
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count("*").alias("n_items"),
        r4(F.sum("l_quantity")).alias("total_qty"),
    )


@register(
    "agg_rollup_region_nation",
    """
    SELECT coalesce(r_name, '<all>') AS region_name,
           coalesce(n_name, '<all>') AS nation_name,
           count(*)                  AS n_customers,
           round(sum(c_acctbal), 4)  AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("relational", "agg", "rollup"),
)
def agg_rollup_region_nation(spark, sf_dir):
    """ROLLUP over the region→nation hierarchy. Grouping-set NULLs are
    projected to '<all>' sentinels so the hash can't confuse them with real
    NULL keys."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            r4(F.sum("c_acctbal")).alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "agg_cube_status_priority",
    """
    SELECT coalesce(o_orderstatus, '<all>')   AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           count(*)                           AS n_orders,
           round(avg(o_totalprice), 4)        AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "agg", "cube"),
)
def agg_cube_status_priority(spark, sf_dir):
    """CUBE over two low-cardinality order dims."""
    o = T(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            r4(F.avg("o_totalprice")).alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n_orders",
            "avg_price",
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT coalesce(c_mktsegment, '<all>')         AS segment,
           coalesce(CAST(c_nationkey AS VARCHAR), '<all>') AS nation,
           count(*)                                AS n_customers,
           round(sum(c_acctbal), 4)                AS total_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    tags=("relational", "agg", "grouping-sets"),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via Spark SQL (same Catalyst Expand node as
    rollup/cube)."""
    T(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    return spark_sql_gs(spark)


def spark_sql_gs(spark):
    return spark.sql(
        """
        SELECT coalesce(c_mktsegment, '<all>')                  AS segment,
               coalesce(CAST(c_nationkey AS STRING), '<all>')   AS nation,
               count(*)                                         AS n_customers,
               round(sum(c_acctbal), 4)                         AS total_bal
        FROM gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_inner_order_totals_per_segment",
    """
    SELECT c_mktsegment,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 4) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    tags=("relational", "join"),
)
def join_inner_order_totals_per_segment(spark, sf_dir):
    """Plain inner equi-join → agg; shuffle on custkey, AQE-broadcastable."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "join_left_customers_order_counts",
    """
    SELECT c_custkey, c_name,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 4) AS revenue
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("relational", "join", "outer"),
)
def join_left_customers_order_counts(spark, sf_dir):
    """LEFT join preserving order-less customers (count=0)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("revenue"),
        )
    )


@register(
    "join_right_orders_all_customers",
    """
    SELECT c_custkey,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_open_orders
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'O') o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_custkey, c_nationkey
    """,
    tags=("relational", "join", "outer"),
)
def join_right_orders_all_customers(spark, sf_dir):
    """RIGHT join (the §2.10 join-list member the other queries don't
    exercise): open orders RIGHT-joined to customers, preserving every
    customer including those with no open orders (count 0). Physically the
    mirror of the left join — Spark canonicalizes build/probe sides either
    way."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(F.count("o_orderkey").alias("n_open_orders"))
    )


@register(
    "join_full_outer_customer_supplier_nations",
    """
    SELECT coalesce(cn.ck, -1) AS cust_nation,
           coalesce(sn.sk, -1) AS supp_nation,
           coalesce(cn.n_cust, 0) AS n_cust,
           coalesce(sn.n_supp, 0) AS n_supp
    FROM (SELECT CAST(c_nationkey AS BIGINT) AS ck, count(*) AS n_cust
          FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN
         (SELECT CAST(s_nationkey AS BIGINT) AS sk, count(*) AS n_supp
          FROM supplier GROUP BY s_nationkey) sn
    ON cn.ck = sn.sk
    """,
    tags=("relational", "join", "outer"),
)
def join_full_outer_customer_supplier_nations(spark, sf_dir):
    """FULL OUTER join of two pre-aggregated sides (agg-below-join keeps the
    outer join small — the 100 TB habit of shrinking before joining)."""
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").cast("long").alias("ck")).agg(
        F.count("*").alias("n_cust")
    )
    sn = s.groupBy(F.col("s_nationkey").cast("long").alias("sk")).agg(
        F.count("*").alias("n_supp")
    )
    return cn.join(sn, cn.ck == sn.sk, "full_outer").select(
        F.coalesce("ck", F.lit(-1)).alias("cust_nation"),
        F.coalesce("sk", F.lit(-1)).alias("supp_nation"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi_customers_with_open_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    tags=("relational", "join", "semi"),
)
def join_semi_customers_with_open_orders(spark, sf_dir):
    """LEFT SEMI join — existence check without row duplication; Spark never
    materializes the right side beyond the join hash table."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("relational", "join", "anti"),
)
def join_anti_customers_without_orders(spark, sf_dir):
    """LEFT ANTI join — the idempotent-resume primitive (SURVEY §2.9 X4):
    anti-join new keys against already-done keys."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_broadcast_part_lineitem",
    """
    SELECT p_brand,
           count(*)                      AS n_items,
           round(sum(l_extendedprice), 4) AS revenue,
           round(avg(p_retailprice), 4)   AS avg_retail
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
    tags=("relational", "join", "broadcast"),
)
def join_broadcast_part_lineitem(spark, sf_dir):
    """Explicit broadcast of the filtered part dim: at 100 TB the fact side
    never shuffles — the dim hash table ships to every executor."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            r4(F.sum("l_extendedprice")).alias("revenue"),
            r4(F.avg("p_retailprice")).alias("avg_retail"),
        )
    )


@register(
    "join_range_theta_price_band",
    """
    WITH d AS (
      SELECT p_retailprice AS pr, count(*) AS c
      FROM part GROUP BY p_retailprice
    ),
    band AS (
      SELECT a.pr, sum(b.c) AS tot
      FROM d a JOIN d b ON b.pr BETWEEN a.pr - 10 AND a.pr + 10
      GROUP BY a.pr
    )
    SELECT p.p_partkey AS p_partkey,
           CAST(band.tot - 1 AS BIGINT) AS n_similar
    FROM part p JOIN band ON p.p_retailprice = band.pr
    """,
    tags=("relational", "join", "theta", "rangejoin"),
)
def join_range_theta_price_band(spark, sf_dir):
    """Band-neighbor COUNT per part (price band ±10) — the r18 redesign
    of the naive theta self-join. Two scale pathologies fell out of the
    sf1 sweep: (1) Spark plans a non-equi join as broadcast-nested-loop
    with parallelism capped at the streamed side's input SPLITS (the
    200k-row part table is one 6 MB split, so the whole O(n^2) grind
    landed on ONE task — 20+ min unfinished), and (2) on a
    band-degenerate corpus (every price within the band of every other —
    exactly the r18 adversarial fixture) ANY pair-enumerating plan,
    oracle included, materializes n^2 rows for an aggregate that never
    needed them. The fix computes the count over the DISTINCT-price
    distribution: groupBy price -> (price, multiplicity), banded
    equi-join of that D-row relation against itself
    (`operators/rangejoin.py::banded_range_join` — bucket on
    floor(price/band), replicate one side to its 3 candidate buckets,
    exact BETWEEN post-filter, probe side repartitioned by bucket so
    parallelism never depends on file splits), per-price band totals,
    then one broadcast map-back to parts (tot - 1 excludes self). Work
    is O(D * band-density + n) instead of O(n^2); identical rows to the
    pair-count form, and the oracle is rewritten the same way so BOTH
    engines stay sub-quadratic on degenerate corpora."""
    from cinegraph_spark.operators.rangejoin import banded_range_join

    p = T(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    d = p.groupBy(F.col("p_retailprice").alias("pr")).agg(
        F.count("*").alias("c")
    )
    d2 = d.select(F.col("pr").alias("qr"), F.col("c").alias("qc"))
    band = (
        banded_range_join(d, d2, "pr", "qr", 10.0)
        .groupBy("pr")
        .agg(F.sum("qc").alias("tot"))
    )
    return p.join(
        F.broadcast(band), p["p_retailprice"] == band["pr"]
    ).select(
        "p_partkey", (F.col("tot") - 1).cast("long").alias("n_similar")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    tags=("relational", "window", "topk"),
)
def window_topk_orders_per_customer(spark, sf_dir):
    """Per-group top-k via row_number — the scalable top-k idiom (no global
    sort; each partition sorts only its groups)."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_dense_rank",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(rank() OVER w AS BIGINT)       AS bal_rank,
           CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("relational", "window"),
)
def window_rank_dense_rank(spark, sf_dir):
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return T(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
    )


@register(
    "window_lag_lead_user_events",
    """
    SELECT event_id, user_id, value,
           lag(value)       OVER w AS prev_value,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("relational", "window", "events"),
)
def window_lag_lead_user_events(spark, sf_dir):
    """lag/lead over per-user event streams (ts has a unique event_id
    tiebreaker, so frames are deterministic)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_running_revenue_per_customer",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) / 10000.0, 4) AS running_total
    FROM orders
    """,
    tags=("relational", "window"),
)
def window_running_revenue_per_customer(spark, sf_dir):
    """Running revenue per customer. The sum runs over INTEGER
    ten-thousandth units (floor(v*10000 + 0.5) — the MV family's
    convention), not doubles: Spark's window sum folds sequentially
    while DuckDB's uses a segment tree, and on a zipf-hot key whose
    prefix sum reaches ~6e9 the two associations disagree in the 4th
    decimal (r18 sf1 sweep: 307 of 1.5M rows flipped a .49995-edge
    rounding). Integer units make the running sum association-free and
    bit-identical on both engines at any cardinality; the final
    /10000.0 is one exact-input double division."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    units = F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("long")
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        r4(F.sum(units).over(w) / F.lit(10000.0)).alias("running_total"),
    )


@register(
    "window_range_frame_acctbal",
    """
    SELECT c_custkey, c_acctbal,
           CAST(count(*) OVER (ORDER BY c_acctbal
                               RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING)
                AS BIGINT) AS n_within_100
    FROM customer
    """,
    tags=("relational", "window", "range-frame"),
)
def window_range_frame_acctbal(spark, sf_dir):
    """RANGE frame (value-based) — peers within ±100 acctbal."""
    w = Window.orderBy("c_acctbal").rangeBetween(-100, 100)
    return T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.count("*").over(w).cast("long").alias("n_within_100"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


@register(
    "sort_topk_orders_global",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("relational", "sort", "topk"),
)
def sort_topk_orders_global(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    + driver merge of k rows, never a full sort at scale."""
    return (
        T(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "setop_union_intersect_except",
    """
    WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT 'both'   AS which, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'f_only' AS which, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'o_only' AS which, o_custkey FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f)
    """,
    tags=("relational", "setop"),
)
def setop_union_intersect_except(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL in one result, tagged by branch."""
    orders = T(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f.intersect(o).select(F.lit("both").alias("which"), "o_custkey")
    f_only = f.exceptAll(o).select(F.lit("f_only").alias("which"), "o_custkey")
    o_only = o.exceptAll(f).select(F.lit("o_only").alias("which"), "o_custkey")
    return both.unionByName(f_only).unionByName(o_only)


@register(
    "setop_intersect_all_linestatus",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'O'
    """,
    tags=("relational", "setop"),
)
def setop_intersect_all_linestatus(spark, sf_dir):
    """INTERSECT ALL (bag semantics) — multiplicity-preserving."""
    l = T(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    b = l.filter(F.col("l_linestatus") == "O").select("l_orderkey")
    return a.intersectAll(b)


# ---------------------------------------------------------------------------
# Scalar functions: date / JSON / conditional
# ---------------------------------------------------------------------------


@register(
    "scalar_orders_by_month",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           count(*)                     AS n_orders,
           round(sum(o_totalprice), 4)  AS revenue
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "scalar", "date"),
)
def scalar_orders_by_month(spark, sf_dir):
    """date_trunc grouping; month projected as a string (encoding-proof)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month"
            )
        )
        .agg(
            F.count("*").alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "scalar_json_events",
    """
    SELECT event_type,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("relational", "scalar", "json"),
)
def scalar_json_events(spark, sf_dir):
    """JSON path extraction on events.props (reference analog: JSONB
    movies.other_data, ``db/models/movie.py:12``). ``try_cast`` on both
    sides: a missing path is NULL either way, but a NON-NUMERIC value
    would make ANSI ``cast`` (and DuckDB ``CAST``) raise and kill the
    whole aggregation — at real log scale malformed props are a
    certainty, and one bad row must degrade to NULL, not fail the job."""
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )


@register(
    "scalar_case_bucketing",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*)                 AS n,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY 1
    """,
    tags=("relational", "scalar"),
)
def scalar_case_bucketing(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"), r4(F.avg("c_acctbal")).alias("avg_bal")
    )


@register(
    "scalar_datetime_parts_events",
    """
    SELECT CAST(hour(ts) AS BIGINT)      AS hr,
           CAST(dayofweek(ts) AS BIGINT) AS dow,
           count(*)                      AS n,
           round(sum(value), 4)          AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("relational", "scalar", "date"),
)
def scalar_datetime_parts_events(spark, sf_dir):
    """Datetime part extraction. DuckDB dayofweek is 0=Sunday..6; Spark
    dayofweek is 1=Sunday..7 — normalized to DuckDB's convention here."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.hour("ts").cast("long").alias("hr"),
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        )
        .agg(F.count("*").alias("n"), r4(F.sum("value")).alias("total_value"))
    )


@register(
    "skew_salted_agg_revenue_per_priority",
    """
    SELECT o_orderpriority, round(sum(o_totalprice), 4) AS total,
           count(*) AS n_rows
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "skew"),
)
def skew_salted_agg_revenue_per_priority(spark, sf_dir):
    """Hot-key aggregation via the salted two-phase shape
    (`operators/skew.py`): o_orderpriority has 5 values, so an unsalted
    groupBy puts ~20% of a 100 TB orders table on one reducer; salting
    spreads each key over 16 partials first. Result is bit-identical to the
    plain GROUP BY (the oracle)."""
    from cinegraph_spark.operators.skew import salted_sum_count

    o = T(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    out = salted_sum_count(o, ["o_orderpriority"], "o_totalprice", salt_buckets=16)
    return out.select("o_orderpriority", r4(F.col("total")).alias("total"), "n_rows")


@register(
    "agg_pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS f_total,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS o_total,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS p_total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "pivot"),
)
def agg_pivot_status_by_priority(spark, sf_dir):
    """Pivot (long->wide): revenue per priority pivoted over the 3 order
    statuses. Spark's groupBy().pivot() with explicit values compiles to the
    same conditional aggregation as the oracle's CASE columns — one shuffle,
    no per-value passes; explicit value list avoids the extra distinct scan
    pivot() otherwise runs."""
    o = T(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 4))
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("f_total"),
        F.col("O").alias("o_total"),
        F.col("P").alias("p_total"),
    )


@register(
    "agg_unpivot_lineitem_measures",
    """
    SELECT l_returnflag, measure, round(sum(val), 4) AS total
    FROM (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    GROUP BY l_returnflag, measure
    """,
    tags=("relational", "agg", "unpivot"),
)
def agg_unpivot_lineitem_measures(spark, sf_dir):
    """Unpivot/melt (wide->long): three measure columns to (measure, val)
    rows, then aggregate. Uses the native unpivot API (Spark >= 3.4) —
    a single-pass generate, not three scans like the oracle's UNION ALL
    spelling (DuckDB folds those into one scan too)."""
    li = T(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "extendedprice")
        .otherwise("discount"),
    )
    return long.groupBy("l_returnflag", "measure").agg(
        r4(F.sum("val")).alias("total")
    )


@register(
    "agg_percentiles_price",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "percentile"),
)
def agg_percentiles_price(spark, sf_dir):
    """Exact continuous percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear-interpolation). At 100 TB swap to
    `approx_percentile` (t-digest sketch, mergeable map-side) — exact
    percentile holds the group's values; the query shape is identical."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        r4(F.expr("percentile(o_totalprice, 0.5)")).alias("p50"),
        r4(F.expr("percentile(o_totalprice, 0.9)")).alias("p90"),
        r4(F.expr("percentile(o_totalprice, 0.99)")).alias("p99"),
    )


@register(
    "agg_percentiles_price_tdigest",
    None,  # rows-only: sketch results are merge-order-dependent, so no
    # engine-exact oracle exists; the exact twin agg_percentiles_price IS
    # exact-oracle-checked, and tests/test_properties.py pins this sketch
    # within 1% relative of it per group (justified in COVERAGE.md)
    tags=("relational", "agg", "percentile", "sketch"),
)
def agg_percentiles_price_tdigest(spark, sf_dir):
    """The 100 TB path for `agg_percentiles_price`: `approx_percentile`
    (Spark's t-digest-style quantile sketch) instead of exact
    `percentile`. The exact form holds each group's full value multiset
    in the aggregation buffer — O(group size) memory, a spill risk on a
    100 TB fact table; the sketch is O(accuracy) per group and merges
    map-side, so the plan is a plain partial-agg shuffle at any scale.
    Same query shape, same output schema as the exact twin; accuracy
    10000 keeps the 3 probed quantiles within ~0.1% at test scale."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        r4(F.expr("approx_percentile(o_totalprice, 0.5, 10000)")).alias("p50"),
        r4(F.expr("approx_percentile(o_totalprice, 0.9, 10000)")).alias("p90"),
        r4(F.expr("approx_percentile(o_totalprice, 0.99, 10000)")).alias("p99"),
    )
