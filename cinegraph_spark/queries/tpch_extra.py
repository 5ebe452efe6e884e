"""Extended TPC-H-shaped relational battery (SURVEY §2.10).

The reference has no generic relational surface, so completeness here is
defined by the classic decision-support shapes adapted to the driver's
TPC-H-ish schema (no partsupp/shipmode/commitdate columns — predicates are
re-targeted onto existing columns, plan shape preserved). Each docstring
states the 100 TB execution strategy; DuckDB oracles verify values at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T, r4


@register(
    "q4_order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("relational", "join", "semi", "tpch"),
)
def q4_order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS → left-semi join, then low-cardinality agg.
    (No l_commitdate column; the late-ship predicate plays its role.) The
    date filter pushes to the orders scan; the semi-join never replicates
    order rows, so the agg input is bounded by |orders|."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("relational", "agg", "tpch"),
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-agg — the predicate-pushdown litmus test.
    All three predicates reach the parquet reader (PushedFilters); the agg
    is a single global partial+final pair, shuffling one row per task."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.04, 0.06))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                        JOIN orders   ON o_orderkey = l_orderkey
                        JOIN customer ON c_custkey = o_custkey
                        JOIN nation n1 ON s_nationkey = n1.n_nationkey
                        JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
              OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("relational", "join", "tpch"),
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: two aliased broadcasts of the same tiny nation dim with a
    disjunctive cross-nation predicate; fact-side shuffles only on the
    order/customer keys. supplier is broadcast too (|supplier| ≪ |lineitem|
    at every SF)."""
    s = T(spark, sf_dir, "supplier")
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9")
    ) | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation n1 ON c_nationkey = n1.n_nationkey
                    JOIN region    ON n1.n_regionkey = r_regionkey
                    JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    """,
    tags=("relational", "join", "tpch"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: conditional-aggregation market share. The selective part
    filter is broadcast against lineitem first so every later join sees the
    reduced fact stream — ordering a 100 TB plan from most-selective dim
    outward is the point of this query."""
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            r4(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(0))
                / F.sum(volume)
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS amount
          FROM part JOIN lineitem ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
    tags=("relational", "join", "tpch"),
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (no partsupp → amount omits supplycost): LIKE-filtered
    part broadcast into lineitem, supplier-nation rollup by year."""
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_profit"
            )
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 4) AS acctbal, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk", "tpch"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: lost-revenue top-20. Both date and returnflag predicates
    push to their scans; top-20 is TakeOrdered with c_custkey tiebreaker."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            r4(F.col("c_acctbal")).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    tags=("relational", "join", "agg", "tpch"),
)
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13: left join with a join-condition residual predicate, then a
    two-level aggregation (per-customer count → histogram of counts)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("relational", "join", "agg", "tpch"),
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo revenue percentage — broadcast part, conditional agg
    over one month of lineitem."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            r4(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey),
    top1 AS (
      SELECT supplier_no, total_revenue
      FROM (SELECT *, row_number() OVER (ORDER BY total_revenue DESC,
                                         supplier_no) AS rnk
            FROM revenue)
      WHERE rnk = 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN top1 ON s_suppkey = supplier_no
    """,
    tags=("relational", "join", "agg", "tpch"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: agg → top-1-by-revenue → join. Ranked with a s_suppkey
    tiebreaker instead of the textbook equality against max(total_revenue):
    equality-matching independently rounded doubles across engines could
    flip the whole returned row set on a last-ulp difference at a .00005
    boundary, while a rank flip perturbs at most which of two near-tied
    suppliers wins — same failure class as any other r4 column. The top-1
    side is one row → broadcast."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    top1 = revenue.orderBy(F.desc("total_revenue"), F.asc("supplier_no")).limit(1)
    s = T(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(top1), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q15_top_supplier_ties",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                  AS BIGINT) AS revenue_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, revenue_units
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE revenue_units = (SELECT max(revenue_units) FROM revenue)
    """,
    tags=("relational", "join", "agg", "tpch"),
)
def q15_top_supplier_ties(spark, sf_dir):
    """TPC-H Q15 with the SPEC'S tie semantics (r13 verdict task 5):
    every supplier whose revenue equals the max, via the textbook
    equality against a scalar max — the faithful twin of
    `q15_top_supplier`, which deliberately rank-picks one row for float
    stability. What makes equality portable here: revenue is computed in
    integer ten-thousandths of currency (cents(price) × integer discount
    percent, both via ``floor(x*100 + 0.5)`` — identical IEEE steps in
    both engines, the same trick as the MV refresh queries), so the
    tie comparison is exact bigint equality, not rounded-double
    equality. The scalar max and the tied-supplier set are both tiny →
    broadcast; the one shuffle is the revenue groupBy."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    units = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long") * (
        F.lit(100) - F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(units).alias("revenue_units")
    )
    mx = revenue.agg(F.max("revenue_units").alias("mx"))
    top = revenue.join(
        F.broadcast(mx), F.col("revenue_units") == F.col("mx")
    ).select("supplier_no", "revenue_units")
    s = T(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", "revenue_units")


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
    tags=("relational", "join", "agg", "tpch"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: correlated scalar subquery decorrelated into a per-part
    average join — the standard Spark rewrite (Catalyst does the same for
    the SQL form). Per-part avgs are tiny → broadcast."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = (
        l.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 4) AS totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("relational", "join", "semi", "tpch"),
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: HAVING-filtered semi-join of a re-aggregated fact table.
    The qualifying-order set (sum qty > 250) is computed first and
    broadcast-semi-joined back — at 100 TB the qualifying set is the only
    thing that crosses the wire twice."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(r4(F.sum("l_quantity")).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            r4(F.col("o_totalprice")).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("relational", "join", "tpch"),
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19: disjunctive mixed-table predicate. The part-only parts of
    the disjunction (brand ∈ {1,2,3}) are pre-applied to shrink the
    broadcast side; the cross-table residual evaluates on the joined rows."""
    p = T(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    l = T(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q22_idle_rich_customers",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           count(*)                    AS numcust,
           round(sum(c_acctbal), 4)    AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    tags=("relational", "join", "anti", "tpch"),
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (nation key instead of phone prefix; the synthetic
    data gives every customer orders, so "idle" = no urgent-priority order):
    scalar-subquery threshold (one-row broadcast cross join) + anti-join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
