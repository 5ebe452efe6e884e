"""Relational surface extensions (SURVEY §2.10): subquery shapes (scalar,
correlated-aggregate, NOT EXISTS), the remaining window ranking functions
(ntile / percent_rank / cume_dist / first_value / last_value / nth_value),
and argmin/argmax aggregates.

The reference has none of these (its only predicates are FK lookups,
``db/repositories/graph_repo.py:108-129``); they are engine capabilities the
driver's harness exercises. Every query here is a classic Catalyst rewrite
target — scalar subqueries become broadcast joins, NOT EXISTS becomes an
anti join — so each docstring states the physical plan we expect at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T, r4

# ---------------------------------------------------------------------------
# Subquery shapes
# ---------------------------------------------------------------------------


@register(
    "subq_scalar_orders_above_avg",
    """
    SELECT o_orderpriority,
           count(*)                    AS n_above,
           round(sum(o_totalprice), 4) AS sum_above
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("relational", "subquery"),
)
def subq_scalar_orders_above_avg(spark, sf_dir):
    """Scalar subquery: orders above the global average price, counted per
    priority. Spark shape: the 1-row global aggregate is crossJoin-broadcast
    against the scan (a BroadcastNestedLoopJoin over a single row — free),
    then filter + 5-group hashagg. Two scans of orders, both map-only with
    map-side partial aggregation; no large shuffle at any scale."""
    o = T(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("_avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("_avg_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_above"),
            r4(F.sum("o_totalprice")).alias("sum_above"),
        )
    )


@register(
    "subq_correlated_top_heavy_customers",
    """
    SELECT o_custkey,
           count(*)                    AS n_orders,
           round(max(o_totalprice), 4) AS max_order,
           round(sum(o_totalprice), 4) AS sum_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 2 AND max(o_totalprice) > 0.5 * sum(o_totalprice)
    """,
    tags=("relational", "subquery"),
)
def subq_correlated_top_heavy_customers(spark, sf_dir):
    """Correlated-aggregate subquery shape: customers whose single largest
    order exceeds half their lifetime spend (the correlated form
    ``WHERE o_totalprice > 0.5 * (SELECT sum(..) WHERE o_custkey = outer)``
    decorrelates to exactly this one-pass groupBy + HAVING — the rewrite
    every optimizer performs; we declare the decorrelated plan directly).
    One hash shuffle on o_custkey; map-side combine keeps it proportional
    to the customer count, not the order count."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.max("o_totalprice").alias("_max"),
            F.sum("o_totalprice").alias("_sum"),
        )
        .filter((F.col("n_orders") >= 2) & (F.col("_max") > 0.5 * F.col("_sum")))
        .select(
            "o_custkey",
            "n_orders",
            r4(F.col("_max")).alias("max_order"),
            r4(F.col("_sum")).alias("sum_orders"),
        )
    )


@register(
    "subq_not_exists_parts_unordered_1997",
    """
    SELECT p.p_partkey, p.p_brand, p.p_type
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_partkey = p.p_partkey
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    ORDER BY p.p_partkey
    """,
    tags=("relational", "subquery", "antijoin"),
)
def subq_not_exists_parts_unordered_1997(spark, sf_dir):
    """NOT EXISTS with a join inside: parts nobody ordered during 1997.
    Spark shape: left_anti join of part against the 1997 (lineitem ⋈ orders)
    key set. The inner join prunes to two columns before shuffling; the date
    filter pushes into the orders scan. At 100 TB the anti join shuffles only
    distinct l_partkey values (projected early), not full rows."""
    p = T(spark, sf_dir, "part")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = T(spark, sf_dir, "lineitem")
    ordered_1997 = (
        l.join(o, l.l_orderkey == o.o_orderkey).select("l_partkey").distinct()
    )
    return (
        p.join(ordered_1997, p.p_partkey == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Window ranking extras
# ---------------------------------------------------------------------------


@register(
    "window_ntile_percent_cume",
    """
    SELECT c_custkey, c_mktsegment,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist()    OVER w, 4) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal NULLS FIRST, c_custkey)
    """,
    tags=("relational", "window"),
)
def window_ntile_percent_cume(spark, sf_dir):
    """ntile / percent_rank / cume_dist over customers ranked by balance
    within segment. The c_custkey tiebreaker makes every rank deterministic
    (and makes each row its own peer group, so cume_dist agrees across
    engines). One shuffle on the 5-segment partition key — skewed by design;
    at scale a segment-partitioned window like this wants sub-partitioning
    (salt + two-pass rank merge) or a range repartition; documented here as
    the canonical semantics."""
    # null ordering made explicit on BOTH sides: Spark's ASC defaults to
    # NULLS FIRST while DuckDB's defaults to NULLS LAST, so a single NULL
    # balance would silently shift every rank in its segment (r17
    # adversarial sweep)
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").asc_nulls_first(), F.col("c_custkey").asc())
    )
    return T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        r4(F.percent_rank().over(w)).alias("pct_rank"),
        r4(F.cume_dist().over(w)).alias("cume"),
    )


@register(
    "window_first_last_nth_order",
    """
    WITH w AS (
        SELECT o_custkey,
               row_number() OVER win AS rn,
               round(first_value(o_totalprice) OVER win, 4) AS first_price,
               round(nth_value(o_totalprice, 2) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
                   AS second_price,
               round(last_value(o_totalprice) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
                   AS last_price
        FROM orders
        WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, first_price, second_price, last_price
    FROM w WHERE rn = 1
    """,
    tags=("relational", "window"),
)
def window_first_last_nth_order(spark, sf_dir):
    """first_value / nth_value(2) / last_value of each customer's order
    history (chronological, orderkey tiebreak). last_value and nth_value use
    the full-partition ROWS frame — the classic footgun (the default frame
    stops at CURRENT ROW) pinned here cross-engine. One shuffle on
    o_custkey; rn=1 keeps one row per customer."""
    full = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    grow = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.row_number().over(grow).alias("rn"),
            r4(F.first("o_totalprice").over(grow)).alias("first_price"),
            r4(F.nth_value("o_totalprice", 2).over(full)).alias("second_price"),
            r4(F.last("o_totalprice").over(full)).alias("last_price"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# argmin / argmax aggregates
# ---------------------------------------------------------------------------

# acctbal is cent-precision (verified: round(x,2) == x across sf0.01/sf0.1)
# and custkey < 1e8, so (cents * 1e8 + custkey) is an exact, collision-free
# BIGINT that orders by (acctbal, custkey) — a deterministic argmax key even
# when two customers share a balance.
_BAL_KEY_SQL = (
    "CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey"
)


@register(
    "agg_minby_maxby_nation",
    f"""
    SELECT c_nationkey,
           arg_max(c_name, {_BAL_KEY_SQL}) AS richest_customer,
           arg_min(c_name, {_BAL_KEY_SQL}) AS poorest_customer,
           round(max(c_acctbal), 4) AS max_bal,
           round(min(c_acctbal), 4) AS min_bal
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("relational", "agg"),
)
def agg_minby_maxby_nation(spark, sf_dir):
    """max_by / min_by (argmax/argmin) per nation with a collision-free
    integer ordering key so ties on balance resolve identically in both
    engines. Single hash aggregate, map-side combined — argmax carries one
    (key, name) pair per group per partition, so shuffle volume is O(groups),
    not O(rows), at any scale."""
    c = T(spark, sf_dir, "customer")
    key = (
        F.round(F.col("c_acctbal") * 100).cast("bigint") * F.lit(100000000)
        + F.col("c_custkey")
    )
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", key).alias("richest_customer"),
        F.min_by("c_name", key).alias("poorest_customer"),
        r4(F.max("c_acctbal")).alias("max_bal"),
        r4(F.min("c_acctbal")).alias("min_bal"),
    )


# ---------------------------------------------------------------------------
# Spark 4 VARIANT (semi-structured JSON) surface
# ---------------------------------------------------------------------------


@register(
    "scalar_variant_nested_events",
    """
    WITH j AS (
      SELECT event_type,
             '{"outer": ' || props || ', "arr": [' || user_id || ', '
                          || event_id || ']}' AS doc
      FROM events
    )
    SELECT event_type,
           CAST(sum(CAST(json_extract(doc, '$.outer.k') AS BIGINT)) AS BIGINT)
             AS sum_outer_k,
           CAST(max(CAST(json_extract(doc, '$.arr[1]') AS BIGINT)) AS BIGINT)
             AS max_arr_1,
           CAST(sum(CASE WHEN json_extract(doc, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           count(*) AS n
    FROM j
    GROUP BY event_type
    """,
    tags=("relational", "scalar", "json", "variant"),
)
def scalar_variant_nested_events(spark, sf_dir):
    """Spark 4 VARIANT path: build a nested JSON document (embedding the
    original ``props`` object plus an integer array — all-integer leaves so
    string construction is engine-identical), ``parse_json`` it into a
    VARIANT column, and extract typed nested/array paths with
    ``variant_get`` / ``try_variant_get``. VARIANT is Spark's columnar
    semi-structured encoding — at 100 TB it replaces per-row JSON string
    re-parsing with a binary-encoded shredded column, which is why the
    engine surface matters beyond ``get_json_object``. The missing-path
    probe uses ``try_variant_get`` (NULL, never an error)."""
    e = T(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"outer": '),
        F.col("props"),
        F.lit(', "arr": ['),
        F.col("user_id").cast("string"),
        F.lit(", "),
        F.col("event_id").cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(doc)
    return e.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.sum(F.variant_get("v", "$.outer.k", "bigint")).cast("bigint").alias("sum_outer_k"),
        F.max(F.variant_get("v", "$.arr[1]", "bigint")).cast("bigint").alias("max_arr_1"),
        F.sum(
            F.when(F.try_variant_get("v", "$.missing", "string").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_missing"),
        F.count("*").alias("n"),
    )


@register(
    "agg_incremental_mv_refresh",
    """
    SELECT o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("agg", "incremental", "materialized-view", "maintenance"),
)
def agg_incremental_mv_refresh(spark, sf_dir):
    """Incremental MATERIALIZED-VIEW maintenance via mergeable partial
    aggregates (`operators/incremental.py::merge_agg_state`): a per-
    (priority, month) revenue rollup is built from the pre-1997 orders,
    then refreshed with the 1997+ delta WITHOUT re-reading the base facts
    — the delta is pre-aggregated and folded into the persisted state as
    mergeable partials (counts and sums as sum-of-sums, the max as
    max-of-maxes under the insert-only contract; averages derive from
    sum and count), so a daily refresh costs O(|state| + |delta|)
    at any fact-table size. The delta refresh is then REPLAYED
    (at-least-once upstream) and must be a ledger-detected no-op — a
    broken ledger double-counts every 1997+ group and fails the oracle
    hash, so the idempotency contract is driver-verified, not just
    test-pinned. Revenue is summed in integer cents
    (floor(price*100 + 0.5): double multiply/add + exact floor — the
    identical IEEE steps in both engines), so the merged state is
    BIT-IDENTICAL to a full recompute, which is exactly what the plain
    full-aggregate oracle checks."""
    from cinegraph_spark.operators.incremental import merge_agg_state
    from cinegraph_spark.session import scratch_dir

    o = T(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    month = F.date_format(F.col("o_orderdate"), "yyyy-MM")

    def rollup(df):
        return df.groupBy(
            F.col("o_orderpriority").alias("priority"),
            month.alias("month"),
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("sum_cents"),
            F.max(cents).alias("max_cents"),
        )

    state = scratch_dir("cg_mv_") + "/state"
    keys, sums = ["priority", "month"], ["n_orders", "sum_cents"]
    # max merges as max-of-maxes — sound here because the deltas are
    # INSERT-only (merge_agg_state documents the retraction limit)
    maxs = ["max_cents"]
    base = rollup(o.filter(F.col("o_orderdate") < "1997-01-01"))
    delta = rollup(o.filter(F.col("o_orderdate") >= "1997-01-01"))
    merge_agg_state(spark, state, base, keys, sums, batch_id=0, maxs=maxs)
    merge_agg_state(spark, state, delta, keys, sums, batch_id=1, maxs=maxs)
    replay = merge_agg_state(
        spark, state, delta, keys, sums, batch_id=1, maxs=maxs
    )
    assert replay["applied"] is False  # ledger contract, cheap to assert
    # no derived float columns in the hashed output: sum_cents + n_orders
    # carry the full information (a reader derives the average), and a
    # cross-engine double division sits exactly on a round-half boundary
    # at sf0.1 — the measured reason avg_price is not projected here
    return spark.read.parquet(state + "/agg").select(
        "priority",
        "month",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.col("max_cents").cast("long").alias("max_cents"),
    )


@register(
    "agg_incremental_mv_retract",
    """
    SELECT o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    WHERE strftime(o_orderdate, '%Y') <> '1995'
    GROUP BY 1, 2
    """,
    tags=("agg", "incremental", "materialized-view", "maintenance", "cdc"),
)
def agg_incremental_mv_retract(spark, sf_dir):
    """RETRACTABLE incremental view maintenance (r14) — the CDC
    complement of `agg_incremental_mv_refresh`'s insert-only contract:
    the (priority, month) rollup absorbs the full orders table, then a
    retraction batch DELETES every 1995 fact by shipping NEGATED
    partials (count −1 per row, cents negated — sum arithmetic merges
    them unchanged), still at O(|state| + |delta|) with no base-fact
    rescan. What the oracle proves beyond arithmetic: every
    1995-only (priority, month) group VANISHES from the view (12
    months × 5 priorities of groups — a recompute has no row for a
    factless group, and `merge_agg_state(n_col=...)` drops merged
    zero-count groups rather than leaving divergent zero-rows), and the
    replayed retraction batch is a ledger no-op (a broken ledger would
    retract twice, push counts negative, and the operator would refuse
    the commit — so the oracle hash catches both the double-count AND
    the refusal path misfiring). Integer-cents measures keep the merged
    state bit-identical to the plain filtered recompute the oracle
    runs. max/min measures are deliberately absent: they are not
    retractable partials (`merge_agg_state` refuses the combination up
    front)."""
    from cinegraph_spark.operators.incremental import merge_agg_state
    from cinegraph_spark.session import scratch_dir

    o = T(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    month = F.date_format(F.col("o_orderdate"), "yyyy-MM")

    def rollup(df, sign=1):
        return df.groupBy(
            F.col("o_orderpriority").alias("priority"),
            month.alias("month"),
        ).agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("n_orders"),
            (F.lit(sign) * F.sum(cents)).alias("sum_cents"),
        )

    state = scratch_dir("cg_mv_retract_") + "/state"
    keys, sums = ["priority", "month"], ["n_orders", "sum_cents"]
    base = rollup(o)
    retract = rollup(
        o.filter(F.year("o_orderdate") == 1995), sign=-1
    )
    merge_agg_state(spark, state, base, keys, sums, batch_id=0, n_col="n_orders")
    merge_agg_state(
        spark, state, retract, keys, sums, batch_id=1, n_col="n_orders"
    )
    replay = merge_agg_state(
        spark, state, retract, keys, sums, batch_id=1, n_col="n_orders"
    )
    assert replay["applied"] is False  # ledger contract, cheap to assert
    return spark.read.parquet(state + "/agg").select(
        "priority",
        "month",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
    )


@register(
    "script_trailing_quarter_report",
    """
    SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    WHERE o_orderdate > (SELECT max(o_orderdate) - INTERVAL 90 DAY
                         FROM orders)
    GROUP BY 1
    """,
    tags=("relational", "scripting", "procedure", "agg"),
)
def script_trailing_quarter_report(spark, sf_dir):
    """Spark 4 SQL SCRIPTING (r13 verdict task 7's second option): the
    stored-procedure pattern — a data-derived scalar parameter feeding a
    report — as ONE multi-statement script (``BEGIN … END`` with
    ``DECLARE``/``SET``, `spark.sql.scripting.enabled`): the cutoff date
    is computed into a script variable (max order date minus 90 days),
    then the trailing-quarter revenue report selects against it. What a
    procedure buys over the equivalent scalar subquery the oracle runs:
    the variable is computed ONCE and is reusable across any number of
    later statements/branches in the same script, which is the shape
    reporting procedures take (the control-flow surface — WHILE loops,
    FOR cursors, IF/ELSE — is pinned in tests/test_sql_scripting.py).
    Execution is unchanged Catalyst: each statement plans/optimizes
    independently, so the report aggregate keeps its pushdown and
    partial-agg shape — scripting is control flow, never a row path.
    Needs the registered TEMP VIEW, so the script runs in the same
    session the loader registered it in."""
    from cinegraph_spark.session import scoped_confs

    T(spark, sf_dir, "orders").createOrReplaceTempView("_script_orders")
    with scoped_confs(spark, **{"spark.sql.scripting.enabled": "true"}):
        return spark.sql(
            """
            BEGIN
              -- TIMESTAMP, not DATE: orders carry intra-day times, and a
              -- DATE cutoff truncates to midnight, admitting up to a
              -- day's extra orders vs the oracle's timestamp subtraction
              -- (r17 adversarial sweep)
              DECLARE cutoff TIMESTAMP;
              SET cutoff = (SELECT max(o_orderdate) - INTERVAL 90 DAY
                            FROM _script_orders);
              SELECT o_orderpriority AS priority,
                     count(*) AS n_orders,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS sum_cents
              FROM _script_orders
              WHERE o_orderdate > cutoff
              GROUP BY 1;
            END
            """
        )


def _hll_rho_sql() -> str:
    from cinegraph_spark.queries.util import HLL_RANK_BITS

    return (
        "CASE "
        + " ".join(
            f"WHEN (w >> {HLL_RANK_BITS - 1 - k}) & 1 = 1 THEN {k + 1}"
            for k in range(HLL_RANK_BITS)
        )
        + f" ELSE {HLL_RANK_BITS + 1} END"
    )


def _hll_mv_oracle() -> str:
    from cinegraph_spark.queries.util import HLL_ALPHA, HLL_M, HLL_P

    return f"""
    WITH hashed AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, day, h % {HLL_M} AS reg, {_hll_rho_sql()} AS rho
      FROM (SELECT event_type, day, h, h >> {HLL_P} AS w FROM hashed)
    ),
    registers AS (
      SELECT event_type, day, reg, max(rho) AS mr
      FROM ranked GROUP BY 1, 2, 3
    ),
    folded AS (
      SELECT event_type, day,
             {HLL_M} - count(*) AS v_empty,
             sum(pow(2.0, -mr)) + ({HLL_M} - count(*)) AS z
      FROM registers GROUP BY 1, 2
    ),
    est AS (
      SELECT event_type, day, v_empty,
             CASE WHEN {HLL_ALPHA} * {HLL_M} * {HLL_M} / z <= 2.5 * {HLL_M}
                       AND v_empty > 0
                  THEN {HLL_M} * ln({HLL_M} * 1.0 / v_empty)
                  ELSE {HLL_ALPHA} * {HLL_M} * {HLL_M} / z END AS e
      FROM folded
    ),
    counts AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n_events, round(e, 4) AS est_users,
           CAST(v_empty AS BIGINT) AS v_empty
    FROM est JOIN counts USING (event_type, day)
    """


@register(
    "agg_incremental_mv_hll_distinct",
    _hll_mv_oracle(),
    tags=("agg", "incremental", "materialized-view", "sketch", "hll"),
)
def agg_incremental_mv_hll_distinct(spark, sf_dir):
    """Incremental COUNT(DISTINCT) in a materialized view (r14) —
    the measure class plain mergeable sums cannot give you: distinct
    counts are not algebraic, so the view carries a portable-HLL
    REGISTER VECTOR per (event_type, day) group
    (`queries/util.py::hll_dense_registers`, 64 small ints per group
    regardless of corpus size) and `merge_agg_state(hll_regs=...)`
    folds deltas by element-wise register max — associative, so the
    merged state is BIT-IDENTICAL to the sketch over all facts no
    matter how the batches split, which is exactly what the
    cross-engine oracle checks (the md5-prefix hash makes every
    register reproducible in DuckDB; estimates then agree to the
    shared 4-decimal rounding). The corpus arrives split by
    event_id parity (batch 0 even, batch 1 odd — worst case for a
    sketch: every group is touched by both batches), and the delta
    batch is REPLAYED to drive the ledger no-op under the oracle
    hash. At 100 TB the refresh reads the new facts once, shuffles
    group-cardinality-sized partials, and never sees raw user ids
    from history — the sketch IS the state."""
    from cinegraph_spark.operators.incremental import merge_agg_state
    from cinegraph_spark.queries.util import (
        dstr,
        hll_dense_registers,
        hll_estimate,
    )
    from cinegraph_spark.session import scratch_dir

    ev = T(spark, sf_dir, "events").select(
        "event_id", "event_type", dstr(F.col("ts")).alias("day"),
        "user_id",
    )
    keys, sums = ["event_type", "day"], ["n_events"]

    # ONE corpus scan feeds both parity halves (r19): grouping by
    # (parity, keys) then filtering a parity out is row-for-row the
    # same partial as filtering the corpus first and grouping by keys
    # (count and register-max are per-group; parity only splits the
    # groups), and the count rides the register aggregation itself
    # (n_col) — the former shape paid four corpus scans (counts + regs
    # per parity) and two joins for bit-identical partials.
    parts = hll_dense_registers(
        ev.withColumn("par", F.col("event_id") % 2),
        ["par"] + keys,
        "user_id",
        n_col="n_events",
    ).localCheckpoint(eager=False)
    state = scratch_dir("cg_mv_hll_") + "/state"
    base = parts.filter(F.col("par") == 0).drop("par")
    delta = parts.filter(F.col("par") == 1).drop("par")
    merge_agg_state(
        spark, state, base, keys, sums, batch_id=0,
        hll_regs=["user_id_regs"],
    )
    merge_agg_state(
        spark, state, delta, keys, sums, batch_id=1,
        hll_regs=["user_id_regs"],
    )
    replay = merge_agg_state(
        spark, state, delta, keys, sums, batch_id=1,
        hll_regs=["user_id_regs"],
    )
    assert replay["applied"] is False  # ledger contract
    merged = spark.read.parquet(state + "/agg")
    return merged.select(
        "event_type",
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(hll_estimate(F.col("user_id_regs")), 4).alias(
            "est_users"
        ),
        F.size(
            F.filter(F.col("user_id_regs"), lambda r: r == 0)
        ).cast("long").alias("v_empty"),
    )


@register(
    "agg_incremental_mv_evolve",
    """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(sum(CASE WHEN strftime(o_orderdate, '%Y') >= '1996'
                         THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS cents_v2
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "incremental", "materialized-view", "maintenance",
          "evolution"),
)
def agg_incremental_mv_evolve(spark, sf_dir):
    """SCHEMA EVOLUTION of a live incremental view (r14 verdict task 7,
    `operators/incremental.py::evolve_agg_state`): the priority rollup
    absorbs the pre-1996 orders, is then WIDENED with a new sum measure
    (``cents_v2``) at epoch batch 1 — no rebuild, no base-fact rescan:
    existing groups start at the additive identity — and the post-1996
    delta merges carrying all three measures. The oracle encodes the
    epoch semantics exactly: old measures over ALL facts, the evolved
    measure over post-epoch facts only (CASE on the order year). A
    replayed pre-epoch batch is asserted a ledger no-op en route (the
    epoch watermark must not misfire on replays — only NEVER-seen
    pre-epoch batches refuse). At 100 TB this is the difference between
    adding a metric to a petabyte-scale rollup by touching
    group-cardinality rows once versus recomputing the view from the
    fact table; the evolution table rides the same atomic swap as the
    aggregate and ledger, so no crash can commit a widened aggregate
    without its epoch row."""
    from cinegraph_spark.operators.incremental import (
        evolve_agg_state,
        merge_agg_state,
    )
    from cinegraph_spark.session import scratch_dir

    o = T(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    def rollup(df, with_v2=False):
        aggs = [
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("sum_cents"),
        ]
        if with_v2:
            aggs.append(F.sum(cents).alias("cents_v2"))
        return df.groupBy(
            F.col("o_orderpriority").alias("priority")
        ).agg(*aggs)

    state = scratch_dir("cg_mv_evolve_") + "/state"
    keys = ["priority"]
    old_facts = o.filter(F.year("o_orderdate") < 1996)
    new_facts = o.filter(F.year("o_orderdate") >= 1996)
    merge_agg_state(
        spark, state, rollup(old_facts), keys,
        ["n_orders", "sum_cents"], batch_id=0,
    )
    evolve_agg_state(
        spark, state, keys, from_batch_id=1,
        new_sums={"cents_v2": "bigint"},
    )
    replay = merge_agg_state(
        spark, state, rollup(old_facts), keys,
        ["n_orders", "sum_cents"], batch_id=0,
    )
    assert replay["applied"] is False  # pre-epoch REPLAY stays a no-op
    merge_agg_state(
        spark, state, rollup(new_facts, with_v2=True), keys,
        ["n_orders", "sum_cents", "cents_v2"], batch_id=1,
    )
    return spark.read.parquet(state + "/agg").select(
        "priority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.col("cents_v2").cast("long").alias("cents_v2"),
    )


@register(
    "agg_incremental_mv_rollback_read",
    """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    WHERE strftime(o_orderdate, '%Y') < '1997'
    GROUP BY 1
    """,
    tags=("agg", "incremental", "materialized-view", "maintenance",
          "generations", "time-travel"),
)
def agg_incremental_mv_rollback_read(spark, sf_dir):
    """VERSIONED incremental view with a TIME-TRAVEL read (r15) — the
    MV-tier form of the serving-state generations
    (`layout_generation_rollback_read` is the layout-tier twin): the
    priority rollup absorbs three yearly refresh batches with
    ``keep_generations=2``, so each refresh publishes as an immutable
    marker-committed generation (no rename — a reader's plan survives a
    concurrent refresh) and the retention prunes generation 1 when 3
    commits. `read_agg_state(generation=2)` then answers "the view as of
    refresh 2" — exactly the pre-1997 facts — which is what the oracle
    recomputes. The CURRENT view is asserted to differ first (it holds
    all three batches), so a resolve bug that silently serves the newest
    generation cannot pass; the pruned generation 1 is asserted
    unreadable, pinning the retention contract. At 100 TB the rollback
    read costs one directory resolution over the group-cardinality-sized
    state — the debugging/rollback story a petabyte rollup needs after a
    bad upstream delta."""
    from cinegraph_spark.operators.incremental import (
        merge_agg_state,
        read_agg_state,
    )
    from cinegraph_spark.session import scratch_dir

    o = T(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    def rollup(df):
        return df.groupBy(
            F.col("o_orderpriority").alias("priority")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("sum_cents"),
        )

    state = scratch_dir("cg_mv_gen_") + "/state"
    keys, sums = ["priority"], ["n_orders", "sum_cents"]
    batches = [
        o.filter(F.year("o_orderdate") < 1996),
        o.filter(F.year("o_orderdate") == 1996),
        o.filter(F.year("o_orderdate") >= 1997),
    ]
    for i, b in enumerate(batches, start=1):
        merge_agg_state(
            spark, state, rollup(b), keys, sums, batch_id=i,
            keep_generations=2,
        )
    asof = read_agg_state(spark, state, generation=2)
    current = read_agg_state(spark, state)
    # poison check: current holds batch 3's facts too — if generation
    # resolution silently served the newest state, the counts would match
    n_asof = asof.agg(F.sum("n_orders")).first()[0]
    n_now = current.agg(F.sum("n_orders")).first()[0]
    # the poison check binds only when the NEWEST refresh actually added
    # facts (the distinction it tests for) — on a corpus whose third
    # batch is factless (or a fully empty corpus) generations 2 and 3
    # are legitimately identical
    n_b3 = (
        rollup(batches[-1]).agg(F.sum("n_orders")).first()[0] or 0
    )
    if n_b3:
        assert (n_asof or 0) < n_now, (
            "rollback read must predate the newest refresh"
        )
    # retention: generation 1 was pruned when generation 3 committed
    try:
        read_agg_state(spark, state, generation=1)
        raise AssertionError("pruned generation 1 must not be readable")
    except ValueError:
        pass
    return asof.select(
        "priority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
    )
