"""Reporting-grain rollups and data-quality constraint checks.

- Multi-grain time rollup: GROUPING SETS over the (day, day+hour) time
  hierarchy in ONE pass over the fact table — the hypertable/continuous-
  aggregate shape: coarse grains are computed from the same shuffle as the
  fine grain instead of re-scanning (Spark executes grouping sets as a
  single Expand + one aggregation; at 100 TB that is one corpus read for
  every grain).

- Constraint report: the single-pass data-quality audit a pipeline runs
  before publishing a table (null counts, domain violations, referential
  orphans, duplicate keys). Shaped as one row per constraint so the report
  is append-able and alert-able; every check is a conditional aggregate in
  the same scan, plus one broadcast anti-join for the FK orphan count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T, dstr, r4


@register(
    "events_multigrain_time_rollup",
    """
    SELECT coalesce(strftime(CAST(ts AS DATE), '%Y-%m-%d'), 'ALL') AS day,
           CAST(CASE WHEN GROUPING(hour(ts)) = 0 THEN hour(ts) END
                AS BIGINT) AS hr,
           CAST(GROUPING(CAST(ts AS DATE), hour(ts)) AS BIGINT) AS grain_id,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((CAST(ts AS DATE)),
                            (CAST(ts AS DATE), hour(ts)),
                            ())
    """,
    tags=("rollup", "grouping-sets", "timeseries", "hypertable"),
)
def events_multigrain_time_rollup(spark, sf_dir):
    """Day / day+hour / grand-total aggregates of events in one pass:
    GROUPING SETS compiles to a single Expand over one shuffle, so every
    grain shares the same fact-table scan — the continuous-aggregate
    maintenance shape (compare: three separate GROUP BYs = three corpus
    reads). grain_id is the standard GROUPING() bitmask so consumers can
    route rows to the right rollup table."""
    e = T(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), F.hour("ts").alias("h"), "value"
    )
    g = e.groupingSets(
        [[F.col("d")], [F.col("d"), F.col("h")], []], "d", "h"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.grouping_id().alias("_gid"),
    )
    return g.select(
        F.coalesce(dstr(F.col("d")), F.lit("ALL")).alias("day"),
        F.col("h").cast("long").alias("hr"),
        F.col("_gid").cast("long").alias("grain_id"),
        "n_events",
        "total_value",
    )


@register(
    "dq_constraint_report",
    """
    WITH base AS (SELECT * FROM orders),
    orphans AS (
      SELECT count(*) AS n FROM base
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    ),
    dup_keys AS (
      SELECT count(*) AS n FROM (
        SELECT o_orderkey FROM base GROUP BY o_orderkey HAVING count(*) > 1
      )
    )
    SELECT 'null_orderdate' AS constraint_name,
           count(*) FILTER (WHERE o_orderdate IS NULL) AS n_violations
    FROM base
    UNION ALL
    SELECT 'nonpositive_total', count(*) FILTER (WHERE o_totalprice <= 0)
    FROM base
    UNION ALL
    SELECT 'bad_status_domain',
           count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    FROM base
    UNION ALL
    SELECT 'fk_orphan_custkey', n FROM orphans
    UNION ALL
    SELECT 'duplicate_orderkey', n FROM dup_keys
    """,
    tags=("quality", "constraints", "audit"),
)
def dq_constraint_report(spark, sf_dir):
    """Publish-gate audit of orders: null / domain / range checks AND the
    FK-orphan count as conditional aggregates sharing ONE fact scan (the
    broadcast left join marks dimension hits inline), plus one more pass
    for the duplicate-key check (inherently its own groupBy). One row per
    constraint (name, violation count) — the shape a pipeline appends to a
    quality-history table and alerts on. At 100 TB: two fact scans + one
    dim broadcast, however many inline constraints you add."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", F.lit(True).alias("_dim_hit")
    )
    # one fact scan: the broadcast left join marks FK hits inline, so the
    # orphan count is just another conditional aggregate alongside the
    # null/domain/range checks — 4 of 5 constraints from a single pass.
    enriched = o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left"
    )
    inline = enriched.agg(
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias(
            "null_orderdate"
        ),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "nonpositive_total"
        ),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("bad_status_domain"),
        F.count(F.when(F.col("_dim_hit").isNull(), 1)).alias(
            "fk_orphan_custkey"
        ),
    )
    melted = inline.selectExpr(
        "stack(4, 'null_orderdate', null_orderdate, "
        "'nonpositive_total', nonpositive_total, "
        "'bad_status_domain', bad_status_domain, "
        "'fk_orphan_custkey', fk_orphan_custkey) "
        "AS (constraint_name, n_violations)"
    )
    # duplicate-key check is inherently its own aggregation (a groupBy on
    # the key); second and final fact pass.
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("duplicate_orderkey").alias("constraint_name"),
            "n_violations",
        )
    )
    return melted.unionByName(dups)


@register(
    "stats_robust_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad,
             any_value(m.med) AS med
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           round(any_value(m.med), 4) AS median_value,
           round(any_value(m.mad), 4) AS mad_value,
           CAST(count(*) FILTER (
             WHERE abs(e.value - m.med) > 3.0 * 1.4826 * m.mad
           ) AS BIGINT) AS n_outliers,
           count(*) AS n_events
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("quality", "robust-stats", "outliers", "mad"),
)
def stats_robust_mad_outliers(spark, sf_dir):
    """Robust outlier detection per event type: median + median absolute
    deviation (both exact continuous quantiles — Spark `percentile` ==
    DuckDB `quantile_cont`), then count values beyond 3 scaled-MAD
    (1.4826·MAD ≈ σ under normality). The z-score twin
    (events_anomaly_zscore_hourly) breaks under heavy tails — mean/std are
    themselves dragged by outliers; MAD is the standard robust gate a
    data-quality pipeline runs instead. Two grouped quantile passes over
    the fact + one broadcast of the 5-row stats table; at 100 TB swap the
    exact quantile for approx_percentile and the shape is unchanged."""
    e = T(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
            F.any_value("med").alias("med"),
        )
    )
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            r4(F.any_value("med")).alias("median_value"),
            r4(F.any_value("mad")).alias("mad_value"),
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3.0 * 1.4826 * F.col("mad"),
                    1,
                )
            )
            .cast("long")
            .alias("n_outliers"),
            F.count("*").alias("n_events"),
        )
    )
