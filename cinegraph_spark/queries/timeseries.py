"""Time-series smoothing and quantile-sketch queries over ``events``.

Two additions beyond the EWMA family in ``analytics.py``:

- Holt's linear-trend smoothing — a genuinely *sequential* per-series
  recursion (level/trend update per day). The Spark shape is the canonical
  one for per-key ordered state at scale: pre-aggregate to the daily grain
  JVM-side (the only corpus-sized work), then ``applyInPandas`` per series
  key runs the recursion over the tiny ordered frame. The oracle unrolls
  the same recursion as a DuckDB recursive CTE, so the stateful operator
  gets an exact cross-engine check — the same trick as the PageRank /
  label-propagation unrolled oracles (``queries/graph.py``).
- Fixed-width histogram quantiles — the portable cousin of t-digest /
  ``approx_percentile``: integer bin counts (exact in both engines), one
  window cumulative sum, linear interpolation inside the target bin. The
  sketch is ~100 bins per series regardless of row count — broadcastable
  at any corpus size — and, unlike ``approx_percentile``, every
  intermediate is engine-portable so the estimate itself is oracle-exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T, dstr, r4

#: Holt smoothing constants (level / trend blend).
_HOLT_ALPHA = 0.3
_HOLT_BETA = 0.2


def _holt_scan(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential Holt linear-trend scan over one series (already at the
    daily grain, ~30 rows here; bounded by the calendar, not the corpus).
    Operation order mirrors the oracle's recursive CTE exactly — binary64
    ops in the same order produce bit-identical results."""
    pdf = pdf.sort_values("day").reset_index(drop=True)
    a, b = _HOLT_ALPHA, _HOLT_BETA
    levels, trends = [], []
    level = trend = 0.0
    for i, y in enumerate(pdf["y"]):
        if i == 0:
            level, trend = y, 0.0
        else:
            prev = level
            level = a * y + (1.0 - a) * (level + trend)
            trend = b * (level - prev) + (1.0 - b) * trend
        levels.append(level)
        trends.append(trend)
    pdf["level"] = levels
    pdf["trend"] = trends
    return pdf[["event_type", "day", "level", "trend"]]


@register(
    "ts_holt_linear_daily",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(ts AS DATE)) AS rn
      FROM events
      GROUP BY 1, 2
    ),
    holt AS (
      SELECT event_type, day, rn, y,
             y AS level, CAST(0 AS DOUBLE) AS trend
      FROM daily WHERE rn = 1
      UNION ALL
      SELECT d.event_type, d.day, d.rn, d.y,
             {_HOLT_ALPHA} * d.y
               + (1.0 - {_HOLT_ALPHA}) * (h.level + h.trend) AS level,
             {_HOLT_BETA} * ({_HOLT_ALPHA} * d.y
               + (1.0 - {_HOLT_ALPHA}) * (h.level + h.trend) - h.level)
               + (1.0 - {_HOLT_BETA}) * h.trend AS trend
      FROM daily d JOIN holt h
        ON d.event_type = h.event_type AND d.rn = h.rn + 1
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           round(level, 4) AS level, round(trend, 4) + 0 AS trend
    FROM holt
    """,
    tags=("timeseries", "smoothing", "applyInPandas", "stateful"),
)
def ts_holt_linear_daily(spark, sf_dir):
    """Holt linear-trend smoothing of daily event-value totals per event
    type (α=0.3, β=0.2; l1=y1, b1=0). Corpus-sized work is the JVM daily
    aggregation; the recursion runs per series key via applyInPandas over
    the calendar-bounded daily frame — the standard Spark shape for per-key
    sequential state (same partitioning story at 100 TB: one shuffle to the
    daily grain, then one tiny Arrow batch per key)."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day_d"))
        .agg(F.sum("value").alias("y"))
        .select("event_type", dstr(F.col("day_d")).alias("day"), "y")
    )
    smoothed = daily.groupBy("event_type").applyInPandas(
        _holt_scan, "event_type string, day string, level double, trend double"
    )
    return smoothed.select(
        "event_type",
        "day",
        r4(F.col("level")).alias("level"),
        r4(F.col("trend")).alias("trend"),
    )


#: histogram geometry: fixed bin width over the (0, ~500) value range →
#: ≤ ~100 occupied bins per series; the sketch is size-bounded by the value
#: range, never by the row count.
_HIST_BIN_WIDTH = 5.0
_HIST_QUANTILES = (0.5, 0.95, 0.99)


@register(
    "sketch_histogram_quantiles",
    f"""
    WITH hist AS (
      SELECT event_type,
             CAST(floor(value / {_HIST_BIN_WIDTH}) AS BIGINT) AS bin,
             count(*) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS total
      FROM hist
    ),
    qs AS (SELECT CAST(unnest([{", ".join(str(q) for q in _HIST_QUANTILES)}])
                       AS DOUBLE) AS q),
    cand AS (
      SELECT event_type, q, bin, c, cum, total
      FROM cum CROSS JOIN qs
      WHERE cum >= q * total
    ),
    first AS (
      SELECT event_type, q, min(bin) AS bin FROM cand GROUP BY 1, 2
    )
    SELECT c2.event_type, c2.q,
           round(c2.bin * {_HIST_BIN_WIDTH}
                 + {_HIST_BIN_WIDTH} * (c2.q * c2.total - (c2.cum - c2.c))
                   / c2.c, 4) AS quantile_est
    FROM cand c2
    JOIN first f
      ON c2.event_type = f.event_type AND c2.q = f.q AND c2.bin = f.bin
    """,
    tags=("sketch", "quantile", "histogram", "portable"),
)
def sketch_histogram_quantiles(spark, sf_dir):
    """Approximate p50/p95/p99 of event value per type from a fixed-width
    histogram sketch: integer bin counts (map-side combinable, exact in
    both engines), cumulative window over the ~100-bin sketch, linear
    interpolation inside the first bin whose cumulative count reaches the
    target rank. The portable stand-in for approx_percentile/t-digest:
    merge-able (bin counts add), size-bounded by the value range, and —
    because every intermediate is integer or a shared closed-form double —
    exactly reproducible across engines, which approx sketches with
    engine-specific internals can never be."""
    # present values only: a NULL value makes a NULL bin, which sorts
    # NULLS FIRST in Spark's cumulative window and NULLS LAST in
    # DuckDB's — and a histogram of absent measurements is undefined
    # anyway (r17 adversarial sweep)
    e = T(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hist = e.groupBy(
        "event_type",
        F.floor(F.col("value") / _HIST_BIN_WIDTH).cast("long").alias("bin"),
    ).agg(F.count("*").alias("c"))
    cum = hist.select(
        "event_type",
        "bin",
        "c",
        F.sum("c")
        .over(Window.partitionBy("event_type").orderBy("bin"))
        .alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("total"),
    )
    from cinegraph_spark.session import local_df

    qs = F.broadcast(
        local_df(
            cum.sparkSession, [(q,) for q in _HIST_QUANTILES], "q double"
        )
    )
    cand = cum.crossJoin(qs).filter(F.col("cum") >= F.col("q") * F.col("total"))
    first = cand.groupBy("event_type", "q").agg(
        F.min_by(F.struct("bin", "c", "cum", "total"), "bin").alias("s")
    )
    est = (
        F.col("s.bin") * _HIST_BIN_WIDTH
        + _HIST_BIN_WIDTH
        * (F.col("q") * F.col("s.total") - (F.col("s.cum") - F.col("s.c")))
        / F.col("s.c")
    )
    return first.select(
        "event_type", "q", r4(est).alias("quantile_est")
    )


@register(
    "agg_incremental_mv_hist_quantiles",
    f"""
    WITH hist AS (
      SELECT event_type,
             CAST(floor(value / {_HIST_BIN_WIDTH}) AS BIGINT) AS bin,
             count(*) AS c
      FROM events WHERE value < 250 GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS total
      FROM hist
    ),
    qs AS (SELECT CAST(unnest([{", ".join(str(q) for q in _HIST_QUANTILES)}])
                       AS DOUBLE) AS q),
    cand AS (
      SELECT event_type, q, bin, c, cum, total
      FROM cum CROSS JOIN qs
      WHERE cum >= q * total
    ),
    first AS (
      SELECT event_type, q, min(bin) AS bin FROM cand GROUP BY 1, 2
    )
    SELECT c2.event_type, c2.q,
           round(c2.bin * {_HIST_BIN_WIDTH}
                 + {_HIST_BIN_WIDTH} * (c2.q * c2.total - (c2.cum - c2.c))
                   / c2.c, 4) AS quantile_est
    FROM cand c2
    JOIN first f
      ON c2.event_type = f.event_type AND c2.q = f.q AND c2.bin = f.bin
    """,
    tags=("sketch", "quantile", "histogram", "incremental",
          "materialized-view", "cdc"),
)
def agg_incremental_mv_hist_quantiles(spark, sf_dir):
    """Incremental QUANTILES in a materialized view, WITH retractions
    (r14) — the sum-merged sketch class completing the incremental-view
    measure algebra (sums/counts: additive; max/min: insert-only; HLL
    registers: max-merged insert-only; histogram bins: SUM-merged and
    therefore retractable): the view carries one sparse fixed-width
    value histogram per event type (``map<bin,count>``,
    `merge_agg_state(hist_maps=...)` merges by key-wise sum and drops
    zeroed bins), batch 0 absorbs every event, batch 1 RETRACTS the
    upper tail (value ≥ 250) as negated bin counts — so p50/p95/p99
    shift materially and the oracle (the portable histogram-quantile
    fold over the filtered facts) only matches if the subtraction and
    bin-drop are exact. The replayed retraction is a ledger no-op; a
    re-shipped retraction under a NEW batch id would drive bins
    negative and the merge refuses before committing. Every
    intermediate is integer or a shared closed-form double, so the
    estimates hash-match cross-engine at the repo's 4-decimal rounding.
    At 100 TB the state per group is bounded by the VALUE RANGE, never
    the row count, and a refresh reads only the new facts."""
    from cinegraph_spark.operators.incremental import merge_agg_state
    from cinegraph_spark.session import scratch_dir

    ev = (
        T(spark, sf_dir, "events")
        .select("event_type", "value")
        # NULL values never enter the view: they would form a NULL
        # histogram bin (unretractable by any value predicate) and the
        # oracle's value<250 filter drops them anyway (r17 sweep)
        .filter(F.col("value").isNotNull())
    )
    keys, sums = ["event_type"], ["n_events"]

    def pre_agg(df, sign=1):
        bins = df.groupBy(
            "event_type",
            F.floor(F.col("value") / _HIST_BIN_WIDTH)
            .cast("long")
            .alias("bin"),
        ).agg((F.lit(sign) * F.count(F.lit(1))).alias("c"))
        return bins.groupBy("event_type").agg(
            F.sum("c").alias("n_events"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("bin", "c")))
            ).alias("value_bins"),
        )

    state = scratch_dir("cg_mv_hist_") + "/state"
    merge_agg_state(
        spark, state, pre_agg(ev), keys, sums, batch_id=0,
        n_col="n_events", hist_maps=["value_bins"],
    )
    retract = pre_agg(ev.filter(F.col("value") >= 250), sign=-1)
    merge_agg_state(
        spark, state, retract, keys, sums, batch_id=1,
        n_col="n_events", hist_maps=["value_bins"],
    )
    replay = merge_agg_state(
        spark, state, retract, keys, sums, batch_id=1,
        n_col="n_events", hist_maps=["value_bins"],
    )
    assert replay["applied"] is False  # ledger contract

    hist = (
        spark.read.parquet(state + "/agg")
        .select("event_type", F.explode("value_bins").alias("bin", "c"))
    )
    cum = hist.select(
        "event_type",
        "bin",
        "c",
        F.sum("c")
        .over(Window.partitionBy("event_type").orderBy("bin"))
        .alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("total"),
    )
    from cinegraph_spark.session import local_df

    qs = F.broadcast(
        local_df(spark, [(q,) for q in _HIST_QUANTILES], "q double")
    )
    cand = cum.crossJoin(qs).filter(
        F.col("cum") >= F.col("q") * F.col("total")
    )
    first = cand.groupBy("event_type", "q").agg(
        F.min_by(F.struct("bin", "c", "cum", "total"), "bin").alias("s")
    )
    est = (
        F.col("s.bin") * _HIST_BIN_WIDTH
        + _HIST_BIN_WIDTH
        * (F.col("q") * F.col("s.total") - (F.col("s.cum") - F.col("s.c")))
        / F.col("s.c")
    )
    return first.select("event_type", "q", r4(est).alias("quantile_est"))
