"""Pipeline-metrics capability: `DataFrame.observe` attaches named
aggregate metrics to a plan and reports them as a side effect of the SAME
action that produces the data — no second pass. At 100 TB this is how a
pipeline gets row counts / null rates / value bounds per stage for free
(a separate `.count()` or quality scan would re-read the stage input).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from cinegraph_spark.queries.util import T


def test_observe_reports_metrics_with_single_action(spark, sf_dir):
    obs = Observation("lineitem_quality")
    li = T(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("int")).alias("null_qty"),
        F.max("l_shipdate").alias("max_shipdate"),
    )
    out = li.filter(F.col("l_discount") > 0).groupBy("l_returnflag").count()
    result = {r["l_returnflag"]: r["count"] for r in out.collect()}

    got = obs.get
    want_rows = T(spark, sf_dir, "lineitem").count()
    assert got["n_rows"] == want_rows  # observed BEFORE the filter
    assert got["null_qty"] == 0
    assert got["max_shipdate"] is not None
    assert sum(result.values()) <= want_rows


def test_observe_in_pipeline_stage_counts_rows_in_and_out(spark, sf_dir):
    """The stage-accounting idiom: observe on both sides of a filter gives
    in/out row counts from one action."""
    obs_in = Observation("in")
    obs_out = Observation("out")
    d = (
        T(spark, sf_dir, "documents")
        .observe(obs_in, F.count(F.lit(1)).alias("n"))
        .filter(F.length("text") >= 50)
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
    )
    kept = d.count()
    assert obs_out.get["n"] == kept
    assert obs_in.get["n"] >= kept
