"""Invariants that oracle parity CANNOT catch: the oracle recomputes the
same construction, so a bug shared by both sides still hash-matches. Each
test here derives the ground truth through an INDEPENDENT path and checks
the query's claim against it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.queries import load_all

SPECS = load_all()


def test_bloom_filter_has_no_false_negatives(spark, sf_dir):
    """'filtered' + 'hit_true' must partition the true matches exactly:
    every order whose custkey IS in the build set must pass the filter
    (Bloom can false-positive, never false-negative). Ground truth via a
    plain join, independent of the bit-set construction."""
    out = {
        r["category"]: r["n_orders"]
        for r in SPECS["join_bloom_prefilter_effect"].spark(
            spark, sf_dir
        ).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    n_true = o.join(
        c, o["o_custkey"] == c["c_custkey"], "left_semi"
    ).count()
    assert out.get("hit_true", 0) == n_true
    # and the categories partition all orders
    assert sum(out.values()) == o.count()


def test_incremental_dedup_flags_every_injected_copy_exact(spark, sf_dir):
    """Every injected snapshot copy (doc_id >= 10000) is byte-identical to
    a snapshot doc, so its status MUST be exact_dup; and no base incoming
    doc (corpus has no exact duplicates) may be exact_dup."""
    rows = SPECS["dedup_incremental_vs_snapshot"].spark(
        spark, sf_dir
    ).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], set()).add(r["doc_id"])
    copies = {d for s in by_status.values() for d in s if d >= 10000}
    assert copies and copies <= by_status.get("exact_dup", set())
    assert all(d >= 10000 for d in by_status.get("exact_dup", set()))


def test_histogram_quantiles_land_in_ceil_rank_bin(spark, sf_dir):
    """The sketch's accuracy contract: the estimate interpolates INSIDE
    the bin containing the ceil-rank order statistic, so it must sit
    within one bin width (5.0) of the exact DISCRETE quantile. (Distance
    to the *continuous* quantile is data-dependent — in a sparse tail the
    interpolated value can sit many bins from any real observation — so
    percentile_disc, an actual observation, is the independent truth.)"""
    est = {
        (r["event_type"], r["q"]): r["quantile_est"]
        for r in SPECS["sketch_histogram_quantiles"].spark(
            spark, sf_dir
        ).collect()
    }
    from cinegraph_spark.queries.util import T

    T(spark, sf_dir, "events").createOrReplaceTempView("_ev_inv")
    disc = {
        (r["event_type"], q): r[f"d{int(q * 100)}"]
        for r in spark.sql(
            "SELECT event_type, "
            + ", ".join(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY value) "
                f"AS d{int(q * 100)}"
                for q in (0.5, 0.95, 0.99)
            )
            + " FROM _ev_inv GROUP BY event_type"
        ).collect()
        for q in (0.5, 0.95, 0.99)
    }
    for key, e in est.items():
        assert abs(e - disc[key]) <= 5.0, (key, e, disc[key])
