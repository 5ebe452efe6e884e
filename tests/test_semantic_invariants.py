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


def test_leakage_safe_split_no_pair_straddles_the_boundary(spark, sf_dir):
    """The split's whole claim, checked through an independent path: join
    the exact-Jaccard near-dup pairs (recomputed here, not the audit
    query's counters) onto the split assignment and assert NO pair has
    endpoints on different sides; also that the split is a pure function
    of the cluster key and covers every document."""
    from cinegraph_spark.queries.neardup_common import (
        ngram_jaccard_pairs_df,
    )

    split = SPECS["sample_leakage_safe_split"].spark(spark, sf_dir)
    rows = split.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs  # total function: every doc gets a side
    side = {r["doc_id"]: r["split"] for r in rows}
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["split_key"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_key.values())
    pairs = ngram_jaccard_pairs_df(spark, sf_dir).collect()
    assert pairs  # fixtures must exercise the claim
    straddling = [
        (p["id_a"], p["id_b"])
        for p in pairs
        if side[p["id_a"]] != side[p["id_b"]]
    ]
    assert straddling == []
    # and the audit query reports exactly that, plus a NON-zero naive
    # leak on these fixtures (otherwise the audit demonstrates nothing)
    audit = {
        r["scheme"]: (r["n_pairs"], r["n_leaking"])
        for r in SPECS["sample_split_leakage_audit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert audit["cluster_safe"] == (len(pairs), 0)
    assert audit["naive_per_doc"][0] == len(pairs)
    assert audit["naive_per_doc"][1] > 0


def test_kcenter_radius_is_nonincreasing_and_picks_distinct(spark, sf_dir):
    """Greedy k-center's mathematical certificate, independent of the
    oracle construction: the max-min covering radius cannot grow as
    centers are added (each pick's radius2 is the maximum over a set
    that only shrinks), picks are distinct, and every pick is a real
    corpus vector."""
    rows = sorted(
        (
            (r["pick_order"], r["vec_id"], r["radius2"])
            for r in SPECS["sample_kcenter_coreset"]
            .spark(spark, sf_dir)
            .collect()
        )
    )
    assert [o for o, _, _ in rows] == list(range(len(rows)))
    ids = [v for _, v, _ in rows]
    assert len(set(ids)) == len(ids)
    radii = [r for o, _, r in rows if o >= 1]
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii
    assert radii[-1] > 0  # fixtures must exercise real spread
    corpus_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id")
        .collect()
    }
    assert set(ids) <= corpus_ids
