"""The hierarchical (bucketed) prefix-sum in ``sample_token_budget_greedy``
must select EXACTLY the set a naive single-reducer global window would —
the two-level offset arithmetic is the only thing that differs, so pin the
equivalence, the straddling-document rule, and determinism across
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cinegraph_spark.queries import load_all

SPECS = load_all()


def _naive(spark, sf_dir):
    q = SPECS["text_quality_score"].spark(spark, sf_dir).select(
        "doc_id",
        "n_tok",
        F.round(F.col("quality") * 10000).cast("long").alias("qmilli"),
    )
    w = Window.orderBy(F.desc("qmilli"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = q.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    )
    budget = q.agg(
        F.expr("(4 * CAST(sum(n_tok) AS BIGINT)) div 10").alias("budget")
    )
    return (
        ranked.crossJoin(F.broadcast(budget))
        .filter(F.col("cum_before") < F.col("budget"))
        .select("doc_id", "n_tok", "qmilli", "cum_before")
    )


def test_hierarchical_equals_naive_global_window(spark, sf_dir):
    got = {
        r["doc_id"]: (r["n_tok"], r["qmilli"], r["cum_before"])
        for r in SPECS["sample_token_budget_greedy"].spark(spark, sf_dir).collect()
    }
    want = {
        r["doc_id"]: (r["n_tok"], r["qmilli"], r["cum_before"])
        for r in _naive(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0


def test_straddling_doc_included_budget_respected(spark, sf_dir):
    rows = SPECS["sample_token_budget_greedy"].spark(spark, sf_dir).collect()
    total = (
        SPECS["text_quality_score"]
        .spark(spark, sf_dir)
        .agg(F.sum("n_tok"))
        .collect()[0][0]
    )
    budget = (4 * total) // 10
    cum = 0
    for r in rows:  # ordered by cum_before
        assert r["cum_before"] == cum  # contiguous greedy prefix
        assert cum < budget  # selection rule
        cum += r["n_tok"]
    assert cum >= budget  # the straddling doc pushed us to/over budget


def test_global_shuffle_hierarchical_equals_naive(spark, sf_dir):
    """sample_global_shuffle_order's 256-shard rank must equal the naive
    single-window global rank bit-for-bit (shard = leading md5 byte, so
    shard order IS key order)."""
    got = {
        r["doc_id"]: r["global_pos"]
        for r in SPECS["sample_global_shuffle_order"]
        .spark(spark, sf_dir)
        .collect()
    }
    keyed = (
        SPECS["sample_global_shuffle_order"]
        .spark(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.md5(
                F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string"))
            ).alias("k"),
        )
    )
    w = Window.orderBy("k", "doc_id")
    want = {
        r["doc_id"]: r["pos"]
        for r in keyed.select(
            "doc_id", (F.row_number().over(w) - 1).alias("pos")
        ).collect()
    }
    assert got == want
    # positions are a permutation of 0..n-1
    assert sorted(got.values()) == list(range(len(got)))
