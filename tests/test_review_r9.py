"""Round-9 adversarial-review regressions: latent hazards found by a code
audit of the older operator modules (similarity/dedup/graph/stateful) —
each test pins the fixed behavior so it cannot quietly regress.

Spark 4 context that makes several of these real: ``spark.sql.ansi.enabled``
defaults to TRUE, so plain ``0.0/0.0`` and out-of-range ``element_at``
RAISE at runtime instead of returning NULL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.functions import vector as V
from cinegraph_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)


def test_cosine_zero_vector_yields_null_not_crash(spark):
    """One all-zero embedding (typical encoder output for empty text) must
    rank last, not kill the query with ANSI DIVIDE_BY_ZERO."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 2.0, 2.0])],
        "vec_id long, v array<double>",
    )
    q = [3.0, 0.0, 4.0]
    got = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", V.cosine(F.col("v"), F.array(*[F.lit(x) for x in q])).alias("c")
        ).collect()
    }
    assert got[1] is None
    assert got[2] == pytest.approx(11.0 / 15.0)


def test_ivf_topk_survives_zero_vector_row(spark):
    """IVF probe + re-rank evaluate cosine over every candidate row AND
    every centroid; a zero vector in either position must not raise."""
    from cinegraph_spark.operators.similarity import ivf_cosine_topk

    e = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.0, 0.0]),  # zero row inside a probed cell
            (3, 1, [0.0, 1.0]),
            (4, 2, [0.0, 0.0]),  # a whole zero cell -> zero centroid
        ],
        "vec_id long, label int, v array<double>",
    )
    q = spark.createDataFrame([([1.0, 0.0],)], "qv array<double>")
    rows = ivf_cosine_topk(e, q, nprobe=3, k=4).collect()
    ranked = [r["vec_id"] for r in rows]
    assert ranked[0] == 1  # exact match first
    # NULL cosines (zero vectors) sort last under desc ordering
    assert set(ranked[:2]) == {1, 3}


def test_lsh_short_signature_raises_named_error(spark):
    """bands*rows > num_perm must fail loudly with an error naming the
    knobs — not an anonymous element_at INVALID_ARRAY_INDEX mid-stage."""
    df = spark.createDataFrame(
        [(1, ["a"] * 12), (2, ["a"] * 12)], "doc_id long, tokens array<string>"
    )
    sigs = minhash_signatures(
        shingles(df, "doc_id", "tokens", n=8), "doc_id", num_perm=16
    )
    with pytest.raises(Exception, match="bands\\*rows"):
        lsh_candidate_pairs(sigs, "doc_id", bands=8, rows=4).collect()


def test_jaccard_verified_mode_is_candidate_bounded(spark):
    """Verification mode must restrict the shingle stream to candidate
    documents BEFORE the shared-shingle self-join: a hot shingle among
    non-candidate docs must contribute neither pairs nor join fan-out,
    and candidate docs keep their FULL shingle sets (true Jaccard)."""
    rows = [
        (1, ["a b", "x y", "q r"]),
        (2, ["a b", "x y", "s t"]),
    ]
    # 50 non-candidate docs all sharing one hot shingle
    rows += [(100 + i, ["hot shingle"]) for i in range(50)]
    sh = spark.createDataFrame(
        rows, "doc_id long, shingle_arr array<string>"
    ).select("doc_id", F.explode("shingle_arr").alias("shingle"))
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = jaccard_pairs(sh, "doc_id", candidates=cands).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["n_a"], r["n_b"], r["n_common"]) == (
        1, 2, 3, 3, 2,
    )
    assert r["jaccard"] == pytest.approx(2 / 4)
    # the self-join input is semi-joined down to candidate ids (two
    # LeftSemi joins total: the id restriction + the final pair filter)
    plan = (
        jaccard_pairs(sh, "doc_id", candidates=cands)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("LeftSemi") >= 2


def test_jaccard_discovery_df_cap_single_exchange(spark):
    """Discovery mode applies the DF cap with a window count sharing the
    posting-list aggregation's hash partitioning — one Exchange on
    ``shingle``, and the hot-shingle group never reaches a collect_list
    buffer (the window operator spills; an aggregation buffer doesn't)."""
    rows = [(i, ["common"] + [f"rare{i}", f"rare{i}b"]) for i in range(30)]
    sh = spark.createDataFrame(
        rows, "doc_id long, shingle_arr array<string>"
    ).select("doc_id", F.explode("shingle_arr").alias("shingle"))
    df_pairs = jaccard_pairs(sh, "doc_id", max_df=20)
    plan = df_pairs._jdf.queryExecution().executedPlan().toString()
    # one shingle Exchange PER posting-list branch — the window's count
    # and the downstream aggregation share it; a cap that forced its own
    # re-shuffle would show two shingle exchanges per window
    assert plan.count("hashpartitioning(shingle") == plan.count(
        "windowspecdefinition(shingle"
    ), plan
    # the DF-30 'common' shingle is capped out: no pairs survive
    assert df_pairs.collect() == []


def test_bfs_levels_string_keys(spark):
    """The BFS seed frame must follow the edge schema's id type — string-
    keyed graphs (external document ids) are first-class."""
    from cinegraph_spark.operators.graph_algos import bfs_levels

    e = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c")], "src string, dst string"
    )
    got = {r["id"]: r["level"] for r in bfs_levels(e, "doc-a").collect()}
    assert got == {"doc-a": 0, "doc-b": 1, "doc-c": 2}
