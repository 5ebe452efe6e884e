"""ANN recall properties: the IVF operator with a geometry-aware (KMeans)
coarse quantizer must recover a meaningful fraction of the exact top-k, and
more probes can only help.

The oracle-checked `vec_ann_ivf_topk` uses the driver tables' `label` as
the cell — exactly reproducible cross-engine but geometry-blind (labels are
synthetic). This test runs the same operator with cells assigned by seeded
Spark ML KMeans (the production IVF build step) and checks recall against
brute force: ~0.5 on the uniform-ish synthetic vectors vs ~0.2 expected
from probing 2 random cells of 10.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.functions import vector as V
from cinegraph_spark.operators.clustering import kmeans_assign
from cinegraph_spark.operators.similarity import ivf_cosine_topk
from cinegraph_spark.queries.util import T

DIM = 64


@pytest.fixture(scope="module")
def corpus_and_query(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    feat = e.select(
        "vec_id", *[F.col("v")[i].alias(f"f{i}") for i in range(DIM)]
    )
    assign, _ = kmeans_assign(feat, "vec_id", [f"f{i}" for i in range(DIM)], k=10)
    ek = e.join(assign, "vec_id").select(
        "vec_id", F.col("cluster").alias("cell"), "v"
    )
    q = ek.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    corpus = ek.filter(F.col("vec_id") != 0).localCheckpoint(eager=True)
    exact = (
        corpus.crossJoin(F.broadcast(q))
        .select("vec_id", V.cosine(F.col("v"), F.col("qv")).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(10)
    )
    exact_ids = {r.vec_id for r in exact.collect()}
    return corpus, q, exact_ids


def _recall(corpus, q, exact_ids, nprobe):
    got = ivf_cosine_topk(corpus, q, nprobe=nprobe, k=10, label="cell")
    return len({r.vec_id for r in got.collect()} & exact_ids) / len(exact_ids)


def test_kmeans_ivf_recall_beats_random_probing(corpus_and_query):
    corpus, q, exact_ids = corpus_and_query
    # 2 probes of 10 cells would give ~0.2 recall if cells were random;
    # the KMeans quantizer concentrates neighbors (measured ~0.5)
    assert _recall(corpus, q, exact_ids, nprobe=2) >= 0.3


def test_ivf_recall_monotone_in_nprobe(corpus_and_query):
    corpus, q, exact_ids = corpus_and_query
    r2 = _recall(corpus, q, exact_ids, nprobe=2)
    r10 = _recall(corpus, q, exact_ids, nprobe=10)
    assert r10 >= r2
    # probing every cell IS brute force
    assert r10 == 1.0
