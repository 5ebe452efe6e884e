"""Batch-split invariance of the streaming near-dup admission gate: the
capless portable-MinHash signature is a pure per-document function, so the
gate's verdict must be IDENTICAL whether the delivery arrives as one
micro-batch or many (tests the claim the registered query's docstring
calls a theorem — and the directory-shaped documents reader branch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.queries.analytics import (
    _mh_bands_df,
    _MH_PERMS,
    _neardup_gate,
    _portable_minhash_sigs_from,
)
from cinegraph_spark.streaming.windows import run_availablenow_to_parquet


def _corpus(spark):
    """12 snapshot docs + 6 incoming: two incoming docs are near-copies of
    snapshot docs (one word changed in 40), four are unrelated."""
    words = [f"w{i}" for i in range(40)]
    snap = []
    for i in range(12):
        body = " ".join(words[j % 40] + f"s{i}" if j % 7 == 0 else words[j % 40]
                        for j in range(40))
        snap.append((i * 3 + 1, body))  # ids % 3 != 0
    inc = []
    # doc 0: near-copy of snapshot doc 0 (ONE word changed — some bands
    # survive; measured est 0.625 on this corpus); doc 3: EXACT copy of
    # snapshot doc 5 (identical signature — every band matches, est 1.0).
    # A near-copy is not guaranteed a band hit (4x4 LSH recall is
    # probabilistic per pair), so only these two shapes are deterministic.
    toks = snap[0][1].split(" ")
    toks[20] = "CHANGED"
    inc.append((0, " ".join(toks)))  # ids % 3 == 0
    inc.append((3, snap[5][1]))
    for k in range(2, 6):
        inc.append((k * 3, " ".join(f"unique{k}_{j}" for j in range(40))))
    return snap, inc


def _index(spark, snap):
    snap_df = spark.createDataFrame(snap, "doc_id long, text string")
    sigs = _portable_minhash_sigs_from(snap_df).localCheckpoint(eager=True)
    bands = _mh_bands_df(sigs, "snap_id").localCheckpoint(eager=True)
    b_sig = sigs.select(
        F.col("doc_id").alias("snap_id"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(_MH_PERMS)],
    )
    return bands, b_sig


@pytest.mark.slow  # r19 quick-tier gate (see conftest)
def test_gate_verdict_invariant_under_micro_batch_split(spark, tmp_path):
    snap, inc = _corpus(spark)
    bands, b_sig = _index(spark, snap)
    gate = _neardup_gate(bands, b_sig)

    inc_df = spark.createDataFrame(inc, "doc_id long, text string")
    single = {r["doc_id"]: r.asDict() for r in gate(inc_df).collect()}

    # deliver the same 6 docs as a DIRECTORY of 3 part files, one per
    # micro-batch (maxFilesPerTrigger=1) -> 3 foreachBatch invocations
    doc_dir = f"{tmp_path}/documents.parquet"
    for i in range(3):
        spark.createDataFrame(
            inc[2 * i : 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(doc_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_dir)
    )
    out = run_availablenow_to_parquet(
        spark,
        stream,
        f"{tmp_path}/gate_out",
        output_mode="append",
        transform=gate,
    )
    multi = {r["doc_id"]: r.asDict() for r in out.collect()}

    assert multi == single
    assert len(multi) == 6
    # the two planted near-copies are rejected, the four unique docs admitted
    rejected = {d for d, r in multi.items() if r["admitted"] == 0}
    assert rejected == {0, 3}
    assert all(multi[d]["n_candidates"] == 0 for d in (6, 9, 12, 15))


def test_read_documents_stream_handles_directory_shape(spark, tmp_path):
    """The testdata has shipped both shapes (events flipped in r6); the
    documents reader must stream a DIRECTORY documents.parquet directly —
    the pathGlobFilter approach matches nothing in that layout."""
    from cinegraph_spark.streaming.windows import read_documents_stream

    doc_dir = f"{tmp_path}/documents.parquet"
    rows = [(i, f"text {i}", "en", "s", 6) for i in range(10)]
    for half in (rows[:5], rows[5:]):
        spark.createDataFrame(
            half, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).coalesce(1).write.mode("append").parquet(doc_dir)
    out = run_availablenow_to_parquet(
        spark,
        read_documents_stream(spark, str(tmp_path)).select("doc_id", "text"),
        f"{tmp_path}/out",
        output_mode="append",
    )
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(10))
