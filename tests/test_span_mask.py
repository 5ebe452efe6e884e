"""Unit semantics of ``repeated_ngram_span_mask`` (cross-doc duplicated
k-gram span removal): coverage arithmetic, short-doc and fully-boilerplate
edges, and partition invariance (the operator consults no global order, so
its output must not depend on the input's physical layout).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.operators.dedup import repeated_ngram_span_mask


def _run(spark, rows, k=3, min_df=2, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if parts is not None:
        df = df.repartition(parts)
    out = repeated_ngram_span_mask(df, "text", "doc_id", k=k, min_df=min_df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_shared_span_masked_unique_tail_kept(spark):
    # docs 1 and 2 share the 3-gram "a b c" (positions 0-2 in both);
    # their tails are unique and must survive.
    rows = [(1, "a b c x y z"), (2, "a b c p q r"), (3, "u v w m n o")]
    got = _run(spark, rows, k=3, min_df=2)
    assert got[1]["clean_text"] == "x y z"
    assert got[2]["clean_text"] == "p q r"
    assert got[1]["n_words"] == 6 and got[1]["n_kept"] == 3
    assert got[1]["n_dup_starts"] == 1
    # doc 3 shares nothing: untouched
    assert got[3]["clean_text"] == "u v w m n o"
    assert got[3]["n_dup_starts"] == 0


def test_overlapping_dup_starts_cover_union(spark):
    # "a b c d" in both docs duplicates grams at starts 0 and 1 of doc 1;
    # covered union is positions 0..3, leaving only the tail.
    rows = [(1, "a b c d tail1 tail2"), (2, "x a b c d y")]
    got = _run(spark, rows, k=3, min_df=2)
    assert got[1]["clean_text"] == "tail1 tail2"
    assert got[1]["n_dup_starts"] == 2
    assert got[2]["clean_text"] == "x y"


def test_doc_shorter_than_k_is_untouched(spark):
    rows = [(1, "a b"), (2, "a b"), (3, "a b c d"), (4, "a b c d")]
    got = _run(spark, rows, k=3, min_df=2)
    # 2-word docs emit no 3-grams: identical but never masked at this tier
    # (exact dedup owns whole-doc duplicates)
    assert got[1]["clean_text"] == "a b" and got[1]["n_dup_starts"] == 0
    # 4-word identical docs are fully covered
    assert got[3]["clean_text"] == "" and got[3]["n_kept"] == 0
    assert got[3]["n_dup_starts"] == 2


def test_min_df_threshold_and_intra_doc_repeat(spark):
    # the gram repeats only WITHIN doc 1 — one distinct doc, below
    # min_df=2, so intra-doc repetition alone never masks
    rows = [(1, "a b c a b c"), (2, "q r s t u v")]
    got = _run(spark, rows, k=3, min_df=2)
    assert got[1]["clean_text"] == "a b c a b c"


def test_partition_invariance(spark):
    rows = [(i, f"common one two three suffix{i} end{i}") for i in range(8)]
    one = _run(spark, rows, k=3, min_df=2, parts=1)
    many = _run(spark, rows, k=3, min_df=2, parts=7)
    assert one == many
    # the shared 4-word prefix spans grams at starts 0 and 1
    assert all(one[i]["clean_text"] == f"suffix{i} end{i}" for i in range(8))


# --- property: Spark output == pure-Python reference on random corpora ---

from hypothesis import given, settings
from hypothesis import strategies as st


def _reference(docs: dict[int, list[str]], k: int, min_df: int):
    """Pure-Python repeated-span mask: the executable spec."""
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, ws in docs.items():
        for p in range(len(ws) - k + 1):
            gram_docs[tuple(ws[p : p + k])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_df}
    out = {}
    for d, ws in docs.items():
        starts = [
            p for p in range(len(ws) - k + 1) if tuple(ws[p : p + k]) in dup
        ]
        covered = {i for s in starts for i in range(s, s + k)}
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[d] = (len(ws), len(starts), len(kept), " ".join(kept))
    return out


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(2, 4),
    min_df=st.integers(2, 3),
)
@pytest.mark.slow  # r19 quick-tier gate (see conftest)
def test_matches_python_reference(spark, docs, k, min_df):
    corpus = {i: ws for i, ws in enumerate(docs)}
    rows = [(i, " ".join(ws)) for i, ws in corpus.items()]
    got = {
        d: (r["n_words"], r["n_dup_starts"], r["n_kept"], r["clean_text"])
        for d, r in _run(spark, rows, k=k, min_df=min_df).items()
    }
    want = _reference(corpus, k, min_df)
    assert got == want
