"""Content-defined chunking (operators/dedup.py::cdc_chunks, r15) — the
properties that make CDC the right primitive for partial-overlap dedup,
pinned independently of the oracle query:

- determinism: identical documents chunk to identical hash multisets;
- SHIFT invariance (the defining CDC property): prepending content to a
  document changes only the chunk containing the splice — every chunk
  after the first boundary survives with an identical hash, which is
  exactly what fixed-size chunking cannot do;
- EDIT locality: a one-word substitution perturbs at most the chunk it
  sits in (plus one split/merge neighbor when the word's boundary status
  flips);
- boundary definition: a chunk starts exactly at words whose portable
  hash ≡ 0 (mod m), so expected chunk length is m.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cinegraph_spark.operators.dedup import cdc_chunks


def _doc(spark, *rows):
    return spark.createDataFrame(list(rows), "doc_id long, text string")


def _hashes(spark, df, mod=8):
    out = {}
    for r in cdc_chunks(df, "text", "doc_id", mod=mod).collect():
        out.setdefault(r["doc_id"], Counter())[r["chunk_hash"]] += 1
    return out


WORDS = " ".join(f"w{i}" for i in range(300))


def test_identical_docs_chunk_identically(spark):
    h = _hashes(spark, _doc(spark, (1, WORDS), (2, WORDS)))
    assert h[1] == h[2] and sum(h[1].values()) > 3


def test_shift_invariance_prefix_preserves_tail_chunks(spark):
    h = _hashes(
        spark,
        _doc(spark, (1, WORDS), (2, "some prepended preamble " + WORDS)),
    )
    # only the chunk containing the splice can differ: every original
    # chunk except (at most) the document head survives verbatim
    lost = set(h[1]) - set(h[2])
    assert len(lost) <= 1
    assert len(set(h[1]) & set(h[2])) >= len(h[1]) - 1 > 2


def test_edit_locality_one_word_substitution(spark):
    words = WORDS.split()
    words[150] = "EDITED"
    h = _hashes(spark, _doc(spark, (1, WORDS), (2, " ".join(words))))
    # the edited chunk changes; a boundary-status flip can split or
    # merge one neighbor — never more
    assert len(set(h[1]) - set(h[2])) <= 2
    assert len(set(h[2]) - set(h[1])) <= 2
    assert len(set(h[1]) & set(h[2])) >= len(h[1]) - 2


def test_boundary_definition_and_expected_length(spark):
    mod = 8
    df = _doc(spark, (1, WORDS))
    chunks = cdc_chunks(df, "text", "doc_id", mod=mod)
    n_chunks = chunks.count()
    n_words = chunks.agg(F.sum("n_words")).first()[0]
    assert n_words == 300
    # boundary count == chunks whose id >= 1; mean length ~ mod (loose
    # band — 300 deterministic words, no flakiness)
    assert 300 / (mod * 3) <= n_chunks <= 300 * 3 / mod
    # chunk ids are consecutive per doc
    ids = sorted(r["chunk_id"] for r in chunks.collect())
    assert ids == list(range(ids[0], ids[0] + len(ids)))


def test_whitespace_and_empty_edges(spark):
    df = _doc(spark, (1, "  a\tb\nc  "), (2, "   "), (3, ""))
    got = _hashes(spark, df)
    assert 2 not in got and 3 not in got  # no words -> no chunks
    assert sum(got[1].values()) >= 1
