"""Scale contract of the banded-LSH tier: degenerate (band, band_hash)
buckets — mass-duplicated boilerplate, templated pages — must not make the
candidate self-join quadratic. ``lsh_candidate_pairs`` drops buckets larger
than ``max_bucket`` (their content is a mass-duplication cluster that tier-1
``exact_dedup`` owns); this pins both the bound and the recall side (small
buckets still emit their pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)


def _sig_fixture(spark, n_copies: int):
    """n_copies identical docs (ids 0..n-1) + one near-dup pair (ids
    1000/1001 sharing most tokens) + one unique doc (id 2000)."""
    rows = [(i, ["lorem"] * 4 + ["ipsum", "dolor", "sit", "amet"] * 3)
            for i in range(n_copies)]
    near = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
            "theta", "iota", "kappa"]
    rows.append((1000, near))
    rows.append((1001, near[:-1] + ["lambda"]))
    rows.append((2000, [f"u{j}" for j in range(12)]))
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    sh = shingles(df, "doc_id", "tokens", n=8)
    return minhash_signatures(sh, "doc_id", num_perm=32)


def test_degenerate_bucket_is_capped(spark):
    """200 identical docs collide on every band; with the default cap their
    buckets are dropped, so pair output stays bounded — the surviving pairs
    are exactly the genuine small-bucket near-dups."""
    sigs = _sig_fixture(spark, n_copies=200)
    pairs = lsh_candidate_pairs(sigs, "doc_id").collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    # no pair from the 200-doc degenerate block (200 > DEFAULT_MAX_BUCKET)
    assert not any(a < 200 and b < 200 for a, b in ids)
    # the genuine near-dup pair survives (its bucket has size 2)
    assert (1000, 1001) in ids
    assert len(ids) <= 4  # bounded: near-dup pair (+ hash-collision slack)


def test_uncapped_semantics_preserved(spark):
    """max_bucket=None restores the full quadratic within-bucket output."""
    n = DEFAULT_MAX_BUCKET + 6  # 70 identical docs: over cap, small enough
    sigs = _sig_fixture(spark, n_copies=n)
    capped = lsh_candidate_pairs(sigs, "doc_id").collect()
    full = lsh_candidate_pairs(sigs, "doc_id", max_bucket=None).collect()
    full_ids = {(r.id_a, r.id_b) for r in full}
    # uncapped: all n*(n-1)/2 pairs of the identical block present
    assert sum(1 for a, b in full_ids if a < n and b < n) == n * (n - 1) // 2
    # capped output is a subset and excludes the degenerate block
    assert {(r.id_a, r.id_b) for r in capped} <= full_ids
    assert not any(a < n and b < n for a, b in
                   {(r.id_a, r.id_b) for r in capped})


def test_small_buckets_unaffected_by_cap(spark):
    """A corpus with every bucket under the cap produces identical output
    capped vs uncapped — the cap is invisible off the degenerate path."""
    sigs = _sig_fixture(spark, n_copies=3)
    capped = {(r.id_a, r.id_b)
              for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    full = {(r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sigs, "doc_id",
                                         max_bucket=None).collect()}
    assert capped == full
