"""Hypothesis property tests for the pure driver-side functions.

These don't touch Spark (the formulas under test are the same math the
Column expressions encode), so hypothesis can hammer hundreds of random
cases per run — the cheap half of SURVEY §5's property-test strategy.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cinegraph_spark.operators.clustering import (
    fallback_names,
    linkage_to_tree,
    rebalance_tree,
    tree_invariants,
    validate_names,
    ward_linkage,
)


def act_assign_py(window_id: int, n: int, k: int) -> int:
    """Python mirror of ``operators/features.py::act_assign`` (same integer
    math as the Column expression and the DuckDB oracle string)."""
    q, r = n // k, n % k
    cut = r * (q + 1)
    if window_id < cut:
        return window_id // (q + 1)
    return r + (window_id - cut) // q


@given(n=st.integers(1, 500), k=st.integers(1, 10))
def test_act_assign_matches_np_array_split(n, k):
    """A1 parity: the closed-form act index must equal the chunk id
    np.array_split assigns — including the 'first n%k chunks get one extra'
    rule — for every (n_windows, n_acts)."""
    if n < k:
        # reference filters these out (P2 short-movie filter); the formula
        # is only contracted for n >= k
        return
    ids = np.arange(n)
    want = np.concatenate(
        [np.full(len(chunk), i) for i, chunk in enumerate(np.array_split(ids, k))]
    )
    got = np.array([act_assign_py(w, n, k) for w in ids])
    assert (got == want).all()


@settings(max_examples=50, deadline=None)
@given(
    pts=st.lists(
        st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=4),
        min_size=2,
        max_size=40,
    )
)
def test_rebalanced_tree_keeps_invariants(pts):
    """C3→C4→C5 on random point sets: after ward linkage, tree conversion,
    and rebalancing, the structural invariants hold — children partition
    the parent's members, counts roll up, depth is capped."""
    X = np.array(pts)
    Z = ward_linkage(X)
    members = {i: [i] for i in range(len(X))}
    tree = linkage_to_tree(Z, members)
    balanced = rebalance_tree(tree)
    assert tree_invariants(balanced) == []
    # rebalancing must not lose or invent members
    assert sorted(balanced["indices"]) == list(range(len(X)))


@given(n=st.integers(1, 8), parent=st.text(min_size=1, max_size=20))
def test_fallback_names_always_validate(n, parent):
    """M7: the deterministic fallback namer must satisfy its own validator
    (count, <=4 words, uniqueness) for any parent name and group count."""
    names = fallback_names(parent, n)
    assert len(names) == n
    assert validate_names(names, n) is True


def test_append_new_keys_idempotent(spark, sf_dir, tmp_path):
    """X4 resume semantics: overlapping re-runs append only unseen keys;
    a full re-run is a no-op."""
    from cinegraph_spark.operators.incremental import append_new_keys
    from cinegraph_spark.queries.util import T

    path = str(tmp_path / "inc")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    first_half = orders.filter("o_orderkey % 2 = 0")

    n1 = append_new_keys(spark, first_half, path, "o_orderkey")
    assert n1 == first_half.count()
    # overlapping batch: full table — only the odd keys are new
    n2 = append_new_keys(spark, orders, path, "o_orderkey")
    assert n1 + n2 == orders.count()
    # exact re-run: nothing new
    assert append_new_keys(spark, orders, path, "o_orderkey") == 0
    got = spark.read.parquet(path)
    assert got.count() == orders.count()
    assert got.select("o_orderkey").distinct().count() == orders.count()


def test_sketch_aggregates_track_exact(spark, sf_dir):
    """The sketches that replace exact aggregates at 100 TB must track the
    exact answers at test scale: HLL++ distinct within its configured rsd,
    t-digest percentile within 2% relative."""
    from pyspark.sql import functions as F

    from cinegraph_spark.queries.util import T

    li = T(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact_d"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_d"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("exact_p90"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("approx_p90"),
    ).collect()[0]
    assert abs(row.approx_d - row.exact_d) / row.exact_d < 0.06  # 3x rsd
    assert abs(row.approx_p90 - row.exact_p90) / row.exact_p90 < 0.02


def test_tdigest_percentile_twin_tracks_exact(spark, sf_dir):
    """agg_percentiles_price_tdigest (rows-only, merge-order-dependent) must
    track its exact-oracle-checked twin: each sketch quantile lies inside
    the exact rank envelope [q-0.02, q+0.02] per group — this is the
    correctness contract that substitutes for a driver hash on the sketch
    variant."""
    from cinegraph_spark.queries import load_all

    specs = load_all()
    exact = {
        r["o_orderpriority"]: r
        for r in specs["agg_percentiles_price"].spark(spark, sf_dir).collect()
    }
    approx = specs["agg_percentiles_price_tdigest"].spark(spark, sf_dir).collect()
    assert len(approx) == len(exact) > 0
    # Rank-based envelope: the sketch returns an actual data element, so at
    # small n its VALUE can differ from the interpolated exact quantile by
    # a whole inter-order-price gap even when its rank error is ~0. Assert
    # each sketch value lies between the exact quantiles at q +/- 0.02.
    from pyspark.sql import functions as F

    from cinegraph_spark.queries.util import T

    o = T(spark, sf_dir, "orders")
    env = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            *[
                F.expr(f"percentile(o_totalprice, {q})").alias(f"q{i}")
                for i, q in enumerate(
                    (0.48, 0.52, 0.88, 0.92, 0.97, 1.0)
                )
            ]
        )
        .collect()
    }
    for r in approx:
        e = env[r["o_orderpriority"]]
        for q, lo, hi in (("p50", "q0", "q1"), ("p90", "q2", "q3"), ("p99", "q4", "q5")):
            assert e[lo] <= r[q] <= e[hi], (
                f"{r['o_orderpriority']} {q}: sketch {r[q]} outside exact "
                f"rank envelope [{e[lo]}, {e[hi]}]"
            )


@given(
    seqs=st.lists(
        st.lists(st.integers(1, 10_000), min_size=0, max_size=40),
        min_size=1,
        max_size=16,
    ),
    pad_id=st.integers(0, 5),
)
def test_pad_batch_properties(seqs, pad_id):
    """M3 padding invariants for any batch: rectangular int64 output at the
    batch max length, prefix-preserved sequences, and mask == (ids !=
    pad_id) including the reference's pad-collision quirk."""
    from cinegraph_spark.operators.scoring import pad_batch

    ids, mask = pad_batch(seqs, pad_id)
    longest = max(len(s) for s in seqs)
    assert ids.shape == mask.shape == (len(seqs), longest)
    for r, seq in enumerate(seqs):
        assert ids[r, : len(seq)].tolist() == seq
        assert (ids[r, len(seq):] == pad_id).all()
        assert mask[r].tolist() == [int(x != pad_id) for x in ids[r]]


@given(
    responses=st.lists(
        st.one_of(
            st.none(),  # raise
            st.lists(st.text("ab ", min_size=1, max_size=12), max_size=5),
        ),
        max_size=8,
    ),
    n=st.integers(1, 4),
)
def test_retry_namer_always_returns_valid_names(responses, n):
    """M7 protocol invariant: whatever the LLM does (garbage, raises, wrong
    count, dupes), the namer's output always passes validate_names — either
    an accepted response or the deterministic fallback."""
    from cinegraph_spark.operators.clustering import (
        NAMER_RETRIES,
        fallback_names,
        retry_namer,
        validate_names,
    )

    calls = {"n": 0}

    def llm(parent, groups, attempt):
        calls["n"] += 1
        resp = responses[attempt] if attempt < len(responses) else None
        if resp is None:
            raise RuntimeError("boom")
        return resp

    out = retry_namer(llm)("p", [{} for _ in range(n)])
    assert validate_names(out, n)
    assert calls["n"] <= NAMER_RETRIES
    # exhausted budgets land exactly on the reference fallback
    if all(
        (r is None or not validate_names([str(x) for x in r], n))
        for r in responses[:NAMER_RETRIES]
    ) and len(responses) >= 0:
        if calls["n"] == NAMER_RETRIES:
            assert out == fallback_names("p", n)


def test_append_new_keys_empty_first_write(spark, sf_dir, tmp_path):
    """The Observation-counted first write (one scan, no recount) must
    return 0 for an empty input and still create a readable dataset —
    the pruned-partition edge a scheduled incremental job hits on a quiet
    interval."""
    from cinegraph_spark.operators.incremental import append_new_keys
    from cinegraph_spark.queries.util import T

    path = str(tmp_path / "inc_empty")
    empty = (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter("o_orderkey < 0")
    )
    assert append_new_keys(spark, empty, path, "o_orderkey") == 0
    assert spark.read.parquet(path).count() == 0
    # and a following non-empty batch appends normally
    some = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).limit(5)
    assert append_new_keys(spark, some, path, "o_orderkey") == 5


@settings(max_examples=200, deadline=None)
@given(
    weeks=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=30),
    cuts=st.lists(st.integers(min_value=0, max_value=29), max_size=5),
)
def test_retention_merge_partition_invariance(weeks, cuts):
    """The streaming retention tracker's correctness claim, as a property:
    for ANY partition of a user's activity weeks into micro-batches (any
    sizes, any order — hypothesis also generates out-of-order splits via
    the unsorted cut points), folding batches through _merge_retention and
    reconciling emissions the way the query does (keep rows emitted under
    the final minimal cohort) yields exactly the single-batch result:
    cohort = min week, activity set = all distinct weeks."""
    from cinegraph_spark.streaming.stateful import _merge_retention

    W = 7 * 86400 * 1_000_000
    weeks_us = [w * W for w in weeks]
    bounds = sorted({c for c in cuts if c < len(weeks_us)})
    batches, prev = [], 0
    for b in bounds + [len(weeks_us)]:
        if b > prev:
            batches.append(weeks_us[prev:b])
            prev = b
    if not batches:
        batches = [weeks_us]

    first, seen, emissions = None, set(), []
    for batch in batches:
        first, seen_sorted, emit = _merge_retention(first, set(seen), set(batch))
        seen = set(seen_sorted)
        emissions.extend((first, w) for w in emit)

    expected_cohort = min(weeks_us)
    expected_weeks = set(weeks_us)
    assert first == expected_cohort
    assert seen == expected_weeks
    # the query's reconciliation: rows carrying the final (minimal) cohort
    final_rows = {w for c, w in emissions if c == expected_cohort}
    assert final_rows == expected_weeks


def test_kmv_estimates_track_true_distincts(spark, sf_dir):
    """sketch_kmv_distinct_overlap: each KMV estimate must equal the true
    distinct count exactly below k=256 (the sketch stores every hash) and
    track it within the sketch's expected relative error above (~1/√k ≈
    6%; assert a generous 3σ ≈ 20%). Intersection comes from
    inclusion-exclusion, so its absolute error can triple — bound it by
    the union's scale, and it must never exceed min(|A|, |B|) by more
    than that slack."""
    from pyspark.sql import functions as F

    from cinegraph_spark.queries import load_all
    from cinegraph_spark.queries.util import T

    est = {
        r["measure"]: float(r["est"])
        for r in load_all()["sketch_kmv_distinct_overlap"]
        .spark(spark, sf_dir)
        .collect()
    }
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    true = {
        r["event_type"]: int(r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    true["union"] = ev.select("user_id").distinct().count()
    true["intersection"] = (
        true["view"] + true["purchase"] - true["union"]
    )
    for m in ("view", "purchase", "union"):
        if true[m] < 256:
            assert est[m] == true[m], f"{m}: sub-k must be exact"
        else:
            rel = abs(est[m] - true[m]) / true[m]
            assert rel < 0.20, f"{m}: rel err {rel:.3f} (est {est[m]}, true {true[m]})"
    slack = 0.20 * 3 * max(true["union"], 1)
    assert abs(est["intersection"] - true["intersection"]) <= slack
