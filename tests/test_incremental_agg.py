"""merge_agg_state — incremental materialized-aggregate maintenance
(`operators/incremental.py`): mergeable-partials refresh must be
bit-identical to a full recompute, idempotent under replayed deltas via
the applied-batch ledger, and atomic (aggregate and ledger flip as one
unit through the sibling swap).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.operators.incremental import merge_agg_state
from cinegraph_spark.queries.util import T

KEYS = ["priority", "month"]
SUMS = ["n_orders", "sum_cents"]
MAXS = ["max_cents"]
MINS = ["min_cents"]


def _rollup(df):
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return df.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("sum_cents"),
        F.max(cents).alias("max_cents"),
        F.min(cents).alias("min_cents"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_refresh_equals_full_recompute(spark, sf_dir, tmp_path):
    """Sum-of-sums over integer measures is associative: base + delta
    merged state must be BIT-identical to the one-shot full rollup."""
    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    r0 = merge_agg_state(
        spark, path, _rollup(o.filter("o_orderdate < '1997-01-01'")),
        KEYS, SUMS, batch_id=0, maxs=MAXS, mins=MINS,
    )
    r1 = merge_agg_state(
        spark, path, _rollup(o.filter("o_orderdate >= '1997-01-01'")),
        KEYS, SUMS, batch_id=1, maxs=MAXS, mins=MINS,
    )
    assert r0["applied"] and r1["applied"]
    merged = spark.read.parquet(path + "/agg")
    assert _rows(merged) == _rows(_rollup(o))


def test_replayed_batch_is_ledger_noop(spark, sf_dir, tmp_path):
    """At-least-once delivery: re-applying an already-applied batch_id
    must change NOTHING (additive merge cannot self-dedup — the ledger
    is the idempotency mechanism)."""
    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    delta = _rollup(o.filter("o_orderdate >= '1997-01-01'"))
    merge_agg_state(spark, path, _rollup(o), KEYS, SUMS, batch_id=0, maxs=MAXS, mins=MINS)
    before = _rows(spark.read.parquet(path + "/agg"))
    replay = merge_agg_state(spark, path, delta, KEYS, SUMS, batch_id=0, maxs=MAXS, mins=MINS)
    assert replay["applied"] is False
    assert _rows(spark.read.parquet(path + "/agg")) == before
    # a NEW batch id with the same content IS applied (double-counting is
    # the caller's delta-construction bug, not the ledger's to catch)
    assert merge_agg_state(spark, path, delta, KEYS, SUMS, batch_id=7, maxs=MAXS, mins=MINS)[
        "applied"
    ]


def test_empty_delta_and_empty_first_batch(spark, sf_dir, tmp_path):
    """Zero-row deltas refresh cleanly (the pruned-partition edge): an
    empty first batch seeds an empty state; a later real delta lands on
    it; an empty later delta is a harmless applied no-change."""
    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    empty = _rollup(o.filter("o_orderkey < 0"))
    r0 = merge_agg_state(spark, path, empty, KEYS, SUMS, batch_id=0, maxs=MAXS, mins=MINS)
    assert r0 == {"applied": True, "n_groups": 0}
    merge_agg_state(spark, path, _rollup(o), KEYS, SUMS, batch_id=1, maxs=MAXS, mins=MINS)
    r2 = merge_agg_state(spark, path, empty, KEYS, SUMS, batch_id=2, maxs=MAXS, mins=MINS)
    assert r2["applied"] is True
    assert _rows(spark.read.parquet(path + "/agg")) == _rows(_rollup(o))


def test_agg_and_ledger_flip_atomically(spark, sf_dir, tmp_path):
    """Ledger and aggregate live under ONE swapped directory: after any
    refresh the ledger lists exactly the applied batches and the state
    dir has no half-committed sibling left behind."""
    import os

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    merge_agg_state(spark, path, _rollup(o), KEYS, SUMS, batch_id=3, maxs=MAXS, mins=MINS)
    merge_agg_state(
        spark, path, _rollup(o.limit(0)), KEYS, SUMS, batch_id=9, maxs=MAXS, mins=MINS
    )
    ledger = sorted(
        int(r["batch_id"])
        for r in spark.read.parquet(path + "/applied").collect()
    )
    assert ledger == [3, 9]
    siblings = [
        n
        for n in os.listdir(tmp_path)
        if n.startswith("state__")
    ]
    assert siblings == []


def test_refresh_recovers_from_mid_swap_crash(spark, sf_dir, tmp_path):
    """merge_agg_state's crash window is atomic_swap_dir's
    between-renames instant: the old state parked as __old__<tok>, the
    fresh state durably at __swap__<tok>, the live path missing.
    recover_swap must restore the FRESH state (it was complete before
    the old state was touched) and the next refresh must proceed
    normally on top of it."""
    import os

    from cinegraph_spark.operators.serving_io import recover_swap

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, _rollup(o.filter("o_orderdate < '1997-01-01'")),
        KEYS, SUMS, batch_id=0, maxs=MAXS, mins=MINS,
    )
    # simulate the between-renames crash of the NEXT refresh: new state
    # written to a sibling, old moved aside, rename-in never happened
    os.rename(path, path + "__old__feedfacef00d")
    merge_agg_state(
        spark,
        path + "__swap__feedfacef00d",
        _rollup(o.filter("o_orderdate < '1997-01-01'")),
        KEYS, SUMS, batch_id=0, maxs=MAXS, mins=MINS,
    )
    out = recover_swap(spark, path)
    assert out["action"] == "restored_new"
    # the restored state is live and the pipeline continues
    r = merge_agg_state(
        spark, path, _rollup(o.filter("o_orderdate >= '1997-01-01'")),
        KEYS, SUMS, batch_id=1, maxs=MAXS, mins=MINS,
    )
    assert r["applied"]
    assert _rows(spark.read.parquet(path + "/agg")) == _rows(_rollup(o))


def _sum_rollup(df, sign=1):
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return df.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        (F.lit(sign) * F.count(F.lit(1))).alias("n_orders"),
        (F.lit(sign) * F.sum(cents)).alias("sum_cents"),
    )


def test_retraction_batch_equals_filtered_recompute(spark, sf_dir, tmp_path):
    """CDC retractions (n_col, r14): negated partials delete facts from
    the view at O(state + delta); fully-retracted groups VANISH (a
    recompute has no row for a factless group), and the survivors are
    bit-identical to the filtered recompute."""
    import pytest

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, _sum_rollup(o), KEYS, SUMS, batch_id=0, n_col="n_orders"
    )
    groups_before = spark.read.parquet(path + "/agg").count()
    retract = _sum_rollup(o.filter(F.year("o_orderdate") == 1995), sign=-1)
    merge_agg_state(
        spark, path, retract, KEYS, SUMS, batch_id=1, n_col="n_orders"
    )
    merged = spark.read.parquet(path + "/agg")
    want = _sum_rollup(o.filter(F.year("o_orderdate") != 1995))
    assert _rows(merged) == _rows(want)
    # the 1995-only months actually left the view
    assert merged.count() < groups_before
    assert merged.filter(F.col("month").startswith("1995")).count() == 0

    # a second shipment of the same retraction under a NEW batch id would
    # push counts negative: the operator must refuse BEFORE committing,
    # leaving state and ledger untouched
    with pytest.raises(ValueError, match="retracted below zero"):
        merge_agg_state(
            spark, path, retract, KEYS, SUMS, batch_id=2, n_col="n_orders"
        )
    assert _rows(spark.read.parquet(path + "/agg")) == _rows(want)
    ledger = sorted(
        int(r["batch_id"])
        for r in spark.read.parquet(path + "/applied").collect()
    )
    assert ledger == [0, 1]  # the refused batch never entered the ledger


def test_retraction_guards(spark, sf_dir, tmp_path):
    """n_col must be a sum-class measure, and cannot be combined with
    max/min measures (not retractable partials)."""
    import pytest

    o = T(spark, sf_dir, "orders").limit(10)
    path = str(tmp_path / "state")
    with pytest.raises(ValueError, match="must be one of the"):
        merge_agg_state(
            spark, path, _sum_rollup(o), KEYS, SUMS, batch_id=0,
            n_col="not_a_measure",
        )
    with pytest.raises(ValueError, match="cannot be combined"):
        merge_agg_state(
            spark, path, _rollup(o), KEYS, SUMS, batch_id=0,
            maxs=MAXS, n_col="n_orders",
        )


def test_hll_register_merge_is_split_invariant(spark, sf_dir, tmp_path):
    """The sketch measure class (hll_regs, r14): element-wise register
    max is associative, so the merged state must be BIT-identical to the
    one-shot sketch over all facts under ANY batch split — and a sketch
    cannot retract, so combining with n_col refuses."""
    import pytest

    from cinegraph_spark.queries.util import hll_dense_registers

    e = T(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    keys = ["event_type"]

    def pre_agg(df):
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_events"))
        return counts.join(hll_dense_registers(df, keys, "user_id"), keys)

    want = _rows(pre_agg(e))

    for split_mod in (2, 3):  # two different batch splits, same answer
        path = str(tmp_path / f"state{split_mod}")
        for b in range(split_mod):
            merge_agg_state(
                spark, path,
                pre_agg(e.filter(F.col("event_id") % split_mod == b)),
                keys, ["n_events"], batch_id=b, hll_regs=["user_id_regs"],
            )
        got = _rows(
            spark.read.parquet(path + "/agg").select(
                *keys, "n_events", "user_id_regs"
            )
        )
        assert got == want

    with pytest.raises(ValueError, match="cannot be combined"):
        merge_agg_state(
            spark, str(tmp_path / "bad"), pre_agg(e), keys, ["n_events"],
            batch_id=0, n_col="n_events", hll_regs=["user_id_regs"],
        )


def test_hist_map_merge_retracts_and_refuses_negative_bins(
    spark, sf_dir, tmp_path
):
    """The sum-merged sketch class (hist_maps, r14): bin counts merge by
    key-wise sum, a retraction batch subtracts exactly, zeroed bins drop
    (state == fresh recompute's histogram), and a retraction that would
    drive any bin negative refuses before committing."""
    import pytest

    e = T(spark, sf_dir, "events").select("event_type", "value")
    keys = ["event_type"]

    def pre_agg(df, sign=1):
        bins = df.groupBy(
            "event_type",
            F.floor(F.col("value") / 5.0).cast("long").alias("bin"),
        ).agg((F.lit(sign) * F.count(F.lit(1))).alias("c"))
        return bins.groupBy("event_type").agg(
            F.sum("c").alias("n_events"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("bin", "c")))
            ).alias("value_bins"),
        )

    def rows(df):
        return sorted(
            (r["event_type"], r["n_events"], tuple(sorted(r["value_bins"].items())))
            for r in df.collect()
        )

    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, pre_agg(e), keys, ["n_events"], batch_id=0,
        n_col="n_events", hist_maps=["value_bins"],
    )
    retract = pre_agg(e.filter(F.col("value") >= 250), sign=-1)
    merge_agg_state(
        spark, path, retract, keys, ["n_events"], batch_id=1,
        n_col="n_events", hist_maps=["value_bins"],
    )
    got = rows(
        spark.read.parquet(path + "/agg").select(
            "event_type", "n_events", "value_bins"
        )
    )
    want = rows(pre_agg(e.filter(F.col("value") < 250)))
    assert got == want  # bit-identical to the filtered recompute

    # re-shipping the retraction under a NEW id would drive bins
    # negative: refuse before the ledger commits, state untouched
    with pytest.raises(ValueError, match="histogram bin went negative"):
        merge_agg_state(
            spark, path, retract, keys, ["n_events"], batch_id=2,
            n_col="n_events", hist_maps=["value_bins"],
        )
    assert rows(
        spark.read.parquet(path + "/agg").select(
            "event_type", "n_events", "value_bins"
        )
    ) == want


def test_hist_maps_without_n_col_still_refuses_negative_bins(
    spark, sf_dir, tmp_path
):
    """Histogram bins are a retractable measure class in their own right:
    a hist_maps view maintained WITHOUT a row-count column must still
    refuse a delta whose merged bins go negative — map_filter only drops
    exact zeros, so without the guard the corruption would silently
    commit (r14 ADVICE)."""
    import pytest

    e = T(spark, sf_dir, "events").select("event_type", "value")

    def pre_agg(df, sign=1):
        bins = df.groupBy(
            "event_type",
            F.floor(F.col("value") / 5.0).cast("long").alias("bin"),
        ).agg((F.lit(sign) * F.count(F.lit(1))).alias("c"))
        return bins.groupBy("event_type").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("bin", "c")))
            ).alias("value_bins")
        )

    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, pre_agg(e), ["event_type"], [], batch_id=0,
        hist_maps=["value_bins"],
    )
    retract_all = pre_agg(e, sign=-1)
    over = pre_agg(e.limit(0), sign=1).unionByName(retract_all).unionByName(
        retract_all
    )  # double retraction: some bin must go below zero
    with pytest.raises(ValueError, match="histogram bin went negative"):
        merge_agg_state(
            spark, path, over, ["event_type"], [], batch_id=1,
            hist_maps=["value_bins"],
        )
    # state untouched: replaying the GOOD first batch is still a no-op
    out = merge_agg_state(
        spark, path, pre_agg(e), ["event_type"], [], batch_id=0,
        hist_maps=["value_bins"],
    )
    assert out["applied"] is False


def _evolve_rollup(df, with_v2=False, v2_src=None):
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("sum_cents"),
    ]
    if with_v2:
        aggs.append(F.sum(cents).alias("cents_v2"))
    return df.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(*aggs)


def test_evolve_then_merge_roundtrip_equals_recompute(
    spark, sf_dir, tmp_path
):
    """r14 verdict task 7: widen a live view with a new sum column at a
    declared epoch, merge a post-epoch delta carrying it, and the view
    must equal the recompute under the epoch semantics (old measures
    over ALL facts, new measure over post-epoch facts only)."""
    from cinegraph_spark.operators.incremental import evolve_agg_state

    o = T(spark, sf_dir, "orders")
    old_facts = o.filter(F.year("o_orderdate") < 1996)
    new_facts = o.filter(F.year("o_orderdate") >= 1996)
    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, _evolve_rollup(old_facts), ["priority"],
        ["n_orders", "sum_cents"], batch_id=0,
    )
    out = evolve_agg_state(
        spark, path, ["priority"], from_batch_id=1,
        new_sums={"cents_v2": "bigint"},
    )
    assert out["added"] == ["cents_v2"]
    merge_agg_state(
        spark, path, _evolve_rollup(new_facts, with_v2=True),
        ["priority"], ["n_orders", "sum_cents", "cents_v2"], batch_id=1,
    )
    got = _rows(
        spark.read.parquet(path + "/agg").select(
            "priority", "n_orders", "sum_cents", "cents_v2"
        )
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    want = _rows(
        o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("sum_cents"),
            F.sum(
                F.when(F.year("o_orderdate") >= 1996, cents).otherwise(0)
            ).alias("cents_v2"),
        )
    )
    assert got == want


def test_mixed_schema_merges_refuse_both_ways(spark, sf_dir, tmp_path):
    """A delta carrying a column the view lacks (pre-evolution) or
    missing one the view has (post-evolution) must refuse by name —
    select(*old.columns) would otherwise silently DROP the new measure
    or die with an anonymous resolution error."""
    import pytest

    from cinegraph_spark.operators.incremental import evolve_agg_state

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, _evolve_rollup(o), ["priority"],
        ["n_orders", "sum_cents"], batch_id=0,
    )
    with pytest.raises(ValueError, match="evolve_agg_state"):
        merge_agg_state(
            spark, path, _evolve_rollup(o, with_v2=True), ["priority"],
            ["n_orders", "sum_cents", "cents_v2"], batch_id=1,
        )
    evolve_agg_state(
        spark, path, ["priority"], from_batch_id=1,
        new_sums={"cents_v2": "bigint"},
    )
    with pytest.raises(ValueError, match="delta is missing"):
        merge_agg_state(
            spark, path, _evolve_rollup(o), ["priority"],
            ["n_orders", "sum_cents"], batch_id=1,
        )


def test_evolution_epoch_guards(spark, sf_dir, tmp_path):
    """The epoch is a watermark: evolving at-or-below the newest applied
    batch refuses (already-merged facts can never appear in the new
    column), a NEVER-seen pre-epoch batch refuses after evolution, and
    a REPLAYED pre-epoch batch still no-ops via the ledger. The epoch
    table must survive later refresh swaps."""
    import pytest

    from cinegraph_spark.operators.incremental import evolve_agg_state

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    half = _evolve_rollup(o.filter(F.year("o_orderdate") < 1995))
    merge_agg_state(
        spark, path, half, ["priority"], ["n_orders", "sum_cents"],
        batch_id=5,
    )
    with pytest.raises(ValueError, match="epoch .* would lie|not beyond"):
        evolve_agg_state(
            spark, path, ["priority"], from_batch_id=5,
            new_sums={"cents_v2": "bigint"},
        )
    evolve_agg_state(
        spark, path, ["priority"], from_batch_id=6,
        new_sums={"cents_v2": "bigint"},
    )
    # replayed pre-epoch batch: ledger no-op, NOT an epoch error
    replay = merge_agg_state(
        spark, path, half, ["priority"], ["n_orders", "sum_cents"],
        batch_id=5,
    )
    assert replay["applied"] is False
    # never-seen pre-epoch batch: refused
    with pytest.raises(ValueError, match="predates the view's evolution"):
        merge_agg_state(
            spark, path,
            _evolve_rollup(o, with_v2=True), ["priority"],
            ["n_orders", "sum_cents", "cents_v2"], batch_id=3,
        )
    # post-epoch merge commits AND the epoch survives the swap
    merge_agg_state(
        spark, path,
        _evolve_rollup(
            o.filter(F.year("o_orderdate") >= 1995), with_v2=True
        ),
        ["priority"], ["n_orders", "sum_cents", "cents_v2"], batch_id=7,
    )
    with pytest.raises(ValueError, match="predates the view's evolution"):
        merge_agg_state(
            spark, path,
            _evolve_rollup(o, with_v2=True), ["priority"],
            ["n_orders", "sum_cents", "cents_v2"], batch_id=2,
        )


def test_evolution_backfill_and_refusals(spark, sf_dir, tmp_path):
    """A backfill re-states history for live groups; unknown groups and
    unknown columns refuse; non-backfilled groups get the identity."""
    import pytest

    from cinegraph_spark.operators.incremental import evolve_agg_state

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, _evolve_rollup(o), ["priority"],
        ["n_orders", "sum_cents"], batch_id=0,
    )
    prios = sorted(
        r["priority"]
        for r in spark.read.parquet(path + "/agg").select("priority").collect()
    )
    back = spark.createDataFrame(
        [(prios[0], 777)], "priority string, cents_v2 bigint"
    )
    with pytest.raises(ValueError, match="not among the new measures"):
        evolve_agg_state(
            spark, path, ["priority"], from_batch_id=1,
            new_sums={"other": "bigint"}, backfill=back,
        )
    bogus = spark.createDataFrame(
        [("NO-SUCH-PRIORITY", 1)], "priority string, cents_v2 bigint"
    )
    with pytest.raises(ValueError, match="do not exist in the view"):
        evolve_agg_state(
            spark, path, ["priority"], from_batch_id=1,
            new_sums={"cents_v2": "bigint"}, backfill=bogus,
        )
    evolve_agg_state(
        spark, path, ["priority"], from_batch_id=1,
        new_sums={"cents_v2": "bigint"}, backfill=back,
    )
    vals = {
        r["priority"]: r["cents_v2"]
        for r in spark.read.parquet(path + "/agg").collect()
    }
    assert vals[prios[0]] == 777
    assert all(vals[p] == 0 for p in prios[1:])
    # column collision and empty evolution refuse
    with pytest.raises(ValueError, match="already exist"):
        evolve_agg_state(
            spark, path, ["priority"], from_batch_id=2,
            new_sums={"cents_v2": "bigint"},
        )
    with pytest.raises(ValueError, match="nothing to add"):
        evolve_agg_state(spark, path, ["priority"], from_batch_id=2)
    with pytest.raises(ValueError, match="no view exists"):
        evolve_agg_state(
            spark, str(tmp_path / "missing"), ["priority"],
            from_batch_id=1, new_sums={"x": "bigint"},
        )


def test_undeclared_delta_columns_refuse(spark, sf_dir, tmp_path):
    """r15 review: a delta column missing from every measure list would
    be silently dropped by groupBy(keys).agg(*measures) — after an
    evolve, a merge that forgot to declare the evolved column would
    commit a view without it, losing the measure and its backfill."""
    import pytest

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    with pytest.raises(ValueError, match="not\\s+declared"):
        merge_agg_state(
            spark, path, _evolve_rollup(o, with_v2=True), ["priority"],
            ["n_orders", "sum_cents"], batch_id=0,  # cents_v2 undeclared
        )


def test_duplicate_backfill_keys_refuse(spark, sf_dir, tmp_path):
    """r15 review: a duplicated backfill row would fan out the widening
    join and the next merge would SUM the duplicated old measures —
    refuse up front, state untouched."""
    import pytest

    from cinegraph_spark.operators.incremental import evolve_agg_state

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, _evolve_rollup(o), ["priority"],
        ["n_orders", "sum_cents"], batch_id=0,
    )
    prio = spark.read.parquet(path + "/agg").select("priority").first()[0]
    dup = spark.createDataFrame(
        [(prio, 1), (prio, 2)], "priority string, cents_v2 bigint"
    )
    with pytest.raises(ValueError, match="duplicate backfill"):
        evolve_agg_state(
            spark, path, ["priority"], from_batch_id=1,
            new_sums={"cents_v2": "bigint"}, backfill=dup,
        )
    assert "cents_v2" not in spark.read.parquet(path + "/agg").columns


def test_versioned_view_time_travel_and_retention(spark, sf_dir, tmp_path):
    """keep_generations (r15): every refresh publishes as an immutable
    marker-committed generation; a pinned read_agg_state(generation=N)
    answers 'the view as of refresh N' bit-identically to a recompute of
    that prefix of the deltas; retention prunes by count; a replayed
    batch stays a ledger no-op and cuts NO new generation."""
    from cinegraph_spark.operators.incremental import read_agg_state
    from cinegraph_spark.operators.serving_io import list_generations

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    b1 = o.filter("o_orderdate < '1996-01-01'")
    b2 = o.filter("o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'")
    b3 = o.filter("o_orderdate >= '1997-01-01'")
    for i, b in enumerate([b1, b2, b3], start=1):
        merge_agg_state(
            spark, path, _rollup(b), KEYS, SUMS, batch_id=i,
            maxs=MAXS, mins=MINS, keep_generations=2,
        )
    assert sorted(list_generations(spark, path)) == [2, 3]
    asof2 = read_agg_state(spark, path, generation=2)
    want2 = _rollup(o.filter("o_orderdate < '1997-01-01'"))
    assert _rows(asof2) == _rows(want2)
    assert _rows(read_agg_state(spark, path)) == _rows(_rollup(o))

    # replayed batch: ledger no-op, no new generation
    r = merge_agg_state(
        spark, path, _rollup(b2), KEYS, SUMS, batch_id=2,
        maxs=MAXS, mins=MINS, keep_generations=2,
    )
    assert r["applied"] is False
    assert sorted(list_generations(spark, path)) == [2, 3]

    # pruned generation is not readable
    import pytest

    with pytest.raises(ValueError, match="not retained"):
        read_agg_state(spark, path, generation=1)


def test_versioned_view_mode_slips_refuse_both_ways(
    spark, sf_dir, tmp_path
):
    """A view is versioned or not for life: refreshing a versioned view
    without keep_generations refuses (the root swap would destroy every
    snapshot); versioning an existing legacy view in place refuses (the
    stale root files would shadow the generations). Same rules for
    evolve_agg_state."""
    import pytest

    from cinegraph_spark.operators.incremental import evolve_agg_state

    o = T(spark, sf_dir, "orders")
    delta = _rollup(o.filter("o_orderdate < '1996-01-01'"))

    versioned = str(tmp_path / "versioned")
    merge_agg_state(
        spark, versioned, delta, KEYS, SUMS, batch_id=1,
        maxs=MAXS, mins=MINS, keep_generations=2,
    )
    with pytest.raises(ValueError, match="is versioned"):
        merge_agg_state(
            spark, versioned, delta, KEYS, SUMS, batch_id=2,
            maxs=MAXS, mins=MINS,
        )
    with pytest.raises(ValueError, match="is versioned"):
        evolve_agg_state(
            spark, versioned, KEYS, from_batch_id=9,
            new_sums={"extra": "bigint"},
        )

    legacy = str(tmp_path / "legacy")
    merge_agg_state(
        spark, legacy, delta, KEYS, SUMS, batch_id=1,
        maxs=MAXS, mins=MINS,
    )
    with pytest.raises(ValueError, match="legacy"):
        merge_agg_state(
            spark, legacy, delta, KEYS, SUMS, batch_id=2,
            maxs=MAXS, mins=MINS, keep_generations=2,
        )
    with pytest.raises(ValueError, match="legacy"):
        evolve_agg_state(
            spark, legacy, KEYS, from_batch_id=9,
            new_sums={"extra": "bigint"}, keep_generations=2,
        )


def test_versioned_first_refresh_retries_over_crash_debris(
    spark, sf_dir, tmp_path
):
    """A first versioned refresh that crashed mid-populate leaves an
    UNCOMMITTED generation directory; the retry must succeed as the first
    refresh (debris never blocks the writer) while an UNVERSIONED call on
    the same root keeps refusing loudly."""
    import os

    import pytest

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    debris = os.path.join(path, "_gens", "g00000001")
    os.makedirs(debris)
    with open(os.path.join(debris, "junk.parquet"), "w") as f:
        f.write("crashed")
    with pytest.raises(IOError):
        merge_agg_state(
            spark, path, _rollup(o), KEYS, SUMS, batch_id=1,
            maxs=MAXS, mins=MINS,
        )
    r = merge_agg_state(
        spark, path, _rollup(o), KEYS, SUMS, batch_id=1,
        maxs=MAXS, mins=MINS, keep_generations=2,
    )
    assert r["applied"] is True
    from cinegraph_spark.operators.incremental import read_agg_state

    assert _rows(read_agg_state(spark, path)) == _rows(_rollup(o))


def test_versioned_evolve_publishes_rollback_point(spark, sf_dir, tmp_path):
    """Evolving a versioned view cuts a NEW generation: the pre-evolve
    state stays readable at its own generation (schema WITHOUT the new
    measure), and the post-evolve merge carries the widened schema."""
    from cinegraph_spark.operators.incremental import (
        evolve_agg_state,
        read_agg_state,
    )

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    merge_agg_state(
        spark, path, _rollup(o.filter("o_orderdate < '1997-01-01'")),
        KEYS, SUMS, batch_id=1, maxs=MAXS, mins=MINS, keep_generations=3,
    )
    evolve_agg_state(
        spark, path, KEYS, from_batch_id=2,
        new_sums={"cents_v2": "bigint"}, keep_generations=3,
    )
    pre = read_agg_state(spark, path, generation=1)
    post = read_agg_state(spark, path, generation=2)
    assert "cents_v2" not in pre.columns
    assert "cents_v2" in post.columns
    assert _rows(pre) == _rows(
        _rollup(o.filter("o_orderdate < '1997-01-01'"))
    )


def test_occ_refresh_conflict_and_retry(spark, sf_dir, tmp_path):
    """Two concurrent refreshers racing on one versioned view must never
    silently lose a delta: expected_base turns the refresh commit into
    the claim-token CAS, the loser's merge (computed from the stale
    state) is discarded WITH its ledger row, and the retry re-merges
    against the winner's state."""
    import pytest

    from cinegraph_spark.operators.incremental import read_agg_state
    from cinegraph_spark.operators.serving_io import (
        GenerationConflictError,
        current_generation,
    )

    o = T(spark, sf_dir, "orders")
    path = str(tmp_path / "state")
    b1 = o.filter("o_orderdate < '1996-01-01'")
    b2 = o.filter(
        "o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'"
    )
    b3 = o.filter("o_orderdate >= '1997-01-01'")
    merge_agg_state(
        spark, path, _rollup(b1), KEYS, SUMS, batch_id=1,
        maxs=MAXS, mins=MINS, keep_generations=2, expected_base=0,
    )
    base = current_generation(spark, path)
    # refresher A lands batch 2 first
    merge_agg_state(
        spark, path, _rollup(b2), KEYS, SUMS, batch_id=2,
        maxs=MAXS, mins=MINS, keep_generations=2, expected_base=base,
    )
    # refresher B raced from the same base with a DIFFERENT batch — the
    # ledger alone cannot catch this (batch 3 was never applied)
    with pytest.raises(GenerationConflictError):
        merge_agg_state(
            spark, path, _rollup(b3), KEYS, SUMS, batch_id=3,
            maxs=MAXS, mins=MINS, keep_generations=2,
            expected_base=base,
        )
    # the loser's ledger row died with its discarded generation
    from cinegraph_spark.operators.serving_io import resolve_generation

    cur = resolve_generation(spark, path, None)
    applied = {
        r["batch_id"]
        for r in spark.read.parquet(cur + "/applied").collect()
    }
    assert applied == {1, 2}
    # retry against the new current lands, and the view equals the
    # one-shot rollup of all three batches
    merge_agg_state(
        spark, path, _rollup(b3), KEYS, SUMS, batch_id=3,
        maxs=MAXS, mins=MINS, keep_generations=2,
        expected_base=current_generation(spark, path),
    )
    assert _rows(read_agg_state(spark, path)) == _rows(_rollup(o))


def test_occ_refresh_requires_generations(spark, sf_dir, tmp_path):
    import pytest

    o = T(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="requires keep_generations"):
        merge_agg_state(
            spark, str(tmp_path / "s"), _rollup(o), KEYS, SUMS,
            batch_id=1, maxs=MAXS, mins=MINS, expected_base=0,
        )
