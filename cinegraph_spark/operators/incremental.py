"""Idempotent incremental writes — the Spark-native form of the reference's
offset-based resume (SURVEY §2.9 X4: `scraper.py:232`,
`preprocessing_agent.py:388` skip an already-done prefix by count).

Offsets assume a stable input ordering; at 100 TB with retries and
speculative tasks they double- or zero-process on any reordering. The
durable contract is *keyed idempotency*: anti-join the incoming batch
against the keys already persisted, append only the new rows. Re-running a
failed batch is then a no-op for whatever already landed — the same
guarantee Structured Streaming gets from ``checkpointLocation``
(`streaming/windows.py`), here for batch jobs.

At scale the anti-join reads only the key column of the sink (column
pruning — a few % of the data), and if the sink is partitioned by an
ingest-date/batch column the scan prunes to recent partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def append_new_keys(
    spark: SparkSession, df: DataFrame, path: str, key: str
) -> int:
    """Append to the parquet dataset at ``path`` only the rows whose ``key``
    is not already present. Returns the number of rows written. Safe to
    re-run with overlapping input (idempotent per key); first call creates
    the dataset."""
    try:
        existing_keys = spark.read.parquet(path).select(key)
    except AnalysisException:  # first write — nothing to dedupe against
        # Observation counts rows as the write job streams them past, so the
        # first write costs ONE scan of the (possibly expensive) input plan
        # instead of write-then-recount.
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.parquet(path)
        return int(obs.get["n"])
    fresh = df.join(existing_keys, key, "left_anti")
    # localCheckpoint pins the anti-join result BEFORE the append mutates
    # the same files the plan would otherwise re-scan lazily
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(path)
    return n


def merge_agg_state(
    spark: SparkSession,
    path: str,
    delta_agg: DataFrame,
    keys: list[str],
    sums: list[str],
    batch_id: int,
    maxs: list[str] | None = None,
    mins: list[str] | None = None,
    n_col: str | None = None,
    hll_regs: list[str] | None = None,
    hist_maps: list[str] | None = None,
) -> dict:
    """Incrementally refresh a persisted aggregate state (a materialized
    rollup) from a pre-aggregated delta — the MERGEABLE-PARTIALS form of
    incremental view maintenance: because every measure is an algebraic
    sum (counts ship as sums of partial counts; averages derive at read
    time as sum/count), folding a delta is ``state ∪ delta_agg`` re-summed
    per key, which costs O(|state| + |delta|) and NEVER re-reads the base
    fact table. At 100 TB the refresh therefore reads yesterday's
    state (group-cardinality-sized) plus only the new fact partitions —
    the same scan-∝-change contract as the serving-table maintenance in
    `operators/hnsw.py` / `operators/similarity.py`, at the aggregate
    tier.

    Exactly-once under at-least-once delivery: aggregate merge is
    additive, so a replayed delta would silently double-count — unlike
    the keyed sinks above, idempotency cannot come from the data itself.
    The state therefore carries an applied-``batch_id`` ledger, and a
    batch already in the ledger is a no-op (returns ``applied=False``).
    Ledger and aggregate live under ONE directory and flip through ONE
    atomic sibling-swap (`serving_io.atomic_swap_dir`), so no crash can
    commit the aggregate without its ledger row or vice versa; re-running
    a crashed refresh re-applies cleanly. The ledger grows one row per
    batch — metadata-scale against any real refresh cadence.

    Integer or decimal measures make the merged state bit-identical to a
    full recompute (associative exact addition); float measures merge to
    within summation-order ulps, the repo-wide rounding convention's
    territory.

    ``maxs`` / ``mins`` are the other mergeable-partial classes (max of
    maxes, min of mins) — valid under an INSERT-ONLY delta contract
    only: a delete or downward update cannot lower a stored max without
    rescanning the group's base facts, which is exactly the scan this
    operator exists to avoid. AVG is deliberately NOT a measure
    class — it is not mergeable; derive it from a sum and a count at
    read time. Single-writer contract as in `operators/maintenance.py`.

    ``n_col`` (r14) enables RETRACTIONS for sum-class views — the CDC
    form of incremental maintenance: a deleted fact ships as a NEGATED
    partial in the delta (count −1, measures negated; sum arithmetic
    already merges it), and ``n_col`` names the live-row-count measure
    (must be one of ``sums``) so the operator can finish the job —
    groups whose merged count reaches zero are DROPPED from the view (a
    recompute has no row for a factless group; leaving a zero-row would
    diverge), and a merged count below zero raises (more retractions
    than insertions — a corrupt or double-shipped delta must never
    silently commit). ``n_col`` with ``maxs``/``mins`` raises up front:
    max/min are not retractable partials, by the scan argument above —
    route such views through a recompute of the touched groups instead.

    ``hll_regs`` (r14) is the SKETCH measure class — incremental
    COUNT(DISTINCT), which is not algebraic, via mergeable portable-HLL
    register vectors (`queries/util.py::hll_dense_registers`): each
    column is a dense ``array<int>`` whose element-wise max across
    state and delta equals the vector over the union of their inputs
    (register max is associative), so the view's distinct estimates
    stay exact-to-the-sketch under any batch split — and because the
    registers are deterministic md5 math, a cross-engine oracle checks
    them bit-for-bit. INSERT-ONLY like max/min (a sketch cannot forget
    a key): combining with ``n_col`` raises. Vectors of unequal length
    merge positionally (``zip_with`` pads with NULL, ``greatest`` skips
    it), so the fixed-m contract is the caller's to keep.

    ``hist_maps`` (r14) is the sum-merged sketch class — incremental
    QUANTILES via sparse fixed-width histograms: each column is a
    ``map<bigint,bigint>`` of bin → count, merged by key-wise SUM
    (``map_zip_with`` unions the key sets), zero-count bins dropped
    after every merge so the state stays bit-identical to a recompute's
    histogram. Unlike HLL registers, bin counts are additive and
    therefore RETRACTABLE — ``hist_maps`` composes with ``n_col`` (a
    deleted fact ships bin → −1), and the below-zero refusal extends to
    any negative merged bin. Quantile estimates derive at read time
    from the merged bins (see
    `queries/timeseries.py::sketch_histogram_quantiles` for the
    cum-window + interpolation recipe the MV query reuses).
    Returns ``{"applied": bool, "n_groups": int}``."""
    from pyspark.sql.utils import AnalysisException

    from cinegraph_spark.operators.serving_io import (
        atomic_swap_dir,
        recover_swap,
    )

    if n_col is not None:
        if n_col not in sums:
            raise ValueError(
                f"merge_agg_state: n_col {n_col!r} must be one of the "
                f"sum-class measures {sums} (counts ship as sums of "
                "partial counts)"
            )
        if maxs or mins or hll_regs:
            raise ValueError(
                "merge_agg_state: retractions (n_col) cannot be combined "
                "with maxs/mins/hll_regs — a retraction cannot lower a "
                "stored max/min and a sketch cannot forget a key without "
                "rescanning the group's base facts; recompute those "
                "views' touched groups instead"
            )
    agg_dir, ledger_dir = path + "/agg", path + "/applied"

    def _read_ledger():
        return {
            int(r["batch_id"])
            for r in spark.read.parquet(ledger_dir).collect()
        }

    try:
        applied = _read_ledger()
    except AnalysisException:
        # a missing path is NOT necessarily a first refresh: the swap's
        # between-renames crash window leaves the committed state parked
        # under __old__/__swap__ siblings, and treating that as "empty"
        # would rebuild the view from this delta alone — silently losing
        # every prior batch. Try automatic recovery first; only a path
        # with no parked copies is genuinely fresh.
        if recover_swap(spark, path)["action"] != "none":
            applied = _read_ledger()
        else:
            applied = None  # first refresh: no state yet
    if applied is not None and int(batch_id) in applied:
        # no state scan on the no-op path: a re-delivered stream replays
        # every batch, and paying a full state read per replayed batch
        # just to report a count would make replays O(state × batches)
        return {"applied": False, "n_groups": None}
    measures = (
        [F.sum(c).alias(c) for c in sums]
        + [F.max(c).alias(c) for c in (maxs or [])]
        + [F.min(c).alias(c) for c in (mins or [])]
        + [
            # element-wise max over the group's ≤2 register vectors
            # (state row ∪ delta row): fold the collected list with
            # zip_with+greatest — greatest skips the NULLs zip_with pads
            # with, so the empty-array zero is identity
            F.aggregate(
                F.collect_list(c),
                F.expr("cast(array() as array<int>)"),
                lambda acc, x: F.zip_with(
                    acc, x, lambda a, b: F.greatest(a, b)
                ),
            ).alias(c)
            for c in (hll_regs or [])
        ]
        + [
            # key-wise sum over the group's ≤2 sparse histograms; bins
            # summing to zero drop so the merged state equals a fresh
            # recompute's histogram (which never materializes empty bins)
            F.map_filter(
                F.aggregate(
                    F.collect_list(c),
                    F.expr("cast(map() as map<bigint,bigint>)"),
                    lambda acc, x: F.map_zip_with(
                        acc,
                        x,
                        lambda k, a, b: F.coalesce(a, F.lit(0))
                        + F.coalesce(b, F.lit(0)),
                    ),
                ),
                lambda k, v: v != 0,
            ).alias(c)
            for c in (hist_maps or [])
        ]
    )
    if applied is None:
        merged = delta_agg.groupBy(*keys).agg(*measures)
    else:
        old = spark.read.parquet(agg_dir)
        merged = (
            old.unionByName(delta_agg.select(*old.columns))
            .groupBy(*keys)
            .agg(*measures)
        )
    # lazy reads of the old state stay valid through the sibling write
    # (the swap renames only on context exit — serving_io documents this);
    # the checkpoint is purely an economy: count() below and the write
    # would otherwise each run the merge plan
    merged = merged.localCheckpoint(eager=True)
    if n_col is not None or hist_maps:
        # the below-zero guard runs whenever EITHER retractable measure
        # class is present: histogram bins are retractable on their own,
        # so a hist_maps view without n_col must still refuse a delta
        # whose merged bins go negative — map_filter only drops exact
        # zeros, and a silently committed negative bin corrupts the
        # persisted view (r14 ADVICE)
        bad = F.col(n_col) < 0 if n_col is not None else F.lit(False)
        for c in hist_maps or []:
            # a retraction that subtracts a bin the view never absorbed
            # is the same corruption class as a below-zero row count
            bad = bad | F.exists(
                F.map_values(F.col(c)), lambda v: v < 0
            )
        n_neg = merged.filter(bad).count()
        if n_neg:
            # raise BEFORE any write: the live state is untouched and the
            # bad delta never commits (the ledger row would otherwise
            # make the corruption permanent — replays no-op)
            raise ValueError(
                f"merge_agg_state: {n_neg} group(s) retracted below zero "
                f"({n_col or 'n_col'} < 0, or a histogram bin went "
                "negative) — the delta retracts facts the view never "
                "absorbed (corrupt or double-shipped retraction); "
                "nothing was committed"
            )
    if n_col is not None:
        # fully-retracted groups leave the view, as a recompute would
        merged = merged.filter(F.col(n_col) != 0)
    n_groups = merged.count()
    ledger = spark.createDataFrame(
        [(int(b),) for b in sorted((applied or set()) | {int(batch_id)})],
        "batch_id long",
    )
    with atomic_swap_dir(spark, path) as tmp:
        merged.write.parquet(tmp + "/agg")
        ledger.write.parquet(tmp + "/applied")
    return {"applied": True, "n_groups": n_groups}
