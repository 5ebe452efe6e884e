"""Streaming replay determinism (r18, VERDICT r17 task 5).

Batch semantics of every registered streaming query are oracle-checked
by the driver, but nothing pinned that the SAME registered query yields
the SAME rows when its input arrives as N micro-batches instead of one
availableNow gulp — the state-dependent bug class (per-batch state merge
order, sessions spanning batch boundaries, join state surviving between
triggers) hides exactly there. One-shot == oracle is already the
driver's gate, so multi-batch == one-shot closes the triangle.

The disorder contract matters: these queries carry event-time
watermarks (2 h sessions, 1 h joins), so Structured Streaming's
documented semantics only promise batch-cadence-independence while
cross-batch disorder stays inside the watermark. The replay here is an
ASCENDING 4-way time split — zero cross-batch disorder, maximal
cross-batch STATE (every session/join window that spans a split
boundary must be carried in state) — which is the strongest replay an
engine can promise determinism for. The unbounded-disorder case
(descending arrival) is pinned separately below as the DOCUMENTED
late-drop boundary, and the re-base machinery designed to survive it is
covered by test_streaming.py::test_retention_stream_multibatch_disorder.

Covered registered queries: dynamic-gap session windows, stateful
top-k, inner purchase/click attribution (all three replayed through a
forced ``maxFilesPerTrigger=1`` on ``read_events_stream``), and the
left-outer + full-outer attribution joins (replayed through a single
staged source so the watermark-advancing sentinels land AFTER the four
real batches — unioned sources interleave their files per trigger, so
forcing the events side of the registered query would put a 2030
sentinel in batch 1 and legitimately late-drop everything after it).
The MV-refresh / CDC-retract family self-stages its own multi-file
stream AND double-drains for exactly-once by construction (see
``stream_mv_incremental_refresh``'s docstring), so it already runs
multi-batch in every driver window and is not re-split here.
"""

from __future__ import annotations

import os
from collections import Counter

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cinegraph_spark.queries import load_all

#: queries whose only events input is read_events_stream and whose
#: semantics are batch-cadence-independent under in-order replay
REPLAY = [
    "stream_session_dynamic_gap",
    "stream_stateful_topk_per_user",
    "stream_join_purchase_click_attribution",
]


def _split_events(sf: str, root, descending: bool) -> None:
    tbl = pq.read_table(os.path.join(sf, "events.parquet")).sort_by(
        [("ts", "descending" if descending else "ascending")]
    )
    outdir = root / "events.parquet"
    outdir.mkdir()
    n = tbl.num_rows // 4 + 1
    for i in range(4):
        chunk = tbl.slice(i * n, n)
        if chunk.num_rows:
            pq.write_table(chunk, f"{outdir}/part-{i}.parquet")


def _mk_split_dir(tmp_path_factory, descending: bool) -> str:
    sf = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    root = tmp_path_factory.mktemp("split_sf")
    for t in os.listdir(sf):
        if t != "events.parquet":
            os.symlink(os.path.join(sf, t), str(root / t))
    _split_events(sf, root, descending)
    return str(root)


@pytest.fixture(scope="module")
def asc_sf_dir(tmp_path_factory):
    """Fixture dir whose events.parquet is a DIRECTORY of 4 part files in
    ascending time order; every other table is the original file."""
    return _mk_split_dir(tmp_path_factory, descending=False)


@pytest.fixture(scope="module")
def desc_sf_dir(tmp_path_factory):
    return _mk_split_dir(tmp_path_factory, descending=True)


def _force_multibatch(monkeypatch):
    from cinegraph_spark.streaming import windows as W

    orig = W.read_events_stream

    def forced(spark_, sfd, max_files_per_trigger=None):
        # every events stream in the query becomes a per-file replay; the
        # registered queries import this symbol at call time, so the
        # patch reaches them without any production knob
        return orig(spark_, sfd, max_files_per_trigger=1)

    monkeypatch.setattr(W, "read_events_stream", forced)


@pytest.mark.parametrize("name", REPLAY)
def test_multibatch_replay_equals_oneshot(
    spark, sf_dir, asc_sf_dir, monkeypatch, name
):
    specs = load_all()
    oneshot = Counter(map(tuple, specs[name].spark(spark, sf_dir).collect()))
    assert oneshot, f"{name}: empty one-shot result would vacuously pass"
    _force_multibatch(monkeypatch)
    multi = Counter(
        map(tuple, specs[name].spark(spark, asc_sf_dir).collect())
    )
    assert multi == oneshot, (
        f"{name}: in-order multi-batch replay diverged from the one-shot "
        f"drain ({sum(multi.values())} vs {sum(oneshot.values())} rows)"
    )


def test_unbounded_disorder_drops_late_rows_by_watermark_contract(
    spark, sf_dir, desc_sf_dir, monkeypatch
):
    """The boundary of the promise, pinned so it stays DOCUMENTED rather
    than rediscovered: a descending 4-way split makes every user's
    earliest events arrive months past the 2-hour session watermark, and
    Structured Streaming then drops them as late input — strictly fewer
    rows, never fabricated ones. An engine change that silently widened
    or narrowed this contract would surface here."""
    specs = load_all()
    name = "stream_session_dynamic_gap"
    oneshot = Counter(map(tuple, specs[name].spark(spark, sf_dir).collect()))
    _force_multibatch(monkeypatch)
    multi = Counter(
        map(tuple, specs[name].spark(spark, desc_sf_dir).collect())
    )
    assert multi != oneshot  # late rows WERE dropped (2h watermark)
    # every surviving session is built from real events only: its user
    # exists and its row count never exceeds the one-shot total
    assert sum(multi.values()) < sum(oneshot.values())


def _ordered_chunks(spark, sf_dir, n_chunks: int):
    """The events table as n ascending-time single-partition frames with
    the SAME instants read_events_stream produces (the NTZ UTC wall clock
    cast back to an instant — the test session is pinned UTC)."""
    from cinegraph_spark.queries.util import T

    e = T(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    w = Window.orderBy("ts", "event_id")
    ranked = e.withColumn("_rn", F.row_number().over(w))
    total = ranked.count()
    per = total // n_chunks + 1
    return [
        ranked.filter(
            (F.col("_rn") > i * per) & (F.col("_rn") <= (i + 1) * per)
        ).drop("_rn")
        for i in range(n_chunks)
    ]


def _sentinel(spark, i: int, ts: str):
    return spark.createDataFrame(
        [
            (-1000 - i, ts, -1 - i, "purchase", 0.0, "{}"),
            (-2000 - i, ts, -1 - i, "click", 0.0, "{}"),
        ],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@pytest.mark.parametrize("how", ["left_outer", "full_outer"])
def test_outer_attribution_multibatch_replay(spark, sf_dir, tmp_path, how):
    """The outer joins replay as SIX micro-batches over one staged source
    (4 ascending real chunks, then the two watermark-advancing sentinel
    batches — the order the registered query's union cannot guarantee
    under a split events side), and must reproduce the registered
    one-shot drain row-for-row: join state spanning batch boundaries,
    eviction verdicts finalized exactly once."""
    from cinegraph_spark.queries.events import _stage_ordered_batches
    from cinegraph_spark.queries.util import ntz, tstr
    from cinegraph_spark.session import scratch_dir
    from cinegraph_spark.streaming.joins import purchases_with_recent_clicks
    from cinegraph_spark.streaming.windows import run_availablenow_to_parquet

    name = f"stream_join_{how}_attribution"
    specs = load_all()
    oneshot = Counter(map(tuple, specs[name].spark(spark, sf_dir).collect()))
    assert oneshot

    frames = _ordered_chunks(spark, sf_dir, 4) + [
        _sentinel(spark, 0, "2030-01-01 00:00:00"),
        _sentinel(spark, 1, "2030-01-02 00:00:00"),
    ]
    stage = str(tmp_path / "attr_in")
    _stage_ordered_batches(frames, stage)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = run_availablenow_to_parquet(
        spark,
        purchases_with_recent_clicks(stream, watermark="1 hour", how=how),
        scratch_dir(f"t_replay_{how[0]}oj_"),
        output_mode="append",
    )
    multi = Counter(
        map(
            tuple,
            out.filter(F.col("user_id") >= 0)
            .select(
                "user_id",
                "purchase_id",
                "click_id",
                tstr(ntz(F.col("purchase_ts"))).alias("purchase_ts"),
                tstr(ntz(F.col("click_ts"))).alias("click_ts"),
            )
            .collect(),
        )
    )
    assert multi == oneshot, (
        f"{name}: 6-batch staged replay diverged from the one-shot drain "
        f"({sum(multi.values())} vs {sum(oneshot.values())} rows)"
    )
