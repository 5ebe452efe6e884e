"""Edge-semantics tests for the as-of operators (`operators/asof.py`).

The query-level oracle (events_asof_purchase_click / _nearest_click)
cross-checks against DuckDB's independent range-join formulation on real
data; these pin the corner cases that data may not exercise: equidistant
ties, equal-timestamp matches, tolerance exclusion, and unmatched-row
dropping.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.operators.asof import asof_nearest


def _ts(s: str):
    return datetime.fromisoformat(s)


def _frames(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "user_id bigint, ts timestamp_ntz, event_id bigint"
    )
    right = spark.createDataFrame(
        right_rows, "user_id bigint, ts timestamp_ntz, click_id bigint"
    )
    return left, right


def _run(spark, left_rows, right_rows, tol_us=300_000_000):
    left, right = _frames(spark, left_rows, right_rows)
    out = asof_nearest(
        left, right, key="user_id", ts="ts",
        left_id="event_id", right_id="click_id", tolerance_us=tol_us,
    )
    return {
        r["event_id"]: (r["nearest_click_id"], r["diff_us"], r["direction"])
        for r in out.collect()
    }


def test_nearest_picks_closer_side_and_ties_prefer_backward(spark):
    got = _run(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        [
            (1, _ts("2024-01-01 09:59:00"), 7),   # 60s back
            (1, _ts("2024-01-01 10:00:30"), 8),   # 30s fwd -> closer
        ],
    )
    assert got == {100: (8, 30_000_000, "forward")}

    got = _run(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        [
            (1, _ts("2024-01-01 09:59:30"), 7),   # 30s back
            (1, _ts("2024-01-01 10:00:30"), 8),   # 30s fwd -> tie
        ],
    )
    assert got == {100: (7, 30_000_000, "backward")}


def test_equal_timestamp_counts_as_backward_zero_distance(spark):
    got = _run(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        [
            (1, _ts("2024-01-01 10:00:00"), 7),
            (1, _ts("2024-01-01 10:00:01"), 8),
        ],
    )
    assert got == {100: (7, 0, "backward")}


def test_tolerance_excludes_and_unmatched_rows_drop(spark):
    got = _run(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), 100),  # click 10 min away
            (2, _ts("2024-01-01 10:00:00"), 101),  # no clicks at all
        ],
        [(1, _ts("2024-01-01 10:10:00"), 7)],
        tol_us=300_000_000,  # 5 min
    )
    assert got == {}


def test_keys_do_not_cross_and_equal_ts_ties_take_extreme_ids(spark):
    got = _run(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), 100), (2, _ts("2024-01-01 10:00:00"), 200)],
        [
            # user 1: two clicks at the same backward instant -> largest id
            (1, _ts("2024-01-01 09:59:00"), 7),
            (1, _ts("2024-01-01 09:59:00"), 9),
            # user 2: two clicks at the same forward instant -> smallest id
            (2, _ts("2024-01-01 10:01:00"), 4),
            (2, _ts("2024-01-01 10:01:00"), 6),
        ],
    )
    assert got == {
        100: (9, 60_000_000, "backward"),
        200: (4, 60_000_000, "forward"),
    }


# --- property: asof_nearest == pandas merge_asof (the executable spec) ---

from datetime import timedelta

from hypothesis import given, settings
from hypothesis import strategies as st


_BASE = datetime(2024, 1, 1)


def _dt(us: int) -> datetime:
    return _BASE + timedelta(microseconds=us)


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=0,
        max_size=12,
        unique=True,
    ),
    tol=st.sampled_from([50, 500, 5_000]),
)
@pytest.mark.slow  # r19 quick-tier gate (see conftest)
def test_nearest_matches_pandas_merge_asof(spark, lefts, rights, tol):
    """pandas ``merge_asof(direction='nearest', tolerance)`` is the spec
    asof_nearest reimplements distributively. With the right side sorted
    by (ts, id), pandas' positional tie rules coincide with ours (largest
    id backward, smallest forward; equidistant prefers backward — probed
    empirically on pandas 2.2), so the (left_id -> nearest_right_id)
    mapping must agree exactly on random inputs."""
    import pandas as pd

    l_rows = [(k, _dt(us), i) for i, (k, us) in enumerate(lefts)]
    r_rows = [(k, _dt(us), 100 + i) for i, (k, us) in enumerate(rights)]
    ldf = spark.createDataFrame(
        l_rows, "k int, ts timestamp_ntz, lid int"
    )
    rdf = spark.createDataFrame(
        r_rows, "k int, ts timestamp_ntz, rid int"
    )
    got_rows = asof_nearest(
        ldf, rdf, key="k", ts="ts", left_id="lid", right_id="rid",
        tolerance_us=tol,
    ).collect()
    got = {r["lid"]: r["nearest_rid"] for r in got_rows}

    lp = pd.DataFrame(l_rows, columns=["k", "ts", "lid"]).sort_values(
        ["ts", "lid"]
    )
    rp = pd.DataFrame(r_rows, columns=["k", "ts", "rid"]).sort_values(
        ["ts", "rid"]
    )
    if rp.empty:
        assert got == {}
        return
    m = pd.merge_asof(
        lp,
        rp,
        on="ts",
        by="k",
        direction="nearest",
        tolerance=pd.Timedelta(microseconds=tol),
    )
    want = {
        int(r.lid): int(r.rid) for r in m.itertuples() if pd.notna(r.rid)
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=0,
        max_size=12,
        unique=True,
    ),
)
@pytest.mark.slow  # r19 quick-tier gate (see conftest)
def test_backward_matches_pandas_merge_asof(spark, lefts, rights):
    """asof_join (latest right at-or-before) vs
    pandas merge_asof(direction='backward') — same alignment as the
    nearest pin: right sorted by (ts, id) makes pandas' positional
    dup-ts rule equal our largest-id rule."""
    import pandas as pd

    from cinegraph_spark.operators.asof import asof_join

    l_rows = [(k, _dt(us), i) for i, (k, us) in enumerate(lefts)]
    r_rows = [(k, _dt(us), 100 + i) for i, (k, us) in enumerate(rights)]
    ldf = spark.createDataFrame(l_rows, "k int, ts timestamp_ntz, lid int")
    rdf = spark.createDataFrame(r_rows, "k int, ts timestamp_ntz, rid int")
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, key="k", ts="ts", left_id="lid", right_id="rid"
        ).collect()
    }

    lp = pd.DataFrame(l_rows, columns=["k", "ts", "lid"]).sort_values(
        ["ts", "lid"]
    )
    if not r_rows:
        assert got == {r[2]: None for r in l_rows}
        return
    rp = pd.DataFrame(r_rows, columns=["k", "ts", "rid"]).sort_values(
        ["ts", "rid"]
    )
    m = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    want = {
        int(r.lid): (int(r.rid) if pd.notna(r.rid) else None)
        for r in m.itertuples()
    }
    assert got == want
