"""Semantics of the Holt linear-trend scan (the applyInPandas recursion
behind ``ts_holt_linear_daily``) — pandas-level, no Spark session needed.
The cross-engine value check lives in test_oracle_parity via the recursive
CTE oracle; these pin the math the oracle can't explain by itself.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cinegraph_spark.queries.timeseries import (
    _HOLT_ALPHA,
    _HOLT_BETA,
    _holt_scan,
)


def _series(values, typ="purchase"):
    return pd.DataFrame(
        {
            "event_type": [typ] * len(values),
            "day": [f"2024-01-{d + 1:02d}" for d in range(len(values))],
            "y": values,
        }
    )


def test_constant_series_level_constant_trend_zero():
    out = _holt_scan(_series([10.0] * 8))
    assert (out["level"] == 10.0).all()
    assert (out["trend"] == 0.0).all()


def test_linear_series_trend_approaches_slope():
    # y = 5t: Holt's trend estimate converges toward the true slope 5
    out = _holt_scan(_series([5.0 * t for t in range(1, 40)]))
    assert out["trend"].iloc[-1] == pytest.approx(5.0, abs=0.5)
    # and the trend sequence is eventually increasing toward it from b1=0
    assert out["trend"].iloc[0] == 0.0
    assert out["trend"].iloc[-1] > out["trend"].iloc[3]


def test_initialization_is_first_value():
    out = _holt_scan(_series([42.0, 50.0, 60.0]))
    assert out["level"].iloc[0] == 42.0
    assert out["trend"].iloc[0] == 0.0


def test_scan_sorts_by_day_internally():
    df = _series([1.0, 2.0, 3.0])
    shuffled = df.iloc[[2, 0, 1]].reset_index(drop=True)
    out_sorted = _holt_scan(df)
    out_shuffled = _holt_scan(shuffled)
    pd.testing.assert_frame_equal(
        out_sorted.reset_index(drop=True),
        out_shuffled.reset_index(drop=True),
    )


def test_update_equations_one_step():
    # hand-check one recursion step against the textbook equations
    y1, y2 = 10.0, 20.0
    out = _holt_scan(_series([y1, y2]))
    a, b = _HOLT_ALPHA, _HOLT_BETA
    l2 = a * y2 + (1 - a) * (y1 + 0.0)
    t2 = b * (l2 - y1) + (1 - b) * 0.0
    assert out["level"].iloc[1] == pytest.approx(l2)
    assert out["trend"].iloc[1] == pytest.approx(t2)
