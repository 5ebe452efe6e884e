"""Spark 4 ships with ``spark.sql.ansi.enabled=true``, under which even
DOUBLE division by zero RAISES ``DIVIDE_BY_ZERO`` (it does not yield
NaN/Inf). These tests drive the two registered queries whose denominators
are zero on degenerate-but-legal data — a zero-variance event type and a
constant embedding dimension — through temp-parquet fixtures, pinning that
the guards exclude/define those rows instead of crashing the whole query.
"""

from __future__ import annotations

import datetime

import pytest

from cinegraph_spark.queries import load_all

SPECS = load_all()


@pytest.fixture()
def degenerate_dir(spark, tmp_path):
    """A tiny sf-dir with a zero-variance event type and a constant
    embedding dimension."""
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    # type "steady": 10 hours x exactly 3 events -> sd = 0 (zero variance)
    for h in range(10):
        for j in range(3):
            rows.append(
                (eid, base + datetime.timedelta(hours=h, minutes=j), 1,
                 "steady", 1.0, "{}")
            )
            eid += 1
    # type "bursty": 9 quiet hours of 1 event + one 30-event spike -> the
    # spike must still be reported
    for h in range(9):
        rows.append(
            (eid, base + datetime.timedelta(hours=h, minutes=40), 2,
             "bursty", 1.0, "{}")
        )
        eid += 1
    for j in range(30):
        rows.append(
            (eid, base + datetime.timedelta(hours=9, minutes=j), 2,
             "bursty", 1.0, "{}")
        )
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{tmp_path}/events.parquet")

    emb = [
        (i, [float(i), 0.0, float(i) * 2.0 + 1.0], i % 2) for i in range(6)
    ]  # dim 1 is CONSTANT zero (a zero-padded dimension)
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_zscore_zero_variance_type_excluded_not_crashed(degenerate_dir, spark):
    out = SPECS["events_anomaly_zscore_hourly"].spark(spark, degenerate_dir)
    rows = out.collect()  # would raise DIVIDE_BY_ZERO without the guard
    types = {r["event_type"] for r in rows}
    assert "steady" not in types  # z undefined at sd=0 -> excluded
    assert "bursty" in types  # the real anomaly still surfaces
    spike = [r for r in rows if r["event_type"] == "bursty"]
    assert any(r["n_events"] == 30 for r in spike)


def test_quantize_constant_dim_zero_error_not_crashed(degenerate_dir, spark):
    out = SPECS["vec_int8_quantize_error"].spark(spark, degenerate_dir)
    rows = {r["dim"]: r for r in out.collect()}  # raises without the guard
    assert set(rows) == {0, 1, 2}
    const = rows[1]
    assert const["code_min"] == -127 and const["code_max"] == -127
    assert const["mean_abs_err_milli"] == 0.0
    assert const["max_abs_err_milli"] == 0.0
    # non-constant dims still quantize across the full code range
    assert rows[0]["code_min"] == -127 and rows[0]["code_max"] == 127


def test_json_non_numeric_value_degrades_to_null(spark, tmp_path):
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "click", 1.0, '{"k": 10}'),
        (2, base, 2, "click", 1.0, '{"k": "garbage"}'),  # non-numeric k
        (3, base, 3, "click", 1.0, '{"k": 32}'),
        (4, base, 4, "view", 1.0, "{}"),  # missing path -> NULL either way
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{tmp_path}/events.parquet")
    out = SPECS["scalar_json_events"].spark(spark, str(tmp_path))
    got = {r["event_type"]: r for r in out.collect()}  # ANSI cast would raise
    assert got["click"]["sum_k"] == 42 and got["click"]["max_k"] == 32
    assert got["click"]["n"] == 3  # the bad row still counts
    assert got["view"]["sum_k"] is None
