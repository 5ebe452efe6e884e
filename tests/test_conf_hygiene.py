"""Session-conf hygiene (VERDICT r1 watch item): query builders must not
leak session-conf mutations, and events results must not depend on the
session time zone (they ride TIMESTAMP_NTZ, not a pinned zone)."""

from __future__ import annotations

import pytest

from cinegraph_spark.queries import load_all
from cinegraph_spark.queries.util import T, scoped_confs

SPECS = load_all()

NANOS_KEY = "spark.sql.legacy.parquet.nanosAsLong"
TZ_KEY = "spark.sql.session.timeZone"


def test_batch_events_query_restores_confs(spark, sf_dir):
    """Building AND executing a batch events query leaves the session confs
    exactly as found (the nanosAsLong effect is captured in the analyzed
    plan, so restoring it does not break the later collect)."""
    spark.conf.set(NANOS_KEY, "false")
    tz_before = spark.conf.get(TZ_KEY)
    df = SPECS["events_tumbling_5min"].spark(spark, sf_dir)
    assert spark.conf.get(NANOS_KEY) == "false", "builder leaked nanosAsLong"
    assert spark.conf.get(TZ_KEY) == tz_before, "builder mutated session tz"
    assert df.count() > 0  # executes fine after the conf was restored


def test_events_results_are_session_tz_independent(spark, sf_dir):
    """The same events query must return identical formatted-timestamp rows
    under a hostile session time zone — TIMESTAMP_NTZ carries the UTC wall
    clock through windows, lags, and date_format without touching the
    session zone."""
    for name in (
        "events_tumbling_5min",
        "events_session_windows_30min",
        "events_dedup_latest_per_user_type",
        "events_asof_purchase_click",
        "scalar_datetime_parts_events",
    ):
        utc_rows = sorted(map(str, SPECS[name].spark(spark, sf_dir).collect()))
        with scoped_confs(spark, **{TZ_KEY: "America/New_York"}):
            ny_df = SPECS[name].spark(spark, sf_dir)
            ny_rows = sorted(map(str, ny_df.collect()))
        assert utc_rows == ny_rows, f"{name} depends on the session time zone"


def test_events_ts_is_ntz(spark, sf_dir):
    assert dict(T(spark, sf_dir, "events").dtypes)["ts"] == "timestamp_ntz"


def test_scoped_confs_restores_unset_keys(spark):
    key = "spark.cinegraph.test.ephemeral"
    with pytest.raises(Exception):
        spark.conf.get(key)
    with scoped_confs(spark, **{key: "on"}):
        assert spark.conf.get(key) == "on"
    with pytest.raises(Exception):
        spark.conf.get(key)
