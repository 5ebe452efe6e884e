"""The events timestamp-unit sniffer (streaming/windows.py).

The driver's testdata has shipped events.parquet as TIMESTAMP(NANOS)
(rounds 1–5) and naive TIMESTAMP(MICROS) (round 6). A pinned `ts long`
streaming schema silently reads whichever physical unit the file has, so
the reader must sniff the footer and scale accordingly — this builds one
tiny file of EACH unit and drains both through the real streaming reader,
asserting identical instants.
"""

from __future__ import annotations

import datetime as dt
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cinegraph_spark.streaming.windows import (
    _events_ts_unit_divisor,
    read_events_stream,
    run_availablenow_to_memory,
)

_ROWS = [
    # (event_id, micros since epoch, user_id, type, value)
    (1, 1704067200_000_000, 7, "purchase", 10.0),
    (2, 1704067260_500_000, 7, "click", 2.5),
    (3, 1704070860_000_000, 8, "purchase", 99.0),
]


def _write_events(tmpdir: str, unit: str) -> str:
    scale = 1000 if unit == "ns" else 1
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array(
                [r[1] * scale for r in _ROWS], pa.timestamp(unit)
            ),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS]),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array(["{}"] * len(_ROWS)),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_divisor_matches_unit(tmp_path, unit):
    path = str(tmp_path)
    _write_events(path, unit)
    assert _events_ts_unit_divisor(path) == (1000 if unit == "ns" else 1)


def test_both_units_drain_to_identical_instants(tmp_path, spark):
    dirs = {}
    for unit in ["us", "ns"]:
        p = tmp_path / unit
        p.mkdir()
        _write_events(str(p), unit)
        dirs[unit] = str(p)
    results = {}
    for unit, path in dirs.items():
        stream = read_events_stream(spark, path)
        name = f"sniff_{unit}_{uuid.uuid4().hex[:6]}"
        out = run_availablenow_to_memory(
            spark, stream, name, output_mode="append"
        )
        results[unit] = sorted(
            (r.event_id, r.ts) for r in out.select("event_id", "ts").collect()
        )
    assert results["us"] == results["ns"]
    # and the instants are the written micros (UTC wall clock 2024-01-01)
    first_ts = results["us"][0][1]
    assert first_ts.astimezone(dt.timezone.utc).replace(tzinfo=None) == (
        dt.datetime(2024, 1, 1, 0, 0, 0)
    )


def test_divisor_sniffs_directory_layout(tmp_path):
    """A Spark-written regeneration ships events.parquet as a DIRECTORY of
    part files; the sniffer must glob inside and read the first footer
    instead of raising on the directory path."""
    d = tmp_path / "events.parquet"
    d.mkdir()
    inner = tmp_path / "stage"
    inner.mkdir()
    _write_events(str(inner), "ns")
    (inner / "events.parquet").rename(d / "part-00000.parquet")
    assert _events_ts_unit_divisor(str(tmp_path)) == 1000


def test_divisor_empty_directory_raises_named_error(tmp_path):
    (tmp_path / "events.parquet").mkdir()
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="timestamp unit"):
        _events_ts_unit_divisor(str(tmp_path))
