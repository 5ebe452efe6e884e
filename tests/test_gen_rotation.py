"""scripts/gen_rotation.py must reproduce the committed DRIVER_PRIORITY
exactly: the generator and tests/test_registry_order.py encode the same
bucket rules (canaries, then never-checked excluding canaries, then
oldest-check-first), and this pin keeps the tooling from drifting away
from the validator — the r11 review found exactly such a divergence in
the never-checked-canary case."""

from __future__ import annotations

import glob
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_generator_reproduces_committed_rotation():
    if not glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        pytest.skip("no CORRECTNESS_r*.json present (fresh clone)")
    from cinegraph_spark.queries import CHANGED_CODE_CANARIES, DRIVER_PRIORITY

    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_rotation.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    ).stdout
    generated = re.findall(r'^\s+"([a-z0-9_]+)",$', out, re.M)
    assert tuple(CHANGED_CODE_CANARIES) + tuple(generated) == DRIVER_PRIORITY, (
        "gen_rotation.py no longer reproduces DRIVER_PRIORITY — either the "
        "rotation was hand-edited against the bucket rules or the "
        "generator's rules drifted from tests/test_registry_order.py"
    )
    # the default (no-override) run must NOT tell the user to replace the
    # committed canary tuple
    assert "CHANGED_CODE_CANARIES: tuple[str, ...] = (" not in out
