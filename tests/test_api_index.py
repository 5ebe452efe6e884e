"""API.md freshness pin (r16 verdict task 8) — the committed library
index must be byte-identical to what the generator produces from the
live modules, the same pattern as the generated rotation module."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_index_is_fresh():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_api_index.py"),
         "--check"],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, (res.stdout + res.stderr)[-2000:]
