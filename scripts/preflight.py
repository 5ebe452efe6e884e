#!/usr/bin/env python
"""The round preflight: run the full verification battery in the proven
order and print a one-page summary. This is the sequence NOTES.md's
"final verification battery" entries describe — encoded so a fresh
context runs ONE command instead of re-deriving it.

    python scripts/preflight.py            # everything (~35 min)
    python scripts/preflight.py --quick    # pytest + one sweep (~20 min)

Order matters: bench must never run concurrently with another Spark JVM
(NOTES: 2-6x inflation), so stages run strictly sequentially here.
Exit code 0 only if every stage passed.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, env=None):
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(
        cmd, cwd=REPO, env=e, capture_output=True, text=True
    )
    dt = time.time() - t0
    out = (p.stdout or "") + (p.stderr or "")
    tail = "\n".join(out.strip().splitlines()[-3:])
    ok = p.returncode == 0
    print(f"[{'PASS' if ok else 'FAIL'}] {name} ({dt:.0f}s)")
    for line in tail.splitlines():
        print(f"       {line[:110]}")
    return ok, out, (p.stdout or "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    results = []

    results.append(
        run("pytest (full suite)", [sys.executable, "-m", "pytest", "tests/", "-q"])
    )
    results.append(
        run(
            "driver_sim ALL (Asia/Kolkata, 7 shuffle partitions)",
            [sys.executable, "scripts/driver_sim.py", "ALL"],
            env={"SIM_TZ": "Asia/Kolkata", "SIM_SHUFFLE": "7"},
        )
    )
    # the sweep prints its own summary line; a bad>0 sweep still exits 0,
    # so parse it
    ok, out, _ = results[-1]
    m = re.search(r"SUMMARY ok=(\d+) rows_only=(\d+) bad=(\d+)", out)
    if not m or int(m.group(3)) != 0:
        results[-1] = (False, out, "")
        print("       ^ sweep reported failures (bad != 0)")

    if not args.quick:
        results.append(
            run(
                "driver_sim ALL (America/New_York, 200 shuffle partitions)",
                [sys.executable, "scripts/driver_sim.py", "ALL"],
            )
        )
        ok, out, _ = results[-1]
        m = re.search(r"SUMMARY ok=(\d+) rows_only=(\d+) bad=(\d+)", out)
        if not m or int(m.group(3)) != 0:
            results[-1] = (False, out, "")
            print("       ^ sweep reported failures (bad != 0)")
        results.append(
            run(
                "sf0.1 strict parity + negzero",
                [
                    sys.executable,
                    "-m",
                    "pytest",
                    "tests/test_oracle_parity.py",
                    "tests/test_oracle_negzero.py",
                    "-q",
                ],
                env={"SPARK_GRAFT_TESTDATA": "/root/testdata/sf0.1"},
            )
        )

    # bench LAST and alone (never concurrent with another JVM)
    results.append(run("bench (isolated, sf0.1)", [sys.executable, "bench.py"]))
    ok, out, stdout = results[-1]
    if ok:
        # parse the bench JSON from STDOUT only (stderr carries per-query
        # '# name: ...s' diagnostics and Spark logs, so the last line of the
        # combined stream is never the JSON), and read over_budget as JSON
        # rather than string-matching '"over_budget":{}': compress_result's
        # degrade ladder may emit the breach set as a dict, a name list, or
        # a count — an EMPTY set must pass in every representation
        # ({} / [] / 0).
        json_lines = [
            ln for ln in stdout.strip().splitlines() if ln.startswith('{"metric"')
        ]
        try:
            bench = json.loads(json_lines[-1])
            breaches = bench["over_budget"]
        except (ValueError, KeyError, IndexError, TypeError):
            breaches = "unparseable bench line"
        if breaches:
            results[-1] = (False, out, stdout)
            print(f"       ^ bench reported budget breaches: {breaches}")

    n_bad = sum(1 for r in results if not r[0])
    print(f"\nPREFLIGHT: {len(results) - n_bad}/{len(results)} stages green")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
