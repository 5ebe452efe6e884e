#!/usr/bin/env python
"""Capture .explain("formatted") output for headline queries into
plans/r19/<query>_{before,after}.txt — the optimization round's
plan-evidence deliverable.

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]

With no names, captures every query in bench.py's HEADLINE list. Streaming
drain / maintenance queries whose cost is eager side-effects still have a
final DataFrame plan — that is what is captured (the eager work is noted
in OPTIMIZATION_r19.md instead).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from cinegraph_spark.queries import load_all
    from cinegraph_spark.session import get_spark

    if not names:
        names = list(HEADLINE)
    out_dir = os.path.join(REPO, "plans", "r19")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="cinegraph-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name in names:
        df = specs[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
