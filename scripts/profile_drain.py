#!/usr/bin/env python
"""Profile one availableNow streaming drain end-to-end (guide §1):
re-run a drain-shaped query while recording every micro-batch's
StreamingQueryProgress durationMs breakdown (addBatch / getBatch /
walCommit / commitOffsets / queryPlanning / triggerExecution), plus the
wall time around the whole drain — so the per-drain fixed overhead
(offset log, commit log, state-store commits, no-data batch) is
attributed instead of guessed.

Usage: python scripts/profile_drain.py [query_name] [--runs N]
Default query: stream_join_left_outer_attribution.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    name = args[0] if args else "stream_join_left_outer_attribution"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql.streaming import StreamingQueryListener

    from cinegraph_spark.queries import load_all
    from cinegraph_spark.session import get_spark

    progresses: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progresses.append(json.loads(p.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark = get_spark(app_name="cinegraph-profile-drain")
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(Capture())
    specs = load_all()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for i in range(runs):
        progresses.clear()
        t0 = time.perf_counter()
        n = specs[name].spark(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        # listener events arrive async; give the bus a moment
        time.sleep(1.0)
        batch_ms = 0
        print(f"run {i}: wall={wall:.3f}s rows={n} batches={len(progresses)}")
        for p in progresses:
            d = p.get("durationMs", {})
            batch_ms += int(d.get("triggerExecution", 0))
            print(
                f"  batch {p.get('batchId')}: trigger={d.get('triggerExecution')}"
                f" addBatch={d.get('addBatch')} getBatch={d.get('getBatch')}"
                f" latestOffset={d.get('latestOffset')}"
                f" queryPlanning={d.get('queryPlanning')}"
                f" walCommit={d.get('walCommit')}"
                f" commitOffsets={d.get('commitOffsets')}"
                f" rows={p.get('numInputRows')}"
            )
            for sop in p.get("stateOperators", []):
                print(
                    f"    state: commit={sop.get('commitTimeMs')}ms"
                    f" rows={sop.get('numRowsTotal')}"
                    f" mem={sop.get('memoryUsedBytes')}"
                )
        print(
            f"  sum(triggerExecution)={batch_ms / 1000.0:.3f}s; "
            f"outside-batch wall={wall - batch_ms / 1000.0:.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
