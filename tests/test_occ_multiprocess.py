"""Cross-PROCESS OCC herd (r16 verdict task 5).

test_occ_commit.py::test_occ_threaded_writers_no_lost_update hammers the
exclusive-create arbiter from four threads inside ONE JVM/process; per-
process Hadoop FileSystem instances (and the OS-level O_CREAT|O_EXCL
claim path) can behave differently across real process boundaries —
separate FileSystem caches, separate JVMs, no shared Python state. This
test spawns three independent worker PROCESSES, each with its own
SparkSession, hammering one shared ``file:`` root with expected_base
commits, and holds the same chain law:

- every successful commit consumed a DISTINCT base (no fork),
- committed generations end exactly at the total success count,
- the surviving content is the max-generation winner's value.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from cinegraph_spark.operators.maintenance import hash_layout_save
from cinegraph_spark.operators.serving_io import (
    GenerationConflictError,
    current_generation,
)

wid, root, n_commits, out = (
    int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), sys.argv[4]
)
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
wins = []
done, attempts = 0, 0
while done < n_commits:
    attempts += 1
    assert attempts < 300, "livelock: conflict retries runaway"
    base = current_generation(spark, root)
    val = wid * 1000 + done
    df = spark.createDataFrame([(0, val)], "id long, val long")
    try:
        hash_layout_save(
            df, root, "id", 2, keep_generations=50, expected_base=base
        )
    except GenerationConflictError:
        continue
    wins.append([base, val])
    done += 1
with open(out, "w") as f:
    json.dump(wins, f)
spark.stop()
"""


@pytest.mark.slow
def test_occ_multiprocess_writers_no_lost_update(spark, tmp_path):
    n_procs, n_commits = 3, 3
    root = str(tmp_path / "shared_root")
    script = tmp_path / "occ_worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    procs = []
    outs = []
    env = dict(os.environ)
    for wid in range(n_procs):
        out = str(tmp_path / f"wins_{wid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(wid), root,
                 str(n_commits), out],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE,
                env=env,
            )
        )
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    wins = []
    for out in outs:
        with open(out) as f:
            wins.extend([tuple(w) for w in json.load(f)])

    total = n_procs * n_commits
    assert len(wins) == total
    bases = sorted(b for b, _ in wins)
    # chain law #1: every success consumed a DISTINCT base — a duplicate
    # base is a lost update (two writers both thought they advanced the
    # same generation)
    assert len(set(bases)) == total, f"forked lineage: {bases}"

    # chain law #2: generation NUMBERS legitimately skip (allocation is
    # an exclusive claim from max(existing)+1 and losers' staged dirs
    # are deleted — 'gaps are fine, resolution is max-committed',
    # serving_io.generation_swap_dir), so the law is not contiguity but
    # CHAINING: the committed generations on disk are exactly the states
    # the successes published, and each success's base is the previous
    # success's published generation — base set == {0} + all committed
    # generations except the newest.
    from cinegraph_spark.operators.maintenance import layout_read
    from cinegraph_spark.operators.serving_io import (
        current_generation,
        list_generations,
    )

    gens = sorted(list_generations(spark, root))
    assert len(gens) == total, (gens, bases)
    assert bases == [0] + gens[:-1], (gens, bases)
    assert current_generation(spark, root) == gens[-1]

    # the surviving content is the winner of the final link
    final_val = {v for b, v in wins if b == gens[-2]}
    got = layout_read(spark, root).collect()
    assert len(got) == 1 and got[0]["val"] in final_val
