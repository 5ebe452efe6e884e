#!/usr/bin/env python
"""Print the next round's DRIVER_PRIORITY, derived from CORRECTNESS_r*.json.

The rotation contract (tests/test_registry_order.py) is: declared
CHANGED_CODE_CANARIES first, then every never-driver-checked query, then
oldest-latest-check first (registry order within each bucket), 50 slots
total. This script computes exactly that and prints a paste-ready tuple
body plus the freshness histogram, so rebuilding the rotation each round
is mechanical:

    python scripts/gen_rotation.py                 # reproduce the committed
                                                   # rotation (snapshot at
                                                   # ROTATION_BUILT_FROM_ROUND)
    python scripts/gen_rotation.py --latest        # next round's rotation
                                                   # (all files on disk)
    python scripts/gen_rotation.py --upto 11       # explicit snapshot round
    python scripts/gen_rotation.py --latest q_a q_b  # override canaries

By default freshness is computed over CORRECTNESS files up to
ROTATION_BUILT_FROM_ROUND — the same snapshot tests/test_registry_order.py
validates against — so the driver delivering the NEXT round's correctness
file can never make the generator diverge from the committed rotation
(the r11 judge hit exactly that: the r10-built pin test flipped the
moment CORRECTNESS_r11.json landed). To BUILD a new rotation, pass
--latest (or --upto N), paste the output into
cinegraph_spark/queries/__init__.py, bump ROTATION_BUILT_FROM_ROUND to
the printed snapshot round, and run tests/test_registry_order.py — it
re-derives the same buckets and fails on any divergence.
"""
import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BUDGET = 50


def main() -> None:
    from cinegraph_spark.queries import (
        CHANGED_CODE_CANARIES,
        ROTATION_BUILT_FROM_ROUND,
        load_all,
    )

    args = sys.argv[1:]
    cutoff: int | None = ROTATION_BUILT_FROM_ROUND
    if "--latest" in args:
        args.remove("--latest")
        cutoff = None
    if "--upto" in args:
        i = args.index("--upto")
        try:
            cutoff = int(args[i + 1])
        except (IndexError, ValueError):
            sys.exit("--upto requires an integer round number")
        del args[i : i + 2]
    canaries = tuple(args) or CHANGED_CODE_CANARIES

    fresh: dict[str, int] = {}
    newest = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", f).group(1))
        if cutoff is not None and rnd > cutoff:
            continue
        newest = max(newest, rnd)
        for name in json.load(open(f)):
            fresh[name] = max(rnd, fresh.get(name, 0))

    registry = list(load_all().keys())
    unknown = [c for c in canaries if c not in registry]
    if unknown:
        sys.exit(f"canaries not in registry: {unknown}")

    never = [n for n in registry if n not in fresh and n not in canaries]
    if len(canaries) + len(never) > BUDGET:
        sys.exit(
            f"{len(canaries)} canaries + {len(never)} never-checked queries "
            f"exceed the {BUDGET}-slot budget — the rotation contract "
            "requires every never-checked query inside the budget; trim the "
            "canary list or raise BUDGET in both this script and "
            "tests/test_registry_order.py"
        )
    stale = sorted(
        (n for n in registry if n in fresh and n not in canaries),
        key=lambda n: (fresh[n], registry.index(n)),
    )
    order = list(canaries) + never + stale
    budget = order[:BUDGET]

    hist = Counter(fresh[n] for n in registry if n in fresh)
    print(f"# freshness over CORRECTNESS_r01..r{newest:02d}: "
          f"{sorted(hist.items())}; never-checked: {len(never)}")
    print(f"# ROTATION_BUILT_FROM_ROUND: int = {newest}")
    print(f"# {len(canaries)} canaries + {len(never)} never + "
          f"{len(budget) - len(canaries) - len(never)} stalest = "
          f"{len(budget)} slots")
    if canaries != CHANGED_CODE_CANARIES:
        # argv override: the budget below assumes THESE canaries lead, so
        # the paste must replace the committed tuple too
        print("CHANGED_CODE_CANARIES: tuple[str, ...] = (")
        for c in canaries:
            print(f'    "{c}",')
        print(")")
    print("DRIVER_PRIORITY: tuple[str, ...] = CHANGED_CODE_CANARIES + (")
    last_round = "sentinel"
    for n in budget[len(canaries):]:
        rnd = fresh.get(n)
        if rnd != last_round:
            label = "never driver-checked" if rnd is None else (
                f"last checked round {rnd} (registry order)"
            )
            print(f"    # {label}")
            last_round = rnd
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
