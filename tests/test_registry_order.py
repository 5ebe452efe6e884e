"""Pin the driver-facing registry order (load-bearing: the driver's
correctness harness checks ~50 queries per round in registration order).

The rotation contract is freshness-derived, not literal (r10 verdict task
1: the per-round literal pins rotted every time the rotation was rebuilt).
``DRIVER_PRIORITY`` must equal: the declared ``CHANGED_CODE_CANARIES``
first, then every never-driver-checked query, then queries in
non-decreasing order of their latest driver-check round, with the 50-slot
budget covering *every* query strictly staler than the newest non-canary
round admitted. Freshness is computed from ``CORRECTNESS_r*.json`` up to
``ROTATION_BUILT_FROM_ROUND`` — the snapshot the rotation was derived
from — so the arrival of the next round's correctness file cannot
retroactively fail the suite; rebuilding the rotation for a new round
means updating the priority list AND bumping the constant, and the test
re-validates the new order against the new data with zero literal pins.
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

import pytest

from cinegraph_spark.queries import (
    CHANGED_CODE_CANARIES,
    DRIVER_PRIORITY,
    ROTATION_BUILT_FROM_ROUND,
    load_all,
)

REPO = Path(__file__).resolve().parent.parent
BUDGET = 50


def _freshness() -> dict[str, int]:
    """name -> latest driver-check round, over rounds <= the snapshot."""
    fresh: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", f).group(1))
        if rnd > ROTATION_BUILT_FROM_ROUND:
            continue
        for name in json.load(open(f)):
            fresh[name] = max(rnd, fresh.get(name, 0))
    return fresh


def test_priority_slots_lead_registry():
    names = list(load_all().keys())
    assert tuple(names[: len(DRIVER_PRIORITY)]) == DRIVER_PRIORITY


def test_rotation_is_freshness_derived():
    fresh = _freshness()
    if not fresh:
        pytest.skip("no CORRECTNESS_r*.json present (fresh clone)")
    registry = list(load_all().keys())
    budget = list(DRIVER_PRIORITY[:BUDGET])

    # canaries are declared, registered, and inside the budget
    for canary in CHANGED_CODE_CANARIES:
        assert canary in budget, f"changed-code canary {canary} outside budget"

    non_canary = [n for n in DRIVER_PRIORITY if n not in CHANGED_CODE_CANARIES]

    # never-driver-checked queries lead the non-canary slots, and ALL of
    # them are present (a query with no driver row may not be skipped);
    # a never-checked CANARY satisfies this from the canary block, so
    # exclude canaries here (gen_rotation.py computes the same way)
    never = [
        n
        for n in registry
        if n not in fresh and n not in CHANGED_CODE_CANARIES
    ]
    assert sorted(non_canary[: len(never)]) == sorted(never), (
        "never-checked queries must fill the first non-canary slots: "
        f"expected {sorted(never)}"
    )

    # after the never-checked block, freshness is non-decreasing — the
    # rotation always drains oldest buckets first
    rounds = [fresh[n] for n in non_canary[len(never) :]]
    assert rounds == sorted(rounds), (
        "non-canary DRIVER_PRIORITY must be ordered oldest-check-first: "
        f"{list(zip(non_canary[len(never):], rounds))}"
    )

    # budget completeness: nothing strictly staler than the newest
    # non-canary round admitted to the budget may be left outside it
    budget_non_canary = [n for n in budget if n not in CHANGED_CODE_CANARIES]
    if budget_non_canary:
        cutoff = max(fresh.get(n, 0) for n in budget_non_canary)
        left_out = [
            n
            for n in registry
            if n not in budget and (n not in fresh or fresh[n] < cutoff)
        ]
        assert not left_out, (
            f"queries staler than round {cutoff} missing from the "
            f"{BUDGET}-slot budget: {left_out}"
        )


def test_rotation_snapshot_is_current():
    """The snapshot constant must point at the newest correctness file on
    disk when the rotation was built; a NEWER file appearing later (the
    driver lands r{N+1} at the start of round N+2) is allowed to exceed it
    by at most one round before the rotation must be rebuilt."""
    rounds = [
        int(re.search(r"r(\d+)\.json$", f).group(1))
        for f in glob.glob(str(REPO / "CORRECTNESS_r*.json"))
    ]
    if not rounds:
        pytest.skip("no CORRECTNESS_r*.json present (fresh clone)")
    assert ROTATION_BUILT_FROM_ROUND <= max(rounds), (
        "rotation claims a freshness snapshot newer than any file on disk"
    )
    assert max(rounds) - ROTATION_BUILT_FROM_ROUND <= 1, (
        f"rotation built from r{ROTATION_BUILT_FROM_ROUND} but "
        f"CORRECTNESS_r{max(rounds)} exists — rebuild DRIVER_PRIORITY "
        "from the new freshness data and bump ROTATION_BUILT_FROM_ROUND"
    )


def test_load_all_idempotent_order():
    first = list(load_all().keys())
    second = list(load_all().keys())
    assert first == second


def test_no_duplicate_names():
    names = list(load_all().keys())
    assert len(names) == len(set(names))
