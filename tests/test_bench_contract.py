"""Pin the bench stdout contract: the driver captures only the LAST ~2000
bytes of stdout, so the final JSON line must fit that window WITH every
headline query's timing recoverable. Round 9 replaced full query names with
stable aliases (b<HEADLINE index>, map committed as BENCH_aliases.json)
after r8 measured overflow at 61+ queries even at 1-decimal times."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, compress_result  # noqa: E402


def _simulated_line(n_over: int) -> str:
    """Run the REAL degrade ladder (bench.compress_result — a hand-copied
    mirror here would silently drift from the code it pins) on synthetic
    worst-case values."""
    result = {
        "metric": "headline_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": {n: 123.456 for n in HEADLINE},
        "sf": 0.1,
        "over_budget": {
            n: [123.456, 61.72] for n in list(HEADLINE)[:n_over]
        },
        # worst-case width for the r18 contention probe
        "calib": {"first": 123.456, "last": 123.456, "ratio": 12.34},
    }
    line, alias_map = compress_result(result, list(HEADLINE))
    assert len(alias_map) == len(HEADLINE)
    return line


def test_bench_line_fits_driver_tail_even_worst_case():
    # every timing 6 digits AND every query over budget — the ladder must
    # land inside the 2000-byte tail with headroom, at every breach count
    for n_over in (0, 3, len(HEADLINE)):
        line = _simulated_line(n_over)
        assert len(line) < 1960, n_over
        assert json.loads(line)["metric"] == "headline_total"


def test_aliases_are_stable_and_unique():
    aliases = [f"b{i:02d}" for i in range(len(HEADLINE))]
    assert len(set(aliases)) == len(HEADLINE)
    # append-only discipline: the first entries are the original headline
    # set, so historical BENCH_r*.json aliases keep resolving
    assert HEADLINE[0] == "q1_pricing_summary"
    assert HEADLINE[1] == "q3_shipping_priority"


def test_headline_names_are_registered():
    from cinegraph_spark.queries import load_all

    specs = load_all()
    missing = [n for n in HEADLINE if n not in specs]
    assert not missing, missing


def test_every_headline_query_has_a_budget_ceiling():
    # The over-budget regression gate is blind to any headline query with
    # no BENCH_budget.json entry (r9 verdict caught vec_ann_hnsw_served_knn
    # entering the headline unpinned) — enforce full coverage.
    budget_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_budget.json",
    )
    with open(budget_path) as fh:
        budget = json.load(fh)
    unpinned = [n for n in HEADLINE if n not in budget]
    assert not unpinned, unpinned


def test_serving_tier_is_a_headline_subset():
    """The core/serving split (r13 verdict task 4) must stay consistent:
    every serving-tier name is a real headline entry, and the two
    subtotals partition the headline total exactly."""
    from bench import SERVING

    assert SERVING <= set(HEADLINE), sorted(SERVING - set(HEADLINE))
    times = {n: 1.0 for n in HEADLINE}
    core = sum(v for k, v in times.items() if k not in SERVING)
    serving = sum(v for k, v in times.items() if k in SERVING)
    assert core + serving == len(HEADLINE)
    assert serving == len(SERVING)
