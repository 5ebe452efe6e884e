"""The declared query registry — the engine's test/correctness surface.

Every implemented operator from SURVEY §2 is declared here as a
:class:`QuerySpec`: a named Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The driver's
harness and the local pytest suite both consume this registry, so local
green == driver green.

Conventions (driver contract, see repo README / __spark_entry__.py):

- every computed column is aliased identically in Spark and SQL;
- float aggregates are rounded to a fixed number of decimals on BOTH sides
  (cross-engine double summation differs in the last ulp);
- timestamps in result sets are projected as strings/ints (epoch parts), so
  no engine-specific timezone or datetime encoding can leak into the hash;
- top-k queries always order by a unique tiebreaker before LIMIT so the
  returned *set* is deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered views, or None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: register fn(spark, sf_dir)->DataFrame under ``name``."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


#: The rotation constants live in the GENERATED module ``_rotation``
#: (written by ``python scripts/gen_rotation.py --write`` each round —
#: r15 verdict task 8: rotation updates are one command, not a hand-paste)
#: and are re-exported here so every consumer keeps importing them from
#: ``cinegraph_spark.queries``. The contract:
#:
#: - ``ROTATION_BUILT_FROM_ROUND``: the freshness snapshot the rotation
#:   was derived from — per-query latest-driver-check rounds computed
#:   over CORRECTNESS_r01..r{N}.json for this N.
#:   tests/test_registry_order.py re-derives the stale buckets from
#:   exactly these files and asserts DRIVER_PRIORITY matches, so the
#:   next round's correctness file landing on disk cannot retroactively
#:   fail the suite.
#: - ``CHANGED_CODE_CANARIES``: queries whose underlying implementation
#:   changed since their last driver row. They may jump the pure
#:   freshness order (the test exempts exactly these names from the
#:   non-decreasing-freshness invariant) but must sit inside the
#:   50-slot budget.
#: - ``DRIVER_PRIORITY``: the driver's correctness harness walks the
#:   registry in order under a ~50-query budget; this tuple pins the
#:   front slots explicitly — canaries, then every never-driver-checked
#:   query, then the stalest buckets in registry order.
#:
#: Every name must exist in the registry — :func:`load_all` asserts.
from cinegraph_spark.queries._rotation import (  # noqa: E402
    CHANGED_CODE_CANARIES,
    DRIVER_PRIORITY,
    ROTATION_BUILT_FROM_ROUND,
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return
    the registry reordered for the driver's ~50-query/round budget.

    Order is explicit: :data:`DRIVER_PRIORITY` names first (the queries that
    most need a driver-green row this round), then every remaining query in
    module import order — which is arranged oldest-verified-first (round-1
    families lead) so the budget's tail re-checks the oldest passes as
    regression canaries. Query modules must not import each other at module
    level except via non-registering shared modules (util, neardup_common) —
    a cross-module import triggers the imported module's registrations
    mid-family and silently scrambles the fallback order.
    """
    from cinegraph_spark.queries import (  # noqa: F401
        relational,
        strings,
        pipeline,
        tree,
        vectors,
        textstats,
        dedup,
        events,
        graph,
        tpch_extra,
        cluster,
        relational_extra,
        sampling,
        packing,
        analytics,
        udfs,
        pysource,
        multimodal,
        timeseries,
        layout,
        quality,
    )

    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
