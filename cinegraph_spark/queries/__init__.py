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


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return
    the full registry.

    Registration order matters: the driver's correctness harness walks the
    registry in order under a ~50-query budget, so families not yet
    driver-verified register FIRST. Rounds 1+2 covered the relational /
    strings / pipeline families and tree / vectors / textstats / dedup /
    events (+ media_feature_extract); round 3 therefore leads with the
    remaining graph, tpch_extra, cluster, relational_extra, sampling,
    packing queries, this round's new analytics family, and the three
    unverified multimodal queries (media_feature_extract re-registers last
    within its module) — the first 50 slots are exactly the not-yet-verified
    set, maximizing cumulative driver-checked coverage whatever the budget.
    Query modules must not import each other at module level except via
    non-registering shared modules (util, neardup_common) — a cross-module
    import triggers the imported module's registrations mid-family.
    """
    from cinegraph_spark.queries import (  # noqa: F401
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
        tree,
        vectors,
        textstats,
        dedup,
        events,
        relational,
        strings,
        pipeline,
    )

    return REGISTRY
