"""Physical-plan inspection helpers.

The engine has no custom Catalyst rules (SURVEY §4 — everything is
expressible with built-ins), so "optimizer work" here means *verifying* that
the declarative plans actually get the physical strategies a 100 TB run
needs: filters pushed into the parquet scan, columns pruned, small dims
broadcast instead of shuffled, whole-stage codegen covering the hot path,
and no accidental Python row-at-a-time evaluation. ``tests/test_plans.py``
pins these properties for the headline queries so a regression (e.g., a
filter expression that stops being pushable) fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text of the optimized physical plan (full,
    untruncated — `executedPlan().toString()` elides long scan lines)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def plan_counts(df: DataFrame) -> dict[str, int]:
    """Occurrence counts of the plan features that matter at scale.

    Counts the numbered detail-section headers (``(7) NodeName``) so each
    physical node is counted once — the formatted output also repeats node
    names in the plan tree. ``wholestage_codegen`` counts distinct codegen
    spans (``[codegen id : N]`` markers, deduped by id).
    """
    plan = formatted_plan(df)

    def nodes(name: str) -> int:
        return len(re.findall(rf"\(\d+\) {name}\b", plan))

    return {
        "broadcast_hash_join": nodes("BroadcastHashJoin"),
        "sort_merge_join": nodes("SortMergeJoin"),
        "shuffle_exchange": nodes("Exchange"),
        "broadcast_exchange": nodes("BroadcastExchange"),
        "wholestage_codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "python_row_udf": nodes("BatchEvalPython"),
        "python_arrow_udf": nodes("ArrowEvalPython")
        + nodes("FlatMapGroupsInPandas")
        + nodes("MapInPandas"),
        "take_ordered": nodes("TakeOrderedAndProject"),
    }


def pushed_filters(df: DataFrame) -> list[str]:
    """The `PushedFilters: [...]` contents of every parquet scan, one string
    per scan (empty string for a scan with nothing pushed)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)]


def read_schemas(df: DataFrame) -> list[str]:
    """The `ReadSchema:` struct of every parquet scan — column-pruning
    evidence (a scan reading all columns for a narrow projection is wrong)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*>)", plan)]
