"""As-of (point-in-time) join — the operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row with the same
key and ``right.ts <= left.ts`` (ties broken by largest ``right`` id).

Implementation is the *union + running last* algorithm, not a join:
tag both sides, union them, and take ``last(right_value) ignoring nulls``
over a per-key window ordered by (ts, side, id). This is the scalable form —
one shuffle on the key, no range-join explosion, no per-left-row scan of the
right side; skew in the key only affects the window sort, which AQE-split
partitions handle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_id: str,
    right_id: str,
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Attach the latest right row at-or-before each left row's timestamp.

    Returns the left columns plus ``asof_<right_id>`` and
    ``asof_<c>`` for each payload column (NULL when no right row precedes).
    """
    payload = right_payload or []
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        F.col(left_id).alias("_lid"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("_rid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.coalesce("_rid", "_lid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = unioned.select(
        "*",
        F.last("_rid", ignorenulls=True).over(w).alias(f"asof_{right_id}"),
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    out = enriched.filter(F.col("_side") == 1).select(
        F.col("_k").alias(key),
        F.col("_ts").alias(ts),
        F.col("_lid").alias(left_id),
        f"asof_{right_id}",
        *[f"asof_{c}" for c in payload],
    )
    return out
