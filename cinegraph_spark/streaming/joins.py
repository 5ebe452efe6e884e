"""Stream-stream joins with watermark-bounded state.

The missing third leg of the streaming surface (windowed aggs in
``windows.py``, custom state in ``stateful.py``): joining two live streams.
Spark buffers both sides in the state store; the join's time-range
predicate plus both watermarks bound how long a row can wait for a match,
which is what keeps state finite on an unbounded stream — without the range
condition the state grows forever and the query is rejected in append mode.

The batch twin (same predicate on static DataFrames) is what
``tests/test_streaming.py`` compares against; the reference analog is the
as-of purchase↔click attribution (`queries/events.py::
events_asof_purchase_click`) upgraded from batch to continuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_clicks(
    events: DataFrame,
    attribution_window: str = "INTERVAL 30 MINUTES",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Attribution join: each purchase matched to the same user's clicks in
    the preceding ``attribution_window``.

    Both sides derive from one source here (self-split), but the plan is a
    genuine stream-stream inner join: state holds clicks until
    ``purchase_ts - attribution_window`` passes their watermark, then
    evicts. Output: (user_id, purchase_id, purchase_ts, click_id, click_ts).

    ``how="left_outer"`` is the unmatched-detection form: a purchase with
    no click in its window is emitted with NULL click columns — but only
    once the watermark passes its eviction time, because until then a
    matching click could still arrive. That timing is the load-bearing
    semantic difference from a batch left join: null rows are emitted by
    STATE EVICTION in a later micro-batch, not by the batch that saw the
    purchase, and state still buffered when the stream stops is never
    emitted at all. Callers who need every verdict finalized must advance
    the watermark past the data before the drain ends (the registered
    query `stream_join_left_outer_attribution` stages sentinel batches
    for exactly that; its oracle is then the plain batch LEFT JOIN).

    ``how="full_outer"`` completes the surface: unmatched rows on BOTH
    sides finalize by eviction — a never-attributed click (no purchase
    followed within the window) surfaces with NULL purchase columns once
    the watermark passes ``click_ts + attribution_window`` (the last
    instant a matching purchase could still arrive), under the same
    eviction timing as the purchase side. The output ``user_id`` is
    coalesced across the two sides, since either may be the NULL one.
    """
    full = how in ("full", "outer", "full_outer", "fullouter")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(attribution_window)
        ),
        how,
    ).select(
        (
            F.coalesce("user_id", "click_user") if full else F.col("user_id")
        ).alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def enrich_stream_with_dim(
    stream: DataFrame, dim: DataFrame, on, event_type: str = "purchase"
) -> DataFrame:
    """Stream-static enrichment join — the third join shape of the
    streaming surface (windowed aggs join batch twins; stream-stream above;
    this one joins a live stream against a slowly-changing dimension).

    The static side is broadcast: no state store is involved at all (the
    dimension is re-resolved per micro-batch, which is also what gives
    'slowly-changing' semantics — a dim update is picked up by the next
    batch). At 100 TB/day the stream side never shuffles for this join;
    dimension size is the only constraint, exactly as in the batch star
    schema. Returns the enriched streaming DataFrame; callers pick sink.
    """
    return stream.filter(F.col("event_type") == event_type).join(
        F.broadcast(dim), on, "inner"
    )
