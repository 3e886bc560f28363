"""Stream-stream joins with watermark-bounded state.

The hardest Structured Streaming surface: joining two live streams
requires buffering both sides, and the event-time range condition +
watermarks are what let Spark expire that buffer. Without the range
condition the state would grow forever; with it, each side holds at
most (watermark + range) of data per key.

At 100 TB-rate streams the state store partitions on the join key
(user_id), so hot users are the skew concern — same remedy as batch
(AQE doesn't apply to streaming state; key salting at ingest does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to every
    click by the same user in the preceding `horizon`. Both sides
    watermarked; the time-range predicate bounds join state to
    (watermark + horizon) per side. Batch twin:
    events_range_join_error_click has the same banded-range shape.

    Returns (user_id, click_id, purchase_id, click_ts, purchase_ts).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )


def click_purchase_attribution_outer(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click emits — matched
    rows as soon as both sides arrive, unmatched clicks null-padded
    only once the (min-across-sides) watermark passes click_ts +
    horizon, i.e. when a match has provably become impossible. That
    deferred emission is the semantic difference from the inner form:
    correctness depends on state expiry, so this is the operator that
    proves the watermark actually bounds AND drains the buffers
    (pinned across checkpointed restarts in tests/test_streaming.py).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(purchases, cond, "leftOuter").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )
