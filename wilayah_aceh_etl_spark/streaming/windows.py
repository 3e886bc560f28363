"""Structured Streaming window operators over event streams.

The reference has no streaming surface (SURVEY §2.11); these are the
engine's additions. Each operator is the streaming twin of an
oracle-checked batch query in plans/events_queries.py — identical
window specs, so the batch gate certifies the semantics and these
add watermark/late-data handling on top.

At scale: windowed aggregation state is keyed by (window, group key)
and pruned by the watermark; shuffle partitioning on the group key is
chosen by Spark's streaming aggregation. Late rows beyond the
watermark are dropped, matching the declared policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source event stream with an explicit schema (schema
    inference is forbidden on streaming sources and would be a full
    extra scan at 100 TB anyway)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if fmt == "json":
        return reader.json(path)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of events_tumbling_window_counts: counts +
    value totals per 5-minute tumbling window and event type, state
    dropped once the watermark passes the window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of events_sliding_window_rates."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def enriched_segment_counts(
    events: DataFrame,
    user_dim: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-static join then windowed aggregation: each micro-batch
    of the event stream is enriched with a static user dimension
    (user_id → segment) before the tumbling count per segment.

    At scale the static side is a dim table — Spark broadcasts it per
    micro-batch (stream-static joins are stateless: no watermark
    bookkeeping on the static side, and the join never adds state
    beyond the downstream aggregation's)."""
    dim = F.broadcast(user_dim.select("user_id", "segment"))
    return (
        events.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts", window).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of events_session_windows: merging session
    state per user with a 10-minute inactivity gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
