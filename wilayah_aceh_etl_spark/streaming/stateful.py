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


_EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_02", T.DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def running_user_ewma(
    events: DataFrame, watermark: str = "10 minutes", alpha: float = 0.2
) -> DataFrame:
    """Stateful streaming EWMA (applyInPandasWithState): per user,
    e_t = alpha*x_t + (1-alpha)*e_{t-1} over the event-time-ordered
    value series, state = (count, last ewma). Unlike the running-
    totals op the recurrence is ORDER-SENSITIVE, so each micro-batch
    sorts its slice by (ts, event_id) before folding — the composed
    result equals the batch recurrence as long as batches arrive in
    event-time order (the availableNow single-batch case trivially,
    and in production a watermark-sized sorter would front this).
    State is O(1) per user. For the default alpha=0.2 the float ops
    are written literally (0.2 * x + 0.8 * e) to match the
    batch/oracle expression tree bit-for-bit; any other alpha uses
    the generic (alpha, 1-alpha) fold (the output column name stays
    ewma_02 only on the default path's oracle contract)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a, b = (0.2, 0.8) if alpha == 0.2 else (float(alpha), 1.0 - float(alpha))

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, e = (0, None)
        if state.exists:
            n, e = state.get
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            # caller pre-rounds `value` engine-side (Spark ROUND is
            # half-up like DuckDB's; pandas .round is half-even and
            # would diverge on exact .005 boundaries)
            batch = pd.concat(chunks).sort_values(["ts", "event_id"])
            for x in batch["value"].tolist():
                e = float(x) if e is None else a * x + b * e
                n += 1
        state.update((n, e if e is not None else 0.0))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma_02": [e],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_EWMA_OUT_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
