"""Temporal join operators Spark lacks as built-ins: as-of join and
banded range join.

The reference has no temporal joins (single-table service, SURVEY
§2.11); these are EXT operators every time-series/training-data
pipeline needs, built as compositions of existing DataFrame ops —
no UDFs, no driver-side loops.

Scale design:

  asof_join        — the naive formulation (equi-join on key, filter
                     time, row_number to keep latest) materializes
                     |left|×|right-per-key| intermediate rows. This
                     implementation instead UNIONs both sides tagged,
                     sorts each key partition once by (time, side),
                     and carries the latest right payload forward
                     with last(ignorenulls) — ONE shuffle, O(n log n)
                     per key, intermediate size |left|+|right|.
  banded_range_join— an interval predicate |l.ts - r.ts| within a
                     band is not an equi-join, so Catalyst would fall
                     back to a nested-loop per key. Bucketing both
                     sides to band-width buckets and exploding the
                     right side into adjacent buckets turns it into
                     an equi-join on (key, bucket) + exact residual
                     filter: intermediate is O(true near-pairs), not
                     O(pairs sharing a key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_payload: list[str] | None = None,
    strict: bool = True,
    suffix: str = "_r",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the LATEST right row
    of the same `on` key with right_time < left_time (strict=True,
    DuckDB `ASOF JOIN ... ON l.t > r.t`) or <= left_time
    (strict=False). Left rows with no prior right row keep nulls
    (LEFT-join semantics). With `tolerance_seconds`, a match older
    than the tolerance is discarded (bounded staleness — the match
    becomes null rather than arbitrarily stale).

    direction="forward" flips the search: the EARLIEST right row with
    right_time > left_time (strict) / >= (inclusive) — next-event
    lookup. Same plan shape: the per-key sort just runs descending.

    One hash shuffle on `on` + one sort per partition; never builds
    the per-key cross product.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_time)
    ]
    payload_struct = F.struct(
        F.col(right_time).alias(right_time + suffix),
        *[F.col(c).alias(c + suffix) for c in right_payload],
    )

    left_cols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left_cols).alias("_lp"),
        F.lit(None).cast(
            right.select(payload_struct).schema[0].dataType
        ).alias("_rp"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left_cols)).schema[0].dataType
        ).alias("_lp"),
        payload_struct.alias("_rp"),
    )
    # Tie order at equal timestamps: strict → left sorts BEFORE right
    # (a right row at the same instant is not yet visible); inclusive
    # → right first. `last(ignorenulls)` then picks exactly the
    # right rows with t < lt (resp. <=).
    tie = F.when(F.col("_side") == (1 if strict else 0), 0).otherwise(1)
    t_order = (
        F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, tie.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        lt = F.unix_timestamp(F.col("_t").cast("timestamp"))
        rt = F.unix_timestamp(
            F.col("_match")[right_time + suffix].cast("timestamp")
        )
        fresh = (
            (lt - rt) if direction == "backward" else (rt - lt)
        ) <= tolerance_seconds
        merged = merged.withColumn(
            "_match", F.when(fresh, F.col("_match"))
        )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col("_lp")[c].alias(c) for c in left_cols],
        *[
            F.col("_match")[f].alias(f)
            for f in [right_time + suffix]
            + [c + suffix for c in right_payload]
        ],
    )
    return out


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower: Column,
    upper: Column,
    band_seconds: int,
    suffix: str = "_r",
) -> DataFrame:
    """Range join: pairs with same `on` key and
    lower <= l.time - r.time < upper, where `lower`/`upper` are
    second-count Columns and the window fits within `band_seconds`.

    Both sides are bucketed to band-width epochs; the right side is
    exploded into each bucket it can match (bucket and bucket+1 when
    the window spans a boundary), making the join an equi-join on
    (key, bucket) with an exact residual predicate.
    """
    b = F.lit(band_seconds)
    l_bucket = F.floor(F.unix_timestamp(F.col(left_time)) / b)
    # a right row matches left times in [rt+lower, rt+upper) — a span
    # of at most band_seconds, so it lands in exactly two consecutive
    # left buckets starting at floor((rt+lower)/b)
    r_bucket = F.floor((F.unix_timestamp(F.col(right_time)) + lower) / b)

    lt = left.select(
        F.struct(*left.columns).alias("_lp"),
        F.col(on).alias("_k"),
        F.unix_timestamp(F.col(left_time)).alias("_lt"),
        l_bucket.alias("_bucket"),
    )
    rt = right.select(
        F.struct(*right.columns).alias("_rp"),
        F.col(on).alias("_k"),
        F.unix_timestamp(F.col(right_time)).alias("_rt"),
        F.explode(F.array(r_bucket, r_bucket + 1)).alias("_bucket"),
    )
    delta = F.col("_lt") - F.col("_rt")
    joined = lt.join(rt, ["_k", "_bucket"]).filter(
        (delta >= lower) & (delta < upper)
    )
    lcols = [F.col("_lp")[c].alias(c) for c in left.columns]
    rcols = [F.col("_rp")[c].alias(c + suffix) for c in right.columns]
    return joined.select(*lcols, *rcols)
