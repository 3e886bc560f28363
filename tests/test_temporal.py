"""Unit tests for the temporal join operators (as-of, banded range).

Tiny handmade frames with exact expected outputs — covers the edge
cases the sf-registry parity queries can't isolate: equal-timestamp
ties under strict/inclusive, unmatched left rows, negative range
bounds, band-boundary pairs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.operators.temporal import asof_join, banded_range_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts(10)), (2, "k1", _ts(20)), (3, "k2", _ts(5)), (4, "k3", _ts(7))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k1", _ts(10), 100.0), ("k1", _ts(15), 150.0), ("k2", _ts(9), 90.0)],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: (r["ts_r"], r["v_r"])
        for r in asof_join(left, right, on="k", strict=True).collect()
    }
    assert out[1] == (None, None)  # right@10 NOT visible at left@10
    assert out[2] == (_ts(15), 150.0)  # latest of the two priors
    assert out[3] == (None, None)  # right is later than left
    assert out[4] == (None, None)  # key has no right rows at all


def test_asof_inclusive_takes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: (r["ts_r"], r["v_r"])
        for r in asof_join(left, right, on="k", strict=False).collect()
    }
    assert out[1] == (_ts(10), 100.0)  # equal timestamp now matches
    assert out[2] == (_ts(15), 150.0)


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on="k").count() == left.count()


def test_banded_range_join_window_and_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "k", _ts(10)), (11, "k", _ts(9)), (12, "k", _ts(5)),
         (13, "k", _ts(4)), (14, "k", _ts(11)), (15, "x", _ts(10))],
        "rid int, k string, ts timestamp",
    )
    # 0 <= l.ts - r.ts < 300s: right rows at minutes 10..6 exclusive→
    # rid 10 (delta 0) and 11 (delta 60) qualify; 12 is delta 300 (out,
    # half-open), 13 out, 14 is future, 15 wrong key
    out = banded_range_join(
        left, right, on="k", left_time="ts", right_time="ts",
        lower=F.lit(0), upper=F.lit(300), band_seconds=300,
    )
    assert sorted(r["rid_r"] for r in out.collect()) == [10, 11]


def test_banded_range_join_negative_lower(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(20, "k", _ts(12)), (21, "k", _ts(14)), (22, "k", _ts(8))],
        "rid int, k string, ts timestamp",
    )
    # -300 <= l.ts - r.ts < 0: rights strictly AFTER left within 5 min
    out = banded_range_join(
        left, right, on="k", left_time="ts", right_time="ts",
        lower=F.lit(-300), upper=F.lit(0), band_seconds=300,
    )
    assert sorted(r["rid_r"] for r in out.collect()) == [20, 21]


def test_banded_range_join_no_duplicate_pairs(spark):
    # the 2-bucket explode must never yield the same pair twice
    left = spark.createDataFrame(
        [(i, "k", _ts(i)) for i in range(0, 59)], "id int, k string, ts timestamp"
    )
    right = left.select(F.col("id").alias("rid"), "k", "ts")
    out = banded_range_join(
        left, right, on="k", left_time="ts", right_time="ts",
        lower=F.lit(0), upper=F.lit(120), band_seconds=120,
    )
    pairs = [(r["id"], r["rid_r"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # deltas in [0,120) at whole minutes → 0s and 60s only
    assert len(pairs) == 59 + 58


def test_asof_tolerance_discards_stale_matches(spark):
    left, right = _frames(spark)
    # left id=2 at 00:20 matches right at 00:15 (300s old); with a
    # 200s tolerance that match must become null, with 400s it stays
    out_tight = {
        r["id"]: r["v_r"]
        for r in asof_join(
            left, right, on="k", strict=True, tolerance_seconds=200
        ).collect()
    }
    out_loose = {
        r["id"]: r["v_r"]
        for r in asof_join(
            left, right, on="k", strict=True, tolerance_seconds=400
        ).collect()
    }
    assert out_tight[2] is None
    assert out_loose[2] == 150.0
    # unmatched rows stay unmatched either way
    assert out_tight[4] is None and out_loose[4] is None


def test_asof_forward_strict_picks_next(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: (r["ts_r"], r["v_r"])
        for r in asof_join(
            left, right, on="k", strict=True, direction="forward"
        ).collect()
    }
    assert out[1] == (_ts(15), 150.0)  # right@10 NOT visible at left@10
    assert out[2] == (None, None)      # nothing after 20
    assert out[3] == (_ts(9), 90.0)    # earliest later right
    assert out[4] == (None, None)      # key has no right rows


def test_asof_forward_inclusive_takes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: (r["ts_r"], r["v_r"])
        for r in asof_join(
            left, right, on="k", strict=False, direction="forward"
        ).collect()
    }
    assert out[1] == (_ts(10), 100.0)  # equal timestamp matches
    assert out[3] == (_ts(9), 90.0)


def test_asof_forward_tolerance_discards_far_matches(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: (r["ts_r"], r["v_r"])
        for r in asof_join(
            left,
            right,
            on="k",
            strict=True,
            direction="forward",
            tolerance_seconds=250,
        ).collect()
    }
    assert out[3] == (_ts(9), 90.0)   # 4 min ahead: within tolerance
    assert out[1] == (None, None)     # 5 min ahead: beyond tolerance
