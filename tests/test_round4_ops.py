"""Semantic unit tests for the round-4 operators on hand-built
inputs where the expected outcome is known by construction. Parity
(tools/parity.py) separately pins each against DuckDB on the driver
corpus; these pin the operator DEFINITIONS.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# Skyline dominance (definition check via brute force)
# ---------------------------------------------------------------------------


def _skyline_bruteforce(points):
    """O(n²) reference: keep p iff no q dominates it."""
    out = []
    for p in points:
        dominated = any(
            (q[0] <= p[0] and q[1] >= p[1]) and (q[0] < p[0] or q[1] > p[1])
            for q in points
        )
        if not dominated:
            out.append(p)
    return sorted(set(out))


def test_skyline_matches_bruteforce(spark):
    pts = [
        (1.0, 3), (1.0, 5), (2.0, 5), (2.0, 7), (3.0, 6),
        (3.0, 7), (4.0, 9), (5.0, 1), (5.0, 9),
    ]
    part = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(pts)],
        "p_partkey long, p_retailprice double, p_size int",
    )
    from pyspark.sql.window import Window

    g = part.groupBy(F.col("p_retailprice").alias("pr")).agg(
        F.max("p_size").alias("mx")
    )
    w = Window.orderBy("pr").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        g.withColumn("prevmx", F.max("mx").over(w))
        .filter(F.col("prevmx").isNull() | (F.col("mx") > F.col("prevmx")))
        .select("pr", "mx")
    )
    got = sorted((r["pr"], r["mx"]) for r in sky.collect())
    assert got == _skyline_bruteforce(pts)


# ---------------------------------------------------------------------------
# Weighted median definition
# ---------------------------------------------------------------------------


def test_weighted_median_cumulative_crossing(spark):
    # weights: price 10 w=1, price 20 w=2, price 30 w=5 → total 8,
    # half = 4 → cum(10)=1, cum(20)=3, cum(30)=8 → median 30
    # with w(30)=3 instead: cum(20)=3, total 6 → 2*3 >= 6 → median 20
    from pyspark.sql.window import Window

    def wmedian(rows):
        df = spark.createDataFrame(rows, "flag string, price double, w long")
        wp = Window.partitionBy("flag")
        wc = wp.orderBy("price").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        c = df.select(
            "flag", "price",
            F.sum("w").over(wc).alias("cum"),
            F.sum("w").over(wp).alias("total"),
        )
        out = (
            c.filter(F.col("cum") * 2 >= F.col("total"))
            .groupBy("flag")
            .agg(F.min("price").alias("m"))
            .collect()
        )
        return {r["flag"]: r["m"] for r in out}

    assert wmedian(
        [("x", 10.0, 1), ("x", 20.0, 2), ("x", 30.0, 5)]
    ) == {"x": 30.0}
    assert wmedian(
        [("x", 10.0, 1), ("x", 20.0, 2), ("x", 30.0, 3)]
    ) == {"x": 20.0}


# ---------------------------------------------------------------------------
# Duplicate-span fraction
# ---------------------------------------------------------------------------


def test_duplicate_span_fraction_counts_cross_doc_only(spark, monkeypatch):
    # doc 0 and 1 share their full 8-token text (1 span each, dup);
    # doc 2 is 9 unique tokens (2 spans, no dups);
    # doc 3 is 7 tokens (no spans — excluded from the report)
    shared = "a b c d e f g h"
    rows = [
        (0, shared),
        (1, shared),
        (2, "p q r s t u v w x"),
        (3, "one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: docs)
    monkeypatch.setattr(r4, "spread", lambda df: df)
    out = {
        r["doc_id"]: r
        for r in r4.dedup_duplicate_span_fraction(spark, "ignored").collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["n_spans"] == 1 and out[0]["n_dup_spans"] == 1
    assert out[1]["dup_frac"] == 1.0
    assert out[2]["n_spans"] == 2 and out[2]["n_dup_spans"] == 0


# ---------------------------------------------------------------------------
# CUSUM changepoint on a synthetic step series
# ---------------------------------------------------------------------------


def test_cusum_peaks_at_step_boundary(spark, monkeypatch):
    # counts 1,1,1,5,5,5 per day: mean 3; CUSUM is most negative
    # right before the level shift → |CUSUM| peaks on day 3
    import datetime

    rows = []
    eid = 0
    for day, n in enumerate([1, 1, 1, 5, 5, 5], start=1):
        for _ in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, day, 12, 0, 0),
                    0,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )

    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: events)
    row = r4.events_changepoint_cusum(spark, "ignored").collect()[0]
    assert row["changepoint_day"] == "2024-01-03"
    # cusum at day 3 = 3*(1 - 3) = -6
    assert row["cusum_at_peak"] == pytest.approx(-6.0)


# ---------------------------------------------------------------------------
# Linear interpolation gapfill
# ---------------------------------------------------------------------------


def test_linear_interp_fills_between_neighbors(spark, monkeypatch):
    import datetime

    def ev(eid, day, value):
        return (
            eid,
            datetime.datetime(2024, 1, day, 1, 0, 0),
            1,
            "click",
            value,
            "{}",
        )

    # user 1: day1=10, day4=40 → day2=20, day3=30 interpolated
    events = spark.createDataFrame(
        [ev(0, 1, 10.0), ev(1, 4, 40.0)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )

    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: events)
    out = {
        r["day"]: r
        for r in r4.events_gapfill_linear_interp(spark, "ignored").collect()
    }
    assert out["2024-01-01"]["interpolated"] == 0
    assert out["2024-01-02"]["value_filled"] == pytest.approx(20.0)
    assert out["2024-01-03"]["value_filled"] == pytest.approx(30.0)
    assert out["2024-01-03"]["interpolated"] == 1
    assert out["2024-01-04"]["value_filled"] == pytest.approx(40.0)


# ---------------------------------------------------------------------------
# RRF formula
# ---------------------------------------------------------------------------


def test_rrf_scores_on_driver_corpus(spark):
    from wilayah_aceh_etl_spark.plans.round4_queries import retrieval_rrf_fusion

    rows = retrieval_rrf_fusion(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) <= 20
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0.0
        if r["bm25_rk"]:
            expect += 1.0 / (60 + r["bm25_rk"])
        if r["cos_rk"]:
            expect += 1.0 / (60 + r["cos_rk"])
        assert r["rrf_score"] == pytest.approx(expect, abs=1e-6)
    # fused ordering is non-increasing
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# BFS distances on a hand-built graph
# ---------------------------------------------------------------------------


def test_bfs_unrolled_frontier(spark, monkeypatch):
    # baskets: (1,2,3) x3 orders → edges 1-2,1-3,2-3; (3,4) x3 → 3-4;
    # (5,6) x3 → separate component. BFS from 1: d(1)=0, d(2)=d(3)=1,
    # d(4)=2; 5,6 unreachable.
    rows = []
    for ok in range(3):
        for pk in (1, 2, 3):
            rows.append((ok, pk))
    for ok in range(10, 13):
        for pk in (3, 4):
            rows.append((ok, pk))
    for ok in range(20, 23):
        for pk in (5, 6):
            rows.append((ok, pk))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: li)
    out = {
        r["node"]: r["dist"]
        for r in r4.graph_bfs_part_cooccurrence(spark, "ignored").collect()
    }
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


# ---------------------------------------------------------------------------
# Association-rule metrics on a tiny basket set
# ---------------------------------------------------------------------------


def test_association_rule_metrics(spark, monkeypatch):
    # 4 orders: {1,2} {1,2} {1,2} {1} → pair (1,2) n=3, n_1=4, n_2=3,
    # n_orders=4 → support .75, conf_1→2 .75, conf_2→1 1.0,
    # lift = 3*4/(4*3) = 1.0
    rows = [(0, 1), (0, 2), (1, 1), (1, 2), (2, 1), (2, 2), (3, 1)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: li)
    row = r4.basket_association_rules(spark, "ignored").collect()[0]
    assert row["n_pair"] == 3
    assert row["support"] == pytest.approx(0.75)
    assert row["conf_a_b"] == pytest.approx(0.75)
    assert row["conf_b_a"] == pytest.approx(1.0)
    assert row["lift"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Batch 4-6 semantics
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


def test_attribution_lookback_boundary(spark, monkeypatch):
    import datetime

    base = datetime.datetime(2024, 6, 15, 12, 0, 0)
    rows = [
        # user 1: click 6 days before purchase → attributed to click
        (0, base - datetime.timedelta(days=6), 1, "click", 1.0, "{}"),
        (1, base, 1, "purchase", 1.0, "{}"),
        # user 2: view 8 days before purchase → outside lookback
        (2, base - datetime.timedelta(days=8), 2, "view", 1.0, "{}"),
        (3, base, 2, "purchase", 1.0, "{}"),
        # user 3: purchase with no prior events at all
        (4, base, 3, "purchase", 1.0, "{}"),
        # user 4: click then ANOTHER purchase between click and the
        # final purchase — purchases are transparent (not touches)
        (5, base - datetime.timedelta(days=2), 4, "click", 1.0, "{}"),
        (6, base - datetime.timedelta(days=1), 4, "purchase", 1.0, "{}"),
        (7, base, 4, "purchase", 1.0, "{}"),
    ]
    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: _events(spark, rows))
    out = {
        r["attributed_to"]: r["n_conversions"]
        for r in r4.events_attribution_last_touch(spark, "ignored").collect()
    }
    assert out == {"click": 3, "none": 2}


def test_watermark_late_audit_counts(spark, monkeypatch):
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # arrival order = event_id; event 2 arrives 15 min behind the
    # running max (late), event 3 only 5 min behind (on time)
    rows = [
        (0, at(0), 1, "click", 1.0, "{}"),
        (1, at(20), 1, "click", 1.0, "{}"),
        (2, at(5), 1, "click", 1.0, "{}"),   # 15 min late
        (3, at(15), 1, "click", 1.0, "{}"),  # 5 min late → kept
    ]
    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: _events(spark, rows))
    row = r4.events_watermark_late_audit(spark, "ignored").collect()[0]
    assert row["n_events"] == 4
    assert row["n_late_10m"] == 1
    assert row["max_late_us"] == 15 * 60 * 1_000_000


def test_sliding_distinct_users_window_edges(spark, monkeypatch):
    import datetime

    def ev(eid, day, user):
        return (
            eid,
            datetime.datetime(2024, 3, day, 10, 0, 0),
            user,
            "click",
            1.0,
            "{}",
        )

    # users 1,2 on day 1; user 3 on day 7; user 4 on day 8.
    # WAU(day 7) counts days 1..7 → {1,2,3}; WAU(day 8) counts days
    # 2..8 → {3,4} (day 1 falls out of the trailing-7 window).
    rows = [ev(0, 1, 1), ev(1, 1, 2), ev(2, 7, 3), ev(3, 8, 4)]
    import wilayah_aceh_etl_spark.plans.round4_queries as r4

    monkeypatch.setattr(r4, "load_table", lambda s, d, n: _events(spark, rows))
    out = {
        r["day"]: r["wau_7d"]
        for r in r4.events_sliding_distinct_users(spark, "ignored").collect()
    }
    assert out["2024-03-07"] == 3
    assert out["2024-03-08"] == 2


def test_percent_of_parent_shares_sum_to_one(spark):
    from wilayah_aceh_etl_spark.plans.round4_queries import (
        revenue_percent_of_parent,
    )

    rows = revenue_percent_of_parent(spark, "/root/testdata/sf0.001").collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    for region, nations in by_region.items():
        assert sum(n["pct_of_region"] for n in nations) == pytest.approx(
            1.0, abs=1e-4
        )
    world = {n["region"]: n["region_pct_of_world"] for n in rows}
    assert sum(world.values()) == pytest.approx(1.0, abs=1e-4)


def test_equi_depth_buckets_are_balanced(spark):
    from wilayah_aceh_etl_spark.plans.round4_queries import (
        histogram_equi_depth_prices,
    )

    rows = histogram_equi_depth_prices(spark, "/root/testdata/sf0.001").collect()
    counts = [r["n_orders"] for r in rows]
    assert len(rows) == 10
    assert max(counts) - min(counts) <= 1  # NTILE balance contract
    los = [r["lo"] for r in rows]
    his = [r["hi"] for r in rows]
    assert los == sorted(los) and his == sorted(his)
    for r in rows:
        assert r["lo"] <= r["hi"]


def test_matryoshka_recall_bounds(spark):
    from wilayah_aceh_etl_spark.plans.round4_queries import (
        similarity_matryoshka_recall,
    )

    rows = similarity_matryoshka_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_overlap"] <= 10
        assert r["recall_at_10"] == pytest.approx(r["n_overlap"] / 10.0)


def test_pq_adc_prefers_same_code_vectors(spark):
    # the PQ query's top-1 for each query must be a vector whose ADC
    # distance is minimal — sanity: distances are non-decreasing in rk
    from wilayah_aceh_etl_spark.plans.round4_queries import (
        similarity_pq_adc_topk,
    )

    rows = similarity_pq_adc_topk(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ds = [r["adc_d2"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert ds == sorted(ds)
