"""Co-located join layout: the join plan over same-bucketed tables
must contain no Exchange — the shuffle was paid at write time."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.sources.bucketing import colocated_join, write_bucketed
from wilayah_aceh_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default spark-warehouse dir (warehouse.dir is a static conf);
    # tables dropped in teardown
    o = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "orderkey")
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    write_bucketed(o, "orders_b", "orderkey", 8)
    write_bucketed(li, "lineitem_b", "orderkey", 8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = colocated_join(spark, lt, rt, "orderkey")
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "orderkey")
    n_bucketed = joined.count()
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    _, rt = bucketed_tables
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        agg = spark.table(rt).groupBy("orderkey").agg(F.count(F.lit(1)))
        plan = _plan(agg)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "Exchange" not in plan, plan


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    from wilayah_aceh_etl_spark.sources.maintenance import (
        compact_table,
        data_file_count,
    )

    table = str(tmp_path / "frag")
    li = load_table(spark, SF, "lineitem")
    # fragment: 40 tiny files
    li.repartition(40).write.mode("overwrite").parquet(table)
    before_files = data_file_count(table)
    before_rows = spark.read.parquet(table).count()
    assert before_files >= 40

    compact_table(spark, table, target_file_bytes=64 * 1024 * 1024)
    after_files = data_file_count(table)
    after_rows = spark.read.parquet(table).count()
    assert after_rows == before_rows
    assert after_files < before_files
    assert after_files <= 4
