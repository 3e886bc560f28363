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


def _file_minmax(path, col):
    """Per-file (min, max) of `col` from parquet footers."""
    import os

    import pyarrow.parquet as pq

    out = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.names.index(col)
        mins = [md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)]
        out.append((min(mins), max(maxs)))
    return out


def _avg_norm_range(spans, lo, hi):
    width = max(hi - lo, 1)
    return sum((mx - mn) / width for mn, mx in spans) / len(spans)


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """Write the same data (a) sorted on one key and (b) Z-ordered on
    (l_partkey, l_suppkey); footer min/max boxes of the Z-layout must
    be tight on BOTH keys — the data-skipping property one-column
    sorting cannot give. Single-key sort leaves the OTHER column's
    per-file range near 100%; the Morton layout bounds both."""
    from wilayah_aceh_etl_spark.functions.zorder import (
        morton_interleave,
        quantize_minmax,
    )

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    bounds = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    row = bounds.head()
    pmin, pmax, smin, smax = row.pmin, row.pmax, row.smin, row.smax

    naive = str(tmp_path / "naive")
    (
        li.repartitionByRange(8, F.col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(naive)
    )

    zed = str(tmp_path / "zorder")
    z = li.crossJoin(F.broadcast(bounds)).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        morton_interleave(
            quantize_minmax(F.col("l_partkey"), F.col("pmin"), F.col("pmax"), 8),
            quantize_minmax(F.col("l_suppkey"), F.col("smin"), F.col("smax"), 8),
            8,
        ).alias("zval"),
    )
    (
        z.repartitionByRange(8, F.col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(zed)
    )

    n_part_naive = _avg_norm_range(_file_minmax(naive, "l_partkey"), pmin, pmax)
    n_supp_naive = _avg_norm_range(_file_minmax(naive, "l_suppkey"), smin, smax)
    n_part_z = _avg_norm_range(_file_minmax(zed, "l_partkey"), pmin, pmax)
    n_supp_z = _avg_norm_range(_file_minmax(zed, "l_suppkey"), smin, smax)

    # single-key sort: tight on partkey, useless on suppkey
    assert n_part_naive < 0.35
    assert n_supp_naive > 0.8
    # z-order: meaningfully bounded on BOTH keys
    assert n_part_z < 0.6
    assert n_supp_z < 0.6
    # the property z-order buys is BALANCE: for a workload filtering
    # on either column, worst-case and average files-scanned both
    # drop (a single-key sort stays optimal only for single-key
    # workloads — that trade is the point, and it's measured here)
    assert max(n_part_z, n_supp_z) < max(n_part_naive, n_supp_naive)
    assert (n_part_z + n_supp_z) / 2 < (n_part_naive + n_supp_naive) / 2
