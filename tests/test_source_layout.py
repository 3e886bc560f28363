"""Source-layout behaviors a 100 TB lake depends on: schema
evolution across write batches, and partition pruning reaching the
file listing (the engine's replacement for the reference's B-tree on
`level`, SURVEY §4 X1)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_schema_evolution_mergeschema(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[3] == 9.5 and rows[1] is None  # old rows null-filled

    # without mergeSchema one footer wins — both reads must still work
    assert spark.read.parquet(path).count() == 3


def test_partition_pruning_reaches_listing(spark, tmp_path):
    path = str(tmp_path / "by_level")
    df = spark.createDataFrame(
        [(f"11.{i:02d}", i % 4 + 1) for i in range(40)],
        "kode string, level int",
    )
    df.write.partitionBy("level").mode("overwrite").parquet(path)

    q = spark.read.parquet(path).filter(F.col("level") == 2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "level" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "level filter must prune at listing time"
    # pruned read touches only the level=2 directory
    files = {r[0] for r in q.select(F.input_file_name()).distinct().collect()}
    assert files and all("level=2" in f for f in files)


def test_range_sorted_write_files_are_disjoint(spark, tmp_path):
    """write_range_sorted: per-file key ranges are disjoint and
    globally ordered, so footer min/max prunes range predicates."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from wilayah_aceh_etl_spark.sources.maintenance import write_range_sorted
    from wilayah_aceh_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_range_sorted")
    write_range_sorted(orders, path, ("o_orderkey",), num_files=8)

    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0

    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("lo")
        .collect()
    )
    assert len(per_file) > 1
    for prev, cur in zip(per_file, per_file[1:]):
        assert prev.hi < cur.lo  # disjoint AND globally ordered


def test_shuffle_hash_hint_controls_strategy(spark):
    """join_hint_shuffle_hash: the hint overrides the broadcast
    default and yields a ShuffledHashJoin."""
    import io
    from contextlib import redirect_stdout

    from tests.conftest import SF_SMOKE
    from wilayah_aceh_etl_spark.plans.analytics import join_hint_shuffle_hash

    df = join_hint_shuffle_hash(spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    assert "ShuffledHashJoin" in buf.getvalue()


def test_zorder_layout_bounds_files_in_both_dims(spark, tmp_path):
    """Z-order vs linear sort: a linear sort on x packs x tightly
    but every file spans the FULL y range, so a y-only filter prunes
    nothing. Z-ordering bounds each file in BOTH dimensions — the
    per-dim normalized min/max spans from the parquet footers are
    what pruning actually uses."""
    import os

    import pyarrow.parquet as pq

    from wilayah_aceh_etl_spark.sources.maintenance import (
        write_range_sorted,
        write_zordered,
    )

    n = 1 << 14
    side = 1 << 7
    df = (
        spark.range(n)
        .select(
            (F.col("id") % side).alias("x"),
            (F.col("id") / side).cast("long").alias("y"),
        )
        # shuffle the input so neither layout gets accidental order
        .orderBy(F.md5(F.col("id").cast("string")))
    )
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zordered")
    write_range_sorted(df, linear, ("x",), num_files=16)
    write_zordered(df, zordered, ("x", "y"), num_files=16)

    def mean_spans(path):
        spans = {"x": [], "y": []}
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        mn, mx = col.statistics.min, col.statistics.max
                        lo[name] = mn if lo[name] is None else min(lo[name], mn)
                        hi[name] = mx if hi[name] is None else max(hi[name], mx)
            for d in ("x", "y"):
                spans[d].append((hi[d] - lo[d] + 1) / side)
        return {d: sum(v) / len(v) for d, v in spans.items()}

    lin = mean_spans(linear)
    z = mean_spans(zordered)
    # Linear: x tightly packed, y unbounded (≈ full range per file).
    assert lin["x"] <= 0.25, lin
    assert lin["y"] >= 0.9, lin
    # Z-order: BOTH dims bounded — y at least 2× tighter than the
    # linear layout's, x still far from full-range.
    assert z["y"] <= lin["y"] / 2, (z, lin)
    assert z["x"] <= 0.75, z
