"""Interchange-format round-trips: schema fidelity, value equality,
and pushdown/pruning behavior per format (sources/formats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wilayah_aceh_etl_spark.sources.formats import read_table, write_table
from wilayah_aceh_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_SMOKE, "orders")


@pytest.mark.parametrize("fmt", ["csv", "json", "xml", "orc", "parquet"])
def test_roundtrip_exact(spark, tmp_path, orders, fmt):
    path = str(tmp_path / f"orders_{fmt}")
    write_table(orders, path, fmt)
    back = read_table(spark, path, fmt, schema=orders.schema)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0


def test_text_formats_require_schema(spark, tmp_path, orders):
    path = str(tmp_path / "orders_csv_noschema")
    write_table(orders, path, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, "csv")


@pytest.mark.parametrize("fmt", ["orc", "parquet"])
def test_columnar_pushdown_reaches_scan(spark, tmp_path, orders, fmt):
    path = str(tmp_path / f"orders_push_{fmt}")
    write_table(orders, path, fmt)
    df = (
        read_table(spark, path, fmt)
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_totalprice")
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan
    assert "o_orderkey" in plan.split("PushedFilters")[1].splitlines()[0]
    # column pruning: the scan's ReadSchema carries only the 2 columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_orderstatus" not in read_schema


@pytest.mark.parametrize("fmt", ["csv", "json", "xml"])
def test_text_column_pruning(spark, tmp_path, orders, fmt):
    path = str(tmp_path / f"orders_prune_{fmt}")
    write_table(orders, path, fmt)
    df = read_table(spark, path, fmt, schema=orders.schema).select("o_orderkey")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" not in read_schema


def test_unsupported_format_rejected(spark, orders, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(orders, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, str(tmp_path / "x"), "avro")


def test_variant_column_roundtrips_through_parquet(spark, tmp_path):
    """Spark 4 can persist VARIANT columns in parquet: the binary
    encoding survives the round trip and typed extraction still works
    — the storage story for ragged semi-structured columns."""
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "events").limit(200)
    path = str(tmp_path / "events_variant")
    e.select(
        "event_id", F.parse_json(F.col("props")).alias("props_v")
    ).write.mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    assert back.schema["props_v"].dataType.typeName() == "variant"
    got = {
        r.event_id: r.k
        for r in back.select(
            "event_id",
            F.try_variant_get(F.col("props_v"), "$.k", "int").alias("k"),
        ).collect()
    }
    want = {
        r.event_id: r.k
        for r in e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        ).collect()
    }
    assert got == want and len(got) == 200
