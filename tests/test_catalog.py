"""Managed-table catalog surface (SURVEY S6: spark.table(...)).

The engine's tables elsewhere are path-addressed parquet; this pins
the catalog-addressed form: saveAsTable into a database with an
explicit location, spark.table() resolution, partition pruning on
the managed layout, and insertInto append semantics."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wilayah_aceh_etl_spark.sources.tables import load_table


@pytest.fixture()
def catalog_db(spark, tmp_path):
    db = "t_cat"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path / 'warehouse'}'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_save_as_table_and_resolution(spark, catalog_db):
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.write.partitionBy("o_orderstatus").saveAsTable(f"{catalog_db}.orders")

    t = spark.table(f"{catalog_db}.orders")
    assert t.count() == orders.count()
    assert set(t.columns) == set(orders.columns)

    # partition pruning reaches the managed layout
    buf = io.StringIO()
    with redirect_stdout(buf):
        t.filter(F.col("o_orderstatus") == "F").explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan

    # catalog metadata is queryable
    names = {r.tableName for r in spark.sql(f"SHOW TABLES IN {catalog_db}").collect()}
    assert "orders" in names


def test_insert_into_appends(spark, catalog_db):
    nation = load_table(spark, SF_SMOKE, "nation")
    nation.write.saveAsTable(f"{catalog_db}.nation")
    n0 = spark.table(f"{catalog_db}.nation").count()
    nation.limit(5).write.insertInto(f"{catalog_db}.nation")
    assert spark.table(f"{catalog_db}.nation").count() == n0 + 5
