from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_addoption(parser):
    parser.addoption(
        "--full",
        action="store_true",
        default=False,
        help="run the FULL battery (the complete 511-query parity "
        "sweep and the other full-marked slow tests). Equivalent: "
        "SPARK_GRAFT_FULL_TESTS=1.",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: full-battery tests (complete parity sweep, slow "
        "end-to-end batteries). Deselected by default so the "
        "driver's verify window can finish; run with --full or "
        "SPARK_GRAFT_FULL_TESTS=1 (the pre-commit battery).",
    )


def _run_full(config) -> bool:
    return bool(
        config.getoption("--full")
        or os.environ.get("SPARK_GRAFT_FULL_TESTS")
    )


def pytest_collection_modifyitems(config, items):
    # The r12 driver verify was cut off mid-suite: 1337 tests at
    # ~27 min no longer fit the verify window (VERDICT r12, ask #2).
    # Default collection DESELECTS full-marked items (they still run
    # in the pre-commit battery via --full); the default set keeps
    # every focused operator test plus a parity core (driver gate
    # window + bench set + this round's touched families).
    if _run_full(config):
        return
    selected = [i for i in items if "full" not in i.keywords]
    deselected = [i for i in items if "full" in i.keywords]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected


@pytest.fixture(scope="session")
def spark():
    from wilayah_aceh_etl_spark.session import get_spark

    spark = get_spark("tests", master="local[8]")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from wilayah_aceh_etl_spark.sources.tables import STAR_TABLES

    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
