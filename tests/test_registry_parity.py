"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This is the in-repo twin of the driver's CORRECTNESS gate (the
driver runs sf0.01; tools/parity.py replicates that scale locally).

Default collection runs the PARITY CORE — the driver's current gate
window (GATE_PRIORITY, what CORRECTNESS_r13 will actually check),
every bench-tagged query, and the operator families this
optimization round touches (dedup / semantic / similarity / dsir) —
so the driver's verify completes inside its window (r12 VERDICT ask
#2: the 511-way sweep pushed the suite to ~27 min and the verify was
cut off mid-run). The complete 511-query sweep stays available as
the pre-commit battery: `pytest --full` or SPARK_GRAFT_FULL_TESTS=1,
and tools/parity.py runs it standalone at any SF.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.parity import _canon
from wilayah_aceh_etl_spark.plans.registry import GATE_PRIORITY, all_specs

SPECS = all_specs()

_CORE_TAGS = {"dedup", "semantic", "semdedup", "similarity", "ivf", "dsir"}
PARITY_CORE = set(GATE_PRIORITY) | {
    n
    for n, s in SPECS.items()
    if s.bench or (_CORE_TAGS & set(getattr(s, "tags", ()) or ()))
}


@pytest.mark.parametrize(
    "name",
    [
        n if n in PARITY_CORE else pytest.param(n, marks=pytest.mark.full)
        for n in sorted(SPECS)
    ],
)
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert sdf is not None
        return
    odf = duck.sql(spec.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column sets differ"
    )
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} != {len(odf)}"
    assert _canon(sdf) == _canon(odf), f"{name}: value mismatch"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_registry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) >= 10
    assert set(o) <= set(q)
