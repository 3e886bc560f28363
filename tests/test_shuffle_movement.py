"""Measured-movement pins (the test twin of tools/shuffle_audit.py).

`.explain` proves plan shape; these tests pin the BYTES that actually
cross shuffle boundaries, so a regression that silently reintroduces
a fact-side shuffle (e.g. a broadcast hint lost in a refactor) fails
loudly rather than only showing up at cluster scale.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from wilayah_aceh_etl_spark.plans.registry import all_specs


def _run_measured(spark, name: str) -> dict[str, int]:
    from tools.shuffle_audit import _job_stage_metrics

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup(name, name)
    try:
        all_specs()[name].fn(spark, SF_SMOKE).collect()
    finally:
        sc.setJobGroup(None, None)
    after = set(tracker.getJobIdsForGroup(None) or []) | set(
        tracker.getJobIdsForGroup(name) or []
    )
    return _job_stage_metrics(spark, sorted(after - before))


@pytest.mark.parametrize(
    "name,max_shuffle_write",
    [
        # star join: every dim broadcasts and AQE demotes the fact
        # join too at this scale — only the final tiny aggregate may
        # exchange. 64 KB is ~100× headroom over the observed 432 B.
        ("join_revenue_by_nation", 64 * 1024),
        # scan→filter→aggregate: the shuffle carries per-partition
        # aggregate partials (a few groups × a few columns), never
        # input rows.
        ("agg_pricing_summary", 64 * 1024),
        ("tpch_q6_forecast_revenue", 64 * 1024),
    ],
)
def test_shuffle_write_stays_aggregate_sized(spark, name, max_shuffle_write):
    m = _run_measured(spark, name)
    assert m["shuffle_write"] <= max_shuffle_write, (
        f"{name}: shuffle wrote {m['shuffle_write']}B — a fact-side "
        f"shuffle crept back in (bound {max_shuffle_write}B)"
    )


def test_no_spill_across_bench_set(spark):
    """At smoke scale nothing may spill; spill here means a grossly
    mis-sized partition or an accidental single-partition sort."""
    specs = all_specs()
    for name, spec in specs.items():
        if not spec.bench:
            continue
        m = _run_measured(spark, name)
        assert m["spill_bytes"] == 0, f"{name}: spilled {m['spill_bytes']}B"
