"""Plan-quality pinning: compiling every registered query must not
introduce scale anti-patterns (tools/explain_audit.py as a test).

Whitelisted exceptions are the documented brute-force baselines and
the IVF centroid-assignment broadcast product (SCALE.md §4).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_SMOKE
from wilayah_aceh_etl_spark.plans.registry import all_specs

# documented non-equi shapes (SCALE.md §4)
NLJ_ALLOWED = {
    "similarity_topk_bruteforce",
    "similarity_threshold_pairs",
    "similarity_ivf_topk",
    # broadcast of a single-row global-total aggregate: the build side is
    # exactly 1 row regardless of data size, so the NLJ is O(buckets)
    "data_mixture_rates",
    "text_unigram_logprob",
    "tpch_q22_idle_rich_customers",
    # k-row centroid broadcast (k=16): nearest-centroid assignment is
    # definitionally all-vectors × all-centroids; build side is O(k)
    "embedding_kmeans_iteration",
}


def _plan(spark, df) -> str:
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain()
        return buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_no_plan_antipatterns(spark, name):
    spec = all_specs()[name]
    plan = _plan(spark, spec.fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in NLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join crept in"
        )
