"""Round-12 query family: the r11 verdict's asks, composed from
existing machinery (compose-don't-build, third round running).

Members:
  * dedup_policy_agreement_audit_derived_c — the policy-agreement
    audit's PRODUCTION (C ∝ N) twin (verdict ask #2): the MinHash ×
    SemDeDup 2×2 contingency with the semantic side at the derived-C
    configuration, so the policy comparison's production shape is
    driver-visible exactly as the chain audit's became in round 11.

Everything reuses ONE-copy machinery: _policy_agreement_frame /
_minhash_chain_sql / _POLICY_AGREEMENT_TAIL (round11_queries),
_semdedup_derived_c_prelude (round10_queries), and semantic_dedup
with its per-corpus memo. Zero new numeric code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wilayah_aceh_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Policy-agreement audit at the derived-C production configuration
# (the r11 verdict ask #2): same 2×2 contingency, the SemDeDup side
# at C = max(16, ceil(n/16)).
# ---------------------------------------------------------------------------


def _policy_agreement_derived_c_oracle() -> str:
    from wilayah_aceh_etl_spark.plans.round10_queries import (
        _semdedup_derived_c_prelude,
    )
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        _POLICY_AGREEMENT_TAIL,
        _minhash_chain_sql,
    )

    return (
        _semdedup_derived_c_prelude(16)
        + _minhash_chain_sql()
        + _POLICY_AGREEMENT_TAIL
    )


@register(
    "dedup_policy_agreement_audit_derived_c",
    oracle=_policy_agreement_derived_c_oracle(),
    tags=(
        "ext",
        "dedup",
        "minhash",
        "semdedup",
        "audit",
        "curation",
        "derived-c",
    ),
    description="MinHash keep-set × SemDeDup keep-set 2×2 agreement "
    "contingency at the derived-C production configuration "
    "(C = max(16, ceil(n/16)))",
)
def dedup_policy_agreement_audit_derived_c(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The policy-agreement audit (see dedup_policy_agreement_audit)
    with the semantic side at the PRODUCTION SemDeDup configuration —
    C derived from the corpus (C = max(16, ⌈n/16⌉); C = 32/32/125
    across the test SFs), the C ∝ N path that keeps per-cluster pair
    work constant as data grows. The fixed-C=16 sibling's
    gate-exercised shape inherits the oracle-pinned quadratic the
    decade probes price (SCALE.md §9f); this twin makes the policy
    comparison's scale shape driver-visible too: both the Spark
    pipeline and the DuckDB oracle re-derive C from COUNT(*), train
    Lloyd at that C, and cross the resulting keep-set with the SAME
    MinHash keep-set — one _policy_agreement_frame, one
    _POLICY_AGREEMENT_TAIL, two configurations (the
    _chain_audit_frame pattern, round 11).

    Determinism: identical to the fixed-C audit (shared SQL tail,
    shared DataFrame pipeline); only the cluster count differs. The
    MinHash side is byte-identical in both twins — the 2×2 minhash
    margins must agree across configurations
    (tests/test_round12_ops.py reconciles both margins and the
    fixed-vs-derived minhash marginal identity).

    Scale shape: the MinHash side is the banded-LSH candidate join
    (never all-pairs); the semantic side's cid equi-join pair work is
    Σ|cluster|² with |cluster| ≈ 16 held constant by the derived C —
    linear in N where the fixed-C form grows quadratically. The
    audit's own additions (one doc_id equi-join, ≤4-row aggregate,
    4-row window) are unchanged."""
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        _policy_agreement_frame,
    )

    return _policy_agreement_frame(
        spark,
        sf_dir,
        n_centroids=None,
        target_cluster_size=16,
        cache_key=f"{sf_dir}#derived16",
    )
