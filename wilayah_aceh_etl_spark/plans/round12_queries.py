"""Round-12 query family: the r11 verdict's asks, composed from
existing machinery (compose-don't-build, third round running).

Members:
  * dedup_policy_agreement_audit_derived_c — the policy-agreement
    audit's PRODUCTION (C ∝ N) twin (verdict ask #2): the MinHash ×
    SemDeDup 2×2 contingency with the semantic side at the derived-C
    configuration, so the policy comparison's production shape is
    driver-visible exactly as the chain audit's became in round 11.
  * text_distinct_ngram_diversity_hll — the distinct-n diversity
    metric's 100-TB form (verdict ask #4): per-source
    approx_count_distinct over the same gram relation,
    guarantee-audited against the exact count in ONE aggregate pass
    (the r7 approx_distinct_rsd_audit gate pattern).

Everything reuses ONE-copy machinery: _policy_agreement_frame /
_minhash_chain_sql / _POLICY_AGREEMENT_TAIL / _ngram_grams_frame /
_NGRAM_GRAMS_SQL (round11_queries), _semdedup_derived_c_prelude
(round10_queries), and semantic_dedup with its per-corpus memo.
Zero new numeric code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Distinct-n diversity, HLL form (the r11 verdict ask #4): the
# 100-TB shape of the metric, guarantee-audited against exact.
# ---------------------------------------------------------------------------


def _distinct_ngram_hll_oracle() -> str:
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        _NGRAM_GRAMS_SQL,
    )

    return (
        _NGRAM_GRAMS_SQL
        + """
SELECT source, n,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct_exact,
       TRUE AS within_5x_rsd
FROM grams GROUP BY source, n ORDER BY source, n
"""
    )


@register(
    "text_distinct_ngram_diversity_hll",
    oracle=_distinct_ngram_hll_oracle(),
    tags=("ext", "text", "diversity", "ngram", "sketch", "hll", "audit"),
    description="distinct-n diversity per source via "
    "approx_count_distinct, guarantee-audited within 5x the "
    "advertised rsd of the exact count",
)
def text_distinct_ngram_diversity_hll(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The distinct-n diversity metric at its 100-TB configuration:
    per (source, n), the unique-gram count estimated by
    HyperLogLog++ (approx_count_distinct at rsd 0.01) instead of the
    exact (source, n, gram) type table — the exact sibling
    (text_distinct_ngram_diversity) must shuffle every distinct
    n-gram STRING to its reducer, while the HLL form reduces each
    partition to a fixed-size sketch and shuffles only
    |sources|×3×O(KB) sketch bytes, the same exact→mergeable-sketch
    trade the r6/r7 approx_distinct family registers for key counts.

    Oracle-gated guarantee (the approx_distinct_rsd_audit pattern,
    round7_queries.py): HLL++ has no hard error bound, but a
    deterministic dataset gives a deterministic estimate, so
    'estimate within 5× the advertised rsd of exact' is a stable
    gate — the DuckDB oracle re-derives the exact count and pins the
    flag literally TRUE; the Spark side computes exact AND estimate
    in the SAME aggregate pass (two agg expressions, one shuffle)
    and emits the comparison. A sketch-implementation regression
    flips the flag and the driver row goes red. In production the
    exact expression is dropped and only the sketch aggregates run;
    this registered form carries both BECAUSE it is the audit.

    Determinism: gram strings, counts, and the exact distinct are
    the exact sibling's; the estimate enters only the boolean gate.

    Scale shape: one gram relation (shared _ngram_grams_frame — gram
    strings on the wire, never bodies), one hash aggregate; the HLL
    column is what makes the metric computable when the type table
    itself stops fitting anywhere."""
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        _ngram_grams_frame,
    )

    g = (
        _ngram_grams_frame(spark, sf_dir)
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.countDistinct("gram")
            .cast("long")
            .alias("n_distinct_exact"),
            F.approx_count_distinct("gram", 0.01).alias("_est"),
        )
    )
    ok = (
        F.abs(F.col("_est") - F.col("n_distinct_exact"))
        <= 0.05 * F.col("n_distinct_exact")
    )
    return g.select(
        "source",
        "n",
        "n_grams",
        "n_distinct_exact",
        ok.alias("within_5x_rsd"),
    ).orderBy("source", "n")
