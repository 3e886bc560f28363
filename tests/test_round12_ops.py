"""Round-12 operators: the derived-C policy-agreement audit — the
properties its oracle cannot express (marginal reconciliation with
BOTH parents at the derived configuration, the fixed-vs-derived
minhash-marginal identity, and non-vacuity of the derived C)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_policy_agreement_derived_c_marginals_and_identity(spark):
    """The derived-C 2×2 cells must (a) marginalize EXACTLY to the
    derived-C semantic_dedup keep count, (b) carry a minhash margin
    IDENTICAL to the fixed-C twin's (the MinHash side is
    byte-identical in both configurations), (c) partition the
    embedded-document universe with ppm shares summing to 10⁶ per
    axis (±rounding), and (d) actually run at the derived C — the
    derived-C semantic keep verdicts must come from > 16 clusters at
    sf0.001 with target 16, else the driver row silently re-verifies
    the fixed-C audit."""
    from wilayah_aceh_etl_spark.operators import similarity as S
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        dedup_policy_agreement_audit,
    )
    from wilayah_aceh_etl_spark.plans.round12_queries import (
        dedup_policy_agreement_audit_derived_c,
    )
    from wilayah_aceh_etl_spark.sources.tables import load_table

    cells = dedup_policy_agreement_audit_derived_c(
        spark, SF_SMOKE
    ).collect()
    assert 1 <= len(cells) <= 4

    # (d) non-vacuity: the derived configuration trains > 16 clusters
    sd = S.semantic_dedup(
        load_table(spark, SF_SMOKE, "embeddings"),
        threshold=0.35,
        n_centroids=None,
        n_iter=2,
        target_cluster_size=16,
    )
    n_clusters = sd.select("cid").distinct().count()
    assert n_clusters > 16, (n_clusters, "expected C=32 clusters")

    # (a) semantic margin == the derived-C parent's own keep count
    sem_kept = sd.agg(F.sum("keep")).collect()[0][0]
    assert (
        sum(c.n_docs for c in cells if c.semantic_keep == 1) == sem_kept
    )

    # (b) minhash margin identical to the fixed-C twin (same MinHash
    # side byte-for-byte), on BOTH the doc-count and token axes
    fixed = dedup_policy_agreement_audit(spark, SF_SMOKE).collect()

    def margins(rows):
        return {
            mk: (
                sum(c.n_docs for c in rows if c.minhash_keep == mk),
                sum(c.tokens for c in rows if c.minhash_keep == mk),
            )
            for mk in (0, 1)
        }

    assert margins(cells) == margins(fixed)

    # (c) same universe as the fixed twin; ppm axes sum to 10⁶
    assert sum(c.n_docs for c in cells) == sum(c.n_docs for c in fixed)
    assert abs(sum(c.doc_share_ppm for c in cells) - 1_000_000) <= len(
        cells
    )
    assert abs(
        sum(c.token_share_ppm for c in cells) - 1_000_000
    ) <= len(cells)


def test_distinct_ngram_hll_reconciles_with_exact_sibling(spark):
    """The HLL twin's exact column must equal the exact sibling's
    distinct counts row-for-row (same shared gram relation, same
    aggregate keys), every guarantee flag must hold on the test
    corpus, and the grid must be |sources| × 3 n-gram orders."""
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        text_distinct_ngram_diversity,
    )
    from wilayah_aceh_etl_spark.plans.round12_queries import (
        text_distinct_ngram_diversity_hll,
    )

    hll = {
        (r.source, r.n): (r.n_grams, r.n_distinct_exact, r.within_5x_rsd)
        for r in text_distinct_ngram_diversity_hll(
            spark, SF_SMOKE
        ).collect()
    }
    exact = {
        (r.source, r.n): (r.n_grams, r.n_distinct)
        for r in text_distinct_ngram_diversity(spark, SF_SMOKE).collect()
    }
    assert set(hll) == set(exact)
    n_sources = len({s for s, _ in exact})
    assert len(exact) == 3 * n_sources
    for key, (ng, nd, ok) in hll.items():
        assert (ng, nd) == exact[key]
        assert ok is True
