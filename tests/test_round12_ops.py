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


def test_curation_funnel_reconciles_with_policy_cells(spark):
    """Each policy's surviving mass must equal the corresponding
    cell-sum of the derived-C policy audit (raw = all four cells,
    minhash = the minhash_keep=1 margin, semantic = the
    semantic_keep=1 margin, both = the (1,1) cell), and every row's
    budget arithmetic must satisfy the exact identities
    d_opt = 20·n_params, tokens_short = max(0, d_opt − surviving),
    epochs_needed = round(d_opt / surviving, 4)."""
    from wilayah_aceh_etl_spark.plans.round12_queries import (
        curation_funnel_data_budget,
        dedup_policy_agreement_audit_derived_c,
    )

    cells = dedup_policy_agreement_audit_derived_c(
        spark, SF_SMOKE
    ).collect()
    rows = curation_funnel_data_budget(spark, SF_SMOKE).collect()

    def mass(pred):
        sel = [c for c in cells if pred(c)]
        return (
            sum(c.n_docs for c in sel),
            sum(c.tokens for c in sel),
        )

    expected = {
        "raw": mass(lambda c: True),
        "minhash": mass(lambda c: c.minhash_keep == 1),
        "semantic": mass(lambda c: c.semantic_keep == 1),
        "both": mass(
            lambda c: c.minhash_keep == 1 and c.semantic_keep == 1
        ),
    }
    # all four policies non-empty at the smoke SF -> 4 x 4 grid
    assert len(rows) == 16
    for r in rows:
        assert (r.surviving_docs, r.surviving_tokens) == expected[
            r.policy
        ]
        assert r.d_opt_tokens == 20 * r.n_params
        assert r.tokens_short == max(
            0, r.d_opt_tokens - r.surviving_tokens
        )
        assert abs(
            r.epochs_needed - r.d_opt_tokens / r.surviving_tokens
        ) <= 1e-4
    # the funnel is monotone: each added policy removes mass
    tok = {r.policy: r.surviving_tokens for r in rows}
    assert tok["raw"] >= tok["minhash"] >= tok["both"]
    assert tok["raw"] >= tok["semantic"] >= tok["both"]


def test_distinct2_crosscheck_reconciles_with_parents(spark):
    """The before-side must equal the exact diversity audit's n=2
    rows source-for-source; the after-side must equal the same
    aggregate recomputed over documents NOT in the MinHash
    removed-set; distinct_after ≤ distinct_before (removing docs
    cannot add gram types) and grams removed must be nonnegative."""
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        _minhash_removed_ids,
        text_distinct_ngram_diversity,
    )
    from wilayah_aceh_etl_spark.plans.round12_queries import (
        text_distinct2_dedup_crosscheck,
    )
    from wilayah_aceh_etl_spark.sources.tables import load_table

    rows = {
        r.source: r
        for r in text_distinct2_dedup_crosscheck(spark, SF_SMOKE).collect()
    }
    exact_n2 = {
        r.source: (r.n_grams, r.n_distinct)
        for r in text_distinct_ngram_diversity(spark, SF_SMOKE).collect()
        if r.n == 2
    }
    assert set(rows) == set(exact_n2)
    for src, r in rows.items():
        assert (r.grams_before, r.distinct_before) == exact_n2[src]
        assert r.distinct_after <= r.distinct_before
        assert 0 <= r.grams_after <= r.grams_before
        assert r.gram_mass_removed_ppm >= 0

    docs = load_table(spark, SF_SMOKE, "documents")
    removed = {r.doc_id for r in _minhash_removed_ids(docs).collect()}
    kept_docs = docs.filter(~F.col("doc_id").isin(list(removed)))
    w = kept_docs.select(
        "source", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 2)
    after = {
        r.source: (r.g, r.d)
        for r in w.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> array_join(slice(w, i, 2), ' '))"
                )
            ).alias("gram"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("g"),
            F.countDistinct("gram").alias("d"),
        )
        .collect()
    }
    for src, r in rows.items():
        assert (r.grams_after, r.distinct_after) == after.get(src, (0, 0))


def test_distinct2_semdedup_crosscheck_reconciles(spark):
    """The SemDeDup sibling's before-side must equal the bigram
    aggregate over the EMBEDDED universe (documents ⋈ embeddings),
    its after-side must equal the same aggregate over the derived-C
    keep-set, and — since its universe is a subset of the MinHash
    sibling's full corpus — its per-source before mass can never
    exceed the MinHash table's."""
    from wilayah_aceh_etl_spark.operators import similarity as S
    from wilayah_aceh_etl_spark.plans.round12_queries import (
        _doc_bigrams,
        text_distinct2_dedup_crosscheck,
        text_distinct2_semdedup_crosscheck,
    )
    from wilayah_aceh_etl_spark.sources.tables import load_table

    rows = {
        r.source: r
        for r in text_distinct2_semdedup_crosscheck(
            spark, SF_SMOKE
        ).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings")
    sd = S.semantic_dedup(
        emb,
        threshold=0.35,
        n_centroids=None,
        n_iter=2,
        target_cluster_size=16,
    ).select(F.col("vec_id").alias("doc_id"), "keep")
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "source", "text")
        .join(sd.select("doc_id"), "doc_id")
    )

    def agg(bg):
        return {
            r.source: (r.g, r.d)
            for r in bg.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("g"),
                F.countDistinct("gram").alias("d"),
            )
            .collect()
        }

    before = agg(_doc_bigrams(docs))
    kept = docs.join(
        sd.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    after = agg(_doc_bigrams(kept))
    assert set(rows) == set(before)
    for src, r in rows.items():
        assert (r.grams_before, r.distinct_before) == before[src]
        assert (r.grams_after, r.distinct_after) == after.get(
            src, (0, 0)
        )
        assert r.distinct_after <= r.distinct_before

    mh = {
        r.source: r.grams_before
        for r in text_distinct2_dedup_crosscheck(
            spark, SF_SMOKE
        ).collect()
    }
    for src, r in rows.items():
        assert r.grams_before <= mh[src]
