"""Round-11 operators: the derived-C chain audit, the dedup-policy
agreement audit, the critical-batch schedule, distinct-n diversity,
and the Chinchilla data budget — the properties their oracles cannot
express (consistency with the parent pipelines, exact-integer
ceiling identities, marginal reconciliation)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_chain_audit_derived_c_consistent_and_derived(spark):
    """The derived-C audit must (a) reconcile with the derived-C
    dedup's own keep verdicts, (b) partition the removed set into
    via-kept + chain-only, and (c) actually run at the derived C
    (> 16 clusters at sf0.001 with target 16) — otherwise the
    driver row would silently re-verify the fixed-C audit."""
    from wilayah_aceh_etl_spark.operators import similarity as S
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        dedup_semantic_chain_audit_derived_c,
    )
    from wilayah_aceh_etl_spark.sources.tables import load_table

    rows = dedup_semantic_chain_audit_derived_c(spark, SF_SMOKE).collect()
    assert len(rows) > 16, (len(rows), "expected C=32 clusters")
    sd = S.semantic_dedup(
        load_table(spark, SF_SMOKE, "embeddings"),
        threshold=0.35,
        n_centroids=None,
        n_iter=2,
        target_cluster_size=16,
    )
    agg = sd.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("keep").alias("k")
    ).collect()[0]
    assert sum(r.n_members for r in rows) == agg.n
    assert sum(r.n_kept for r in rows) == agg.k
    for r in rows:
        assert r.n_removed == r.n_removed_via_kept + r.n_removed_chain_only
        assert r.n_removed_via_kept >= 0 and r.n_removed_chain_only >= 0


def test_policy_agreement_marginals_match_parents(spark):
    """The 2×2 cells must marginalize EXACTLY to the two parent
    pipelines' verdicts over the embedded-document universe: the
    semantic margin to semantic_dedup's keep count, the minhash
    margin to the distinct larger-id endpoints of the verified
    near-dup pairs, and the ppm shares to 10⁶ per axis (±rounding)."""
    from wilayah_aceh_etl_spark.operators import dedup as D
    from wilayah_aceh_etl_spark.operators import similarity as S
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        dedup_policy_agreement_audit,
    )
    from wilayah_aceh_etl_spark.sources.tables import load_table

    cells = dedup_policy_agreement_audit(spark, SF_SMOKE).collect()
    assert 1 <= len(cells) <= 4
    emb_ids = {
        r.vec_id
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id")
        .collect()
    }

    sd = S.semantic_dedup(
        load_table(spark, SF_SMOKE, "embeddings"),
        threshold=0.35,
        n_centroids=16,
        n_iter=2,
    )
    sem_kept = sd.agg(F.sum("keep")).collect()[0][0]
    assert (
        sum(c.n_docs for c in cells if c.semantic_keep == 1) == sem_kept
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    removed_m = {
        r.doc_b
        for r in D.verified_near_dup_pairs(docs, threshold=0.5)
        .select("doc_b")
        .distinct()
        .collect()
    } & emb_ids
    assert sum(
        c.n_docs for c in cells if c.minhash_keep == 0
    ) == len(removed_m)

    assert sum(c.n_docs for c in cells) == len(emb_ids & {
        r.doc_id for r in docs.select("doc_id").collect()
    })
    assert abs(sum(c.doc_share_ppm for c in cells) - 1_000_000) <= len(
        cells
    )
    assert abs(sum(c.token_share_ppm for c in cells) - 1_000_000) <= len(
        cells
    )


def test_critical_batch_schedule_identities(spark):
    """Exact-integer identities the schedule is built from:
    b_critical = max(1, ⌈b_simple⌉) (ceiling of the EXACT ratio, so
    b_simple < b_critical ≤ b_simple + 1 up to the 1e-6 emission
    rounding), tokens_per_step = b_critical·ctx, each steps-per-
    epoch a true ceiling division, and consistency with both parent
    queries' own outputs."""
    from wilayah_aceh_etl_spark.plans.round10_queries import (
        training_gradient_noise_scale,
        training_packing_efficiency,
    )
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        training_critical_batch_schedule,
    )

    rows = training_critical_batch_schedule(spark, SF_SMOKE).collect()
    assert [r.ctx_len for r in rows] == [128, 512, 2048]
    gns = training_gradient_noise_scale(spark, SF_SMOKE).collect()[0]
    pk = {
        r.ctx_len: r
        for r in training_packing_efficiency(spark, SF_SMOKE).collect()
    }
    for r in rows:
        assert r.b_simple == gns.b_simple
        assert r.b_critical == max(1, math.ceil(r.b_simple - 1e-6))
        assert r.tokens_per_step == r.b_critical * r.ctx_len
        assert r.n_seq_padded == pk[r.ctx_len].n_seq_padded
        assert r.n_seq_packed == pk[r.ctx_len].n_seq_packed
        assert r.total_tokens == pk[r.ctx_len].total_tokens
        assert r.steps_per_epoch_padded == -(
            -r.n_seq_padded // r.b_critical
        )
        assert r.steps_per_epoch_packed == -(
            -r.n_seq_packed // r.b_critical
        )
        assert r.steps_per_epoch_packed <= r.steps_per_epoch_padded


def test_distinct_ngram_identities(spark):
    """Exact identities the diversity oracle cannot express as a
    property: the n=1 gram total equals the corpus token count; each
    higher order loses exactly one gram per qualifying doc; distinct
    never exceeds total; ppm is the single rounded division."""
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        text_distinct_ngram_diversity,
    )
    from wilayah_aceh_etl_spark.sources.tables import load_table

    rows = text_distinct_ngram_diversity(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", F.size(F.split("text", " ")).alias("len")
    )
    by_src = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.sum("len").alias("tok"),
            F.sum(F.when(F.col("len") >= 2, F.col("len") - 1).otherwise(0)).alias("bi"),
            F.sum(F.when(F.col("len") >= 3, F.col("len") - 2).otherwise(0)).alias("tri"),
        )
        .collect()
    }
    got = {(r.source, r.n): r for r in rows}
    for src, exp in by_src.items():
        assert got[(src, 1)].n_grams == exp.tok
        assert got[(src, 2)].n_grams == exp.bi
        assert got[(src, 3)].n_grams == exp.tri
    for r in rows:
        assert 0 < r.n_distinct <= r.n_grams
        # ±1 ppm: Python round() is banker's, engine ROUND is
        # half-away — only an exact .5 could differ
        assert (
            abs(r.distinct_ppm - 1_000_000.0 * r.n_distinct / r.n_grams)
            <= 0.5
        )


def test_chinchilla_budget_identities(spark):
    """d_opt = 20N, FLOPs = 120N² (exact past int64 at N=70e9),
    epochs = one rounded division, shortfall clamps at zero, and the
    corpus total matches the packing query's own count."""
    from wilayah_aceh_etl_spark.plans.round10_queries import (
        training_packing_efficiency,
    )
    from wilayah_aceh_etl_spark.plans.round11_queries import (
        training_chinchilla_data_budget,
    )

    rows = training_chinchilla_data_budget(spark, SF_SMOKE).collect()
    assert [r.n_params for r in rows] == [
        125000000, 1000000000, 8000000000, 70000000000
    ]
    pk_total = training_packing_efficiency(spark, SF_SMOKE).collect()[0]
    for r in rows:
        assert r.corpus_tokens == pk_total.total_tokens
        assert r.d_opt_tokens == 20 * r.n_params
        assert r.flops_budget == float(120 * r.n_params * r.n_params)
        assert r.tokens_short == max(0, r.d_opt_tokens - r.corpus_tokens)
        # ±half an ulp of the 4-dp grid (banker's vs half-away)
        assert (
            abs(r.epochs_needed - r.d_opt_tokens / r.corpus_tokens)
            <= 0.00005
        )
    # the FLOPs column really needed the wide type: N=70e9 overflows
    assert 120 * 70000000000**2 > 2**63
