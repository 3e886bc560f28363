"""Round-11 operators: the derived-C chain audit, the dedup-policy
agreement audit, and the critical-batch schedule — the properties
their oracles cannot express (consistency with the parent pipelines,
exact-integer ceiling identities, marginal reconciliation)."""

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
