"""Round-10 operators: the influence×dedup audit and the streaming
IMI admission twin — the properties their oracles cannot express
(non-vacuity, replay idempotency, cell-local rejection)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_influence_dedup_audit_nonvacuous(spark):
    """The 2×2 contingency must actually be 2×2 at the tested SF
    (every influence class × keep verdict populated — a degenerate
    corpus would silently collapse cells), the class shares must sum
    to 1 within each influence class, and the counts must cover the
    corpus exactly once."""
    from wilayah_aceh_etl_spark.plans.round10_queries import (
        data_curation_influence_dedup_audit,
    )
    from wilayah_aceh_etl_spark.sources.tables import load_table

    rows = data_curation_influence_dedup_audit(spark, SF_SMOKE).collect()
    cells = {(r.high_influence, r.keep) for r in rows}
    assert cells == {(0, 0), (0, 1), (1, 0), (1, 1)}, cells
    n_corpus = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_docs for r in rows) == n_corpus
    for hi in (0, 1):
        share = sum(r.class_share for r in rows if r.high_influence == hi)
        assert abs(share - 1.0) < 2e-6, (hi, share)
        assert all(
            r.n_docs > 0 for r in rows if r.high_influence == hi
        )


def _cent(spark, rows):
    return spark.createDataFrame(rows, "cid long, cvec array<double>")


def test_imi_admission_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a batch whose writes
    already landed must converge to identical tables — per-batch
    partition overwrite, and the existing side excludes the batch's
    own prior admissions (the dedup_admission contract, verified
    here for the IMI frame). Also pins the cell-local verdicts: an
    identical vector in the same cell is rejected; a vector in a
    DIFFERENT cell is admitted even at cosine 1 to a stored vector
    (the documented cell-scoped approximation)."""
    from wilayah_aceh_etl_spark.streaming.imi_admission import (
        apply_imi_admission_batch,
    )

    # 4-d vectors → halves of 2; quantizer A splits on dim 0 sign,
    # quantizer B on dim 2 sign
    cent_a = _cent(spark, [(0, [1.0, 0.0]), (1, [-1.0, 0.0])])
    cent_b = _cent(spark, [(0, [0.0, 1.0]), (1, [0.0, -1.0])])
    admitted = str(tmp_path / "admitted")
    verdicts = str(tmp_path / "verdicts")

    b0 = spark.createDataFrame(
        [(1, [1.0, 0.1, 0.0, 1.0]), (2, [-1.0, 0.0, 0.2, -1.0])],
        "vec_id long, embedding array<double>",
    )
    b1 = spark.createDataFrame(
        [
            # identical to vec 1 → same cell, cos 1 → rejected
            (3, [1.0, 0.1, 0.0, 1.0]),
            # same direction as vec 1 in half A but OPPOSITE half B
            # → different cb cell → admitted despite high similarity
            (4, [1.0, 0.1, 0.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    args = (cent_a, cent_b, admitted, verdicts)
    apply_imi_admission_batch(b0, 0, *args)
    apply_imi_admission_batch(b1, 1, *args)

    def snapshot():
        v = {
            (r.vec_id, r.ca, r.cb, r.n_cell_candidates, r.n_near_dups, r.admit)
            for r in spark.read.option("basePath", verdicts)
            .parquet(verdicts)
            .collect()
        }
        a = {
            r.vec_id
            for r in spark.read.option("basePath", admitted)
            .parquet(admitted)
            .collect()
        }
        return v, a

    before = snapshot()
    apply_imi_admission_batch(b1, 1, *args)
    apply_imi_admission_batch(b1, 1, *args)
    assert snapshot() == before

    v, a = before
    assert a == {1, 2, 4}
    by_id = {t[0]: t for t in v}
    # batch 0 faces an empty index: zero candidates, admitted
    assert by_id[1][3:] == (0, 0, 1)
    assert by_id[2][3:] == (0, 0, 1)
    # vec 3: one same-cell candidate (vec 1), cos 1 → rejected
    assert by_id[3][3:] == (1, 1, 0)
    # vec 4: different cb cell → no candidates → admitted
    assert by_id[4][3:] == (0, 0, 1)
    # cells actually differ between 3 and 4 on the B side only
    assert by_id[3][1] == by_id[4][1]
    assert by_id[3][2] != by_id[4][2]


def test_imi_admission_streamed_matches_batch_replay(spark, tmp_path):
    """Driving the same batches through the module-level batch
    function must equal re-running it — and the admitted table must
    only ever contain admitted vectors (no verdict row, no
    admission)."""
    from wilayah_aceh_etl_spark.streaming.imi_admission import (
        apply_imi_admission_batch,
    )

    cent_a = _cent(spark, [(0, [1.0, 0.0]), (1, [-1.0, 0.0])])
    cent_b = _cent(spark, [(0, [0.0, 1.0]), (1, [0.0, -1.0])])
    a1, v1 = str(tmp_path / "a1"), str(tmp_path / "v1")
    a2, v2 = str(tmp_path / "a2"), str(tmp_path / "v2")
    batches = [
        spark.createDataFrame(
            [
                (
                    10 * k + j,
                    [
                        1.0 if (k + j) % 2 == 0 else -1.0,
                        0.1 * j,
                        0.05 * k,
                        1.0 if j % 2 == 0 else -1.0,
                    ],
                )
                for j in range(3)
            ],
            "vec_id long, embedding array<double>",
        )
        for k in range(3)
    ]
    for k, b in enumerate(batches):
        apply_imi_admission_batch(b, k, cent_a, cent_b, a1, v1)
        apply_imi_admission_batch(b, k, cent_a, cent_b, a2, v2)

    r1 = sorted(
        (r.vec_id, r.admit)
        for r in spark.read.option("basePath", v1).parquet(v1).collect()
    )
    r2 = sorted(
        (r.vec_id, r.admit)
        for r in spark.read.option("basePath", v2).parquet(v2).collect()
    )
    assert r1 == r2 and len(r1) == 9
    admitted_ids = {
        r.vec_id
        for r in spark.read.option("basePath", a1).parquet(a1).collect()
    }
    assert admitted_ids == {vid for vid, adm in r1 if adm == 1}
