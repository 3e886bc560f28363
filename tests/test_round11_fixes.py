"""Round-11 pins for the r10 ADVICE findings: the IMI admission
odd-dimension derivation (d = |half A| + |half B|, not 2×|A|), the
gate-window module_round required-name signature (pinned in
test_round9_ops.py next to the override test), and logreg_fit's
n_iter=0 dimension handling (optional d / LIMIT 1 probe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _cent(spark, rows):
    return spark.createDataFrame(rows, "cid long, cvec array<double>")


def test_imi_admission_odd_dimension_matches_batch_index(spark, tmp_path):
    """For odd d, imi_train_halves gives half A d//2 dims and half B
    d - d//2; the admission stream's old derived d = 2×|A| = d-1
    sliced half B one component short, silently drifting streaming
    cell assignments from the batch-built index (r10 ADVICE). Pin:
    with 5-d vectors whose FIFTH component alone decides the B cell,
    the admission batch path (d derived from the centroids) must
    assign the same (ca, cb) cells as imi_cell_assignments at the
    true d."""
    from wilayah_aceh_etl_spark.operators.similarity import (
        imi_cell_assignments,
    )
    from wilayah_aceh_etl_spark.streaming.imi_admission import (
        apply_imi_admission_batch,
    )

    # d=5 → half A = dims 1-2 (2), half B = dims 3-5 (3). Quantizer B
    # splits on the LAST component — the one the old 2×|A| derivation
    # truncated away.
    cent_a = _cent(spark, [(0, [1.0, 0.0]), (1, [-1.0, 0.0])])
    cent_b = _cent(
        spark, [(0, [0.0, 0.0, 1.0]), (1, [0.0, 0.0, -1.0])]
    )
    vecs = [
        (1, [1.0, 0.1, 0.0, 0.0, 1.0]),
        (2, [1.0, 0.1, 0.0, 0.0, -1.0]),  # differs ONLY in dim 5
        (3, [-1.0, 0.0, 0.1, 0.0, 1.0]),
        (4, [-1.0, 0.0, 0.1, 0.0, -1.0]),
    ]
    batch = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )

    expected = {
        (r.vec_id, r.ca, r.cb)
        for r in imi_cell_assignments(
            batch, cent_a, cent_b, d=5
        ).collect()
    }
    # dims 1-2 identical for ids 1/2 and 3/4 → cb must differ within
    # each pair; if half B were sliced short the pairs collapse
    cb = {r[0]: r[2] for r in expected}
    assert cb[1] != cb[2] and cb[3] != cb[4]

    admitted = str(tmp_path / "admitted")
    verdicts = str(tmp_path / "verdicts")
    apply_imi_admission_batch(
        batch, 0, cent_a, cent_b, admitted, verdicts
    )
    got = {
        (r.vec_id, r.ca, r.cb)
        for r in spark.read.option("basePath", verdicts)
        .parquet(verdicts)
        .select("vec_id", "ca", "cb")
        .collect()
    }
    assert got == expected


def test_imi_admission_stream_derives_odd_d(spark):
    """_derive_d — the ONE copy of the dimension derivation both
    imi_admission_stream and apply_imi_admission_batch call — must
    sum the half lengths: odd-d halves (2 + 3) derive 5, not 4."""
    import inspect

    from wilayah_aceh_etl_spark.streaming import imi_admission as M

    cent_a = _cent(spark, [(0, [1.0, 0.0]), (1, [-1.0, 0.0])])
    cent_b = _cent(
        spark, [(0, [0.0, 0.0, 1.0]), (1, [0.0, 0.0, -1.0])]
    )
    assert M._derive_d(cent_a, cent_b) == 5
    # and both entry points actually route through that one copy
    assert "_derive_d(cent_a, cent_b)" in inspect.getsource(
        M.imi_admission_stream
    )
    assert "_derive_d(cent_a, cent_b)" in inspect.getsource(
        M.apply_imi_admission_batch
    )


def test_logreg_fit_zero_iters_explicit_d(spark):
    """n_iter=0 with an explicit d runs NO Spark job at all (the
    degenerate call previously always probed the corpus — r10
    ADVICE): an unresolvable DataFrame plan is never touched."""
    from wilayah_aceh_etl_spark.operators.ml_train import logreg_fit

    # a frame whose evaluation would fail loudly if any job ran
    df = spark.createDataFrame(
        [(1, [0.0], 0)], "vec_id long, embedding array<double>, y int"
    ).where(F.raise_error(F.lit("must not evaluate")) .isNull())
    w, b = logreg_fit(df, n_iter=0, d=7)
    assert w == [0.0] * 7 and b == 0.0


def test_logreg_fit_zero_iters_probe_is_limit_one(spark):
    """Without d, the probe sizes the zero vector from a LIMIT 1
    plan — correct width, and empty input still raises."""
    from wilayah_aceh_etl_spark.operators.ml_train import logreg_fit

    df = spark.createDataFrame(
        [(i, [0.0, 0.0, 0.0], i % 2) for i in range(10)],
        "vec_id long, embedding array<double>, y int",
    )
    w, b = logreg_fit(df, n_iter=0)
    assert w == [0.0, 0.0, 0.0] and b == 0.0
    with pytest.raises(ValueError, match="empty"):
        logreg_fit(df.where(F.lit(False)), n_iter=0)
