"""Round-9 additions: model-based quality scoring at serving shape
(the fastText-style classifier-inference pass) — planted-vocabulary
separability, DSIR-style."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quality_classifier_separates_planted_vocab(spark, tmp_path):
    """Disjoint planted vocabularies must land every document on the
    right side of the keep threshold — including the doc_id%5==0
    HOLDOUT docs the trainer never saw (the serving pass scores the
    whole corpus). This is the separability pin the registered
    query's oracle can't express (the oracle pins arithmetic
    equality; this pins that the classifier actually classifies)."""
    from wilayah_aceh_etl_spark.plans.round9_queries import (
        corpus_quality_classifier_serving,
    )

    good = "lucid cogent narrative prose exposition rigorous"
    junk = "zzz9 qqq7 xxx4 kkk2 vvv8 jjj1"
    rows = []
    for i in range(50):
        if i % 2 == 0:
            text = " ".join(good.split()[j % 6] for j in range(i % 7 + 8))
            rows.append((i, text, "en", f"src{i % 3}", len(text)))
        else:
            text = " ".join(junk.split()[j % 6] for j in range(i % 5 + 8))
            rows.append((i, text, "de", f"src{i % 3}", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )

    got = corpus_quality_classifier_serving(spark, str(tmp_path)).collect()
    assert len(got) == 50
    by_id = {r.doc_id: r for r in got}
    for i in range(50):
        want_keep = 1 if i % 2 == 0 else 0
        assert by_id[i].keep == want_keep, (i, by_id[i])
    # margins actually separate (not all hovering at 0): the lowest
    # kept logit clears the highest dropped logit
    min_keep = min(r.logit_q for r in got if r.keep == 1)
    max_drop = max(r.logit_q for r in got if r.keep == 0)
    assert min_keep > 0 > max_drop
    # and the holdout specifically (never seen by the trainer)
    holdout = [r for r in got if r.doc_id % 5 == 0]
    assert holdout and all(
        (r.keep == 1) == (r.doc_id % 2 == 0) for r in holdout
    )
