"""Unit tests for the round-3 operators: incremental batch admission
and winnowing fingerprints. Parity (tools/parity.py) pins these
against DuckDB on the driver corpus; here we pin the SEMANTICS on
hand-built cases where the expected outcome is known by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.operators.dedup import incremental_near_dup_filter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while birds sing in the tall green trees above"
)


def test_incremental_exact_dup_rejected(spark):
    existing = _docs(spark, [(0, BASE)])
    incoming = _docs(spark, [(1, BASE), (3, "completely different words here")])
    out = {
        r["doc_id"]: r
        for r in incremental_near_dup_filter(existing, incoming).collect()
    }
    assert out[1]["is_exact_dup"] is True
    assert out[1]["kept"] is False
    assert out[3]["is_exact_dup"] is False
    assert out[3]["near_dup_of"] is None
    assert out[3]["kept"] is True


def test_incremental_near_dup_points_at_smallest_existing(spark):
    # two existing copies of the same text; the near-dup pointer must
    # name the smallest qualifying existing id
    existing = _docs(spark, [(0, BASE), (2, BASE)])
    # one word changed → high Jaccard, not exact
    near = BASE.replace("lazy", "sleepy")
    incoming = _docs(spark, [(5, near)])
    row = incremental_near_dup_filter(existing, incoming).collect()[0]
    assert row["is_exact_dup"] is False
    assert row["near_dup_of"] == 0
    assert row["kept"] is False


def test_incremental_does_not_dedup_within_batch(spark):
    # two identical INCOMING docs, nothing like them in existing:
    # batch-internal duplication is a separate pass (keep_first_exact);
    # admission only tests against the existing corpus
    existing = _docs(spark, [(0, "unrelated corpus text entirely elsewhere")])
    incoming = _docs(spark, [(1, BASE), (3, BASE)])
    rows = incremental_near_dup_filter(existing, incoming).collect()
    assert all(r["kept"] for r in rows)


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing a substring of
    ≥ k+w-1 chars (here k=5, w=4 → 8) share at least one fingerprint.
    Checked on hand-built docs through the registered query's exact
    expression pipeline."""
    from wilayah_aceh_etl_spark.plans.ext_queries import (
        _WINNOW_K,
        _WINNOW_MOD,
        _WINNOW_W,
    )

    shared = "identical common segment kept verbatim in both documents"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, "wholly other prefix text " + shared + " and a different tail"),
        ],
        "doc_id long, text string",
    )
    h = F.expr(
        f"transform(sequence(1, length(text) - {_WINNOW_K} + 1), "
        f"i -> aggregate(sequence(0, {_WINNOW_K - 1}), CAST(0 AS BIGINT), "
        f"(acc, j) -> (acc * 257 + ascii(substring(text, i + j, 1))) % {_WINNOW_MOD}))"
    )
    fp = F.expr(
        f"array_distinct(transform(sequence(1, size(_h) - {_WINNOW_W} + 1), "
        f"i -> array_min(slice(_h, i, {_WINNOW_W}))))"
    )
    sets = (
        docs.select("doc_id", h.alias("_h"))
        .select("doc_id", fp.alias("_fp"))
        .collect()
    )
    fps = {r["doc_id"]: set(r["_fp"]) for r in sets}
    assert fps[1] & fps[2], "shared >= k+w-1 substring must share a fingerprint"
