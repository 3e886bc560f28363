"""Round-12 pins for the r11 ADVICE findings: the critical-batch
schedule's degenerate-divisor guard (ss2 = 0 must behave identically
on Spark and DuckDB — NULLIF(ss2, 0) + both engines' NULL-skipping
GREATEST), plus the cross-engine GREATEST-skips-NULL premise itself.
"""

from __future__ import annotations

import duckdb


# The bcrit / b_simple expressions from round11_queries.py's
# training_critical_batch_schedule, evaluated on pinned scalars with
# the degenerate divisor ss2 = 0. Before the guard, DuckDB raised a
# division-by-zero error here while Spark's `div` returned NULL —
# the two engines disagreed on a representable (all-zero
# gradient-sum) corpus. With NULLIF(ss2, 0) both propagate NULL into
# GREATEST, which skips NULLs on BOTH engines, so the degenerate
# result is identically (bcrit=1, b_simple=NULL).
_DUCK_DEGENERATE = """
SELECT GREATEST(1, (CAST(5 AS HUGEINT) * 3 * 16777216
                    + NULLIF(ss2, 0) - 1)
                   // NULLIF(ss2, 0) - 1) AS bcrit,
       ROUND(((CAST(5 AS DOUBLE) * 3) * 16777216.0) /
             CAST(NULLIF(ss2, 0) AS DOUBLE) - 1.0, 6) AS b_simple
FROM (SELECT CAST({ss2} AS HUGEINT) AS ss2)
"""

_SPARK_DEGENERATE = """
SELECT GREATEST(CAST(1 AS BIGINT),
                (CAST(5 AS DECIMAL(38,0)) * 3 * 16777216
                 + NULLIF(ss2, 0) - 1) div NULLIF(ss2, 0) - 1)
         AS bcrit,
       ROUND(((CAST(5 AS DOUBLE) * 3) * 16777216.0) /
             CAST(NULLIF(ss2, 0) AS DOUBLE) - 1.0, 6) AS b_simple
FROM (SELECT CAST({ss2} AS BIGINT) AS ss2)
"""


def _duck_row(ss2: int):
    row = duckdb.sql(_DUCK_DEGENERATE.format(ss2=ss2)).fetchone()
    return (int(row[0]), None if row[1] is None else float(row[1]))


def _spark_row(spark, ss2: int):
    row = spark.sql(_SPARK_DEGENERATE.format(ss2=ss2)).collect()[0]
    return (
        int(row["bcrit"]),
        None if row["b_simple"] is None else float(row["b_simple"]),
    )


def test_greatest_skips_nulls_on_both_engines(spark):
    """The guard's premise: GREATEST(1, NULL) = 1 on BOTH engines
    (each skips NULL arguments), so NULLIF-ing the divisor turns the
    degenerate case into an agreed (1, NULL) row rather than an
    error on one engine and NULL on the other."""
    assert duckdb.sql("SELECT GREATEST(1, NULL)").fetchone()[0] == 1
    assert (
        spark.sql(
            "SELECT GREATEST(CAST(1 AS BIGINT), CAST(NULL AS BIGINT))"
        ).collect()[0][0]
        == 1
    )


def test_critical_batch_degenerate_ss2_agrees(spark):
    """ss2 = 0 (all-zero gradient-sum corpus): both engines must
    produce bcrit = 1 and b_simple = NULL — no error, no
    cross-engine divergence (r11 ADVICE finding #2)."""
    assert _duck_row(0) == (1, None)
    assert _spark_row(spark, 0) == (1, None)


def test_critical_batch_nonzero_ss2_unchanged_by_guard(spark):
    """The guard is the identity on every nonzero divisor: pinned
    scalars (sq=5, n=3, ss2=7) give the same exact-integer bcrit and
    single-division b_simple on both engines, matching the
    hand-computed ceiling ⌈5·3·2²⁴/7⌉ − 1."""
    a = 5 * 3 * 16777216
    expect_bcrit = max(1, -(-a // 7) - 1)
    expect_b_simple = round(a / 7.0 - 1.0, 6)
    assert _duck_row(7) == (expect_bcrit, expect_b_simple)
    assert _spark_row(spark, 7) == (expect_bcrit, expect_b_simple)
