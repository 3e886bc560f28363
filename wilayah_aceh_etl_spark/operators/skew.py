"""Skew-mitigation operators.

AQE's skew-join splitting handles moderate runtime skew; these are
the explicit forms for when the skew is structural and known (one
hot key owning a double-digit percentage of a 100 TB fact table):

  salted_join         — replicate the small side n_salts×, salt the
                        big side per-row: a hot key's rows spread
                        over n_salts reducers instead of one.
                        Result-identical to the plain join.
  count_distinct_skew_safe
                      — two-phase exact distinct: shuffle once on
                        (key, value) — the compound key spreads a hot
                        key's values — then count per key. Plain
                        countDistinct shuffles raw rows on `key`
                        alone, sending every row of the hot key to
                        one reducer.

Map-side partial aggregation already neutralizes skew for
collapsible aggs (sum/count/min/max) — these helpers cover the
cases partials can't collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated n_salts×. Use when the small side is too large to
    broadcast and the key distribution is skewed.

    Shuffle keys become (on, salt): a key owning p% of the big side
    is split across n_salts reducers. The small side grows n_salts×
    — still tiny relative to a skewed fact table."""
    salt_b = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt_b)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")


def count_distinct_skew_safe(
    df: DataFrame, key: str, value: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count in two shuffles, neither of which
    concentrates a hot key on one reducer:

      1. distinct on (key, value)  — partitioned by the compound key
      2. count per key             — input is already one row per
                                     distinct value, so the hot key's
                                     reducer receives |distinct|
                                     rows, not |rows|
    """
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out))
    )
