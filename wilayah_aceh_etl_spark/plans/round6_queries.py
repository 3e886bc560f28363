"""Round-6 declared queries: closed-form statistical modelling (OLS
via normal equations, rank correlations, categorical association),
market-concentration and model-diagnostic metrics, and event-stream
operators an at-scale pipeline needs before choosing its streaming
configuration (a watermark-lateness profiler, a regex CEP funnel, a
Hurst R/S long-memory probe).

The reference has no analytics surface (SURVEY.md §2.11); these
extend the EXT mandate (`BASELINE.json:6`). Determinism contract as
repo-wide: every statistic is assembled from EXACT integer moment
sums (the only doubles are single divisions / sqrt of exact ints, so
both engines evaluate bit-identical IEEE expressions), identical
aliases both sides, total ORDER BY on every result.

Scale stance (SCALE.md): every query here is one scan + one hash
aggregate (or one window over a bounded series). Moment-sum
statistics are the 100 TB pattern — partial aggregation map-side,
one small shuffle, O(groups) driver result; nothing materializes an
O(n²) pair set except the 25-nation Kendall tau (625 pairs by
construction, independent of fact-table size).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve at module scope)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wilayah_aceh_etl_spark.plans.registry import register
from wilayah_aceh_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# OLS with two features via the 2x2 normal equations
# ---------------------------------------------------------------------------

_OLS_MOMENTS = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x1) AS BIGINT) AS s1,
       CAST(SUM(x2) AS BIGINT) AS s2,
       CAST(SUM(y)  AS BIGINT) AS sy,
       CAST(SUM(x1 * x1) AS BIGINT) AS s11,
       CAST(SUM(x2 * x2) AS BIGINT) AS s22,
       CAST(SUM(x1 * x2) AS BIGINT) AS s12,
       CAST(SUM(x1 * y)  AS BIGINT) AS s1y,
       CAST(SUM(x2 * y)  AS BIGINT) AS s2y,
       CAST(SUM(y * y)   AS BIGINT) AS syy
FROM (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity) AS BIGINT) AS x1,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
)
GROUP BY l_returnflag
"""

# Shared closed-form text — valid Spark SQL *and* DuckDB SQL, so both
# engines evaluate the exact same IEEE expression tree.
_OLS_FORMULAS = {
    "c11": "CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n",
    "c22": "CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n",
    "c12": "CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n",
    "c1y": "CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n",
    "c2y": "CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n",
    "cyy": "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n",
}

_OLS_SELECT = """
SELECT l_returnflag, n,
       ROUND((c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12), 6) AS b_qty,
       ROUND((c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12), 6) AS b_disc,
       ROUND((CAST(sy AS DOUBLE)
              - ((c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12)) * s1
              - ((c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12)) * s2)
             / n, 2) AS b_intercept,
       ROUND((((c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12)) * c1y
              + ((c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12)) * c2y)
             / cyy, 6) AS r2
FROM centered
ORDER BY l_returnflag
"""


@register(
    "stats_ols_two_feature_lineitem",
    oracle="WITH moments AS ("
    + _OLS_MOMENTS
    + "), centered AS (SELECT *, "
    + ", ".join(f"{v} AS {k}" for k, v in _OLS_FORMULAS.items())
    + " FROM moments) "
    + _OLS_SELECT,
    tags=("ext", "stats", "regression"),
    description="2-feature OLS (price ~ qty + discount) via normal equations",
)
def stats_ols_two_feature_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression fitted in closed form: per return
    flag, regress whole-dollar extended price on quantity and
    discount-percent by solving the centered 2x2 normal equations
    (Cramer's rule), plus R². The entire fit is one scan producing
    eleven exact integer moment sums per group — the map-side-
    combinable shape that fits a regression at 100 TB without any
    iterative solver or driver-side matrix library. Reference has no
    analytics surface (SURVEY §2.11 — EXT)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    moments = spark.sql(_OLS_MOMENTS)
    centered = moments.select(
        "*", *[F.expr(v).alias(k) for k, v in _OLS_FORMULAS.items()]
    )
    centered.createOrReplaceTempView("centered")
    return spark.sql(_OLS_SELECT)


# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-corrected, via doubled average ranks)
# ---------------------------------------------------------------------------

_SPEARMAN_SQL_BODY = """
ranked AS (
  SELECT
    2 * RANK() OVER (ORDER BY p_size)
      + COUNT(*) OVER (PARTITION BY p_size) - 1 AS u,
    2 * RANK() OVER (ORDER BY CAST(ROUND(p_retailprice * 100) AS BIGINT))
      + COUNT(*) OVER (PARTITION BY
          CAST(ROUND(p_retailprice * 100) AS BIGINT)) - 1 AS v
  FROM part
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(u * u) AS BIGINT) AS suu,
         CAST(SUM(v * v) AS BIGINT) AS svv,
         CAST(SUM(u * v) AS BIGINT) AS suv
  FROM ranked
)
SELECT n,
       ROUND((n * CAST(suv AS DOUBLE) - CAST(su AS DOUBLE) * sv)
             / (sqrt(n * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * su)
                * sqrt(n * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv)),
             6) AS spearman_rho
FROM s
"""


@register(
    "stats_spearman_part_size_price",
    oracle="WITH " + _SPEARMAN_SQL_BODY,
    tags=("ext", "stats", "correlation", "window"),
    description="tie-corrected Spearman rho of part size vs retail price",
)
def stats_spearman_part_size_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation with exact tie handling: the
    average rank of a tied value is rank + (ties-1)/2, a half-
    integer — doubling it (2*rank + ties - 1) keeps every rank an
    exact BIGINT, so Pearson-on-ranks runs entirely on integer
    moment sums (doubling cancels in the correlation). Two global
    sort windows (the one wide op) + one aggregate — rank-based
    statistics at scale are sort-bound, exactly like ROC-AUC."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql("WITH " + _SPEARMAN_SQL_BODY)


# ---------------------------------------------------------------------------
# Kendall tau-b over nation-level metric pairs
# ---------------------------------------------------------------------------

_KENDALL_SQL = """
m AS (
  SELECT n.n_nationkey AS k,
         CAST((SELECT COUNT(*) FROM customer c
               WHERE c.c_nationkey = n.n_nationkey) AS BIGINT) AS x,
         CAST((SELECT COUNT(*) FROM supplier s
               WHERE s.s_nationkey = n.n_nationkey) AS BIGINT) AS y
  FROM nation n
),
pairs AS (
  SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                       THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM m a JOIN m b ON a.k < b.k
)
SELECT nc, nd, tx, ty, n0,
       ROUND((CAST(nc AS DOUBLE) - nd)
             / (sqrt(CAST(n0 - tx AS DOUBLE)) * sqrt(CAST(n0 - ty AS DOUBLE))),
             6) AS kendall_tau_b
FROM pairs
"""


@register(
    "stats_kendall_tau_nation_counts",
    oracle="WITH " + _KENDALL_SQL,
    tags=("ext", "stats", "correlation"),
    description="Kendall tau-b: nation customer count vs supplier count",
)
def stats_kendall_tau_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between two per-nation metrics. The O(n²) pair
    join runs over the 25-row AGGREGATED nation table, not the fact
    tables — the at-scale discipline for pairwise statistics: first
    reduce to the entity grain (two broadcast-sized aggregates),
    then pair. Concordant/discordant/tie counts are exact integers;
    tau-b is a single closed-form division."""
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    m = (
        nation.select(F.col("n_nationkey").alias("k"))
        .join(cust, "k", "left")
        .join(supp, "k", "left")
        .select(
            "k",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    a = m.alias("a")
    b = m.alias("b")
    prod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    pairs = (
        a.join(F.broadcast(b), F.col("a.k") < F.col("b.k"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).cast("long").alias("nc"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).cast("long").alias("nd"),
            F.sum(
                F.when(
                    (F.col("a.x") == F.col("b.x"))
                    & (F.col("a.y") != F.col("b.y")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("tx"),
            F.sum(
                F.when(
                    (F.col("a.y") == F.col("b.y"))
                    & (F.col("a.x") != F.col("b.x")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("ty"),
            F.count(F.lit(1)).cast("long").alias("n0"),
        )
    )
    return pairs.select(
        "nc",
        "nd",
        "tx",
        "ty",
        "n0",
        F.round(
            (F.col("nc").cast("double") - F.col("nd"))
            / (
                F.sqrt((F.col("n0") - F.col("tx")).cast("double"))
                * F.sqrt((F.col("n0") - F.col("ty")).cast("double"))
            ),
            6,
        ).alias("kendall_tau_b"),
    )


# ---------------------------------------------------------------------------
# Cramér's V for three categorical pairs
# ---------------------------------------------------------------------------


def _cramers_pair_sql(pair_name: str, rel: str, a: str, b: str) -> str:
    """chi² / Cramér's V for one categorical pair, from exact cell /
    margin counts; each chi² term is (obs*n - rt*ct)²/(n*rt*ct) so
    every numerator is an exact integer product."""
    cells = f"""
      SELECT {a} AS av, {b} AS bv, COUNT(*) AS obs
      FROM {rel}
      GROUP BY {a}, {b}
    """
    return f"""
SELECT '{pair_name}' AS pair,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(ra) AS BIGINT) AS card_a,
       CAST(MAX(rb) AS BIGINT) AS card_b,
       ROUND(SUM((CAST(obs AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
                 * (CAST(obs AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
                 / (CAST(n AS DOUBLE) * n * rt * ct)), 6) AS chi2,
       ROUND(sqrt(SUM((CAST(obs AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
                      * (CAST(obs AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
                      / (CAST(n AS DOUBLE) * n * rt * ct))
                  / (MAX(n) * (least(MAX(ra), MAX(rb)) - 1))), 6)
         AS cramers_v
FROM (
  SELECT av, bv, obs,
         SUM(obs) OVER (PARTITION BY av) AS rt,
         SUM(obs) OVER (PARTITION BY bv) AS ct,
         SUM(obs) OVER () AS n
  FROM ({cells})
) CROSS JOIN (
  SELECT COUNT(DISTINCT av) AS ra, COUNT(DISTINCT bv) AS rb
  FROM ({cells})
)
"""


_CRAMERS_PAIRS = (
    ("status_x_priority", "orders", "o_orderstatus", "o_orderpriority"),
    (
        "status_x_segment",
        "orders JOIN customer ON o_custkey = c_custkey",
        "o_orderstatus",
        "c_mktsegment",
    ),
    (
        "priority_x_segment",
        "orders JOIN customer ON o_custkey = c_custkey",
        "o_orderpriority",
        "c_mktsegment",
    ),
)


@register(
    "stats_cramers_v_pairs",
    oracle="SELECT * FROM ("
    + " UNION ALL ".join(
        _cramers_pair_sql(*args) for args in _CRAMERS_PAIRS
    )
    + ") ORDER BY pair",
    tags=("ext", "stats", "categorical"),
    description="chi² + Cramér's V for three categorical column pairs",
)
def stats_cramers_v_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-association audit: Cramér's V (bias-uncorrected)
    for status x priority, status x segment, priority x segment.
    Each pair is a contingency-table aggregate — one groupBy to cell
    counts (≤15 cells), margins via windows over that tiny grid, so
    the fact scan is the only big stage and the dim join broadcasts.
    V ~ 0 everywhere is itself the expected finding on independent
    synthetic columns (the null-hypothesis sanity check a feature-
    selection pass runs before trusting any categorical signal)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    parts = [
        spark.sql(_cramers_pair_sql(*args)) for args in _CRAMERS_PAIRS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("pair")


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration per region
# ---------------------------------------------------------------------------

_HHI_SQL = """
rev AS (
  SELECT r.r_name AS region, l.l_suppkey,
         CAST(ROUND(SUM(CAST(ROUND(l.l_extendedprice
                                   * (1 - l.l_discount) * 100) AS BIGINT))
                    / 100.0) AS BIGINT) AS rev_d
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, l.l_suppkey
)
SELECT region,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev_d) AS BIGINT) AS revenue_dollars,
       ROUND(10000 * CAST(SUM(rev_d * rev_d) AS DOUBLE)
             / (CAST(SUM(rev_d) AS DOUBLE) * SUM(rev_d)), 6) AS hhi
FROM rev
GROUP BY region
ORDER BY region
"""


@register(
    "market_hhi_by_region",
    oracle="WITH " + _HHI_SQL,
    tags=("ext", "stats", "concentration", "join"),
    description="Herfindahl-Hirschman supplier-revenue concentration per region",
)
def market_hhi_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI market concentration: per region, the sum of squared
    supplier revenue shares x 10000. Shares are never materialized —
    HHI = 10000 * Σrev² / (Σrev)² over whole-dollar integer revenue,
    so both the numerator and denominator are exact integer
    aggregates (squares summed as BIGINT, dollars keep Σrev² well
    under 2⁶³) and the only double is one final division. Dims
    broadcast; the fact scan partial-aggregates map-side on
    (region, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "l_suppkey")
        .agg(F.sum(cents).alias("cents"))
        .select(
            "region",
            F.round(F.col("cents") / 100.0).cast("long").alias("rev_d"),
        )
    )
    return (
        rev.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("rev_d").cast("long").alias("revenue_dollars"),
            F.round(
                10000
                * F.sum(F.col("rev_d") * F.col("rev_d")).cast("double")
                / (F.sum("rev_d").cast("double") * F.sum("rev_d")),
                6,
            ).alias("hhi"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# Decision stump: best Gini split of returns on discount
# ---------------------------------------------------------------------------

_STUMP_SQL = """
base AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
per_v AS (
  SELECT disc_pct, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM base GROUP BY disc_pct
),
cum AS (
  SELECT disc_pct,
         SUM(n) OVER (ORDER BY disc_pct) AS nl,
         SUM(pos) OVER (ORDER BY disc_pct) AS pl,
         SUM(n) OVER () AS nt,
         SUM(pos) OVER () AS pt
  FROM per_v
),
splits AS (
  SELECT CAST(disc_pct AS INTEGER) AS threshold,
         CAST(nl AS BIGINT) AS n_left,
         CAST(nt - nl AS BIGINT) AS n_right,
         (CAST(nl AS DOUBLE) * (1.0
            - CAST(pl AS DOUBLE) * pl / (CAST(nl AS DOUBLE) * nl)
            - CAST(nl - pl AS DOUBLE) * (nl - pl)
              / (CAST(nl AS DOUBLE) * nl))
          + CAST(nt - nl AS DOUBLE) * (1.0
            - CAST(pt - pl AS DOUBLE) * (pt - pl)
              / (CAST(nt - nl AS DOUBLE) * (nt - nl))
            - CAST((nt - nl) - (pt - pl) AS DOUBLE)
              * ((nt - nl) - (pt - pl))
              / (CAST(nt - nl AS DOUBLE) * (nt - nl)))) / nt AS gini
  FROM cum WHERE nl < nt
)
SELECT threshold, n_left, n_right, ROUND(gini, 6) AS weighted_gini,
       CASE WHEN ROW_NUMBER() OVER (ORDER BY gini, threshold) = 1
            THEN 1 ELSE 0 END AS is_best
FROM splits
ORDER BY threshold
"""


@register(
    "decision_stump_discount_returns",
    oracle="WITH " + _STUMP_SQL,
    tags=("ext", "ml", "tree", "window"),
    description="decision stump: best Gini split of returnflag on discount",
)
def decision_stump_discount_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One level of CART: evaluate every split threshold of
    discount-percent against target returnflag='R' by weighted Gini
    impurity, flag the argmin. The scan reduces to per-distinct-
    value (n, positives) — 11 rows — and every candidate split is a
    cumulative sum over that tiny grid, which is exactly how
    distributed tree libraries (XGBoost/LightGBM histogram mode)
    make split finding scale: histogram first, sweep second. All
    counts exact; Gini terms are single divisions of integer
    products, deterministic without tolerance."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("WITH " + _STUMP_SQL)


# ---------------------------------------------------------------------------
# CEP: regex pattern over per-user event-type sequences
# ---------------------------------------------------------------------------

_CEP_SQL = """
seq AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
                      WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
                      ELSE 'e' END, '' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id
),
flags AS (
  SELECT user_id, path,
         CASE WHEN regexp_matches(path, 's[cv]*p') THEN 1 ELSE 0 END
           AS clean_convert,
         CASE WHEN regexp_matches(path, 's[cv]*e[cve]*p') THEN 1 ELSE 0 END
           AS error_then_convert
  FROM seq
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(clean_convert) AS BIGINT) AS n_clean_convert,
       CAST(SUM(CASE WHEN clean_convert = 0 AND error_then_convert = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_error_recovered,
       ROUND(CAST(SUM(clean_convert) AS DOUBLE) / COUNT(*), 6)
         AS clean_convert_rate
FROM flags
"""


@register(
    "events_cep_funnel_regex",
    oracle="WITH " + _CEP_SQL,
    tags=("ext", "events", "cep", "funnel"),
    description="regex CEP: signup→purchase with no intervening error",
)
def events_cep_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing via regex over compressed per-user
    event paths (a MATCH_RECOGNIZE-lite): each user's timeline
    becomes a string of one-char event codes, then a pattern like
    s[cv]*p ("signup, then only clicks/views, then purchase") is a
    single regexp per user. At 100 TB this is one shuffle to the
    user grain + one scalar regex — per-user paths stay small (event
    counts per user are bounded), and the pattern never needs
    lookahead, so it runs identically under RE2 and Java regex."""
    e = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    seq = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), code.alias("code")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["code"]
                ),
                "",
            ).alias("path")
        )
    )
    flags = seq.select(
        F.when(F.col("path").rlike("s[cv]*p"), 1).otherwise(0).alias(
            "clean_convert"
        ),
        F.when(F.col("path").rlike("s[cv]*e[cve]*p"), 1)
        .otherwise(0)
        .alias("error_then_convert"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("clean_convert").cast("long").alias("n_clean_convert"),
        F.sum(
            F.when(
                (F.col("clean_convert") == 0)
                & (F.col("error_then_convert") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_error_recovered"),
        F.round(
            F.sum("clean_convert").cast("double") / F.count(F.lit(1)), 6
        ).alias("clean_convert_rate"),
    )


# ---------------------------------------------------------------------------
# Watermark-lateness profiler (out-of-orderness of the event stream)
# ---------------------------------------------------------------------------

_LATENESS_SQL = """
arr AS (
  SELECT event_type,
         (MAX(epoch_us(ts)) OVER (ORDER BY event_id)
          - epoch_us(ts)) // 1000000 AS late_s
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out_of_order,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s) AS BIGINT)
         AS p50_late_s,
       CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY late_s) AS BIGINT)
         AS p95_late_s,
       CAST(MAX(late_s) AS BIGINT) AS max_late_s,
       CAST(SUM(CASE WHEN late_s > 600 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_by_10min_watermark
FROM arr
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "events_watermark_lateness_profile",
    oracle="WITH " + _LATENESS_SQL,
    tags=("ext", "events", "streaming", "watermark"),
    description="event-time lateness profile vs arrival order (watermark sizing)",
)
def events_watermark_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement that should precede every withWatermark()
    call: treating event_id as arrival order, each event's lateness
    is the running max of event-time seen so far minus its own
    event-time. Per event type: out-of-order fraction, p50/p95/max
    lateness, and how many rows a 10-minute watermark would actually
    drop. One global arrival-order window (micros kept integral, so
    seconds are exact integer division) + one aggregate; at scale
    the same profile runs per ingest partition instead of globally."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    arr = e.select(
        "event_type",
        ((F.max(us).over(w) - us) / F.lit(1000000))
        .cast("long")
        .alias("late_s"),
    )
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_out_of_order"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s)")
            .cast("long")
            .alias("p50_late_s"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY late_s)")
            .cast("long")
            .alias("p95_late_s"),
            F.max("late_s").cast("long").alias("max_late_s"),
            F.sum(F.when(F.col("late_s") > 600, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped_by_10min_watermark"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Hurst R/S long-memory probe on the daily click series
# ---------------------------------------------------------------------------

_HURST_SQL = """
daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'click' GROUP BY 1
),
sizes AS (SELECT CAST(n AS BIGINT) AS n FROM (VALUES (5), (10), (15)) t(n)),
blocks AS (
  SELECT s.n, d.d // s.n AS blk, d.d, d.x,
         SUM(d.x) OVER (PARTITION BY s.n, d.d // s.n ORDER BY d.d) AS cum_x,
         (ROW_NUMBER() OVER (PARTITION BY s.n, d.d // s.n ORDER BY d.d))
           AS k,
         CAST(SUM(d.x) OVER (PARTITION BY s.n, d.d // s.n) AS BIGINT) AS sx,
         CAST(SUM(d.x * d.x) OVER (PARTITION BY s.n, d.d // s.n) AS BIGINT)
           AS sxx
  FROM daily d CROSS JOIN sizes s
),
dev AS (
  SELECT n, blk,
         CAST(cum_x AS DOUBLE) - k * (CAST(sx AS DOUBLE) / n) AS cdev,
         sx, sxx
  FROM blocks
),
rs AS (
  SELECT CAST(n AS INTEGER) AS n, CAST(blk AS INTEGER) AS blk,
         MAX(cdev) - MIN(cdev) AS r_stat,
         sqrt((CAST(MAX(sxx) AS DOUBLE)
               - CAST(MAX(sx) AS DOUBLE) * MAX(sx) / n) / n) AS s_stat
  FROM dev GROUP BY n, blk
)
SELECT n, blk, ROUND(r_stat, 6) AS r_stat, ROUND(s_stat, 6) AS s_stat,
       ROUND(r_stat / s_stat, 6) AS rs_ratio,
       ROUND(log2(r_stat / s_stat) / log2(CAST(n AS DOUBLE)), 6)
         AS h_point_estimate
FROM rs
ORDER BY n, blk
"""


@register(
    "events_hurst_rs_clicks",
    oracle="WITH " + _HURST_SQL,
    tags=("ext", "events", "timeseries", "hurst"),
    description="Hurst R/S long-memory statistics on daily click counts",
)
def events_hurst_rs_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) analysis, the classical long-memory /
    self-similarity probe: the 30-day click series is cut into
    blocks of 5/10/15 days; per block, R = range of the cumulative
    deviations from the block mean and S = population std — their
    ratio grows ~ n^H. Output is the per-block R/S table (the
    log-log regression input). Determinism: the series values are
    counts, so cumulative sums are exact integers, S comes from the
    integer moment identity, and every double is a single closed-
    form expression. Scale: the fact scan reduces to one row per
    day; everything after is windows over a 30-row series."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "click")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    sizes = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(10), F.lit(15))).alias("n")
    )
    blk = F.expr("d div n")
    wb = Window.partitionBy("n", "blk").orderBy("d")
    wall = Window.partitionBy("n", "blk")
    blocks = (
        daily.crossJoin(F.broadcast(sizes))
        .withColumn("blk", blk)
        .select(
            "n",
            "blk",
            "d",
            "x",
            F.sum("x").over(wb).alias("cum_x"),
            F.row_number().over(wb).alias("k"),
            F.sum("x").over(wall).cast("long").alias("sx"),
            F.sum(F.col("x") * F.col("x")).over(wall).cast("long").alias("sxx"),
        )
    )
    dev = blocks.select(
        "n",
        "blk",
        (
            F.col("cum_x").cast("double")
            - F.col("k") * (F.col("sx").cast("double") / F.col("n"))
        ).alias("cdev"),
        "sx",
        "sxx",
    )
    rs = (
        dev.groupBy("n", "blk")
        .agg(
            (F.max("cdev") - F.min("cdev")).alias("r_stat"),
            F.sqrt(
                (
                    F.max("sxx").cast("double")
                    - F.max("sx").cast("double") * F.max("sx") / F.col("n")
                )
                / F.col("n")
            ).alias("s_stat"),
        )
    )
    return rs.select(
        F.col("n").cast("int").alias("n"),
        F.col("blk").cast("int").alias("blk"),
        F.round("r_stat", 6).alias("r_stat"),
        F.round("s_stat", 6).alias("s_stat"),
        F.round(F.col("r_stat") / F.col("s_stat"), 6).alias("rs_ratio"),
        F.round(
            F.log2(F.col("r_stat") / F.col("s_stat"))
            / F.log2(F.col("n").cast("double")),
            6,
        ).alias("h_point_estimate"),
    ).orderBy("n", "blk")


# ---------------------------------------------------------------------------
# Hash-function battery
# ---------------------------------------------------------------------------

_HASH_SQL = """
SELECT p_partkey,
       md5(p_name) AS h_md5,
       sha256(p_name) AS h_sha256,
       upper(substr(md5(p_name), 1, 8)) AS h_md5_prefix,
       CAST(length(sha256(p_name)) AS INTEGER) AS sha_len,
       md5(p_name || '|' || p_brand) AS h_compound
FROM part WHERE p_partkey < 200
ORDER BY p_partkey
"""


@register(
    "hash_functions_battery",
    oracle=_HASH_SQL,
    tags=("functions", "hash"),
    description="cryptographic-hash battery: md5 / sha256 / compound keys",
)
def hash_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hashing surface — the primitive under content
    fingerprints, shard routing, and salted keys everywhere else in
    this engine. md5/sha256 (hex), prefix extraction (the usual
    bucket-id trick), and compound-key hashing with an explicit
    separator (so ('ab','c') never collides with ('a','bc')).
    Scalar, codegen'd, zero shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
        F.upper(F.substring(F.md5("p_name"), 1, 8)).alias("h_md5_prefix"),
        F.length(F.sha2("p_name", 256)).cast("int").alias("sha_len"),
        F.md5(F.concat_ws("|", "p_name", "p_brand")).alias("h_compound"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Bitwise battery (scalar) + bitwise aggregates
# ---------------------------------------------------------------------------

_BITWISE_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS k_and,
       CAST(o_orderkey | 4096 AS BIGINT) AS k_or,
       CAST(xor(o_orderkey, 165) AS BIGINT) AS k_xor,
       CAST(~o_orderkey AS BIGINT) AS k_not,
       CAST(o_orderkey << 3 AS BIGINT) AS k_shl,
       CAST(o_orderkey >> 2 AS BIGINT) AS k_shr,
       CAST(bit_count(o_orderkey) AS INTEGER) AS k_popcount
FROM orders WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@register(
    "bitwise_functions_battery",
    oracle=_BITWISE_SQL,
    tags=("functions", "bitwise"),
    description="scalar bitwise battery: and/or/xor/not, shifts, popcount",
)
def bitwise_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit manipulation — the substrate of bitmap indexes, bloom
    filters, SimHash, and the Z-curve interleave used by the geohash
    operator. AND/OR/XOR/NOT, shifts, and popcount over the key
    column; all JVM-codegen scalar expressions."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").cast("long").alias("k_and"),
        F.expr("o_orderkey | 4096").cast("long").alias("k_or"),
        F.expr("o_orderkey ^ 165").cast("long").alias("k_xor"),
        F.expr("~o_orderkey").cast("long").alias("k_not"),
        F.expr("shiftleft(o_orderkey, 3)").cast("long").alias("k_shl"),
        F.expr("shiftright(o_orderkey, 2)").cast("long").alias("k_shr"),
        F.bit_count("o_orderkey").cast("int").alias("k_popcount"),
    ).orderBy("o_orderkey")


_BITAGG_SQL = """
SELECT o_orderstatus,
       CAST(bit_and(o_orderkey & 1023) AS BIGINT) AS keys_bit_and,
       CAST(bit_or(o_orderkey & 1023) AS BIGINT) AS keys_bit_or,
       CAST(bit_xor(o_orderkey & 1023) AS BIGINT) AS keys_bit_xor,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "bitwise_agg_by_status",
    oracle=_BITAGG_SQL,
    tags=("functions", "bitwise", "agg"),
    description="bit_and / bit_or / bit_xor aggregates per order status",
)
def bitwise_agg_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate functions — XOR-folding is the classic
    set-reconciliation primitive (a disappeared-row detector: the
    XOR of all keys changes iff an odd subset changed) and AND/OR
    fold to feature masks. Commutative/associative, so they partial-
    aggregate map-side like any algebraic aggregate — the property
    that makes them usable as 100 TB checksums."""
    o = load_table(spark, sf_dir, "orders")
    masked = F.expr("o_orderkey & 1023")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and(masked).cast("long").alias("keys_bit_and"),
            F.bit_or(masked).cast("long").alias("keys_bit_or"),
            F.bit_xor(masked).cast("long").alias("keys_bit_xor"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# String pad / split / translate battery
# ---------------------------------------------------------------------------

_PAD_SQL = """
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS first_word,
       split_part(p_name, ' ', 2) AS second_word,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(p_brand, 12, '.') AS brand_padded,
       repeat(left(p_name, 2), 3) AS stutter,
       reverse(p_name) AS name_rev,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       right(p_type, 4) AS type_tail,
       printf('%06d|%s', p_partkey, p_brand) AS composite_id
FROM part WHERE p_partkey < 200
ORDER BY p_partkey
"""


@register(
    "string_pad_split_battery",
    oracle=_PAD_SQL,
    tags=("functions", "string"),
    description="split_part/lpad/rpad/repeat/reverse/translate/format battery",
)
def string_pad_split_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-width / tokenized string surface: split_part for
    delimited field extraction, lpad for sortable zero-padded keys
    (the trick that makes string sort order match numeric order in
    file layouts), translate for character-class mapping, and
    printf-style composite-id formatting (format_string on the
    Spark side, printf in DuckDB — same C format spec)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.repeat(F.expr("left(p_name, 2)"), 3).alias("stutter"),
        F.reverse("p_name").alias("name_rev"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.expr("right(p_type, 4)").alias("type_tail"),
        F.format_string("%06d|%s", "p_partkey", "p_brand").alias(
            "composite_id"
        ),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# URL construction / parsing battery
# ---------------------------------------------------------------------------

_URL_ORACLE = """
WITH u AS (
  SELECT p_partkey,
         'https://shop.example.com/part/' || p_partkey
           || '?brand=' || replace(p_brand, '#', '-')
           || '&size=' || p_size AS url,
         'Brand ' || p_size AS raw_q
  FROM part WHERE p_partkey < 200
)
SELECT p_partkey, url,
       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]brand=([^&]*)', 1) AS q_brand,
       regexp_extract(url, '[?&]size=([^&]*)', 1) AS q_size,
       replace(raw_q, ' ', '+') AS q_encoded
FROM u
ORDER BY p_partkey
"""


@register(
    "url_parse_battery",
    oracle=_URL_ORACLE,
    tags=("functions", "string", "url"),
    description="URL build + parse_url HOST/PATH/QUERY-key extraction",
)
def url_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weblog-style URL handling: build a canonical URL, then tear
    it apart with parse_url (HOST / PATH / keyed QUERY param) and
    form-encode a query string (url_encode). The oracle twin proves
    the extraction semantics against plain regex — parse_url is
    just the codegen'd fast path for the same grammar. In a CommonCrawl
    -scale pipeline this is the per-row normalizer that precedes
    host-level dedup and robots filtering."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    u = p.select(
        "p_partkey",
        F.concat(
            F.lit("https://shop.example.com/part/"),
            F.col("p_partkey").cast("string"),
            F.lit("?brand="),
            F.translate("p_brand", "#", "-"),
            F.lit("&size="),
            F.col("p_size").cast("string"),
        ).alias("url"),
        F.concat(F.lit("Brand "), F.col("p_size").cast("string")).alias(
            "raw_q"
        ),
    )
    return u.select(
        "p_partkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("brand")).alias("q_brand"),
        F.parse_url("url", F.lit("QUERY"), F.lit("size")).alias("q_size"),
        F.url_encode("raw_q").alias("q_encoded"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Exact median without a global sort: two-pass bucketed selection
# ---------------------------------------------------------------------------

_MEDIAN2P_ORACLE = """
WITH base AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
ranked AS (
  SELECT l_returnflag, cents,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM base
)
SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
         AS median_cents
FROM ranked
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "exact_median_two_pass",
    oracle=_MEDIAN2P_ORACLE,
    tags=("ext", "quantile", "scale-pattern"),
    description="exact median via histogram-then-refine (no global sort)",
)
def exact_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed median WITHOUT sorting the fact table: pass
    1 histograms prices into $1000 buckets per group (one hash agg),
    locates the bucket containing the target rank from the cumulative
    histogram; pass 2 re-scans only that bucket's rows and takes the
    residual rank within it. The oracle computes the same lower
    median by brute-force ROW_NUMBER. At 100 TB the global-sort
    median shuffles the whole table; this shape shuffles one
    histogram (≈ groups x buckets rows) plus one bucket's rows —
    the classic selection-by-refinement pattern (BLINKDB/quantile
    literature), and it iterates to any rank, not just 0.5."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    width = 100_000  # $1000 buckets
    hist = (
        base.withColumn("bucket", F.expr(f"cents div {width}"))
        .groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "bucket",
        F.sum("c").over(wcum).alias("cum"),
        (F.sum("c").over(wcum) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wall).alias("n"),
    ).withColumn("k", F.expr("(n + 1) div 2"))
    target = (
        cum.filter(F.col("cum") >= F.col("k"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("l_returnflag").orderBy("bucket")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("l_returnflag", "bucket", "cum_before", "n", "k")
    )
    refined = (
        base.join(F.broadcast(target), "l_returnflag")
        .filter(F.expr(f"cents div {width}") == F.col("bucket"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("l_returnflag").orderBy("cents")
            ),
        )
        .filter(F.col("rn") == F.col("k") - F.col("cum_before"))
    )
    return refined.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("median_cents"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Double-entry reconciliation: order header totals vs line-item sums
# ---------------------------------------------------------------------------

_RECON_SQL = """
li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
           AS computed_cents
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS header_cents,
         li.computed_cents,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) - li.computed_cents
           AS diff_cents
  FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN diff_cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact,
         CAST(SUM(CASE WHEN diff_cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_header_high,
         CAST(SUM(CASE WHEN diff_cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_header_low,
         CAST(MAX(abs(diff_cents)) AS BIGINT) AS max_abs_diff_cents,
         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(diff_cents))
              AS BIGINT) AS p50_abs_diff_cents
  FROM j
),
orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_no_lines
  FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
)
SELECT a.*, o.n_orders_no_lines FROM agg a CROSS JOIN orphans o
"""


@register(
    "orders_totalprice_reconciliation",
    oracle="WITH " + _RECON_SQL,
    tags=("ext", "data-quality", "reconciliation"),
    description="double-entry audit: header totalprice vs line-item sum",
)
def orders_totalprice_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The double-entry audit every warehouse runs between a header
    table and its detail table: recompute each order's total from
    its line items (exact cents, rounded per line exactly as a
    billing system would), diff against the stored header total,
    and profile the mismatches — exact-match count, direction of
    drift, worst and median absolute discrepancy, plus headers with
    no detail rows at all (anti-join). One shuffle to the order
    grain; everything downstream is a scalar aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    computed = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        )
        .cast("long")
        .alias("computed_cents")
    )
    j = o.join(computed, o.o_orderkey == computed.l_orderkey).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
        "computed_cents",
        (
            F.round(F.col("o_totalprice") * 100).cast("long")
            - F.col("computed_cents")
        ).alias("diff_cents"),
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("diff_cents") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(F.when(F.col("diff_cents") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_header_high"),
        F.sum(F.when(F.col("diff_cents") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_header_low"),
        F.max(F.abs("diff_cents")).cast("long").alias("max_abs_diff_cents"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(diff_cents))"
        )
        .cast("long")
        .alias("p50_abs_diff_cents"),
    )
    orphans = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
        "o_orderkey",
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders_no_lines"))
    return agg.crossJoin(F.broadcast(orphans))


# ---------------------------------------------------------------------------
# Flesch reading-ease signals per document
# ---------------------------------------------------------------------------

_FLESCH_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_words,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
              AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents WHERE length(trim(text)) > 0
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
         AS flesch_score
FROM m
ORDER BY doc_id
"""


@register(
    "text_readability_flesch",
    oracle=_FLESCH_ORACLE,
    tags=("ext", "text", "quality"),
    description="Flesch reading-ease score per document",
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability as a corpus-quality gate (the C4/Gopher filter
    family): words by whitespace tokenization, sentences by
    terminal-punctuation runs (floored at 1), syllables by the
    standard vowel-group approximation, folded into the Flesch
    reading-ease formula. Pure scalar regex — codegen'd, shuffle-
    free, embarrassingly parallel over a 100 TB corpus."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    m = d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_words"),
        F.greatest(
            F.lit(1), F.regexp_count("text", F.lit(r"[.!?]+"))
        )
        .cast("long")
        .alias("n_sentences"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("n_syllables"),
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
            4,
        ).alias("flesch_score"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Ranking-quality evaluation: nDCG@10 of cosine retrieval vs labels
# ---------------------------------------------------------------------------

_NDCG_ORACLE = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
q AS (SELECT vec_id AS query_id, label AS qlabel, e AS qe
      FROM v WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, q.qlabel, v.vec_id, v.label,
         list_dot_product(q.qe, v.e)
         / (sqrt(list_dot_product(q.qe, q.qe))
            * sqrt(list_dot_product(v.e, v.e))) AS c
  FROM q, v WHERE v.vec_id != q.query_id
),
ranked AS (
  SELECT query_id,
         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY c DESC, vec_id) AS rk
  FROM scored
),
top AS (SELECT * FROM ranked WHERE rk <= 10),
idcg AS (
  SELECT SUM(1.0 / log2(CAST(i AS DOUBLE) + 1)) AS ideal
  FROM generate_series(1, 10) t(i)
)
SELECT t.query_id,
       CAST(SUM(t.rel) AS BIGINT) AS n_rel_top10,
       ROUND(SUM(t.rel / log2(CAST(t.rk AS DOUBLE) + 1)), 6) AS dcg10,
       ROUND(SUM(t.rel / log2(CAST(t.rk AS DOUBLE) + 1)) / MAX(i.ideal), 6)
         AS ndcg10
FROM top t CROSS JOIN idcg i
GROUP BY t.query_id
ORDER BY t.query_id
"""


@register(
    "retrieval_ndcg_label_eval",
    oracle=_NDCG_ORACLE,
    tags=("ext", "retrieval", "model-eval", "ndcg"),
    description="nDCG@10 of cosine retrieval scored against labels",
)
def retrieval_ndcg_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation: treat each query vector's label
    as graded relevance (1 if a retrieved neighbor shares the
    label), rank the corpus by exact cosine, and compute DCG@10 /
    nDCG@10. Every label has ≥10 corpus members, so the ideal DCG
    is the closed-form first-10 sum — computed, not assumed, on
    both sides. Broadcast queries x corpus scan, window top-10, one
    10-row aggregate per query: the evaluation harness shape that
    scales to any corpus because only top-k rows leave the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    from wilayah_aceh_etl_spark.operators import similarity as S

    queries = emb.filter(F.col("vec_id") < 5)
    topk = S.brute_force_topk(emb, queries, k=10)
    labels = emb.select("vec_id", "label")
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    top = (
        topk.join(F.broadcast(labels), "vec_id")
        .join(F.broadcast(qlab), "query_id")
        .select(
            "query_id",
            F.when(F.col("label") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("rel"),
            "rk",
        )
    )
    idcg = spark.range(1, 11).agg(
        F.sum(1.0 / F.log2(F.col("id").cast("double") + 1)).alias("ideal")
    )
    return (
        top.crossJoin(F.broadcast(idcg))
        .groupBy("query_id")
        .agg(
            F.sum("rel").cast("long").alias("n_rel_top10"),
            F.round(
                F.sum(F.col("rel") / F.log2(F.col("rk").cast("double") + 1)),
                6,
            ).alias("dcg10"),
            F.round(
                F.sum(F.col("rel") / F.log2(F.col("rk").cast("double") + 1))
                / F.max("ideal"),
                6,
            ).alias("ndcg10"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Average precision (area under the PR curve, exact order-deterministic)
# ---------------------------------------------------------------------------

_AP_SQL = """
t AS (
  SELECT c.c_custkey, CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS cents,
         CASE WHEN EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
              THEN 1 ELSE 0 END AS y
  FROM customer c
),
ranked AS (
  SELECT y,
         ROW_NUMBER() OVER (ORDER BY cents DESC, c_custkey) AS k,
         SUM(y) OVER (ORDER BY cents DESC, c_custkey) AS cum_pos
  FROM t
),
running AS (
  SELECT k, y, cum_pos,
         SUM(CASE WHEN y = 1
                  THEN CAST(cum_pos AS DOUBLE) / k ELSE 0 END)
           OVER (ORDER BY k) AS cum_ap_num,
         SUM(y) OVER () AS n_pos,
         COUNT(*) OVER () AS n
  FROM ranked
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(n_pos) AS BIGINT) AS n_pos,
       ROUND(MAX(cum_ap_num) / MAX(n_pos), 6) AS average_precision
FROM running
"""


@register(
    "model_eval_average_precision",
    oracle="WITH " + _AP_SQL,
    tags=("ext", "model-eval", "pr-curve", "window"),
    description="exact average precision of balance→urgent-order ranking",
)
def model_eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve) of
    the same score/label pair as the ROC-AUC query — AP is the
    metric that stays honest under class imbalance. The per-positive
    precision@k terms are accumulated via an ORDERED window sum, not
    a hash aggregate, so the floating-point addition order is the
    rank order on both engines — bit-deterministic by construction.
    One global sort + two windows; the same sort-bound profile as
    every rank metric at scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    t = cust.join(urgent.withColumn("y", F.lit(1)), "c_custkey", "left").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    wo = Window.orderBy(F.col("cents").desc(), "c_custkey")
    ranked = t.select(
        "y",
        F.row_number().over(wo).alias("k"),
        F.sum("y")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_pos"),
    )
    wk = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    running = ranked.select(
        "k",
        "y",
        F.sum(
            F.when(
                F.col("y") == 1, F.col("cum_pos").cast("double") / F.col("k")
            ).otherwise(0.0)
        )
        .over(wk)
        .alias("cum_ap_num"),
        F.sum("y").over(wall).alias("n_pos"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    return running.agg(
        F.max("n").cast("long").alias("n"),
        F.max("n_pos").cast("long").alias("n_pos"),
        F.round(F.max("cum_ap_num") / F.max("n_pos"), 6).alias(
            "average_precision"
        ),
    )


# ---------------------------------------------------------------------------
# Map higher-order functions battery
# ---------------------------------------------------------------------------

_MAP_HOF_ORACLE = """
SELECT o_orderkey,
       'PRIORITY=' || o_orderpriority || ',STATUS=' || o_orderstatus
         AS keys_upper,
       'priority=' || upper(o_orderpriority) || ',status='
         || upper(o_orderstatus) AS vals_upper,
       CASE WHEN o_orderstatus = 'O' THEN 'status=O' ELSE '' END
         AS only_open,
       'priority=' || o_orderpriority || '|' || length(o_orderpriority)
         || ',status=' || o_orderstatus || '|' || length(o_orderstatus)
         AS zipped,
       'priority=' || o_orderpriority || ',status=' || o_orderstatus
         || ',total=' || CAST(ROUND(o_totalprice * 100) AS BIGINT)
         AS merged
FROM orders WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@register(
    "map_hof_battery",
    oracle=_MAP_HOF_ORACLE,
    tags=("functions", "map", "hof"),
    description="map HOFs: transform_keys/values, map_filter, map_zip_with, map_concat",
)
def map_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over MapType — the lambda surface the
    map battery left out: transform_keys / transform_values (per-
    entry rewrite without exploding), map_filter (predicate prune),
    map_zip_with (two maps merged entry-wise), map_concat. Each
    result folds to a sorted entries string so the cross-engine hash
    is order-stable (map iteration order is an implementation
    detail; serialized comparisons must never depend on it). The
    oracle constructs the expected strings directly — proving the
    HOF semantics, not just echoing them. All lambdas evaluate
    inside codegen; zero shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    m = F.create_map(
        F.lit("status"),
        F.col("o_orderstatus"),
        F.lit("priority"),
        F.col("o_orderpriority"),
    )

    def entries_str(mcol):
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(mcol),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                )
            ),
            ",",
        )

    m2 = F.create_map(
        F.lit("status"),
        F.length("o_orderstatus"),
        F.lit("priority"),
        F.length("o_orderpriority"),
    )
    merged = F.map_concat(
        m,
        F.create_map(
            F.lit("total"),
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        ),
    )
    return o.select(
        "o_orderkey",
        entries_str(F.transform_keys(m, lambda k, v: F.upper(k))).alias(
            "keys_upper"
        ),
        entries_str(F.transform_values(m, lambda k, v: F.upper(v))).alias(
            "vals_upper"
        ),
        entries_str(
            F.map_filter(m, lambda k, v: (k == "status") & (v == "O"))
        ).alias("only_open"),
        entries_str(
            F.map_zip_with(
                m,
                m2,
                lambda k, v1, v2: F.concat(
                    v1, F.lit("|"), v2.cast("string")
                ),
            )
        ).alias("zipped"),
        entries_str(merged).alias("merged"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# MATTR lexical diversity (windowed type-token ratio)
# ---------------------------------------------------------------------------

_MATTR_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(l) AS tok,
         generate_subscripts(l, 1) - 1 AS pos
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents WHERE length(trim(text)) > 0)
),
wins AS (
  SELECT doc_id, pos // 25 AS w,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
  FROM toks GROUP BY doc_id, pos // 25
),
full_wins AS (SELECT * FROM wins WHERE n_tok = 25)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       ROUND(CAST(SUM(n_types) AS DOUBLE) / (25 * COUNT(*)), 6) AS mattr25
FROM full_wins
GROUP BY doc_id
ORDER BY doc_id
"""


@register(
    "text_mattr_diversity",
    oracle=_MATTR_ORACLE,
    tags=("ext", "text", "quality", "diversity"),
    description="MATTR-25 lexical diversity (windowed type-token ratio)",
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity that doesn't collapse with document length:
    plain type-token ratio shrinks as docs grow (Heaps' law), so
    quality filters use windowed TTR — here disjoint 25-token
    windows, MATTR = Σ types / (25·windows). The mean of exact
    integer type counts is a single division, so no float
    accumulation. Shape: explode to tokens with position (the same
    posexplode spine as the chunking operators), two hash aggs —
    token work stays partition-local until the per-doc reduce."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    )
    wins = (
        toks.groupBy("doc_id", F.expr("pos div 25").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.countDistinct("tok").cast("long").alias("n_types"),
        )
        .filter(F.col("n_tok") == 25)
    )
    return (
        wins.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.round(
                F.sum("n_types").cast("double")
                / (25 * F.count(F.lit(1))),
                6,
            ).alias("mattr25"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bootstrap confidence interval with a deterministic LCG resampler
# ---------------------------------------------------------------------------

_BOOT_SQL = """
daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
idx AS (
  SELECT r.r, i.i,
         ((1103515245 * (r.r * 1000 + i.i) + 12345) % 2147483648) % 30
           AS pick
  FROM generate_series(1, 20) r(r) CROSS JOIN generate_series(1, 30) i(i)
),
reps AS (
  SELECT idx.r,
         CAST(SUM(daily.cents) AS BIGINT) AS tot
  FROM idx JOIN daily ON daily.d = idx.pick
  GROUP BY idx.r
),
means AS (SELECT r, CAST(tot AS DOUBLE) / 30 AS m FROM reps),
point AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS tot_all,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily
)
SELECT CAST(20 AS BIGINT) AS n_replicates,
       ROUND(CAST(p.tot_all AS DOUBLE) / p.n_days, 2) AS point_mean_cents,
       ROUND(percentile_disc(0.05) WITHIN GROUP (ORDER BY m), 2)
         AS ci_lo_cents,
       ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY m), 2)
         AS ci_mid_cents,
       ROUND(percentile_disc(0.95) WITHIN GROUP (ORDER BY m), 2)
         AS ci_hi_cents
FROM means CROSS JOIN point p
GROUP BY p.tot_all, p.n_days
"""


@register(
    "stats_bootstrap_ci_daily_value",
    oracle="WITH " + _BOOT_SQL,
    tags=("ext", "stats", "bootstrap", "resampling"),
    description="bootstrap CI of mean daily event value via seeded LCG",
)
def stats_bootstrap_ci_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric bootstrap without nondeterministic RNG: 20
    resamples of the 30-day daily-value series drawn by an explicit
    LCG (the glibc constants) keyed on (replicate, draw), so both
    engines — and any re-run — pick the identical indexes. Replicate
    means are exact integer cent sums / 30; the CI is percentile_disc
    over the 20 means. The resample is expressed as a JOIN against
    the aggregated daily series — at 100 TB you bootstrap the
    AGGREGATE (30 rows), never the raw events, which is what makes
    resampling tractable at scale."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    reps_idx = (
        spark.range(1, 21)
        .select(F.col("id").alias("r"))
        .crossJoin(spark.range(1, 31).select(F.col("id").alias("i")))
        .select(
            "r",
            (
                (
                    (1103515245 * (F.col("r") * 1000 + F.col("i")) + 12345)
                    % 2147483648
                )
                % 30
            ).alias("pick"),
        )
    )
    reps = (
        reps_idx.join(F.broadcast(daily), reps_idx.pick == daily.d)
        .groupBy("r")
        .agg(F.sum("cents").cast("long").alias("tot"))
        .select("r", (F.col("tot").cast("double") / 30).alias("m"))
    )
    point = daily.agg(
        F.sum("cents").cast("long").alias("tot_all"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return reps.crossJoin(F.broadcast(point)).agg(
        F.lit(20).cast("long").alias("n_replicates"),
        F.round(
            F.max(F.col("tot_all").cast("double") / F.col("n_days")), 2
        ).alias("point_mean_cents"),
        F.round(
            F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY m)"), 2
        ).alias("ci_lo_cents"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY m)"), 2
        ).alias("ci_mid_cents"),
        F.round(
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY m)"), 2
        ).alias("ci_hi_cents"),
    )


# ---------------------------------------------------------------------------
# Poisson rate-ratio test: error rate, first half vs second half
# ---------------------------------------------------------------------------

_POISSON_SQL = """
c AS (
  SELECT
    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
         AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
         AS BIGINT) AS c2
  FROM events WHERE event_type = 'error'
)
SELECT c1, c2,
       ROUND(CAST(c1 AS DOUBLE) / 15, 6) AS rate1_per_day,
       ROUND(CAST(c2 AS DOUBLE) / 15, 6) AS rate2_per_day,
       ROUND(CAST(c2 AS DOUBLE) / c1, 6) AS rate_ratio,
       ROUND((CAST(c1 AS DOUBLE) - 0.5 * (c1 + c2))
             / sqrt(0.25 * (CAST(c1 AS DOUBLE) + c2)), 6) AS z_binomial
FROM c
"""


@register(
    "events_poisson_rate_test",
    oracle="WITH " + _POISSON_SQL,
    tags=("ext", "events", "stats", "monitoring"),
    description="Poisson rate-ratio test: error rate first vs second half",
)
def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the error rate change? The conditional (binomial) test
    for comparing two Poisson counts with equal exposure: given
    c1+c2 events, under H0 the first-window count is
    Binomial(c1+c2, 1/2); the normal-approximation z-score falls
    out in closed form from the two exact counts. This is the
    incident-detection arithmetic an ops pipeline runs per
    deployment window — one filtered scan, one two-cell aggregate,
    O(1) result regardless of input size."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    cutoff = F.lit("2024-01-16").cast("timestamp")
    c = e.agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    return c.select(
        "c1",
        "c2",
        F.round(F.col("c1").cast("double") / 15, 6).alias("rate1_per_day"),
        F.round(F.col("c2").cast("double") / 15, 6).alias("rate2_per_day"),
        F.round(F.col("c2").cast("double") / F.col("c1"), 6).alias(
            "rate_ratio"
        ),
        F.round(
            (F.col("c1").cast("double") - 0.5 * (F.col("c1") + F.col("c2")))
            / F.sqrt(0.25 * (F.col("c1").cast("double") + F.col("c2"))),
            6,
        ).alias("z_binomial"),
    )


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation: clicks vs purchases at lags -3..+3
# ---------------------------------------------------------------------------

_CCF_SQL = """
daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clicks,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS buys
  FROM events GROUP BY 1
),
lags AS (SELECT CAST(l AS BIGINT) AS lag FROM generate_series(-3, 3) t(l)),
paired AS (
  SELECT lags.lag, a.clicks AS x, b.buys AS y
  FROM lags
  JOIN daily a ON TRUE
  JOIN daily b ON b.d = a.d + lags.lag
),
mom AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM paired GROUP BY lag
),
ccf AS (
  SELECT CAST(lag AS INTEGER) AS lag, n,
         ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
               6) AS ccf
  FROM mom
)
SELECT lag, n, ccf,
       CASE WHEN ROW_NUMBER() OVER (ORDER BY abs(ccf) DESC, lag) = 1
            THEN 1 ELSE 0 END AS is_peak
FROM ccf
ORDER BY lag
"""


@register(
    "events_ccf_lead_lag",
    oracle="WITH " + _CCF_SQL,
    tags=("ext", "events", "timeseries", "correlation"),
    description="cross-correlation of clicks vs purchases at lags -3..+3",
)
def events_ccf_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag discovery: the cross-correlation function between
    the daily click series and the purchase series shifted by -3..+3
    days, peak flagged — the standard question 'does engagement lead
    conversion, and by how much?'. The shifted pairing is a self-
    join of the 30-row daily aggregate against a 7-row lag dim (the
    fact table is reduced FIRST — at 100 TB the CCF costs one scan
    plus a toy join). Pearson per lag from exact integer moments."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("buys"),
    )
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    a = daily.select(F.col("d").alias("da"), F.col("clicks").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("buys").alias("y"))
    paired = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    mom = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    ccf = mom.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.round(
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / (
                F.sqrt(
                    F.col("n") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                * F.sqrt(
                    F.col("n") * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy")
                )
            ),
            6,
        ).alias("ccf"),
    )
    return ccf.select(
        "lag",
        "n",
        "ccf",
        F.when(
            F.row_number().over(
                Window.orderBy(F.abs("ccf").desc(), "lag")
            )
            == 1,
            1,
        )
        .otherwise(0)
        .alias("is_peak"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# Streaming stateful EWMA (order-sensitive custom state machine)
# ---------------------------------------------------------------------------

_STREAM_EWMA_ORACLE = """
WITH RECURSIVE seq AS (
  SELECT user_id, ROUND(value, 2) AS x,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id < 20
),
nmax AS (SELECT user_id, MAX(rn) AS tmax FROM seq GROUP BY 1),
ewma AS (
  SELECT user_id, rn, CAST(x AS DOUBLE) AS e FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, 0.2 * s.x + 0.8 * w.e
  FROM seq s JOIN ewma w ON s.user_id = w.user_id AND s.rn = w.rn + 1
)
SELECT w.user_id, CAST(n.tmax AS BIGINT) AS n_events,
       ROUND(w.e, 6) AS ewma_02
FROM ewma w JOIN nmax n ON n.user_id = w.user_id AND w.rn = n.tmax
ORDER BY w.user_id
"""


@register(
    "streaming_ewma_per_user",
    oracle=_STREAM_EWMA_ORACLE,
    tags=("streaming", "stateful", "applyInPandasWithState", "ewma"),
    description="stateful streaming EWMA per user, oracle-checked",
)
def streaming_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORDER-SENSITIVE arbitrary-stateful streaming class: a
    per-user EWMA through applyInPandasWithState, where correctness
    depends on folding each micro-batch in event-time order (the
    running-totals op is commutative; this one is not — it carries
    the sequential recurrence of events_ewma_per_user into the
    streaming runtime). The staged source fits one availableNow
    batch, so the single update emission per user is the final
    state, checked against the recursive-CTE oracle bit-for-bit
    after both sides fold literally 0.2*x + 0.8*e. Values are
    pre-rounded ENGINE-side (Spark half-up = DuckDB half-away;
    pandas half-even would diverge)."""
    import uuid

    from wilayah_aceh_etl_spark.plans.events_queries import _stage_events
    from wilayah_aceh_etl_spark.streaming import (
        read_event_stream,
        running_user_ewma,
    )

    staged = _stage_events(spark, sf_dir)
    name = f"stream_ewma_{uuid.uuid4().hex[:8]}"
    src = (
        read_event_stream(spark, staged)
        .filter(F.col("user_id") < 20)
        .withColumn("value", F.round("value", 2))
    )
    q = (
        running_user_ewma(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .select("user_id", "n_events", F.round("ewma_02", 6).alias("ewma_02"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive (triple exponential smoothing, period 7)
# ---------------------------------------------------------------------------

_HW_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
),
init AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN t <= 7 THEN y END) AS BIGINT) AS sa,
         CAST(SUM(CASE WHEN t BETWEEN 8 AND 14 THEN y END) AS BIGINT) AS sb
  FROM idx GROUP BY 1
),
anchor AS (
  SELECT i.event_type, 7 AS t,
         CAST(i.sa AS DOUBLE) / 7 AS l,
         (CAST(i.sb AS DOUBLE) / 7 - CAST(i.sa AS DOUBLE) / 7) / 7 AS b,
         list(CAST(x.y AS DOUBLE) - CAST(i.sa AS DOUBLE) / 7
              ORDER BY x.t) AS s,
         CAST(NULL AS DOUBLE) AS fitted,
         CAST(NULL AS BIGINT) AS y
  FROM init i JOIN idx x ON x.event_type = i.event_type AND x.t <= 7
  GROUP BY i.event_type, i.sa, i.sb
),
rec AS (
  SELECT * FROM anchor
  UNION ALL
  SELECT r.event_type, r.t + 1,
         0.3 * (i.y - r.s[1]) + 0.7 * (r.l + r.b),
         0.1 * ((0.3 * (i.y - r.s[1]) + 0.7 * (r.l + r.b)) - r.l)
           + 0.9 * r.b,
         list_append(r.s[2:7],
           0.2 * (i.y - (0.3 * (i.y - r.s[1]) + 0.7 * (r.l + r.b)))
             + 0.8 * r.s[1]),
         r.l + r.b + r.s[1],
         i.y
  FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.t = r.t + 1
)
SELECT event_type, CAST(t AS INTEGER) AS t, y,
       ROUND(fitted, 6) AS fitted,
       ROUND(l, 6) AS level, ROUND(b, 6) AS trend
FROM rec WHERE t >= 8
ORDER BY event_type, t
"""


@register(
    "events_holt_winters_additive",
    oracle=_HW_ORACLE,
    tags=("events", "timeseries", "forecast", "pandas-udf", "sequential"),
    description="Holt-Winters additive smoothing (period 7) per event type",
)
def events_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple exponential smoothing with additive weekly
    seasonality (α=0.3 β=0.1 γ=0.2, period 7) over each type's
    daily count series — level + trend + a 7-slot seasonal register,
    the recurrence family a forecasting pipeline actually runs.
    Initialization is the textbook one: level = mean of week 1,
    trend = (mean of week 2 − mean of week 1)/7, seasonals = week-1
    deviations. Spark side is an applyInPandas grouped map (pre-
    aggregated to ~30 rows per group; per-group state is the 9
    floats); the oracle replays the identical IEEE expression tree
    in a DuckDB recursive CTE whose seasonal register travels as a
    LIST column rotated each step — both engines emit the one-step-
    ahead fit l+b+s_prev before updating. Constants are written
    literally (0.7, 0.9, 0.8), never 1−α, so the multiplications
    are the same doubles on both sides."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        y = [int(v) for v in pdf["y"].tolist()]
        et = pdf["event_type"].iloc[0]
        if len(y) < 15:
            return pd.DataFrame(
                columns=["event_type", "t", "y", "fitted", "level", "trend"]
            )
        sa = sum(y[0:7])
        sb = sum(y[7:14])
        l = sa / 7
        b = (sb / 7 - sa / 7) / 7
        s = [y[i] - sa / 7 for i in range(7)]
        rows = []
        for t in range(8, len(y) + 1):
            yt = y[t - 1]
            s_prev = s[0]
            fitted = l + b + s_prev
            l_new = 0.3 * (yt - s_prev) + 0.7 * (l + b)
            b_new = 0.1 * (l_new - l) + 0.9 * b
            s_new = 0.2 * (yt - l_new) + 0.8 * s_prev
            s = s[1:] + [s_new]
            l, b = l_new, b_new
            rows.append(
                {
                    "event_type": et,
                    "t": t,
                    "y": yt,
                    "fitted": round(fitted, 6),
                    "level": round(l, 6),
                    "trend": round(b, 6),
                }
            )
        return pd.DataFrame(rows)

    out_schema = (
        "event_type string, t int, y long, fitted double, "
        "level double, trend double"
    )
    return (
        daily.groupBy("event_type")
        .applyInPandas(hw, schema=out_schema)
        .orderBy("event_type", "t")
    )


# ---------------------------------------------------------------------------
# Harmonic centrality (3-hop horizon) over the part co-occurrence graph
# ---------------------------------------------------------------------------

_HARMONIC_ORACLE = """
WITH RECURSIVE base AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
pairs AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM base a JOIN base b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
edges AS (
  SELECT pa AS u, pb AS w FROM pairs
  UNION ALL
  SELECT pb AS u, pa AS w FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
walk AS (
  SELECT node AS src, node, 0 AS d FROM nodes
  UNION ALL
  SELECT walk.src, e.w, walk.d + 1
  FROM walk JOIN edges e ON walk.node = e.u
  WHERE walk.d < 3
),
dist AS (
  SELECT src, node, MIN(d) AS d FROM walk
  WHERE src <> node GROUP BY src, node
),
cent AS (
  SELECT src AS part, CAST(COUNT(*) AS BIGINT) AS n_reach3,
         CAST(SUM(6 // d) AS BIGINT) AS harmonic_x6
  FROM dist GROUP BY src
)
SELECT part, n_reach3, harmonic_x6,
       ROUND(CAST(harmonic_x6 AS DOUBLE) / 6, 6) AS harmonic
FROM cent
ORDER BY harmonic_x6 DESC, part
LIMIT 20
"""


@register(
    "graph_harmonic_centrality",
    oracle=_HARMONIC_ORACLE,
    tags=("graph", "centrality", "iterative", "join"),
    description="3-hop harmonic centrality over the part co-occurrence graph",
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality Σ 1/d(u,v), truncated at a 3-hop horizon
    (the standard bounded variant — at web scale nobody runs full
    APSP; hop-limited harmonic is what HyperBall computes with
    sketches). Distances come from the same unrolled-frontier BFS
    as the single-source query but seeded with EVERY node (src
    travels with the frontier, so it is one plan, not |V| jobs).
    Determinism: d ∈ {1,2,3}, so 6/d is an exact integer — the
    centrality is summed as harmonic_x6 ∈ ℕ and divided once.
    Top-20 by exact integer key."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = base.select("ok", F.col("pk").alias("pa"))
    b = base.select("ok", F.col("pk").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("pa", "pb")
    )
    edges = pairs.select(
        F.col("pa").alias("u"), F.col("pb").alias("w")
    ).unionAll(pairs.select(F.col("pb").alias("u"), F.col("pa").alias("w")))
    edges = edges.cache()
    nodes = edges.select(F.col("u").alias("node")).distinct()
    frontier = nodes.select(
        F.col("node").alias("src"), "node", F.lit(0).alias("d")
    )
    walk = frontier
    for _ in range(3):
        frontier = (
            frontier.join(edges, frontier.node == edges.u)
            .select("src", F.col("w").alias("node"), (F.col("d") + 1).alias("d"))
        )
        walk = walk.unionAll(frontier)
    dist = (
        walk.filter(F.col("src") != F.col("node"))
        .groupBy("src", "node")
        .agg(F.min("d").alias("d"))
    )
    cent = dist.groupBy(F.col("src").alias("part")).agg(
        F.count(F.lit(1)).cast("long").alias("n_reach3"),
        F.sum(F.expr("6 div d")).cast("long").alias("harmonic_x6"),
    )
    return (
        cent.select(
            "part",
            "n_reach3",
            "harmonic_x6",
            F.round(F.col("harmonic_x6").cast("double") / 6, 6).alias(
                "harmonic"
            ),
        )
        .orderBy(F.col("harmonic_x6").desc(), "part")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# LISTAGG WITHIN GROUP (ordered string aggregation, SQL:2016)
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
WITH d AS (
  SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
),
k AS (
  SELECT o_orderstatus,
         CAST(MIN(o_orderkey) AS BIGINT) AS first_key
  FROM orders GROUP BY o_orderstatus
)
SELECT d.o_orderpriority,
       listagg(d.o_orderstatus, ',' ORDER BY d.o_orderstatus)
         AS statuses,
       listagg(CAST(k.first_key AS VARCHAR), '|'
               ORDER BY d.o_orderstatus) AS first_keys
FROM d JOIN k ON k.o_orderstatus = d.o_orderstatus
GROUP BY d.o_orderpriority
ORDER BY d.o_orderpriority
"""


@register(
    "sql_listagg_within_group",
    oracle=_LISTAGG_ORACLE,
    tags=("sql-surface", "agg", "listagg"),
    description="LISTAGG ... WITHIN GROUP ordered string aggregation",
)
def sql_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 LISTAGG through the Spark 4 SQL front-end — ordered,
    delimiter-joined string aggregation WITHIN GROUP, the
    report-formatting aggregate (and the only ISO-standard ordered
    aggregate besides the percentile family). The input is first
    reduced to the distinct grain so the aggregated strings stay
    bounded — the discipline that keeps LISTAGG usable at scale,
    where concatenating raw fact rows would OOM the aggregate
    buffer."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
WITH d AS (
  SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
),
k AS (
  SELECT o_orderstatus,
         CAST(MIN(o_orderkey) AS BIGINT) AS first_key
  FROM orders GROUP BY o_orderstatus
)
SELECT d.o_orderpriority,
       listagg(d.o_orderstatus, ',')
         WITHIN GROUP (ORDER BY d.o_orderstatus) AS statuses,
       listagg(CAST(k.first_key AS STRING), '|')
         WITHIN GROUP (ORDER BY d.o_orderstatus) AS first_keys
FROM d JOIN k ON k.o_orderstatus = d.o_orderstatus
GROUP BY d.o_orderpriority
ORDER BY d.o_orderpriority
"""
    )


# ---------------------------------------------------------------------------
# Named WINDOW clause (one spec, many functions)
# ---------------------------------------------------------------------------

_NAMED_WINDOW_SQL = """
SELECT o_orderkey, o_orderstatus,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
            AS BIGINT) AS running_cents,
       CAST(LAG(o_orderkey) OVER w AS BIGINT) AS prev_key
FROM orders
WHERE o_orderkey < 500
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey)
ORDER BY o_orderstatus, rn
"""


@register(
    "sql_named_window_clause",
    oracle=_NAMED_WINDOW_SQL,
    tags=("sql-surface", "window"),
    description="named WINDOW clause: one spec shared by 3 functions",
)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL WINDOW clause: one named specification referenced by
    ROW_NUMBER, a running SUM, and LAG. Besides the syntax surface,
    the named spec is a physical contract — all three functions
    share ONE sort+partition pass in the plan (a single WindowExec),
    where three inline specs risk three sorts; at 100 TB that's the
    difference between one shuffle and three."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_NAMED_WINDOW_SQL)


# ---------------------------------------------------------------------------
# Regexp function battery
# ---------------------------------------------------------------------------

_REGEXP_ORACLE = """
SELECT p_partkey, p_name,
       regexp_extract(p_name, '[a-z]+', 0) AS first_word_rx,
       CASE WHEN regexp_extract(p_name, '[aeiou][a-z]*', 0) = '' THEN 0
            ELSE strpos(p_name, regexp_extract(p_name, '[aeiou][a-z]*', 0))
       END AS vowel_word_pos,
       array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), '|')
         AS all_words,
       CAST(len(regexp_extract_all(p_name, '([aeiou])', 1)) AS INTEGER)
         AS n_vowels,
       regexp_replace(p_name, '^([a-z]+) ([a-z]+)$', '\\2 \\1')
         AS swapped,
       CASE WHEN regexp_matches(p_name, '^(red|blue|green)') THEN 1 ELSE 0
       END AS is_color_prefixed
FROM part WHERE p_partkey < 200
ORDER BY p_partkey
"""


@register(
    "regexp_functions_battery",
    oracle=_REGEXP_ORACLE,
    tags=("functions", "regexp", "string"),
    description="regexp battery: substr/instr/extract_all/backref-replace",
)
def regexp_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full regexp surface beyond plain regexp_extract:
    regexp_substr (first match or empty), match position, extract-
    all folded to a joined string, vectorized match counting,
    capture-group backreference replacement (Java $2/$1, RE2 \\2\\1
    — same semantics, different spelling, the oracle uses its
    dialect's), and anchored alternation predicates. All codegen
    scalar ops — regex at 100 TB is CPU-bound scan work that scales
    linearly with cores, which is why it stays JVM-side, never in a
    Python UDF."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    first_vowel_word = F.regexp_substr("p_name", F.lit("[aeiou][a-z]*"))
    return p.select(
        "p_partkey",
        "p_name",
        F.coalesce(F.regexp_substr("p_name", F.lit("[a-z]+")), F.lit("")).alias(
            "first_word_rx"
        ),
        F.when(first_vowel_word.isNull(), 0)
        .otherwise(F.instr(F.col("p_name"), first_vowel_word))
        .cast("int")
        .alias("vowel_word_pos"),
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("([a-z]+)"), F.lit(1)), "|"
        ).alias("all_words"),
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("int").alias(
            "n_vowels"
        ),
        F.regexp_replace(
            "p_name", r"^([a-z]+) ([a-z]+)$", r"$2 $1"
        ).alias("swapped"),
        F.when(F.col("p_name").rlike("^(red|blue|green)"), 1)
        .otherwise(0)
        .alias("is_color_prefixed"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Order-independent table checksums (cross-system reconciliation)
# ---------------------------------------------------------------------------


def _cksum_sql(table: str, keyexpr: str) -> str:
    return f"""
SELECT '{table}' AS tbl,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(('0x' || substr(md5({keyexpr}), 1, 10))::BIGINT)
            AS BIGINT) AS checksum
FROM {table}
"""


_CKSUM_TABLES = (
    ("orders", "CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"
               " || '|' || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
               " AS VARCHAR)"),
    ("customer", "CAST(c_custkey AS VARCHAR) || '|' || c_mktsegment"),
    ("nation", "CAST(n_nationkey AS VARCHAR) || '|' || n_name"),
)


@register(
    "table_checksum_star",
    oracle="SELECT * FROM ("
    + " UNION ALL ".join(_cksum_sql(t, k) for t, k in _CKSUM_TABLES)
    + ") ORDER BY tbl",
    tags=("ext", "data-quality", "checksum"),
    description="order-independent md5-sum table fingerprints",
)
def table_checksum_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system table fingerprinting: per table, SUM over rows
    of a 40-bit integer slice of md5(canonical row string). The sum
    is commutative, so the checksum is independent of row order,
    partitioning, and engine — the property that lets two systems
    (here literally Spark and DuckDB; in production a warehouse and
    its replica) verify a copy without transferring rows. 40-bit
    slices keep 2³⁹·n far from BIGINT overflow at any realistic row
    count while a single bit flip still shifts the sum. One scan,
    one scalar aggregate per table."""
    parts = []
    for tbl, keyexpr in _CKSUM_TABLES:
        load_table(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
        spark_key = keyexpr.replace("VARCHAR", "STRING")
        parts.append(
            spark.sql(
                f"""
SELECT '{tbl}' AS tbl,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(conv(substr(md5({spark_key}), 1, 10), 16, 10)
                     AS BIGINT)) AS BIGINT) AS checksum
FROM {tbl}
"""
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("tbl")


# ---------------------------------------------------------------------------
# Gaps and islands over the order-key sequence
# ---------------------------------------------------------------------------

_GAPS_SQL = """
k AS (SELECT DISTINCT o_orderkey AS key FROM orders
      WHERE o_orderpriority = '1-URGENT'),
isl AS (
  SELECT key, key - ROW_NUMBER() OVER (ORDER BY key) AS grp
  FROM k
),
islands AS (
  SELECT CAST(MIN(key) AS BIGINT) AS island_start,
         CAST(MAX(key) AS BIGINT) AS island_end,
         CAST(COUNT(*) AS BIGINT) AS island_len
  FROM isl GROUP BY grp
),
gaps AS (
  SELECT island_end + 1 AS gap_start,
         LEAD(island_start) OVER (ORDER BY island_start) - 1 AS gap_end
  FROM islands
)
SELECT CAST(gap_start AS BIGINT) AS gap_start,
       CAST(gap_end AS BIGINT) AS gap_end,
       CAST(gap_end - gap_start + 1 AS BIGINT) AS gap_len
FROM gaps WHERE gap_end IS NOT NULL
ORDER BY gap_len DESC, gap_start
LIMIT 10
"""


@register(
    "orders_key_gaps_islands",
    oracle="WITH " + _GAPS_SQL,
    tags=("window", "gaps-islands", "data-quality"),
    description="top-10 gaps in the URGENT-order key sequence (gaps & islands)",
)
def orders_key_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic gaps-and-islands decomposition on a numeric key:
    consecutive runs collapse via the key − row_number() constant-
    group trick, gaps fall out between island boundaries with LEAD.
    The audit every ingest pipeline runs on an allegedly-dense
    surrogate key (missing ranges = lost batches). One global sort
    over the DISTINCT key set — at scale, run it per key-range
    partition and stitch the per-partition boundary islands."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("WITH " + _GAPS_SQL)


# ---------------------------------------------------------------------------
# Scalar pandas UDF (Arrow-vectorized z-score)
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)
                  * CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS ss
  FROM orders
)
SELECT o_orderkey,
       CAST(ROUND(o_totalprice) AS BIGINT) AS dollars,
       ROUND((CAST(ROUND(o_totalprice) AS BIGINT)
              - CAST(m.s AS DOUBLE) / m.n)
             / sqrt(CAST(m.ss AS DOUBLE) / m.n
                    - (CAST(m.s AS DOUBLE) / m.n)
                      * (CAST(m.s AS DOUBLE) / m.n)), 6) AS z
FROM orders CROSS JOIN m
WHERE o_orderkey < 500
ORDER BY o_orderkey
"""


@register(
    "pandas_scalar_udf_zscore",
    oracle=_ZSCORE_ORACLE,
    tags=("pandas-udf", "scalar", "udf-surface"),
    description="Arrow-vectorized scalar pandas UDF: z-score normalization",
)
def pandas_scalar_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALAR pandas UDF class (the one UDF shape this registry
    hadn't pinned: grouped-map, cogrouped-map, mapInPandas,
    mapInArrow, applyInPandasWithState and UDTFs all have entries).
    Batches cross the JVM→Python boundary as Arrow record batches
    and the z-score is computed vectorized on the whole pandas
    Series — the 10-100x-over-row-UDF path when Python is
    unavoidable. The global moments arrive as broadcast columns
    (exact integer sums), so the UDF itself is pure elementwise
    arithmetic, written with the same expression tree the SQL
    oracle uses."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zscore(dollars: pd.Series, s: pd.Series, ss: pd.Series, n: pd.Series) -> pd.Series:
        mean = s / n
        return ((dollars - mean) / ((ss / n - mean * mean) ** 0.5)).round(6)

    o = load_table(spark, sf_dir, "orders")
    dollars = F.round(F.col("o_totalprice")).cast("long")
    m = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dollars).cast("long").alias("s"),
        F.sum(dollars * dollars).cast("long").alias("ss"),
    )
    return (
        o.filter(F.col("o_orderkey") < 500)
        .select("o_orderkey", dollars.alias("dollars"))
        .crossJoin(F.broadcast(m))
        .select(
            "o_orderkey",
            "dollars",
            zscore(
                F.col("dollars").cast("double"),
                F.col("s").cast("double"),
                F.col("ss").cast("double"),
                F.col("n").cast("double"),
            ).alias("z"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Burstiness: Fano factor of per-minute arrival counts
# ---------------------------------------------------------------------------

_FANO_SQL = """
per_min AS (
  SELECT event_type,
         epoch_us(ts) // 60000000 AS minute,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_minutes,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM per_min GROUP BY event_type
)
SELECT event_type, n_minutes,
       ROUND(CAST(s AS DOUBLE) / n_minutes, 6) AS mean_per_min,
       ROUND((CAST(ss AS DOUBLE) / n_minutes
              - (CAST(s AS DOUBLE) / n_minutes)
                * (CAST(s AS DOUBLE) / n_minutes))
             / (CAST(s AS DOUBLE) / n_minutes), 6) AS fano_factor,
       ROUND((sqrt(CAST(ss AS DOUBLE) / n_minutes
                   - (CAST(s AS DOUBLE) / n_minutes)
                     * (CAST(s AS DOUBLE) / n_minutes))
              - CAST(s AS DOUBLE) / n_minutes)
             / (sqrt(CAST(ss AS DOUBLE) / n_minutes
                     - (CAST(s AS DOUBLE) / n_minutes)
                       * (CAST(s AS DOUBLE) / n_minutes))
                + CAST(s AS DOUBLE) / n_minutes), 6) AS burstiness_b
FROM mom
ORDER BY event_type
"""


@register(
    "events_burstiness_fano",
    oracle="WITH " + _FANO_SQL,
    tags=("ext", "events", "timeseries", "burstiness"),
    description="Fano factor + burstiness index of per-minute arrivals",
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival burstiness per event type: the Fano factor
    (variance/mean of per-minute counts; 1 = Poisson, >1 =
    clustered) and the Goh-Barabási burstiness index
    B = (σ−μ)/(σ+μ). This pair is what capacity planning actually
    needs beyond a mean rate — a B≈0 stream provisions for the
    mean, a bursty one for the tail. Counts bucket on integral
    epoch-minutes (micros divided as integers, so both engines bin
    identically); moments are exact ints; only minutes WITH events
    enter the bucket set (the shared convention both sides use)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_min = e.groupBy(
        "event_type", F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 60000000"
        ).alias("minute")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    mom = per_min.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_minutes"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_minutes")
    var = F.col("ss").cast("double") / F.col("n_minutes") - mean * mean
    return mom.select(
        "event_type",
        "n_minutes",
        F.round(mean, 6).alias("mean_per_min"),
        F.round(var / mean, 6).alias("fano_factor"),
        F.round(
            (F.sqrt(var) - mean) / (F.sqrt(var) + mean), 6
        ).alias("burstiness_b"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# XPath battery over synthesized XML
# ---------------------------------------------------------------------------

_XPATH_ORACLE = """
SELECT p_partkey,
       '<part><name>' || p_name || '</name><size>' || p_size
         || '</size><brand>' || replace(p_brand, '#', '_')
         || '</brand></part>' AS xml,
       p_name AS x_name,
       CAST(p_size AS BIGINT) AS x_size,
       replace(p_brand, '#', '_') AS x_brand,
       CASE WHEN p_size > 25 THEN 1 ELSE 0 END AS x_large
FROM part WHERE p_partkey < 200
ORDER BY p_partkey
"""


@register(
    "xpath_battery",
    oracle=_XPATH_ORACLE,
    tags=("functions", "xml", "xpath"),
    description="xpath_string/xpath_long/xpath_boolean over built XML",
)
def xpath_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XML extraction surface: documents synthesized from
    columns, then torn back apart with xpath_string / xpath_long /
    xpath_boolean (including a predicate expression). The oracle
    reconstructs the expected values straight from the source
    columns — round-trip proof, not parser echo. XML columns are a
    legacy-feed reality in enterprise lakes; like the regex battery,
    extraction is scalar scan work that parallelizes linearly."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    xml = F.concat(
        F.lit("<part><name>"),
        F.col("p_name"),
        F.lit("</name><size>"),
        F.col("p_size").cast("string"),
        F.lit("</size><brand>"),
        F.translate("p_brand", "#", "_"),
        F.lit("</brand></part>"),
    )
    u = p.select("p_partkey", xml.alias("xml"))
    return u.select(
        "p_partkey",
        "xml",
        F.expr("xpath_string(xml, '/part/name')").alias("x_name"),
        F.expr("xpath_long(xml, '/part/size')").alias("x_size"),
        F.expr("xpath_string(xml, '/part/brand')").alias("x_brand"),
        F.expr("CASE WHEN xpath_boolean(xml, '/part/size > 25') THEN 1 "
               "ELSE 0 END").alias("x_large"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# SCD2 state dwell-time analysis
# ---------------------------------------------------------------------------

_DWELL_SQL = """
ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN prev_type IS NULL OR prev_type <> event_type
              THEN 1 ELSE 0 END AS is_change
  FROM ordered
),
islands AS (
  SELECT user_id, event_type, ts,
         SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
intervals AS (
  SELECT user_id, event_type, island,
         CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us
  FROM islands GROUP BY user_id, event_type, island
),
with_end AS (
  SELECT user_id, event_type, start_us,
         LEAD(start_us) OVER (PARTITION BY user_id
                              ORDER BY start_us) AS end_us
  FROM intervals
),
gmax AS (SELECT CAST(MAX(epoch_us(ts)) AS BIGINT) AS tmax FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(COALESCE(end_us, g.tmax) - start_us) // 1000000 AS BIGINT)
         AS total_dwell_s,
       ROUND(CAST(SUM(COALESCE(end_us, g.tmax) - start_us) AS DOUBLE)
             / COUNT(*) / 1000000, 3) AS avg_dwell_s
FROM with_end CROSS JOIN gmax g
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "scd2_state_dwell_time",
    oracle="WITH " + _DWELL_SQL,
    tags=("events", "scd2", "temporal", "window"),
    description="per-state dwell-time totals from SCD2 validity intervals",
)
def scd2_state_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream of the SCD2 build: how long does each state last?
    Same-state runs collapse to [valid_from, valid_to) intervals
    (open tails clipped at the global max event time), then dwell
    time aggregates per state — the state-occupancy analysis that
    prices support capacity or session stickiness. All arithmetic
    on exact integral microseconds (seconds by integer division;
    the mean is the single closed double division). One shuffle on
    user_id feeds every window; the per-state aggregate is the only
    other exchange."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(wu).isNull()
            | (F.lag("event_type").over(wu) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_change"),
    )
    # (ts, event_id) tiebreak matches the is_change window's order, so
    # island assignment is total-ordered even with tied timestamps.
    islands = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("is_change")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("island"),
    )
    intervals = islands.groupBy("user_id", "event_type", "island").agg(
        F.min(us).cast("long").alias("start_us")
    )
    with_end = intervals.select(
        "user_id",
        "event_type",
        "start_us",
        F.lead("start_us")
        .over(Window.partitionBy("user_id").orderBy("start_us"))
        .alias("end_us"),
    )
    gmax = e.agg(F.max(us).cast("long").alias("tmax"))
    dwell = F.coalesce(F.col("end_us"), F.col("tmax")) - F.col("start_us")
    return (
        with_end.crossJoin(F.broadcast(gmax))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.expr(
                "CAST(SUM(COALESCE(end_us, tmax) - start_us) div 1000000"
                " AS BIGINT)"
            ).alias("total_dwell_s"),
            F.round(
                F.sum(dwell).cast("double") / F.count(F.lit(1)) / 1000000,
                3,
            ).alias("avg_dwell_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Mahalanobis outliers in (balance, spend) space
# ---------------------------------------------------------------------------

_MAHA_SQL = """
f AS (
  SELECT c.c_custkey,
         CAST(ROUND(c.c_acctbal) AS BIGINT) AS x,
         CAST(COALESCE(ROUND(o.cents / 100.0), 0) AS BIGINT) AS y
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY o_custkey
  ) o ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM f
),
c AS (
  SELECT n,
         CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
         CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
           * (CAST(sx AS DOUBLE) / n) AS cxx,
         CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n)
           * (CAST(sy AS DOUBLE) / n) AS cyy,
         CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
           * (CAST(sy AS DOUBLE) / n) AS cxy
  FROM m
),
scored AS (
  SELECT f.c_custkey, f.x, f.y,
         (c.cyy * (f.x - c.mx) * (f.x - c.mx)
          - 2 * c.cxy * (f.x - c.mx) * (f.y - c.my)
          + c.cxx * (f.y - c.my) * (f.y - c.my))
         / (c.cxx * c.cyy - c.cxy * c.cxy) AS d2
  FROM f CROSS JOIN c
)
SELECT c_custkey, x AS balance_dollars, y AS spend_dollars,
       ROUND(d2, 6) AS mahalanobis_sq
FROM scored
ORDER BY d2 DESC, c_custkey
LIMIT 10
"""


@register(
    "customer_mahalanobis_outliers_2d",
    oracle="WITH " + _MAHA_SQL,
    tags=("ext", "stats", "outliers", "anomaly"),
    description="top-10 Mahalanobis outliers in (balance, spend) space",
)
def customer_mahalanobis_outliers_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier detection done the closed-form way:
    Mahalanobis distance in (account balance, total spend) space
    with the 2x2 covariance inverted symbolically — no matrix
    library, no iteration. The five moments are exact BIGINT sums
    (whole dollars keep squares far from overflow), the quadratic
    form is a single expression per row, and the broadcast 1-row
    moment table means the fact table is scanned once and never
    shuffled. The metric axis-rescales automatically (unlike
    per-axis z-scores) and catches the 'high spend for its balance'
    diagonal — the fraud-screen shape."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    f = cust.join(F.broadcast(spend), "c_custkey", "left").select(
        "c_custkey",
        F.round(F.col("c_acctbal")).cast("long").alias("x"),
        F.coalesce(F.round(F.col("cents") / 100.0), F.lit(0))
        .cast("long")
        .alias("y"),
    )
    m = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    c = m.select(
        "n",
        mx.alias("mx"),
        my.alias("my"),
        (F.col("sxx").cast("double") / F.col("n") - mx * mx).alias("cxx"),
        (F.col("syy").cast("double") / F.col("n") - my * my).alias("cyy"),
        (F.col("sxy").cast("double") / F.col("n") - mx * my).alias("cxy"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (
        F.col("cyy") * dx * dx
        - 2 * F.col("cxy") * dx * dy
        + F.col("cxx") * dy * dy
    ) / (F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy"))
    return (
        f.crossJoin(F.broadcast(c))
        .select(
            "c_custkey",
            F.col("x").alias("balance_dollars"),
            F.col("y").alias("spend_dollars"),
            d2.alias("d2"),
        )
        .orderBy(F.col("d2").desc(), "c_custkey")
        .limit(10)
        .select(
            "c_custkey",
            "balance_dollars",
            "spend_dollars",
            F.round("d2", 6).alias("mahalanobis_sq"),
        )
    )


# ---------------------------------------------------------------------------
# Log-log price elasticity per brand (order-deterministic accumulation)
# ---------------------------------------------------------------------------

_ELASTICITY_SQL = """
pp AS (
  SELECT p.p_brand, l.l_partkey,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(MAX(CAST(ROUND(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS p_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey
),
vals AS (
  SELECT p_brand, l_partkey,
         ln(CAST(p_cents AS DOUBLE) / 100) AS x,
         ln(CAST(q AS DOUBLE)) AS y
  FROM pp
),
acc AS (
  SELECT p_brand,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY p_brand) AS n,
         SUM(x) OVER w AS cx, SUM(y) OVER w AS cy,
         SUM(x * y) OVER w AS cxy, SUM(x * x) OVER w AS cxx
  FROM vals
  WINDOW w AS (PARTITION BY p_brand ORDER BY l_partkey
               ROWS UNBOUNDED PRECEDING)
)
SELECT p_brand, CAST(n AS BIGINT) AS n_parts,
       ROUND((n * cxy - cx * cy) / (n * cxx - cx * cx), 6)
         AS elasticity
FROM acc WHERE rn = n
ORDER BY p_brand
"""


@register(
    "brand_price_elasticity_loglog",
    oracle="WITH " + _ELASTICITY_SQL,
    tags=("ext", "stats", "economics", "window"),
    description="log-log price elasticity of demand per brand",
)
def brand_price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand the econometric way: per brand,
    the OLS slope of ln(quantity) on ln(price) across its parts —
    the %-demand-change per %-price-change. Because ln() values are
    irrational doubles, the four sums are accumulated via an ORDERED
    window (partkey order) and the last row taken, so the float
    addition order is identical on both engines — the same
    determinism device as average precision, here applied to a
    regression. The fact table reduces to one row per (brand, part)
    first; the windows run over ~80-row groups."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("q"),
            F.max(F.round(F.col("p_retailprice") * 100).cast("long"))
            .cast("long")
            .alias("p_cents"),
        )
    )
    vals = pp.select(
        "p_brand",
        "l_partkey",
        F.log(F.col("p_cents").cast("double") / 100).alias("x"),
        F.log(F.col("q").cast("double")).alias("y"),
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("p_brand")
    acc = vals.select(
        "p_brand",
        F.row_number().over(
            Window.partitionBy("p_brand").orderBy("l_partkey")
        ).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(w).alias("cx"),
        F.sum("y").over(w).alias("cy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("cxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("cxx"),
    )
    return (
        acc.filter(F.col("rn") == F.col("n"))
        .select(
            "p_brand",
            F.col("n").cast("long").alias("n_parts"),
            F.round(
                (F.col("n") * F.col("cxy") - F.col("cx") * F.col("cy"))
                / (F.col("n") * F.col("cxx") - F.col("cx") * F.col("cx")),
                6,
            ).alias("elasticity"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection on opaque binary payloads
# ---------------------------------------------------------------------------

_PHASH_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id < 30
),
h AS (
  SELECT doc_id, md5(text) AS hx FROM corpus
),
v AS (
  SELECT doc_id, hx,
         ('0x' || substr(hx, 1, 15))::BIGINT AS ph
  FROM h
),
bands AS (
  SELECT doc_id, ph, b.b AS band_no, substr(hx, 1 + 4 * (b.b - 1), 4)
           AS band_val
  FROM v CROSS JOIN generate_series(1, 4) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.ph AS pa, b.ph AS pb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(pa, pb)) <= 6
ORDER BY doc_a, doc_b
"""


@register(
    "multimodal_phash_near_dup",
    oracle=_PHASH_SQL,
    tags=("ext", "multimodal", "dedup", "phash"),
    description="banded pHash near-dup pairs over opaque binary payloads",
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup plumbing for media columns: a 60-bit
    fingerprint per payload (here md5-derived — a real image pHash
    drops in at exactly this seam; this container has no codecs, per
    the multimodal convention), pigeonhole-banded so candidate
    generation is an equi-join on 16-bit band values — NEVER an
    all-pairs scan — then exact Hamming distance (XOR + popcount)
    filters candidates to ≤6 bits. At 100 TB this is the image-dedup
    shape: fingerprints shuffle (60 bits/row), payloads never move.
    With a content hash standing in for the perceptual hash, the
    survivors are the exact-duplicate payloads (hamming 0) — the
    banding+popcount machinery is what this query pins. The corpus
    plants 30 duplicate payloads (doc_id-shifted copies of the first
    30 docs) in the query's own fixture path — the synthetic
    documents table has no repeated text at small SF, so without
    planting this gate row would be vacuous (0 rows)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionAll(planted)
    v = corpus.select(
        "doc_id",
        F.md5("text").alias("hx"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long")
        .alias("ph"),
    )
    bands = v.select(
        "doc_id",
        "ph",
        F.explode(F.array(*[F.lit(b) for b in (1, 2, 3, 4)])).alias(
            "band_no"
        ),
        "hx",
    ).select(
        "doc_id",
        "ph",
        "band_no",
        F.expr("substr(hx, 1 + 4 * (band_no - 1), 4)").alias("band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("ph").alias("pa"),
        "band_no",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ph").alias("pb"),
        "band_no",
        "band_val",
    )
    cand = (
        a.join(b, ["band_no", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb")
        .distinct()
    )
    hamming = F.bit_count(F.expr("pa ^ pb"))
    return (
        cand.filter(hamming <= 6)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SELECT * EXCEPT (schema-evolution-friendly projection)
# ---------------------------------------------------------------------------

_STAR_EXCEPT_ORACLE = """
SELECT * EXCLUDE (o_totalprice, o_orderdate),
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
FROM orders WHERE o_orderkey < 100
ORDER BY o_orderkey
"""


@register(
    "sql_select_star_except",
    oracle=_STAR_EXCEPT_ORACLE,
    tags=("sql-surface", "project"),
    description="SELECT * EXCEPT projection (DuckDB EXCLUDE twin)",
)
def sql_select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-subtraction projection: SELECT * EXCEPT (...) — the
    schema-evolution-friendly way to drop a column without
    enumerating the survivors (Spark's EXCEPT, DuckDB's EXCLUDE —
    same semantics, dialect spelling differs and the oracle uses
    its own). Still a plain column-pruned scan underneath: the
    ReadSchema shows only surviving columns, so the convenience
    syntax costs nothing at scale."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
SELECT * EXCEPT (o_totalprice, o_orderdate),
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
FROM orders WHERE o_orderkey < 100
ORDER BY o_orderkey
"""
    )


# ---------------------------------------------------------------------------
# approx_top_k — exact in the small-cardinality regime, proven
# ---------------------------------------------------------------------------

_TOPK_SKETCH_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
ORDER BY n DESC, event_type
LIMIT 3
"""


@register(
    "approx_top_k_event_types",
    oracle=_TOPK_SKETCH_ORACLE,
    tags=("sketch", "approx", "topk"),
    description="approx_top_k heavy hitters, exact-verified at low cardinality",
)
def approx_top_k_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx_top_k sketch (Spark 4's heavy-hitter aggregate)
    run where its accuracy contract is PROVABLE: with 5 distinct
    keys and the default 10k tracked items the sketch is exact, so
    the DuckDB oracle is plain GROUP BY + LIMIT — unlike the other
    sketch queries (HLL/CMS, rows-only), this one hash-matches. At
    100 TB cardinality the same call degrades gracefully to
    approximate counts while the full GROUP BY would shuffle every
    distinct key; this query pins the API and its exact regime."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return spark.sql(
        """
SELECT item AS event_type, CAST(count AS BIGINT) AS n
FROM (SELECT inline(approx_top_k(event_type, 3)) FROM events)
ORDER BY n DESC, event_type
"""
    )


# ---------------------------------------------------------------------------
# Hourly top-k users (the windowed-leaderboard shape)
# ---------------------------------------------------------------------------

_HOURLY_TOPK_SQL = """
hc AS (
  SELECT date_trunc('hour', ts) AS hour_start, user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT hour_start, user_id, n_events,
         ROW_NUMBER() OVER (PARTITION BY hour_start
                            ORDER BY n_events DESC, user_id) AS rk
  FROM hc
)
SELECT hour_start, CAST(rk AS INTEGER) AS rk, user_id, n_events
FROM r WHERE rk <= 3
ORDER BY hour_start, rk
"""


@register(
    "events_hourly_topk_users",
    oracle="WITH " + _HOURLY_TOPK_SQL,
    tags=("events", "topk", "window", "leaderboard"),
    description="top-3 users per hour (windowed leaderboard)",
)
def events_hourly_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed leaderboard: per hour, the top-3 users by event
    count with deterministic tie-breaks — the shape every realtime
    dashboard keeps hot. Aggregate-then-rank: the rank window runs
    over the (hour, user) AGGREGATE (already one row per pair), so
    the expensive stage is one hash aggregate with map-side combine
    and the window partitions are hour-sized — bounded regardless of
    fact volume, and incrementally maintainable hour by hour."""
    e = load_table(spark, sf_dir, "events")
    hc = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    r = hc.select(
        "hour_start",
        "user_id",
        "n_events",
        F.row_number()
        .over(
            Window.partitionBy("hour_start").orderBy(
                F.col("n_events").desc(), "user_id"
            )
        )
        .alias("rk"),
    )
    return (
        r.filter(F.col("rk") <= 3)
        .select("hour_start", F.col("rk").cast("int").alias("rk"),
                "user_id", "n_events")
        .orderBy("hour_start", "rk")
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (the UDAF class)
# ---------------------------------------------------------------------------

_UDAF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE)
             / SUM(CAST(ROUND(l_quantity) AS BIGINT)), 4)
         AS wavg_price_cents
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "pandas_grouped_agg_udaf",
    oracle=_UDAF_ORACLE,
    tags=("pandas-udf", "udaf", "agg", "udf-surface"),
    description="grouped-agg pandas UDF (UDAF): quantity-weighted mean price",
)
def pandas_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF class — a GROUPED_AGG pandas UDF (Series → scalar)
    used inside groupBy().agg() beside built-in aggregates, the way
    a custom aggregate actually deploys. The weighted mean is
    computed over int64 inputs (exact integer sums inside pandas,
    one final division), so the result is independent of the
    nondeterministic partition order pandas receives — the same
    exactness discipline the JVM-side aggregates follow. Arrow
    moves each group's columns in one batch; partial aggregation
    doesn't apply to arbitrary Python UDAFs (documented trade vs
    built-ins, which is why the engine keeps them off hot paths)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(qty: pd.Series, cents: pd.Series) -> float:
        return round(float((qty * cents).sum()) / float(qty.sum()), 4)

    @pandas_udf("long")
    def total(qty: pd.Series) -> int:
        return int(qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
    # agg() — both outputs come from the UDAF class here
    return (
        li.select("l_returnflag", qty.alias("qty"), cents.alias("cents"))
        .groupBy("l_returnflag")
        .agg(
            total("qty").alias("total_qty"),
            wavg("qty", "cents").alias("wavg_price_cents"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE (dynamic SQL with bound parameters)
# ---------------------------------------------------------------------------

_EXEC_IMM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "sql_execute_immediate",
    oracle=_EXEC_IMM_ORACLE,
    tags=("sql-surface", "dynamic-sql"),
    description="EXECUTE IMMEDIATE dynamic SQL with USING parameter binding",
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL done safely: EXECUTE IMMEDIATE with a
    placeholder bound via USING — the injection-proof way to run a
    query whose text arrives at runtime (the reference
    string-interpolates SQL in server.js; parameter binding is the
    correction, SURVEY §3). The bound plan is identical to the
    static one — Catalyst sees a literal after binding, so pushdown
    and pruning are unaffected."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
EXECUTE IMMEDIATE
  'SELECT o_orderpriority,
          CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS revenue_cents
   FROM orders WHERE o_orderstatus = ?
   GROUP BY o_orderpriority ORDER BY o_orderpriority'
  USING 'O'
"""
    )


# ---------------------------------------------------------------------------
# Interchange-format roundtrip (csv / json / orc / xml vs parquet truth)
# ---------------------------------------------------------------------------


def _roundtrip_cksum(df):
    key = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        "o_orderstatus",
        F.col("cents").cast("string"),
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.conv(F.substring(F.md5(key), 1, 10), 16, 10).cast("long"))
        .cast("long")
        .alias("checksum"),
    )


_ROUNDTRIP_FMTS = ("parquet", "csv", "json", "orc", "xml")

_ROUNDTRIP_ORACLE = (
    "SELECT fmt, n_rows, checksum FROM ("
    + " UNION ALL ".join(
        f"""
SELECT '{fmt}' AS fmt, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|'
                 || o_orderstatus || '|'
                 || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR)), 1, 10))::BIGINT) AS BIGINT)
         AS checksum
FROM orders
"""
        for fmt in _ROUNDTRIP_FMTS
    )
    + ") ORDER BY fmt"
)


@register(
    "source_interchange_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    tags=("sources", "formats", "checksum"),
    description="csv/json/orc/xml write+read roundtrip, checksum-verified",
)
def source_interchange_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every interchange format the engine speaks, proven lossless
    in one query: the orders key/status/cents projection is written
    to csv, json-lines, orc and native XML, read back
    schema-explicit, and each copy's order-independent checksum must
    equal the parquet original's (the oracle expects five IDENTICAL
    (n, checksum) rows — a formatting loss in any format breaks the
    hash). Text formats carry longs and strings only (doubles are
    pre-reduced to exact cents BEFORE serialization — the rule that
    makes text formats safe), and reads never infer schemas."""
    import hashlib
    import os
    import tempfile

    from wilayah_aceh_etl_spark.sources.formats import (
        read_table,
        write_table,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    tag = hashlib.md5(f"{sf_dir}:{mtime}:rt".encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"wilayah_spark_rt_{tag}")

    proj = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    schema = "o_orderkey long, o_orderstatus string, cents long"
    outs = []
    for fmt in _ROUNDTRIP_FMTS:
        path = os.path.join(base, fmt)
        if fmt == "parquet":
            df = proj
        else:
            if not os.path.exists(path):
                write_table(proj, path, fmt)
            df = read_table(spark, path, fmt, schema=schema)
        outs.append(
            _roundtrip_cksum(df).select(
                F.lit(fmt).alias("fmt"), "n_rows", "checksum"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("fmt")


# ---------------------------------------------------------------------------
# Partitioned-layout write + partition-pruned read-back
# ---------------------------------------------------------------------------

_PARTITION_PRUNE_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE o_orderstatus IN ('O', 'F')
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "layout_partition_prune_roundtrip",
    oracle=_PARTITION_PRUNE_ORACLE,
    tags=("sources", "layout", "partition-pruning"),
    description="hive-partitioned write, pruned read-back, value-verified",
)
def layout_partition_prune_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout operation that replaces the reference's B-tree on
    level (SURVEY §4 X1): write the table hive-partitioned by
    status, read it back with a partition filter, and verify the
    values against the unpartitioned truth. The IN-filter resolves
    at PLANNING time against directory names — pruned partitions
    are never listed, let alone read (PartitionFilters in the scan
    node; the layout tests assert it). This is the 100 TB access
    path: partition prune → row-group prune (min/max) → column
    prune, before a single byte of data decompresses."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "orders.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    tag = hashlib.md5(f"{sf_dir}:{mtime}:pp".encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"wilayah_spark_part_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "orders").write.mode(
            "overwrite"
        ).partitionBy("o_orderstatus").parquet(path)
    part = spark.read.parquet(path)
    return (
        part.filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering codes
# ---------------------------------------------------------------------------


def _zorder_oracle() -> str:
    from wilayah_aceh_etl_spark.functions.zorder import (
        morton_interleave_sql,
        quantize_minmax_sql,
    )

    qx = quantize_minmax_sql("l_partkey", "pmin", "pmax", 8)
    qy = quantize_minmax_sql("l_suppkey", "smin", "smax", 8)
    z = morton_interleave_sql("qx", "qy", 8)
    return f"""
WITH b AS (
  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
  FROM lineitem
),
q AS (
  SELECT {qx} AS qx, {qy} AS qy
  FROM lineitem CROSS JOIN b
),
z AS (SELECT qx, qy, {z} AS zval FROM q)
SELECT CAST((zval - (zval % 1024)) / 1024 AS BIGINT) AS z_block,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(qx) AS BIGINT) AS qx_min, CAST(MAX(qx) AS BIGINT) AS qx_max,
       CAST(MIN(qy) AS BIGINT) AS qy_min, CAST(MAX(qy) AS BIGINT) AS qy_max
FROM z GROUP BY z_block ORDER BY z_block
"""


@register(
    "layout_zorder_morton",
    oracle=_zorder_oracle(),
    tags=("layout", "zorder", "data-skipping"),
    description="Z-order (Morton) codes over (partkey, suppkey), block-boxed",
)
def layout_zorder_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZORDER BY (l_partkey, l_suppkey) as pure Catalyst bit
    arithmetic (functions/zorder.py): quantize each key to 8 bits
    against its global min/max (one 1-row broadcast aggregate),
    interleave into a 16-bit Morton code, and report per-1024-code
    block the bounding box of both quantized keys. The small per-
    block qx/qy ranges in the output ARE the property that makes the
    layout useful: a file written per block carries tight min/max
    footer stats on BOTH columns, so scans filtering on either key
    skip most files (the re-layout write itself is exercised and
    footer-verified in tests/test_bucketing.py). The oracle recomputes
    the identical codes from the shared SQL fragments — bit-exact
    across engines."""
    from wilayah_aceh_etl_spark.functions.zorder import (
        morton_interleave,
        quantize_minmax,
    )

    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    q = li.crossJoin(F.broadcast(bounds)).select(
        quantize_minmax(
            F.col("l_partkey"), F.col("pmin"), F.col("pmax"), 8
        ).alias("qx"),
        quantize_minmax(
            F.col("l_suppkey"), F.col("smin"), F.col("smax"), 8
        ).alias("qy"),
    )
    z = q.select("qx", "qy", morton_interleave(F.col("qx"), F.col("qy"), 8).alias("zval"))
    zb = F.col("zval") - F.col("zval") % 1024
    return (
        z.groupBy(((zb) / 1024).cast("long").alias("z_block"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("qx").cast("long").alias("qx_min"),
            F.max("qx").cast("long").alias("qx_max"),
            F.min("qy").cast("long").alias("qy_min"),
            F.max("qy").cast("long").alias("qy_max"),
        )
        .orderBy("z_block")
    )


# ---------------------------------------------------------------------------
# foreachBatch keyed-upsert sink (streaming S9)
# ---------------------------------------------------------------------------

_FOREACHBATCH_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, ROUND(value, 2) AS last_value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id AS last_event_id, last_value
FROM ranked WHERE rn = 1
ORDER BY user_id
"""


@register(
    "streaming_foreachbatch_upsert",
    oracle=_FOREACHBATCH_ORACLE,
    tags=("streaming", "sink", "upsert", "foreachBatch"),
    description="foreachBatch keyed-upsert sink, last-wins verified",
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming UPSERT SINK in the correctness gate: events
    stream through foreachBatch into a keyed parquet table where
    the greatest (ts, event_id) wins per user — the streaming twin
    of the reference's ON CONFLICT upsert (S9), storage-format-free
    (with Delta/Iceberg the batch body collapses to MERGE INTO).
    Each micro-batch merge is staged-then-atomically-swapped so the
    table is always a consistent snapshot, and the checkpoint makes
    replays idempotent. The oracle is the batch last-wins window
    over the same events."""
    from wilayah_aceh_etl_spark.plans.events_queries import _stage_events
    from wilayah_aceh_etl_spark.scratch import scratch_dir
    from wilayah_aceh_etl_spark.streaming import read_event_stream
    from wilayah_aceh_etl_spark.streaming.sinks import upsert_stream

    staged = _stage_events(spark, sf_dir)
    table = scratch_dir("upsert", create=False)
    ckpt = scratch_dir("upsert_ck", create=False)
    src = read_event_stream(spark, staged).select(
        "user_id",
        "event_id",
        "ts",
        F.round("value", 2).alias("last_value"),
    )
    sq = (
        upsert_stream(
            src, table, ckpt, keys=["user_id"], order_cols=["ts", "event_id"]
        )
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    return (
        spark.read.parquet(table)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            "last_value",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Iterative k-means: 3 Lloyd iterations, deterministic across engines
# ---------------------------------------------------------------------------


def _km_step_sql(i: int) -> str:
    """One unrolled Lloyd step (assign against c{i}, emit a{i}, d{i}s,
    c{i+1}) in DuckDB SQL."""
    return f"""
s{i} AS (
  SELECT v.vec_id, c.centroid_id,
         list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.ce)
           + list_dot_product(c.ce, c.ce) AS d2
  FROM v CROSS JOIN c{i} c
),
a{i} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, centroid_id) AS rk
    FROM s{i}
  ) WHERE rk = 1
),
d{i}s AS (
  SELECT a.centroid_id, u.pos,
         CAST(SUM(CAST(ROUND(u.val * 16777216) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a{i} a JOIN u ON u.vec_id = a.vec_id
  GROUP BY a.centroid_id, u.pos
),
c{i + 1} AS (
  SELECT centroid_id,
         list(CAST(s AS DOUBLE) / n / 16777216 ORDER BY pos) AS ce
  FROM d{i}s GROUP BY centroid_id
)"""


_KMEANS3_ORACLE = (
    """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
u AS (
  SELECT vec_id, unnest(e) AS val, generate_subscripts(e, 1) AS pos FROM v
),
c1 AS (SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < 8),
"""
    + ",".join(_km_step_sql(i) for i in (1, 2, 3))
    + """,
m2 AS (
  SELECT CAST(SUM(CASE WHEN x.centroid_id <> y.centroid_id
                       THEN 1 ELSE 0 END) AS BIGINT) AS mv
  FROM a1 x JOIN a2 y ON x.vec_id = y.vec_id
),
m3 AS (
  SELECT CAST(SUM(CASE WHEN x.centroid_id <> y.centroid_id
                       THEN 1 ELSE 0 END) AS BIGINT) AS mv
  FROM a2 x JOIN a3 y ON x.vec_id = y.vec_id
)
SELECT * FROM (
  SELECT 1 AS iter, CAST(centroid_id AS INTEGER) AS centroid_id,
         CAST(COUNT(*) AS BIGINT) AS n_assigned,
         CAST(NULL AS BIGINT) AS moved_total
  FROM a1 GROUP BY centroid_id
  UNION ALL
  SELECT 2, CAST(centroid_id AS INTEGER), CAST(COUNT(*) AS BIGINT),
         (SELECT mv FROM m2)
  FROM a2 GROUP BY centroid_id
  UNION ALL
  SELECT 3, CAST(centroid_id AS INTEGER), CAST(COUNT(*) AS BIGINT),
         (SELECT mv FROM m3)
  FROM a3 GROUP BY centroid_id
)
ORDER BY iter, centroid_id
"""
)


@register(
    "embedding_kmeans_3iter",
    oracle=_KMEANS3_ORACLE,
    tags=("ext", "embedding", "clustering", "kmeans", "iterative"),
    description="3 Lloyd iterations with convergence tracking, k=8",
)
def embedding_kmeans_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuinely ITERATIVE algorithm through the gate: three full
    Lloyd iterations (k=8, seeded with the first 8 vectors), with
    per-iteration cluster sizes and the number of vectors that
    changed assignment — the convergence trace a clustering job
    monitors. Cross-engine determinism for the chained float
    decisions comes from QUANTIZED means: per-dimension sums are
    exact integers of ROUND(val·2²⁴), so every new centroid
    coordinate is one division of exact ints and assignment
    comparisons can never diverge between engines — the device that
    lets a multi-round float algorithm hash-match bit-for-bit.
    Scale: per round, state is k×dims (the broadcast centroids);
    the corpus is scanned once per round (assignment) plus one
    posexplode aggregate (means) — the canonical distributed
    k-means, checkpointable between rounds."""
    from wilayah_aceh_etl_spark.functions import vectors as V

    Q = 16777216
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", V.as_double(F.col("embedding")).alias("e"))
    u = v.select("vec_id", F.posexplode("e").alias("pos0", "val")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "val"
    )
    cent = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )

    def assign(c):
        d2 = (
            V.dot("e", "e")
            - 2 * V.dot("e", "ce")
            + V.dot("ce", "ce")
        )
        scored = v.crossJoin(F.broadcast(c)).select(
            "vec_id", "centroid_id", d2.alias("d2")
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "centroid_id")
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "centroid_id")
        )

    def recompute(a):
        ds = (
            a.join(u, "vec_id")
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum(F.round(F.col("val") * Q).cast("long"))
                .cast("long")
                .alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )
        return (
            ds.select(
                "centroid_id",
                "pos",
                (F.col("s").cast("double") / F.col("n") / Q).alias("cv"),
            )
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda st: st["cv"],
                ).alias("ce")
            )
        )

    a1 = assign(cent).persist()
    c2 = recompute(a1)
    a2 = assign(c2).persist()
    c3 = recompute(a2)
    a3 = assign(c3).persist()

    def sizes(a, it, moved):
        g = a.groupBy("centroid_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_assigned")
        )
        if moved is None:
            return g.select(
                F.lit(it).alias("iter"),
                F.col("centroid_id").cast("int").alias("centroid_id"),
                "n_assigned",
                F.lit(None).cast("long").alias("moved_total"),
            )
        return g.crossJoin(F.broadcast(moved)).select(
            F.lit(it).alias("iter"),
            F.col("centroid_id").cast("int").alias("centroid_id"),
            "n_assigned",
            F.col("mv").alias("moved_total"),
        )

    def moved(prev, cur):
        p = prev.select("vec_id", F.col("centroid_id").alias("pc"))
        return (
            cur.join(p, "vec_id")
            .agg(
                F.sum(
                    F.when(F.col("centroid_id") != F.col("pc"), 1).otherwise(0)
                )
                .cast("long")
                .alias("mv")
            )
        )

    out = (
        sizes(a1, 1, None)
        .unionAll(sizes(a2, 2, moved(a1, a2)))
        .unionAll(sizes(a3, 3, moved(a2, a3)))
        .orderBy("iter", "centroid_id")
    )
    return out


# ---------------------------------------------------------------------------
# Time-based train/test split with leakage audit
# ---------------------------------------------------------------------------

_TIMESPLIT_SQL = """
lab AS (
  SELECT user_id, event_id,
         CASE WHEN ts < TIMESTAMP '2024-01-22' THEN 'train' ELSE 'test' END
           AS split
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train,
         CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_test
  FROM lab GROUP BY user_id
)
SELECT CAST(SUM(n_train) AS BIGINT) AS n_train_events,
       CAST(SUM(n_test) AS BIGINT) AS n_test_events,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_users_in_both,
       ROUND(CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0
                      END) AS DOUBLE) / COUNT(*), 6) AS user_overlap_rate
FROM per_user
"""


@register(
    "split_time_based_train_test",
    oracle="WITH " + _TIMESPLIT_SQL,
    tags=("ext", "ml", "split", "leakage"),
    description="time-based train/test split + entity-leakage audit",
)
def split_time_based_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split a production model actually needs: TIME-based
    (train strictly before the cutoff, test after — random splits
    leak the future), plus the entity-leakage audit: how many users
    appear on both sides (the overlap that makes per-user
    memorization look like generalization). Counts are exact; the
    audit is one aggregate over the per-user split histogram. The
    deterministic-hash splits (split_train_val_test) and this
    temporal split are the two split disciplines a pipeline offers;
    choosing wrong is the classic eval bug."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-22").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    both = (F.col("n_train") > 0) & (F.col("n_test") > 0)
    return per_user.agg(
        F.sum("n_train").cast("long").alias("n_train_events"),
        F.sum("n_test").cast("long").alias("n_test_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias(
            "n_users_in_both"
        ),
        F.round(
            F.sum(F.when(both, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("user_overlap_rate"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage curve
# ---------------------------------------------------------------------------

_VOCAB_SQL = """
toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
),
ranked AS (
  SELECT tok, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rk
  FROM freq
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_types FROM freq),
ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (10), (25), (50)) t(k))
SELECT ks.k AS vocab_size,
       CAST(SUM(CASE WHEN r.rk <= ks.k THEN r.cnt ELSE 0 END) AS BIGINT)
         AS tokens_covered,
       CAST(MAX(t.total) AS BIGINT) AS tokens_total,
       CAST(MAX(t.n_types) AS BIGINT) AS n_types,
       ROUND(CAST(SUM(CASE WHEN r.rk <= ks.k THEN r.cnt ELSE 0 END)
                  AS DOUBLE) / MAX(t.total), 6) AS coverage
FROM ranked r CROSS JOIN tot t CROSS JOIN ks
GROUP BY ks.k
ORDER BY vocab_size
"""


@register(
    "tokenizer_vocab_coverage",
    oracle="WITH " + _VOCAB_SQL,
    tags=("ext", "text", "tokenizer", "vocab"),
    description="corpus coverage of top-K vocabularies (K=10/25/50)",
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer design data: what fraction of all token
    occurrences does a top-K vocabulary cover? (The OOV-rate curve
    that sizes a vocab before training one.) Token frequencies are
    one hash aggregate over the exploded corpus; the coverage curve
    is a 3-row dimension crossed with the ranked frequency table —
    coverage per K from exact integer counts. On a 100 TB corpus
    the frequency table (vocab-sized, heavy-tailed) is the only
    state; the corpus is touched once."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = d.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ranked = freq.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "tok"))
        .alias("rk"),
    )
    tot = freq.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(25), F.lit(50))).alias("k")
    )
    covered = F.sum(
        F.when(F.col("rk") <= F.col("k"), F.col("cnt")).otherwise(0)
    ).cast("long")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("long").alias("vocab_size"))
        .agg(
            covered.alias("tokens_covered"),
            F.max("total").cast("long").alias("tokens_total"),
            F.max("n_types").cast("long").alias("n_types"),
            F.round(
                covered.cast("double") / F.max("total"), 6
            ).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


# ---------------------------------------------------------------------------
# Differential-privacy prep: per-entity contribution bounding
# ---------------------------------------------------------------------------

_DP_BOUND_SQL = """
ranked AS (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS raw_count,
       CAST(SUM(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS bounded_count,
       CAST(COUNT(*) - SUM(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS clipped_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_contributors
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "dp_contribution_bounded_counts",
    oracle="WITH " + _DP_BOUND_SQL,
    tags=("ext", "privacy", "dp", "window"),
    description="DP prep: per-user contribution bounding (C=10) before counts",
)
def dp_contribution_bounded_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic half of differentially-private aggregation:
    before any noise is added, each user's contribution per
    statistic must be BOUNDED (here: first 10 events per (type,
    user) by event time) so the sensitivity of the count is a known
    constant — without this clamp the Laplace/Gaussian noise scale
    is unbounded and the DP guarantee is void. One window ranks
    contributions per entity; the clipped mass is reported so the
    utility cost of the bound is visible. (Noise itself is
    deliberately out of scope: it is nondeterministic by design and
    would be injected at release time, after this exact pipeline.)"""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    ranked = e.select(
        "event_type",
        "user_id",
        F.row_number().over(w).alias("rn"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("raw_count"),
            F.sum(F.when(F.col("rn") <= 10, 1).otherwise(0))
            .cast("long")
            .alias("bounded_count"),
            (
                F.count(F.lit(1))
                - F.sum(F.when(F.col("rn") <= 10, 1).otherwise(0))
            )
            .cast("long")
            .alias("clipped_rows"),
            F.countDistinct("user_id").cast("long").alias("n_contributors"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Class-balance audit with effective-number weights
# ---------------------------------------------------------------------------

_CLASS_BALANCE_SQL = """
counts AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings GROUP BY label
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(MAX(n) AS BIGINT) AS nmax
  FROM counts
)
SELECT CAST(c.label AS INTEGER) AS label, c.n,
       ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
       ROUND(CAST(t.nmax AS DOUBLE) / c.n, 6) AS imbalance_ratio,
       ROUND((1 - power(0.99, c.n)) / (1 - 0.99), 6) AS effective_n,
       ROUND((1 - 0.99) / (1 - power(0.99, c.n)), 6) AS cb_weight
FROM counts c CROSS JOIN tot t
ORDER BY label
"""


@register(
    "class_balance_effective_weights",
    oracle="WITH " + _CLASS_BALANCE_SQL,
    tags=("ext", "ml", "class-balance"),
    description="class-balance audit + effective-number (CB) weights",
)
def class_balance_effective_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-imbalance accounting for a labeled training set: per
    label, the share, the imbalance ratio against the largest
    class, and the class-balanced weighting of Cui et al. (CVPR'19)
    — effective number (1−β^n)/(1−β) with β=0.99 and its inverse as
    the loss weight. One hash aggregate to label counts; everything
    else is scalar math over k rows, so the audit costs the same at
    any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = counts.agg(
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("nmax"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("label").cast("int").alias("label"),
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            F.round(F.col("nmax").cast("double") / F.col("n"), 6).alias(
                "imbalance_ratio"
            ),
            F.round(
                (1 - F.pow(F.lit(0.99), F.col("n"))) / (1 - 0.99), 6
            ).alias("effective_n"),
            F.round(
                (1 - 0.99) / (1 - F.pow(F.lit(0.99), F.col("n"))), 6
            ).alias("cb_weight"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Haversine nearest-neighbor over synthesized capitals
# ---------------------------------------------------------------------------

_HAVERSINE_EXPR = (
    "ROUND(2 * 6371.0088 * asin(sqrt("
    "power(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * power(sin(radians(({lon2}) - ({lon1})) / 2), 2))), 3)"
)

_CAPITALS_CTE = """
caps AS (
  SELECT n_nationkey AS k, n_name,
         -50.0 + (n_nationkey * 7) % 100 AS lat,
         -180.0 + (n_nationkey * 29) % 360 AS lon
  FROM nation
)
"""

_HAVERSINE_ORACLE = (
    "WITH "
    + _CAPITALS_CTE
    + """
, d AS (
  SELECT a.n_name AS from_name, b.n_name AS to_name,
         """
    + _HAVERSINE_EXPR.format(
        lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon"
    )
    + """ AS dist_km
  FROM caps a JOIN caps b ON a.k <> b.k
),
r AS (
  SELECT from_name, to_name, dist_km,
         ROW_NUMBER() OVER (PARTITION BY from_name
                            ORDER BY dist_km, to_name) AS rk
  FROM d
)
SELECT from_name, CAST(rk AS INTEGER) AS rk, to_name, dist_km
FROM r WHERE rk <= 3
ORDER BY from_name, rk
"""
)


@register(
    "geo_haversine_nearest_capitals",
    oracle=_HAVERSINE_ORACLE,
    tags=("geo", "haversine", "knn"),
    description="haversine 3-nearest-neighbors between synthesized capitals",
)
def geo_haversine_nearest_capitals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance as a pure column expression — the
    geo-join primitive under store-assignment / coverage queries:
    deterministic capitals synthesized from nation keys, all-pairs
    haversine over the 25-row dim (pairing AGGREGATED entities, the
    same discipline as Kendall tau), 3 nearest per capital. At real
    scale the all-pairs step is replaced by a geohash bucket join
    (geo_geohash_bucketing is that operator); rounding to meters
    absorbs any last-ulp libm divergence between engines."""
    nat = load_table(spark, sf_dir, "nation")
    caps = nat.select(
        F.col("n_nationkey").alias("k"),
        "n_name",
        (-50.0 + (F.col("n_nationkey") * 7) % 100).alias("lat"),
        (-180.0 + (F.col("n_nationkey") * 29) % 360).alias("lon"),
    )
    a = caps.select(
        F.col("k").alias("ka"),
        F.col("n_name").alias("from_name"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
    )
    b = caps.select(
        F.col("k").alias("kb"),
        F.col("n_name").alias("to_name"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    d = (
        a.join(F.broadcast(b), F.col("ka") != F.col("kb"))
        .select(
            "from_name",
            "to_name",
            F.expr(
                _HAVERSINE_EXPR.format(
                    lat1="lat1", lon1="lon1", lat2="lat2", lon2="lon2"
                )
            ).alias("dist_km"),
        )
    )
    r = d.select(
        "from_name",
        "to_name",
        "dist_km",
        F.row_number()
        .over(
            Window.partitionBy("from_name").orderBy("dist_km", "to_name")
        )
        .alias("rk"),
    )
    return (
        r.filter(F.col("rk") <= 3)
        .select("from_name", F.col("rk").cast("int").alias("rk"),
                "to_name", "dist_km")
        .orderBy("from_name", "rk")
    )


# ---------------------------------------------------------------------------
# Sequential pattern support (A happens-before B, per user)
# ---------------------------------------------------------------------------

_SEQPAT_SQL = """
spans AS (
  SELECT user_id, event_type,
         MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id, event_type
),
pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         CAST(COUNT(*) AS BIGINT) AS support_users
  FROM spans a JOIN spans b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
   AND a.first_us < b.last_us
  GROUP BY a.event_type, b.event_type
),
tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events)
SELECT antecedent, consequent, support_users,
       ROUND(CAST(support_users AS DOUBLE) / t.n_users, 6) AS support_rate
FROM pairs CROSS JOIN tot t
ORDER BY antecedent, consequent
"""


@register(
    "events_sequential_pattern_support",
    oracle="WITH " + _SEQPAT_SQL,
    tags=("ext", "events", "sequence-mining"),
    description="length-2 sequential pattern support (A happens-before B)",
)
def events_sequential_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining at the length-2 grain (the
    PrefixSpan base case): for every ordered type pair (A, B), how
    many users exhibit A-then-eventually-B? The happens-before test
    needs only each user's FIRST occurrence of A and LAST of B —
    so the fact table reduces to (user × type) span rows first and
    the quadratic pairing runs over ≤5 rows per user. This is the
    reduction that keeps sequence mining feasible at 100 TB: the
    raw timeline never self-joins."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    spans = e.groupBy("user_id", "event_type").agg(
        F.min(us).alias("first_us"), F.max(us).alias("last_us")
    )
    a = spans.select(
        "user_id",
        F.col("event_type").alias("antecedent"),
        "first_us",
    )
    b = spans.select(
        "user_id",
        F.col("event_type").alias("consequent"),
        "last_us",
    )
    pairs = (
        a.join(b, "user_id")
        .filter(
            (F.col("antecedent") != F.col("consequent"))
            & (F.col("first_us") < F.col("last_us"))
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("support_users"))
    )
    tot = e.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            "support_users",
            F.round(
                F.col("support_users").cast("double") / F.col("n_users"), 6
            ).alias("support_rate"),
        )
        .orderBy("antecedent", "consequent")
    )


# ---------------------------------------------------------------------------
# Right-outer join (completing the join-type inventory)
# ---------------------------------------------------------------------------

_RIGHTOUTER_ORACLE = """
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lineitems,
       CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents
FROM (SELECT * FROM lineitem WHERE l_quantity > 45) l
RIGHT JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY s.s_suppkey
"""


@register(
    "rightouter_supplier_lineitems",
    oracle=_RIGHTOUTER_ORACLE,
    tags=("join", "outer"),
    description="right-outer join: every supplier, even with no matching lines",
)
def rightouter_supplier_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The right-outer join — the one outer variant the registry
    hadn't pinned (left/full are covered): every supplier survives
    even when the filtered fact side has no rows for it, with
    COUNT(col) correctly counting 0 over the null-extended rows.
    Catalyst canonicalizes right-outer to left-outer with sides
    swapped, so the physical plan broadcasts the supplier dim
    exactly like the left-outer twin — the query pins the SEMANTIC
    surface, the plan is shared."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 45
    )
    supp = load_table(spark, sf_dir, "supplier")
    j = li.join(
        supp, li.l_suppkey == supp.s_suppkey, "right_outer"
    )
    return (
        j.groupBy("s_suppkey", "s_name")
        .agg(
            F.count("l_orderkey").cast("long").alias("n_lineitems"),
            F.coalesce(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# unionByName with missing columns (schema evolution)
# ---------------------------------------------------------------------------

_UNION_EVOLVE_ORACLE = """
SELECT o_orderkey, o_orderstatus, cents, src FROM (
  SELECT o_orderkey, o_orderstatus,
         CAST(NULL AS BIGINT) AS cents, 'v1' AS src
  FROM orders WHERE o_orderkey < 100
  UNION ALL
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, 'v2' AS src
  FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 200
)
ORDER BY o_orderkey
"""


@register(
    "union_by_name_schema_evolution",
    oracle=_UNION_EVOLVE_ORACLE,
    tags=("setop", "schema-evolution"),
    description="unionByName(allowMissingColumns): v1 rows null-fill new column",
)
def union_by_name_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the union seam: an old snapshot written
    before the `cents` column existed unions with the new snapshot
    via unionByName(allowMissingColumns=True) — columns align BY
    NAME (positional UNION would silently mis-align), and the
    missing column null-fills on the old side. This is the append
    pattern every long-lived table needs once its schema grows; the
    oracle spells out the null-extended union explicitly."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") < 100).select(
        "o_orderkey", "o_orderstatus", F.lit("v1").alias("src")
    )
    v2 = o.filter(
        (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 200)
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit("v2").alias("src"),
    )
    return (
        v1.unionByName(v2, allowMissingColumns=True)
        .select("o_orderkey", "o_orderstatus", "cents", "src")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH l AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS k FROM orders
  WHERE o_orderkey < 300
),
r AS (
  SELECT DISTINCT NULLIF(o_orderstatus, 'P') AS k, o_orderpriority
  FROM orders WHERE o_orderkey < 50
)
SELECT l.o_orderkey, COALESCE(l.k, '<NULL>') AS join_key,
       r.o_orderpriority
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
ORDER BY l.o_orderkey, r.o_orderpriority
"""


@register(
    "nullsafe_join_on_nullable_keys",
    oracle=_NULLSAFE_ORACLE,
    tags=("join", "null-semantics"),
    description="null-safe equi-join: <=> matches NULL keys to NULL keys",
)
def nullsafe_join_on_nullable_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null-safe equality join: `<=>` (IS NOT DISTINCT FROM)
    treats NULL as a joinable value instead of three-valued-logic
    dropping every NULL-keyed row — the semantics reconciliations
    and SCD merges actually want when the business key is nullable.
    Catalyst plans `<=>` as a HASHED equi-join key (null-safe keys
    still hash-partition), not a nested-loop residual — nullable
    keys cost nothing at scale."""
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("k")
    )
    right = (
        o.filter(F.col("o_orderkey") < 50)
        .select(
            F.nullif("o_orderstatus", F.lit("P")).alias("rk"),
            "o_orderpriority",
        )
        .distinct()
    )
    return (
        left.join(right, F.col("k").eqNullSafe(F.col("rk")))
        .select(
            "o_orderkey",
            F.coalesce(F.col("k"), F.lit("<NULL>")).alias("join_key"),
            "o_orderpriority",
        )
        .orderBy("o_orderkey", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Timezone conversion battery
# ---------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_wall,
       strftime(timezone('Asia/Jakarta', ts AT TIME ZONE 'UTC'),
                '%Y-%m-%d %H:%M:%S') AS jakarta_wall,
       strftime(timezone('America/New_York', ts AT TIME ZONE 'UTC'),
                '%Y-%m-%d %H:%M:%S') AS newyork_wall,
       CAST(hour(timezone('Asia/Jakarta', ts AT TIME ZONE 'UTC'))
            AS INTEGER) AS jakarta_hour,
       CAST(CASE WHEN CAST(timezone('Asia/Jakarta', ts AT TIME ZONE 'UTC')
                           AS DATE) <> CAST(ts AS DATE)
                 THEN 1 ELSE 0 END AS INTEGER) AS crosses_midnight
FROM events WHERE event_id < 200
ORDER BY event_id
"""


@register(
    "timezone_conversion_battery",
    oracle=_TZ_ORACLE,
    tags=("functions", "timezone", "temporal"),
    description="from_utc_timestamp wall-clock battery (Jakarta / New York)",
)
def timezone_conversion_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware wall-clock conversion — the reference's domain
    is Indonesian administrative data, so Asia/Jakarta rendering is
    the natural presentation layer (reference stores naive
    CURRENT_TIMESTAMP, SURVEY §1.2; an engine must be explicit
    instead): from_utc_timestamp into a +07:00 zone and a
    DST-observing one, wall-clock strings, local hour extraction,
    and a date-boundary-crossing flag (the aggregation-bucket
    pitfall: UTC days ≠ local days). Both engines resolve the same
    IANA tzdata; outputs are formatted strings so the comparison is
    calendar-exact, not epoch-exact."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    ts = F.col("ts").cast("timestamp")
    jak = F.from_utc_timestamp(ts, "Asia/Jakarta")
    ny = F.from_utc_timestamp(ts, "America/New_York")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return e.select(
        "event_id",
        F.date_format(ts, fmt).alias("utc_wall"),
        F.date_format(jak, fmt).alias("jakarta_wall"),
        F.date_format(ny, fmt).alias("newyork_wall"),
        F.hour(jak).cast("int").alias("jakarta_hour"),
        F.when(jak.cast("date") != ts.cast("date"), 1)
        .otherwise(0)
        .cast("int")
        .alias("crosses_midnight"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Nested-struct battery (withField / dropFields / struct-array JSON)
# ---------------------------------------------------------------------------

_NESTED_ORACLE = """
WITH lines AS (
  SELECT l_orderkey, l_linenumber,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, qty) AS rn
  FROM lineitem
),
line_json AS (
  SELECT l_orderkey,
         '[' || string_agg('{"ln":' || l_linenumber || ',"qty":' || qty
                           || '}', ',' ORDER BY l_linenumber, qty) || ']'
           AS first2_lines_json
  FROM lines WHERE rn <= 2 GROUP BY l_orderkey
)
SELECT o.o_orderkey,
       '{"status":"' || o.o_orderstatus || '","cents":'
         || CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
         || ',"is_open":' || CASE WHEN o.o_orderstatus = 'O'
                                  THEN 'true' ELSE 'false' END || '}'
         AS order_struct_json,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents_out,
       lj.first2_lines_json
FROM orders o JOIN line_json lj ON lj.l_orderkey = o.o_orderkey
WHERE o.o_orderkey < 100
ORDER BY o.o_orderkey
"""


@register(
    "nested_struct_battery",
    oracle=_NESTED_ORACLE,
    tags=("functions", "struct", "nested"),
    description="withField/dropFields + sorted struct-array JSON assembly",
)
def nested_struct_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested-type manipulation surface: build a struct, evolve
    it in place with withField (add a computed flag) and dropFields
    (retire a column) — the Column-level schema-evolution ops that
    avoid unpack/repack —, extract by dot path, and assemble a
    bounded, deterministically-sorted array-of-structs from the
    detail table rendered to JSON (the reference's envelope shape,
    SURVEY P3, generalized). The oracle builds every JSON string by
    hand, proving serialization layout. Arrays are bounded to the
    first 2 lines so collected state stays O(1) per key."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    li = load_table(spark, sf_dir, "lineitem")
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    s2 = s.withField(
        "is_open", F.col("o_orderstatus") == "O"
    ).dropFields("priority")
    lines = li.select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber").alias("ln"),
            F.round("l_quantity").cast("long").alias("qty"),
        ).alias("line"),
    )
    first2 = lines.groupBy("l_orderkey").agg(
        F.to_json(
            F.slice(F.array_sort(F.collect_list("line")), 1, 2)
        ).alias("first2_lines_json")
    )
    return (
        o.select(
            "o_orderkey",
            F.to_json(s2).alias("order_struct_json"),
            s2.getField("cents").alias("cents_out"),
        )
        .join(first2, o.o_orderkey == first2.l_orderkey)
        .select(
            "o_orderkey",
            "order_struct_json",
            "cents_out",
            "first2_lines_json",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# JSON functions battery over the props column
# ---------------------------------------------------------------------------

_JSONFN_ORACLE = """
SELECT event_id, props,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid,
       'STRUCT<k: BIGINT>' AS inferred_schema,
       '{"event_id":' || event_id || ',"k":'
         || json_extract_string(props, '$.k') || '}' AS enriched_json
FROM events WHERE event_id < 200
ORDER BY event_id
"""


@register(
    "json_functions_battery",
    oracle=_JSONFN_ORACLE,
    tags=("functions", "json", "semi-structured"),
    description="get_json_object / from_json / schema_of_json / to_json battery",
)
def json_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-JSON surface (complementing the VARIANT query):
    path extraction with get_json_object, typed parse through
    from_json with an EXPLICIT schema (the 100 TB rule — inference
    is a second full scan), schema_of_json shown on a sample row
    (what you run once during development to WRITE that explicit
    schema), validity probing, and re-serialization of an enriched
    struct. The oracle recomputes every output from DuckDB's JSON
    primitives — extraction semantics, not echo."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        "props",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").cast("long").alias("k_int"),
        F.when(parsed.isNotNull(), 1).otherwise(0).alias("is_valid"),
        F.schema_of_json(F.lit('{"k": 69}')).alias("inferred_schema"),
        F.to_json(
            F.struct(
                F.col("event_id"),
                parsed.getField("k").alias("k"),
            )
        ).alias("enriched_json"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Rounding-modes battery (round / bround / floor / ceil / truncate)
# ---------------------------------------------------------------------------

_ROUNDING_ORACLE = """
SELECT o_orderkey, o_totalprice,
       ROUND(o_totalprice, 1) AS half_up_1,
       CAST((CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10
             + CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) % 10 > 5
                    THEN 1
                    WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) % 10 < 5
                    THEN 0
                    ELSE (CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10)
                         % 2 END) AS DOUBLE) / 10 AS half_even_1,
       ROUND(o_totalprice, -2) AS to_hundreds,
       floor(o_totalprice * 10) / 10 AS floor_1,
       ceil(o_totalprice * 10) / 10 AS ceil_1,
       trunc(o_totalprice * 10) / 10 AS trunc_1
FROM orders WHERE o_orderkey < 300
ORDER BY o_orderkey
"""


@register(
    "rounding_modes_battery",
    oracle=_ROUNDING_ORACLE,
    tags=("functions", "numeric", "rounding"),
    description="round / bround(half-even) / scale floor-ceil / truncation",
)
def rounding_modes_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every rounding discipline the engine offers, side by side:
    HALF_UP round (= DuckDB's half-away for positives), banker's
    bround (= round_even — the mode that de-biases summed money),
    negative-scale rounding to hundreds, scale-preserving
    floor/ceil, and cast-truncation toward zero. Financial
    pipelines break exactly at these seams (the repo-wide
    exact-cents convention exists BECAUSE repeated half-up rounding
    biases upward; this battery pins each mode's behavior on real
    prices)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    x = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.round(x, 1).alias("half_up_1"),
        F.bround(x.cast("decimal(14,2)"), 1).cast("double").alias(
            "half_even_1"
        ),
        F.round(x, -2).alias("to_hundreds"),
        (F.floor(x * 10) / 10).alias("floor_1"),
        (F.ceil(x * 10) / 10).alias("ceil_1"),
        ((x * 10).cast("long").cast("double") / 10).alias("trunc_1"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Array functions battery II (exists/forall/sequence/slice/zip/position)
# ---------------------------------------------------------------------------

_ARRAY2_ORACLE = """
WITH t AS (
  SELECT p_partkey, p_size,
         string_split(p_name, ' ') AS toks
  FROM part WHERE p_partkey < 100
)
SELECT p_partkey,
       CASE WHEN len(list_filter(toks, x -> length(x) > 4)) > 0
            THEN 1 ELSE 0 END AS has_long_token,
       CASE WHEN len(list_filter(toks, x -> length(x) >= 3)) = len(toks)
            THEN 1 ELSE 0 END AS all_tokens_3plus,
       CAST(list_position(toks, 'red') AS INTEGER) AS red_pos,
       array_to_string(list_sort(list_distinct(toks)), ',')
         AS distinct_sorted,
       array_to_string(list_transform(range(1, p_size % 5 + 2),
                                      x -> CAST(x AS VARCHAR)), ',')
         AS seq_str,
       array_to_string(toks[1:2], ',') AS first2,
       array_to_string(list_concat(toks, toks), ',') AS doubled,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
         AS total_chars
FROM t
ORDER BY p_partkey
"""


@register(
    "array_functions_battery2",
    oracle=_ARRAY2_ORACLE,
    tags=("functions", "array", "hof"),
    description="exists/forall/position/sequence/slice/concat/fold battery II",
)
def array_functions_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second array battery — the predicates and constructors
    the first one (filter/transform/fold/zip) left unpinned:
    exists / forall quantifiers, element position (1-based, 0 when
    absent — both engines agree), distinct+sort normalization,
    sequence generation from data, slicing, self-concat, and an
    aggregate fold (total chars). DuckDB's list_* dialect computes
    every expected value independently. All codegen'd per-row
    expressions; array columns never leave the row."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    toks = F.split("p_name", " ")
    t = p.select("p_partkey", "p_size", toks.alias("toks"))
    return t.select(
        "p_partkey",
        F.when(F.exists("toks", lambda x: F.length(x) > 4), 1)
        .otherwise(0)
        .alias("has_long_token"),
        F.when(F.forall("toks", lambda x: F.length(x) >= 3), 1)
        .otherwise(0)
        .alias("all_tokens_3plus"),
        F.array_position("toks", "red").cast("int").alias("red_pos"),
        F.array_join(F.array_sort(F.array_distinct("toks")), ",").alias(
            "distinct_sorted"
        ),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.col("p_size") % 5 + 1),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("seq_str"),
        F.array_join(F.slice("toks", 1, 2), ",").alias("first2"),
        F.array_join(F.concat("toks", "toks"), ",").alias("doubled"),
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Python DataSource (geojson_features) through the oracle gate
# ---------------------------------------------------------------------------

_PDS_ORACLE = """
SELECT lpad(CAST(r.r_regionkey AS VARCHAR), 2, '0') || '.'
         || lpad(CAST(n.n_nationkey AS VARCHAR), 2, '0') AS kode,
       n.n_name AS nama,
       CAST(2 AS INTEGER) AS level,
       CAST(0 AS INTEGER) AS feature_index
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_regionkey = 1
ORDER BY kode
"""


@register(
    "wilayah_geojson_pds_roundtrip",
    oracle=_PDS_ORACLE,
    tags=("wilayah", "sources", "datasource", "pds"),
    description="Python DataSource read + filename pushdown + code derivation",
)
def wilayah_geojson_pds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pluggable geojson_features connector (Spark 4 Python
    DataSource API) inside the correctness gate: kabupaten-style
    FeatureCollection files are staged from the nation dim under
    the reference's exact filename/property conventions
    (`RR.NN_Name.geojson`, kd_propinsi/kd_dati2 props — SURVEY
    §1.1/§1.3), then read back through the custom format with the
    region-01 prefix pushed via option("code") — pruned files are
    never OPENED (pushFilters resolves against filenames at
    planning). Feature explosion and P1 code derivation run on the
    connector's output; the oracle recomputes the expected rows
    relationally. Staging writes the 25-file corpus once per
    (sf_dir, mtime) — dimension-sized, like every seed fixture."""
    import hashlib
    import json as _json
    import os
    import tempfile

    from wilayah_aceh_etl_spark.sources.geojson_datasource import (
        register_geojson_datasource,
    )

    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    src = os.path.join(sf_dir, "nation.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    tag = hashlib.md5(f"{sf_dir}:{mtime}:pds".encode()).hexdigest()[:10]
    staged = os.path.join(tempfile.gettempdir(), f"wilayah_spark_gj_{tag}")
    if not os.path.exists(os.path.join(staged, "_STAGED")):
        os.makedirs(staged, exist_ok=True)
        rows = (
            nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .select("r_regionkey", "n_nationkey", "n_name")
            .collect()  # 25-row dimension: seed-fixture staging, not data flow
        )
        for r in rows:
            rr = f"{r['r_regionkey']:02d}"
            nn = f"{r['n_nationkey']:02d}"
            doc = {
                "type": "FeatureCollection",
                "features": [
                    {
                        "type": "Feature",
                        "properties": {
                            "kd_propinsi": rr,
                            "kd_dati2": nn,
                            "nm_dati2": r["n_name"],
                        },
                        "geometry": None,
                    }
                ],
            }
            name = f"{rr}.{nn}_{r['n_name'].replace(' ', '-')}.geojson"
            with open(os.path.join(staged, name), "w") as fh:
                _json.dump(doc, fh, separators=(",", ":"))
        open(os.path.join(staged, "_STAGED"), "w").close()

    register_geojson_datasource(spark)
    feats = (
        spark.read.format("geojson_features")
        .option("code", "01.")  # filename-prefix pushdown: region 01 only
        .load(staged)
    )
    p = F.col("props")
    return feats.select(
        F.concat(p["kd_propinsi"], F.lit("."), p["kd_dati2"]).alias("kode"),
        p["nm_dati2"].alias("nama"),
        F.col("level").cast("int").alias("level"),
        F.col("feature_index").cast("int").alias("feature_index"),
    ).select("kode", "nama", "level", "feature_index").orderBy("kode")


# ---------------------------------------------------------------------------
# MLlib pipeline (CountVectorizer + IDF) through the oracle gate
# ---------------------------------------------------------------------------

_MLLIB_TFIDF_ORACLE = """
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
),
n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM docs),
tf AS (
  SELECT d.doc_id, t.tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM docs d, UNNEST(d.toks) AS u(tok)
  JOIN (VALUES ('table'), ('spark'), ('merge')) t(tok) ON u.tok = t.tok
  GROUP BY d.doc_id, t.tok
),
df AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM (SELECT d.doc_id, u.tok FROM docs d, UNNEST(d.toks) AS u(tok))
  WHERE tok IN ('table', 'spark', 'merge')
  GROUP BY tok
)
SELECT t.doc_id, t.tok AS term, t.tf, f.df,
       ROUND(ln((CAST(n.m AS DOUBLE) + 1) / (f.df + 1)), 6) AS idf,
       ROUND(t.tf * ln((CAST(n.m AS DOUBLE) + 1) / (f.df + 1)), 6)
         AS tfidf
FROM tf t JOIN df f ON f.tok = t.tok CROSS JOIN n_docs n
ORDER BY t.doc_id, term
"""


@register(
    "mllib_tfidf_pipeline",
    oracle=_MLLIB_TFIDF_ORACLE,
    tags=("ext", "mllib", "pipeline", "tfidf"),
    description="MLlib CountVectorizer+IDF Pipeline, formula-verified",
)
def mllib_tfidf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pyspark.ml Pipeline surface in the correctness gate: a
    deterministic CountVectorizerModel built from an explicitly
    SORTED vocabulary (from_vocabulary — no tie-dependent vocab
    selection), IDF fit over the corpus, vectors unpacked back to
    relational rows with vector_to_array. The oracle recomputes
    tf·ln((m+1)/(df+1)) — MLlib's exact smoothing — from SQL, so
    this checks the library's formula, not just its plumbing. The
    model-fit is one aggregate over the corpus; transform is a
    per-row map — the same scan/shuffle profile as any TF-IDF
    query, with Vector columns as the interchange type the rest of
    pyspark.ml expects."""
    from pyspark.ml.feature import CountVectorizerModel, IDF
    from pyspark.ml.functions import vector_to_array

    vocab = ["merge", "spark", "table"]  # sorted, fixed
    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = d.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    cv = CountVectorizerModel.from_vocabulary(
        vocab, inputCol="toks", outputCol="tf_vec"
    )
    tf = cv.transform(toks)
    idf_model = IDF(inputCol="tf_vec", outputCol="tfidf_vec").fit(tf)
    out = idf_model.transform(tf)
    arr_tf = vector_to_array("tf_vec")
    arr_ti = vector_to_array("tfidf_vec")
    m = toks.count()  # doc count: the same single scalar the fit used
    parts = []
    for i, term in enumerate(vocab):
        parts.append(
            out.select(
                "doc_id",
                F.lit(term).alias("term"),
                arr_tf[i].cast("long").alias("tf"),
                F.round(arr_ti[i], 6).alias("tfidf"),
            ).filter(F.col("tf") > 0)
        )
    df_long = parts[0]
    for pdf in parts[1:]:
        df_long = df_long.unionAll(pdf)
    dfreq = (
        toks.select(
            "doc_id", F.explode(F.array_distinct("toks")).alias("term")
        )
        .filter(F.col("term").isin(*vocab))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
    )
    return (
        df_long.join(F.broadcast(dfreq), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.log((F.lit(float(m)) + 1) / (F.col("df") + 1)), 6
            ).alias("idf"),
            "tfidf",
        )
        .orderBy("doc_id", "term")
    )


# ---------------------------------------------------------------------------
# try_* error-handling battery (ANSI-safe ingestion arithmetic)
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT p_partkey,
       TRY_CAST(p_name AS INTEGER) AS bad_int_cast,
       TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS good_int_cast,
       CAST(NULL AS TIMESTAMP) AS bad_ts_parse,
       CASE WHEN p_size - 5 = 0 THEN NULL
            ELSE ROUND(CAST(p_retailprice AS DOUBLE) / (p_size - 5), 4)
       END AS safe_div,
       CAST(NULL AS VARCHAR) AS oob_element,
       split_part(p_name, ' ', 1) AS first_elem
FROM part WHERE p_partkey < 200
ORDER BY p_partkey
"""


@register(
    "try_error_handling_battery",
    oracle=_TRY_ORACLE,
    tags=("functions", "ansi", "error-handling"),
    description="try_cast / try_to_timestamp / try_divide / try_element_at",
)
def try_error_handling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-tolerant ingestion surface under ANSI mode: every
    try_* form returns NULL where the strict form would kill the
    job — a malformed cast, an unparseable timestamp, a zero
    divisor, an out-of-bounds array index. This is how a 100 TB
    ingest survives the 0.0001% of garbage rows without disabling
    ANSI for the 99.9999%: the NULLs flow to a quarantine filter
    instead of an executor exception. The oracle states each
    expected NULL/value explicitly."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.expr("try_cast(p_name AS INT)").alias("bad_int_cast"),
        F.expr("try_cast(CAST(p_size AS STRING) AS INT)").alias(
            "good_int_cast"
        ),
        F.expr("try_to_timestamp(p_name, 'yyyy-MM-dd')").alias(
            "bad_ts_parse"
        ),
        F.round(
            F.expr("try_divide(CAST(p_retailprice AS DOUBLE), p_size - 5)"),
            4,
        ).alias("safe_div"),
        F.expr("try_element_at(split(p_name, ' '), 99)").alias(
            "oob_element"
        ),
        F.element_at(toks, 1).alias("first_elem"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Unicode string battery (codepoints vs bytes)
# ---------------------------------------------------------------------------

_UNICODE_ORACLE = """
WITH u AS (
  SELECT p_partkey,
         p_name || ' — ' || 'café № ' || CAST(p_size AS VARCHAR) AS s
  FROM part WHERE p_partkey < 100
)
SELECT p_partkey, s,
       CAST(length(s) AS INTEGER) AS n_chars,
       CAST(octet_length(encode(s)) AS INTEGER) AS n_bytes,
       upper(s) AS upper_s,
       substr(s, length(s) - 4, 5) AS last5_chars,
       CASE WHEN contains(s, '№') THEN 1 ELSE 0 END AS has_numero_sign
FROM u
ORDER BY p_partkey
"""


@register(
    "unicode_string_battery",
    oracle=_UNICODE_ORACLE,
    tags=("functions", "string", "unicode"),
    description="codepoint vs byte semantics on multibyte strings",
)
def unicode_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multibyte correctness: strings containing em-dash, é and №
    (1-3 UTF-8 bytes per char) exercise length (CODEPOINTS) vs
    octet_length (BYTES), codepoint-addressed substr from the tail,
    unicode-aware case mapping, and substring containment. The
    char/byte distinction is exactly where a multilingual 100 TB
    corpus silently corrupts if an operator is byte-addressed;
    both engines agree on UTF-8 codepoint semantics and the oracle
    re-derives every value."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    s = F.concat(
        F.col("p_name"),
        F.lit(" — café № "),
        F.col("p_size").cast("string"),
    )
    u = p.select("p_partkey", s.alias("s"))
    return u.select(
        "p_partkey",
        "s",
        F.length("s").cast("int").alias("n_chars"),
        F.octet_length("s").cast("int").alias("n_bytes"),
        F.upper("s").alias("upper_s"),
        F.substring(F.col("s"), F.length("s") - 4, F.lit(5)).alias(
            "last5_chars"
        ),
        F.when(F.contains("s", F.lit("№")), 1)
        .otherwise(0)
        .alias("has_numero_sign"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Skewness / kurtosis from exact integer moments
# ---------------------------------------------------------------------------

_SKEWKURT_SQL = """
m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(q * q) AS BIGINT) AS s2,
         CAST(SUM(q * q * q) AS BIGINT) AS s3,
         CAST(SUM(q * q * q * q) AS BIGINT) AS s4
  FROM (SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS q
        FROM lineitem)
  GROUP BY l_returnflag
),
c AS (
  SELECT l_returnflag, n,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
           * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s2 AS DOUBLE) / n)
           - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM m
)
SELECT l_returnflag, n,
       ROUND(mu, 6) AS mean_qty,
       ROUND(sqrt(m2), 6) AS std_pop,
       ROUND(m3 / (m2 * sqrt(m2)), 6) AS skewness_g1,
       ROUND(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis_g2
FROM c
ORDER BY l_returnflag
"""


@register(
    "stats_skewness_kurtosis_moments",
    oracle="WITH " + _SKEWKURT_SQL,
    tags=("ext", "stats", "moments"),
    description="population skewness + excess kurtosis from exact moments",
)
def stats_skewness_kurtosis_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third and fourth standardized moments — the distribution-
    shape diagnostics (asymmetry, tail weight) — computed the
    exact-moment way: four integer power sums per group (quantity ≤
    50 keeps q⁴ sums far from overflow), central moments by the
    standard expansion, one closed-form division each. Built-in
    skewness/kurtosis differ between engines in both accumulation
    AND definition (sample vs population corrections); the moment
    route is definition-explicit and engine-exact, and it
    partial-aggregates map-side like every moment statistic here."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round("l_quantity").cast("long")
    m = li.select("l_returnflag", q.alias("q")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q"))
        .cast("long")
        .alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q"))
        .cast("long")
        .alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - mu * mu
    m3 = (
        F.col("s3").cast("double") / F.col("n")
        - 3 * mu * (F.col("s2").cast("double") / F.col("n"))
        + 2 * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / F.col("n")
        - 4 * mu * (F.col("s3").cast("double") / F.col("n"))
        + 6 * mu * mu * (F.col("s2").cast("double") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(mu, 6).alias("mean_qty"),
        F.round(F.sqrt(m2), 6).alias("std_pop"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness_g1"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis_g2"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# regr_* linear-regression aggregate family
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
SELECT l_returnflag,
       CAST(regr_count(y, x) AS BIGINT) AS n,
       ROUND(regr_avgx(y, x), 6) AS avg_x,
       ROUND(regr_avgy(y, x), 6) AS avg_y,
       ROUND(regr_slope(y, x), 6) AS slope,
       ROUND(regr_intercept(y, x), 6) AS intercept,
       ROUND(regr_r2(y, x), 6) AS r2
FROM (
  SELECT l_returnflag,
         CAST(CAST(ROUND(l_discount * 100) AS BIGINT) AS DOUBLE) AS x,
         CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DOUBLE) AS y
  FROM lineitem
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "regr_family_battery",
    oracle=_REGR_ORACLE,
    tags=("functions", "agg", "regression"),
    description="SQL regr_* aggregate family (count/avg/slope/intercept/r2)",
)
def regr_family_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI linear-regression aggregate family — regr_count /
    avgx / avgy / slope / intercept / r2 — the one-pass bivariate
    fit both engines implement natively (the engine's own REGR
    implementation was already pinned once via the grouped-map
    trend twin; this battery pins the WHOLE family). Inputs are
    exact integers promoted to double, so the accumulated moments
    agree to rounding precision across partial-aggregation orders.
    One hash aggregate; map-side combine applies."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        F.round(F.col("l_discount") * 100)
        .cast("long")
        .cast("double")
        .alias("x"),
        F.round("l_quantity").cast("long").cast("double").alias("y"),
    )
    t.createOrReplaceTempView("regr_in")
    return spark.sql(
        """
SELECT l_returnflag,
       CAST(regr_count(y, x) AS BIGINT) AS n,
       ROUND(regr_avgx(y, x), 6) AS avg_x,
       ROUND(regr_avgy(y, x), 6) AS avg_y,
       ROUND(regr_slope(y, x), 6) AS slope,
       ROUND(regr_intercept(y, x), 6) AS intercept,
       ROUND(regr_r2(y, x), 6) AS r2
FROM regr_in
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
    )


# ---------------------------------------------------------------------------
# Generator battery: stack / str_to_map / posexplode_outer
# ---------------------------------------------------------------------------

_GENERATOR_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 50
),
stacked AS (
  SELECT o_orderkey, 'status' AS attr, o_orderstatus AS val FROM base
  UNION ALL
  SELECT o_orderkey, 'priority', o_orderpriority FROM base
  UNION ALL
  SELECT o_orderkey, 'cents', CAST(cents AS VARCHAR) FROM base
)
SELECT o_orderkey, attr, val,
       'priority=' || (SELECT o_orderpriority FROM base b
                       WHERE b.o_orderkey = s.o_orderkey)
         || ',status=' || (SELECT o_orderstatus FROM base b
                           WHERE b.o_orderkey = s.o_orderkey)
         AS kv_roundtrip
FROM stacked s
ORDER BY o_orderkey, attr
"""


@register(
    "generator_stack_battery",
    oracle=_GENERATOR_ORACLE,
    tags=("functions", "generator", "wide-to-long"),
    description="stack() wide-to-long + str_to_map KV parsing roundtrip",
)
def generator_stack_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generator surface beyond explode: stack(n, ...) turns
    columns into attribute/value rows inline (wide-to-long without
    an UNPIVOT clause — useful inside SELECT), and str_to_map
    parses delimited key-value text back into a map, roundtripped
    to a sorted entries string. Generators multiply rows INSIDE the
    scan stage (no shuffle); the oracle builds the long form via
    UNION ALL and the map roundtrip via correlated lookups."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 50)
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = F.expr(
        "str_to_map(concat('status:', o_orderstatus, ',priority:', "
        "o_orderpriority), ',', ':')"
    )
    entries = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(m),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            )
        ),
        ",",
    )
    stacked = base.select(
        "o_orderkey",
        F.expr(
            "stack(3, 'status', o_orderstatus, 'priority', "
            "o_orderpriority, 'cents', CAST(cents AS STRING)) AS "
            "(attr, val)"
        ),
        entries.alias("kv_roundtrip"),
    )
    return stacked.select(
        "o_orderkey", "attr", "val", "kv_roundtrip"
    ).orderBy("o_orderkey", "attr")


# ---------------------------------------------------------------------------
# ROLLUP with grouping() / grouping_id() labels
# ---------------------------------------------------------------------------

_GROUPING_ID_ORACLE = """
SELECT COALESCE(o_orderstatus, '<ALL>') AS status,
       COALESCE(o_orderpriority, '<ALL>') AS priority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'grand_total'
            WHEN GROUPING(o_orderpriority) = 1 THEN 'status_subtotal'
            ELSE 'detail' END AS row_kind,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, status, priority
"""


@register(
    "rollup_grouping_id_labels",
    oracle=_GROUPING_ID_ORACLE,
    tags=("agg", "rollup", "grouping-id"),
    description="ROLLUP with grouping() flags distinguishing NULL vs subtotal",
)
def rollup_grouping_id_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouping() disambiguator the plain ROLLUP query omits:
    a NULL produced by rolling up is indistinguishable from a NULL
    in the data unless grouping(col) flags it — the correctness
    trap of every subtotal report over nullable dimensions. Each
    row self-describes as detail / subtotal / grand total. Same
    single-Expand single-shuffle plan as any rollup."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
SELECT COALESCE(o_orderstatus, '<ALL>') AS status,
       COALESCE(o_orderpriority, '<ALL>') AS priority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CASE WHEN grouping(o_orderstatus) = 1 THEN 'grand_total'
            WHEN grouping(o_orderpriority) = 1 THEN 'status_subtotal'
            ELSE 'detail' END AS row_kind,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, status, priority
"""
    )


# ---------------------------------------------------------------------------
# Interval coalescing: merge overlapping coverage windows
# ---------------------------------------------------------------------------

_COALESCE_SQL = """
iv AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS d0,
         CAST(l_shipdate AS DATE) + 7 AS d1
  FROM lineitem WHERE l_suppkey < 100
),
m AS (
  SELECT l_suppkey, d0, d1,
         MAX(d1) OVER (PARTITION BY l_suppkey ORDER BY d0, d1
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
),
flagged AS (
  SELECT l_suppkey, d0, d1,
         CASE WHEN prev_max IS NULL OR d0 > prev_max THEN 1 ELSE 0 END
           AS new_island
  FROM m
),
islands AS (
  SELECT l_suppkey, d0, d1,
         SUM(new_island) OVER (PARTITION BY l_suppkey ORDER BY d0, d1
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
merged AS (
  SELECT l_suppkey, island,
         MIN(d0) AS m0, MAX(d1) AS m1
  FROM islands GROUP BY l_suppkey, island
)
SELECT l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_merged_intervals,
       CAST(SUM(date_diff('day', m0, m1)) AS BIGINT) AS covered_days
FROM merged
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


@register(
    "intervals_coalesce_coverage",
    oracle="WITH " + _COALESCE_SQL,
    tags=("window", "intervals", "sweep-line"),
    description="merge overlapping 7-day ship windows into coverage intervals",
)
def intervals_coalesce_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-overlapping-intervals classic as a distributed
    sweep: each shipment opens a 7-day service window; per
    supplier, overlapping windows coalesce via the running-max
    island trick (an interval starts a new island iff it begins
    after every prior window has closed), then coverage is the sum
    of merged lengths. One shuffle on the key; the sweep is a
    per-key sort window — same movement profile as
    sessionization, because it IS generalized sessionization over
    intervals rather than points. All arithmetic on exact day
    integers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey") < 100
    )
    iv = li.select(
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("d0"),
        F.date_add(F.col("l_shipdate").cast("date"), 7).alias("d1"),
    )
    wseq = Window.partitionBy("l_suppkey").orderBy("d0", "d1")
    m = iv.withColumn(
        "prev_max",
        F.max("d1").over(
            wseq.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    flagged = m.withColumn(
        "new_island",
        F.when(
            F.col("prev_max").isNull() | (F.col("d0") > F.col("prev_max")),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = islands.groupBy("l_suppkey", "island").agg(
        F.min("d0").alias("m0"), F.max("d1").alias("m1")
    )
    return (
        merged.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_merged_intervals"),
            F.sum(F.datediff("m1", "m0")).cast("long").alias("covered_days"),
        )
        .orderBy("l_suppkey")
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) proportional allocation
# ---------------------------------------------------------------------------

_ALLOC_SQL = """
rev AS (
  SELECT n.n_name, CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev),
quota AS (
  SELECT r.n_name, r.cents,
         CAST(r.cents * 1000 // t.t AS BIGINT) AS base_seats,
         CAST(r.cents * 1000 % t.t AS BIGINT) AS remainder
  FROM rev r CROSS JOIN tot t
),
short AS (
  SELECT CAST(1000 - SUM(base_seats) AS BIGINT) AS extra FROM quota
),
ranked AS (
  SELECT q.*, s.extra,
         ROW_NUMBER() OVER (ORDER BY q.remainder DESC, q.n_name) AS rk
  FROM quota q CROSS JOIN short s
)
SELECT n_name, cents AS revenue_cents,
       CAST(base_seats + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
         AS seats,
       base_seats, remainder
FROM ranked
ORDER BY n_name
"""


@register(
    "allocation_largest_remainder",
    oracle="WITH " + _ALLOC_SQL,
    tags=("ext", "allocation", "apportionment"),
    description="Hamilton largest-remainder allocation of 1000 slots by revenue",
)
def allocation_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional apportionment done exactly: 1000 budget slots
    split across nations by revenue share using Hamilton's
    largest-remainder method — floor quotas first (cents·1000 DIV
    total: EXACT integer arithmetic, no float shares anywhere),
    leftover slots to the largest integer remainders with a
    deterministic name tie-break. The allocation always sums to
    exactly 1000 — the property float-rounded shares violate.
    This is the budget/sampling-quota splitter a data-mixture
    pipeline needs (cf. data_mixture_rates, which reports float
    rates; this one emits integer quotas)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("t"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "cents",
        F.expr("CAST(cents * 1000 div t AS BIGINT)").alias("base_seats"),
        F.expr("CAST(cents * 1000 % t AS BIGINT)").alias("remainder"),
    )
    short = quota.agg(
        (F.lit(1000) - F.sum("base_seats")).cast("long").alias("extra")
    )
    ranked = quota.crossJoin(F.broadcast(short)).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("remainder").desc(), "n_name")
        ),
    )
    return ranked.select(
        "n_name",
        F.col("cents").alias("revenue_cents"),
        (
            F.col("base_seats")
            + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
        )
        .cast("long")
        .alias("seats"),
        "base_seats",
        "remainder",
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# Classification metrics: precision / recall / F1 on en-vs-other
# ---------------------------------------------------------------------------

_PRF_SQL = """
pred AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y_true,
         CASE WHEN n_chars % 3 = 0 OR lang = 'en' THEN 1 ELSE 0 END
           AS y_pred
  FROM documents
),
cm AS (
  SELECT
    CAST(SUM(CASE WHEN y_true = 1 AND y_pred = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN y_true = 0 AND y_pred = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN y_true = 1 AND y_pred = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN y_true = 0 AND y_pred = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS tn
  FROM pred
)
SELECT tp, fp, fn, tn,
       ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_en,
       ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_en,
       ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1_en,
       ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
FROM cm
"""


@register(
    "model_eval_precision_recall_f1",
    oracle="WITH " + _PRF_SQL,
    tags=("ext", "model-eval", "classification"),
    description="confusion matrix + precision/recall/F1/accuracy",
)
def model_eval_precision_recall_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classification-metrics quartet the eval family still
    lacked (AUC, AP, lift and calibration are threshold-free; these
    are the THRESHOLDED metrics a deployed binary classifier
    reports): confusion counts and precision/recall/F1/accuracy for
    an 'is-English' task against a deterministic rule predictor
    (perfect recall, deliberate false positives — so every cell of
    the matrix is non-trivially exercised). One scan, one four-cell
    aggregate; the metrics are single divisions of exact counts."""
    d = load_table(spark, sf_dir, "documents")
    y_true = F.when(F.col("lang") == "en", 1).otherwise(0)
    y_pred = F.when(
        (F.col("n_chars") % 3 == 0) | (F.col("lang") == "en"), 1
    ).otherwise(0)
    cm = d.select(y_true.alias("y_true"), y_pred.alias("y_pred")).agg(
        F.sum(F.when((F.col("y_true") == 1) & (F.col("y_pred") == 1), 1)
              .otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((F.col("y_true") == 0) & (F.col("y_pred") == 1), 1)
              .otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((F.col("y_true") == 1) & (F.col("y_pred") == 0), 1)
              .otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when((F.col("y_true") == 0) & (F.col("y_pred") == 0), 1)
              .otherwise(0)).cast("long").alias("tn"),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
        ).alias("precision_en"),
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6
        ).alias("recall_en"),
        F.round(
            2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ).alias("f1_en"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# IPF raking (one row pass + one column pass) to uniform margins
# ---------------------------------------------------------------------------

_RAKING_SQL = """
obs AS (
  SELECT c.c_mktsegment AS seg, n.n_regionkey AS reg,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_mktsegment, n.n_regionkey
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_seg,
               CAST(COUNT(DISTINCT reg) AS BIGINT) AS n_reg
        FROM obs),
rowpass AS (
  SELECT o.seg, o.reg, o.n,
         o.n * (CAST(t.t AS DOUBLE) / t.n_seg)
           / SUM(o.n) OVER (PARTITION BY o.seg) AS w1
  FROM obs o CROSS JOIN tot t
),
colpass AS (
  SELECT seg, reg, n,
         w1 * ((SELECT CAST(t.t AS DOUBLE) / t.n_reg FROM tot t)
               / SUM(w1) OVER (PARTITION BY reg)) AS w2
  FROM rowpass
)
SELECT seg, CAST(reg AS INTEGER) AS reg, n,
       ROUND(w2, 4) AS raked_weighted_count,
       ROUND(w2 / n, 6) AS unit_weight
FROM colpass
ORDER BY seg, reg
"""


@register(
    "weights_raking_ipf",
    oracle="WITH " + _RAKING_SQL,
    tags=("ext", "weighting", "raking", "window"),
    description="IPF raking: one row pass + one column pass to uniform margins",
)
def weights_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) — the survey/panel
    reweighting that scales a crosstab to match target margins:
    one row pass (each segment scaled to an equal-share target)
    then one column pass (each region likewise), emitting the raked
    cell weights and per-unit weights. Each pass is a window sum
    over the AGGREGATED crosstab (≤25 cells), so raking costs
    nothing after the one fact-table aggregate regardless of data
    volume — further IPF rounds iterate the same two windows.
    This is how a training-data pipeline reweights a skewed corpus
    to a target demographic/source mix without resampling."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    obs = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("n_regionkey").alias("reg"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = obs.agg(
        F.sum("n").cast("long").alias("t"),
        F.countDistinct("seg").cast("long").alias("n_seg"),
        F.countDistinct("reg").cast("long").alias("n_reg"),
    )
    rowpass = obs.crossJoin(F.broadcast(tot)).select(
        "seg",
        "reg",
        "n",
        "t",
        "n_reg",
        (
            F.col("n")
            * (F.col("t").cast("double") / F.col("n_seg"))
            / F.sum("n").over(Window.partitionBy("seg"))
        ).alias("w1"),
    )
    colpass = rowpass.select(
        "seg",
        "reg",
        "n",
        (
            F.col("w1")
            * (
                (F.col("t").cast("double") / F.col("n_reg"))
                / F.sum("w1").over(Window.partitionBy("reg"))
            )
        ).alias("w2"),
    )
    return colpass.select(
        "seg",
        F.col("reg").cast("int").alias("reg"),
        "n",
        F.round("w2", 4).alias("raked_weighted_count"),
        F.round(F.col("w2") / F.col("n"), 6).alias("unit_weight"),
    ).orderBy("seg", "reg")


# ---------------------------------------------------------------------------
# Alarm hysteresis (debounced threshold state machine via LOCF)
# ---------------------------------------------------------------------------

_HYSTERESIS_SQL = """
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
crossings AS (
  SELECT event_type, h, c,
         CASE WHEN c >= 20 THEN 'on' WHEN c <= 10 THEN 'off' END
           AS crossing
  FROM hourly
),
state AS (
  SELECT event_type, h, c,
         COALESCE(
           last_value(crossing IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS UNBOUNDED PRECEDING), 'off') AS alarm_state
  FROM crossings
),
trans AS (
  SELECT event_type, h, c, alarm_state,
         CASE WHEN alarm_state = 'on'
                   AND COALESCE(lag(alarm_state) OVER (
                         PARTITION BY event_type ORDER BY h), 'off')
                       = 'off'
              THEN 1 ELSE 0 END AS fired
  FROM state
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(CASE WHEN alarm_state = 'on' THEN 1 ELSE 0 END) AS BIGINT)
         AS alarm_hours,
       CAST(SUM(fired) AS BIGINT) AS n_alarms_fired
FROM trans
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "events_alarm_hysteresis",
    oracle="WITH " + _HYSTERESIS_SQL,
    tags=("ext", "events", "monitoring", "hysteresis"),
    description="debounced alarm state machine (on≥20 / off≤10) via LOCF",
)
def events_alarm_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A thresholded alarm with HYSTERESIS — fire at ≥20 events/hour,
    clear only at ≤10, hold state in the deadband — the debouncing
    that stops a noisy metric from flapping a pager. The state
    machine needs no recursion: state changes only at threshold
    crossings, so between crossings it is literally
    last-observation-carried-forward over the crossing events (one
    IGNORE NULLS window). Reported per type: hours in alarm and
    distinct alarm activations. Same one-shuffle window profile as
    every LOCF operator here; the streaming twin would be
    applyInPandasWithState with the state tuple being one enum."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    crossing = F.when(F.col("c") >= 20, "on").when(
        F.col("c") <= 10, "off"
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    state = hourly.withColumn("crossing", crossing).withColumn(
        "alarm_state",
        F.coalesce(
            F.last("crossing", ignorenulls=True).over(w), F.lit("off")
        ),
    )
    prev = F.coalesce(
        F.lag("alarm_state").over(
            Window.partitionBy("event_type").orderBy("h")
        ),
        F.lit("off"),
    )
    trans = state.withColumn(
        "fired",
        F.when((F.col("alarm_state") == "on") & (prev == "off"), 1).otherwise(
            0
        ),
    )
    return (
        trans.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum(F.when(F.col("alarm_state") == "on", 1).otherwise(0))
            .cast("long")
            .alias("alarm_hours"),
            F.sum("fired").cast("long").alias("n_alarms_fired"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Web URL canonicalization + duplicate collapse
# ---------------------------------------------------------------------------

_URL_CANON_ORACLE = """
WITH expected AS (
  SELECT 'https://shop.example.com/item/'
           || CAST(p_partkey % 50 AS VARCHAR) AS canonical_url,
         p_partkey
  FROM part
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(MIN(p_partkey) AS BIGINT) AS first_partkey
FROM expected
GROUP BY canonical_url
ORDER BY canonical_url
"""


@register(
    "web_url_canonical_dedup",
    oracle=_URL_CANON_ORACLE,
    tags=("ext", "web", "dedup", "url"),
    description="URL canonicalization (case/port/query/fragment) + dedup",
)
def web_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CommonCrawl-style URL normalizer: dirty URLs (mixed-case
    scheme+host, explicit default port, tracking query params,
    fragments, trailing slash) are canonicalized by a regex chain —
    lowercase, strip :443, strip ?..., strip #..., strip trailing
    slash — then collapsed per canonical form. The Spark side REALLY
    parses the dirty strings it first synthesized (the oracle
    derives the expected canonical set relationally, so a
    canonicalizer bug cannot cancel itself out). Scalar regex work:
    linear scan, shuffle only for the final collapse — the
    first stage of any web-corpus dedup at 100 TB."""
    p = load_table(spark, sf_dir, "part")
    dirty = F.concat(
        F.lit("HTTPS://Shop.Example.COM:443/item/"),
        (F.col("p_partkey") % 50).cast("string"),
        F.lit("/?utm_source=p"),
        F.col("p_partkey").cast("string"),
        F.lit("&ref=mail#sec"),
        F.col("p_size").cast("string"),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(dirty), "#.*$", ""),
                r"\?.*$",
                "",
            ),
            ":443/",
            "/",
        ),
        "/$",
        "",
    )
    return (
        p.select(canon.alias("canonical_url"), "p_partkey")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.min("p_partkey").cast("long").alias("first_partkey"),
        )
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# Time-weighted average (step interpolation over irregular samples)
# ---------------------------------------------------------------------------

_TWA_SQL = """
s AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS v,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt_us
  FROM events WHERE user_id < 50
),
seg AS (
  SELECT user_id, v, (nxt_us - us) // 1000 AS dt_ms
  FROM s WHERE nxt_us IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dt_ms) // 1000 AS BIGINT) AS span_s,
       ROUND(CAST(SUM(v * dt_ms) AS DOUBLE) / SUM(dt_ms), 4)
         AS twa_cents
FROM seg
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "events_time_weighted_average",
    oracle="WITH " + _TWA_SQL,
    tags=("ext", "events", "timeseries", "twap"),
    description="time-weighted average value (step-held) per user",
)
def events_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-weighted average — the IoT/finance aggregate a plain
    AVG gets WRONG on irregularly-sampled series (a value held for
    6 hours must weigh 360× one held for a minute): each sample is
    step-held until the next (LEAD), weights are exact integral
    millisecond durations, and TWA = Σ v·dt / Σ dt with both sums
    exact BIGINTs — one division at the end. One shuffle on the
    key; at 100 TB this is the hypertable time_weight() aggregate
    rebuilt from a window + hash agg."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        us.alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.lead(us).over(w).alias("nxt_us"),
    )
    seg = s.filter(F.col("nxt_us").isNotNull()).select(
        "user_id",
        "v",
        F.expr("(nxt_us - us) div 1000").alias("dt_ms"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.expr("CAST(SUM(dt_ms) div 1000 AS BIGINT)").alias("span_s"),
            F.round(
                F.sum(F.col("v") * F.col("dt_ms")).cast("double")
                / F.sum("dt_ms"),
                4,
            ).alias("twa_cents"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

_CUPED_SQL = """
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM per_user
),
c AS (
  SELECT n,
         CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
           * (CAST(sx AS DOUBLE) / n) AS var_x,
         CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n)
           * (CAST(sy AS DOUBLE) / n) AS var_y,
         CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
           * (CAST(sy AS DOUBLE) / n) AS cov_xy
  FROM m
)
SELECT n,
       ROUND(cov_xy / var_x, 6) AS theta,
       ROUND(var_y, 4) AS var_y,
       ROUND(var_y - (cov_xy / var_x) * (cov_xy / var_x) * var_x, 4)
         AS var_y_cuped,
       ROUND((cov_xy / var_x) * (cov_xy / var_x) * var_x / var_y, 6)
         AS variance_reduction
FROM c
"""


@register(
    "ab_cuped_variance_reduction",
    oracle="WITH " + _CUPED_SQL,
    tags=("ext", "ab-testing", "cuped", "stats"),
    description="CUPED pre-period adjustment: theta + variance reduction",
)
def ab_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data) — the
    variance-reduction device every mature A/B platform applies
    before the t-test: per user, pre-period spend is the covariate
    X for the experiment-period metric Y; θ = cov(X,Y)/var(X), and
    the adjusted metric Y − θ(X−X̄) has variance var(Y) − θ²var(X).
    The achievable reduction (=ρ²) falls out of the same five exact
    integer moment sums as everything else in this family — one
    scan, one shuffle to the user grain, one 1-row aggregate; the
    sample size a reduction of r buys back is 1/(1−r)."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    var_x = F.col("sxx").cast("double") / F.col("n") - mx * mx
    var_y = F.col("syy").cast("double") / F.col("n") - my * my
    cov = F.col("sxy").cast("double") / F.col("n") - mx * my
    theta = cov / var_x
    return m.select(
        "n",
        F.round(theta, 6).alias("theta"),
        F.round(var_y, 4).alias("var_y"),
        F.round(var_y - theta * theta * var_x, 4).alias("var_y_cuped"),
        F.round(theta * theta * var_x / var_y, 6).alias(
            "variance_reduction"
        ),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals on the seasonal-naive forecast
# ---------------------------------------------------------------------------

_CONFORMAL_SQL = """
daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
paired AS (
  SELECT a.d, a.y, b.y AS forecast
  FROM daily a JOIN daily b ON b.d = a.d - 7
),
calib AS (
  SELECT CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY abs(y - forecast))
              AS BIGINT) AS q90
  FROM paired WHERE d BETWEEN 7 AND 22
)
SELECT p.d, p.y AS actual_cents, p.forecast AS forecast_cents,
       p.forecast - c.q90 AS lo_cents,
       p.forecast + c.q90 AS hi_cents,
       CAST(CASE WHEN abs(p.y - p.forecast) <= c.q90 THEN 1 ELSE 0 END
            AS INTEGER) AS covered
FROM paired p CROSS JOIN calib c
WHERE p.d >= 23
ORDER BY p.d
"""


@register(
    "forecast_conformal_interval",
    oracle="WITH " + _CONFORMAL_SQL,
    tags=("ext", "forecast", "conformal", "uncertainty"),
    description="split-conformal 90% intervals on the seasonal-naive forecast",
)
def forecast_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free uncertainty for ANY point forecaster:
    split-conformal intervals — calibrate the 90th-percentile
    absolute residual of the seasonal-naive (t−7) forecast on a
    held-out window, then attach ±q to each later forecast and
    report per-day coverage. The guarantee needs no model refit and
    no distributional assumption, which is why it's the modern
    default for forecast bands. Everything is exact integer cents
    plus one discrete percentile; the calibration constant is a
    1-row broadcast — conformalizing a 100 TB forecast pipeline
    costs one aggregate over its residuals."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    a = daily.alias("a")
    b = daily.select(
        (F.col("d") + 7).alias("d"), F.col("y").alias("forecast")
    )
    paired = a.join(b, "d")
    calib = (
        paired.filter((F.col("d") >= 7) & (F.col("d") <= 22))
        .agg(
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP "
                "(ORDER BY abs(y - forecast))"
            )
            .cast("long")
            .alias("q90")
        )
    )
    return (
        paired.filter(F.col("d") >= 23)
        .crossJoin(F.broadcast(calib))
        .select(
            "d",
            F.col("y").alias("actual_cents"),
            F.col("forecast").alias("forecast_cents"),
            (F.col("forecast") - F.col("q90")).alias("lo_cents"),
            (F.col("forecast") + F.col("q90")).alias("hi_cents"),
            F.when(
                F.abs(F.col("y") - F.col("forecast")) <= F.col("q90"), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("covered"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Quantile normalization of per-source score distributions
# ---------------------------------------------------------------------------

_QNORM_SQL = """
scored AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS raw,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM documents
),
pool AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS pr,
         COUNT(*) OVER () AS n_pool
  FROM documents
),
mapped AS (
  SELECT s.doc_id, s.source, s.raw,
         CAST((s.r * (SELECT MAX(n_pool) FROM pool) + s.n_s - 1) // s.n_s
              AS BIGINT) AS target_rank
  FROM scored s
)
SELECT m.doc_id, m.source, m.raw, p.v AS normalized
FROM mapped m JOIN pool p ON p.pr = m.target_rank
ORDER BY m.doc_id
"""


@register(
    "feature_quantile_normalization",
    oracle="WITH " + _QNORM_SQL,
    tags=("ext", "feature", "normalization", "window"),
    description="quantile-normalize per-source scores to the pooled distribution",
)
def feature_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization — force every source's score
    distribution onto the pooled reference (the cross-source
    calibration trick from genomics, equally at home normalizing
    per-domain quality scores before a corpus-wide threshold): each
    doc's within-source rank maps to the pooled value at the
    ceiling-scaled rank ⌈r·N/n_s⌉, ALL in exact integer rank
    arithmetic — no float quantiles, so both engines land on the
    identical pooled element. Two rank windows + one equi-join on
    rank; the pooled table is corpus-sized but carries only
    (value, rank)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("raw"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .alias("n_s"),
    )
    pool = d.select(
        F.col("n_chars").cast("long").alias("v"),
        F.row_number()
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("pr"),
    )
    n_pool = d.agg(F.count(F.lit(1)).cast("long").alias("n_pool"))
    mapped = scored.crossJoin(F.broadcast(n_pool)).select(
        "doc_id",
        "source",
        "raw",
        F.expr(
            "CAST((r * n_pool + n_s - 1) div n_s AS BIGINT)"
        ).alias("target_rank"),
    )
    return (
        mapped.join(pool, mapped.target_rank == pool.pr)
        .select("doc_id", "source", "raw", F.col("v").alias("normalized"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Difference-in-differences (pre/post × treated/control)
# ---------------------------------------------------------------------------

_DID_SQL = """
cells AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
           AS treated,
         CASE WHEN o.o_orderdate >= TIMESTAMP '1996-07-01' THEN 1 ELSE 0
           END AS post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
means AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 1
             THEN CAST(cents AS DOUBLE) / n END) AS t_post,
    MAX(CASE WHEN treated = 1 AND post = 0
             THEN CAST(cents AS DOUBLE) / n END) AS t_pre,
    MAX(CASE WHEN treated = 0 AND post = 1
             THEN CAST(cents AS DOUBLE) / n END) AS c_post,
    MAX(CASE WHEN treated = 0 AND post = 0
             THEN CAST(cents AS DOUBLE) / n END) AS c_pre,
    CAST(SUM(n) AS BIGINT) AS n_orders
  FROM cells
)
SELECT n_orders,
       ROUND(t_pre, 4) AS treated_pre_mean,
       ROUND(t_post, 4) AS treated_post_mean,
       ROUND(c_pre, 4) AS control_pre_mean,
       ROUND(c_post, 4) AS control_post_mean,
       ROUND((t_post - t_pre) - (c_post - c_pre), 4) AS did_estimate_cents
FROM means
"""


@register(
    "ab_difference_in_differences",
    oracle="WITH " + _DID_SQL,
    tags=("ext", "ab-testing", "causal", "did"),
    description="difference-in-differences: BUILDING segment, 1996-H2 cutoff",
)
def ab_difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The workhorse quasi-experimental estimator: treated group
    (BUILDING segment) vs control, before vs after a policy cutoff —
    DiD = (T_post − T_pre) − (C_post − C_pre), which differences
    away both the group's fixed level and the common time trend.
    Four cell means from exact integer cents (each a single
    division), so the estimate carries no float-accumulation
    ambiguity. One scan, one 4-cell aggregate — causal inference at
    100 TB is cheap once the design is right; it's the DESIGN, not
    the compute, that carries the assumptions (parallel trends,
    documented here as everywhere)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    treated = F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
    post = F.when(
        F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"), 1
    ).otherwise(0)
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(treated.alias("treated"), post.alias("post"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    mean = F.col("cents").cast("double") / F.col("n")

    def cell(t, p):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p), mean
            )
        )

    means = cells.agg(
        cell(1, 1).alias("t_post"),
        cell(1, 0).alias("t_pre"),
        cell(0, 1).alias("c_post"),
        cell(0, 0).alias("c_pre"),
        F.sum("n").cast("long").alias("n_orders"),
    )
    return means.select(
        "n_orders",
        F.round("t_pre", 4).alias("treated_pre_mean"),
        F.round("t_post", 4).alias("treated_post_mean"),
        F.round("c_pre", 4).alias("control_pre_mean"),
        F.round("c_post", 4).alias("control_post_mean"),
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            4,
        ).alias("did_estimate_cents"),
    )


# ---------------------------------------------------------------------------
# Windowed COUNT DISTINCT via the dense_rank trick
# ---------------------------------------------------------------------------

_WCD_SQL = """
SELECT DISTINCT l_suppkey,
       CAST(COUNT(*) OVER (PARTITION BY l_suppkey) AS BIGINT)
         AS n_lineitems,
       CAST((SELECT COUNT(DISTINCT l2.l_partkey) FROM lineitem l2
             WHERE l2.l_suppkey = l.l_suppkey) AS BIGINT)
         AS n_distinct_parts
FROM lineitem l
WHERE l_suppkey < 100
ORDER BY l_suppkey
"""


@register(
    "window_count_distinct_trick",
    oracle=_WCD_SQL,
    tags=("window", "distinct", "pattern"),
    description="windowed COUNT(DISTINCT) via the dense_rank maximum trick",
)
def window_count_distinct_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) OVER (...) is unsupported in Spark's window
    functions — this query pins the standard workaround: the
    per-partition MAXIMUM of dense_rank over the value order equals
    the distinct count, computed as a window column WITHOUT
    collapsing the rows (the property a groupBy can't give you when
    downstream columns must survive). Two window passes over ONE
    hash partitioning on the key; the oracle brute-forces the same
    count with a correlated COUNT(DISTINCT). At scale this is the
    device for per-entity cardinality features inside a wide
    feature-builder projection."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey") < 100
    )
    wd = Window.partitionBy("l_suppkey").orderBy("l_partkey")
    wall = Window.partitionBy("l_suppkey")
    enriched = li.select(
        "l_suppkey",
        F.count(F.lit(1)).over(wall).cast("long").alias("n_lineitems"),
        F.max(F.dense_rank().over(wd))
        .over(wall)
        .cast("long")
        .alias("n_distinct_parts"),
    )
    return enriched.distinct().orderBy("l_suppkey")


# ---------------------------------------------------------------------------
# Bot-detection heuristics (composite behavioral rules)
# ---------------------------------------------------------------------------

_BOT_SQL = """
per_min AS (
  SELECT user_id, epoch_us(ts) // 60000000 AS minute,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
burst AS (
  SELECT user_id, CAST(MAX(c) AS BIGINT) AS max_per_min FROM per_min
  GROUP BY user_id
),
gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
           AS gap_s
  FROM events
),
gap_mom AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_s) AS BIGINT) AS s1,
         CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY user_id HAVING COUNT(*) >= 3
),
profile AS (
  SELECT g.user_id, b.max_per_min, g.n_gaps,
         sqrt(CAST(g.s2 AS DOUBLE) / g.n_gaps
              - (CAST(g.s1 AS DOUBLE) / g.n_gaps)
                * (CAST(g.s1 AS DOUBLE) / g.n_gaps))
           / (CAST(g.s1 AS DOUBLE) / g.n_gaps) AS gap_cv,
         t.n_types
  FROM gap_mom g
  JOIN burst b ON b.user_id = g.user_id
  JOIN (SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT)
               AS n_types FROM events GROUP BY user_id) t
    ON t.user_id = g.user_id
)
SELECT user_id, max_per_min, n_gaps, ROUND(gap_cv, 6) AS gap_cv, n_types,
       CAST(CASE WHEN max_per_min >= 2 THEN 1 ELSE 0 END
            + CASE WHEN gap_cv < 0.85 THEN 1 ELSE 0 END
            + CASE WHEN n_types <= 4 THEN 1 ELSE 0 END AS INTEGER)
         AS bot_score
FROM profile
WHERE CASE WHEN max_per_min >= 2 THEN 1 ELSE 0 END
      + CASE WHEN gap_cv < 0.85 THEN 1 ELSE 0 END
      + CASE WHEN n_types <= 4 THEN 1 ELSE 0 END >= 1
ORDER BY bot_score DESC, user_id
LIMIT 50
"""


@register(
    "events_bot_detection_rules",
    oracle="WITH " + _BOT_SQL,
    tags=("ext", "events", "abuse", "bot-detection"),
    description="composite bot heuristics: burst rate, gap regularity, type breadth",
)
def events_bot_detection_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot scoring — the abuse-filter stage a web-scale
    training pipeline runs before any content filter: per user, the
    peak per-minute burst rate, the coefficient of variation of
    inter-arrival gaps (machines are REGULAR: low CV), and
    event-type breadth; each rule contributes one point. Gap CV
    comes from exact integer microsecond moments; every rule
    threshold is explicit and the composite is an integer. Three
    aggregates over one shuffle grain (user), joined broadcast-
    small at the profile level; top-50 suspects by score."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_min = e.groupBy(
        "user_id", F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 60000000"
        ).alias("minute")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    burst = per_min.groupBy("user_id").agg(
        F.max("c").cast("long").alias("max_per_min")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) - lag(unix_micros("
            "CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id)) div 1000000"
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    gap_mom = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap_s").cast("long").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s"))
            .cast("long")
            .alias("s2"),
        )
        .filter(F.col("n_gaps") >= 3)
    )
    types = e.groupBy("user_id").agg(
        F.countDistinct("event_type").cast("long").alias("n_types")
    )
    mean_gap = F.col("s1").cast("double") / F.col("n_gaps")
    cv = (
        F.sqrt(
            F.col("s2").cast("double") / F.col("n_gaps")
            - mean_gap * mean_gap
        )
        / mean_gap
    )
    profile = (
        gap_mom.join(burst, "user_id")
        .join(types, "user_id")
        .select(
            "user_id",
            "max_per_min",
            "n_gaps",
            cv.alias("gap_cv"),
            "n_types",
        )
    )
    score = (
        F.when(F.col("max_per_min") >= 2, 1).otherwise(0)
        + F.when(F.col("gap_cv") < 0.85, 1).otherwise(0)
        + F.when(F.col("n_types") <= 4, 1).otherwise(0)
    )
    return (
        profile.withColumn("bot_score", score.cast("int"))
        .filter(F.col("bot_score") >= 1)
        .select(
            "user_id",
            "max_per_min",
            "n_gaps",
            F.round("gap_cv", 6).alias("gap_cv"),
            "n_types",
            "bot_score",
        )
        .orderBy(F.col("bot_score").desc(), "user_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_SQL = """
qi AS (
  SELECT c.c_custkey, c.c_mktsegment AS seg, n.n_name AS nation,
         CAST(ROUND(c.c_acctbal) AS BIGINT) // 2000 AS bal_band
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
sens AS (
  SELECT o_custkey AS c_custkey, o_orderpriority FROM orders
),
groups AS (
  SELECT q.seg, q.nation, q.bal_band,
         CAST(COUNT(DISTINCT q.c_custkey) AS BIGINT) AS k,
         CAST(COUNT(DISTINCT s.o_orderpriority) AS BIGINT) AS l
  FROM qi q LEFT JOIN sens s ON s.c_custkey = q.c_custkey
  GROUP BY q.seg, q.nation, q.bal_band
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_qi_groups,
       CAST(MIN(k) AS BIGINT) AS k_anonymity,
       CAST(MIN(CASE WHEN l > 0 THEN l END) AS BIGINT) AS l_diversity,
       CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_k5,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
         AS users_needing_suppression,
       ROUND(CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
             / SUM(k), 6) AS suppression_rate
FROM groups
"""


@register(
    "privacy_k_anonymity_audit",
    oracle="WITH " + _KANON_SQL,
    tags=("ext", "privacy", "k-anonymity"),
    description="k-anonymity + l-diversity audit over (segment, nation, balance-band)",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-readiness audit for a quasi-identified extract: with
    QI = (segment, nation, $2000 balance band), report the dataset's
    k-anonymity (smallest QI-group size), l-diversity of the
    sensitive attribute (order priority) within groups, and the
    suppression cost of enforcing k≥5 — the redaction arithmetic a
    privacy review actually asks for, and the deterministic
    complement of the DP contribution-bounding operator. One
    groupBy over the QI tuple; the audit output is O(1)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    qi = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("n_name").alias("nation"),
        F.expr("CAST(ROUND(c_acctbal) AS BIGINT) div 2000").alias(
            "bal_band"
        ),
    )
    sens = o.select(
        F.col("o_custkey").alias("c_custkey"), "o_orderpriority"
    )
    groups = (
        qi.join(sens, "c_custkey", "left")
        .groupBy("seg", "nation", "bal_band")
        .agg(
            F.countDistinct("c_custkey").cast("long").alias("k"),
            F.countDistinct("o_orderpriority").cast("long").alias("l"),
        )
    )
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_qi_groups"),
        F.min("k").cast("long").alias("k_anonymity"),
        F.min(F.when(F.col("l") > 0, F.col("l")))
        .cast("long")
        .alias("l_diversity"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_k5"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
        .cast("long")
        .alias("users_needing_suppression"),
        F.round(
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)).cast(
                "double"
            )
            / F.sum("k"),
            6,
        ).alias("suppression_rate"),
    )


# ---------------------------------------------------------------------------
# Haar wavelet decomposition of the daily count series
# ---------------------------------------------------------------------------

_HAAR_SQL = """
daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-29'
  GROUP BY 1
),
l1 AS (
  SELECT d // 2 AS i,
         (SUM(CASE WHEN d % 2 = 0 THEN CAST(x AS DOUBLE) END)
          + SUM(CASE WHEN d % 2 = 1 THEN CAST(x AS DOUBLE) END)) / 2
           AS approx,
         (SUM(CASE WHEN d % 2 = 0 THEN CAST(x AS DOUBLE) END)
          - SUM(CASE WHEN d % 2 = 1 THEN CAST(x AS DOUBLE) END)) / 2
           AS detail
  FROM daily GROUP BY d // 2
),
l2 AS (
  SELECT i // 2 AS i,
         (SUM(CASE WHEN i % 2 = 0 THEN approx END)
          + SUM(CASE WHEN i % 2 = 1 THEN approx END)) / 2 AS approx,
         (SUM(CASE WHEN i % 2 = 0 THEN approx END)
          - SUM(CASE WHEN i % 2 = 1 THEN approx END)) / 2 AS detail
  FROM l1 GROUP BY i // 2
)
SELECT * FROM (
  SELECT 1 AS level, CAST(i AS INTEGER) AS idx,
         ROUND(approx, 4) AS approx, ROUND(detail, 4) AS detail
  FROM l1
  UNION ALL
  SELECT 2, CAST(i AS INTEGER), ROUND(approx, 4), ROUND(detail, 4)
  FROM l2
)
ORDER BY level, idx
"""


@register(
    "events_haar_wavelet_daily",
    oracle="WITH " + _HAAR_SQL,
    tags=("ext", "events", "timeseries", "wavelet"),
    description="2-level Haar wavelet decomposition of the daily view series",
)
def events_haar_wavelet_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet decomposition — the multiresolution transform
    under time-series compression and change localization: level 1
    halves the 28-day series into pairwise means (approximation)
    and half-differences (detail); level 2 repeats on the
    approximations. With integer inputs every coefficient is an
    exact dyadic rational (sums divided by powers of two — no
    rounding drift), so both engines agree bit-for-bit. Each level
    is one hash aggregate on the halved index — log₂(n) passes
    total, each over a series that halves, the textbook
    MapReduce-friendly transform."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "view")
        & (F.col("ts") < F.lit("2024-01-29").cast("timestamp"))
    )
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))

    def level(df, idx_col, val_col):
        even = F.sum(
            F.when(F.col(idx_col) % 2 == 0, F.col(val_col).cast("double"))
        )
        odd = F.sum(
            F.when(F.col(idx_col) % 2 == 1, F.col(val_col).cast("double"))
        )
        return df.groupBy(
            F.expr(f"{idx_col} div 2").alias("i")
        ).agg(
            ((even + odd) / 2).alias("approx"),
            ((even - odd) / 2).alias("detail"),
        )

    l1 = level(daily, "d", "x")
    l2 = level(l1.select(F.col("i").alias("d"), F.col("approx").alias("x")),
               "d", "x")
    out1 = l1.select(
        F.lit(1).alias("level"),
        F.col("i").cast("int").alias("idx"),
        F.round("approx", 4).alias("approx"),
        F.round("detail", 4).alias("detail"),
    )
    out2 = l2.select(
        F.lit(2).alias("level"),
        F.col("i").cast("int").alias("idx"),
        F.round("approx", 4).alias("approx"),
        F.round("detail", 4).alias("detail"),
    )
    return out1.unionAll(out2).orderBy("level", "idx")


# ---------------------------------------------------------------------------
# Lateral column aliases (Spark 4 SQL surface)
# ---------------------------------------------------------------------------

_LCA_SQL = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       cents // 100 AS dollars,
       dollars // 1000 AS kilodollar_band,
       CASE WHEN kilodollar_band >= 200 THEN 'large' ELSE 'regular' END
         AS size_class
FROM orders WHERE o_orderkey < 300
ORDER BY o_orderkey
"""


@register(
    "sql_lateral_column_alias",
    oracle=_LCA_SQL,
    tags=("sql-surface", "project"),
    description="lateral column aliases: each SELECT item builds on the last",
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases — referencing an alias defined earlier
    in the SAME select list (cents → dollars → band → class), the
    Spark 4 / modern-SQL convenience that otherwise forces nested
    subqueries or repeated expressions. The analyzer inlines the
    chain, so the physical plan is one projection — zero cost, pure
    ergonomics, and the derivation chain stays single-sourced (the
    maintainability point: change the cents rule once)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       cents div 100 AS dollars,
       dollars div 1000 AS kilodollar_band,
       CASE WHEN kilodollar_band >= 200 THEN 'large' ELSE 'regular' END
         AS size_class
FROM orders WHERE o_orderkey < 300
ORDER BY o_orderkey
"""
    )


# ---------------------------------------------------------------------------
# Chain-ladder development forecast (actuarial triangle)
# ---------------------------------------------------------------------------

_CHAIN_SQL = """
paid AS (
  SELECT (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS am,
         (year(l.l_shipdate) * 12 + month(l.l_shipdate))
           - (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS dev,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-07-01'
    AND l.l_shipdate < TIMESTAMP '1996-10-01'
),
tri AS (
  SELECT am, dev, CAST(SUM(cents) AS BIGINT) AS inc
  FROM paid WHERE dev BETWEEN 0 AND 5 GROUP BY am, dev
),
cum AS (
  SELECT am, dev,
         CAST(SUM(inc) OVER (PARTITION BY am ORDER BY dev) AS BIGINT) AS c
  FROM tri
),
latest AS (
  SELECT am, MAX(dev) AS last_dev FROM cum GROUP BY am
),
factors AS (
  SELECT a.dev AS k,
         CAST(SUM(b.c) AS DOUBLE) / SUM(a.c) AS f
  FROM cum a JOIN cum b ON b.am = a.am AND b.dev = a.dev + 1
  GROUP BY a.dev
),
f AS (
  SELECT
    MAX(CASE WHEN k = 0 THEN f END) AS f0,
    MAX(CASE WHEN k = 1 THEN f END) AS f1,
    MAX(CASE WHEN k = 2 THEN f END) AS f2,
    MAX(CASE WHEN k = 3 THEN f END) AS f3,
    MAX(CASE WHEN k = 4 THEN f END) AS f4
  FROM factors
)
SELECT c.am AS accident_month,
       CAST(l.last_dev AS INTEGER) AS last_dev,
       c.c AS latest_cents,
       ROUND(c.c
             * (CASE WHEN l.last_dev <= 0 THEN f.f0 ELSE 1 END)
             * (CASE WHEN l.last_dev <= 1 THEN f.f1 ELSE 1 END)
             * (CASE WHEN l.last_dev <= 2 THEN f.f2 ELSE 1 END)
             * (CASE WHEN l.last_dev <= 3 THEN f.f3 ELSE 1 END)
             * (CASE WHEN l.last_dev <= 4 THEN f.f4 ELSE 1 END), 2)
         AS ultimate_cents
FROM latest l
JOIN cum c ON c.am = l.am AND c.dev = l.last_dev
CROSS JOIN f
ORDER BY accident_month
"""


@register(
    "orders_chain_ladder_forecast",
    oracle="WITH " + _CHAIN_SQL,
    tags=("ext", "actuarial", "forecast", "triangle"),
    description="chain-ladder ultimate forecast from the ship-lag triangle",
)
def orders_chain_ladder_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain-ladder method — actuarial reserving's workhorse,
    equally the model for any cohort whose value DEVELOPS over
    observable lags: H1-1996 order cohorts accumulate shipped value
    by development month (the run-off triangle, censored at the
    valuation date so younger cohorts are shorter); volume-weighted
    development factors f_k = ΣC_{k+1}/ΣC_k come from cohorts
    observed at both ages; each cohort's ultimate = latest ×
    remaining factors, applied in a FIXED multiply order (explicit
    f0..f4 columns from a 1-row broadcast) so the chained-double
    product is engine-exact. Triangle cells are exact integer
    cents; the whole method is two aggregates and a self-join of a
    cohort×dev grid that is O(months²), independent of fact
    volume."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    am = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("am")
    dev = (
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        - (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
    ).alias("dev")
    paid = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        .select(
            am,
            dev,
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .filter((F.col("dev") >= 0) & (F.col("dev") <= 5))
    )
    tri = paid.groupBy("am", "dev").agg(
        F.sum("cents").cast("long").alias("inc")
    )
    cum = tri.select(
        "am",
        "dev",
        F.sum("inc")
        .over(
            Window.partitionBy("am")
            .orderBy("dev")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("c"),
    )
    latest = cum.groupBy("am").agg(F.max("dev").alias("last_dev"))
    a = cum.alias("a")
    b = cum.select(
        F.col("am").alias("am_b"),
        (F.col("dev") - 1).alias("dev_b"),
        F.col("c").alias("c_next"),
    )
    factors = (
        a.join(
            b,
            (F.col("a.am") == F.col("am_b"))
            & (F.col("a.dev") == F.col("dev_b")),
        )
        .groupBy(F.col("a.dev").alias("k"))
        .agg(
            (F.sum("c_next").cast("double") / F.sum("a.c")).alias("f")
        )
    )
    f = factors.agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("f"))).alias(f"f{k}")
            for k in range(5)
        ]
    )
    ult = F.col("c")
    for k in range(5):
        ult = ult * F.when(
            F.col("last_dev") <= k, F.col(f"f{k}")
        ).otherwise(F.lit(1.0))
    return (
        latest.join(
            cum,
            (latest.am == cum.am) & (latest.last_dev == cum.dev),
        )
        .drop(cum.am)
        .crossJoin(F.broadcast(f))
        .select(
            F.col("am").alias("accident_month"),
            F.col("last_dev").cast("int").alias("last_dev"),
            F.col("c").alias("latest_cents"),
            F.round(ult, 2).alias("ultimate_cents"),
        )
        .orderBy("accident_month")
    )


# ---------------------------------------------------------------------------
# Off-policy evaluation: IPS / SNIPS value of a target policy
# ---------------------------------------------------------------------------

_IPS_SQL = """
logged AS (
  SELECT event_type AS action,
         CAST(ROUND(value * 100) AS BIGINT) AS reward_cents
  FROM events
),
prop AS (
  SELECT action, CAST(COUNT(*) AS BIGINT) AS n_a FROM logged GROUP BY action
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM logged),
scored AS (
  SELECT l.reward_cents,
         CASE WHEN l.action = 'purchase' THEN 1 ELSE 0 END AS match_pi,
         CAST(p.n_a AS DOUBLE) / t.n AS propensity
  FROM logged l JOIN prop p ON p.action = l.action CROSS JOIN tot t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
       ROUND(AVG(CAST(reward_cents AS DOUBLE)), 4) AS logged_value_cents,
       ROUND(SUM(match_pi * reward_cents / propensity) / COUNT(*), 4)
         AS ips_value_cents,
       ROUND(SUM(match_pi * reward_cents / propensity)
             / SUM(match_pi / propensity), 4) AS snips_value_cents,
       ROUND(SUM(match_pi / propensity) / COUNT(*), 6)
         AS importance_weight_mean
FROM scored
"""


@register(
    "ope_ips_policy_value",
    oracle="WITH " + _IPS_SQL,
    tags=("ext", "model-eval", "off-policy", "ips"),
    description="off-policy evaluation: IPS + SNIPS value of 'always purchase'",
)
def ope_ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation — pricing a NEW policy on OLD logs
    without deploying it: the logged stream's actions (event types)
    get empirical propensities; the target policy ('always
    purchase') is valued by inverse-propensity scoring, plus the
    self-normalized variant (SNIPS) that trades a little bias for
    much less variance, plus the mean importance weight (≈1 is the
    standard diagnostic that propensities are calibrated). AVG and
    the IPS sums are plain aggregates over exact cents with a
    broadcast propensity table — the counterfactual estimate costs
    one scan, which is the whole point of OPE at log scale."""
    e = load_table(spark, sf_dir, "events")
    logged = e.select(
        F.col("event_type").alias("action"),
        F.round(F.col("value") * 100).cast("long").alias("reward_cents"),
    )
    prop = logged.groupBy("action").agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    tot = logged.agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (
        logged.join(F.broadcast(prop), "action")
        .crossJoin(F.broadcast(tot))
        .select(
            "reward_cents",
            F.when(F.col("action") == "purchase", 1)
            .otherwise(0)
            .alias("match_pi"),
            (F.col("n_a").cast("double") / F.col("n")).alias("propensity"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_logged"),
        F.round(F.avg(F.col("reward_cents").cast("double")), 4).alias(
            "logged_value_cents"
        ),
        F.round(
            F.sum(
                F.col("match_pi") * F.col("reward_cents") / F.col("propensity")
            )
            / F.count(F.lit(1)),
            4,
        ).alias("ips_value_cents"),
        F.round(
            F.sum(
                F.col("match_pi") * F.col("reward_cents") / F.col("propensity")
            )
            / F.sum(F.col("match_pi") / F.col("propensity")),
            4,
        ).alias("snips_value_cents"),
        F.round(
            F.sum(F.col("match_pi") / F.col("propensity"))
            / F.count(F.lit(1)),
            6,
        ).alias("importance_weight_mean"),
    )


# ---------------------------------------------------------------------------
# SPRT sequential test on the daily urgent-order share
# ---------------------------------------------------------------------------

_SPRT_SQL = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
),
walk AS (
  SELECT d,
         CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
         CAST(SUM(k) OVER w AS BIGINT) AS cum_k,
         SUM(k) OVER w * ln(0.25 / 0.2)
           + (SUM(n) OVER w - SUM(k) OVER w) * ln(0.75 / 0.8) AS llr
  FROM daily
  WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
),
flagged AS (
  SELECT d, cum_n, cum_k, llr,
         CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
              WHEN llr <= ln(1.0 / 19.0) THEN 'accept_h0'
              ELSE 'continue' END AS decision
  FROM walk
)
SELECT strftime(d, '%Y-%m-%d') AS d, cum_n, cum_k,
       ROUND(llr, 6) AS llr, decision,
       CASE WHEN ROW_NUMBER() OVER (
              PARTITION BY CASE WHEN decision <> 'continue' THEN 1 ELSE 0
                           END ORDER BY d) = 1
                 AND decision <> 'continue'
            THEN 1 ELSE 0 END AS is_first_decision
FROM flagged
ORDER BY d
"""


@register(
    "ab_sprt_sequential_test",
    oracle="WITH " + _SPRT_SQL,
    tags=("ext", "ab-testing", "sequential", "sprt"),
    description="Wald SPRT walk: urgent-share 20% vs 25%, 5% error bounds",
)
def ab_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability-ratio test — the always-valid
    monitor that lets an experiment STOP EARLY without p-hacking:
    the cumulative binomial log-likelihood ratio of H1 (urgent
    share 25%) vs H0 (20%) walks day by day; crossing ln(19)
    accepts H1, ln(1/19) accepts H0 (α=β=5%), in-between keeps
    sampling — with the first-crossing day flagged. The LLR is
    integer counts times two log constants (each row independently
    computed from exact cumulative counts, so the walk is
    engine-exact). One ordered window over the daily aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        )
        .cast("long")
        .alias("k"),
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    import math

    la = math.log(0.25 / 0.2)
    lb = math.log(0.75 / 0.8)
    walk = daily.select(
        "d",
        F.sum("n").over(w).cast("long").alias("cum_n"),
        F.sum("k").over(w).cast("long").alias("cum_k"),
        (
            F.sum("k").over(w) * F.expr("ln(0.25 / 0.2)")
            + (F.sum("n").over(w) - F.sum("k").over(w))
            * F.expr("ln(0.75 / 0.8)")
        ).alias("llr"),
    )
    decision = (
        F.when(F.col("llr") >= F.expr("ln(19.0)"), "accept_h1")
        .when(F.col("llr") <= F.expr("ln(1.0 / 19.0)"), "accept_h0")
        .otherwise("continue")
    )
    flagged = walk.withColumn("decision", decision)
    first = F.when(
        (
            F.row_number().over(
                Window.partitionBy(
                    F.when(F.col("decision") != "continue", 1).otherwise(0)
                ).orderBy("d")
            )
            == 1
        )
        & (F.col("decision") != "continue"),
        1,
    ).otherwise(0)
    return flagged.select(
        F.col("d").cast("string").alias("d"),
        "cum_n",
        "cum_k",
        F.round("llr", 6).alias("llr"),
        "decision",
        first.alias("is_first_decision"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric (revenue per event)
# ---------------------------------------------------------------------------

_DELTA_SQL = """
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM per_user
),
c AS (
  SELECT n,
         CAST(sy AS DOUBLE) / sx AS r,
         CAST(sx AS DOUBLE) / n AS mx,
         (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n)
            * (CAST(sy AS DOUBLE) / n)
          - 2 * (CAST(sy AS DOUBLE) / sx)
            * (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
               * (CAST(sy AS DOUBLE) / n))
          + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
            * (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
               * (CAST(sx AS DOUBLE) / n))) AS var_num
  FROM m
)
SELECT n,
       ROUND(r, 6) AS ratio_cents_per_event,
       ROUND(sqrt(var_num / n) / mx, 6) AS se_delta,
       ROUND(r - 1.96 * sqrt(var_num / n) / mx, 6) AS ci_lo,
       ROUND(r + 1.96 * sqrt(var_num / n) / mx, 6) AS ci_hi
FROM c
"""


@register(
    "ab_delta_method_ratio_ci",
    oracle="WITH " + _DELTA_SQL,
    tags=("ext", "ab-testing", "delta-method", "stats"),
    description="delta-method CI for the ratio metric revenue-per-event",
)
def ab_delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delta method for RATIO metrics — the fix for the classic
    A/B mistake of treating revenue-per-event as an average of
    per-user ratios (sessions per user vary, so the naive SE is
    wrong): Var(Ȳ/X̄) ≈ (σ²_y − 2r·σ_xy + r²σ²_x)/(n·x̄²), all from
    the six exact integer moment sums over the USER grain (the unit
    of randomization). Output: the ratio, its delta-method standard
    error, and the 95% CI — one scan, one shuffle to users, one
    1-row aggregate, same as every estimator in this family."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    r = F.col("sy").cast("double") / F.col("sx")
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    var_y = F.col("syy").cast("double") / F.col("n") - my * my
    cov = F.col("sxy").cast("double") / F.col("n") - mx * my
    var_x = F.col("sxx").cast("double") / F.col("n") - mx * mx
    var_num = var_y - 2 * r * cov + r * r * var_x
    se = F.sqrt(var_num / F.col("n")) / mx
    return m.select(
        "n",
        F.round(r, 6).alias("ratio_cents_per_event"),
        F.round(se, 6).alias("se_delta"),
        F.round(r - 1.96 * se, 6).alias("ci_lo"),
        F.round(r + 1.96 * se, 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Extreme-value tail: peaks-over-threshold with GPD moment fit
# ---------------------------------------------------------------------------

_EVT_SQL = """
base AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
thr AS (
  SELECT CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
              AS BIGINT) AS u
  FROM base
),
exc AS (
  SELECT b.cents - t.u AS z
  FROM base b CROSS JOIN thr t WHERE b.cents > t.u
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_exc,
         CAST(SUM(z) AS BIGINT) AS s1,
         CAST(SUM(z * z) AS BIGINT) AS s2,
         CAST(MAX(z) AS BIGINT) AS max_excess
  FROM exc
),
fit AS (
  SELECT n_exc, max_excess,
         CAST(s1 AS DOUBLE) / n_exc AS mean_exc,
         CAST(s2 AS DOUBLE) / n_exc - (CAST(s1 AS DOUBLE) / n_exc)
           * (CAST(s1 AS DOUBLE) / n_exc) AS var_exc
  FROM m
)
SELECT t.u AS threshold_cents, f.n_exc, f.max_excess,
       ROUND(f.mean_exc, 4) AS mean_excess_cents,
       ROUND(0.5 * (f.mean_exc * f.mean_exc / f.var_exc - 1) * -1 + 0.5,
             6) AS gpd_xi_moment,
       ROUND(0.5 * f.mean_exc * (f.mean_exc * f.mean_exc / f.var_exc + 1),
             4) AS gpd_beta_moment
FROM fit f CROSS JOIN thr t
"""


@register(
    "events_evt_peaks_over_threshold",
    oracle="WITH " + _EVT_SQL,
    tags=("ext", "stats", "extreme-value", "tail-risk"),
    description="peaks-over-threshold GPD moment fit on order totals",
)
def events_evt_peaks_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value tail modelling — peaks over the p95 threshold
    with the generalized-Pareto MOMENT estimators ξ = ½(1 − m²/s²)
    and β = ½m(m²/s² + 1) — the closed-form fit a risk monitor runs
    before quoting tail quantiles beyond the observed range. The
    threshold is a discrete percentile (both engines cut the same
    cent), excesses are exact integers, and the two moments are
    single divisions — the whole EVT fit is one scan + one
    broadcast threshold + one 1-row aggregate, so it runs per
    window at stream scale."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    thr = base.agg(
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("u")
    )
    exc = (
        base.crossJoin(F.broadcast(thr))
        .filter(F.col("cents") > F.col("u"))
        .select((F.col("cents") - F.col("u")).alias("z"), "u")
    )
    m = exc.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_exc"),
        F.sum("z").cast("long").alias("s1"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("s2"),
        F.max("z").cast("long").alias("max_excess"),
    )
    mean_exc = F.col("s1").cast("double") / F.col("n_exc")
    var_exc = (
        F.col("s2").cast("double") / F.col("n_exc") - mean_exc * mean_exc
    )
    ratio = mean_exc * mean_exc / var_exc
    return m.select(
        F.col("u").alias("threshold_cents"),
        "n_exc",
        "max_excess",
        F.round(mean_exc, 4).alias("mean_excess_cents"),
        F.round(0.5 * (ratio - 1) * -1 + 0.5, 6).alias("gpd_xi_moment"),
        F.round(0.5 * mean_exc * (ratio + 1), 4).alias("gpd_beta_moment"),
    )


# ---------------------------------------------------------------------------
# Business-day latency (weekday-only date arithmetic)
# ---------------------------------------------------------------------------

_BUSDAY_ORACLE = """
WITH first_ship AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ship_d
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_d, f.ship_d
  FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey < 500 AND f.ship_d >= CAST(o.o_orderdate AS DATE)
),
expanded AS (
  SELECT j.o_orderkey, j.order_d, j.ship_d,
         j.order_d + CAST(g.i AS INTEGER) AS d
  FROM j CROSS JOIN generate_series(0, 3000) g(i)
  WHERE j.order_d + CAST(g.i AS INTEGER) < j.ship_d
)
SELECT e.o_orderkey,
       strftime(e.order_d, '%Y-%m-%d') AS order_d,
       strftime(e.ship_d, '%Y-%m-%d') AS ship_d,
       CAST(date_diff('day', e.order_d, e.ship_d) AS BIGINT)
         AS calendar_days,
       CAST(SUM(CASE WHEN dayofweek(e.d) NOT IN (0, 6) THEN 1 ELSE 0 END)
            AS BIGINT) AS business_days
FROM expanded e
GROUP BY e.o_orderkey, e.order_d, e.ship_d
ORDER BY e.o_orderkey
"""


@register(
    "orders_business_day_latency",
    oracle=_BUSDAY_ORACLE,
    tags=("functions", "temporal", "business-days"),
    description="order→first-ship latency in business days (weekdays only)",
)
def orders_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day arithmetic — the SLA math contracts are written
    in (weekends excluded): per order, the count of weekdays
    strictly between order date and first ship date, alongside
    calendar days. The Spark side expands each bounded date range
    with sequence()+explode and filters weekday — declarative,
    codegen'd, and immune to the off-by-one minefield of
    closed-form weekday formulas; the oracle does the same
    expansion relationally. Ranges are span-bounded (≤3000 days here), so
    the expansion is O(orders × latency), not unbounded —
    the explicit trade documented for at-scale use (a closed-form
    rewrite drops the expansion if latencies ever grow)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("ship_d")
    )
    j = (
        o.join(first_ship, o.o_orderkey == first_ship.l_orderkey)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_d"),
            "ship_d",
        )
        # Strictly-greater mirrors the oracle's empty expansion for
        # same-day orders: sequence(d, d-1) would otherwise descend and
        # emit a spurious d-1 row that survives the d < ship_d filter.
        .filter(F.col("ship_d") > F.col("order_d"))
    )
    days = j.select(
        "o_orderkey",
        "order_d",
        "ship_d",
        F.explode(
            F.sequence(
                F.col("order_d"), F.date_sub(F.col("ship_d"), 1)
            )
        ).alias("d"),
    ).filter(F.col("d") < F.col("ship_d"))
    return (
        days.groupBy("o_orderkey", "order_d", "ship_d")
        .agg(
            F.sum(
                F.when(~F.dayofweek("d").isin(1, 7), 1).otherwise(0)
            )
            .cast("long")
            .alias("business_days")
        )
        .select(
            "o_orderkey",
            F.col("order_d").cast("string").alias("order_d"),
            F.col("ship_d").cast("string").alias("ship_d"),
            F.datediff("ship_d", "order_d").cast("long").alias(
                "calendar_days"
            ),
            "business_days",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Segmented regression at a known breakpoint
# ---------------------------------------------------------------------------

_SEGREG_SQL = """
daily AS (
  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
seg AS (
  SELECT CASE WHEN t < 15 THEN 'before' ELSE 'after' END AS segment,
         t, y FROM daily
),
m AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(t * t) AS BIGINT) AS sxx,
         CAST(SUM(t * y) AS BIGINT) AS sxy
  FROM seg GROUP BY segment
)
SELECT segment, n,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
         AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
                * sx) / n, 6) AS intercept,
       ROUND(((CAST(sy AS DOUBLE)
               - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                  / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
                 * sx) / n)
             + ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
               * 15, 6) AS fit_at_break
FROM m
ORDER BY segment
"""


@register(
    "stats_segmented_regression_known_break",
    oracle="WITH " + _SEGREG_SQL,
    tags=("ext", "stats", "regression", "changepoint"),
    description="two-segment OLS around a known breakpoint (day 15)",
)
def stats_segmented_regression_known_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted-time-series analysis: fit separate OLS lines
    before and after a KNOWN intervention day and evaluate both at
    the breakpoint — the discontinuity (level shift) and the slope
    change are the two causal readouts of a policy's effect on a
    trend (the CUSUM operator FINDS candidate breaks; this one
    QUANTIFIES a hypothesized one). Per-segment closed-form slopes
    from exact integer moments, projected to the break from both
    sides. One scan to the daily grain, one 2-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    seg = daily.select(
        F.when(F.col("t") < 15, "before").otherwise("after").alias(
            "segment"
        ),
        "t",
        "y",
    )
    m = seg.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("sxx"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col(
        "n"
    )
    return m.select(
        "segment",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(intercept + slope * 15, 6).alias("fit_at_break"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Map explode (entries → rows generator)
# ---------------------------------------------------------------------------

_MAP_EXPLODE_ORACLE = """
SELECT o_orderkey, mk, mv FROM (
  SELECT o_orderkey, 'priority' AS mk, o_orderpriority AS mv
  FROM orders WHERE o_orderkey < 100
  UNION ALL
  SELECT o_orderkey, 'status', o_orderstatus
  FROM orders WHERE o_orderkey < 100
)
ORDER BY o_orderkey, mk
"""


@register(
    "map_explode_entries",
    oracle=_MAP_EXPLODE_ORACLE,
    tags=("functions", "map", "generator"),
    description="explode a map column into (key, value) rows",
)
def map_explode_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map generator: explode(map) yields one (key, value) row
    per entry — the EAV pivot for map-typed attribute bags (the
    read-side complement of str_to_map and map_concat elsewhere in
    the registry). Output is sorted on (row key, map key) because
    map iteration order is an implementation detail no result may
    depend on. Generator inside the scan stage; zero shuffle before
    the presentation sort."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    m = F.create_map(
        F.lit("status"),
        F.col("o_orderstatus"),
        F.lit("priority"),
        F.col("o_orderpriority"),
    )
    return (
        o.select("o_orderkey", F.explode(m).alias("mk", "mv"))
        .orderBy("o_orderkey", "mk")
    )


# ---------------------------------------------------------------------------
# Open-order aging waterfall at a valuation date
# ---------------------------------------------------------------------------

_AGING_SQL = """
open_orders AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
         date_diff('day', CAST(o.o_orderdate AS DATE), DATE '1997-01-01')
           AS age_days
  FROM orders o
  WHERE o.o_orderstatus = 'O' AND o.o_orderdate < TIMESTAMP '1997-01-01'
),
bucketed AS (
  SELECT o_orderpriority,
         CASE WHEN age_days <= 30 THEN '0-030'
              WHEN age_days <= 90 THEN '031-090'
              WHEN age_days <= 180 THEN '091-180'
              ELSE '181+' END AS age_bucket,
         cents
  FROM open_orders
)
SELECT o_orderpriority, age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS open_cents
FROM bucketed
GROUP BY o_orderpriority, age_bucket
ORDER BY o_orderpriority, age_bucket
"""


@register(
    "orders_aging_waterfall",
    oracle="WITH " + _AGING_SQL,
    tags=("agg", "aging", "finance"),
    description="open-order aging waterfall (0-30/31-90/91-180/181+) per priority",
)
def orders_aging_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accounts-receivable aging report transplanted to open
    orders: everything still open at the valuation date bucketed by
    age band, counts and exact open cents per (priority, band) —
    the report every finance close runs and every ops review reads.
    Age bands are CASE ladders over exact day integers (zero
    ambiguity at band edges); one filtered scan + one hash
    aggregate, with the valuation date a literal the caller
    parameterizes."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    age = F.datediff(
        F.lit("1997-01-01").cast("date"), F.col("o_orderdate").cast("date")
    )
    bucket = (
        F.when(age <= 30, "0-030")
        .when(age <= 90, "031-090")
        .when(age <= 180, "091-180")
        .otherwise("181+")
    )
    return (
        o.groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("open_cents"),
        )
        .orderBy("o_orderpriority", "age_bucket")
    )


# ---------------------------------------------------------------------------
# Growth accounting: new / retained / resurrected per day
# ---------------------------------------------------------------------------

_GROWTH_SQL = """
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
lagged AS (
  SELECT user_id, d,
         MIN(d) OVER (PARTITION BY user_id) AS first_day,
         LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_day
  FROM activity
),
classed AS (
  SELECT d,
         CASE WHEN d = first_day THEN 'new'
              WHEN date_diff('day', prev_day, d) = 1 THEN 'retained'
              WHEN date_diff('day', prev_day, d) >= 7 THEN 'resurrected'
              ELSE 'returning' END AS klass
  FROM lagged
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN klass = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN klass = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(SUM(CASE WHEN klass = 'returning' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning,
       CAST(SUM(CASE WHEN klass = 'resurrected' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_resurrected,
       CAST(COUNT(*) AS BIGINT) AS dau
FROM classed
GROUP BY d
ORDER BY day
"""


@register(
    "events_growth_accounting_daily",
    oracle="WITH " + _GROWTH_SQL,
    tags=("ext", "events", "growth-accounting", "window"),
    description="daily growth accounting: new / retained / returning / resurrected",
)
def events_growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — the DAU decomposition every product
    review starts with: each active (user, day) is NEW (first day
    ever), RETAINED (also active yesterday), RESURRECTED (back
    after a ≥7-day absence) or merely returning. The classifier is
    two windows over the distinct (user, day) grid — bounded by
    users × days, not events — and the daily report is one
    aggregate; the identity n_new+retained+returning+resurrected =
    DAU is structural. At 100 TB the activity grid is the only
    state, partitioned by user for the windows, re-shuffled once to
    days for the report."""
    e = load_table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wseq = Window.partitionBy("user_id").orderBy("d")
    lagged = activity.select(
        "user_id",
        "d",
        F.min("d").over(wu).alias("first_day"),
        F.lag("d").over(wseq).alias("prev_day"),
    )
    klass = (
        F.when(F.col("d") == F.col("first_day"), "new")
        .when(F.datediff("d", "prev_day") == 1, "retained")
        .when(F.datediff("d", "prev_day") >= 7, "resurrected")
        .otherwise("returning")
    )
    return (
        lagged.select(F.col("d"), klass.alias("klass"))
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("klass") == "new", 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("klass") == "retained", 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum(F.when(F.col("klass") == "returning", 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
            F.sum(F.when(F.col("klass") == "resurrected", 1).otherwise(0))
            .cast("long")
            .alias("n_resurrected"),
            F.count(F.lit(1)).cast("long").alias("dau"),
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "n_new",
            "n_retained",
            "n_returning",
            "n_resurrected",
            "dau",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Arrow-native grouped map (applyInArrow — the no-pandas UDF surface)
# ---------------------------------------------------------------------------


@register(
    "arrow_grouped_map_segment_stats",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("arrow", "grouped-map", "udf-surface"),
    description="applyInArrow grouped map: per-segment exact order stats",
)
def arrow_grouped_map_segment_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark 4's Arrow-NATIVE grouped map (applyInArrow): the UDF
    receives a pyarrow.Table per group — no pandas materialization,
    no copy out of Arrow memory — the right surface when the Python
    side only aggregates columnar buffers. Work per group is
    pyarrow.compute kernels (C++), so this is the fastest Python-UDF
    class Spark offers; the exact-integer-cents contract keeps it
    hash-identical to the relational oracle. (Sibling surfaces:
    grouped_map_segment_trend = applyInPandas,
    multimodal_chunks_arrow = mapInArrow.)"""
    import pyarrow as pa
    import pyarrow.compute as pc

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def stats(table: "pa.Table") -> "pa.Table":
        seg = table.column("c_mktsegment")[0].as_py()
        return pa.Table.from_pydict(
            {
                "c_mktsegment": [seg],
                "n_orders": [table.num_rows],
                "revenue_cents": [pc.sum(table.column("cents")).as_py()],
            },
            schema=pa.schema(
                [
                    ("c_mktsegment", pa.string()),
                    ("n_orders", pa.int64()),
                    ("revenue_cents", pa.int64()),
                ]
            ),
        )

    return (
        joined.groupBy("c_mktsegment")
        .applyInArrow(
            stats,
            "c_mktsegment string, n_orders long, revenue_cents long",
        )
        .orderBy("c_mktsegment")
    )
