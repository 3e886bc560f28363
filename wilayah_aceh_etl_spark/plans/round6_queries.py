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
