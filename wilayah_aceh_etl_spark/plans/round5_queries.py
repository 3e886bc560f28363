"""Round-5 declared queries: SQL-surface completions (GROUP BY ALL /
ORDER BY ALL, LIMIT..OFFSET pagination, inline-VALUES dimension) and
the ML feature-engineering family a training pipeline runs before
model fitting (leave-one-out target encoding, deterministic k-fold
assignment, one-hot + inverse-frequency class weights, a scaling
battery: z-score / min-max / robust), plus time-series and retrieval
completions in later sections.

The reference has no analytics surface (SURVEY.md §2.11); these
extend the EXT mandate (`BASELINE.json:6` — training-data pipeline
operators) and the modern-SQL surface. Determinism contract as
repo-wide: money in exact integer cents, ratios as single double
divisions of exact ints, identical aliases both sides, total ORDER
BY on every result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wilayah_aceh_etl_spark.plans.registry import register
from wilayah_aceh_etl_spark.sources.tables import load_table, spread

_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
_ACCT_CENTS = "CAST(ROUND(c_acctbal * 100) AS BIGINT)"


def _o_cents():
    return F.round(F.col("o_totalprice") * 100).cast("long")


def _c_cents():
    return F.round(F.col("c_acctbal") * 100).cast("long")


# ---------------------------------------------------------------------------
# SQL surface: GROUP BY ALL / ORDER BY ALL
# ---------------------------------------------------------------------------


@register(
    "sql_group_by_all",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY ALL
ORDER BY ALL
""",
    tags=("sql-surface", "agg"),
    description="GROUP BY ALL / ORDER BY ALL modern-SQL aggregation",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL through the Spark SQL front-end —
    the analyzer infers grouping keys from the non-aggregate select
    list and the sort from the full output row, so the query text
    stays stable as columns are added. Same hash-aggregate plan as
    an explicit GROUP BY (partial+final, no extra shuffle)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               SUM({_CENTS}) AS revenue_cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# SQL surface: LIMIT .. OFFSET pagination
# ---------------------------------------------------------------------------


@register(
    "sql_limit_offset_page",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer
ORDER BY acctbal_cents DESC, c_custkey
LIMIT 20 OFFSET 40
""",
    tags=("sql-surface", "topk", "pagination"),
    description="LIMIT..OFFSET keyset-free pagination (page 3 of 20)",
)
def sql_limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET pagination: rows 41-60 of a total order. Spark plans a
    single TakeOrderedAndProject of limit+offset rows then drops the
    prefix on the driver — no full sort materializes. (At 100 TB,
    deep OFFSET pages degrade linearly; keyset pagination — WHERE
    key > last_seen — is the scale path, and the total order here
    includes the unique key to make that rewrite valid.)"""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer
        ORDER BY acctbal_cents DESC, c_custkey
        LIMIT 20 OFFSET 40
        """
    )


# ---------------------------------------------------------------------------
# SQL surface: inline VALUES dimension
# ---------------------------------------------------------------------------

_TIER_ROWS = [
    ("1-URGENT", "expedite"),
    ("2-HIGH", "expedite"),
    ("3-MEDIUM", "standard"),
    ("4-NOT SPECIFIED", "standard"),
    ("5-LOW", "deferred"),
]

_TIER_VALUES_SQL = ", ".join(f"('{p}', '{t}')" for p, t in _TIER_ROWS)


@register(
    "sql_values_inline_dim",
    oracle=f"""
WITH dim(o_orderpriority, tier) AS (VALUES {_TIER_VALUES_SQL})
SELECT tier,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
FROM orders JOIN dim USING (o_orderpriority)
GROUP BY tier
ORDER BY tier
""",
    tags=("sql-surface", "join", "values"),
    description="inline VALUES dimension joined and aggregated",
)
def sql_values_inline_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A literal VALUES relation as a join dimension — the idiomatic
    way to ship a tiny mapping table inside the query text instead of
    a side file. Catalyst folds the 5-row local relation and
    broadcasts it; the fact side never shuffles for the join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        WITH dim AS (
          SELECT * FROM VALUES {_TIER_VALUES_SQL}
            AS t(o_orderpriority, tier)
        )
        SELECT tier,
               COUNT(*) AS n_orders,
               SUM({_CENTS}) AS revenue_cents
        FROM orders JOIN dim USING (o_orderpriority)
        GROUP BY tier
        ORDER BY tier
        """
    )


# ---------------------------------------------------------------------------
# Feature engineering: leave-one-out target encoding
# ---------------------------------------------------------------------------


@register(
    "feature_target_encoding_loo",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey, CAST(SUM({_CENTS}) AS BIGINT) AS spend_cents
  FROM orders GROUP BY o_custkey
),
cust AS (
  SELECT c.c_custkey, c.c_mktsegment,
         COALESCE(s.spend_cents, 0) AS spend_cents
  FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
),
enc AS (
  SELECT c_custkey, c_mktsegment, spend_cents,
         CAST(SUM(spend_cents) OVER (PARTITION BY c_mktsegment) AS BIGINT)
           AS seg_sum,
         CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS seg_n
  FROM cust
)
SELECT c_custkey, c_mktsegment, spend_cents,
       ROUND(CAST(seg_sum - spend_cents AS DOUBLE) / (seg_n - 1), 4)
         AS loo_avg_spend_cents
FROM enc
WHERE c_custkey < 200
ORDER BY c_custkey
""",
    tags=("ext", "feature-engineering", "target-encoding", "window"),
    description="leave-one-out target encoding of segment by spend",
)
def feature_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each customer's segment encoded
    as the mean spend of the OTHER customers in the segment —
    (seg_sum − own) / (seg_n − 1) — the leakage-free categorical
    encoding used ahead of model fitting. One shuffle to aggregate
    spend per customer, one window shuffle on the (low-cardinality
    but balanced) segment key; both sums are exact BIGINT cents so
    the final single double division is bitwise reproducible. At
    scale the window over a 5-value key is the skew risk — the
    rewrite is a 5-row groupBy aggregate broadcast back, which is
    exactly what AQE's skew handling degenerates to; kept as a
    window here to exercise the operator."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.groupBy(F.col("o_custkey"))
        .agg(F.sum(_o_cents()).alias("spend_cents"))
    )
    base = (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("spend_cents"), F.lit(0)).alias("spend_cents"),
        )
    )
    w = Window.partitionBy("c_mktsegment")
    return (
        base.withColumn("seg_sum", F.sum("spend_cents").over(w))
        .withColumn("seg_n", F.count(F.lit(1)).over(w))
        .select(
            "c_custkey",
            "c_mktsegment",
            "spend_cents",
            F.round(
                (F.col("seg_sum") - F.col("spend_cents")).cast("double")
                / (F.col("seg_n") - 1),
                4,
            ).alias("loo_avg_spend_cents"),
        )
        .filter(F.col("c_custkey") < 200)
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Feature engineering: deterministic k-fold assignment
# ---------------------------------------------------------------------------

_FOLD = "((c_custkey * 1103515245 + 12345) % 2147483648) % 5"


@register(
    "feature_kfold_assignment",
    oracle=f"""
SELECT CAST({_FOLD} AS INTEGER) AS fold, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM({_ACCT_CENTS}) AS DOUBLE) / COUNT(*), 4)
         AS avg_acctbal_cents
FROM customer
GROUP BY fold, c_mktsegment
ORDER BY fold, c_mktsegment
""",
    tags=("ext", "feature-engineering", "kfold", "sampling"),
    description="deterministic 5-fold CV assignment via LCG hash",
)
def feature_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment: fold =
    LCG(custkey) mod 5 — reproducible across engines and runs with
    no stored fold table, embarrassingly parallel (pure projection,
    the only shuffle is the small fold×segment aggregate). The
    per-cell segment balance check is the point of the query: a
    hash-based folder must show no segment×fold interaction."""
    cust = load_table(spark, sf_dir, "customer")
    fold = (
        ((F.col("c_custkey") * 1103515245 + 12345) % 2147483648) % 5
    ).cast("int")
    return (
        cust.select(
            fold.alias("fold"),
            "c_mktsegment",
            _c_cents().alias("cents"),
        )
        .groupBy("fold", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum("cents").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_acctbal_cents"),
        )
        .orderBy("fold", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Feature engineering: one-hot + inverse-frequency class weights
# ---------------------------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register(
    "feature_onehot_class_weights",
    oracle="""
WITH seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_seg FROM customer
  GROUP BY c_mktsegment
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM customer)
SELECT c.c_custkey, c.c_mktsegment,
"""
    + ",\n".join(
        f"  CASE WHEN c.c_mktsegment = '{s}' THEN 1 ELSE 0 END"
        f" AS is_{s.lower()}"
        for s in _SEGMENTS
    )
    + """,
  ROUND(CAST(t.n_total AS DOUBLE) / (5 * s.n_seg), 6) AS class_weight
FROM customer c
JOIN seg s ON s.c_mktsegment = c.c_mktsegment
CROSS JOIN tot t
WHERE c.c_custkey < 100
ORDER BY c.c_custkey
""",
    tags=("ext", "feature-engineering", "onehot", "class-weights"),
    description="one-hot segment encoding + inverse-frequency weights",
)
def feature_onehot_class_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-hot encoding of the categorical segment column plus
    balanced inverse-frequency class weights (n_total / (k·n_class) —
    the sklearn 'balanced' formula). The class histogram is a 5-row
    aggregate broadcast back onto the row stream; the indicators are
    pure projections, so the feature pass adds no wide shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    seg = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_seg")
    )
    tot = cust.agg(F.count(F.lit(1)).alias("n_total"))
    out = (
        cust.join(F.broadcast(seg), "c_mktsegment")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c_custkey") < 100)
        .select(
            "c_custkey",
            "c_mktsegment",
            *[
                F.when(F.col("c_mktsegment") == s, 1)
                .otherwise(0)
                .alias(f"is_{s.lower()}")
                for s in _SEGMENTS
            ],
            F.round(
                F.col("n_total").cast("double") / (5 * F.col("n_seg")), 6
            ).alias("class_weight"),
        )
    )
    return out.orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Feature engineering: scaling battery (z-score / min-max / robust)
# ---------------------------------------------------------------------------


@register(
    "feature_scaling_battery",
    oracle=f"""
WITH c AS (
  SELECT c_custkey, c_mktsegment, {_ACCT_CENTS} AS cents FROM customer
),
stats AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(cents * cents) AS BIGINT) AS ss,
         CAST(MIN(cents) AS BIGINT) AS mn,
         CAST(MAX(cents) AS BIGINT) AS mx,
         quantile_cont(cents, 0.25) AS p25,
         quantile_cont(cents, 0.50) AS p50,
         quantile_cont(cents, 0.75) AS p75
  FROM c GROUP BY c_mktsegment
)
SELECT c.c_custkey, c.c_mktsegment, c.cents,
  ROUND((c.cents - CAST(s.s AS DOUBLE) / s.n)
        / sqrt((s.ss - CAST(s.s AS DOUBLE) * s.s / s.n) / (s.n - 1)), 6)
    AS zscore,
  ROUND(CAST(c.cents - s.mn AS DOUBLE) / (s.mx - s.mn), 6) AS minmax,
  ROUND((c.cents - s.p50) / (s.p75 - s.p25), 6) AS robust
FROM c JOIN stats s USING (c_mktsegment)
WHERE c.c_custkey < 200
ORDER BY c.c_custkey
""",
    tags=("ext", "feature-engineering", "scaling"),
    description="z-score / min-max / robust scaling per segment",
)
def feature_scaling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature scaling three ways: z-score (sample std from
    exact integer moments), min-max, and robust (median/IQR). The
    group stats are one 5-row aggregate broadcast back — the classic
    two-pass scaler, no per-row state. Every scaled value is a fixed
    double expression over exact BIGINT moments and exactly
    interpolated quantiles, so both engines produce bitwise-equal
    doubles before the display rounding."""
    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey", "c_mktsegment", _c_cents().alias("cents")
    )
    stats = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.expr("percentile(cents, 0.25)").alias("p25"),
        F.expr("percentile(cents, 0.50)").alias("p50"),
        F.expr("percentile(cents, 0.75)").alias("p75"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    return (
        c.join(F.broadcast(stats), "c_mktsegment")
        .filter(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            "c_mktsegment",
            "cents",
            F.round((F.col("cents") - mean) / F.sqrt(var), 6).alias("zscore"),
            F.round(
                (F.col("cents") - F.col("mn")).cast("double")
                / (F.col("mx") - F.col("mn")),
                6,
            ).alias("minmax"),
            F.round(
                (F.col("cents") - F.col("p50"))
                / (F.col("p75") - F.col("p25")),
                6,
            ).alias("robust"),
        )
        .orderBy("c_custkey")
    )
