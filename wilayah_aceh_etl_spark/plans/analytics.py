"""Relational analytics over the star schema.

These exercise the operator categories the reference engine either
implements (filter/project/agg/sort/limit — SURVEY §2.2-§2.6) or
explicitly lacks and Spark provides natively (joins, windows, set
ops, rollup — SURVEY §2.11). Each is written declaratively so
Catalyst plans broadcast joins for the dims, pushes filters into the
parquet scans, and keeps the whole pipeline in WholeStageCodegen.

Scale notes (100 TB contract):
  * dims (region/nation/customer/supplier/part) are broadcast —
    only fact tables (lineitem/orders) ever shuffle;
  * aggregations are hash-aggregates with map-side partials;
  * top-k = orderBy+limit → TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.plans.registry import register
from wilayah_aceh_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# A. Aggregation pipeline (reference A1-A3; TPC-H Q1 shape)
# --------------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                            AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                       AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                       AS sum_charge,
  ROUND(ROUND(SUM(l_quantity), 2) / COUNT(l_quantity), 4)           AS avg_qty,
  ROUND(ROUND(SUM(l_extendedprice), 2) / COUNT(l_extendedprice), 4) AS avg_price,
  ROUND(ROUND(SUM(l_discount), 2) / COUNT(l_discount), 4)           AS avg_disc,
  COUNT(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "agg_pricing_summary",
    oracle=_PRICING_ORACLE,
    tags=("agg", "filter", "sort"),
    description="TPC-H Q1-shape pricing summary: filter+groupBy+8 aggregates",
    bench=True,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → hash-aggregate → sort. Predicate pushes to parquet;
    partial aggregation happens map-side before the single shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            # two-step stable avg (see events_queries): deterministic
            # across engine summation orders
            F.round(F.round(F.sum("l_quantity"), 2) / F.count("l_quantity"), 4)
            .alias("avg_qty"),
            F.round(
                F.round(F.sum("l_extendedprice"), 2) / F.count("l_extendedprice"),
                4,
            ).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count("l_discount"), 4)
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# B. Multi-way star join (absent in reference — SURVEY §2.11; TPC-H Q5 shape)
# --------------------------------------------------------------------------

_REVENUE_BY_NATION_ORACLE = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  COUNT(*)                                          AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '2000-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register(
    "join_revenue_by_nation",
    oracle=_REVENUE_BY_NATION_ORACLE,
    tags=("join", "agg", "broadcast"),
    description="5-table star join, dims broadcast, fact-side filter pushdown",
    bench=True,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem⋈orders shuffles on orderkey; customer/
    nation/region are broadcast so no other shuffle exists."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# C. Top-k with joins (reference O1+O2 sort+limit → TakeOrderedAndProject)
# --------------------------------------------------------------------------

_TOP_CUSTOMERS_ORACLE = """
SELECT
  c_custkey,
  c_name,
  ROUND(SUM(o_totalprice), 2) AS total_spent,
  COUNT(*)                    AS n_orders
FROM customer
JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
"""


@register(
    "topk_customers_by_spend",
    oracle=_TOP_CUSTOMERS_ORACLE,
    tags=("join", "agg", "topk"),
    description="join+agg+orderBy+limit → TakeOrderedAndProject top-k",
)
def topk_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by lifetime spend. The limit folds into the
    sort: Spark plans TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), "c_custkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# D. Window functions (absent in reference — SURVEY §2.11)
# --------------------------------------------------------------------------

_TOP_ORDERS_PER_SEGMENT_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rk
FROM (
  SELECT
    c_mktsegment,
    o_orderkey,
    o_totalprice,
    ROW_NUMBER() OVER (
      PARTITION BY c_mktsegment
      ORDER BY o_totalprice DESC, o_orderkey
    ) AS rk
  FROM orders
  JOIN customer ON o_custkey = c_custkey
) t
WHERE rk <= 3
ORDER BY c_mktsegment, rk
"""


@register(
    "window_top_orders_per_segment",
    oracle=_TOP_ORDERS_PER_SEGMENT_ORACLE,
    tags=("window", "join"),
    description="row_number() window: top-3 orders per market segment",
)
def window_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window; one shuffle on the
    partition key, rank computed streaming within partitions."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("c_mktsegment", "rk")
    )


_RUNNING_TOTAL_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ), 2) AS running_spend
FROM orders
WHERE o_custkey < 50
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register(
    "window_running_customer_spend",
    oracle=_RUNNING_TOTAL_ORACLE,
    tags=("window",),
    description="cumulative-sum window frame per customer",
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------------
# E. Rollup / conditional aggregation (reference A3 pivot; SURVEY §2.11)
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
  COALESCE(o_orderpriority, 'ALL') AS orderpriority,
  COUNT(*)                         AS n_orders,
  ROUND(SUM(o_totalprice), 2)      AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
"""


@register(
    "rollup_status_priority",
    oracle=_ROLLUP_ORACLE,
    tags=("agg", "rollup"),
    description="ROLLUP over (status, priority) with subtotal rows",
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; null grouping keys coalesced to 'ALL'
    on both sides so hashing is stable."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total_price",
        )
        .orderBy("orderstatus", "orderpriority")
    )


_PIVOT_ORACLE = """
SELECT
  c_mktsegment,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register(
    "pivot_orderstatus_by_segment",
    oracle=_PIVOT_ORACLE,
    tags=("agg", "pivot"),
    description="conditional aggregation pivot (reference A3 count-fold shape)",
)
def pivot_orderstatus_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference folds per-level counts into one struct
    (server.js:261-268); here the same conditional-agg pivot,
    computed in one pass with FILTERed counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def cnt(status: str):
        return F.count(F.when(F.col("o_orderstatus") == status, 1))

    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            cnt("O").alias("n_open"),
            cnt("F").alias("n_finished"),
            cnt("P").alias("n_pending"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# F. Semi/anti joins, set ops, distinct (absent in reference — SURVEY §2.11)
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT COUNT(*) AS n_customers_with_big_order
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 50000
)
"""


@register(
    "semijoin_customers_with_big_orders",
    oracle=_SEMI_ORACLE,
    tags=("join", "semi"),
    description="left-semi join (EXISTS) + scalar count",
)
def semijoin_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join; count of matching build side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_customers_with_big_order"))
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 70000
)
ORDER BY c_custkey
"""


@register(
    "antijoin_customers_without_big_orders",
    oracle=_ANTI_ORACLE,
    tags=("join", "anti"),
    description="left-anti join (NOT EXISTS)",
)
def antijoin_customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 70000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_SETOPS_ORACLE = """
WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT 'both' AS side, nationkey
FROM (SELECT nationkey FROM cust_nations INTERSECT SELECT nationkey FROM supp_nations)
UNION ALL
SELECT 'customer_only' AS side, nationkey
FROM (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
ORDER BY side, nationkey
"""


@register(
    "setops_nation_coverage",
    oracle=_SETOPS_ORACLE,
    tags=("setop", "distinct"),
    description="INTERSECT / EXCEPT / UNION ALL over distinct key sets",
)
def setops_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra over the nation keysets of customers vs suppliers."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust.intersect(supp).select(F.lit("both").alias("side"), "nationkey")
    cust_only = cust.exceptAll(supp).select(
        F.lit("customer_only").alias("side"), "nationkey"
    )
    return both.unionAll(cust_only).orderBy("side", "nationkey")


_DISTINCT_ORACLE = """
SELECT
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
"""


@register(
    "distinct_lineitem_keys",
    oracle=_DISTINCT_ORACLE,
    tags=("distinct", "agg"),
    description="multi-column COUNT DISTINCT in one pass",
)
def distinct_lineitem_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (Spark plans expand+partial aggregate)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "approx_distinct_lineitem_keys",
    oracle=None,  # approximate — no SQL oracle; driver rows-only check
    tags=("distinct", "approx"),
    description="approx_count_distinct (HLL++) — the 100 TB-scale path",
)
def approx_distinct_lineitem_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch counts: at 100 TB this replaces exact
    distinct (no expand, constant memory). Verified rows-only."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("n_parts_approx"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("n_suppliers_approx"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("n_orders_approx"),
    )


# --------------------------------------------------------------------------
# G. Existence probe + scalar subquery (reference F5)
# --------------------------------------------------------------------------

_EXISTS_ORACLE = """
SELECT
  CAST(EXISTS (SELECT 1 FROM orders WHERE o_totalprice > 90000) AS BOOLEAN)
    AS has_jumbo_order,
  CAST(EXISTS (SELECT 1 FROM orders WHERE o_totalprice < 0) AS BOOLEAN)
    AS has_negative_order
"""


@register(
    "exists_probe_orders",
    oracle=_EXISTS_ORACLE,
    tags=("filter", "exists"),
    description="existence probes (reference F5 SELECT 1 ... LIMIT 1 shape)",
)
def exists_probe_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limit(1)-style existence folded into one row of booleans.
    Mirrors reference server.js:125-126 / Supabase head-count probes."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        (F.count(F.when(F.col("o_totalprice") > 90000, 1)) > 0).alias(
            "has_jumbo_order"
        ),
        (F.count(F.when(F.col("o_totalprice") < 0, 1)) > 0).alias(
            "has_negative_order"
        ),
    )


# --------------------------------------------------------------------------
# H. Correlated-style scalar aggregates via join (having / subquery shapes)
# --------------------------------------------------------------------------

_HAVING_ORACLE = """
SELECT p_brand, COUNT(*) AS n_parts,
       ROUND(ROUND(SUM(p_retailprice), 2) / COUNT(p_retailprice), 4) AS avg_price
FROM part
GROUP BY p_brand
HAVING COUNT(*) > 70
ORDER BY n_parts DESC, p_brand
"""


@register(
    "having_brand_counts",
    oracle=_HAVING_ORACLE,
    tags=("agg", "having"),
    description="GROUP BY + HAVING post-aggregate filter",
)
def having_brand_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.round(F.sum("p_retailprice"), 2) / F.count("p_retailprice"), 4
            ).alias("avg_price"),
        )
        .filter(F.col("n_parts") > 70)
        .orderBy(F.col("n_parts").desc(), "p_brand")
    )


_SUBQ_ORACLE = """
SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM supplier)
ORDER BY s_suppkey
"""


@register(
    "scalar_subquery_above_avg_suppliers",
    oracle=_SUBQ_ORACLE,
    tags=("subquery", "filter"),
    description="scalar subquery in predicate (above-average filter)",
)
def scalar_subquery_above_avg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — expressed via spark.sql so
    Catalyst plans the subquery reuse."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
        FROM supplier
        WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM supplier)
        ORDER BY s_suppkey
        """
    )


_CUBE_ORACLE = """
SELECT
  COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
  COALESCE(c_mktsegment, 'ALL')    AS mktsegment,
  COUNT(*)                         AS n_orders,
  ROUND(SUM(o_totalprice), 2)      AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (o_orderstatus, c_mktsegment)
ORDER BY orderstatus, mktsegment
"""


@register(
    "cube_status_segment",
    oracle=_CUBE_ORACLE,
    tags=("agg", "cube", "join"),
    description="CUBE over (status, segment): all 4 grouping combos",
)
def cube_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE = every grouping-set combination; Catalyst expands it to
    one Expand node feeding a single hash aggregate — one shuffle,
    not 4 separate group-bys."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .cube("o_orderstatus", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("mktsegment"),
            "n_orders",
            "total_price",
        )
        .orderBy("orderstatus", "mktsegment")
    )


_GROUPING_SETS_ORACLE = """
SELECT
  COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
  COALESCE(o_orderpriority, 'ALL') AS orderpriority,
  COUNT(*)                         AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY orderstatus, orderpriority
"""


@register(
    "grouping_sets_status_or_priority",
    oracle=_GROUPING_SETS_ORACLE,
    tags=("agg", "grouping-sets", "sql"),
    description="explicit GROUPING SETS via the SQL surface",
)
def grouping_sets_status_or_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets — the SQL front-end form (DataFrame
    API only exposes rollup/cube); same single-Expand plan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
          COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
          COALESCE(o_orderpriority, 'ALL') AS orderpriority,
          COUNT(*)                         AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY orderstatus, orderpriority
        """
    )


_MONTHLY_ORACLE = """
SELECT date_trunc('month', o_orderdate) AS order_month,
       COUNT(*)                    AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""


@register(
    "monthly_order_revenue",
    oracle=_MONTHLY_ORACLE,
    tags=("agg", "date", "filter"),
    description="date_trunc monthly revenue with pushed date filter",
)
def monthly_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing + a range predicate that must reach the
    parquet scan as a pushed filter (check PushedFilters in explain)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("order_month")
    )


_PERCENTILE_ORACLE = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "percentiles_price_by_status",
    oracle=_PERCENTILE_ORACLE,
    tags=("agg", "percentile"),
    description="exact interpolated quartiles per order status",
)
def percentiles_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Spark `percentile` ≡ DuckDB quantile_cont,
    both linear-interpolated). At 100 TB swap to approx_percentile —
    the exact form needs per-group sorted values; the approx sketch
    merges map-side."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.25)"), 2).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.50)"), 2).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.75)"), 2).alias("p75"),
        )
        .orderBy("o_orderstatus")
    )


_SALTED_JOIN_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT)    AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "skew_salted_join_revenue",
    oracle=_SALTED_JOIN_ORACLE,
    tags=("join", "skew", "salted"),
    description="fact-dim join via explicit salting (skew-safe path)",
)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit skew remedy (operators/skew.py::salted_join):
    lineitem salted per-row, orders replicated 8×, shuffle keys
    (orderkey, salt). Result-identical to the plain join — the
    oracle states the plain form."""
    from wilayah_aceh_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = salted_join(li, o, on="l_orderkey", n_salts=8)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


_SKEW_DISTINCT_ORACLE = """
SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


@register(
    "skew_safe_distinct_parts_per_supplier",
    oracle=_SKEW_DISTINCT_ORACLE,
    tags=("agg", "distinct", "skew"),
    description="two-phase exact distinct (hot keys never concentrate)",
)
def skew_safe_distinct_parts_per_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-supplier distinct part count via the two-shuffle form
    (operators/skew.py::count_distinct_skew_safe): the first shuffle
    partitions on (suppkey, partkey), so a hot supplier spreads."""
    from wilayah_aceh_etl_spark.operators.skew import count_distinct_skew_safe

    li = load_table(spark, sf_dir, "lineitem")
    return count_distinct_skew_safe(li, "l_suppkey", "l_partkey").orderBy(
        "l_suppkey"
    )


_CORRELATED_EXISTS_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
ORDER BY c_custkey
"""


@register(
    "correlated_exists_big_spenders",
    oracle=_CORRELATED_EXISTS_ORACLE,
    tags=("subquery", "exists", "sql"),
    description="correlated EXISTS subquery (SQL surface)",
)
def correlated_exists_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL front-end — Catalyst rewrites
    it to the same left-semi join the DataFrame form plans."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        ORDER BY c_custkey
        """
    )


_STRINGFUNC_ORACLE = """
SELECT c_custkey,
       upper(c_name)                                   AS name_upper,
       regexp_extract(c_name, '([0-9]+)$', 1)          AS name_num,
       CAST(length(c_name) AS INTEGER)                 AS name_len,
       replace(c_name, '#', '-')                       AS name_dashed,
       substr(c_mktsegment, 1, 3)                      AS seg3,
       CAST(contains(lower(c_mktsegment), 'a') AS BOOLEAN) AS seg_has_a
FROM customer
WHERE c_custkey < 200
ORDER BY c_custkey
"""


@register(
    "string_functions_battery",
    oracle=_STRINGFUNC_ORACLE,
    tags=("project", "string"),
    description="string-function battery: regexp, case, replace, substr",
)
def string_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string transforms, all JVM-side expressions (the
    reference's only string ops are lower/substring — SURVEY P6/P8;
    this is the broader surface Spark gives for free)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("name_num"),
            F.length("c_name").cast("int").alias("name_len"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias(
                "name_dashed"
            ),
            F.substring("c_mktsegment", 1, 3).alias("seg3"),
            F.lower(F.col("c_mktsegment")).contains("a").alias("seg_has_a"),
        )
        .orderBy("c_custkey")
    )


_LATERAL_ORACLE = """
SELECT doc_id, CAST(pos AS INTEGER) AS pos, tok
FROM (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         UNNEST(string_split(text, ' ')) AS tok
  FROM documents
) t
WHERE doc_id < 5
ORDER BY doc_id, pos
"""


@register(
    "lateral_posexplode_tokens",
    oracle=_LATERAL_ORACLE,
    tags=("project", "explode", "lateral"),
    description="posexplode token stream (generator / lateral view)",
)
def lateral_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator expression (LATERAL VIEW posexplode): 1→N row
    expansion with positional index — the shape every tokenization
    pipeline starts with."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 5)
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        )
        .orderBy("doc_id", "pos")
    )


_NULL_SEMANTICS_ORACLE = """
SELECT o_orderkey,
       CAST(o_comment_null IS NULL AS BOOLEAN)           AS is_null,
       COALESCE(o_comment_null, 'none')                  AS coalesced,
       CAST(o_totalprice IS NOT DISTINCT FROM o_price2 AS BOOLEAN)
                                                         AS null_safe_eq,
       NULLIF(o_orderstatus, 'O')                        AS status_or_null
FROM (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_orderpriority END AS o_comment_null,
         CASE WHEN o_orderkey % 2 = 0 THEN NULL
              ELSE o_totalprice END AS o_price2
  FROM orders WHERE o_orderkey < 300
) t
ORDER BY o_orderkey
"""


@register(
    "null_semantics_battery",
    oracle=_NULL_SEMANTICS_ORACLE,
    tags=("project", "null", "three-valued"),
    description="null semantics: IS NULL, coalesce, null-safe eq, nullif",
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: null-safe equality (<=> ≡
    IS NOT DISTINCT FROM), coalesce defaults (reference P12), nullif."""
    o = load_table(spark, sf_dir, "orders")
    t = o.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_comment_null"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("o_price2"),
    )
    return t.select(
        "o_orderkey",
        F.col("o_comment_null").isNull().alias("is_null"),
        F.coalesce("o_comment_null", F.lit("none")).alias("coalesced"),
        F.col("o_totalprice").eqNullSafe(F.col("o_price2")).alias("null_safe_eq"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    ).orderBy("o_orderkey")


_DATE_BATTERY_ORACLE = """
SELECT o_orderkey,
       o_orderdate,
       CAST(year(o_orderdate) AS INTEGER)                AS yr,
       CAST(quarter(o_orderdate) AS INTEGER)             AS qtr,
       CAST(dayofweek(o_orderdate) AS INTEGER)           AS dow,
       o_orderdate + INTERVAL 90 DAY                     AS due_date,
       CAST(date_diff('day', o_orderdate,
                      TIMESTAMP '2000-01-01') AS BIGINT) AS days_to_y2k,
       strftime(o_orderdate, '%Y-%m')                    AS ym
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@register(
    "date_functions_battery",
    oracle=_DATE_BATTERY_ORACLE,
    tags=("project", "date"),
    description="date arithmetic: parts, intervals, diffs, formatting",
)
def date_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar surface beyond the reference's NOW() (SURVEY P9):
    part extraction, interval add, day diffs, formatting. DuckDB
    dayofweek is 0=Sunday; Spark dayofweek is 1=Sunday — aligned by
    subtracting 1 Spark-side."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
                "due_date"
            ),
            F.datediff(
                F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")
            ).cast("long").alias("days_to_y2k"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


_WINDOW_FRAMES_ORACLE = """
SELECT o_custkey, o_orderkey, price,
       LAG(price) OVER w                                   AS prev_price,
       LEAD(price) OVER w                                  AS next_price,
       CAST(NTILE(4) OVER w AS INTEGER)                    AS quartile,
       ROUND(SUM(price) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)     AS trailing3_sum,
       CAST(RANK() OVER (
         PARTITION BY o_custkey ORDER BY price DESC,
         o_orderkey) AS INTEGER)                           AS price_rank
FROM (
  SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price
  FROM orders WHERE o_custkey < 20
) t
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


@register(
    "window_frames_battery",
    oracle=_WINDOW_FRAMES_ORACLE,
    tags=("window", "frames"),
    description="window frames: lag/lead, ntile, trailing-3 frame, rank",
)
def window_frames_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec surface: offset functions, tiles, an explicit ROWS
    frame, deterministic rank tiebreak — all one shuffle on the
    partition key, evaluated in a single Window physical op."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    t = o.filter(F.col("o_custkey") < 20).select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wf = w.rowsBetween(-2, Window.currentRow)
    wr = Window.partitionBy("o_custkey").orderBy(
        F.col("price").desc(), "o_orderkey"
    )
    return t.select(
        "o_custkey",
        "o_orderkey",
        "price",
        F.lag("price").over(w).alias("prev_price"),
        F.lead("price").over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.sum("price").over(wf), 2).alias("trailing3_sum"),
        F.rank().over(wr).cast("int").alias("price_rank"),
    ).orderBy("o_custkey", "o_orderkey")


# --------------------------------------------------------------------------
# K. Outer join with preserved null-groups (TPC-H Q13 shape)
# --------------------------------------------------------------------------

_CUSTDIST_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) cc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "outerjoin_order_count_distribution",
    oracle=_CUSTDIST_ORACLE,
    tags=("join", "outer", "agg"),
    description="TPC-H Q13 shape: left-outer join + two-level count distribution",
)
def outerjoin_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The outer-join surface (absent in the reference, SURVEY §2.11):
    customers LEFT OUTER JOIN orders with an extra join-side predicate,
    so order-less customers survive as c_count=0 groups, then the
    distribution of customers per order-count. COUNT(o_orderkey)
    ignores the nulls the outer join manufactures — the exact Q13
    subtlety. At scale the join shuffles on custkey and both
    aggregations are hash-aggs; the second groupBy has tiny
    cardinality (distinct counts), so its shuffle is negligible."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# L. Map-typed columns, IN-subquery with HAVING, approximate percentiles
# --------------------------------------------------------------------------

_MAP_BATTERY_ORACLE = """
WITH m AS (
  SELECT o_orderkey,
         MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS props
  FROM orders WHERE o_orderkey < 200
)
SELECT o_orderkey,
       array_to_string(list_sort(map_keys(props)), ',') AS keys_sorted,
       props['status'][1]                            AS status_val,
       CAST(cardinality(props) AS BIGINT)            AS n_entries,
       array_to_string(list_sort(list_transform(map_entries(props),
           e -> e.key || '=' || e.value)), ',')      AS entries_str
FROM m ORDER BY o_orderkey
"""


@register(
    "map_functions_battery",
    oracle=_MAP_BATTERY_ORACLE,
    tags=("map", "project", "types"),
    description="map-typed column battery: build, keys, lookup, entries",
)
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (the engine's key-value column type — absent in
    the reference, whose only KV shape is the JSONB boundary, SURVEY
    §1.2): construct a map from columns, sorted key list, point
    lookup, cardinality, and an entries→sorted-string fold so the
    cross-engine hash is order-stable. All map functions evaluate
    inside codegen; no shuffle beyond the final sort. Every output
    column is scalar (arrays joined to strings) because the gate's
    canonicalizer sorts rows with pandas, which cannot hash lists."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    m = F.create_map(
        F.lit("status"),
        F.col("o_orderstatus"),
        F.lit("priority"),
        F.col("o_orderpriority"),
    )
    entries_str = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(m),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            )
        ),
        ",",
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "status").alias("status_val"),
        F.size(m).cast("long").alias("n_entries"),
        entries_str.alias("entries_str"),
    ).orderBy("o_orderkey")


_IN_SUBQUERY_ORACLE = """
SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS total_price
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 200
)
ORDER BY o_orderkey
"""


@register(
    "in_subquery_large_volume_orders",
    oracle=_IN_SUBQUERY_ORACLE,
    tags=("subquery", "in", "having", "sql"),
    description="TPC-H Q18 shape: IN over a grouped-HAVING subquery",
)
def in_subquery_large_volume_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Uncorrelated IN-subquery over an aggregated-HAVING inner query
    (TPC-H Q18's discriminator), through the SQL front-end: Catalyst
    rewrites the IN into a left-semi join against the aggregate, so
    the physical plan is the same shuffle-once hash-agg + semi join
    the DataFrame form would produce."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus,
               ROUND(o_totalprice, 2) AS total_price
        FROM orders
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 200
        )
        ORDER BY o_orderkey
        """
    )


@register(
    "approx_percentile_prices",
    oracle=None,  # approximate sketch — driver rows-only check
    tags=("percentile", "approx"),
    description="approx_percentile (GK sketch) — the 100 TB quantile path",
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per order status: the
    at-scale complement to percentiles_price_by_status (exact
    interpolation needs a sort; the sketch is one pass, mergeable
    map-side, constant memory). Verified rows-only. The quartile
    array is split into scalar columns because the gate's
    canonicalizer cannot hash list-typed cells."""
    o = load_table(spark, sf_dir, "orders")
    q = F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 10000)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            q.alias("_q"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            F.round(F.element_at("_q", 1), 2).alias("p25_approx"),
            F.round(F.element_at("_q", 2), 2).alias("p50_approx"),
            F.round(F.element_at("_q", 3), 2).alias("p75_approx"),
            "n_orders",
        )
        .orderBy("o_orderstatus")
    )


_FULL_OUTER_ORACLE = """
WITH c AS (
  SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers,
       CASE WHEN c.nationkey IS NULL THEN 'supplier_only'
            WHEN s.nationkey IS NULL THEN 'customer_only'
            ELSE 'both' END AS presence
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
ORDER BY nationkey
"""


@register(
    "fullouter_nation_reconciliation",
    oracle=_FULL_OUTER_ORACLE,
    tags=("join", "outer", "setops"),
    description="full-outer reconciliation: per-nation customer vs supplier",
)
def fullouter_nation_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full-outer join surface: per-nation customer and supplier
    counts reconciled, keys present on either side preserved and
    classified. Both inputs pre-aggregate to nation cardinality
    before the join, so the full-outer itself moves only ~|nations|
    rows regardless of fact size."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = c.alias("c").join(
        s.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full"
    )
    return joined.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias(
            "nationkey"
        ),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.when(F.col("c.nationkey").isNull(), F.lit("supplier_only"))
        .when(F.col("s.nationkey").isNull(), F.lit("customer_only"))
        .otherwise(F.lit("both"))
        .alias("presence"),
    ).orderBy("nationkey")


_RANK_BATTERY_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(dense_rank() OVER w AS INTEGER)    AS price_dense_rank,
       ROUND(percent_rank() OVER w, 6)         AS price_percent_rank,
       ROUND(cume_dist() OVER w, 6)            AS price_cume_dist
FROM orders
WHERE o_custkey < 20
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
)
ORDER BY o_custkey, o_orderkey
"""


@register(
    "window_rank_battery",
    oracle=_RANK_BATTERY_ORACLE,
    tags=("window", "rank"),
    description="ranking windows: dense_rank, percent_rank, cume_dist",
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function surface the frames battery doesn't cover:
    dense_rank, percent_rank ((rank-1)/(n-1) — exact integer division
    in f64, identical cross-engine), cume_dist. One shuffle on the
    partition key, one Window op."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).cast("int").alias("price_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("price_percent_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    ).orderBy("o_custkey", "o_orderkey")


_SETOPS_ALL_ORACLE = """
WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000),
ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
FROM ea
UNION ALL
SELECT 'intersect_all', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT k) AS BIGINT)
FROM ia
ORDER BY op
"""


@register(
    "setops_multiset_variants",
    oracle=_SETOPS_ALL_ORACLE,
    tags=("setops", "multiset"),
    description="EXCEPT ALL / INTERSECT ALL multiset semantics",
)
def setops_multiset_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops (the ALL variants setops_nation_coverage's
    distinct forms don't cover): duplicate cardinalities are
    preserved, so profiles of the two results (row vs key counts)
    differ from the distinct forms exactly by the multiplicity math.
    Spark plans both as hash aggregations over counted duplicates —
    one shuffle each, no sort."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    b = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("k")
    )

    def profile(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_keys"),
        ).select("op", "n_rows", "n_keys")

    return (
        profile(a.exceptAll(b), "except_all")
        .unionAll(profile(a.intersectAll(b), "intersect_all"))
        .orderBy("op")
    )


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS total_price,
         ROUND(MAX(o_totalprice), 2) AS max_price
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, metric, value
FROM (UNPIVOT wide ON n_orders, total_price, max_price
      INTO NAME metric VALUE value)
ORDER BY o_orderstatus, metric
"""


@register(
    "unpivot_status_metrics",
    oracle=_UNPIVOT_ORACLE,
    tags=("unpivot", "melt", "agg"),
    description="UNPIVOT/melt: wide per-status metrics to long form",
)
def unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of the pivot surface: a wide per-status aggregate
    melted to (key, metric, value) long form with df.unpivot — an
    Expand over the value columns, one extra narrow projection, no
    shuffle beyond the aggregate's."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["n_orders", "total_price", "max_price"],
        "metric",
        "value",
    ).orderBy("o_orderstatus", "metric")


_EXPLODE_OUTER_ORACLE = """
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN []::BIGINT[]
              ELSE [c_custkey, c_custkey * 2] END AS arr
  FROM customer WHERE c_custkey < 200
)
SELECT c_custkey, u.x AS item
FROM c LEFT JOIN LATERAL (SELECT UNNEST(arr) AS x) u ON TRUE
ORDER BY c_custkey, item
"""


@register(
    "explode_outer_null_preserving",
    oracle=_EXPLODE_OUTER_ORACLE,
    tags=("generator", "explode", "outer"),
    description="explode_outer: empty arrays survive as null rows",
)
def explode_outer_null_preserving(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The null-preserving generator variant
    (lateral_posexplode_tokens covers the inner form): rows with
    empty arrays survive as a single null item — the semantics an
    outer lateral view / LEFT JOIN UNNEST has. Generators run inside
    codegen; no shuffle before the final sort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    arr = F.when(
        F.col("c_custkey") % 5 == 0,
        F.array().cast("array<long>"),
    ).otherwise(F.array(F.col("c_custkey"), F.col("c_custkey") * 2))
    return (
        c.select("c_custkey", arr.alias("arr"))
        .select("c_custkey", F.explode_outer("arr").alias("item"))
        .orderBy("c_custkey", "item")
    )


_PROFILE_ORACLE = """
WITH m AS (SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)    AS k_nulls,
  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)                    AS k_distinct,
  CAST(MIN(o_orderkey) AS DOUBLE)                               AS k_min,
  CAST(MAX(o_orderkey) AS DOUBLE)                               AS k_max,
  CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT)  AS p_nulls,
  CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)                  AS p_distinct,
  ROUND(MIN(o_totalprice), 2)                                   AS p_min,
  ROUND(MAX(o_totalprice), 2)                                   AS p_max,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT) AS s_nulls,
  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)                 AS s_distinct,
  MIN(o_orderstatus)                                            AS s_min,
  MAX(o_orderstatus)                                            AS s_max,
  CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT)   AS d_nulls,
  CAST(COUNT(DISTINCT o_orderdate) AS BIGINT)                   AS d_distinct,
  strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S')               AS d_min,
  strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')               AS d_max
FROM orders)
SELECT 'o_orderkey' AS col_name, n_rows, k_nulls AS n_nulls,
       k_distinct AS n_distinct, k_min AS min_num, k_max AS max_num,
       NULL AS min_str, NULL AS max_str FROM m
UNION ALL
SELECT 'o_totalprice', n_rows, p_nulls, p_distinct, p_min, p_max,
       NULL, NULL FROM m
UNION ALL
SELECT 'o_orderstatus', n_rows, s_nulls, s_distinct, NULL, NULL,
       s_min, s_max FROM m
UNION ALL
SELECT 'o_orderdate', n_rows, d_nulls, d_distinct, NULL, NULL,
       d_min, d_max FROM m
ORDER BY col_name
"""


@register(
    "profile_orders_columns",
    oracle=_PROFILE_ORACLE,
    tags=("profiling", "quality", "agg"),
    description="data-profiling pass: per-column nulls/distinct/min/max",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling — the first job any lake pipeline runs
    on a new table: per-column null counts, distinct cardinality, and
    typed min/max (numeric, string, and second-truncated timestamp
    forms), all from ONE aggregate pass (no per-column scans), then
    exploded to long form driver-free. At 100 TB the exact
    COUNT(DISTINCT) switches to approx_count_distinct (the
    approx_distinct_lineitem_keys path); the rest is a single
    map-side-combined agg."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("k_nulls"),
        F.countDistinct("o_orderkey").alias("k_distinct"),
        F.min("o_orderkey").cast("double").alias("k_min"),
        F.max("o_orderkey").cast("double").alias("k_max"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("p_nulls"),
        F.countDistinct("o_totalprice").alias("p_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("p_min"),
        F.round(F.max("o_totalprice"), 2).alias("p_max"),
        F.sum(F.col("o_orderstatus").isNull().cast("long")).alias("s_nulls"),
        F.countDistinct("o_orderstatus").alias("s_distinct"),
        F.min("o_orderstatus").alias("s_min"),
        F.max("o_orderstatus").alias("s_max"),
        F.sum(F.col("o_orderdate").isNull().cast("long")).alias("d_nulls"),
        F.countDistinct("o_orderdate").alias("d_distinct"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "d_min"
        ),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "d_max"
        ),
    )
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    prof = F.array(
        F.struct(
            F.lit("o_orderkey").alias("col_name"),
            F.col("k_nulls").alias("n_nulls"),
            F.col("k_distinct").alias("n_distinct"),
            F.col("k_min").alias("min_num"),
            F.col("k_max").alias("max_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
        ),
        F.struct(
            F.lit("o_totalprice").alias("col_name"),
            F.col("p_nulls").alias("n_nulls"),
            F.col("p_distinct").alias("n_distinct"),
            F.col("p_min").alias("min_num"),
            F.col("p_max").alias("max_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
        ),
        F.struct(
            F.lit("o_orderstatus").alias("col_name"),
            F.col("s_nulls").alias("n_nulls"),
            F.col("s_distinct").alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            F.col("s_min").alias("min_str"),
            F.col("s_max").alias("max_str"),
        ),
        F.struct(
            F.lit("o_orderdate").alias("col_name"),
            F.col("d_nulls").alias("n_nulls"),
            F.col("d_distinct").alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            F.col("d_min").alias("min_str"),
            F.col("d_max").alias("max_str"),
        ),
    )
    return (
        row.select(F.explode(prof).alias("p"), F.col("n_rows"))
        .select("p.col_name", "n_rows", "p.n_nulls", "p.n_distinct",
                "p.min_num", "p.max_num", "p.min_str", "p.max_str")
        .orderBy("col_name")
    )


_NOT_IN_ORACLE = """
SELECT
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 300000)) AS BIGINT)
    AS n_without_big_order,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 300000
                                UNION ALL SELECT NULL)) AS BIGINT)
    AS n_with_null_in_set
"""


@register(
    "not_in_null_semantics",
    oracle=_NOT_IN_ORACLE,
    tags=("subquery", "not-in", "null", "sql"),
    description="NOT IN three-valued logic: a NULL in the set empties it",
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic NOT IN trap pinned cross-engine: with a NULL in
    the subquery set, `x NOT IN (...)` is never TRUE (three-valued
    logic), so the second count is 0 while the first is positive.
    Catalyst plans NOT IN as a null-aware anti join — broadcast-only
    by design, which is why the scale-path form of this predicate is
    NOT EXISTS (antijoin_customers_without_big_orders); this entry
    certifies the engine gets the tricky semantics right, not that
    NOT IN is the recommended shape."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_NOT_IN_ORACLE)


_HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT LEAST(CAST(floor(o_totalprice / 50000) AS INTEGER), 9) AS bin
  FROM orders
)
SELECT bin,
       CAST(bin * 50000 AS BIGINT) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY bin ORDER BY bin
"""


@register(
    "histogram_order_prices",
    oracle=_HISTOGRAM_ORACLE,
    tags=("histogram", "agg"),
    description="fixed-bound 10-bin price histogram (width_bucket shape)",
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram with fixed bounds (the width_bucket
    shape): binning is a per-row expression, so the whole thing is
    one hash-agg over 10 groups — no global min/max pass, no second
    scan. (A data-dependent-bounds variant would attach min/max as a
    broadcast 1-row aggregate, the data_mixture_rates pattern.)"""
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9)
    )
    return (
        o.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bin",
            (F.col("bin").cast("long") * 50000).alias("bin_lo"),
            "n_orders",
        )
        .orderBy("bin")
    )


_SEGMENT_TREND_ORACLE = """
SELECT
  c_mktsegment AS segment,
  COUNT(*) AS n_orders,
  ROUND(REGR_SLOPE(o_totalprice,
        DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate)), 4)
    AS price_slope,
  ROUND(REGR_INTERCEPT(o_totalprice,
        DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate)), 2)
    AS price_intercept
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY segment
"""


@register(
    "grouped_map_segment_trend",
    oracle=_SEGMENT_TREND_ORACLE,
    tags=("pandas-udf", "grouped-map", "join"),
    description="applyInPandas grouped-map: per-segment OLS price trend",
    bench=True,
)
def grouped_map_segment_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF surface (applyInPandas): each market
    segment's orders arrive as ONE Arrow batch group and a least-
    squares price-vs-time line is fit in numpy; the DuckDB oracle is
    REGR_SLOPE/REGR_INTERCEPT. Rows are sorted by o_orderkey inside
    the group so the float summation order is run-deterministic.

    Scale note: 5 segments over 100 TB would concentrate each segment
    on one task — for that regime use the Catalyst-native
    F.regr_slope/F.regr_intercept aggregates (partial-aggregated,
    no Python boundary); this entry certifies the grouped-map
    plumbing (schema contract, Arrow transfer, group iteration) on an
    operator whose result an oracle can check exactly.
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        "o_orderkey",
        "o_totalprice",
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp"))
        .cast("double")
        .alias("days"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_orderkey")
        x = pdf["days"].to_numpy(dtype="float64")
        y = pdf["o_totalprice"].to_numpy(dtype="float64")
        xm, ym = x.mean(), y.mean()
        var = float(((x - xm) ** 2).sum())
        if var == 0.0:
            # degenerate group (all orders on one date): REGR_SLOPE
            # and the native twin return NULL here — match, don't
            # ZeroDivisionError the task
            slope = intercept = None
        else:
            raw = float(((x - xm) * (y - ym)).sum()) / var
            slope = round(raw, 4)
            intercept = round(ym - raw * xm, 2)
        return pd.DataFrame(
            {
                "segment": [str(pdf["c_mktsegment"].iloc[0])],
                "n_orders": [len(pdf)],
                "price_slope": [slope],
                "price_intercept": [intercept],
            }
        )

    return (
        base.groupBy("c_mktsegment")
        .applyInPandas(
            fit,
            schema="segment string, n_orders long, "
            "price_slope double, price_intercept double",
        )
        .orderBy("segment")
    )


_SHUFFLE_HASH_ORACLE = """
SELECT
  c_mktsegment AS segment,
  COUNT(*) AS n_orders,
  ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY segment
"""


@register(
    "join_hint_shuffle_hash",
    oracle=_SHUFFLE_HASH_ORACLE,
    tags=("join", "hint", "agg"),
    description="SHUFFLE_HASH-hinted join: physical-strategy override",
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logical plan as the broadcast form, but the build side is
    pinned to a shuffled hash join via hint — the strategy for a dim
    too big to broadcast but small enough to hash per-partition
    (avoids SMJ's sort on both sides). Demonstrates per-query
    physical control without touching session conf; result-identical
    to the unhinted plan, which is exactly what the oracle checks.
    (tests/test_source_layout.py pins ShuffledHashJoin in the plan.)"""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("segment")
    )


_AGG_BATTERY_ORACLE = """
SELECT
  o_orderstatus,
  arg_min(o_totalprice, o_orderkey)  AS first_order_price,
  arg_max(o_totalprice, o_orderkey)  AS last_order_price,
  bool_and(o_totalprice > 0)         AS all_positive,
  bool_or(o_totalprice > 400000)     AS any_jumbo,
  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "agg_functions_battery",
    oracle=_AGG_BATTERY_ORACLE,
    tags=("agg", "battery"),
    description="min_by/max_by, bool_and/or, sorted collect_set battery",
)
def agg_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-arithmetic aggregate surface: argmin/argmax carry a
    payload column ordered by ANOTHER column (keyed on the unique
    orderkey so ties cannot make the answer engine-dependent),
    boolean reducers, and set-collection — sorted then joined to a
    string because collect_set order is unspecified by contract and
    the gate's canonicalizer cannot hash list-typed cells.
    All are partial-aggregable: one shuffle, map-side combine."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.min_by("o_totalprice", "o_orderkey").alias("first_order_price"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_order_price"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
        )
        .orderBy("o_orderstatus")
    )


_BASKET_ORACLE = """
SELECT
  a.l_partkey AS part_a,
  b.l_partkey AS part_b,
  CAST(COUNT(*) AS BIGINT) AS n_orders_together
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING COUNT(*) >= 3
ORDER BY n_orders_together DESC, part_a, part_b
"""


@register(
    "basket_part_pairs",
    oracle=_BASKET_ORACLE,
    tags=("join", "self-join", "co-occurrence"),
    description="market-basket co-occurrence: part pairs in >=3 shared orders",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining via self equi-join on the order key
    (the n-gram-statistics shape applied to baskets). The input is
    deduped to distinct (order, part) first, so the join input is
    minimal and the pair blow-up is bounded by lines-per-order², a
    per-basket constant — the intermediate scales linearly with
    orders, not quadratically with parts. One shuffle for the join
    (both sides hash on l_orderkey), one for the pair count."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = l.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = l.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= 3)
        .orderBy(F.col("n_orders_together").desc(), "part_a", "part_b")
    )


_ANSI_TRY_ORACLE = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN o_totalprice = 0
                THEN NULL ELSE 1 END) AS BIGINT) AS n_nonzero_prices,
  CAST(SUM(CASE WHEN TRY_CAST(o_orderstatus AS INTEGER) IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_noninteger_status,
  ROUND(SUM(CASE WHEN o_totalprice = 0 THEN NULL
                 ELSE CAST(ROUND(ROUND(100000.0 / o_totalprice, 6) * 1000000)
                      AS BIGINT) END) / 1000000.0, 4)
    AS sum_inverse_price
FROM orders
"""


@register(
    "ansi_try_functions",
    oracle=_ANSI_TRY_ORACLE,
    tags=("ansi", "try", "null-safety"),
    description="ANSI-mode safe arithmetic: try_divide/try_cast semantics",
)
def ansi_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs with spark.sql.ansi.enabled=true: a plain
    division by zero or bad cast now RAISES instead of silently
    returning null — the try_* family is the sanctioned escape hatch
    and this query pins its null-on-failure semantics cross-engine
    (DuckDB twins: CASE guards and TRY_CAST). Each per-row inverse is
    rounded into exact integer micro-units before summing, so the
    aggregate is order-independent (the integer-cents pattern)."""
    o = load_table(spark, sf_dir, "orders")
    inverse = F.round(
        F.round(F.try_divide(F.lit(100000.0), F.col("o_totalprice")), 6)
        * 1000000,
        0,
    ).cast("long")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_totalprice") == 0, None).otherwise(1)
        ).cast("long").alias("n_nonzero_prices"),
        F.sum(
            F.when(
                F.col("o_orderstatus").try_cast("int").isNull(), 1
            ).otherwise(0)
        ).cast("long").alias("n_noninteger_status"),
        F.round(
            F.sum(F.when(F.col("o_totalprice") == 0, None).otherwise(inverse))
            / 1000000.0,
            4,
        ).alias("sum_inverse_price"),
    )


@register(
    "segment_trend_native",
    oracle=_SEGMENT_TREND_ORACLE,
    tags=("agg", "regression", "join"),
    description="Catalyst-native REGR_SLOPE twin of the grouped-map trend",
)
def segment_trend_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented scale path of grouped_map_segment_trend: the
    same OLS fit via the built-in regr_slope/regr_intercept
    aggregates — partial-aggregated, mergeable, no Python boundary,
    no one-task-per-segment concentration. Both forms share ONE
    oracle, so the gate certifies pandas-fit == native-aggregate ==
    DuckDB to 4 decimals."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    days = F.datediff(
        "o_orderdate", F.lit("1995-01-01").cast("timestamp")
    ).cast("double")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("segment"), "o_totalprice", days.alias("days"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.regr_slope("o_totalprice", "days"), 4).alias("price_slope"),
            F.round(F.regr_intercept("o_totalprice", "days"), 2).alias(
                "price_intercept"
            ),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Spark 4 collations: case-insensitive grouping as a TYPE property
# ---------------------------------------------------------------------------

_COLLATION_ORACLE = """
WITH seeded AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END
           AS name
  FROM part
)
SELECT lower(name) AS name_ci,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT name) AS BIGINT) AS n_case_variants
FROM seeded
GROUP BY lower(name)
ORDER BY name_ci
"""


@register(
    "collation_ci_grouping",
    oracle=_COLLATION_ORACLE,
    tags=("string", "collation", "agg"),
    description="UTF8_LCASE collated grouping vs a lower() oracle twin",
)
def collation_ci_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: case-insensitivity declared as a property
    of the STRING TYPE (collate(..., 'UTF8_LCASE')) instead of
    normalize-at-every-use. The grouping, and any join or comparison
    on the collated column, is case-insensitive with no lower()
    wrapped around each reference — at 100 TB that means the
    original bytes are stored once and every operator (including
    shuffle hashing) respects the collation natively. Case variants
    are seeded deterministically from p_partkey; the oracle is the
    portable lower() twin, proving the two formulations agree. The
    output key is lower()-normalized because a collated GROUP BY's
    representative value is whichever variant a partition saw first
    — nondeterministic by design."""
    seeded = load_table(spark, sf_dir, "part").select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper(F.col("p_name"))
        )
        .otherwise(F.col("p_name"))
        .alias("name")
    )
    return (
        seeded.groupBy(
            F.collate(F.col("name"), "UTF8_LCASE").alias("name_key")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("name")).alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("name_key")).cast("string").alias("name_ci"),
            "n_rows",
            "n_case_variants",
        )
        .orderBy("name_ci")
    )


# ---------------------------------------------------------------------------
# Bivariate statistics from exact integer moments (order-independent)
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT)                                 AS n,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)   AS sx,
         CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                  * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                  * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                  * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy) / (1.0 * n * (n - 1)), 6)  AS covar_samp_qd,
       ROUND((n * sxy - sx * sy)
             / SQRT(1.0 * (n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS corr_qd,
       ROUND((n * sxy - sx * sy) / (1.0 * (n * sxx - sx * sx)), 6)
         AS slope_qd
FROM m ORDER BY l_returnflag
"""


@register(
    "stats_corr_battery",
    oracle=_CORR_ORACLE,
    tags=("agg", "statistics", "corr"),
    description="corr/covar/slope from exact integer moments per group",
)
def stats_corr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (Pearson r, sample covariance, OLS slope)
    of (quantity, discount) per return flag, computed from EXACT
    integer moment sums rather than the engines' corr()/covar_samp()
    (whose Welford merge order is unspecified, so last-bit results
    vary across engines and parallelism). Integer Σx, Σy, Σxy, Σx²,
    Σy² are order-independent and partial-aggregable — one shuffle,
    map-side combine, identical algebra on both engines. At 100 TB
    this is also the FASTER plan: five integer sums in one hash-agg
    pass, no second pass over the data."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_discount") * 100).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_num = n * sxy - sx * sy
    return m.select(
        "l_returnflag",
        "n",
        F.round(cov_num / (F.lit(1.0) * n * (n - 1)), 6).alias(
            "covar_samp_qd"
        ),
        F.round(
            cov_num
            / F.sqrt(
                F.lit(1.0) * (n * sxx - sx * sx) * (n * syy - sy * sy)
            ),
            6,
        ).alias("corr_qd"),
        F.round(cov_num / (F.lit(1.0) * (n * sxx - sx * sx)), 6).alias(
            "slope_qd"
        ),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Incremental aggregation: merge yesterday's partials with today's delta
# ---------------------------------------------------------------------------

_INCR_MERGE_ORACLE = """
SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS total_price
FROM orders
GROUP BY 1, 2
ORDER BY order_month, o_orderstatus
"""


@register(
    "incremental_rollup_merge",
    oracle=_INCR_MERGE_ORACLE,
    tags=("agg", "incremental", "mergeable", "materialized-view"),
    description="incremental MV maintenance: merge old partials + new delta",
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the monthly revenue
    rollup is NOT recomputed from scratch — rows before the cutoff
    are pre-aggregated to (count, cents) partials per group (in
    production these live in the MV), the post-cutoff delta is
    aggregated alone, and the two partial sets are merged by summing
    counts and integer-cent totals. Count and sum are commutative
    monoids, so merge(old, delta) ≡ full recompute — which is
    exactly what the oracle checks by recomputing over everything.
    At 100 TB the delta pass touches only new partitions: the whole
    point of the pattern. Integer cents keep the merge bit-exact."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            "o_orderstatus",
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("cents"),
        )

    old_partials = partials(o.filter(F.col("o_orderdate") < cutoff))
    delta_partials = partials(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        old_partials.unionByName(delta_partials)
        .groupBy("order_month", "o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
        .select(
            "order_month",
            "o_orderstatus",
            "n_orders",
            F.round(F.col("cents") / 100.0, 2).alias("total_price"),
        )
        .orderBy("order_month", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Distributed Bloom filter: build as a bitmap relation, probe by broadcast
# ---------------------------------------------------------------------------

_BLOOM_ORACLE = """
WITH big AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000),
probe AS (SELECT DISTINCT l_orderkey FROM lineitem)
SELECT
  CAST((SELECT COUNT(*) FROM probe) AS BIGINT) AS n_probe,
  CAST((SELECT COUNT(*) FROM probe WHERE l_orderkey IN
        (SELECT o_orderkey FROM big)) AS BIGINT) AS n_exact,
  TRUE AS superset_ok,
  TRUE AS pruning_effective
"""


@register(
    "bloom_filter_semi_prune",
    oracle=_BLOOM_ORACLE,
    tags=("bloom", "join", "pruning", "approx"),
    description="distributed Bloom build + broadcast probe, superset-checked",
)
def bloom_filter_semi_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join pruning, the pattern that turns a 100 TB
    shuffle semi-join into a broadcast bitmap probe: the build side's
    keys are double-hashed (xxhash64 with two seeds) into a 2^16-bit
    filter materialized as a 1024-row (word, bits) relation via
    bit_or partial aggregation — constant-size output no matter how
    many build keys. The probe side broadcast-joins that tiny
    relation twice (once per hash) and keeps rows with both bits
    set; only those candidates would reach the real join. The query
    proves the two contracts that make the filter USABLE: no false
    negatives (every exact match is a candidate — superset_ok) and
    real pruning (fewer candidates than probe rows). The oracle
    recomputes the exact semi-join and asserts both flags."""
    m_bits, m_words = 1 << 16, (1 << 16) // 64
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("k"))
    )
    probe = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k"))
        .distinct()
    )

    def hashed(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            F.pmod(F.xxhash64("k"), F.lit(m_bits)).alias("h1"),
            F.pmod(F.xxhash64("k", F.lit(1)), F.lit(m_bits)).alias("h2"),
        )

    words = (
        hashed(big)
        .select(F.explode(F.array("h1", "h2")).alias("h"))
        .groupBy((F.col("h") / 64).cast("int").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, CAST(h % 64 AS INT))")
            ).alias("bits")
        )
    )

    w1 = words.select(F.col("word").alias("w1"), F.col("bits").alias("b1"))
    w2 = words.select(F.col("word").alias("w2"), F.col("bits").alias("b2"))
    p = hashed(probe)
    candidates = (
        p.join(F.broadcast(w1), (p.h1 / 64).cast("int") == F.col("w1"), "left")
        .join(F.broadcast(w2), (p.h2 / 64).cast("int") == F.col("w2"), "left")
        .select(
            "k",
            (
                F.expr("b1 IS NOT NULL AND (b1 & shiftleft(1L, CAST(h1 % 64 AS INT))) != 0")
                & F.expr("b2 IS NOT NULL AND (b2 & shiftleft(1L, CAST(h2 % 64 AS INT))) != 0")
            ).alias("is_candidate"),
        )
    )
    exact = probe.join(big.distinct(), "k", "semi").select(
        F.col("k").alias("ek")
    )
    flags = candidates.join(
        exact, candidates.k == F.col("ek"), "left"
    ).agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.when(F.col("ek").isNotNull(), 1).otherwise(0)).alias(
            "n_exact"
        ),
        # no exact match may be missed by the filter
        F.sum(
            F.when(
                F.col("ek").isNotNull() & ~F.col("is_candidate"), 1
            ).otherwise(0)
        ).alias("n_missed"),
        F.sum(F.when(F.col("is_candidate"), 1).otherwise(0)).alias(
            "n_candidates"
        ),
    )
    return flags.select(
        "n_probe",
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.col("n_missed") == 0).alias("superset_ok"),
        (F.col("n_candidates") < F.col("n_probe")).alias(
            "pruning_effective"
        ),
    )


# ---------------------------------------------------------------------------
# Discrete percentiles, median, deterministic mode
# ---------------------------------------------------------------------------

_DISC_ORACLE = """
WITH modes AS (
  SELECT o_orderstatus, o_orderpriority,
         COUNT(*) AS cnt,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority)
           AS rk
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT q.o_orderstatus,
       ROUND(quantile_disc(q.o_totalprice, 0.25), 2) AS p25_disc,
       ROUND(quantile_disc(q.o_totalprice, 0.75), 2) AS p75_disc,
       ROUND(median(q.o_totalprice), 4)              AS median_price,
       ANY_VALUE(m.o_orderpriority)                  AS mode_priority
FROM orders q
JOIN modes m ON m.o_orderstatus = q.o_orderstatus AND m.rk = 1
GROUP BY q.o_orderstatus
ORDER BY q.o_orderstatus
"""


@register(
    "percentile_disc_median_battery",
    oracle=_DISC_ORACLE,
    tags=("percentile", "median", "mode", "agg"),
    description="percentile_disc, median, and tie-broken mode per status",
)
def percentile_disc_median_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered-set aggregates: discrete percentiles (actual data
    values — no interpolation, so cross-engine exact), the exact
    median, and the modal order priority. mode() is NOT used
    directly: both engines break frequency ties arbitrarily, so the
    mode is derived from a count + row_number ranking with an
    explicit lexicographic tie-break — deterministic by
    construction. percentile_disc needs a per-group sort at scale;
    the sketch twin (approx_percentile_prices) is the 100 TB path."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_pdisc_orders")
    return spark.sql(
        """
        WITH modes AS (
          SELECT o_orderstatus, o_orderpriority,
                 COUNT(*) AS cnt,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY COUNT(*) DESC,
                                             o_orderpriority) AS rk
          FROM _pdisc_orders GROUP BY o_orderstatus, o_orderpriority
        )
        SELECT q.o_orderstatus,
               ROUND(percentile_disc(0.25)
                     WITHIN GROUP (ORDER BY q.o_totalprice), 2)
                 AS p25_disc,
               ROUND(percentile_disc(0.75)
                     WITHIN GROUP (ORDER BY q.o_totalprice), 2)
                 AS p75_disc,
               ROUND(median(q.o_totalprice), 4) AS median_price,
               ANY_VALUE(m.o_orderpriority)     AS mode_priority
        FROM _pdisc_orders q
        JOIN modes m ON m.o_orderstatus = q.o_orderstatus AND m.rk = 1
        GROUP BY q.o_orderstatus
        ORDER BY q.o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# IGNORE NULLS window battery (LOCF primitives)
# ---------------------------------------------------------------------------

_IGNORE_NULLS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'error' THEN NULL ELSE ROUND(value, 2) END
           AS v
  FROM events WHERE user_id < 10
)
SELECT user_id, event_id, v,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_v,
       first_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS first_nonnull,
       nth_value(v, 2 IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_nonnull
FROM e ORDER BY user_id, event_id
"""


@register(
    "window_ignore_nulls_battery",
    oracle=_IGNORE_NULLS_ORACLE,
    tags=("window", "ignore-nulls", "locf"),
    description="first/last/nth_value IGNORE NULLS (LOCF primitives)",
)
def window_ignore_nulls_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The IGNORE NULLS window surface — the primitive under every
    gap-fill / LOCF pipeline (events_gapfill_locf composes it; this
    battery isolates it): running last non-null, partition-wide
    first non-null, and the second non-null observation. Error
    events' values are nulled deterministically to create gaps.
    One shuffle on user_id serves all three functions — they share
    the window partitioning."""
    from pyspark.sql import Window as W

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(F.col("event_type") == "error", None)
            .otherwise(F.round(F.col("value"), 2))
            .alias("v"),
        )
    )
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    full = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(run).alias("locf_v"),
        F.first("v", ignorenulls=True).over(full).alias("first_nonnull"),
        F.nth_value("v", 2, ignoreNulls=True)
        .over(full)
        .alias("second_nonnull"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# Chi-square independence test (order-pinned float fold)
# ---------------------------------------------------------------------------

_CHISQ_ORACLE = """
WITH cells AS (
  SELECT c_mktsegment AS seg, o_orderstatus AS status,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT seg, status, o,
         SUM(o) OVER (PARTITION BY seg)    AS rt,
         SUM(o) OVER (PARTITION BY status) AS ct,
         SUM(o) OVER ()                    AS n
  FROM cells
),
terms AS (
  SELECT seg, status,
         POWER(o - rt * ct / (1.0 * n), 2) / (rt * ct / (1.0 * n)) AS term,
         SUM(POWER(o - rt * ct / (1.0 * n), 2) / (rt * ct / (1.0 * n)))
           OVER (ORDER BY seg, status ROWS UNBOUNDED PRECEDING) AS chi2_run,
         row_number() OVER (ORDER BY seg, status) AS rn,
         COUNT(*) OVER () AS n_cells
  FROM tot
)
SELECT ROUND(chi2_run, 6) AS chi2,
       CAST(n_cells AS BIGINT) AS n_cells
FROM terms WHERE rn = n_cells
"""


@register(
    "chisq_segment_status",
    oracle=_CHISQ_ORACLE,
    tags=("agg", "statistics", "chi-square"),
    description="chi-square independence: segment x order status",
)
def chisq_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between market segment and
    order status. Observed counts are exact integers; expected
    counts and (O-E)²/E terms are float, so the cross-cell SUM's
    addition order would be engine- and partition-dependent — the
    fold is therefore pinned to (seg, status) order via an ordered
    running-window sum and the last row taken. The contingency table
    is tiny (|segments|×|statuses|), so the window sort costs
    nothing; the heavy work is the integer count aggregation, one
    shuffle with map-side combine."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    tot = cells.select(
        "seg",
        "status",
        "o",
        F.sum("o").over(W.partitionBy("seg")).alias("rt"),
        F.sum("o").over(W.partitionBy("status")).alias("ct"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    term = F.pow(
        F.col("o") - F.col("rt") * F.col("ct") / (F.lit(1.0) * F.col("n")), 2
    ) / (F.col("rt") * F.col("ct") / (F.lit(1.0) * F.col("n")))
    run = (
        W.orderBy("seg", "status")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    terms = tot.select(
        "seg",
        "status",
        F.sum(term).over(run).alias("chi2_run"),
        F.row_number().over(W.orderBy("seg", "status")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_cells"),
    )
    return terms.filter(F.col("rn") == F.col("n_cells")).select(
        F.round("chi2_run", 6).alias("chi2"),
        F.col("n_cells").cast("long").alias("n_cells"),
    )


# --------------------------------------------------------------------------
# Lateral correlated subquery + Spark 4 pipe syntax (SQL surface)
# --------------------------------------------------------------------------

_LATERAL_ORACLE = """
SELECT d.c_mktsegment, l.o_orderkey, l.totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) d,
LATERAL (
  SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = d.c_mktsegment
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) l
ORDER BY d.c_mktsegment, l.totalprice DESC, l.o_orderkey
"""


@register(
    "lateral_topk_per_segment",
    oracle=_LATERAL_ORACLE,
    tags=("join", "lateral", "topk", "sql"),
    description="JOIN LATERAL: correlated top-2 orders per market segment",
)
def lateral_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the third top-k-per-group form
    beside the ranking window and groupBy+slice: each outer row
    (segment) drives an ordered-limited inner query. Catalyst
    decorrelates it; at scale this plans like the window form, but
    the surface matters for SQL users migrating correlated queries."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_ORACLE)


_PIPE_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "pipe_syntax_order_stats",
    oracle=_PIPE_ORACLE,
    tags=("agg", "sql", "pipe-syntax"),
    description="Spark 4 SQL pipe syntax (|>) filter→aggregate→sort",
)
def pipe_syntax_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same filter→aggregate→sort expressed in Spark 4's pipe
    syntax — compiles to the identical plan as the ANSI form (the
    oracle), pinning that the new surface is semantics-preserving."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |> AGGREGATE COUNT(*) AS n_orders,
                     ROUND(SUM(o_totalprice), 2) AS revenue
           GROUP BY o_orderstatus
        |> ORDER BY o_orderstatus
        """
    )


# --------------------------------------------------------------------------
# Graph: triangle counting over the co-occurrence graph
# --------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH edges AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 3
)
SELECT
  CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
  CAST((SELECT COUNT(DISTINCT p) FROM (
    SELECT pa AS p FROM edges UNION SELECT pb FROM edges)) AS BIGINT) AS n_nodes,
  CAST((SELECT COUNT(*)
        FROM edges e1
        JOIN edges e2 ON e1.pb = e2.pa
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb) AS BIGINT)
    AS n_triangles
"""


@register(
    "graph_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    tags=("graph", "self-join", "triangle"),
    description="oriented triangle count over the part co-occurrence graph",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting, the classic graph-analytics
    kernel: orient every edge low→high, then one two-hop equi-join
    (e1.b = e2.a) probed against the edge set closes each wedge
    exactly once — the standard MapReduce formulation whose join
    input is O(Σ deg²) wedges, kept small here because the ≥3-orders
    support threshold prunes the edge set first. Two shuffles past
    the edge build: wedge join on the middle vertex, closure probe
    on the (a, c) pair."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = l.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = l.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("pa", "pb")
    )
    e1 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = edges.select(F.col("pa").alias("y2"), F.col("pb").alias("z"))
    wedges = e1.join(e2, F.col("y") == F.col("y2")).select("x", "y", "z")
    tri = wedges.join(
        edges,
        (F.col("x") == F.col("pa")) & (F.col("z") == F.col("pb")),
        "left_semi",
    )
    nodes = (
        edges.select(F.col("pa").alias("p"))
        .union(edges.select(F.col("pb").alias("p")))
        .distinct()
    )
    return (
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
        .join(F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .join(F.broadcast(tri.agg(F.count(F.lit(1)).alias("n_triangles"))))
    )


# --------------------------------------------------------------------------
# Pareto / ABC classification + RFM scoring (warehouse staples)
# --------------------------------------------------------------------------

_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
         AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, cents,
    SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    (SELECT CAST(SUM(cents) AS BIGINT) FROM rev) AS tot
  FROM rev
)
SELECT
  CASE WHEN cum * 100 <= tot * 80 THEN 'A'
       WHEN cum * 100 <= tot * 95 THEN 'B'
       ELSE 'C' END AS abc_class,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  ROUND(CAST(SUM(cents) AS BIGINT) / 100.0, 2) AS revenue,
  ROUND(CAST(SUM(cents) AS BIGINT) * 100.0 / MAX(tot), 2) AS revenue_pct
FROM ranked
GROUP BY 1
ORDER BY abc_class
"""


@register(
    "abc_part_classification",
    oracle=_ABC_ORACLE,
    tags=("window", "pareto", "abc"),
    description="ABC/Pareto part classification by cumulative revenue share",
)
def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: rank parts by revenue, classify by cumulative
    share (A ≤80%, B ≤95%, C rest). Revenue is exact integer cents and
    the class boundary compares cum·100 ≤ tot·k in integers — no
    float share, so classification is bit-stable. The running sum is
    a global-order window: at 100 TB it becomes range-partitioned
    prefix sums (two passes: per-partition totals, then offset
    propagation) — same math, noted here because a single-partition
    window is the one shape that cannot ship as-is."""
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    rev = l.groupBy("l_partkey").agg(F.sum(cents).alias("cents"))
    tot = rev.agg(F.sum("cents").alias("tot"))
    w = Window.orderBy(F.col("cents").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.withColumn("cum", F.sum("cents").over(w)).join(
        F.broadcast(tot)
    )
    abc = (
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.groupBy(abc.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            F.round(F.sum("cents") * 100.0 / F.max("tot"), 2).alias(
                "revenue_pct"
            ),
        )
        .orderBy("abc_class")
    )


_RFM_ORACLE = """
WITH base AS (
  SELECT o_custkey,
    MAX(o_orderdate) AS last_order,
    CAST(COUNT(*) AS BIGINT) AS frequency,
    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
    NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
    NTILE(5) OVER (ORDER BY frequency DESC, o_custkey)  AS f_score,
    NTILE(5) OVER (ORDER BY cents DESC, o_custkey)      AS m_score
  FROM base
)
SELECT r_score, f_score, m_score,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(MIN(o_custkey) AS BIGINT) AS min_custkey
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


@register(
    "customer_rfm_segments",
    oracle=_RFM_ORACLE,
    tags=("window", "ntile", "rfm"),
    description="RFM quintile segmentation of customers",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quintiles via
    NTILE over fully-tiebroken orders (custkey breaks every tie, so
    quintile assignment is deterministic across engines and
    partitionings; monetary is exact cents). Three global-order
    windows over the per-customer aggregate — fine at dim scale; for
    a fact-sized key domain the quintile boundaries would come from
    approx_percentile and a broadcast join instead."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents).alias("cents"),
    )
    r = Window.orderBy(F.col("last_order").desc(), "o_custkey")
    f_ = Window.orderBy(F.col("frequency").desc(), "o_custkey")
    m = Window.orderBy(F.col("cents").desc(), "o_custkey")
    scored = base.select(
        "o_custkey",
        F.ntile(5).over(r).alias("r_score"),
        F.ntile(5).over(f_).alias("f_score"),
        F.ntile(5).over(m).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("o_custkey").alias("min_custkey"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------------
# Sweep-line interval counting: open-order backlog by month
# --------------------------------------------------------------------------

_BACKLOG_ORACLE = """
WITH spans AS (
  SELECT o.o_orderkey,
    date_trunc('month', o.o_orderdate) AS open_month,
    date_trunc('month', MAX(l.l_shipdate)) AS close_month
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
  SELECT open_month AS month, CAST(1 AS BIGINT) AS d FROM spans
  UNION ALL
  SELECT close_month + INTERVAL 1 MONTH, CAST(-1 AS BIGINT) FROM spans
),
monthly AS (
  SELECT month, CAST(SUM(d) AS BIGINT) AS delta FROM deltas GROUP BY month
)
SELECT month,
  CAST(SUM(delta) OVER (ORDER BY month
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS open_orders
FROM monthly
ORDER BY month
"""


@register(
    "orders_backlog_sweepline",
    oracle=_BACKLOG_ORACLE,
    tags=("window", "sweep-line", "intervals"),
    description="open-order backlog per month via sweep-line deltas",
)
def orders_backlog_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are open (placed, not fully shipped) at each
    month — the interval-overlap count, computed sweep-line style:
    every order contributes +1 at its open month and −1 after its
    close month, deltas aggregate per month, and a running sum
    converts deltas to concurrency. The intermediate is TWO ROWS per
    order regardless of interval length — the scale trick vs.
    exploding every interval into its covered months (unboundedly
    larger for long intervals). The final window runs over the tiny
    month domain; the heavy lifting is ordinary keyed aggregation."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    spans = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.date_trunc("month", "o_orderdate").alias("open_month"),
            F.add_months(F.date_trunc("month", "last_ship"), 1).alias(
                "after_close"
            ),
        )
    )
    deltas = spans.select(
        F.col("open_month").alias("month"), F.lit(1).cast("long").alias("d")
    ).unionAll(
        spans.select(
            F.col("after_close").alias("month"),
            F.lit(-1).cast("long").alias("d"),
        )
    )
    monthly = deltas.groupBy("month").agg(F.sum("d").alias("delta"))
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        monthly.select(
            "month", F.sum("delta").over(w).alias("open_orders")
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Cohort LTV curves + shipping-latency SLA
# --------------------------------------------------------------------------

_COHORT_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
),
facts AS (
  SELECT f.cohort,
    CAST(datediff('month', f.cohort, date_trunc('month', o.o_orderdate))
         AS BIGINT) AS month_idx,
    CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  WHERE f.cohort < TIMESTAMP '1996-01-01'
),
monthly AS (
  SELECT cohort, month_idx,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM facts WHERE month_idx <= 11 GROUP BY 1, 2
)
SELECT cohort, month_idx,
  ROUND(CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY month_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        / 100.0, 2) AS cum_revenue
FROM monthly
ORDER BY cohort, month_idx
"""


@register(
    "cohort_ltv_curves",
    oracle=_COHORT_LTV_ORACLE,
    tags=("window", "cohort", "ltv"),
    description="12-month cumulative revenue curves per signup cohort",
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers keyed by first-order
    month, revenue accumulated over each cohort's first 12 months —
    the growth-analytics twin of the retention triangle
    (events_weekly_retention). The first-order derivation is one
    keyed aggregate joined back to the fact (broadcast at dim
    scale); cents stay integer until the final display division."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    ).filter(F.col("cohort") < F.lit("1996-01-01").cast("timestamp"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    facts = o.join(F.broadcast(firsts), "o_custkey").select(
        "cohort",
        F.months_between(
            F.date_trunc("month", "o_orderdate"), F.col("cohort")
        )
        .cast("long")
        .alias("month_idx"),
        cents.alias("cents"),
    )
    monthly = (
        facts.filter(F.col("month_idx") <= 11)
        .groupBy("cohort", "month_idx")
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        monthly.select(
            "cohort",
            "month_idx",
            F.round(F.sum("cents").over(w) / 100.0, 2).alias("cum_revenue"),
        )
        .orderBy("cohort", "month_idx")
    )


_SHIP_SLA_ORACLE = """
WITH lat AS (
  SELECT o.o_orderpriority,
    CAST(datediff('day', o.o_orderdate, MIN(l.l_shipdate)) AS BIGINT)
      AS days_to_first_ship
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  ROUND(median(days_to_first_ship), 1) AS median_days,
  CAST(MAX(days_to_first_ship) AS BIGINT) AS worst_days
FROM lat
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "orders_ship_sla",
    oracle=_SHIP_SLA_ORACLE,
    tags=("agg", "median", "sla"),
    description="median/worst days-to-first-ship per order priority",
)
def orders_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment SLA: per priority class, the median and worst days
    from order to FIRST shipment — median because a single pathological
    order must not move the headline number (the same robustness
    argument as events_mad_outliers). One orderkey-join + two keyed
    aggregates; integer day arithmetic throughout."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    lat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "o_orderpriority",
            F.datediff("first_ship", "o_orderdate")
            .cast("long")
            .alias("days_to_first_ship"),
        )
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.median("days_to_first_ship"), 1).alias("median_days"),
            F.max("days_to_first_ship").alias("worst_days"),
        )
        .orderBy("o_orderpriority")
    )


_SUPPLIER_SCORECARD_ORACLE = """
SELECT s_suppkey, s_name,
  ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT)) AS BIGINT) / 100.0, 2) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts,
  ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        * 1.0 / COUNT(*), 4) AS return_rate
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY revenue DESC, s_suppkey
LIMIT 25
"""


@register(
    "supplier_scorecard",
    oracle=_SUPPLIER_SCORECARD_ORACLE,
    tags=("agg", "scorecard", "distinct-agg"),
    description="top-25 supplier scorecard: revenue, breadth, return rate",
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric entity scorecard in ONE aggregation pass —
    revenue (exact cents), volume, part breadth (distinct agg), and
    return rate (conditional agg) computed together so the fact
    table is read once; the supplier dim broadcasts. The shape every
    operational dashboard page compiles to."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.count_distinct("l_partkey").alias("n_distinct_parts"),
            F.round(
                F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("return_rate"),
        )
        .orderBy(F.col("revenue").desc(), "s_suppkey")
        .limit(25)
    )


_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
)
SELECT digit,
  CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM d), 4) AS observed_p,
  ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS benford_p
FROM d
GROUP BY digit
ORDER BY digit
"""


@register(
    "orders_benford_digits",
    oracle=_BENFORD_ORACLE,
    tags=("agg", "audit", "benford"),
    description="first-digit distribution of order totals vs Benford's law",
)
def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit: the observed leading-digit
    distribution of order totals beside the log₁₀(1+1/d) expectation
    — the forensic screen for fabricated or capped monetary data
    (synthetic uniform generators fail it visibly, which is itself a
    data-quality signal worth surfacing). Digit extraction is exact
    integer/string arithmetic; one tiny aggregate plus a 1-row total
    broadcast."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).alias("tot"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") * 1.0 / F.col("tot"), 4).alias("observed_p"),
            F.round(
                F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 4
            ).alias("benford_p"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Frequent triples (the a-priori step above pair mining)
# ---------------------------------------------------------------------------


@register(
    "basket_triples_support",
    oracle="""
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
t AS (
  SELECT a.p AS p1, b2.p AS p2, c.p AS p3
  FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
           JOIN b c  ON a.o = c.o  AND b2.p < c.p
)
SELECT p1, p2, p3, CAST(COUNT(*) AS BIGINT) AS support
FROM t GROUP BY p1, p2, p3
HAVING COUNT(*) >= 2
ORDER BY support DESC, p1, p2, p3
""",
    tags=("baskets", "apriori", "triples"),
    description="frequent part triples (support>=2) via ordered self-joins",
)
def basket_triples_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k=3 a-priori layer: two ordered equi-self-joins on the
    basket key. Both joins hash on l_orderkey, so the blow-up is
    bounded by lines-per-order³ — a per-basket constant — and the
    intermediate scales linearly with orders, never with the part
    catalog. (At real scale the k=2 support filter would prune the
    join inputs first — classic a-priori — which only SHRINKS this
    plan; the unpruned form is the worst case and still basket-
    bounded.)"""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b2, c = b.alias("a"), b.alias("b2"), b.alias("c")
    triples = (
        a.join(
            b2,
            (F.col("a.o") == F.col("b2.o")) & (F.col("a.p") < F.col("b2.p")),
        )
        .join(
            c,
            (F.col("a.o") == F.col("c.o")) & (F.col("b2.p") < F.col("c.p")),
        )
        .select(
            F.col("a.p").alias("p1"),
            F.col("b2.p").alias("p2"),
            F.col("c.p").alias("p3"),
        )
    )
    return (
        triples.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.col("support").desc(), "p1", "p2", "p3")
    )


# ---------------------------------------------------------------------------
# Incremental aggregation with RETRACTIONS (CDC-friendly rollup)
# ---------------------------------------------------------------------------


@register(
    "incremental_rollup_retractions",
    oracle="""
WITH base AS (
  SELECT o_orderstatus AS status,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE o_orderkey % 10 <> 0
  GROUP BY o_orderstatus
),
delta AS (
  -- upserted rows arrive as (+1), replaced versions as (-1)
  SELECT o_orderstatus AS status, CAST(op AS BIGINT) AS op,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders CROSS JOIN (VALUES (1), (-1)) v(op)
  WHERE (op = 1  AND o_orderkey % 10 = 0)
     OR (op = -1 AND o_orderkey % 20 = 5)
),
dagg AS (
  SELECT status, CAST(SUM(op) AS BIGINT) AS dn,
         CAST(SUM(op * cents) AS BIGINT) AS dcents
  FROM delta GROUP BY status
),
merged AS (
  SELECT COALESCE(b.status, d.status) AS status,
         COALESCE(b.n, 0) + COALESCE(d.dn, 0) AS n,
         COALESCE(b.cents, 0) + COALESCE(d.dcents, 0) AS cents
  FROM base b FULL OUTER JOIN dagg d ON b.status = d.status
),
truth AS (
  SELECT o_orderstatus AS status,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE o_orderkey % 20 <> 5
  GROUP BY o_orderstatus
)
SELECT m.status, CAST(m.n AS BIGINT) AS n, CAST(m.cents AS BIGINT) AS cents,
       CAST(m.n = t.n AND m.cents = t.cents AS BOOLEAN) AS matches_truth
FROM merged m JOIN truth t ON t.status = m.status
ORDER BY m.status
""",
    tags=("incremental", "cdc", "retraction", "rollup"),
    description="rollup merged with +1/-1 retraction deltas == recomputed truth",
)
def incremental_rollup_retractions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retractable incremental view maintenance: the materialized
    per-status rollup absorbs a CDC delta stream where inserts carry
    op=+1 and replaced/deleted versions op=-1 — count and sum are
    ABELIAN-GROUP aggregates, so the merge is pure addition and never
    re-reads the base fact table (the property that makes streaming
    MV maintenance O(delta) at 100 TB; max/min are NOT retractable
    this way and need the full-group fallback). The query certifies
    the merged state equals the from-scratch recomputation via an
    in-row boolean."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = (
        o.filter(F.col("o_orderkey") % 10 != 0)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("cents"),
        )
    )
    inserts = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderstatus").alias("status"),
        F.lit(1).cast("long").alias("op"),
        cents.alias("cents"),
    )
    retracts = o.filter(F.col("o_orderkey") % 20 == 5).select(
        F.col("o_orderstatus").alias("status"),
        F.lit(-1).cast("long").alias("op"),
        cents.alias("cents"),
    )
    dagg = (
        inserts.unionByName(retracts)
        .groupBy("status")
        .agg(
            F.sum("op").cast("long").alias("dn"),
            F.sum(F.col("op") * F.col("cents")).cast("long").alias("dcents"),
        )
    )
    merged = (
        base.join(dagg, "status", "full_outer")
        .select(
            "status",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
                "n"
            ),
            (
                F.coalesce("cents", F.lit(0)) + F.coalesce("dcents", F.lit(0))
            ).alias("cents"),
        )
    )
    truth = (
        o.filter(F.col("o_orderkey") % 20 != 5)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("t_n"),
            F.sum(cents).cast("long").alias("t_cents"),
        )
    )
    return (
        merged.join(truth, "status")
        .select(
            "status",
            F.col("n").cast("long").alias("n"),
            F.col("cents").cast("long").alias("cents"),
            (
                (F.col("n") == F.col("t_n"))
                & (F.col("cents") == F.col("t_cents"))
            ).alias("matches_truth"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Supply-chain resilience: supplier redundancy per part
# ---------------------------------------------------------------------------


@register(
    "part_supplier_redundancy",
    oracle="""
WITH sp AS (
  SELECT l_partkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
  FROM lineitem GROUP BY l_partkey
)
SELECT n_suppliers,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS single_sourced
FROM sp GROUP BY n_suppliers ORDER BY n_suppliers
""",
    tags=("analytics", "supply-chain", "histogram"),
    description="supplier-redundancy histogram: single-sourced part risk",
)
def part_supplier_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sourcing-risk profile: distinct observed suppliers per part,
    histogrammed — the single-sourced bucket is the resilience red
    flag. A count-distinct then a tiny-domain histogram: the first
    aggregation shuffles on partkey with map-side partial distinct,
    the second is broadcast-scale."""
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers")
    )
    return (
        sp.groupBy("n_suppliers")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum((F.col("n_suppliers") == 1).cast("long"))
            .cast("long")
            .alias("single_sourced"),
        )
        .orderBy("n_suppliers")
    )
