"""Classic TPC-H query shapes adapted to the driver's slimmed star schema.

The reference engine has no joins at all (SURVEY §2.11 — its one table
is navigated by key-prefix), so this battery is where the new engine
demonstrates the full relational surface at scale: multi-role dimension
joins (Q7's two nation aliases), conditional-aggregation market share
(Q8), disjunctive predicate pushdown (Q19), correlated-aggregate
subqueries (Q17), compound-condition semi/anti joins (Q21), and
top-k-after-join (Q3/Q10).

Schema adaptations (the driver's tables omit partsupp, l_commitdate /
l_receiptdate, p_container, c_phone — see TESTDATA.md):
  * Q12/Q4 late-delivery predicates are replaced by l_returnflag tests;
  * Q19's container brackets become p_size brackets;
  * Q21's "kept orders waiting" becomes "sole returning supplier in a
    multi-supplier order" — same EXISTS / NOT EXISTS topology;
  * Q22's phone-prefix cohort becomes a nation cohort.

Scale notes (100 TB contract): every query here shuffles only fact
tables, and only when an aggregation/join key demands it; all dims
(part 2k rows, supplier 100, nation 25, customer 1.5k·sf) broadcast.
Q17/Q21 read lineitem twice — at scale both passes push the same
partkey/orderkey-domain filters into the scan, and AQE coalesces the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.plans.registry import register
from wilayah_aceh_etl_spark.sources.tables import load_table


_Q3_ORACLE = """
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register(
    "tpch_q3_shipping_priority",
    oracle=_Q3_ORACLE,
    tags=("join", "agg", "topk"),
    description="Q3 shape: segment filter, 3-way join, top-10 open revenue",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-revenue top-k. customer is broadcast; lineitem⋈orders
    shuffles once on orderkey; ORDER BY+LIMIT plans
    TakeOrderedAndProject (no full sort materialization)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q7_ORACLE = """
SELECT
  supp_nation,
  cust_nation,
  l_year,
  ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    EXTRACT(year FROM l_shipdate) AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "tpch_q7_nation_volume",
    oracle=_Q7_ORACLE,
    tags=("join", "agg", "multi-role-dim"),
    description="Q7 shape: nation-pair yearly volume, one dim in two roles",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation dim participates twice (supplier side + customer
    side) under different aliases — both copies broadcast, so the only
    shuffle is lineitem⋈orders on orderkey. The disjunctive nation-pair
    predicate is applied post-join (it spans both roles)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_ORACLE = """
SELECT
  o_year,
  ROUND(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
        / ROUND(SUM(volume), 2), 4) AS mkt_share
FROM (
  SELECT
    EXTRACT(year FROM o_orderdate) AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register(
    "tpch_q8_market_share",
    oracle=_Q8_ORACLE,
    tags=("join", "agg", "conditional-agg"),
    description="Q8 shape: one nation's market share within a region per year",
    bench=True,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share = conditional sum / total sum in ONE aggregation
    pass (no self-join). 7 of the 8 relations broadcast; the ratio is
    computed over pre-rounded sums so both engines divide identical
    doubles."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.round(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_3", F.col("volume")
                        ).otherwise(F.lit(0.0))
                    ),
                    2,
                )
                / F.round(F.sum("volume"), 2),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  ROUND(c_acctbal, 2) AS acctbal,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "tpch_q10_returned_items",
    oracle=_Q10_ORACLE,
    tags=("join", "agg", "topk"),
    description="Q10 shape: top-20 customers by returned-item revenue",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue report. Both filters push into their
    scans before the orderkey shuffle; customer/nation broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q14_ORACLE = """
SELECT
  ROUND(100.0 * ROUND(SUM(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END), 2)
        / ROUND(SUM(l_extendedprice * (1 - l_discount)), 2), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-02-01'
"""


@register(
    "tpch_q14_promo_share",
    oracle=_Q14_ORACLE,
    tags=("join", "conditional-agg"),
    description="Q14 shape: promo revenue percentage in one agg pass",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage metric via conditional aggregation — a single global
    aggregate after a broadcast join; the month filter pushes into the
    lineitem scan."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.round(
                    F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0)),
                    2,
                )
                / F.round(F.sum(disc), 2),
                4,
            ).alias("promo_revenue")
        )
    )


_Q15_ORACLE = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register(
    "tpch_q15_top_supplier",
    oracle=_Q15_ORACLE,
    tags=("join", "agg", "scalar-subquery"),
    description="Q15 shape: supplier(s) with max quarterly revenue",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue view is computed once and reused for both the max
    and the join (Catalyst reuses the aggregated subplan); comparing
    pre-rounded revenues keeps the max-equality deterministic."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q17_ORACLE = """
SELECT
  ROUND(ROUND(SUM(l_extendedprice), 2) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


@register(
    "tpch_q17_small_qty_revenue",
    oracle=_Q17_ORACLE,
    tags=("join", "correlated-subquery", "agg"),
    description="Q17 shape: correlated per-part avg-quantity threshold",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery decorrelated by hand: the
    per-part threshold is a groupBy over lineitem restricted (semi-
    join) to the brand's parts, then broadcast back against the
    brand-filtered fact rows. l_quantity is integer-valued so sum and
    count are exact and the 0.2·avg threshold compares identically in
    both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    thresholds = (
        l.join(F.broadcast(brand_parts), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        l.join(F.broadcast(brand_parts), l.l_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(thresholds), l.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.lit(7.0), 2).alias(
                "avg_yearly"
            )
        )
    )


_Q19_ORACLE = """
SELECT
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1  AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register(
    "tpch_q19_disjunctive_pushdown",
    oracle=_Q19_ORACLE,
    tags=("join", "disjunctive-predicate"),
    description="Q19 shape: OR-of-AND brackets spanning both join sides",
)
def tpch_q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed-side predicate: Catalyst derives the
    single-side implications (p_brand IN (...), l_quantity BETWEEN
    1 AND 30) and pushes them into each scan while the full OR tree
    evaluates after the broadcast join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((b == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register(
    "tpch_q21_sole_returning_supplier",
    oracle=_Q21_ORACLE,
    tags=("join", "semi", "anti", "agg"),
    description="Q21 topology: EXISTS + NOT EXISTS with compound conditions",
)
def tpch_q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's exists/not-exists pair as left-semi + left-anti joins
    whose conditions mix an equi key (orderkey — the shuffle key) with
    a non-equi residual (suppkey <>). Adapted predicate: the sole
    supplier with returned lines in a multi-supplier order (the
    driver schema has no commit/receipt dates)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l1 = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = l.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    cand = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            l2,
            (l1.l_orderkey == l2.l2_orderkey)
            & (l1.l_suppkey != l2.l2_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.l3_orderkey)
            & (l1.l_suppkey != l3.l3_suppkey),
            "left_anti",
        )
    )
    return (
        cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


_Q22_ORACLE = """
SELECT
  n_name,
  COUNT(*) AS numcust,
  ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
    SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY n_name
ORDER BY n_name
"""


@register(
    "tpch_q22_idle_rich_customers",
    oracle=_Q22_ORACLE,
    tags=("anti", "scalar-subquery", "agg"),
    description="Q22 shape: above-average balances, no urgent orders, per nation",
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive-balance global average (uncorrelated scalar subquery,
    broadcast as a 1-row cross join) gates customers, then a left-anti
    join against urgent orders drops anyone who placed one. Nation
    cohorts replace Q22's phone prefixes (no c_phone in the driver
    schema); the urgency filter keeps the cohort non-empty at sf0.01."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "tpch_q4_priority_with_returns",
    oracle=_Q4_ORACLE,
    tags=("semi", "agg"),
    description="Q4 shape: EXISTS semi-join, priority distribution",
)
def tpch_q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4's EXISTS as a left-semi join: lineitem is filtered and
    projected to its join key before the shuffle, so the semi side
    carries one column. Adapted predicate: an order with any returned
    line (the driver schema has no commit/receipt dates)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q9_ORACLE = """
SELECT
  n_name AS nation,
  o_year,
  ROUND(SUM(volume_cents) / 100.0, 2) AS profit
FROM (
  SELECT
    n_name,
    EXTRACT(year FROM o_orderdate) AS o_year,
    CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      AS volume_cents
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY n_name, o_year
ORDER BY nation, o_year
"""


@register(
    "tpch_q9_product_profit",
    oracle=_Q9_ORACLE,
    tags=("join", "agg", "like"),
    description="Q9 shape: product-line profit by supplier nation and year",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 without partsupp (absent from the driver schema): revenue
    stands in for profit. The contains-LIKE on p_name filters the
    broadcast part dim before the join; supplier/nation broadcast;
    the only shuffles are lineitem⋈orders and the final aggregate.

    The revenue term is rounded to exact integer CENTS before the
    sum: integer addition is order-independent, so the aggregate is
    bit-stable under any partitioning — the pattern to prefer for
    money sums whose double-summation would round near a boundary
    (this one flapped by one cent between engines as a double)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            cents.alias("volume_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("volume_cents") / 100.0, 2).alias("profit"))
        .orderBy("nation", "o_year")
    )


_Q5_ORACLE = """
SELECT
  n_name AS nation,
  ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0, 2)
    AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation
"""


@register(
    "tpch_q5_local_supplier_volume",
    oracle=_Q5_ORACLE,
    tags=("join", "agg"),
    description="Q5 shape: 6-table join, customer and supplier in one nation",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5): the join graph is a cycle —
    lineitem joins supplier on suppkey AND on the customer's nation —
    which no reference query has (SURVEY §2.11: the reference engine
    has no joins at all).

    Scale shape: region→nation→supplier collapse driver-side into a
    broadcast; customer broadcasts; the only shuffle is
    lineitem⋈orders on orderkey. The c_nationkey = s_nationkey leg
    rides the same joins as an ordinary equi-condition — no extra
    shuffle. Revenue sums exact integer cents (order-independent)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_name").alias("nation"), cents.alias("cents"))
        .groupBy("nation")
        .agg(F.round(F.sum("cents") / 100.0, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


_Q6_ORACLE = """
SELECT
  ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT)) / 100.0, 2)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register(
    "tpch_q6_forecast_revenue",
    oracle=_Q6_ORACLE,
    tags=("filter", "agg", "pushdown"),
    description="Q6 shape: pure scan-filter-aggregate, all predicates pushed",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6): the canonical
    scan-dominated query — no join, no groupBy key, so the plan is
    FileScan → Filter → partial agg → single-row final agg. All four
    predicates appear in PushedFilters (row-group pruning via parquet
    min/max stats); ReadSchema keeps only the 4 referenced columns.
    At 100 TB this is the query whose cost IS the scan — anything
    beyond one pass over the pruned row groups is waste."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0).cast(
        "long"
    )
    return l.select(cents.alias("cents")).agg(
        F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Derived partsupp — the driver schema omits TPC-H's partsupp table, so the
# Q2/Q11/Q16/Q20 shapes run against a supplier-part relation aggregated from
# lineitem. All money math is exact integer cents (order-independent sums);
# the oracle builds the identical relation in a CTE.
# --------------------------------------------------------------------------

_PARTSUPP_CTE = """
  SELECT
    l_partkey AS ps_partkey,
    l_suppkey AS ps_suppkey,
    CAST(SUM(l_quantity) AS BIGINT) AS ps_availqty,
    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
      AS ps_cost_cents,
    ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
          / 100.0 / SUM(l_quantity), 4) AS ps_supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp surrogate: per (part, supplier) total quantity, total
    spend in exact cents, and a deterministic unit cost (both engines
    divide the same exact integers, so ROUND(...,4) cannot flap).
    One shuffle on (partkey, suppkey); at 100 TB this is a map-side-
    combined hash aggregate over the fact table."""
    l = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        l.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum("l_quantity").cast("long").alias("ps_availqty"),
            F.sum(cents).alias("ps_cost_cents"),
        )
        .withColumn(
            "ps_supplycost",
            F.round(F.col("ps_cost_cents") / 100.0 / F.col("ps_availqty"), 4),
        )
    )


_Q2_ORACLE = f"""
WITH partsupp AS ({_PARTSUPP_CTE}),
euro AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, n_name
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_name, n_name, ps_supplycost AS min_cost
FROM part
JOIN euro ON p_partkey = ps_partkey
WHERE p_size = 15 AND p_type = 'STANDARD'
  AND ps_supplycost = (
    SELECT MIN(e2.ps_supplycost) FROM euro e2
    WHERE e2.ps_partkey = p_partkey
  )
ORDER BY p_partkey, s_name
LIMIT 100
"""


@register(
    "tpch_q2_min_cost_supplier",
    oracle=_Q2_ORACLE,
    tags=("join", "window", "correlated-subquery"),
    description="Q2 shape: min-cost supplier per part within a region",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated MIN subquery decorrelated as a window minimum:
    enrich the derived partsupp with supplier→nation→region (all
    broadcast), keep EUROPE, take min(ps_supplycost) over a partkey
    window, keep the rows that achieve it. One shuffle (partkey) past
    the partsupp build; the part dim filters before its broadcast
    join, and LIMIT plans TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    euro = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_name", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        euro.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "min_cost")
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


_Q11_ORACLE = f"""
WITH partsupp AS ({_PARTSUPP_CTE}),
natps AS (
  SELECT ps_partkey, ps_cost_cents
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
)
SELECT
  ps_partkey,
  ROUND(CAST(SUM(ps_cost_cents) AS BIGINT) / 100.0, 2) AS value
FROM natps
GROUP BY ps_partkey
HAVING CAST(SUM(ps_cost_cents) AS BIGINT)
     > 0.001 * (SELECT CAST(SUM(ps_cost_cents) AS BIGINT) FROM natps)
ORDER BY value DESC, ps_partkey
"""


@register(
    "tpch_q11_important_stock",
    oracle=_Q11_ORACLE,
    tags=("join", "agg", "scalar-subquery", "having"),
    description="Q11 shape: parts above a fraction of one nation's total spend",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's global-fraction HAVING: the nation's partsupp slice is
    aggregated per part, and the grand total arrives as a broadcast
    1-row cross join (uncorrelated scalar subquery). Integer-cents
    sums keep both the per-part values and the 0.001·total threshold
    bit-identical across engines and partitionings."""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    natps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("ps_partkey", "ps_cost_cents")
    )
    per_part = natps.groupBy("ps_partkey").agg(
        F.sum("ps_cost_cents").alias("part_cents")
    )
    total = natps.agg(F.sum("ps_cost_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_cents") > 0.001 * F.col("total_cents"))
        .select(
            "ps_partkey",
            F.round(F.col("part_cents") / 100.0, 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


_Q12_ORACLE = """
SELECT
  l_returnflag AS shipclass,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "tpch_q12_late_ship_priority",
    oracle=_Q12_ORACLE,
    tags=("join", "conditional-agg", "date"),
    description="Q12 shape: priority mix of late shipments (>=60d after order)",
)
def tpch_q12_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 with lateness re-derived (no commitdate/shipmode in the
    driver schema): a line is late when shipped ≥60 days after its
    order date — a cross-table predicate that can only apply after the
    orderkey join, while the shipdate year-range still pushes into the
    lineitem scan. Priority classes split in one conditional-agg pass."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipclass")
    )


_Q16_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM lineitem
)
SELECT
  p_brand, p_type, p_size,
  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register(
    "tpch_q16_supplier_variety",
    oracle=_Q16_ORACLE,
    tags=("join", "anti", "distinct-agg"),
    description="Q16 shape: distinct supplier counts per part descriptor",
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 topology: distinct (part, supplier) pairs, minus an
    excluded-supplier set (negative balances stand in for the
    complaints LIKE — no comment column), joined to a triple-filtered
    part dim, then COUNT(DISTINCT supplier) per descriptor. The
    exclusion is a broadcast anti-join; the distinct pair derivation
    is the only fact-side shuffle."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        pairs.join(
            F.broadcast(bad), pairs.ps_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q18_ORACLE = """
SELECT
  c_custkey, c_name, o_orderkey, o_orderdate,
  ROUND(o_totalprice, 2) AS totalprice,
  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@register(
    "tpch_q18_large_volume_customers",
    oracle=_Q18_ORACLE,
    tags=("join", "semi", "having", "topk"),
    description="Q18 shape: customers behind >250-unit aggregate orders",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18's IN-over-HAVING as an aggregate→semi-join: big orderkeys
    are found with one map-side-combined groupBy, semi-joined back
    into lineitem on the same key (no re-shuffle — both sides already
    hash by orderkey, and at scale AQE reuses the exchange), then the
    customer roll-up rides the existing partitioning. Quantity sums
    are integer-valued doubles, exact at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        l.join(big, l.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


_Q20_ORACLE = """
WITH widget_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
),
qty96 AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q96
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
qty97 AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q97
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
  AND s_suppkey IN (
    SELECT q.l_suppkey
    FROM qty96 q
    JOIN qty97 u ON q.l_partkey = u.l_partkey AND q.l_suppkey = u.l_suppkey
    WHERE q.l_partkey IN (SELECT p_partkey FROM widget_parts)
      AND q.q96 > 0.5 * u.q97
  )
ORDER BY s_suppkey
"""


@register(
    "tpch_q20_excess_stock_suppliers",
    oracle=_Q20_ORACLE,
    tags=("join", "semi", "agg"),
    description="Q20 shape: suppliers whose 1996 widget volume exceeds half of 1997's",
)
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested-IN chain: two year-sliced (part, supplier)
    aggregates joined on their grouping key — co-partitioned, so the
    join after the groupBys needs no extra shuffle — filtered by a
    cross-aggregate inequality (the availqty>0.5·shipped analog),
    reduced to a supplier id set, and semi-joined into the broadcast-
    enriched supplier dim. Quantity sums are exact; 0.5·q is an exact
    halving, so the inequality is deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    wp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )

    def year_slice(year: int, alias: str) -> DataFrame:
        return (
            l.filter(
                (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.sum("l_quantity").alias(alias))
        )

    q96 = year_slice(1996, "q96")
    q97 = year_slice(1997, "q97").withColumnsRenamed(
        {"l_partkey": "u_partkey", "l_suppkey": "u_suppkey"}
    )
    excess = (
        q96.join(F.broadcast(wp), q96.l_partkey == F.col("p_partkey"), "left_semi")
        .join(
            q97,
            (q96.l_partkey == F.col("u_partkey"))
            & (q96.l_suppkey == F.col("u_suppkey")),
        )
        .filter(F.col("q96") > 0.5 * F.col("q97"))
        .select(F.col("l_suppkey").alias("x_suppkey"))
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey, "left_semi")
        .join(F.broadcast(excess), s.s_suppkey == F.col("x_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )
