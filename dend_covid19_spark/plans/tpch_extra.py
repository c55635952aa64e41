"""TPC-H-shaped relational breadth beyond Q1/Q3/Q5/Q6/Q14/Q18: the
decorrelation / outer-aggregate / anti-join shapes a warehouse user
expects (Q4, Q7, Q10, Q13, Q22 analogs, adapted to the driver's trimmed
columns — no commitdate/phone/partsupp).

The reference has exactly one join (SURVEY.md §2.3, README.md:63-66);
these exist because "a user of the reference could switch to this repo"
implies the full relational algebra their warehouse (Redshift) gave them.

Scale notes are per-query; the common thread: aggregate-before-join
where possible, broadcast the dimension side, and let AQE handle skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import _sql_dsum, dsum
from .registry import query


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    non-equi residual (l_shipdate > o_orderdate), then group-count.

    Scale: the semi join shuffles only orderkeys that survive the 3-month
    date filter; lineitem never materializes matched rows (semi joins
    short-circuit on first match, and the probe side is filter-pruned at
    the scan)."""
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {_sql_dsum('volume', scale=6)} AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_11')
       OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_19')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: six-table join measuring trade volume between a
    nation pair, per direction per year.

    Scale: nation/supplier/customer broadcast (Catalyst picks this from
    parquet stats — pinned by test_plan_quality); the only repartition-
    scale shuffle is lineitem⋈orders on orderkey. The nation-pair filter
    pushes through both broadcast joins into the dimension scans."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_19"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n1), F.col("n1_key") == supp.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == cust.c_nationkey)
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", scale=6).alias("revenue"))
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
SELECT c_custkey, c_name, {_sql_dsum('l_extendedprice * (1 - l_discount)', scale=6)} AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.

    Scale: both fact filters (quarter of orders, 'R' lineitems) are
    pushed to the scans before the orderkey shuffle; the final top-20 is
    a TakeOrderedAndProject (per-partition heap + driver merge of 20-row
    heads), never a global sort. revenue ties break on c_custkey so the
    LIMIT boundary is deterministic for the oracle."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed N (non-urgent) orders —
    LEFT OUTER join with an ON-clause residual (kept customers with zero
    orders count 0, not dropped), two-level aggregation.

    Scale: first agg shuffles on custkey (same key as the join — one
    exchange reused), second agg is over at most ~hundreds of distinct
    counts; count(o_orderkey) vs count(*) is the null-aware distinction
    the outer join requires."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(
            orders,
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q22_dormant_customers",
    oracle="""
SELECT c_nationkey AS nation, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0.0
)
AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
GROUP BY c_nationkey
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no urgent orders, per
    nation — uncorrelated scalar subquery (global mean balance) + NOT
    EXISTS as a LEFT ANTI join. ("no orders at all", TPC-H's literal
    predicate, is vacuously empty at the driver's small scale factors —
    the urgent-order variant keeps the identical plan shape with rows to
    hash-check at every sf.)

    Scale: the scalar mean is one tiny aggregate broadcast into the
    filter; the anti join shuffles only above-average customers against
    the orders keys (with AQE free to broadcast the filtered side). The
    mean is computed as exact-decimal-sum / count — one IEEE division,
    identical in both engines, so the > threshold cut is stable."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    mean_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    rich = cust.join(F.broadcast(mean_bal)).where(F.col("c_acctbal") > F.col("m"))
    return (
        rich.join(urgent, urgent.o_custkey == rich.c_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", scale=2).alias("totacctbal"),
        )
    )
