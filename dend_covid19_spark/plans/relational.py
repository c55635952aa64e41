"""Relational breadth: joins beyond J1, aggregations, windows, sort/limit,
set operations (SURVEY.md §2.3/§2.5 — the reference has only one inner
join and zero window/sort/limit/set ops; the driver's star schema
exercises all of them, per §7 Phase 2.3).

Scale notes repeated per query; the common themes:
  - dimension tables (region/nation/supplier/part) are broadcast — never
    shuffled;
  - fact-fact joins (orders⋈lineitem) shuffle on the join key once, and
    aggregations that follow reuse that partitioning where possible;
  - top-k uses orderBy().limit(k) which Spark executes as TakeOrdered
    (per-partition heaps + merge on driver: O(n) scan, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from .parity import _sql_davg, _sql_dsum, davg, dsum
from .registry import query

# ---------------------------------------------------------------------------
# TPC-H-shaped aggregation + join queries (bench headliners)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity')} AS sum_qty,
       {_sql_dsum('l_extendedprice')} AS sum_base_price,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', scale=6)} AS sum_disc_price,
       {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', scale=6)} AS sum_charge,
       {_sql_davg('l_quantity')} AS avg_qty,
       {_sql_davg('l_extendedprice')} AS avg_price,
       {_sql_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan → partial+final hash aggregate.

    At 100 TB this is the canonical map-side-combine query: the shuffle
    carries |returnflag×linestatus| rows per task. The shipdate predicate
    and 9-column projection push into the parquet scan.
    """
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=6).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', scale=6)} AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.

    customer (filtered on segment) broadcasts into orders; the surviving
    orders join lineitem on the shuffle key l_orderkey. The final top-10
    is TakeOrdered — no global sort. Tie-break on l_orderkey keeps the
    limit set deterministic for the oracle.
    """
    cust = load_table(spark, "customer", sf_dir).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00"))
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1997-01-01 00:00:00"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, scale=6).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', scale=6)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join with broadcast dimensions.

    supplier/nation/region are broadcast (hinted — at 100 TB statistics
    may be stale, the hint keeps the plan honest); the only shuffle joins
    are the fact-fact orders⋈lineitem. The c_nationkey = s_nationkey
    'local supplier' predicate rides on the broadcast join condition.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, scale=6).alias("revenue"))
    )


@query(
    "agg_stats_by_nation",
    oracle=f"""
SELECT n_name,
       count(*) AS customer_cnt,
       {_sql_davg('c_acctbal')} AS avg_acctbal,
       round(min(c_acctbal), 2) AS min_acctbal,
       round(max(c_acctbal), 2) AS max_acctbal,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS segment_cnt
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def agg_stats_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation breadth: count/avg/min/max/count-distinct per group,
    through a broadcast dim join. min/max of 2-decimal doubles are exact;
    avg uses the decimal-stabilized sum."""
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_cnt"),
            davg("c_acctbal").alias("avg_acctbal"),
            F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
            F.countDistinct("c_mktsegment").alias("segment_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Join-type breadth (left outer / semi / anti / cross)
# ---------------------------------------------------------------------------


@query(
    "join_left_outer",
    oracle=f"""
SELECT c_custkey, c_mktsegment,
       coalesce(a.order_cnt, 0) AS order_cnt,
       round(coalesce(a.total_spent, 0.0), 2) AS total_spent
FROM customer
LEFT JOIN (
    SELECT o_custkey, count(*) AS order_cnt,
           {_sql_dsum('o_totalprice')} AS total_spent
    FROM orders GROUP BY o_custkey
) a ON c_custkey = a.o_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join against a pre-aggregated fact side.

    Aggregate-before-join: the outer join sees |customers| × |custkeys|
    rows, not raw orders — the same shape that keeps a 100 TB fact join
    shuffle-light.
    """
    cust = load_table(spark, "customer", sf_dir)
    agg = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dsum("o_totalprice").alias("total_spent"),
        )
    )
    return cust.join(agg, cust.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        F.round(F.coalesce("total_spent", F.lit(0.0)), 2).alias("total_spent"),
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 open order. Spark's left_semi
    short-circuits on first match — no fact-side duplication."""
    cust = load_table(spark, "customer", sf_dir)
    open_orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderstatus") == "O"
    )
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers who never placed an urgent order."""
    cust = load_table(spark, "customer", sf_dir)
    urgent = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross_small",
    oracle="""
SELECT r_name, seg.c_mktsegment
FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
""",
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dimensions (the only safe cross-join shape
    at scale: both sides bounded, result |regions|×|segments|)."""
    region = load_table(spark, "region", sf_dir)
    segs = load_table(spark, "customer", sf_dir).select("c_mktsegment").distinct()
    return region.crossJoin(F.broadcast(segs)).select("r_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# Sort / limit / window / set ops (§2.5 — absent from the reference,
# exposed by the engine)
# ---------------------------------------------------------------------------


@query(
    "top_orders_limit",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def top_orders_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    heaps, driver merge) — O(n) with k-sized state, no full sort even at
    100 TB. Tie-break on key for determinism."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "o_orderpriority",
        )
    )


@query(
    "window_rank_orders",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
       CAST(rn AS INT) AS rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
) t WHERE rn <= 3
""",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-3 via row_number window — the scalable 'top-k per
    group' idiom (single shuffle on the partition key; at extreme skew,
    pre-aggregate or salt the hot key)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "rn",
        )
    )


@query(
    "window_lag_orders",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       round(o_totalprice - lag(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ), 2) AS delta_vs_prev
FROM orders
""",
)
def window_lag_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over an event-time-ordered per-key window (order timeline
    deltas). First row per key yields NULL on both engines."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_vs_prev"),
    )


@query(
    "setops_union_except",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def setops_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) then EXCEPT (distinct), matching SQL left-assoc
    precedence. Spark: union().distinct().subtract()."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    c = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.union(b).distinct().subtract(c)


@query(
    "setops_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_acctbal > 0
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def setops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — customers in credit with an open order."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    a = cust.where(F.col("c_acctbal") > 0).select("c_custkey")
    b = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@query(
    "setops_bag_all",
    oracle="""
SELECT * FROM (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
)
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def setops_bag_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset semantics, duplicates
    preserved by min/difference of per-row counts. Complements the
    distinct variants (setops_union_except/setops_intersect): the ALL
    forms skip the global dedup aggregation, so at scale they are one
    count-aggregate + generate instead of distinct-then-join — cheaper
    and exactly what duplicate-aware pipeline accounting (rows per
    customer, not customers) needs. Parenthesized oracle pins the
    left-assoc grouping so both engines evaluate (A ∩all B) ∖all C.
    """
    orders = load_table(spark, "orders", sf_dir)
    a = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.where(F.col("o_totalprice") > 100000).select("o_custkey")
    c = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b).exceptAll(c)


@query(
    "window_sliding_avg_orders",
    oracle="""
WITH c AS (
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM orders
), f AS (
    SELECT o_custkey, o_orderkey,
           sum(cents) OVER w AS cents3, count(*) OVER w AS n3
    FROM c
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
)
SELECT o_custkey, o_orderkey,
       ((2 * cents3 + n3) // (2 * n3)) / 100.0 AS moving_avg3
FROM f
""",
)
def window_sliding_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame window (ROWS BETWEEN 2 PRECEDING): 3-order moving
    average of spend per customer timeline.

    The average is computed entirely in exact integer cents —
    round-half-up(a/n) == (2a + n) DIV (2n) for positive a — because
    frame-sum/count division in either decimal or double space rounds
    differently per engine for exact half-cent quotients (sum of two
    2-decimal prices / 2 lands on .xx5 routinely). The final /100.0 is
    one exact-input IEEE division, identical everywhere."""
    orders = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    cents3 = F.sum(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    ).over(w)
    n3 = F.count(F.lit(1)).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (cents3 * 2 + n3).alias("num"),
        (n3 * 2).alias("den"),
    ).select(
        "o_custkey",
        "o_orderkey",
        (F.expr("num DIV den") / F.lit(100.0)).alias("moving_avg3"),
    )


@query(
    "window_ntile_customers",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
       round(cume_dist() OVER (ORDER BY c_acctbal DESC, c_custkey), 6) AS cume
FROM customer
""",
)
def window_ntile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-ordering analytics: ntile quartiles + cume_dist over the
    balance ranking (fully deterministic — ties broken by key), computed
    WITHOUT an un-partitioned window.

    ``Window.orderBy(...)`` with no partition key is a single-reducer
    sort — the plan that dies at 100x scale (and the global plan sweep
    now forbids it). Instead this uses the classic distributed ranking:

      1. range-bucket rows by approx quantile cutoffs of c_acctbal
         (cutoff list is O(1), fetched driver-side like Spark's own
         range-partitioned orderBy sampling);
      2. row_number within each bucket — a PARTITIONED window, parallel
         across buckets;
      3. per-bucket counts (tiny agg, collected — |buckets| rows) give
         each bucket's global offset; exact global rank = offset + rn;
      4. ntile(4)/cume_dist are closed forms of (rank, n): bucket sizes
         differ by at most one (first n%4 buckets get the extra row),
         cume = rank/n since the tie-broken order is total.

    Buckets are keyed only by c_acctbal, so equal balances share a
    bucket and the bucket order is consistent with the global order;
    within-bucket ties then break on c_custkey exactly as the oracle's
    ORDER BY does. Result is bit-identical to the single-window form.
    """
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    probs = [i / 16.0 for i in range(1, 16)]
    cuts = sorted(set(cust.approxQuantile("c_acctbal", probs, 0.01)))
    cuts_arr = "array({})".format(
        ", ".join(f"CAST({c!r} AS DOUBLE)" for c in cuts)
    )
    # bucket = #cutoffs >= value: descending balances land in ascending
    # bucket ids, matching the DESC sort direction.
    bucketed = cust.withColumn(
        "bucket",
        F.expr(f"size(filter({cuts_arr}, c -> c >= CAST(c_acctbal AS DOUBLE)))"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    ranked = bucketed.withColumn("rn", F.row_number().over(w))
    counts = sorted(
        (r["bucket"], r["cnt"])
        for r in ranked.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    n = sum(c for _, c in counts)
    offsets, acc = {}, 0
    for b, c in counts:
        offsets[b] = acc
        acc += c
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "bucket int, offset long"
    )
    base, rem = n // 4, n % 4
    rank = F.col("offset") + F.col("rn")
    head = rem * (base + 1)  # rows covered by the (base+1)-sized buckets
    quartile = F.when(
        rank <= F.lit(head), F.expr(f"CAST((offset + rn + {base}) DIV {base + 1} AS INT)")
    ).otherwise(
        F.expr(f"CAST({rem} + (offset + rn - {head} + {max(base, 1) - 1}) DIV {max(base, 1)} AS INT)")
    )
    return (
        ranked.join(F.broadcast(off_df), "bucket")
        .select(
            "c_custkey",
            quartile.alias("balance_quartile"),
            F.round(rank.cast("double") / F.lit(float(n)), 6).alias("cume"),
        )
    )


@query(
    "lateral_top_orders_per_nation",
    oracle="""
SELECT n_name, o_orderkey, o_totalprice
FROM nation,
LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders JOIN customer ON c_custkey = o_custkey
    WHERE c_nationkey = n_nationkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 3
) top_orders
""",
)
def lateral_top_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the per-row top-k idiom in its SQL
    form: for each nation, its 3 highest-value orders. Catalyst
    decorrelates the LIMIT-per-group into a partitioned rank window
    (DomainJoin rewrite), so the executed plan is the same shuffle-once
    window top-k a hand-written DataFrame version produces — no
    per-nation re-execution, which is what a naive nested-loop LATERAL
    would mean at scale.

    Scale: one customer⋈orders broadcast join, one exchange on the
    correlation key, one window; |nations| never drives job count.
    (o_totalprice DESC, o_orderkey) is a total order so the LIMIT-3 cut
    is deterministic in both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, o_orderkey, o_totalprice
        FROM nation,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_nationkey = n_nationkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) top_orders
        """
    )
