"""Advanced join operators Spark has no native form for (north-star:
'when the reference has an operator Spark lacks — compose existing
DataFrame ops if semantics allow'): as-of join and range (interval)
join, both composed from equi-joins + windows so Catalyst plans them
with ordinary shuffles.

Scale notes:
  - as-of join: implemented as filtered equi-join on the entity key +
    per-left-row row_number. Cost is bounded by per-key right-side
    fan-out. For unbounded fan-out, switch to the union-merge trick
    (tag both sides, union, last_value over a key/time window) — same
    semantics, one sort per key, no pair materialization.
  - range join: a point-in-interval join against a *bucketable* interval
    table becomes a pure equi-join on the bucket id — O(n) instead of a
    nested-loop BETWEEN. The generic BETWEEN fallback stays available
    via crossJoin for tiny interval sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from ..catalog import load_table
from ..plans.registry import query
from ..sources.readers import from_rows


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    tie_break: str,
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row with
    right_time <= left_time for the same ``on`` key (ties on right_time
    broken by descending ``tie_break`` for reproducibility). Left rows
    with no match are kept with NULL right columns."""
    j = left.join(right, on=on, how="left").where(
        F.col(right_time).isNull() | (F.col(right_time) <= F.col(left_time))
    )
    w = Window.partitionBy(*left.columns).orderBy(
        F.col(right_time).desc_nulls_last(), F.col(tie_break).desc_nulls_last()
    )
    return j.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop(
        "__rn"
    )


@query(
    "asof_join_latest_order",
    oracle="""
WITH ranked AS (
    SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS event_date,
           o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
           row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
           ) AS rn
    FROM events e
    LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, event_date, o_orderkey, order_date
FROM ranked WHERE rn = 1
""",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order at
    event time (the classic trades⋈quotes shape). Single shuffle on the
    entity key; per-event candidates collapse via row_number."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    j = ev.join(orders, ev.user_id == orders.o_custkey, "left").where(
        F.col("o_orderdate").isNull() | (F.col("o_orderdate") <= F.col("ts"))
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc_nulls_last()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.to_date("ts").alias("event_date"),
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
        )
    )


VALUE_TIERS = [(i, float(i * 100), float((i + 1) * 100)) for i in range(6)]


@query(
    "range_join_value_tiers",
    oracle=f"""
WITH tiers AS (
    SELECT * FROM (VALUES {", ".join(f"({t}, {lo}, {hi})" for t, lo, hi in VALUE_TIERS)})
    AS t(tier, lo, hi)
)
SELECT t.tier, count(*) AS cnt,
       round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier
""",
)
def range_join_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join rewritten as an equi-join: tier
    intervals are uniform [k*100, (k+1)*100), so bucket = floor(value /
    100) joins exactly — no BETWEEN nested loop, scales as an ordinary
    hash join. The oracle states the BETWEEN semantics; the engine proves
    the bucketed rewrite is equivalent."""
    ev = load_table(spark, "events", sf_dir)
    tiers = from_rows(
        spark,
        [(t, lo, hi) for t, lo, hi in VALUE_TIERS],
        "tier int, lo double, hi double",
    )
    bucketed = ev.withColumn("tier_key", F.floor(F.col("value") / 100).cast("int"))
    return (
        bucketed.join(F.broadcast(tiers), bucketed.tier_key == tiers.tier)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
    )


def range_join_generic(
    points: DataFrame, intervals: DataFrame, point: Column, lo: Column, hi: Column
) -> DataFrame:
    """Generic BETWEEN range join (broadcast nested loop) for interval
    sets too irregular to bucket — only safe when ``intervals`` is small
    enough to broadcast."""
    return points.join(F.broadcast(intervals), (point >= lo) & (point < hi))


@query(
    "fuzzy_join_parts",
    oracle="""
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b, a.p_brand,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
)
def fuzzy_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) self-join — the entity-resolution shape:
    candidate pairs come from an EQUI-join on a blocking key (brand), and
    the expensive levenshtein predicate runs only inside blocks, exactly
    the block-then-verify discipline the LSH dedup family uses for text.
    An unblocked fuzzy join is a cartesian product; the block key is what
    makes it a hash join Catalyst can shuffle on.

    Scale: cost is sum over blocks of |block|^2 string compares — bound
    the block size like _bounded_blocks does for embedding dedup (salt
    oversized blocks, or add a second key such as name-length bucket to
    the block) and the shape survives any corpus size. levenshtein is
    JVM codegen (no UDF); the p_partkey ordering halves the pair count
    and makes output deterministic."""
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_name", "p_brand")
    a = part.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        "p_brand",
    )
    b = part.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand_b"),
    )
    return (
        a.join(b, (a.p_brand == b.brand_b) & (a.part_a < b.part_b))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("dist") <= 3)
        .select("part_a", "part_b", "p_brand", "dist")
    )
