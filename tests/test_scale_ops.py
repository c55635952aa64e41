"""Scale-technique operators: salted aggregation must be semantically
identical to the plain group-by; bucketed joins must plan without
exchanges (the co-location is real, not aspirational)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dend_covid19_spark.catalog import load_table
from dend_covid19_spark.operators.scale import (
    bucketed_join,
    salted_aggregate,
    write_bucketed,
)
from tests.conftest import SF_DIR


def test_salted_aggregate_matches_plain(spark):
    ev = load_table(spark, "events", SF_DIR)
    salted = salted_aggregate(
        ev,
        ["event_type"],
        {
            "cnt": (F.count(F.lit(1)), "count"),
            "total": (F.sum(F.col("value").cast("decimal(18,2)")), "sum"),
            "max_value": (F.max("value"), "max"),
        },
        salt_buckets=8,
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        F.max("value").alias("max_value"),
    )
    s = {r.event_type: (r.cnt, r.total, r.max_value) for r in salted.collect()}
    p = {r.event_type: (r.cnt, r.total, r.max_value) for r in plain.collect()}
    assert s == p


def test_salted_aggregate_rejects_nonalgebraic(spark):
    import pytest

    ev = load_table(spark, "events", SF_DIR)
    with pytest.raises(ValueError):
        salted_aggregate(ev, ["event_type"], {"bad": (F.avg("value"), "avg")})


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, "orders", SF_DIR)
    li = load_table(spark, "lineitem", SF_DIR)
    write_bucketed(orders, "orders_b", "o_orderkey", num_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale the planner would broadcast (and skip bucketing);
        # disable broadcast to exercise the co-located SMJ path that a
        # fact-fact join takes at 100 TB
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "orders_b", "lineitem_b", on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        assert "SortMergeJoin" in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
