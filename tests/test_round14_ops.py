"""Round-14 surfaces: the split exact+sketch hourly agg, the
materialized decon bloom words, and the cross-process decon scratch."""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
from conftest import SF_DIR


def test_decon_bloom_words_cache_is_value_identical(spark):
    """The materialized packed bloom words must equal a fresh
    derivation from the bench slice exactly — xxhash64 positions and
    bit_or packing are integer arithmetic, so cross-process reuse is
    bit-identical by construction, and a stale/wrong artifact would
    change the gate's pruning (never its output, bloom = no false
    negatives — which is why this is pinned at the words level, where
    a regression is visible)."""
    from dend_covid19_spark.plans.llm_pipeline import (
        DECON_MOD,
        _bloom_words,
        _decon_bloom_words,
        _decon_shingle_hashes,
    )

    sh = _decon_shingle_hashes(spark, SF_DIR)
    bench = sh.where(F.col("doc_id") % DECON_MOD == 0).select("gh")
    fresh = sorted(map(tuple, _bloom_words(bench).collect()))
    cached = sorted(map(tuple, _decon_bloom_words(spark, SF_DIR).collect()))
    assert cached == fresh and len(fresh) > 0


def test_decon_scratch_is_cross_process_keyed(spark):
    """The decon contamination index must be reusable by the NEXT
    process (maintained-index semantics): its scratch parent carries no
    pid in the name and no owner.pid marker, so gc_scratch age-gates it
    instead of reaping it at writer exit."""
    from dend_covid19_spark.plans.llm_pipeline import (
        _decon_scratch_parent,
        _decon_shingle_hashes,
    )

    _decon_shingle_hashes(spark, SF_DIR)  # ensure built
    parent = _decon_scratch_parent(SF_DIR)
    assert not re.search(rf"_{os.getpid()}$", parent)
    assert not os.path.exists(os.path.join(parent, "owner.pid"))
    assert os.path.exists(os.path.join(parent, "gh", "_SUCCESS"))


def test_hourly_approx_plan_has_no_expand(spark):
    """r13 profiled perf fix: mixing countDistinct with
    approx_count_distinct in one agg forces Catalyst's Expand
    multi-distinct path (each input row duplicated per distinct group,
    a 16 KB rsd=0.01 HLL buffer riding every expanded aggregation row
    through the shuffle). The split form must plan with NO Expand node
    and broadcast the ~720-row sketch side back onto the exact side."""
    from dend_covid19_spark.plans.timeseries import (
        events_hourly_activity_approx,
    )

    df = events_hourly_activity_approx(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, f"multi-distinct Expand path resurfaced\n{plan}"
    assert "BroadcastHashJoin" in plan, f"sketch side not broadcast\n{plan}"


def test_hourly_approx_matches_single_agg_form(spark):
    """The split form is a plan restructuring only: values must equal
    the original single-agg form row-for-row."""
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.timeseries import (
        events_hourly_activity_approx,
    )

    ev = load_table(spark, "events", SF_DIR)
    single = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").alias("exact_users"),
            (
                F.abs(
                    F.approx_count_distinct("user_id", 0.01)
                    - F.countDistinct("user_id")
                )
                <= 0.15 * F.countDistinct("user_id")
            ).alias("estimate_ok"),
        )
        .select(
            F.col("w.start").alias("hour_ts"), "cnt", "exact_users", "estimate_ok"
        )
    )
    got = sorted(map(tuple, events_hourly_activity_approx(spark, SF_DIR).collect()))
    want = sorted(map(tuple, single.collect()))
    assert got == want and len(got) > 0


def test_funnel_staged_files_have_strictly_increasing_mtimes(spark):
    """r13 advice: the file stream source orders files by ms-granularity
    mtime and the stateful funnel is order-sensitive — the plan must pin
    strictly increasing mtimes on its staged micro-batch files, not rely
    on write-completion timing."""
    from dend_covid19_spark.plans.ingest import streaming_funnel_executed

    streaming_funnel_executed(spark, SF_DIR)  # stages + drains (cached)
    import glob

    roots = glob.glob("/tmp/spark_graft_ingest/streamfunnel_*/src")
    assert roots, "funnel staging dir not found"
    src = max(roots, key=os.path.getmtime)
    files = sorted(glob.glob(os.path.join(src, "p*.parquet")))
    assert len(files) >= 2
    mtimes = [os.path.getmtime(p) for p in files]
    assert all(b > a for a, b in zip(mtimes, mtimes[1:])), mtimes
