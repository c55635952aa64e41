"""Validity-precondition pins for the aggregate plans (r5 ADVICE items):

- percentile_approx's "exact discrete quantile, hash-identical to
  DuckDB quantile_disc" convention only holds while per-group
  cardinality stays under ~PCTL_ACCURACY — pin the headroom so a data
  regeneration or sf bump that breaches it fails HERE with a clear
  message instead of as an opaque hash mismatch in the driver report.
- referential_integrity_check claims one fact-table scan per
  relationship — pin the scan count so a refactor back to the
  anti-join + separate-count form (two scans) is caught.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dend_covid19_spark.catalog import load_table
from dend_covid19_spark.plans.aggregates import (
    PCTL_ACCURACY,
    referential_integrity_check,
)
from tests.conftest import SF_DIR


def test_percentile_accuracy_headroom(spark):
    """Every percentile_approx group in this module must sit well below
    the accuracy parameter (10x headroom at test scale; the driver's
    sf0.01 and sf0.1 are 10x/100x this, still inside the bound). The
    grouped sites are events.value by event_type and orders revenue by
    customer (ungrouped = the whole-table cardinality)."""
    ev_max = (
        load_table(spark, "events", SF_DIR)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    orders_n = load_table(spark, "orders", SF_DIR).count()
    # driver max scale is sf0.1 = 100x sf0.001; require 100x headroom
    # at this scale so the convention provably holds at every scale the
    # driver checks.
    assert ev_max * 100 <= PCTL_ACCURACY, (
        f"events per-type cardinality {ev_max} too close to "
        f"PCTL_ACCURACY={PCTL_ACCURACY}: the exact-quantile convention "
        "is no longer guaranteed — raise PCTL_ACCURACY or switch to the "
        "two-pass exact-cutoff pattern"
    )
    assert orders_n * 100 <= PCTL_ACCURACY, (orders_n, PCTL_ACCURACY)


def test_referential_integrity_single_scan_per_relationship(spark):
    """The one-pass form: lineitem backs three relationships and orders
    backs two (one as fact, one as dimension key set) — the plan must
    contain exactly that many scans of each, not the doubled count the
    anti-join + separate-count form pays."""
    df = referential_integrity_check(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    li_scans = len(re.findall(r"lineitem\.parquet", plan))
    o_scans = len(re.findall(r"orders\.parquet", plan))
    assert li_scans == 3, f"expected 3 lineitem scans, plan has {li_scans}"
    assert o_scans == 2, f"expected 2 orders scans, plan has {o_scans}"


def test_cms_estimate_never_undercounts(spark):
    """The Count-Min guarantee: est >= exact for every key (counters
    only ever absorb extra collisions). With W deliberately small,
    collisions must actually occur at test scale — otherwise the audit
    is vacuous and the overcount column untested."""
    from dend_covid19_spark.plans.aggregates import cms_heavy_hitters_audit

    rows = cms_heavy_hitters_audit(spark, SF_DIR).collect()
    assert rows
    assert all(r.overcount >= 0 for r in rows)
    assert any(r.overcount > 0 for r in rows), (
        "no collisions at the demo width — widen the test corpus or shrink the sketch"
    )


def test_rfm_recency_buckets_near_equal(spark):
    """Quantile-cutoff scoring must produce near-quintile buckets: each
    r_score's customer count stays within the slack that cutoff-value
    ties allow (the documented deviation from exact ntile)."""
    from dend_covid19_spark.plans.aggregates import rfm_segments

    rows = rfm_segments(spark, SF_DIR).collect()
    per_r = {}
    for r in rows:
        per_r[r.r_score] = per_r.get(r.r_score, 0) + r.n_customers
    total = sum(per_r.values())
    assert set(per_r) == {1, 2, 3, 4, 5}
    for score, cnt in per_r.items():
        assert abs(cnt - total / 5) <= 0.1 * total, (score, cnt, total)


def test_skyline_equals_bruteforce_dominance(spark):
    """The distributed prefix-scan skyline must equal the definitional
    anti-join form: a customer is on the frontier iff NO other customer
    weakly dominates them on (cents, rdays) with one strict improvement."""
    from pyspark.sql import functions as F

    from dend_covid19_spark.plans.aggregates import _RFM_EPOCH, skyline_customers

    got = {
        (r.o_custkey, r.cents, r.rdays)
        for r in skyline_customers(spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    base = o.groupBy("o_custkey").agg(
        F.expr(
            "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("cents"),
        F.expr(
            f"CAST(datediff(max(o_orderdate), DATE '{_RFM_EPOCH}') AS BIGINT)"
        ).alias("rdays"),
    )
    pts = [(r.o_custkey, r.cents, r.rdays) for r in base.collect()]
    want = {
        (c, s, d)
        for c, s, d in pts
        if not any(
            s2 >= s and d2 >= d and (s2 > s or d2 > d) for _, s2, d2 in pts
        )
    }
    assert got == want and got


def test_pii_patterns_detect_and_agree(spark, duck):
    """The registered corpus audit legitimately reports zeros (the
    synthetic corpus is PII-free) — so the pattern machinery itself is
    exercised here on planted PII, and the two dialects must agree on
    every count (Java regex vs RE2 divergence would silently skew the
    audit)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dend_covid19_spark.plans.textops import PII_PATTERNS

    texts = [
        "contact me at Jane.Doe+spam@Example-Mail.org or jd@x.io today",
        "see https://docs.example.com/a_b/c-d and HTTP://WWW.FOO.NET/x",
        "card 4111111111111111 pin 123 id 987654 ok",
        "no pii here at all",
        "",
    ]
    expected = {
        "email": [2, 0, 0, 0, 0],
        "url": [0, 2, 0, 0, 0],
        "long_number": [0, 0, 2, 0, 0],
    }
    sdf = spark.createDataFrame(pd.DataFrame({"text": texts}))
    for name, pat in PII_PATTERNS.items():
        got_spark = [
            r.n
            for r in sdf.select(
                F.expr(f"regexp_count(lower(text), '{pat}')").alias("n")
            ).collect()
        ]
        duck.register("_pii_t", pd.DataFrame({"text": texts}))
        got_duck = [
            r[0]
            for r in duck.execute(
                f"SELECT len(regexp_extract_all(lower(text), '{pat}')) FROM _pii_t"
            ).fetchall()
        ]
        assert got_spark == expected[name], (name, got_spark)
        assert got_duck == expected[name], (name, got_duck)


def test_negative_sampling_properties(spark):
    """Every user must receive exactly K negatives, none of which is a
    true interaction — the starvation case the docstring documents must
    not occur at tested scales (if it ever does, the threshold-doubling
    loop becomes required, and this fails loudly first)."""
    from pyspark.sql import functions as F

    from dend_covid19_spark.plans.llm_pipeline import (
        NEG_SAMPLES_PER_USER,
        negative_sampling_per_user,
    )

    neg = negative_sampling_per_user(spark, SF_DIR)
    per_user = neg.groupBy("user_id").agg(F.count(F.lit(1)).alias("k")).collect()
    assert per_user and all(r.k == NEG_SAMPLES_PER_USER for r in per_user)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    ui = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id")
        )
        .distinct()
    )
    leaked = neg.join(ui, ["user_id", "item_id"]).count()
    assert leaked == 0


def test_corpus_funnel_monotone_and_partitioned(spark):
    """Funnel algebra: every stage can only shrink the corpus
    (raw >= quality >= dedup >= clean, docs and chars alike), and the
    three splits partition the clean stage exactly."""
    from dend_covid19_spark.plans.llm_pipeline import training_corpus_funnel

    rows = {r.stage: (r.n_docs, r.n_chars) for r in
            training_corpus_funnel(spark, SF_DIR).collect()}
    for earlier, later in (("raw", "quality"), ("quality", "dedup"), ("dedup", "clean")):
        assert rows[earlier][0] >= rows[later][0], (earlier, later, rows)
        assert rows[earlier][1] >= rows[later][1], (earlier, later, rows)
    split_docs = sum(v[0] for k, v in rows.items() if k.startswith("split:"))
    split_chars = sum(v[1] for k, v in rows.items() if k.startswith("split:"))
    assert (split_docs, split_chars) == rows["clean"]
    assert rows["clean"][0] > 0
