"""Properties of the round-11 curation rows: DSIR selection, CCNet
perplexity buckets, cluster-balanced sampling, the TV drift monitor,
and cross-modal dedup verification (all also value-hash-checked against
their DuckDB oracles by the driver; these pin the semantics the hash
alone wouldn't explain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_dsir_selection_invariants(spark):
    from dend_covid19_spark.plans.llm_pipeline import (
        DSIR_TARGET_SOURCE,
        DSIR_TOP_K,
        dsir_importance_select,
    )

    out = dsir_importance_select(spark, SF_DIR).localCheckpoint()
    rows = out.collect()
    assert 0 < len(rows) <= DSIR_TOP_K
    # scores are non-negative exact integers and every doc is distinct
    assert all(r.dsir_score_ppm >= 0 and r.n_feats > 0 for r in rows)
    assert len({r.doc_id for r in rows}) == len(rows)
    from dend_covid19_spark.catalog import load_table

    docs = load_table(spark, "documents", SF_DIR)
    # target-affinity sanity: docs from the target source score at
    # least as high on average as the corpus at large (they define the
    # target distribution, so their own features carry high ratios)
    scored = out.join(
        docs.select("doc_id", "source"), "doc_id"
    )
    tgt = scored.where(F.col("source") == DSIR_TARGET_SOURCE)
    if tgt.count() > 0:
        tgt_mean = tgt.agg(F.avg("dsir_score_ppm")).first()[0]
        all_mean = out.agg(F.avg("dsir_score_ppm")).first()[0]
        assert tgt_mean >= all_mean


def test_ccnet_buckets_invariants(spark):
    from dend_covid19_spark.plans.textops import (
        bigram_lm_doc_score,
        ccnet_perplexity_buckets,
    )

    out = ccnet_perplexity_buckets(spark, SF_DIR).localCheckpoint()
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    scored = bigram_lm_doc_score(spark, SF_DIR)
    n_scored = scored.count()
    assert sum(r.n_docs for r in rows) == n_scored
    for lang, buckets in by_lang.items():
        # NTILE(3): tercile sizes differ by at most one
        sizes = [b.n_docs for b in buckets.values()]
        assert max(sizes) - min(sizes) <= 1
        # ordering: head scores >= middle scores >= tail scores
        if "head" in buckets and "middle" in buckets:
            assert buckets["head"].min_score_ppm >= buckets["middle"].max_score_ppm
        if "middle" in buckets and "tail" in buckets:
            assert buckets["middle"].min_score_ppm >= buckets["tail"].max_score_ppm


def test_cluster_balanced_sample_invariants(spark):
    from dend_covid19_spark.operators.kmeans import (
        BALANCE_SCALE_PPM,
        K,
        cluster_balanced_sample,
    )

    rows = cluster_balanced_sample(spark, SF_DIR).collect()
    assert 0 < len(rows) <= K
    total = sum(r.n_vecs for r in rows)
    target = total // K
    for r in rows:
        # downsample-only: kept never exceeds size, rate never exceeds 1
        assert 0 <= r.n_kept <= r.n_vecs
        assert 0 < r.weight_ppm <= BALANCE_SCALE_PPM
        # clusters at-or-below the uniform target keep everything
        if r.n_vecs <= target:
            assert r.weight_ppm == BALANCE_SCALE_PPM
            assert r.n_kept == r.n_vecs
        else:
            assert r.weight_ppm == target * BALANCE_SCALE_PPM // r.n_vecs


def test_drift_monitor_invariants(spark):
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.timeseries import events_type_drift_tv

    out = events_type_drift_tv(spark, SF_DIR).localCheckpoint()
    rows = out.collect()
    assert rows, "drift monitor returned no days"
    # TV distance is a ppm in [0, 1e6]; moved-type count is bounded by
    # the type alphabet
    ev = load_table(spark, "events", SF_DIR)
    n_types = ev.select("event_type").distinct().count()
    n_days = ev.select(F.to_date(F.date_trunc("day", "ts"))).distinct().count()
    for r in rows:
        assert 0 <= r.tv_ppm <= 1_000_000
        assert 0 <= r.n_types_moved <= n_types
    # the first day has no predecessor and must be absent
    assert len(rows) == n_days - 1
    first_day = ev.agg(
        F.min(F.to_date(F.date_trunc("day", "ts")))
    ).first()[0]
    assert all(r.day != first_day for r in rows)


def test_crossmodal_verify_matches_lsh_candidates(spark):
    from dend_covid19_spark.operators.dedup import (
        dedup_crossmodal_verify,
        dedup_minhash_lsh,
    )

    cm = dedup_crossmodal_verify(spark, SF_DIR).localCheckpoint()
    lsh = dedup_minhash_lsh(spark, SF_DIR)
    # the verified pair set IS the LSH pair set (verification annotates,
    # never adds or drops pairs), with identical jaccard estimates
    a = {(r.doc_a, r.doc_b, r.est_jaccard) for r in cm.collect()}
    b = {(r.doc_a, r.doc_b, r.est_jaccard) for r in lsh.collect()}
    assert a == b
    # the verdict is exactly the documented threshold on the emitted cosine
    from dend_covid19_spark.operators.dedup import CROSSMODAL_COS_T

    t = float(CROSSMODAL_COS_T)
    for r in cm.collect():
        assert r.confirmed == (r.cosine >= t)


def test_winnowing_invariants(spark):
    from dend_covid19_spark.operators.dedup import (
        WINNOW_MIN_SHARED,
        dedup_winnowing_fingerprints,
    )

    rows = dedup_winnowing_fingerprints(spark, SF_DIR).collect()
    assert rows, "no clone pairs found"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.n_shared >= WINNOW_MIN_SHARED


def test_winnowing_guarantee_shared_run_yields_fingerprint(spark):
    """The paper's coverage guarantee: two texts sharing a contiguous
    run of >= w + k - 1 tokens share at least one winnowing
    fingerprint. Checked on a synthetic pair whose only commonality is
    exactly such a run."""
    from dend_covid19_spark.functions import hashing as H
    from dend_covid19_spark.operators.dedup import WINNOW_K, WINNOW_W

    run = " ".join(f"shared{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    df = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {run} delta epsilon"),
            (2, f"one two three four {run} five six seven"),
        ],
        "doc_id long, text string",
    )
    kgram_hash = H.spark_hash32(
        f"concat_ws(' ', slice(split(text, ' '), i, {WINNOW_K}))"
    )
    from pyspark.sql import functions as F2

    fps = df.select(
        "doc_id",
        F2.expr(
            f"transform(sequence(1, size(split(text, ' ')) - {WINNOW_K} + 1),"
            f" i -> {kgram_hash})"
        ).alias("hs"),
    ).select(
        "doc_id",
        F2.explode(
            F2.expr(
                f"array_distinct(transform(sequence(1, size(hs) - {WINNOW_W} + 1),"
                f" j -> array_min(slice(hs, j, {WINNOW_W}))))"
            )
        ).alias("fp"),
    )
    a = fps.where("doc_id = 1").select(F2.col("fp").alias("fp_a"))
    b = fps.where("doc_id = 2").select(F2.col("fp").alias("fp_b"))
    shared = a.join(b, a.fp_a == b.fp_b).count()
    assert shared >= 1


def test_funnel_sequence_semantics(spark):
    """Drills the properties that make the funnel a SEQUENCE operator:
    (a) a purchase before the first view never counts; (b) an expired
    conversion window is never revived by a later event; (c) ts ties
    break on event_id so the fold is deterministic."""
    from pyspark.sql import functions as F

    from dend_covid19_spark.plans.timeseries import (
        FUNNEL_WINDOW_MIN,
        funnel_stages_over,
    )

    m = FUNNEL_WINDOW_MIN
    rows = [
        # user 1: purchase BEFORE view -> stage stops at 2 (click in window)
        (1, "2024-01-01 00:00:00", 10, "purchase"),
        (1, "2024-01-01 01:00:00", 11, "view"),
        (1, "2024-01-01 01:10:00", 12, "click"),
        # user 2: full in-window chain -> 3
        (2, "2024-01-01 00:00:00", 20, "view"),
        (2, "2024-01-01 00:10:00", 21, "click"),
        (2, "2024-01-01 00:20:00", 22, "purchase"),
        # user 3: click arrives AFTER the window -> stuck at 1 forever
        (3, "2024-01-01 00:00:00", 30, "view"),
        (3, f"2024-01-0{1 + (m // 1440) + 1} 00:00:01", 31, "click"),
        (3, f"2024-01-0{1 + (m // 1440) + 1} 00:00:02", 32, "purchase"),
        # user 4: ts tie between view and click — event_id orders view
        # first, so the click (same ts, higher id) counts -> 2
        (4, "2024-01-01 00:00:00", 40, "view"),
        (4, "2024-01-01 00:00:00", 41, "click"),
        # user 5: never views -> 0
        (5, "2024-01-01 00:00:00", 50, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.stage: r.n_users for r in funnel_stages_over(ev).collect()
    }
    # recompute expected per the documented semantics
    assert got == {0: 1, 1: 1, 2: 2, 3: 1}, got
