"""Round-12 additions: the servable IVF multi-probe ANN index with its
PINNED recall floor (the r11 verdict's top perf-quality item), plus the
operators added later in the round. Each row gets oracle parity (the
driver's check, at the fixture SF) plus the invariants the oracle alone
can't pin."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by later tests)

from dend_covid19_spark.plans.registry import get_spec

from conftest import SF_DIR, assert_matches_oracle


def test_ivf_multiprobe_recall_oracle_parity(spark, duck):
    from dend_covid19_spark.operators.similarity import ann_ivf_multiprobe_recall

    assert_matches_oracle(
        ann_ivf_multiprobe_recall(spark, SF_DIR),
        duck,
        get_spec("ann_ivf_multiprobe_recall").oracle,
        "ann_ivf_multiprobe_recall",
    )


def test_ivf_multiprobe_recall_floor(spark):
    """The production-recall pin: mean recall@10 of the trained-codebook
    IVF index at nprobe=6 must clear 800000 ppm — the 'would we serve
    this index' bar the r11 verdict asked for (the sign-LSH audit row
    measures 0-10% on this corpus; this is the index that replaces it).
    Measured at design time: 920000 ppm at sf0.01, 840000 ppm at sf0.1."""
    from dend_covid19_spark.operators.similarity import (
        RECALL_K,
        RECALL_QUERY_IDS,
        ann_ivf_multiprobe_recall,
    )

    rows = ann_ivf_multiprobe_recall(spark, SF_DIR).collect()
    from dend_covid19_spark.catalog import load_table

    corpus_n = load_table(spark, "embeddings", SF_DIR).count()
    assert {r.query_id for r in rows} == set(RECALL_QUERY_IDS)
    total_hits = sum(r.n_hits for r in rows)
    mean_recall_ppm = total_hits * 1_000_000 // (RECALL_K * len(rows))
    assert mean_recall_ppm >= 800_000, f"recall floor broken: {mean_recall_ppm} ppm"
    for r in rows:
        assert 0 <= r.n_hits <= RECALL_K
        assert r.recall_ppm == r.n_hits * 1_000_000 // RECALL_K
        # the probe set must actually bound the scan: candidates are a
        # strict subset of the corpus (nprobe=6 of 16 cells). Bound
        # derives from the live corpus count, not a literal fixture
        # size, so pointing SF_DIR elsewhere tests the same property
        # (r12 advice 3).
        assert r.n_candidates < 0.8 * corpus_n


def test_prefix_dim_recall_oracle_parity(spark, duck):
    from dend_covid19_spark.operators.similarity import ann_prefix_dim_recall_curve

    assert_matches_oracle(
        ann_prefix_dim_recall_curve(spark, SF_DIR),
        duck,
        get_spec("ann_prefix_dim_recall_curve").oracle,
        "ann_prefix_dim_recall_curve",
    )


def test_prefix_dim_recall_invariants(spark):
    """Recall values are valid ppm of K*|panel|, and the widest prefix
    (closest to the full vector) recalls at least as much as the
    narrowest. Strict per-step monotonicity is NOT a theorem — an
    unlucky middle width can dip — so only the endpoint dominance is
    pinned."""
    from dend_covid19_spark.operators.similarity import (
        PREFIX_DIMS,
        RECALL_K,
        RECALL_QUERY_IDS,
        ann_prefix_dim_recall_curve,
    )

    rows = sorted(
        ann_prefix_dim_recall_curve(spark, SF_DIR).collect(),
        key=lambda r: r.prefix_dims,
    )
    assert [r.prefix_dims for r in rows] == sorted(PREFIX_DIMS)
    cap = RECALL_K * len(RECALL_QUERY_IDS)
    for r in rows:
        assert 0 <= r.n_hits <= cap
        assert r.recall_ppm == r.n_hits * 1_000_000 // cap
    assert rows[0].n_hits <= rows[-1].n_hits, "widest prefix recalls less than narrowest"


def test_group_kfold_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.llm_pipeline import stratified_group_kfold

    assert_matches_oracle(
        stratified_group_kfold(spark, SF_DIR),
        duck,
        get_spec("stratified_group_kfold").oracle,
        "stratified_group_kfold",
    )


def test_group_kfold_disjoint_and_balanced(spark):
    """The CV guarantees the audit row exists for: every user's events
    land in exactly ONE fold (group disjointness — zero identity
    leakage across folds), no fold is empty, and user totals
    partition."""
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.functions import hashing as H
    from dend_covid19_spark.plans.llm_pipeline import (
        KFOLD_K,
        KFOLD_SALT,
        stratified_group_kfold,
    )

    rows = stratified_group_kfold(spark, SF_DIR).collect()
    assert {r.fold for r in rows} == set(range(KFOLD_K))  # no empty fold
    ev = load_table(spark, "events", SF_DIR)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_events for r in rows) == n_events
    assert sum(r.n_users for r in rows) == n_users  # disjoint by construction
    # recompute one fold's assignment independently
    key = f"'{KFOLD_SALT}' || CAST(user_id AS STRING)"
    direct = (
        ev.withColumn("fold", F.expr(f"({H.spark_hash32(key)}) % {KFOLD_K}"))
        .where(F.col("fold") == rows[0].fold)
        .count()
    )
    assert direct == rows[0].n_events


def test_cusum_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.timeseries import events_changepoint_cusum

    assert_matches_oracle(
        events_changepoint_cusum(spark, SF_DIR),
        duck,
        get_spec("events_changepoint_cusum").oracle,
        "events_changepoint_cusum",
    )


def test_cusum_recurrence_mirror(spark):
    """The fold against a local mirror of Page's recurrence on the real
    daily counts."""
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.timeseries import (
        CUSUM_H_UNITS,
        CUSUM_SLACK_UNITS,
        events_changepoint_cusum,
    )
    import math

    ev = load_table(spark, "events", SF_DIR)
    daily = sorted(
        (r.day, r.n)
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    tot = sum(n for _, n in daily)
    nd = len(daily)
    mu = (2 * tot + nd) // (2 * nd)
    sig = math.isqrt(mu)
    sp = sm = 0
    want = {}
    for day, n in daily:
        sp = max(0, sp + (n - mu - CUSUM_SLACK_UNITS * sig))
        sm = max(0, sm + (mu - n - CUSUM_SLACK_UNITS * sig))
        want[day] = (n, sp, sm, sp > CUSUM_H_UNITS * sig or sm > CUSUM_H_UNITS * sig)
    got = {
        r.day: (r.n_events, r.cusum_pos, r.cusum_neg, r.flagged)
        for r in events_changepoint_cusum(spark, SF_DIR).collect()
    }
    assert got == want


def test_cusum_detects_constructed_level_shift(spark):
    """The detection path the corpus can't exercise (no real level
    shift exists, honestly reported): a constructed series that jumps
    +50% halfway must flag after the shift and never before it."""
    import datetime

    from dend_covid19_spark.plans.timeseries import cusum_over_daily

    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), 100) for i in range(10)]
    rows += [(base + datetime.timedelta(days=10 + i), 150) for i in range(10)]
    daily = spark.createDataFrame(rows, "day date, n bigint")
    # calibrate mu/sig on the IN-CONTROL baseline (the first segment),
    # as a deployed CUSUM does — a whole-series mean would sit between
    # the two levels and flag the baseline itself
    st = (
        daily.where(F.col("day") < F.lit(str(base + datetime.timedelta(days=10))))
        .agg(F.expr("(2 * sum(n) + count(*)) DIV (2 * count(*))").alias("mu"))
        .select(
            "mu",
            F.expr("CAST(floor(sqrt(CAST(mu AS DOUBLE))) AS BIGINT)").alias("sig"),
        )
    )
    out = sorted(cusum_over_daily(daily, st).collect(), key=lambda r: r.day)
    flags = [r.flagged for r in out]
    assert not any(flags[:10]), "false positive before the shift"
    assert any(flags[10:]), "level shift never detected"
    # once S+ accumulates past h it stays flagged through the shift
    first = flags.index(True)
    assert all(flags[first:]), "flag dropped while the shift persisted"


def test_ensemble_vote_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.annotate import quality_ensemble_vote

    assert_matches_oracle(
        quality_ensemble_vote(spark, SF_DIR),
        duck,
        get_spec("quality_ensemble_vote").oracle,
        "quality_ensemble_vote",
    )


def test_ensemble_vote_lattice_partitions_corpus(spark):
    """The 2x2x2 lattice partitions the corpus; vote counts and the
    majority flag are pure functions of the three gate booleans; the
    ensemble is non-degenerate (both majority verdicts populated)."""
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.annotate import quality_ensemble_vote

    rows = quality_ensemble_vote(spark, SF_DIR).collect()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert len({(r.heur_keep, r.model_keep, r.lm_keep) for r in rows}) == len(rows)
    for r in rows:
        votes = int(r.heur_keep) + int(r.model_keep) + int(r.lm_keep)
        assert r.n_votes == votes
        assert r.kept_majority == (votes >= 2)
    verdicts = {r.kept_majority for r in rows}
    assert verdicts == {True, False}


def test_scene_cuts_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.multimodal_plans import multimodal_video_scene_cuts

    assert_matches_oracle(
        multimodal_video_scene_cuts(spark, SF_DIR),
        duck,
        get_spec("multimodal_video_scene_cuts").oracle,
        "multimodal_video_scene_cuts",
    )


def test_scene_cuts_mirror_local_decode(spark):
    """The pairwise delta against a local decode of a constructed
    two-scene stream: a hard content change between frames must flag,
    a frozen frame must not."""
    import pandas as pd

    from dend_covid19_spark.multimodal.y4m import (
        VID_H,
        VID_W,
        decode_y4m_scene_cuts,
        y4m_encode,
    )

    wh = VID_W * VID_H
    frames = [bytes([40] * wh), bytes([40] * wh), bytes([200] * wh)]
    payload = y4m_encode(frames)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "y4m": [payload]}),
        "doc_id long, y4m binary",
    )
    rows = sorted(
        decode_y4m_scene_cuts(df, 100).collect(), key=lambda r: r.frame_no
    )
    assert [(r.frame_no, r.frame_delta, r.is_cut) for r in rows] == [
        (0, 0, False),          # frozen frame: zero delta
        (1, 160 * wh, True),    # hard cut: |200-40| per pixel
    ]
    assert rows[0].w == VID_W and rows[0].h == VID_H


def test_scene_cuts_flag_consistency(spark):
    from dend_covid19_spark.plans.multimodal_plans import (
        CUT_MIN_DELTA,
        multimodal_video_scene_cuts,
    )

    rows = multimodal_video_scene_cuts(spark, SF_DIR).collect()
    assert rows and any(r.is_cut for r in rows) and any(not r.is_cut for r in rows)
    for r in rows:
        assert r.is_cut == (r.frame_delta > CUT_MIN_DELTA)
        assert r.frame_delta >= 0


def test_fertility_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.textops import tokenizer_fertility_by_lang

    assert_matches_oracle(
        tokenizer_fertility_by_lang(spark, SF_DIR),
        duck,
        get_spec("tokenizer_fertility_by_lang").oracle,
        "tokenizer_fertility_by_lang",
    )


def test_fertility_invariants(spark):
    """Merges never grow the symbol stream; accounting partitions the
    corpus; ppm columns are the exact floor ratios."""
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.textops import tokenizer_fertility_by_lang

    rows = tokenizer_fertility_by_lang(spark, SF_DIR).collect()
    docs = load_table(spark, "documents", SF_DIR)
    assert sum(r.n_docs for r in rows) == docs.count()
    langs = {r.lang for r in rows}
    assert langs == {r.lang for r in docs.select("lang").distinct().collect()}
    for r in rows:
        assert 0 < r.syms_after <= r.syms_before
        assert r.syms_per_word_ppm == r.syms_after * 1_000_000 // r.n_words
        assert r.compression_ppm == r.syms_after * 1_000_000 // r.syms_before
        assert r.compression_ppm <= 1_000_000


def test_padding_waste_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.llm_pipeline import pack_padding_waste_curve

    assert_matches_oracle(
        pack_padding_waste_curve(spark, SF_DIR),
        duck,
        get_spec("pack_padding_waste_curve").oracle,
        "pack_padding_waste_curve",
    )


def test_padding_waste_invariants(spark):
    """Sequence accounting: padded >= total tokens; ceil-division seq
    counts; same token total at every window size."""
    from dend_covid19_spark.plans.llm_pipeline import (
        PACK_WASTE_WINDOWS,
        pack_padding_waste_curve,
    )

    rows = sorted(
        pack_padding_waste_curve(spark, SF_DIR).collect(),
        key=lambda r: r.window_size,
    )
    assert [r.window_size for r in rows] == sorted(PACK_WASTE_WINDOWS)
    totals = {r.total_tokens for r in rows}
    assert len(totals) == 1  # the corpus doesn't change with the window
    for r in rows:
        assert r.padded_tokens == r.n_sequences * r.window_size
        assert r.padded_tokens >= r.total_tokens
        waste = (r.padded_tokens - r.total_tokens) * 1_000_000 // r.padded_tokens
        assert r.waste_ppm == waste


def test_theil_sen_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.timeseries import events_trend_theil_sen

    assert_matches_oracle(
        events_trend_theil_sen(spark, SF_DIR),
        duck,
        get_spec("events_trend_theil_sen").oracle,
        "events_trend_theil_sen",
    )


def test_theil_sen_mirror(spark):
    """The slope picks against a local mirror over the real daily
    counts (sign-mirrored floor division, positional quantiles)."""
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.timeseries import events_trend_theil_sen

    ev = load_table(spark, "events", SF_DIR)
    daily = sorted(
        (r.day, r.n)
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ns = [n for _, n in daily]
    slopes = []
    for i in range(len(ns)):
        for j in range(i + 1, len(ns)):
            dy, dx = ns[j] - ns[i], j - i
            s = (dy * 1_000_000) // dx if dy >= 0 else -((-dy * 1_000_000) // dx)
            slopes.append((s, i + 1, j + 1))
    slopes.sort()
    cnt = len(slopes)
    (r,) = events_trend_theil_sen(spark, SF_DIR).collect()
    assert r.n_pairs == cnt
    assert r.median_slope_ppm == slopes[(cnt + 1) // 2 - 1][0]
    assert r.p25_slope_ppm == slopes[(cnt * 25 + 99) // 100 - 1][0]
    assert r.p75_slope_ppm == slopes[(cnt * 75 + 99) // 100 - 1][0]
    assert r.p25_slope_ppm <= r.median_slope_ppm <= r.p75_slope_ppm


def test_backlog_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.aggregates import orders_open_backlog_daily

    assert_matches_oracle(
        orders_open_backlog_daily(spark, SF_DIR),
        duck,
        get_spec("orders_open_backlog_daily").oracle,
        "orders_open_backlog_daily",
    )


def test_backlog_sweep_invariants(spark):
    """The sweep line against a direct interval probe on sampled days,
    plus the conservation law: the final running sum equals the count
    of orders whose interval is empty (same-day) or still open at the
    last delta day."""
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.aggregates import orders_open_backlog_daily

    rows = sorted(
        orders_open_backlog_daily(spark, SF_DIR).collect(), key=lambda r: r.day
    )
    assert rows and all(r.n_open >= 0 for r in rows)
    orders = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_shipdate")
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("d1"))
        .select(F.to_date("o_orderdate").alias("d0"), F.to_date("d1").alias("d1"))
        .collect()
    )
    # this synthetic generator emits ship-before-order rows; the row
    # clamps them to empty intervals — assert they exist so the clamp
    # is actually exercised, then probe half-open [d0, clamp(d1))
    assert any(r.d1 < r.d0 for r in iv), "fixture no longer has ill-formed intervals"
    days = [r.day for r in rows]
    for probe_idx in [0, len(rows) // 3, 2 * len(rows) // 3, len(rows) - 1]:
        d = days[probe_idx]
        direct = sum(1 for r in iv if r.d0 <= d < max(r.d0, r.d1))
        assert rows[probe_idx].n_open == direct, (d, rows[probe_idx].n_open, direct)


def test_mean6_integer_formula_matches_decimal_half_away():
    """The kmeans centroid-mean formula (2|a| + d) DIV (2d) against
    Python's exact Decimal ROUND_HALF_UP/half-away, over adversarial
    coordinate sets including exact 6 dp half-way quotients and
    negative mirrors — the hypothesis-driven twin of the davg drill
    (the r11 advice's remaining quotient site)."""
    from decimal import ROUND_HALF_UP, Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def mean6_int(nanos: list[int]) -> float:
        a, d = sum(nanos), len(nanos) * 1000
        m6 = (2 * a + d) // (2 * d) if a >= 0 else -((2 * -a + d) // (2 * d))
        return m6 / 1e6

    # constructed half-way cases: mean = x.0000005 exactly
    cases = [
        [500, 500],                      # 1e-9-units: mean 500 nanos -> 0.000001? no: 500/1000
        [1_500_000, 1_500_000, 0, 0],    # mean 750000 nanos = 0.00075
        [1, 0],                          # mean 0.5 nanos -> rounds to 1e-6? (2*1+2000)//2000=1
        [-1, 0],
        [2_500, -1_500],                 # mean 500 nanos = 0.0000005 -> half-way at 6dp
        [-2_500, 1_500],
    ]
    for nanos in cases:
        want = (
            Decimal(sum(nanos)) / Decimal(len(nanos) * 1_000_000_000)
        ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP) if sum(nanos) >= 0 else -(
            Decimal(-sum(nanos)) / Decimal(len(nanos) * 1_000_000_000)
        ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        assert Decimal(repr(mean6_int(nanos))) == want, nanos

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2 * 10**12), max_value=2 * 10**12),
            min_size=1,
            max_size=20,
        )
    )
    def prop(nanos):
        a = sum(nanos)
        q = Decimal(abs(a)) / Decimal(len(nanos) * 1_000_000_000)
        want = q.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        if a < 0:
            want = -want
        assert Decimal(repr(mean6_int(nanos))) == want

    prop()


def test_semdedup_sweep_monotone_and_anchored(spark):
    """Prune volume never increases with the threshold, and the sweep's
    count at the prune row's own operating point equals that row's
    pruned-vector count — the sweep is the curve the single point sits
    on."""
    from dend_covid19_spark.operators.kmeans import (
        SEMDEDUP_COS_T,
        SEMDEDUP_SWEEP_T_PPM,
        semdedup_cluster_prune,
        semdedup_threshold_sweep,
    )

    rows = sorted(
        semdedup_threshold_sweep(spark, SF_DIR).collect(),
        key=lambda r: r.threshold_ppm,
    )
    assert [r.threshold_ppm for r in rows] == sorted(SEMDEDUP_SWEEP_T_PPM)
    for a, b in zip(rows, rows[1:]):
        assert a.n_pruned >= b.n_pruned  # higher bar -> fewer victims
    op_ppm = int(float(SEMDEDUP_COS_T) * 1_000_000)
    anchor = next(r for r in rows if r.threshold_ppm == op_ppm)
    pruned = sum(
        1 for r in semdedup_cluster_prune(spark, SF_DIR).collect() if r.is_pruned
    )
    assert anchor.n_pruned == pruned


def test_ivf_multiprobe_beats_single_bucket_lsh(spark):
    """The pairing that justifies two recall rows: the servable IVF
    index must strictly dominate the single-bucket sign-LSH audit row
    on total hits over the same panel."""
    from dend_covid19_spark.operators.similarity import (
        ann_ivf_multiprobe_recall,
        ann_recall_audit,
    )

    ivf = sum(r.n_hits for r in ann_ivf_multiprobe_recall(spark, SF_DIR).collect())
    lsh = sum(r.n_hits for r in ann_recall_audit(spark, SF_DIR).collect())
    assert ivf > lsh, (ivf, lsh)
