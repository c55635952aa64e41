"""Round-11 additions: ExactSubstr span merge, k-anonymity audit,
audio feature extraction over decoded WAV, per-type seasonal index.
Each gets its oracle parity (the driver's check, at sf0.001) plus the
invariants the oracle alone can't pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from dend_covid19_spark.plans.llm_pipeline import K_ANON_K, k_anonymity_audit
from dend_covid19_spark.plans.multimodal_plans import multimodal_audio_features
from dend_covid19_spark.plans.registry import get_spec
from dend_covid19_spark.plans.textops import (
    SPAN_NGRAM,
    dedup_ngram_spans,
    dedup_span_merge,
)
from dend_covid19_spark.plans.timeseries import seasonal_dow_index_by_type

from conftest import SF_DIR, assert_matches_oracle


def test_span_merge_oracle_parity(spark, duck):
    assert_matches_oracle(
        dedup_span_merge(spark, SF_DIR),
        duck,
        get_spec("dedup_span_merge").oracle,
        "dedup_span_merge",
    )


def test_span_merge_invariants(spark):
    rows = dedup_span_merge(spark, SF_DIR).collect()
    assert rows, "fixture corpus must contain duplicated spans"
    saw_removable = saw_clean = False
    for r in rows:
        # merged spans are disjoint token intervals, so their total
        # (and a fortiori the removable subset) fits in the document
        assert 0 <= r.removable_tokens <= r.n_tokens, r
        assert r.longest_span_tokens >= SPAN_NGRAM, r
        assert r.n_spans >= 1, r
        saw_removable |= r.removable_tokens > 0
        saw_clean |= r.removable_tokens == 0
    # the SPAN_REMOVE_MIN policy must be non-vacuous on the fixture
    assert saw_removable and saw_clean


def test_span_merge_covers_same_docs_as_position_row(spark):
    """A doc has merged spans iff it has duplicated positions — the two
    rows are the same signal at different granularity."""
    merged = {r.doc_id for r in dedup_span_merge(spark, SF_DIR).collect()}
    positions = {r.doc_id for r in dedup_ngram_spans(spark, SF_DIR).collect()}
    assert merged == positions


def test_k_anonymity_oracle_parity(spark, duck):
    assert_matches_oracle(
        k_anonymity_audit(spark, SF_DIR),
        duck,
        get_spec("k_anonymity_audit").oracle,
        "k_anonymity_audit",
    )


def test_k_anonymity_partitions_the_table(spark):
    from dend_covid19_spark.catalog import load_table

    rows = k_anonymity_audit(spark, SF_DIR).collect()
    n_customers = load_table(spark, "customer", SF_DIR).count()
    assert sum(r.n_customers for r in rows) == n_customers
    for r in rows:
        assert r.n_customers == r.class_size * r.n_classes
        assert r.below_k == (r.class_size < K_ANON_K)


def test_audio_features_oracle_parity(spark, duck):
    assert_matches_oracle(
        multimodal_audio_features(spark, SF_DIR),
        duck,
        get_spec("multimodal_audio_features").oracle,
        "multimodal_audio_features",
    )


def test_audio_features_mirror_local_decode():
    """Frame features over a hand-built WAV match a local recompute —
    pins the framing boundary independent of the corpus oracle."""
    from dend_covid19_spark.multimodal.wav import FRAME, wav_decode, wav_encode

    samples = [256, -512, 768, -1024, 0, 2048, -256, 512]
    _rate, decoded = wav_decode(wav_encode(samples))
    assert decoded == samples
    for f in range(len(samples) // FRAME):
        w = samples[FRAME * f : FRAME * (f + 1)]
        assert sum(x * x for x in w) >= 0
        zc = sum(1 for i in range(1, FRAME) if w[i - 1] * w[i] < 0)
        assert 0 <= zc <= FRAME - 1
    # frame 0 of the fixture: alternating signs -> all 3 transitions cross
    w0 = samples[:FRAME]
    assert sum(1 for i in range(1, FRAME) if w0[i - 1] * w0[i] < 0) == 3


def test_seasonal_index_oracle_parity(spark, duck):
    assert_matches_oracle(
        seasonal_dow_index_by_type(spark, SF_DIR),
        duck,
        get_spec("seasonal_dow_index_by_type").oracle,
        "seasonal_dow_index_by_type",
    )


def test_streaming_late_drop_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.ingest import streaming_late_drop_executed

    assert_matches_oracle(
        streaming_late_drop_executed(spark, SF_DIR),
        duck,
        get_spec("streaming_late_drop_executed").oracle,
        "streaming_late_drop_executed",
    )


def test_streaming_late_drop_metric_proves_the_drop(spark, tmp_path):
    """Re-run the three-batch choreography with a live query handle and
    assert the replay was dropped BY THE WATERMARK (stateful-operator
    metric), not merely absent — plus the one-batch filter lag that
    motivates the clock-tick batch."""
    import glob
    import os
    import shutil
    import time as _t

    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.ingest import LATE_REPLAY_LAST_DAY
    from dend_covid19_spark.streaming.daily import read_events_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    f1 = os.path.join(src, "a_events.parquet")
    try:  # hardlink is cheapest, but pytest tmp may sit on another fs
        os.link(os.path.join(SF_DIR, "events.parquet"), f1)
    except OSError:  # EXDEV/EPERM — mirror the plan code's fallback
        shutil.copyfile(os.path.join(SF_DIR, "events.parquet"), f1)
    ev = load_table(spark, "events", SF_DIR)

    def stage(df, dest, name):
        d = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(d)
        (part,) = glob.glob(os.path.join(d, "part-*.parquet"))
        shutil.move(part, dest)

    mx = ev.agg(F.max("ts").alias("m"))
    f2 = os.path.join(src, "b_tick.parquet")
    stage(ev.join(F.broadcast(mx), ev.ts == F.col("m")).drop("m"), f2, "tick")
    f3 = os.path.join(src, "c_replay.parquet")
    stage(
        ev.where(F.to_date("ts") <= F.lit(LATE_REPLAY_LAST_DAY).cast("date")),
        f3,
        "replay",
    )
    now = _t.time()
    os.utime(f1, (now - 1000,) * 2)
    os.utime(f2, (now - 500,) * 2)
    os.utime(f3, (now,) * 2)

    q = (
        read_events_stream(spark, src, max_files_per_trigger=1)
        .withWatermark("ts", "5 days")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.to_date("w.start").alias("day"), "n_events")
        .writeStream.format("memory")
        .queryName("late_drop_metric_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_batch = {
        p.batchId: (p.stateOperators or [{}])[0]
        for p in (q.recentProgress or [])
        if p.numInputRows
    }
    assert set(by_batch) >= {0, 1, 2}, sorted(by_batch)
    # the filter lag: the tick batch drops nothing...
    assert (by_batch[1].get("numRowsDroppedByWatermark") or 0) == 0
    # ...and the replay batch drops everything it carries (counted at
    # the stateful operator, post partial-agg) and updates no state
    assert (by_batch[2].get("numRowsDroppedByWatermark") or 0) > 0
    assert (by_batch[2].get("numRowsUpdated") or 0) == 0
    # emitted content equals the batch truth for watermark-closed days
    got = {
        r.day.isoformat(): r.n_events
        for r in spark.table("late_drop_metric_probe").collect()
    }
    truth = {
        r.day.isoformat(): r.n
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got and all(truth[d] == n for d, n in got.items())


def test_seasonal_index_accounts_for_every_event(spark):
    from dend_covid19_spark.catalog import load_table

    rows = seasonal_dow_index_by_type(spark, SF_DIR).collect()
    per_type = {}
    for r in rows:
        assert 1 <= r.dow <= 7, r
        assert r.n_events > 0 and r.n_days > 0, r
        per_type[r.event_type] = per_type.get(r.event_type, 0) + r.n_events
    ev = load_table(spark, "events", SF_DIR)
    truth = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert per_type == truth


def test_ann_recall_audit_oracle_parity(spark, duck):
    from dend_covid19_spark.operators.similarity import ann_recall_audit

    assert_matches_oracle(
        ann_recall_audit(spark, SF_DIR),
        duck,
        get_spec("ann_recall_audit").oracle,
        "ann_recall_audit",
    )


def test_ann_recall_audit_invariants(spark):
    from dend_covid19_spark.operators.similarity import (
        RECALL_K,
        RECALL_QUERY_IDS,
        ann_recall_audit,
    )

    rows = ann_recall_audit(spark, SF_DIR).collect()
    assert {r.query_id for r in rows} == set(RECALL_QUERY_IDS)
    for r in rows:
        assert 0 <= r.n_hits <= min(RECALL_K, r.n_candidates), r
        assert r.recall_ppm == r.n_hits * 1_000_000 // RECALL_K, r


def test_kappa_confusion_partitions_and_recompute(spark):
    from dend_covid19_spark.plans.annotate import classifier_agreement_kappa

    (r,) = classifier_agreement_kappa(spark, SF_DIR).collect()
    a, b, c, d, n = r.n_both_keep, r.n_model_only, r.n_heur_only, r.n_both_drop, r.n_docs
    assert a + b + c + d == n
    assert r.po_ppm == (a + d) * 1_000_000 // n
    pe_num = (a + b) * (a + c) + (c + d) * (b + d)
    assert r.pe_ppm == pe_num * 1_000_000 // (n * n)
    po_num = n * (a + d)
    if n * n == pe_num:
        assert r.kappa_ppm == 0
    elif po_num >= pe_num:
        assert r.kappa_ppm == (po_num - pe_num) * 1_000_000 // (n * n - pe_num)
    else:
        assert r.kappa_ppm == -((pe_num - po_num) * 1_000_000 // (n * n - pe_num))
    assert -1_000_000 <= r.kappa_ppm <= 1_000_000


def test_oov_curve_monotone(spark):
    from dend_covid19_spark.plans.textops import vocab_oov_rate_curve

    rows = sorted(
        vocab_oov_rate_curve(spark, SF_DIR).collect(), key=lambda r: r.vocab_size
    )
    assert [r.vocab_size for r in rows] == [64, 256, 1024]
    for r in rows:
        assert 0 <= r.covered_occurrences <= r.total_occurrences
    # a bigger vocabulary never covers less
    assert all(
        rows[i].oov_ppm >= rows[i + 1].oov_ppm for i in range(len(rows) - 1)
    )


def test_markov_attribution_oracle_parity(spark, duck):
    from dend_covid19_spark.operators.markov import attribution_markov_removal

    assert_matches_oracle(
        attribution_markov_removal(spark, SF_DIR),
        duck,
        get_spec("attribution_markov_removal").oracle,
        "attribution_markov_removal",
    )


def test_markov_attribution_invariants(spark):
    from dend_covid19_spark.operators.markov import (
        CHANNELS,
        attribution_markov_removal,
    )

    rows = attribution_markov_removal(spark, SF_DIR).collect()
    assert {r.channel for r in rows} == set(CHANNELS)
    base = rows[0].base_conv_ppb
    for r in rows:
        assert r.base_conv_ppb == base  # one shared baseline
        # removing a channel can only destroy conversions
        assert 0 <= r.removed_conv_ppb <= base, r
        assert r.removal_effect_ppb == base - r.removed_conv_ppb
    # shares are a floor-divided partition of 1e6
    total = sum(r.attribution_ppm for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000


def test_markov_absorption_closed_forms():
    """The integer value iteration against hand-solvable chains."""
    from dend_covid19_spark.operators.markov import PPB, _absorption_ppb

    # deterministic two-hop conversion: START -> A -> CONV
    t = [("START", "A", 1), ("A", "CONV", 1)]
    assert _absorption_ppb(t, None) == PPB
    assert _absorption_ppb(t, "A") == 0
    # fair split at START: half the mass converts
    t2 = [("START", "A", 1), ("START", "NULL", 1), ("A", "CONV", 1)]
    assert _absorption_ppb(t2, None) == PPB // 2
    # self-loop: A loops to itself half the time, converts otherwise —
    # absorption -> 1 but the 16-step iteration underestimates by
    # exactly the un-absorbed 2^-16 tail (floor arithmetic)
    t3 = [("START", "A", 1), ("A", "A", 1), ("A", "CONV", 1)]
    got = _absorption_ppb(t3, None)
    # un-absorbed 2^-16 tail plus per-step floor losses
    assert PPB - got <= PPB // 2**14 and got < PPB


def test_reshard_rendezvous_minimal_disruption(spark):
    """HRW's guarantee: rows only move INTO the new shard, and the
    movement share is near 1/(N+1)."""
    from dend_covid19_spark.operators.scale import (
        RESHARD_N_OLD,
        reshard_rendezvous_audit,
    )

    rows = reshard_rendezvous_audit(spark, SF_DIR).collect()
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_docs for r in rows if r.moved)
    for r in rows:
        assert 0 <= r.shard_old < RESHARD_N_OLD
        assert 0 <= r.shard_new <= RESHARD_N_OLD
        if r.moved:
            assert r.shard_new == RESHARD_N_OLD, r  # only into the new shard
        else:
            assert r.shard_old == r.shard_new
    # expected 1/(N+1) of rows move; allow wide slack at fixture size
    assert 0 < moved < total
    assert abs(moved / total - 1 / (RESHARD_N_OLD + 1)) < 0.08


def test_calibration_bins_partition_the_corpus(spark):
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.annotate import model_calibration_by_score

    rows = model_calibration_by_score(spark, SF_DIR).collect()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_heur_keep <= r.n_docs
        assert r.heur_keep_ppm == r.n_heur_keep * 1_000_000 // r.n_docs


def test_temporal_split_embargo_partitions_and_leakage(spark):
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.llm_pipeline import temporal_split_embargo

    rows = {r.split: r for r in temporal_split_embargo(spark, SF_DIR).collect()}
    assert set(rows) == {"train", "embargo", "test"}
    n_events = load_table(spark, "events", SF_DIR).count()
    assert sum(r.n_events for r in rows.values()) == n_events
    # test's self-overlap is total; the others' overlap is the leakage
    assert rows["test"].n_users_also_in_test == rows["test"].n_users
    for r in rows.values():
        assert 0 <= r.n_users_also_in_test <= r.n_users


# Oracle parity for the five round-11 rows that previously carried only
# invariant tests (r11 advice): their DuckDB-specific oracle idioms
# (struct max via list_aggregate, '0x' hex casts) were exercised only by
# the external driver sweep until now.


def test_reshard_rendezvous_oracle_parity(spark, duck):
    from dend_covid19_spark.operators.scale import reshard_rendezvous_audit

    assert_matches_oracle(
        reshard_rendezvous_audit(spark, SF_DIR),
        duck,
        get_spec("reshard_rendezvous_audit").oracle,
        "reshard_rendezvous_audit",
    )


def test_oov_curve_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.textops import vocab_oov_rate_curve

    assert_matches_oracle(
        vocab_oov_rate_curve(spark, SF_DIR),
        duck,
        get_spec("vocab_oov_rate_curve").oracle,
        "vocab_oov_rate_curve",
    )


def test_kappa_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.annotate import classifier_agreement_kappa

    assert_matches_oracle(
        classifier_agreement_kappa(spark, SF_DIR),
        duck,
        get_spec("classifier_agreement_kappa").oracle,
        "classifier_agreement_kappa",
    )


def test_calibration_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.annotate import model_calibration_by_score

    assert_matches_oracle(
        model_calibration_by_score(spark, SF_DIR),
        duck,
        get_spec("model_calibration_by_score").oracle,
        "model_calibration_by_score",
    )


def test_temporal_split_oracle_parity(spark, duck):
    from dend_covid19_spark.plans.llm_pipeline import temporal_split_embargo

    assert_matches_oracle(
        temporal_split_embargo(spark, SF_DIR),
        duck,
        get_spec("temporal_split_embargo").oracle,
        "temporal_split_embargo",
    )


def test_davg_integer_rounding_matches_decimal_half_up(spark, duck):
    """The (2N + D) DIV (2D) formula against Python's exact decimal
    ROUND_HALF_UP, driven through BOTH engines on adversarial literal
    rows — including the seed-53 killer (avg of exactly 0.05625)."""
    from decimal import ROUND_HALF_UP, Decimal

    from dend_covid19_spark.plans.parity import _sql_davg, davg

    cases = [
        [Decimal("0.05"), Decimal("0.06"), Decimal("0.06"), Decimal("0.06")
         ] * 4,                                   # avg = 0.0575
        [Decimal("0.05"), Decimal("0.06")] * 8,   # avg = 0.055
        [Decimal("0.09")] * 160,                  # n=160: the q1 shape
        [Decimal("0.01"), Decimal("0.10"), Decimal("0.06")],
        [Decimal("-1.23"), Decimal("4.56"), Decimal("-7.89")],
        [Decimal("-0.05"), Decimal("-0.06")] * 8, # negative half-way
    ]
    # seed-53 reproduction: 9/160 = 0.05625 exactly
    cases.append([Decimal("9.00")] + [Decimal("0.00")] * 159)
    for vals in cases:
        want = (sum(vals) / len(vals)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
        sdf = spark.createDataFrame([(str(v),) for v in vals], "value string")
        got_spark = sdf.agg(
            davg("CAST(value AS DOUBLE)").alias("a")
        ).first().a
        lits = ", ".join(f"({v})" for v in vals)
        got_duck = duck.execute(
            f"SELECT {_sql_davg('value')} AS a FROM (VALUES {lits}) t(value)"
        ).fetchone()[0]
        assert got_spark == got_duck == float(want), (vals[:4], got_spark, got_duck, want)


def test_streaming_mode_rows_emission_sets(spark, duck):
    """update emits per-batch changed keys; complete's sink holds only
    the final re-emission — both pinned against the batch truth."""
    from dend_covid19_spark.plans.ingest import (
        MODE_SPLIT_DAY,
        streaming_complete_mode_executed,
        streaming_update_mode_executed,
    )

    assert_matches_oracle(
        streaming_update_mode_executed(spark, SF_DIR),
        duck,
        get_spec("streaming_update_mode_executed").oracle,
        "streaming_update_mode_executed",
    )
    assert_matches_oracle(
        streaming_complete_mode_executed(spark, SF_DIR),
        duck,
        get_spec("streaming_complete_mode_executed").oracle,
        "streaming_complete_mode_executed",
    )
    from dend_covid19_spark.catalog import load_table

    ev = load_table(spark, "events", SF_DIR)
    split = F.lit(MODE_SPLIT_DAY).cast("date")
    n_early = ev.where(F.to_date("ts") <= split).select("event_type").distinct().count()
    n_late = ev.where(F.to_date("ts") > split).select("event_type").distinct().count()
    n_all = ev.select("event_type").distinct().count()
    assert streaming_update_mode_executed(spark, SF_DIR).count() == n_early + n_late
    assert streaming_complete_mode_executed(spark, SF_DIR).count() == n_all
