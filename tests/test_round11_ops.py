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
