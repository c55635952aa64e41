"""The streaming drains' narrow state/shuffle width: the knob honors its
env override, and a drain that scopes the width down restores the
session's batch width afterwards (the set/restore must never leak into
subsequent batch queries)."""

from __future__ import annotations

from dend_covid19_spark.plans.ingest import (
    _stream_width,
    streaming_dedup_executed,
    streaming_session_window_executed,
    streaming_stateful_sessionize_executed,
)

from conftest import SF_DIR


def test_stream_width_default_and_env_override(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", raising=False)
    assert _stream_width() == "8"
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "64")
    assert _stream_width() == "64"


def test_narrowed_drains_restore_session_width(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    for row in (
        streaming_dedup_executed,
        streaming_session_window_executed,
        streaming_stateful_sessionize_executed,
    ):
        df = row(spark, SF_DIR)
        assert df.count() > 0
        assert spark.conf.get(key) == before
