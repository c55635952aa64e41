"""Streaming session-window drain vs the batch session_window operator:
the emitted (closed) sessions must equal the batch result restricted to
sessions whose end precedes the final watermark — engine-internal
consistency, independent of the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from dend_covid19_spark.catalog import load_table
from dend_covid19_spark.plans.ingest import streaming_session_window_executed
from dend_covid19_spark.plans.timeseries import events_session_window_native

from conftest import SF_DIR


def test_stream_matches_batch_closed_sessions(spark):
    max_us = (
        load_table(spark, "events", SF_DIR)
        .agg(F.unix_micros(F.max("ts")))
        .collect()[0][0]
    )
    batch_closed = {
        tuple(r)
        for r in events_session_window_native(spark, SF_DIR)
        .where(F.col("end_us") <= max_us)
        .collect()
    }
    streamed = {
        tuple(r)
        for r in streaming_session_window_executed(spark, SF_DIR).collect()
    }
    assert streamed == batch_closed
    assert len(streamed) > 0


def test_stream_result_cached_per_session(spark):
    a = streaming_session_window_executed(spark, SF_DIR)
    b = streaming_session_window_executed(spark, SF_DIR)
    assert a is b
