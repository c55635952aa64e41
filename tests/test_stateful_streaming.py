"""Stateful streaming sessionization vs the batch operator: with one
availableNow micro-batch, the streamed *closed* sessions must equal the
batch sessions minus each user's final (still-open) session."""

from __future__ import annotations

import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from dend_covid19_spark.plans.timeseries import events_sessionize
from dend_covid19_spark.streaming.stateful import run_sessionize_available_now
from tests.conftest import SF_DIR


def test_stateful_sessions_match_batch_closed(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")
    run_sessionize_available_now(spark, str(src), str(tmp_path / "ckpt"))

    streamed = {
        (r.user_id, r.session_seq): (r.n_events, str(r.session_date))
        for r in spark.table("sessions_stream").collect()
    }

    batch = events_sessionize(spark, SF_DIR)
    w = Window.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("max_seq"))
        .collect()
    )
    expected = {
        (r.user_id, r.session_seq): (r.n_events, str(r.session_date))
        for r in closed_batch
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_transform_with_state_sessions_match_batch_closed(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas sessionizer must produce
    exactly the same closed sessions as the first-generation
    applyInPandasWithState operator and the batch query.

    Skips where the optional protobuf dependency (the transformWithState
    state-server protocol) is absent — the v1 operator test above covers
    the identical session semantics there."""
    import pytest

    from dend_covid19_spark.streaming.stateful_v2 import (
        run_sessionize_available_now as run_tws,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("protobuf not installed: transformWithState protocol unavailable")

    src = tmp_path / "events_src_v2"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")
    run_tws(spark, str(src), str(tmp_path / "ckpt_v2"))

    streamed = {
        (r.user_id, r.session_seq): (r.n_events, str(r.session_date))
        for r in spark.table("sessions_tws").collect()
    }

    batch = events_sessionize(spark, SF_DIR)
    w = Window.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("max_seq"))
        .collect()
    )
    expected = {
        (r.user_id, r.session_seq): (r.n_events, str(r.session_date))
        for r in closed_batch
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_stateful_state_survives_restart(spark, tmp_path):
    """State-store recovery for the custom stateful operator: feed the
    first 20 days, restart with the remaining days, and the union of
    emitted closed sessions must equal the batch closed sessions over
    the FULL data — sessions spanning the restart must not fragment or
    double-emit (per-user (last_us, seq, n, start) resumes from the
    checkpoint)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from dend_covid19_spark.streaming.stateful import run_sessionize_to_parquet

    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    cutoff = pc.min(tbl["ts"]).as_py() + __import__("datetime").timedelta(days=20)
    early = tbl.filter(pc.less(tbl["ts"], cutoff))
    late = tbl.filter(pc.greater_equal(tbl["ts"], cutoff))
    assert early.num_rows > 0 and late.num_rows > 0

    src = tmp_path / "restart_src"
    src.mkdir()
    out, ckpt = tmp_path / "sessions_out", tmp_path / "ckpt_restart"
    pq.write_table(early, str(src / "part-a.parquet"))
    run_sessionize_to_parquet(spark, str(src), str(out), str(ckpt))
    pq.write_table(late, str(src / "part-b.parquet"))
    run_sessionize_to_parquet(spark, str(src), str(out), str(ckpt))

    streamed = {
        (r.user_id, r.session_seq): (r.n_events, str(r.session_date))
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = events_sessionize(spark, SF_DIR)
    w = Window.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("max_seq"))
        .collect()
    )
    expected = {
        (r.user_id, r.session_seq): (r.n_events, str(r.session_date))
        for r in closed_batch
    }
    assert streamed == expected
    assert len(streamed) > 0
