"""Time-series / windowed-aggregation plans over ``events``.

The reference achieves incrementality by date-templated paths + a daily
Airflow schedule (SURVEY.md §2.7 — no streaming runtime). Here the same
semantics are declared once, batch-first with ``F.window`` (so they are
DuckDB-oracle-checkable) and reused verbatim by the Structured Streaming
entry points in streaming/daily.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import _sql_dsum, dsum
from .registry import query


@query(
    "events_tumbling_daily",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       count(*) AS cnt,
       {_sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregate per event type — the daily-batch
    semantics of the reference's schedule as one windowed group-by. The
    same plan runs under readStream + watermark (streaming/daily.py)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("total_value"))
        .select(
            F.to_date("w.start").alias("day"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@query(
    "events_hourly_activity",
    oracle=f"""
SELECT date_trunc('hour', ts) AS hour_ts,
       count(*) AS cnt,
       count(DISTINCT user_id) AS active_users,
       {_sql_dsum('value')} AS total_value
FROM events
GROUP BY 1
""",
)
def events_hourly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window with a distinct-user count (the expensive
    kind of streaming agg: exact distinct forces a per-window shuffle;
    at 100 TB swap in approx_count_distinct — kept exact here for the
    oracle)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").alias("active_users"),
            dsum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_ts"), "cnt", "active_users", "total_value")
    )


@query(
    "events_sessionize",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT user_id, ts, event_id,
           sum(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq
    FROM ordered
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       CAST(min(ts) AS DATE) AS session_date
FROM sessions
GROUP BY user_id, session_seq
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): lag to flag
    session starts, running sum to number sessions, then per-session
    rollup. Batch twin of a session_window/applyInPandasWithState
    streaming operator (streaming/daily.py); expressed with lag+sum so
    the DuckDB oracle states identical semantics.

    One shuffle on user_id serves both windows and the final group-by.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compare in exact microseconds (a seconds-granularity cast would
    # truncate before subtracting and disagree with the oracle near the
    # 30-min boundary)
    flagged = ev.withColumn(
        "is_new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                > 1_800_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("is_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.to_date(F.min("ts")).alias("session_date"),
    )


@query(
    "events_session_window_native",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
    SELECT user_id, ts,
           sum(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq
    FROM ordered
)
SELECT user_id,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) + 1800000000 AS end_us,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
""",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``session_window`` (use the native operator when
    one exists): merges each user's events whose [ts, ts+30min) intervals
    overlap; window end = last event + gap.

    Boundary semantics differ from the lag+sum islands operator
    (events_sessionize): a gap of EXACTLY 30 minutes starts a new session
    here (intervals are half-open), vs. > 30 minutes there — the oracle
    states >= accordingly. Session bounds surface as epoch micros
    (BIGINT) so the value hash is timezone-free.

    Scale: one shuffle on user_id, then session merging runs inside the
    aggregation operator itself — no self-join, no second window pass.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("start_us"),
            F.unix_micros("sw.end").alias("end_us"),
            "n_events",
        )
    )
