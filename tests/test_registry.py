"""Registry ordering contract: the driver's correctness harness checks
only the FIRST 50 registered queries, so iteration order — curated
priority this round, automatic green-rotation in later rounds — is
load-bearing and gets its own tests (no SparkSession needed)."""

from __future__ import annotations

import pytest

import dend_covid19_spark.plans as plans
from dend_covid19_spark.plans.registry import set_priority


def test_window_matches_curated_priority_without_rotation():
    """With no round>=2 CORRECTNESS report recorded, the checked window
    is exactly the curated PRIORITY list. The registry's live order
    depends on which CORRECTNESS_r*.json files the driver has written
    into the repo, so pin the unrotated state explicitly instead of
    reading disk state."""
    assert plans._effective_priority(green=set(), rotate=False) == plans.PRIORITY
    set_priority(plans.PRIORITY)
    try:
        assert list(plans.all_queries())[: len(plans.PRIORITY)] == plans.PRIORITY
    finally:
        set_priority(plans._effective_priority())


def test_live_window_pins_parity_bar_regardless_of_disk_state():
    """Whatever CORRECTNESS reports exist on disk, the live registry
    order keeps the §2 parity bar in the first 10 slots and remains a
    permutation of the full registry."""
    live = list(plans.all_queries())
    assert live[: plans._PARITY_BAR_N] == plans.PRIORITY[: plans._PARITY_BAR_N]
    assert sorted(live) == sorted(plans.registered_names())


def _fabricate_rows(monkeypatch, rows: dict[str, tuple[int, bool, bool]], max_rnd: int):
    """Pin `_latest_rows` to a fabricated driver-report state so rotation
    tests are INDEPENDENT of whichever CORRECTNESS_r*.json files the
    driver has written to disk. Round 5 proved mixing a fabricated
    `green` set with live disk reads breaks the positional math the
    moment a new report lands — every test that asserts window positions
    must fabricate the whole state."""
    monkeypatch.setattr(plans, "_latest_rows", lambda: (rows, max_rnd, True))


def test_rotation_yields_slots_to_never_green_queries(monkeypatch):
    """Once rotation triggers, green names yield their slots: every
    never-green name packs immediately after the pinned parity bar (so
    none can sit outside the window while a green name holds a slot);
    the result is a permutation of the registry."""
    # Fabricated state: all REPIN names last green at their own
    # declaration round (= no post-fix row yet -> active repins); the
    # non-repin RECHECK names have greens one round NEWER than their own
    # declaration (= expired rechecks). Declaration rounds are per-name
    # since round 12 (the r11 advice).
    rows = {n: (decl, True, False) for n, decl in plans.REPIN.items()}
    rows.update(
        {
            n: (decl + 1, True, False)
            for n, decl in plans.RECHECK.items()
            if n not in plans.REPIN
        }
    )
    max_rnd = max(r for r, _, _ in rows.values())
    _fabricate_rows(monkeypatch, rows, max_rnd=max_rnd)
    assert plans.active_rechecks() == []
    green = set(plans.PRIORITY[10:])  # everything beyond the bar went green
    eff = plans._effective_priority(green=green, rotate=True)
    # The pinned head is the parity bar plus the ACTIVE re-pinned
    # regression set (repins hold their slots until the driver records a
    # green row NEWER than the declaration round — then they self-expire
    # for good; they no longer re-arm each round they go unchecked).
    pinned = plans.PRIORITY[:10] + [
        n for n in plans.REPIN if n in plans.registered_names()
    ]
    assert eff[: len(pinned)] == pinned
    never = {n for n in plans.registered_names() if n not in green} - set(pinned)
    assert set(eff[len(pinned) : len(pinned) + len(never)]) == never
    assert sorted(eff) == sorted(plans.registered_names())


def test_repin_recheck_double_membership_is_exclusive(monkeypatch):
    """A name declared in BOTH lists (legitimate: different admission
    reasons) must occupy exactly one queueing class — repin wins. This
    is the exact round-5 failure state: rollup_daily_events active in
    both lists once the r5 report landed."""
    dual = [n for n in plans.REPIN if n in plans.RECHECK]
    assert dual, "fixture expects at least one dual-declared name"
    target = dual[0]
    # every name fresh-green one round past its declaration (expired) ...
    rows = {n: (decl + 1, True, False) for n, decl in plans.REPIN.items()}
    rows.update(
        {
            n: (decl + 1, True, False)
            for n, decl in plans.RECHECK.items()
            if n not in plans.REPIN
        }
    )
    # ... except the target: last green AT its declaration round ->
    # active repin AND recheck-eligible
    rows[target] = (plans.REPIN[target], True, False)
    max_rnd = max(r for r, _, _ in rows.values())
    _fabricate_rows(monkeypatch, rows, max_rnd=max_rnd)
    assert plans.active_repins() == [target]
    assert target not in plans.active_rechecks()  # repin subtracts it
    eff = plans._effective_priority(green=set(plans.PRIORITY[10:]), rotate=True)
    assert eff.count(target) == 1
    assert eff.index(target) == plans._PARITY_BAR_N  # head of the repin block


def test_rotation_keeps_err_queries_in_window():
    """A query that ERR'd (never green) must stay prioritized even when
    its curated neighbors rotate out."""
    green = set(plans.PRIORITY[10:]) - {"dedup_minhash_lsh"}
    eff = plans._effective_priority(green=green, rotate=True)
    assert eff.index("dedup_minhash_lsh") < 50


def test_priority_rejects_duplicates():
    with pytest.raises(ValueError, match="duplicate"):
        set_priority(["a", "a"])
    set_priority(plans._effective_priority())  # restore


def test_unknown_priority_name_fails_at_read():
    set_priority(["no_such_query"])
    try:
        with pytest.raises(ValueError, match="not registered"):
            plans.all_queries()
    finally:
        set_priority(plans._effective_priority())
    assert "flagship_daily_join" in plans.all_queries()


def test_late_declared_recheck_activates_despite_older_green(monkeypatch):
    """The r11 advice's failure mode: under a single module-wide
    declaration constant, a recheck declared in a LATER round (e.g. the
    r12 davg set, declared at 11) would be treated as already satisfied
    by any green row newer than the old constant (4) and never activate.
    Per-name declaration rounds fix that: a green row OLDER than the
    name's own declaration round keeps the recheck active."""
    late = [(n, d) for n, d in plans.RECHECK.items() if d >= 11 and n not in plans.REPIN]
    assert late, "fixture expects the r12 davg rechecks to be declared at round >= 11"
    name, decl = late[0]
    rows = {n: (d + 1, True, False) for n, d in plans.REPIN.items()}
    rows.update(
        {
            n: (d + 1, True, False)
            for n, d in plans.RECHECK.items()
            if n not in plans.REPIN
        }
    )
    rows[name] = (decl - 2, True, False)  # green, but PRE-declaration (r9 < r11)
    max_rnd = max(r for r, _, _ in rows.values())
    _fabricate_rows(monkeypatch, rows, max_rnd=max_rnd)
    assert name in plans.active_rechecks()
    # and a post-declaration green expires it
    rows[name] = (decl + 1, True, False)
    _fabricate_rows(monkeypatch, rows, max_rnd=max_rnd)
    assert name not in plans.active_rechecks()


def test_bench_headline_names_are_registered():
    """bench.py's HEADLINE list must reference real registry names — a
    typo here would make the driver's bench crash at round time."""
    import bench

    registered = set(plans.registered_names())
    missing = [n for n in bench.HEADLINE if n not in registered]
    assert not missing, f"bench.HEADLINE names not in registry: {missing}"


def test_recheck_names_queue_behind_never_green(monkeypatch):
    """Active RECHECK names (green in the round they were declared, but
    re-requested — changed implementations / regression families) must
    sit AFTER every never-green query and before the ordinary green
    rotation, and must self-expire once a newer report records them."""
    # Fabricated state: all REPIN names fresh-green past their own
    # declaration round (= repins expired); the non-repin RECHECK names
    # still carry only their declaration-round green (= active rechecks).
    rows = {n: (decl + 1, True, False) for n, decl in plans.REPIN.items()}
    rows.update(
        {
            n: (decl, True, False)
            for n, decl in plans.RECHECK.items()
            if n not in plans.REPIN
        }
    )
    max_rnd = max(r for r, _, _ in rows.values())
    _fabricate_rows(monkeypatch, rows, max_rnd=max_rnd)
    assert plans.active_repins() == []
    green = set(plans.PRIORITY[10:]) | set(plans.RECHECK)
    eff = plans._effective_priority(green=green, rotate=True)
    pinned = plans.PRIORITY[:10]
    never = {n for n in plans.registered_names() if n not in green} - set(pinned)
    rechecks = [n for n in plans.active_rechecks() if n in plans.registered_names()]
    assert rechecks  # fixture must exercise a non-empty recheck block
    start = len(pinned) + len(never)
    assert eff[start : start + len(rechecks)] == rechecks

    # simulated next round: every recheck name green in a report NEWER
    # than its own declaration round -> the whole list expires
    fresh = {n: (decl + 1, True, False) for n, decl in plans.RECHECK.items()}
    max_rnd = max(r for r, _, _ in fresh.values())
    _fabricate_rows(monkeypatch, fresh, max_rnd=max_rnd)
    assert plans.active_rechecks() == []
