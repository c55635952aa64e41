"""The manifest-commit prototype's load-bearing property: a reader
pinned BEFORE a compaction commit reads identical content AFTER it —
the concurrent-reader guarantee the directory-swap compaction cannot
give (its documented single-writer window)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dend_covid19_spark.catalog import load_table
from dend_covid19_spark.operators.lakehouse import (
    append_manifest_table,
    compact_manifest_table,
    current_manifest,
    read_manifest_table,
    vacuum_manifest_table,
    write_manifest_table,
)

from conftest import SF_DIR


def _digest(df):
    return sorted(
        (r.o_orderkey, r.o_custkey, float(r.o_totalprice)) for r in df.collect()
    )


def test_pinned_reader_survives_compaction_commit(spark, tmp_path):
    root = str(tmp_path / "mt")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    half1 = orders.where(F.col("o_orderkey") % 2 == 0)
    half2 = orders.where(F.col("o_orderkey") % 2 == 1)

    write_manifest_table(spark, half1, root, n_files=4)
    append_manifest_table(spark, half2, root, n_files=4)

    # reader A pins the fragmented manifest (8 files)
    pin = current_manifest(root)
    assert pin["version"] == 2 and len(pin["files"]) == 8
    before = _digest(read_manifest_table(spark, root, pin))

    # compaction commits a new manifest mid-"scan"
    rec = compact_manifest_table(spark, root, target_file_bytes=1 << 40)
    assert rec["files_before"] == 8 and rec["files_after"] == 1

    # reader A's pinned view: byte-identical, files all still present
    assert all(os.path.exists(os.path.join(root, f)) for f in pin["files"])
    assert _digest(read_manifest_table(spark, root, pin)) == before
    # reader B (fresh pin): same content through one file
    assert _digest(read_manifest_table(spark, root)) == before
    assert len(current_manifest(root)["files"]) == 1

    # retention: with keep_last=1 (and no in-flight writers, so no
    # grace needed), the superseded files are reaped and the latest
    # read is unaffected
    deleted = vacuum_manifest_table(root, keep_last=1, grace_seconds=0)
    assert len([d for d in deleted if d.startswith("data/")]) == 8
    assert _digest(read_manifest_table(spark, root)) == before
    # the retention contract's negative path: a reader still pinned to
    # the vacuumed manifest now fails LOUDLY (missing files), never
    # silently serves partial data — which is why retention must
    # outlive the longest scan (count here, age + lease in production)
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    with pytest.raises((AnalysisException, Py4JJavaError)):
        read_manifest_table(spark, root, pin).collect()


def test_crash_before_pointer_flip_is_invisible(spark, tmp_path):
    """Orphaned data files and a temp manifest (death before the
    os.replace) never change what readers resolve; vacuum reaps the
    orphans."""
    root = str(tmp_path / "mt2")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_manifest_table(spark, orders, root, n_files=2)
    want = _digest(read_manifest_table(spark, root))
    v1 = current_manifest(root)

    # simulate a compaction that died before its commit: stage debris +
    # an orphan data file + a temp manifest, pointer untouched
    os.makedirs(os.path.join(root, ".stage.999.deadbeef"))
    with open(os.path.join(root, "data", "part-orphan.parquet"), "wb") as fh:
        fh.write(b"not a real file, never referenced")
    with open(os.path.join(root, "_manifests", ".m2.json.tmp.999"), "w") as fh:
        fh.write("{}")

    assert current_manifest(root) == v1
    assert _digest(read_manifest_table(spark, root)) == want

    # grace period first: the "orphans" are seconds old — exactly what
    # an in-flight append's just-moved staged files look like — so a
    # graceful vacuum must SKIP them (the writer-race protection)
    deleted = vacuum_manifest_table(root, keep_last=1, grace_seconds=3600)
    assert not any(d.startswith(("data/", ".stage.")) for d in deleted), deleted
    assert os.path.exists(os.path.join(root, "data", "part-orphan.parquet"))
    # once aged past the horizon they are true crash orphans: reaped
    deleted = vacuum_manifest_table(root, keep_last=1, grace_seconds=0)
    assert "data/part-orphan.parquet" in deleted
    assert any(d.startswith(".stage.") for d in deleted)
    assert _digest(read_manifest_table(spark, root)) == want


def test_stats_pruned_scan_plans_fewer_files(spark, tmp_path):
    """The commit records per-file footer min/max stats; a clustered
    write makes them disjoint, so a selective range read plans a strict
    subset of the files — and the pruned scan plus the exact predicate
    equals the full scan plus the same predicate (pruning is an
    optimization, never a filter). A column with no recorded stats must
    widen to all files."""
    from dend_covid19_spark.operators.lakehouse import prune_files

    root = str(tmp_path / "mt3")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_manifest_table(spark, orders, root, n_files=4, cluster_by=["o_orderkey"])
    m = current_manifest(root)
    assert len(m["files"]) == 4
    assert all(
        "o_orderkey" in m["file_stats"][f] for f in m["files"]
    ), m["file_stats"]

    lo_key = min(r.o_orderkey for r in read_manifest_table(spark, root).collect())
    pruned = prune_files(m, "o_orderkey", lo_key, lo_key + 5)
    assert 1 <= len(pruned) < len(m["files"]), pruned

    got = _digest(
        read_manifest_table(spark, root, prune=("o_orderkey", lo_key, lo_key + 5))
        .where(F.col("o_orderkey").between(lo_key, lo_key + 5))
    )
    want = _digest(
        read_manifest_table(spark, root).where(
            F.col("o_orderkey").between(lo_key, lo_key + 5)
        )
    )
    assert got == want and got
    # no stats for a column -> every file kept (missing stats widen)
    assert prune_files(m, "no_such_col", 0, 1) == m["files"]


def test_compaction_preserves_evolved_schema(spark, tmp_path):
    """An append that EVOLVED the schema (a column present only in the
    newer files) must survive compaction: the rewrite reads with
    mergeSchema, so the evolved column lands NULL-filled for
    pre-evolution rows instead of being silently dropped (the lossy-
    'lossless' hazard compact_partitions closes the same way). Plain
    reads of the mixed-schema manifest expose the same option."""
    root = str(tmp_path / "mt5")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    old = orders.where(F.col("o_orderkey") % 2 == 0)
    new = orders.where(F.col("o_orderkey") % 2 == 1).withColumn(
        "ingest_batch", F.lit("b2")
    )
    write_manifest_table(spark, old, root, n_files=2)
    append_manifest_table(spark, new, root, n_files=2)

    merged = read_manifest_table(spark, root, merge_schema=True)
    assert "ingest_batch" in merged.columns
    want_tagged = sorted(
        (r.o_orderkey, r.ingest_batch) for r in merged.collect()
    )

    rec = compact_manifest_table(spark, root, target_file_bytes=1 << 40)
    assert rec["files_after"] == 1
    after = read_manifest_table(spark, root)
    # one compacted file: the evolved column survives even a plain read
    assert "ingest_batch" in after.columns
    assert sorted((r.o_orderkey, r.ingest_batch) for r in after.collect()) == (
        want_tagged
    )
    # pre-evolution rows are NULL-filled, post-evolution rows keep b2
    tags = {r.ingest_batch for r in after.select("ingest_batch").distinct().collect()}
    assert tags == {None, "b2"}


def test_fully_pruned_scan_returns_empty(spark, tmp_path):
    """A prune whose range is disjoint from every file's stats plans
    zero files — a legitimate outcome that must return an EMPTY
    DataFrame with the table's schema, not raise on a zero-path read."""
    root = str(tmp_path / "mt6")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_manifest_table(spark, orders, root, n_files=3, cluster_by=["o_orderkey"])
    out = read_manifest_table(spark, root, prune=("o_orderkey", -10**12, -10**11))
    assert out.columns == ["o_orderkey", "o_custkey", "o_totalprice"]
    assert out.count() == 0


def test_commit_conflict_one_winner_and_retry(spark, tmp_path):
    """Optimistic concurrency: two commits racing the same parent
    produce exactly one winner (exclusive manifest creation); the
    append path retries against the winner's manifest so both appends'
    rows land, and nothing is lost or doubled."""
    import pytest

    from dend_covid19_spark.operators.lakehouse import (
        CommitConflict,
        _commit,
        _stage_files,
    )

    root = str(tmp_path / "mt4")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.where(F.col("o_orderkey") % 3 == 0)
    a = orders.where(F.col("o_orderkey") % 3 == 1)
    b = orders.where(F.col("o_orderkey") % 3 == 2)
    write_manifest_table(spark, base, root, n_files=2)

    # simulate the race at the _commit layer: both writers staged
    # against parent=1; exactly one v2 commit may win
    cur = current_manifest(root)
    files_a, stats_a = _stage_files(spark, a, root, 1)
    files_b, stats_b = _stage_files(spark, b, root, 1)
    _commit(root, cur["files"] + files_a, parent=cur["version"], file_stats=stats_a)
    with pytest.raises(CommitConflict):
        _commit(root, cur["files"] + files_b, parent=cur["version"], file_stats=stats_b)

    # the public append path retries and lands b's rows on top of a's
    append_manifest_table(spark, b, root, n_files=1)
    final = current_manifest(root)
    assert final["version"] == 3
    assert _digest(read_manifest_table(spark, root)) == _digest(orders)


def test_prune_files_soundness_property():
    """Hypothesis property (pure metadata, no Spark): for ANY file
    layout of integer rows and ANY query range, prune_files keeps
    every file that contains a matching row — pruning may over-keep
    (missing stats, wide files) but can NEVER drop a file whose rows
    the exact predicate would select."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dend_covid19_spark.operators.lakehouse import prune_files

    rows_per_file = st.lists(
        st.lists(st.integers(-50, 50), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=300, deadline=None)
    @given(files=rows_per_file, lo=st.integers(-60, 60), span=st.integers(0, 30),
           drop_stats=st.sets(st.integers(0, 5)))
    def check(files, lo, span, drop_stats):
        hi = lo + span
        names = [f"data/f{i}.parquet" for i in range(len(files))]
        stats = {
            n: ({} if i in drop_stats or not rs else {"k": [min(rs), max(rs)]})
            for i, (n, rs) in enumerate(zip(names, files))
        }
        manifest = {"files": names, "file_stats": stats}
        kept = set(prune_files(manifest, "k", lo, hi))
        for n, rs in zip(names, files):
            if any(lo <= v <= hi for v in rs):
                assert n in kept, (n, rs, lo, hi, stats[n])

    check()


def test_stripped_stats_widen_into_executed_scan(spark, tmp_path):
    """A file whose manifest entry LOST its stats (older writer version,
    stats collection disabled, unsupported type) must widen INTO the
    planned set — executed end-to-end: the widened pruned scan plus the
    exact predicate still equals the full scan plus the predicate, and
    the stats-stripped file is provably in the plan."""
    from dend_covid19_spark.operators.lakehouse import prune_files

    root = str(tmp_path / "mt7")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_manifest_table(spark, orders, root, n_files=4, cluster_by=["o_orderkey"])
    m = current_manifest(root)
    lo_key = min(r.o_orderkey for r in read_manifest_table(spark, root).collect())
    rng = (lo_key, lo_key + 5)

    # the file with the HIGHEST keys cannot overlap the low range —
    # pruned out while its stats exist
    far = max(m["files"], key=lambda f: m["file_stats"][f]["o_orderkey"][1])
    assert far not in prune_files(m, "o_orderkey", *rng)

    stripped = {
        "version": m["version"],
        "files": m["files"],
        "file_stats": {f: (
            {k: v for k, v in s.items() if k != "o_orderkey"} if f == far else s
        ) for f, s in m["file_stats"].items()},
    }
    planned = prune_files(stripped, "o_orderkey", *rng)
    assert far in planned, "missing stats must widen, never narrow"

    got = _digest(
        read_manifest_table(spark, root, stripped, prune=("o_orderkey", *rng))
        .where(F.col("o_orderkey").between(*rng))
    )
    want = _digest(
        read_manifest_table(spark, root).where(F.col("o_orderkey").between(*rng))
    )
    assert got == want and got


def test_randomized_commit_interleavings_exactly_once(spark, tmp_path):
    """Seeded random MVCC choreographies: several writers stage disjoint
    slices, then attempt commits in a random interleaving where each
    writer resolved its parent at a random earlier point (arbitrarily
    stale). Whatever the schedule, every writer lands via the
    conflict-retry loop and the final table is the exact union — no
    slice lost, none doubled, version == 1 + n_writers."""
    import random

    from dend_covid19_spark.operators.lakehouse import (
        CommitConflict,
        _commit,
        _stage_files,
    )

    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_writers = 4
    for seed in (16, 163, 1663):
        rng = random.Random(seed)
        root = str(tmp_path / f"race{seed}")
        write_manifest_table(
            spark, orders.where(F.col("o_orderkey") % (n_writers + 1) == 0),
            root, n_files=1,
        )
        staged = []
        for w in range(n_writers):
            files, stats = _stage_files(
                spark,
                orders.where(F.col("o_orderkey") % (n_writers + 1) == w + 1),
                root, 1,
            )
            # each writer pinned its parent BEFORE any of this round's
            # commits — maximal staleness for later committers
            staged.append((files, stats, current_manifest(root)))
        order = list(range(n_writers))
        rng.shuffle(order)
        for w in order:
            files, stats, parent = staged[w]
            for _ in range(n_writers + 1):
                try:
                    _commit(
                        root, parent["files"] + files,
                        parent=parent["version"],
                        file_stats={**parent.get("file_stats", {}), **stats},
                    )
                    break
                except CommitConflict:
                    parent = current_manifest(root)
            else:
                raise AssertionError(f"writer {w} never landed (seed {seed})")
        final = current_manifest(root)
        assert final["version"] == 1 + n_writers, (seed, final["version"])
        assert _digest(read_manifest_table(spark, root)) == _digest(orders), seed


def test_incremental_optimize_rewrites_only_named_values(spark, tmp_path):
    """compact_manifest_table(only_values=...) is the convergence
    OPTIMIZE: only the files whose recorded stats can contain a touched
    value are rewritten; every other file carries over verbatim (same
    name, size, mtime — never re-read), content parity holds, and the
    carried files keep their stats entries in the new manifest."""
    from dend_covid19_spark.operators.lakehouse import files_for_values

    root = str(tmp_path / "mt8")
    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "user_id", "value", F.to_date("ts").alias("day")
    )
    base = ev.where(F.col("day") <= F.lit("2024-01-10").cast("date"))
    batch = ev.where(F.col("day").isin("2024-01-11", "2024-01-12", "2024-01-13"))

    write_manifest_table(spark, base, root, n_files=2, cluster_by=["day"])
    base_files = set(current_manifest(root)["files"])
    append_manifest_table(spark, batch, root, n_files=3, cluster_by=["day"])
    m = current_manifest(root)
    batch_files = set(m["files"]) - base_files
    assert len(base_files) >= 2 and len(batch_files) >= 2, m["files"]

    def inv(files):
        return {
            f: (os.path.getsize(os.path.join(root, f)),
                os.path.getmtime(os.path.join(root, f)))
            for f in files
        }

    touched_vals = ["2024-01-11", "2024-01-12", "2024-01-13"]
    touched = files_for_values(m, "day", touched_vals)
    carried = [f for f in m["files"] if f not in set(touched)]
    # the stats resolve touched membership exactly: the batch's files
    # and only them (base days 01..10 cannot contain 11..13)
    assert set(touched) == batch_files and set(carried) == base_files
    carried_before = inv(carried)
    want = sorted(map(tuple, read_manifest_table(spark, root).collect()))

    rec = compact_manifest_table(
        spark, root, target_file_bytes=1 << 40, only_values=("day", touched_vals)
    )
    assert rec["files_rewritten"] == len(batch_files)
    assert rec["files_after"] == len(base_files) + 1  # carried + 1 rewritten

    m2 = current_manifest(root)
    assert set(carried) < set(m2["files"])
    assert inv(carried) == carried_before, "untouched files were rewritten"
    for f in carried:
        assert m2["file_stats"][f] == m["file_stats"][f]
    assert sorted(map(tuple, read_manifest_table(spark, root).collect())) == want
    # a touched set matching nothing is a no-op commit-free pass
    rec2 = compact_manifest_table(
        spark, root, only_values=("day", ["1999-01-01"])
    )
    assert rec2["files_rewritten"] == 0
    assert current_manifest(root)["version"] == m2["version"]


def test_txn_append_idempotent_across_compaction(spark, tmp_path):
    """txn=(app_id, batch_id) makes appends replay-safe: a duplicate
    batch commits nothing, the watermark survives compaction (txns
    carry forward), and only a HIGHER batch_id lands."""
    root = str(tmp_path / "mt9")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b0 = orders.where(F.col("o_orderkey") % 3 == 0)
    b1 = orders.where(F.col("o_orderkey") % 3 == 1)

    write_manifest_table(spark, b0, root, n_files=1)
    append_manifest_table(spark, b1, root, n_files=1, txn=("sink", 0))
    v_after = current_manifest(root)["version"]
    want = _digest(read_manifest_table(spark, root))

    # replay of batch 0: no commit, no duplicate rows
    append_manifest_table(spark, b1, root, n_files=1, txn=("sink", 0))
    assert current_manifest(root)["version"] == v_after
    assert _digest(read_manifest_table(spark, root)) == want

    # the watermark survives a full compaction
    compact_manifest_table(spark, root, target_file_bytes=1 << 40)
    append_manifest_table(spark, b1, root, n_files=1, txn=("sink", 0))
    m = current_manifest(root)
    assert m["version"] == v_after + 1  # compaction only
    assert _digest(read_manifest_table(spark, root)) == want
    assert m["txns"] == {"sink": 0}

    # a higher batch id is new work and lands
    b2 = orders.where(F.col("o_orderkey") % 3 == 2)
    append_manifest_table(spark, b2, root, n_files=1, txn=("sink", 1))
    assert _digest(read_manifest_table(spark, root)) == _digest(orders)
    assert current_manifest(root)["txns"] == {"sink": 1}


def test_read_table_auto_resolves_both_layouts(spark, tmp_path):
    """The migration shim: one reader call serves a hive-partitioned
    directory (Catalyst dir pruning) and a manifest table (pinned file
    list + stats pruning) identically — including the equality-filter
    path and the filter-matches-nothing empty result."""
    from dend_covid19_spark.sources.readers import read_table_auto

    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "user_id", "value", F.to_date("ts").cast("string").alias("day")
    )

    hive = str(tmp_path / "hive")
    ev.write.partitionBy("day").parquet(hive)
    mroot = str(tmp_path / "manifested")
    write_manifest_table(spark, ev, mroot, n_files=4, cluster_by=["day"])

    def dg(df):
        return sorted(
            (r.event_id, r.user_id, float(r.value), str(r.day)) for r in df.collect()
        )

    want_all = dg(ev)
    assert dg(read_table_auto(spark, hive)) == want_all
    assert dg(read_table_auto(spark, mroot)) == want_all

    want_day = dg(ev.where(F.col("day") == "2024-01-05"))
    assert want_day
    assert dg(read_table_auto(spark, hive, day="2024-01-05")) == want_day
    assert dg(read_table_auto(spark, mroot, day="2024-01-05")) == want_day
    # stats actually pruned the clustered manifest read
    from dend_covid19_spark.operators.lakehouse import files_for_values

    m = current_manifest(mroot)
    assert 0 < len(files_for_values(m, "day", ["2024-01-05"])) < len(m["files"])
    # filter matching nothing: empty frame with the table schema, both
    assert read_table_auto(spark, hive, day="1999-01-01").count() == 0
    out = read_table_auto(spark, mroot, day="1999-01-01")
    assert out.count() == 0 and set(ev.columns) <= set(out.columns)


def test_full_optimize_with_cluster_by_keeps_pruning_selective(spark, tmp_path):
    """OPTIMIZE of a clustered table must keep the manifest stats
    selective: compacting with cluster_by re-sorts into disjoint key
    ranges (strict-subset pruning survives, parity holds), while the
    default coalesce of interleaved appends produces full-span files —
    the documented reason pruned tables compact with their keys."""
    from dend_covid19_spark.operators.lakehouse import prune_files

    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = str(tmp_path / "mt10")
    # interleaved ingest: each append spans the whole key range
    write_manifest_table(
        spark, orders.where(F.col("o_orderkey") % 2 == 0), root, n_files=2
    )
    append_manifest_table(
        spark, orders.where(F.col("o_orderkey") % 2 == 1), root, n_files=2
    )
    keys = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    lo, hi = keys[0], keys[len(keys) // 10]
    want = _digest(
        read_manifest_table(spark, root).where(F.col("o_orderkey").between(lo, hi))
    )
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for f in current_manifest(root)["files"]
    )
    target = max(1, total // 4)  # force ~4 output files either way

    # default coalesce: interleaved inputs -> full-span outputs -> no
    # file can be skipped for the low range
    compact_manifest_table(spark, root, target_file_bytes=target)
    m = current_manifest(root)
    assert len(m["files"]) >= 2
    assert prune_files(m, "o_orderkey", lo, hi) == m["files"], (
        "expected coalesce to lose selectivity on interleaved input"
    )

    # clustered OPTIMIZE: selectivity restored, parity preserved
    compact_manifest_table(
        spark, root, target_file_bytes=target, cluster_by=["o_orderkey"]
    )
    m2 = current_manifest(root)
    assert len(m2["files"]) >= 2
    pruned = prune_files(m2, "o_orderkey", lo, hi)
    assert 0 < len(pruned) < len(m2["files"]), (pruned, m2["files"])
    got = _digest(
        read_manifest_table(spark, root, prune=("o_orderkey", lo, hi)).where(
            F.col("o_orderkey").between(lo, hi)
        )
    )
    assert got == want and got


def test_compaction_conflict_redoes_data_work(spark, tmp_path, monkeypatch):
    """The MVCC asymmetry's OTHER side: when a concurrent append wins
    the version mid-compaction, the compactor's rewritten files are
    STALE (they don't contain the appended rows) — the retry loop must
    re-read the winner's manifest and re-compact, never commit the
    stale set. Injected deterministically: the first compaction commit
    attempt is preceded by a racing append, forcing CommitConflict."""
    import dend_covid19_spark.operators.lakehouse as lh

    root = str(tmp_path / "mt11")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.where(F.col("o_orderkey") % 2 == 0)
    extra = orders.where(F.col("o_orderkey") % 2 == 1)
    write_manifest_table(spark, base, root, n_files=4)

    real_commit = lh._commit
    state = {"injected": False}

    def racing_commit(root_, files, parent, file_stats=None, txns=None, **kw):
        if not state["injected"]:
            state["injected"] = True
            lh.append_manifest_table(spark, extra, root_, n_files=1)
        return real_commit(root_, files, parent, file_stats=file_stats, txns=txns, **kw)

    monkeypatch.setattr(lh, "_commit", racing_commit)
    rec = compact_manifest_table(spark, root, target_file_bytes=1 << 40)
    assert state["injected"]
    # the retry saw the winner's 5-file manifest, not the stale 4
    assert rec["files_before"] == 5, rec
    assert rec["files_after"] == 1
    # v1 base, v2 the racing append, v3 the re-done compaction
    final = current_manifest(root)
    assert final["version"] == 3
    # nothing lost: the appended rows survived the conflicted compaction
    assert _digest(read_manifest_table(spark, root)) == _digest(orders)


def test_version_pin_and_history(spark, tmp_path):
    """AS-OF-VERSION reads via manifest_at_version are stable through
    later commits; manifest_table_history reports every retained
    version's shape; a vacuumed pin fails loudly at resolve time."""
    import pytest

    from dend_covid19_spark.operators.lakehouse import (
        manifest_at_version,
        manifest_table_history,
    )

    root = str(tmp_path / "mt12")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    h1 = orders.where(F.col("o_orderkey") % 2 == 0)
    h2 = orders.where(F.col("o_orderkey") % 2 == 1)
    write_manifest_table(spark, h1, root, n_files=2)
    append_manifest_table(spark, h2, root, n_files=1, txn=("w", 7))
    compact_manifest_table(spark, root, target_file_bytes=1 << 40)

    v1_digest = _digest(read_manifest_table(spark, root, manifest_at_version(root, 1)))
    assert v1_digest == _digest(h1)

    hist = manifest_table_history(root)
    assert [r["version"] for r in hist] == [1, 2, 3]
    assert hist[0]["n_files"] == 2 and hist[1]["n_files"] == 3
    assert hist[2]["n_files"] == 1  # compacted
    assert hist[1]["txns"] == {"w": 7} and hist[2]["txns"] == {"w": 7}
    assert all(r["bytes"] and r["bytes"] > 0 for r in hist)

    vacuum_manifest_table(root, keep_last=1, grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        manifest_at_version(root, 1)
    assert [r["version"] for r in manifest_table_history(root)] == [3]
    assert _digest(read_manifest_table(spark, root)) == _digest(orders)


def test_files_for_values_soundness_property():
    """Hypothesis property (pure metadata): for ANY file layout and ANY
    value set, files_for_values keeps every file containing a matching
    row — it may over-keep (missing stats, wide files) but can never
    drop one the values actually live in (the only_values OPTIMIZE's
    lossless-membership guarantee)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dend_covid19_spark.operators.lakehouse import files_for_values

    rows_per_file = st.lists(
        st.lists(st.integers(-50, 50), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=300, deadline=None)
    @given(files=rows_per_file,
           values=st.sets(st.integers(-60, 60), min_size=1, max_size=6),
           drop_stats=st.sets(st.integers(0, 5)))
    def check(files, values, drop_stats):
        names = [f"data/f{i}.parquet" for i in range(len(files))]
        stats = {
            n: ({} if i in drop_stats or not rs else {"k": [min(rs), max(rs)]})
            for i, (n, rs) in enumerate(zip(names, files))
        }
        manifest = {"files": names, "file_stats": stats}
        kept = set(files_for_values(manifest, "k", sorted(values)))
        for n, rs in zip(names, files):
            if any(v in values for v in rs):
                assert n in kept, (n, rs, sorted(values), stats[n])

    check()
