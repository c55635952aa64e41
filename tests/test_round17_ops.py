"""Round-17 surfaces: the r16 advice fixes on the lakehouse read/vacuum
paths (all-null stats marker, deterministic empty-prune schema,
mergeSchema through the migration shim, pointer-temp vacuum) plus the
convergence-design stretch pin — files_for_values is EXACT membership on
a clustered table, not just a sound superset."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest
from conftest import SF_DIR

from dend_covid19_spark.catalog import load_table
from dend_covid19_spark.operators.lakehouse import (
    _ALL_NULL,
    append_manifest_table,
    compact_manifest_table,
    current_manifest,
    files_for_values,
    prune_files,
    read_manifest_table,
    write_manifest_table,
)


def _digest(df):
    return sorted(map(tuple, df.collect()))


def test_all_null_column_records_marker_and_prunes(spark, tmp_path):
    """An entirely-NULL column records the explicit _ALL_NULL marker in
    the manifest stats (not a missing entry): pruning for any non-null
    value SKIPS the file — it provably cannot match — while a genuinely
    missing entry still widens. A column with nulls in some row groups
    but values in others keeps a valid merged range."""
    root = str(tmp_path / "an")
    df = spark.createDataFrame(
        [(i, None, i % 3) for i in range(20)], "k int, dead int, third int"
    )
    write_manifest_table(spark, df, root, n_files=1)
    m = current_manifest(root)
    (f,) = m["files"]
    st = m["file_stats"][f]
    assert st["dead"] == _ALL_NULL, st
    assert st["k"] == [0, 19] and st["third"] == [0, 2], st

    # all-null: pruned for every non-null probe; range/missing: kept
    assert files_for_values(m, "dead", [0]) == []
    assert prune_files(m, "dead", -100, 100) == []
    assert files_for_values(m, "k", [5]) == [f]
    assert files_for_values(m, "no_stats_col", [5]) == [f]  # missing widens

    # the exact predicate on top of the pruned-empty plan stays correct
    got = read_manifest_table(spark, root, prune=("dead", 0, 0)).where(
        F.col("dead") == 0
    )
    assert got.count() == 0


def test_allnull_day_file_not_rewritten_by_scoped_optimize(spark, tmp_path):
    """The r16 advice hazard (streaming/daily.py only_values mode): a
    committed file whose 'day' is entirely NULL used to widen into every
    subsequent scoped OPTIMIZE's touched set and be rewritten each batch
    forever. With the _ALL_NULL marker it prunes: two successive scoped
    OPTIMIZEs over real days leave the all-null file byte-untouched and
    rewrite only the matching files."""
    root = str(tmp_path / "nd")
    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "value", F.to_date("ts").alias("day")
    )
    days = sorted(
        r.day.isoformat()
        for r in ev.select("day").distinct().collect()
        if r.day is not None
    )
    assert len(days) >= 2
    d0, d1 = days[0], days[1]
    base = ev.where(F.col("day").isNotNull())
    write_manifest_table(spark, base, root, n_files=2, cluster_by=["day"])
    # the all-null-day batch (late/unparseable timestamps in production)
    null_batch = base.limit(50).withColumn("day", F.lit(None).cast("date"))
    append_manifest_table(spark, null_batch, root, n_files=1, cluster_by=["day"])
    m = current_manifest(root)
    null_files = [f for f in m["files"] if m["file_stats"][f].get("day") == _ALL_NULL]
    assert len(null_files) == 1, m["file_stats"]
    (nf,) = null_files
    nf_mtime = os.path.getmtime(os.path.join(root, nf))

    for probe in (d0, d1):
        assert nf not in files_for_values(current_manifest(root), "day", [probe])
        rec = compact_manifest_table(spark, root, only_values=("day", [probe]))
        assert rec["files_rewritten"] >= 1
        m2 = current_manifest(root)
        assert nf in set(m2["files"]), "all-null file must carry over verbatim"
        assert os.path.getmtime(os.path.join(root, nf)) == nf_mtime, (
            "scoped OPTIMIZE rewrote the all-null-day file (the forever-rewrite bug)"
        )
        # its stats entry carries forward too (still prunable next round)
        assert m2["file_stats"][nf].get("day") == _ALL_NULL

    # nothing lost: the table still digests to base + the null batch
    got = read_manifest_table(spark, root).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    )
    want = base.unionByName(null_batch).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    )
    assert _digest(got) == _digest(want)


def test_empty_prune_schema_deterministic_after_evolution(spark, tmp_path):
    """A fully-pruned scan must return the FULL table schema even with
    merge_schema=False: the old single-footer fallback picked the
    lexically-first uuid-named file, so after schema evolution the empty
    result's columns were nondeterministic (advice r16)."""
    root = str(tmp_path / "ep")
    orders = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_totalprice")
    write_manifest_table(spark, orders, root, n_files=2, cluster_by=["o_orderkey"])
    append_manifest_table(
        spark,
        orders.limit(5).withColumn("evolved_tag", F.lit("b2")),
        root,
        n_files=1,
    )
    hi = max(r.o_orderkey for r in read_manifest_table(spark, root).collect())
    empty = read_manifest_table(spark, root, prune=("o_orderkey", hi + 10, hi + 20))
    assert empty.count() == 0
    assert "evolved_tag" in empty.columns, (
        "empty-prune fallback dropped the evolved column (single-footer read)"
    )


def test_vacuum_reaps_aged_pointer_temps(spark, tmp_path):
    """A crash between _publish_pointer's temp write and its os.replace
    leaks '._latest.tmp.*' in the table root; vacuum now sweeps aged
    ones and leaves young ones (an in-flight publish) alone."""
    from dend_covid19_spark.operators.lakehouse import vacuum_manifest_table

    root = str(tmp_path / "vt")
    df = spark.createDataFrame([(1,), (2,)], "k int")
    write_manifest_table(spark, df, root, n_files=1)

    aged = os.path.join(root, "._latest.tmp.999.deadbeef")
    young = os.path.join(root, "._latest.tmp.999.cafecafe")
    for p in (aged, young):
        with open(p, "w") as fh:
            fh.write("m1.json")
    old = time.time() - 48 * 3600
    os.utime(aged, (old, old))

    deleted = vacuum_manifest_table(root, keep_last=2)
    assert not os.path.exists(aged), deleted
    assert os.path.exists(young), "young pointer temp must survive the grace window"
    assert os.path.basename(aged) in deleted
    # the table itself is untouched
    assert read_manifest_table(spark, root).count() == 2


def test_read_table_auto_merges_evolved_schema_and_guards_empty(spark, tmp_path):
    """The migration shim (sources/readers.py::read_table_auto) reads the
    manifest branch with mergeSchema — a column added by a schema-
    evolving append survives (advice r16 medium) — returns the full
    schema on a prune-to-empty filter, and fails loudly on a manifest
    referencing zero files instead of handing Spark a path-less read."""
    from dend_covid19_spark.operators.lakehouse import _commit
    from dend_covid19_spark.sources.readers import read_table_auto

    root = str(tmp_path / "ta")
    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "event_type", "value", F.to_date("ts").alias("day")
    ).where(F.col("day").isNotNull())
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    write_manifest_table(spark, ev, root, n_files=2, cluster_by=["day"])
    append_manifest_table(
        spark, ev.limit(7).withColumn("evolved_tag", F.lit("b2")), root, n_files=1
    )

    # evolved column survives an unfiltered read through the shim
    full = read_table_auto(spark, root)
    assert "evolved_tag" in full.columns
    assert full.count() == ev.count() + 7

    # pruned read: correct rows, evolved schema intact
    d0 = days[0]
    got = read_table_auto(spark, root, day=d0)
    assert "evolved_tag" in got.columns
    want_n = ev.where(F.col("day") == F.lit(d0)).count()
    assert got.where(F.col("evolved_tag").isNull()).count() == want_n

    # prune-to-empty: 0 rows, full schema (no lexically-first footer)
    import datetime

    far = days[-1] + datetime.timedelta(days=400)
    empty = read_table_auto(spark, root, day=far)
    assert empty.count() == 0 and "evolved_tag" in empty.columns

    # empty manifest fails loudly
    root2 = str(tmp_path / "ta_empty")
    os.makedirs(root2, exist_ok=True)
    _commit(root2, [], parent=0)
    with pytest.raises(FileNotFoundError):
        read_table_auto(spark, root2)


def test_migrated_compaction_row_exact_and_lossless(spark, duck):
    """The migrated compaction_incremental_events (manifest-commit build
    since r17): on the canonical single-month corpus the touched
    resolution is EXACTLY the six staged debris files (no healthy file
    widened in), the scoped OPTIMIZE left every healthy file
    mtime-stable (re-asserted inside the row each invocation), and the
    digest still matches the DuckDB oracle over the original parquet."""
    import json

    from conftest import assert_matches_oracle

    from dend_covid19_spark import plans
    from dend_covid19_spark.plans.ingest import (
        _manifest_compacted_events_root,
        compaction_incremental_events,
    )

    df = compaction_incremental_events(spark, SF_DIR)
    root = _manifest_compacted_events_root(spark, SF_DIR)
    with open(os.path.join(root, "_migration_audit.json")) as fh:
        audit = json.load(fh)
    assert sorted(audit["touched"]) == sorted(audit["debris_files"]), (
        "canonical corpus: touched must be exactly the debris files"
    )
    assert audit["untouched"], "no healthy files carried over"
    assert audit["rec"]["files_rewritten"] == 6

    assert_matches_oracle(
        df, duck,
        plans.all_oracles()["compaction_incremental_events"],
        name="compaction_incremental_events",
    )


def test_files_for_values_exact_on_clustered_table(spark, tmp_path):
    """Convergence-design stretch, first stage (r16 verdict item 7): on
    a day-CLUSTERED table, files_for_values' range-containment
    resolution is EXACT partition membership — for every distinct day it
    returns precisely the files that physically contain rows of that
    day, not a wider superset. This is what lets the manifest's footer
    stats double as Iceberg-style partition values without a separate
    partition spec (the explicit-spec evolution is r18's row)."""
    root = str(tmp_path / "ex")
    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", F.to_date("ts").alias("day")
    ).where(F.col("day").isNotNull())
    write_manifest_table(spark, ev, root, n_files=6, cluster_by=["day"])
    m = current_manifest(root)

    # ground truth: which files actually hold rows of each day
    actual: dict[str, set[str]] = {}
    for f in m["files"]:
        for r in (
            spark.read.parquet(os.path.join(root, f)).select("day").distinct().collect()
        ):
            actual.setdefault(r.day.isoformat(), set()).add(f)

    for day, owners in actual.items():
        resolved = set(files_for_values(m, "day", [day]))
        assert resolved == owners, (
            f"day {day}: resolved {sorted(resolved)} != actual {sorted(owners)}"
        )
