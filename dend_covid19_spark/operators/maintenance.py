"""Table-maintenance operators: small-file compaction and range-
clustered (sort-ordered) rewrites.

At 100 TB these are the jobs that keep read performance from decaying:
streaming/incremental writers emit thousands of small files (each a
task + an open cost per scan), and unclustered data defeats parquet
min/max row-group pruning. The reference never needs these (its output
is ~1 row/day — SURVEY.md §6), but any engine serving its workload at
scale does.

No new execution machinery: compaction is a size-aware coalesce-write,
clustering is repartitionByRange + sortWithinPartitions — both pure
DataFrame plans, so they distribute like any other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size of ``path`` through the Hadoop FileSystem API,
    so any URI Spark itself can read (file://, hdfs://, s3a://) sizes
    correctly — an os.walk would silently return 0 for remote stores and
    collapse compaction to a single output file. Hidden/underscore
    entries (_SUCCESS, .crc) are excluded like FileSourceScanExec does.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            total += status.getLen()
    return total


def partition_file_stats(root: str) -> dict[str, dict]:
    """Per-leaf-partition file inventory of a ``key=value``-partitioned
    parquet directory: ``{rel_partition: {"n_files": int, "bytes": int,
    "files": {rel_file: [size, mtime_ns]}}}``. Hidden/underscore entries
    (_SUCCESS, .crc, manifests) are excluded, matching what
    FileSourceScanExec scans.

    Driver-side metadata only — at 100 TB this is one recursive listing
    (or a catalog/manifest read on a lakehouse table), never a data
    scan; it is the input that makes compaction STATS-DRIVEN instead of
    a blind full rewrite."""
    import os

    out: dict[str, dict] = {}
    for dirpath, dirs, files in os.walk(root):
        # prune hidden/underscore subtrees in place (swap debris,
        # _temporary) — FileSourceScanExec never descends into them
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        data = [f for f in files if not f.startswith(("_", "."))]
        if not data:
            continue
        rel = os.path.relpath(dirpath, root)
        ent = out.setdefault(rel, {"n_files": 0, "bytes": 0, "files": {}})
        for f in data:
            st = os.stat(os.path.join(dirpath, f))
            ent["n_files"] += 1
            ent["bytes"] += st.st_size
            ent["files"][f] = [st.st_size, st.st_mtime_ns]
    return out


def compact_partitions(
    spark: SparkSession,
    root: str,
    max_files: int = 4,
    target_file_bytes: int = 128 * 1024 * 1024,
    only_partitions: set[str] | None = None,
    max_concurrent_rewrites: int = 8,
) -> dict[str, dict]:
    """Selective (stats-driven) partition compaction — the incremental
    OPTIMIZE: rewrite ONLY the leaf partitions whose small-file count
    breaches ``max_files``, coalescing each to ceil(bytes/target) files;
    healthy partitions are left byte-untouched (not re-read, not
    re-written). Returns a manifest ``{rel_partition: {files_before,
    bytes_before, files_after, rewritten}}``.

    Why selective matters at 100 TB: streaming ingest fragments only the
    partitions it touched (today's), so daily maintenance must cost
    O(fragmented bytes), not O(table) — a blind ``compact_small_files``
    over the root re-shuffles years of already-compact history. The
    breach rule reads driver-side listing metadata only.

    Each rewrite is a per-partition read->coalesce->write into a DOT-
    PREFIXED sibling temp dir, then a swap (retire old dir to a dot-
    prefixed name, rename temp in, drop old). The dot prefix matters:
    a bare ``part.__compacting`` sibling still PARSES as a key=value
    partition directory ("0.__compacting" as the value), so crash
    debris would be scanned as a phantom partition — hidden names are
    invisible to FileSourceScan by the same rule that hides _SUCCESS.
    Every crash window is recovered on the next run (``_recover_swaps``
    below): orphaned temp dirs are discarded, a retired dir whose live
    partition is missing (death between the two renames) is restored.
    Readers that listed files BEFORE the swap can lose them —
    single-writer maintenance-window semantics, the same contract as
    Hive/plain-parquet compaction; a lakehouse table format turns this
    swap into an atomic metadata commit and that is the production
    deployment for concurrent readers. The minimal form of that commit
    (immutable data files + immutable manifests + an atomic pointer
    flip, readers pin a manifest) is prototyped in
    ``operators/lakehouse.py`` with the concurrent-reader property
    under test — the upgrade path when this table must serve reads
    DURING maintenance. coalesce (not repartition) keeps
    the rewrite shuffle-free: each output task reads whole input files.
    """
    import os
    import shutil

    if only_partitions is not None:
        # post-ingest mode: a micro-batch writer knows exactly which
        # partitions it touched (distinct partition values of the batch
        # — a tiny aggregate), so maintenance lists ONLY those leaf
        # dirs and recovers swap debris only beside them — O(touched)
        # driver metadata instead of O(table), for real: the full
        # recursive walk below never runs (before r15 this mode still
        # paid two O(table) listings per micro-batch). Debris parked
        # beside an UNTOUCHED partition stays hidden (invisible to
        # scans) until the next full-table run repairs it. Rel paths,
        # e.g. {"event_date=2024-01-03"}.
        stats = {}
        for part in sorted(only_partitions):
            # a touched "partition" must be a relative path strictly
            # inside the root: "." / "" / ".." / an absolute path would
            # make the swap below retire the dataset root (or a dir
            # outside it) wholesale — reject loudly, these can only be
            # caller bugs
            # reject exactly the traversal forms ('..' itself or a
            # '../'-prefixed path) — a partition VALUE that merely
            # begins with two dots (key=..x) is a legal leaf dir name
            norm = os.path.normpath(part)
            if (
                norm in (".", "", "..")
                or norm.startswith(".." + os.sep)
                or os.path.isabs(norm)
            ):
                raise ValueError(f"invalid touched-partition path {part!r}")
            live = os.path.join(root, part)
            _recover_swap_debris(live)
            ent = partition_file_stats(live).get(".")
            if ent is not None:
                stats[part] = ent
    else:
        _recover_swaps(root)
        stats = partition_file_stats(root)
        if "." in stats:
            raise ValueError(
                "data files at the dataset root — not a key=value partitioned "
                "layout; use compact_small_files for flat directories"
            )
    def _rewrite(part: str) -> int:
        """Rewrite one breaching partition (read -> coalesce -> write ->
        swap) and return its post-swap file count. Each rewrite touches
        only its own leaf dir, so rewrites are fully independent."""
        ent = stats[part]
        src = os.path.join(root, part)
        tmp = _hidden_sibling(src, _COMPACTING_SUFFIX)
        retired = _hidden_sibling(src, _RETIRED_SUFFIX)
        n_out = max(1, -(-ent["bytes"] // target_file_bytes))
        # mergeSchema: micro-batch appends may have EVOLVED a
        # partition's file schema (an added column present only in
        # newer files); a single-footer read would silently drop
        # that column from the files that had it — a lossy
        # "lossless" compaction. The merge costs one footer per
        # file of THIS breaching partition only (bounded by the
        # breach threshold, never an O(table) sweep).
        spark.read.option("mergeSchema", True).parquet(src).coalesce(
            n_out
        ).write.parquet(tmp)
        os.rename(src, retired)
        os.rename(tmp, src)
        shutil.rmtree(retired)
        return len(partition_file_stats(src).get(".", {"files": {}})["files"])

    manifest: dict[str, dict] = {}
    for part in sorted(stats):
        ent = stats[part]
        manifest[part] = {
            "files_before": ent["n_files"],
            "bytes_before": ent["bytes"],
            "files_after": ent["n_files"],
            "rewritten": False,
        }
    breaching = [p for p in sorted(stats) if stats[p]["n_files"] > max_files]
    if len(breaching) == 1:
        manifest[breaching[0]]["files_after"] = _rewrite(breaching[0])
        manifest[breaching[0]]["rewritten"] = True
    elif breaching:
        # Overlap the independent per-partition rewrite jobs from a small
        # driver thread pool instead of draining them one Spark job at a
        # time: each rewrite is a tiny single-partition job whose tail
        # would otherwise leave the cluster idle, and a micro-batch that
        # touched N days pays ~N sequential job latencies. Bounded pool —
        # enough in flight to fill the tail, not enough to fight for
        # executors; each thread's renames stay confined to its own leaf.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(len(breaching), max_concurrent_rewrites)
        ) as pool:
            for part, n_after in zip(breaching, pool.map(_rewrite, breaching)):
                manifest[part]["files_after"] = n_after
                manifest[part]["rewritten"] = True
    return manifest


_COMPACTING_SUFFIX = ".__compacting"
_RETIRED_SUFFIX = ".__retired"


def _hidden_sibling(path: str, suffix: str) -> str:
    """``.../.name<suffix>`` beside ``.../name`` — same filesystem (the
    renames stay atomic) and dot-prefixed (invisible to scans)."""
    import os

    d, b = os.path.split(path)
    return os.path.join(d, "." + b + suffix)


def _recover_swap_debris(live: str) -> None:
    """Repair swap debris beside ONE specific directory (the scoped
    form of ``_recover_swaps`` — same crash windows, same repairs, but
    O(1) stat calls instead of a recursive walk): discard an orphaned
    ``.name.__compacting`` temp, restore ``.name.__retired`` when the
    live dir is missing (death between the two renames), drop it when
    the live dir survived (the swap completed)."""
    import os
    import shutil

    tmp = _hidden_sibling(live, _COMPACTING_SUFFIX)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    retired = _hidden_sibling(live, _RETIRED_SUFFIX)
    if os.path.isdir(retired):
        if os.path.isdir(live):
            shutil.rmtree(retired)
        else:
            os.rename(retired, live)


def _recover_swaps(root: str) -> None:
    """Repair crash debris from an interrupted compact_partitions run.

    Crash windows and their repair, in swap order:
      - died during/after the temp write, before the renames ->
        ``.name.__compacting`` exists, live dir intact: discard temp
        (it may be a partial write; rebuild is cheap and safe);
      - died between the two renames -> ``.name.__retired`` exists and
        the live dir is MISSING: restore the retired dir (the data was
        never gone, only hidden — this is the window a lakehouse
        metadata commit closes atomically);
      - died before the retired cleanup -> both retired and live exist:
        the swap completed, drop the retired copy.

    Walks EVERY directory level (a multi-key layout parks debris inside
    the outer partition dirs, e.g. ``k1=a/.k2=b.__retired``), without
    descending into the debris itself."""
    import os
    import shutil

    for dirpath, dirs, _files in os.walk(root):
        hidden = [d for d in dirs if d.startswith(".")]
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for name in hidden:
            full = os.path.join(dirpath, name)
            if name.endswith(_COMPACTING_SUFFIX):
                shutil.rmtree(full)
            elif name.endswith(_RETIRED_SUFFIX):
                live = os.path.join(
                    dirpath, name[1 : -len(_RETIRED_SUFFIX)]
                )
                if os.path.isdir(live):
                    shutil.rmtree(full)
                else:
                    os.rename(full, live)


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a many-small-files parquet directory into ~target-size
    files. Returns the number of output files requested.

    The file count comes from the *actual* input byte size (driver-side
    filesystem metadata, not a data scan), so compaction of a 10 TB
    table plans exactly ceil(10 TB / target) tasks. ``coalesce`` (not
    ``repartition``) avoids a shuffle: each output task reads whole
    input files. Use this after streaming ingest; pair with
    ``cluster_by_range`` when reads filter on a key.
    """
    n_files = max(1, -(-_dir_bytes(spark, in_path) // target_file_bytes))
    df = spark.read.parquet(in_path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def cluster_by_range(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str],
    out_path: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` range-partitioned and sorted on ``keys`` so each
    output file owns a disjoint key range — parquet footer min/max
    stats then let any engine (Spark, DuckDB, Trino) skip whole files
    for selective key predicates.

    repartitionByRange samples the key distribution (so skewed keys
    still split evenly) and gives disjoint ranges across files;
    sortWithinPartitions orders rows inside each file so row-group
    stats are tight too. This is the batch form of clustering/Z-order
    for the single-key case; for multi-key locality use
    ``cluster_by_zorder``.
    """
    (
        df.repartitionByRange(n_files, *keys)
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .parquet(out_path)
    )


ZORDER_BITS = 16  # per-dimension resolution of the space-filling curve


def zorder_key(df: DataFrame, keys: list[str], bits: int = ZORDER_BITS):
    """A Z-order (Morton) key column over numeric ``keys``.

    Each key is min/max-normalized to a ``bits``-bit integer (the
    min/max pass is one tiny 2-scalars-per-key aggregate, collected once
    — never data), then the bit planes are interleaved with a codegen'd
    fold: bit i of dimension d lands at position i*|keys| + d. Rows
    close on the curve are close in EVERY key dimension, so sorting by
    this one column gives multi-key file/row-group locality.
    """
    from pyspark.sql import functions as F

    aggs = []
    for k in keys:
        aggs += [F.min(k).alias(f"__min_{k}"), F.max(k).alias(f"__max_{k}")]
    stats = df.agg(*aggs).collect()[0]
    scaled = []
    for k in keys:
        lo, hi = float(stats[f"__min_{k}"]), float(stats[f"__max_{k}"])
        span = hi - lo if hi > lo else 1.0
        scaled.append(
            f"CAST(((CAST({k} AS DOUBLE) - {lo!r}) / {span!r}) * {(1 << bits) - 1} AS BIGINT)"
        )
    planes = " + ".join(
        f"shiftleft(shiftright({expr}, i) & 1L, CAST(i * {len(keys)} + {d} AS INT))"
        for d, expr in enumerate(scaled)
    )
    return F.expr(f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + {planes})")


def cluster_by_zorder(
    spark: SparkSession,
    df: DataFrame,
    keys: list[str],
    out_path: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` clustered on the Z-order curve over ``keys`` — the
    multi-key generalization of ``cluster_by_range``: every output file
    (and row group) covers a small hyper-rectangle of the key space, so
    parquet footer min/max stats prune files for selective predicates on
    ANY of the keys, not just the leading one.

    Same plan shape as cluster_by_range (range-partition + local sort on
    the derived key; the curve key is dropped from the output): one
    shuffle, linear in data, no driver data path. This is what
    engine-level CLUSTER BY / OPTIMIZE ZORDER BY compile to.
    """
    zkey = zorder_key(df, keys, bits).alias("__zorder")
    (
        df.withColumn("__zorder", zkey)
        .repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def compact_snapshot_version(
    spark: SparkSession,
    target_dir: str,
    version: int,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact ONE committed snapshot version dir (``target_dir/v{n}``)
    in place — layout repair that must never break AS-OF reads: the
    rewrite goes to a dot-prefixed sibling (invisible to the version
    resolver, which only matches ``v(\\d+)`` names), the swap is the
    same retire/rename/drop sequence as compact_partitions, and the
    compacted dir carries its own Spark-written _SUCCESS so
    ``read_snapshot``'s committed-only rule still holds at every
    instant: before the swap readers serve the old files, after it the
    new — never a partial mix (single-writer maintenance window, as
    everywhere in this module). Content is byte-for-byte the same rows
    (coalesce re-packs whole files, no shuffle). Returns the requested
    output file count.

    Why per-version: snapshot versions are immutable after commit, so
    compaction never races the writer (which only ever creates NEW
    v{n+1} dirs) — the one maintenance job here that is safe to run
    beside live ingest.

    Crash recovery (r14 advice): function entry first repairs debris
    from ANY previously interrupted run over the whole target_dir — a
    death between the two swap renames leaves ``v{n}`` hidden as
    ``.v{n}.__retired``, which would make ``read_snapshot``'s latest
    read silently time-travel BACKWARD to the previous version and a
    rerun raise FileNotFoundError instead of repairing. Same repair
    table as ``_recover_swaps`` (restore retired when live is missing,
    drop it when live exists, discard orphaned temps); a restored
    version still carries its original _SUCCESS, so the committed-only
    read rule holds throughout. Schema note: a version dir is written
    by ONE Spark job (one schema), so the single-footer read here can
    never drop an evolved column the way a multi-writer partition
    could — no mergeSchema needed."""
    import os

    import shutil

    recover_snapshot_swaps(target_dir)
    src = os.path.join(target_dir, f"v{version}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        raise FileNotFoundError(f"no committed snapshot v{version} under {target_dir}")
    n_files = max(1, -(-_dir_bytes(spark, src) // target_file_bytes))
    tmp = _hidden_sibling(src, _COMPACTING_SUFFIX)
    retired = _hidden_sibling(src, _RETIRED_SUFFIX)
    spark.read.parquet(src).coalesce(n_files).write.parquet(tmp)
    os.rename(src, retired)
    os.rename(tmp, src)
    shutil.rmtree(retired)
    return n_files


def recover_snapshot_swaps(target_dir: str) -> None:
    """Repair crash debris from an interrupted ``compact_snapshot_version``
    run: one flat listing of ``target_dir`` (version stores are flat by
    construction — ``v{n}`` dirs only), applying the standard swap
    repair to every hidden sibling. Called at compaction entry; safe to
    call from operational tooling before reads too (single-writer
    maintenance window, like all swaps in this module)."""
    import os

    if not os.path.isdir(target_dir):
        return
    for name in os.listdir(target_dir):
        if not name.startswith("."):
            continue
        if name.endswith(_COMPACTING_SUFFIX):
            base = name[1 : -len(_COMPACTING_SUFFIX)]
        elif name.endswith(_RETIRED_SUFFIX):
            base = name[1 : -len(_RETIRED_SUFFIX)]
        else:
            continue
        if os.path.isdir(os.path.join(target_dir, name)):
            _recover_swap_debris(os.path.join(target_dir, base))


def vacuum_snapshot_versions(target_dir: str, keep_last: int = 2) -> list[str]:
    """Retention for the versioned MERGE snapshots that
    streaming.daily.run_upsert_foreach_batch writes (``target_dir/v{n}``):
    delete all but the newest ``keep_last`` versions, returning the
    deleted paths. The no-Delta equivalent of VACUUM — old versions
    exist only to let in-flight readers finish, so retention is a
    count (or age) policy, never "delete immediately after commit".

    Driver-side directory walk + delete: version counts are small by
    construction (one per micro-batch, already compacted), so this
    never touches executors. keep_last >= 1 is enforced — the newest
    version is the live snapshot."""
    import os
    import re
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the live snapshot)")
    if not os.path.isdir(target_dir):
        return []
    versions = []
    for name in os.listdir(target_dir):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.isdir(os.path.join(target_dir, name)):
            versions.append((int(m.group(1)), name))
    versions.sort()
    doomed = versions[:-keep_last] if keep_last < len(versions) else []
    deleted = []
    for _, name in doomed:
        path = os.path.join(target_dir, name)
        shutil.rmtree(path)
        deleted.append(path)
    return deleted
