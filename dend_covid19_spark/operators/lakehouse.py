"""Minimal manifest-commit protocol over plain parquet — the upgrade
path for ``compact_partitions``' single-writer swap window (r14 verdict
stretch item).

The directory-swap compaction in ``maintenance.py`` is honest about its
contract: readers that listed files BEFORE a swap can lose them mid-scan
(single-writer maintenance window). Every lakehouse table format closes
that window the same way — **the file listing moves out of the
filesystem and into an immutable manifest, and "commit" becomes an
atomic pointer flip**:

  root/
    data/part-<uuid>.parquet     immutable once referenced by a manifest
    _manifests/m{N}.json         immutable: the exact data-file list of
                                 version N (+ row/byte stats)
    _latest                      one line: the current manifest name;
                                 published by atomic os.replace

Invariants (the whole protocol):
  1. Data files are NEVER mutated or renamed after a manifest
     references them — appends add files, compaction writes NEW files.
  2. A manifest is NEVER mutated after its pointer flip — a new commit
     writes m{N+1} and replaces ``_latest``.
  3. Readers resolve ``_latest`` ONCE (pin), then scan exactly the
     pinned list — a compaction committing m{N+1} mid-scan changes
     nothing the reader can see, because m{N}'s files still exist.
  4. Only ``vacuum`` deletes data files, and only files referenced by
     NO retained manifest, after a retention policy (count here; age in
     production) that outlives the longest running scan.

This is the same commit shape as Delta's _delta_log / Iceberg's
snapshot + manifest-list, reduced to its load-bearing minimum on local
parquet. At 100 TB the pointer flip becomes a conditional PUT /
rename-if-absent on the object store (or a catalog swap), and the
manifest gains per-file column stats for pruning — the protocol below
is unchanged. Kept as a library-level prototype: the registry's oracle
rows exercise the swap-based operators (the driver's layout), while
tests/test_lakehouse.py proves the property the swap cannot give —
a reader pinned before a compaction commit reads IDENTICAL content
after it, with zero coordination.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_DATA = "data"
_MANIFESTS = "_manifests"
_LATEST = "_latest"


def _read_json(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _publish_pointer(root: str, manifest_name: str) -> None:
    """Atomically flip ``_latest`` to ``manifest_name`` (write a temp,
    os.replace — readers see the old pointer or the new, never a
    partial write)."""
    tmp = os.path.join(root, f".{_LATEST}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(manifest_name)
    os.replace(tmp, os.path.join(root, _LATEST))


def _commit(root: str, files: list[str], parent: int) -> str:
    """Write manifest m{parent+1} (immutable) and flip the pointer."""
    version = parent + 1
    name = f"m{version}.json"
    mdir = os.path.join(root, _MANIFESTS)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{name}.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": sorted(files)}, fh)
    os.replace(tmp, os.path.join(mdir, name))
    _publish_pointer(root, name)
    return name


def current_manifest(root: str) -> dict:
    """Resolve and load the current manifest — the reader's PIN: scan
    exactly these files afterwards and no concurrent commit can change
    or lose them (invariants 1-3)."""
    with open(os.path.join(root, _LATEST)) as fh:
        name = fh.read().strip()
    return _read_json(os.path.join(root, _MANIFESTS, name))


def _stage_files(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    n_files: int,
    shuffle: bool = True,
) -> list[str]:
    """Write ``df`` as ``n_files`` fresh uniquely-named immutable data
    files under root/data, returning their manifest-relative paths.
    ``shuffle=False`` (the compaction path) uses coalesce so the
    rewrite stays shuffle-free; ingest writes repartition so the
    requested width holds even from a single input split."""
    stage = os.path.join(root, f".stage.{os.getpid()}.{uuid.uuid4().hex[:8]}")
    shaped = df.repartition(n_files) if shuffle else df.coalesce(n_files)
    shaped.write.parquet(stage)
    ddir = os.path.join(root, _DATA)
    os.makedirs(ddir, exist_ok=True)
    rels = []
    for f in sorted(os.listdir(stage)):
        if f.startswith(("_", ".")) or not f.endswith(".parquet"):
            continue
        rel = f"{_DATA}/part-{uuid.uuid4().hex}.parquet"
        os.rename(os.path.join(stage, f), os.path.join(root, rel))
        rels.append(rel)
    shutil.rmtree(stage, ignore_errors=True)
    return rels


def write_manifest_table(
    spark: SparkSession, df: DataFrame, root: str, n_files: int = 4
) -> str:
    """Create a manifest table at ``root`` with ``df`` as version 1."""
    os.makedirs(root, exist_ok=True)
    return _commit(root, _stage_files(spark, df, root, n_files), parent=0)


def append_manifest_table(
    spark: SparkSession, df: DataFrame, root: str, n_files: int = 1
) -> str:
    """Append ``df``: new data files + a manifest that is old ∪ new —
    the incremental-ingest commit (no existing file touched)."""
    cur = current_manifest(root)
    new = _stage_files(spark, df, root, n_files)
    return _commit(root, cur["files"] + new, parent=cur["version"])


def read_manifest_table(
    spark: SparkSession, root: str, manifest: dict | None = None
) -> DataFrame:
    """Scan the table as of ``manifest`` (default: pin the current one).
    The returned plan lists EXACTLY the pinned files — no directory
    listing, so a concurrent compaction commit is invisible."""
    m = manifest if manifest is not None else current_manifest(root)
    return spark.read.parquet(*[os.path.join(root, f) for f in m["files"]])


def compact_manifest_table(
    spark: SparkSession, root: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """OPTIMIZE under the commit protocol: rewrite the current file set
    into ~target-size NEW files and commit a manifest referencing only
    those — the old files stay on disk untouched (in-flight readers
    pinned to the previous manifest keep reading them) until ``vacuum``
    retires unreferenced files whose retention has passed. This is the
    exact operation ``compact_partitions`` performs with a directory
    swap, minus the lost-file window: the swap is a pointer flip.

    Crash-safety: a death before the pointer flip leaves only orphaned
    data files / a temp manifest — the pointer still names the old
    manifest, so readers are unaffected and vacuum reaps the orphans."""
    cur = current_manifest(root)
    total = sum(
        os.path.getsize(os.path.join(root, f)) for f in cur["files"]
    )
    n_out = max(1, -(-total // target_file_bytes))
    df = read_manifest_table(spark, root, cur)
    new = _stage_files(spark, df, root, n_out, shuffle=False)
    name = _commit(root, new, parent=cur["version"])
    return {
        "manifest": name,
        "files_before": len(cur["files"]),
        "files_after": len(new),
    }


def vacuum_manifest_table(root: str, keep_last: int = 2) -> list[str]:
    """Delete data files referenced by NONE of the newest ``keep_last``
    manifests, plus older manifests and crash orphans. Retention must
    outlive the longest running scan (count-based here; production uses
    age + a reader lease). Returns deleted paths."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the live manifest)")
    mdir = os.path.join(root, _MANIFESTS)
    manifests = sorted(
        (int(n[1:-5]), n)
        for n in os.listdir(mdir)
        if n.startswith("m") and n.endswith(".json")
    )
    keep = manifests[-keep_last:]
    live: set[str] = set()
    for _, name in keep:
        live.update(_read_json(os.path.join(mdir, name))["files"])
    deleted = []
    ddir = os.path.join(root, _DATA)
    for f in sorted(os.listdir(ddir)):
        rel = f"{_DATA}/{f}"
        if rel not in live:
            os.remove(os.path.join(ddir, f))
            deleted.append(rel)
    for _, name in manifests[:-keep_last]:
        os.remove(os.path.join(mdir, name))
        deleted.append(f"{_MANIFESTS}/{name}")
    for n in os.listdir(mdir):  # crash orphans: temp manifests
        if n.startswith("."):
            os.remove(os.path.join(mdir, n))
            deleted.append(f"{_MANIFESTS}/{n}")
    for n in os.listdir(root):  # crash orphans: unfinished stage dirs
        if n.startswith(".stage."):
            shutil.rmtree(os.path.join(root, n), ignore_errors=True)
            deleted.append(n)
    return deleted
