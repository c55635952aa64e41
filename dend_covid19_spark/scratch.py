"""Process-scoped /tmp scratch management with liveness-checked GC.

Side-effecting queries (ingest round-trips, streaming drains, CDC
snapshot stores, bucketed-table demos) materialize intermediate data
under ``$TMPDIR/spark_graft_ingest/<name>``. Names are either fixed
per query (overwritten every run — no growth) or token-suffixed per
(dataset, pid) — and THOSE accumulate a few MB per process when many
driver rounds share a machine (SURVEY.md §8 queue item c).

``scratch_dir`` stamps every directory it creates with an ``owner.pid``
marker; ``gc_scratch`` removes directories whose owning process is no
longer alive (or, for legacy unmarked dirs, whose mtime is older than a
safety horizon). The session factory calls ``gc_scratch`` once per
process so cleanup needs no operator action.

At 100 TB the same discipline applies to object-store scratch prefixes:
tag transient prefixes with the job/run id and reap tags whose run is
finished — the pid marker here is the single-machine projection of that.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

SCRATCH_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_ingest")

_PID_MARKER = "owner.pid"
# dirs created before the marker existed encode the owner as a trailing
# _<pid> name segment (cdc snap_*, scale bucketed_*)
_TRAILING_PID = re.compile(r"_(\d+)$")

# unmarked, un-suffixed dirs (fixed-name ingest scratch) are only
# reaped when untouched for this long — they are overwrite-in-place by
# design, so age implies the writing process family is gone
_STALE_AGE_SEC = 6 * 3600


def scratch_dir(name: str, root: str = SCRATCH_ROOT) -> str:
    """Create (idempotently) ``root/name`` and stamp it with this
    process's pid so gc_scratch can prove liveness later. Re-entering an
    existing dir re-stamps it: the current process adopts ownership
    (fixed-name dirs are shared across runs on purpose)."""
    path = os.path.join(root, name)
    os.makedirs(path, exist_ok=True)
    try:
        with open(os.path.join(path, _PID_MARKER), "w") as fh:
            fh.write(str(os.getpid()))
    except OSError:
        pass  # read-only scratch is the caller's problem, not GC's
    return path


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    except OSError:
        return True  # can't prove death — keep
    return True


def _owner_pid(path: str) -> int | None:
    marker = os.path.join(path, _PID_MARKER)
    try:
        with open(marker) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        pass
    m = _TRAILING_PID.search(os.path.basename(path))
    return int(m.group(1)) if m else None


def gc_scratch(
    root: str = SCRATCH_ROOT,
    stale_age_sec: float = _STALE_AGE_SEC,
    now: float | None = None,
) -> list[str]:
    """Remove scratch subdirectories whose owning process is dead; for
    ownerless dirs fall back to an mtime age check. Never touches the
    current process's dirs. Returns the paths removed (for tests/ops
    logging). Best-effort by design: a dir that fails to delete (e.g.
    a racing writer re-creating files) is skipped, not raised."""
    removed: list[str] = []
    try:
        entries = os.listdir(root)
    except OSError:
        return removed
    import time as _time

    now = _time.time() if now is None else now
    me = os.getpid()
    for entry in entries:
        path = os.path.join(root, entry)
        if not os.path.isdir(path) or os.path.islink(path):
            continue
        pid = _owner_pid(path)
        if pid == me:
            continue
        if pid is not None:
            dead = not _pid_alive(pid)
        else:
            try:
                dead = (now - os.path.getmtime(path)) > stale_age_sec
            except OSError:
                dead = False
        if dead:
            try:
                shutil.rmtree(path)
                removed.append(path)
            except OSError:
                pass
    return removed
