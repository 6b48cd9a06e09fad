"""Per-process scratch space for query-materialized artifacts.

Everything under the scratch root is derivative -- rebuildable from the
fixture tables -- but NOT shareable across processes: the driver can run
the bench and the correctness sweep concurrently, and two processes
running the same query at different scale factors would clobber each
other's files (observed: a concurrent sf0.01 sweep overwrote the
partitioned copy a sf0.001 test was mid-read on). Keying the root by
PID makes every process self-consistent; within a process, build-once
reuse (the per-sf_dir marker confs) still works because the PID is
stable for the session's lifetime.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_BASE = os.path.join(tempfile.gettempdir(), "spark_graft_io")
_ROOT = os.path.join(_BASE, f"pid{os.getpid()}")
_INITIALIZED = False


def _cleanup_own_root() -> None:
    shutil.rmtree(_ROOT, ignore_errors=True)


def _prune_stale_roots() -> None:
    """Remove pid-keyed roots whose owning process is gone -- scratch
    artifacts are rebuildable, so orphans are pure /tmp leakage."""
    try:
        entries = os.listdir(_BASE)
    except OSError:
        return
    for entry in entries:
        if not entry.startswith("pid"):
            continue
        try:
            pid = int(entry[3:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe, sends nothing
        except ProcessLookupError:
            shutil.rmtree(os.path.join(_BASE, entry), ignore_errors=True)
        except OSError:
            pass  # e.g. EPERM: process exists but isn't ours -- keep


def scratch_dir(name: str) -> str:
    """Absolute path for a named scratch artifact, parent dirs created."""
    global _INITIALIZED
    if not _INITIALIZED:
        _prune_stale_roots()
        atexit.register(_cleanup_own_root)
        _INITIALIZED = True
    os.makedirs(_ROOT, exist_ok=True)
    return os.path.join(_ROOT, name)
