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

import os
import tempfile

_ROOT = os.path.join(
    tempfile.gettempdir(), "spark_graft_io", f"pid{os.getpid()}"
)


def scratch_dir(name: str) -> str:
    """Absolute path for a named scratch artifact, parent dirs created."""
    os.makedirs(_ROOT, exist_ok=True)
    return os.path.join(_ROOT, name)
