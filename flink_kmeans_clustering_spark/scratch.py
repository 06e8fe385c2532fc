"""Process-scoped scratch directories with exit-time cleanup.

Every throwaway on-disk artifact (streaming checkpoints, staged sink
output, the flush-sentinel parquet, CSV sink part-file scratch) is
allocated under ONE per-process root, removed atexit — so repeated
bench/driver runs can't slowly fill the temp filesystem the way
per-call bare ``mkdtemp`` did in rounds 1-2.  A real deployment points
durable artifacts (checkpoints, sink output) at persistent storage
instead; this module is only for the local/test execution paths.

``SPARK_GRAFT_SCRATCH`` overrides the parent directory (e.g. a RAM
disk, or a fixed root an operator wants to inspect after the run —
cleanup still removes only this process's subtree).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _default_scratch_parent() -> str:
    """Prefer a RAM-backed tmpfs for throwaway scratch (r15, guide §6).

    Everything under the scratch root is BY CONTRACT non-durable (the
    module docstring: real deployments point checkpoints/sinks at
    persistent storage), but streaming checkpoint commits, state-store
    delta files and sink part-files fsync on every write — on a
    disk-backed /tmp those fsyncs are a measured fixed cost per
    micro-batch (q_stream_totals 2.46 → 1.75 s at sf0.1 from this
    change alone).  /dev/shm is used only when it exists, is writable,
    and has ≥ 8 GiB free so a small tmpfs can never be filled by test
    artifacts; any doubt falls back to the regular temp dir."""
    cand = "/dev/shm"
    try:
        if os.path.isdir(cand) and os.access(cand, os.W_OK):
            st = os.statvfs(cand)
            if st.f_bavail * st.f_frsize >= 8 * 1024**3:
                return cand
    except Exception:
        pass
    return tempfile.gettempdir()


def scratch_root() -> str:
    """The per-process scratch root (created lazily, removed atexit)."""
    global _ROOT
    if _ROOT is None:
        parent = os.environ.get(
            "SPARK_GRAFT_SCRATCH", _default_scratch_parent()
        )
        os.makedirs(parent, exist_ok=True)
        _ROOT = tempfile.mkdtemp(prefix=f"spark_graft_{os.getpid()}_", dir=parent)
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
