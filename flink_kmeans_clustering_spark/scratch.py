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


def scratch_root() -> str:
    """The per-process scratch root (created lazily, removed atexit)."""
    global _ROOT
    if _ROOT is None:
        parent = os.environ.get("SPARK_GRAFT_SCRATCH", tempfile.gettempdir())
        os.makedirs(parent, exist_ok=True)
        _ROOT = tempfile.mkdtemp(prefix=f"spark_graft_{os.getpid()}_", dir=parent)
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
