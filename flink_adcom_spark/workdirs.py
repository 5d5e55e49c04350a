"""Per-process scratch directories with bounded lifetime.

The externally-gated streaming/storage queries need on-disk scratch (feed
shards, materialized sinks, checkpoints). A bare mkdtemp per build leaked
one directory per build — the bench builds each query 3x and the robustness
sweep more, so a long session accumulated parquet layouts in /tmp (VERDICT
r9 hygiene note). Two disciplines instead:

- ``gate_workdir(tag)`` — ONE fixed directory per (process, tag), wiped at
  each call so every build still starts from an empty dir (behaviorally
  identical to a fresh mkdtemp: same writes, same reads, same hashes).
  Disk usage during a session is O(#tags), not O(#builds).
- ``fresh_workdir(prefix)`` — a unique directory for callers that may hold
  several live instances at once (streaming checkpoints), still parented
  under the per-process root.

The whole per-process root is removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT = os.path.join(tempfile.gettempdir(), f"spark_graft_gate_{os.getpid()}")


def gate_workdir(tag: str) -> str:
    """Fixed per-(process, tag) scratch dir, emptied on every call."""
    path = os.path.join(_ROOT, tag)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def fresh_workdir(prefix: str) -> str:
    """Unique scratch dir under the per-process root (for callers whose
    instances coexist, e.g. streaming checkpoints)."""
    os.makedirs(_ROOT, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)


@atexit.register
def _cleanup() -> None:
    shutil.rmtree(_ROOT, ignore_errors=True)
