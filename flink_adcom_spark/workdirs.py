"""Per-process scratch directories with bounded lifetime.

The externally-gated streaming/storage queries need on-disk scratch (feed
shards, materialized sinks, checkpoints). A bare mkdtemp per build leaked
one directory per build — the bench builds each query 3x and the robustness
sweep more, so a long session accumulated parquet layouts in /tmp (VERDICT
r9 hygiene note). Two disciplines instead:

- ``gate_workdir(tag)`` — a fresh GENERATION directory per call under a
  fixed (process, tag) root, deleting only generations older than the
  previous one. Every build starts from an empty dir (same writes, same
  reads, same hashes as a fresh mkdtemp), the PREVIOUS build's files stay
  alive so a caller holding its still-unevaluated DataFrame can collect it
  after a rebuild (two-outstanding-builds window), and disk usage during a
  session is O(2 x #tags), not O(#builds).
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
_GENERATIONS: dict[str, int] = {}


def gate_workdir(tag: str) -> str:
    """Fresh generation dir under the per-(process, tag) root; keeps the
    previous generation alive (module docstring) and removes older ones."""
    gen = _GENERATIONS.get(tag, -1) + 1
    _GENERATIONS[tag] = gen
    if gen >= 2:
        shutil.rmtree(
            os.path.join(_ROOT, tag, f"g{gen - 2}"), ignore_errors=True
        )
    path = os.path.join(_ROOT, tag, f"g{gen}")
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


def _reap_stale_roots() -> None:
    """Remove siblings left by processes that died without running atexit
    (SIGKILL'd test runs): a root whose pid no longer exists is garbage."""
    base = tempfile.gettempdir()
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        if not name.startswith("spark_graft_gate_"):
            continue
        try:
            pid = int(name.rsplit("_", 1)[1])
        except ValueError:
            continue
        if pid == os.getpid():
            # PID reuse: a root named for OUR pid that exists at import time
            # was left by a DEAD process that happened to share the pid — this
            # process just started and has written nothing yet. Reusing it
            # would resurrect committed streaming checkpoints / old batch_id
            # partitions into the gated streaming queries (ADVICE r10), so
            # wipe it and start clean.
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        except PermissionError:
            pass  # alive, owned by someone else


_reap_stale_roots()
