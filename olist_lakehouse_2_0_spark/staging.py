"""Bounded staging directories for queries that re-stage data on disk.

The streaming-path queries (incremental SCD merges, exactly-once CSV
ingest, stateful profiles) stage a copy of their input plus checkpoints
under a temp root on every invocation. ``tempfile.mkdtemp`` alone leaks:
repeated correctness/profiling runs accumulate unbounded disk under
/tmp (ADVICE r2). The roots cannot be deleted in a ``try/finally``
inside the query either — the returned DataFrame reads the staged
parquet LAZILY, after the query function returns.

This module bounds the accumulation instead: one live root per tag at
any time (re-staging under a tag deletes the previous root — by then
its lazily-read result has been consumed, since callers collect one
query's output before invoking the next), and every live root is
removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ACTIVE: dict[str, str] = {}


def _cleanup_all() -> None:
    for path in _ACTIVE.values():
        shutil.rmtree(path, ignore_errors=True)
    _ACTIVE.clear()


atexit.register(_cleanup_all)


def staging_dir(tag: str) -> str:
    """Fresh staging root for ``tag``; deletes the previous root staged
    under the same tag and registers the new one for exit cleanup."""
    prev = _ACTIVE.pop(tag, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    root = tempfile.mkdtemp(prefix=f"{tag}_")
    _ACTIVE[tag] = root
    return root
