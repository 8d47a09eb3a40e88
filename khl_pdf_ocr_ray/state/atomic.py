"""Crash-safe, concurrency-safe publication of cached artifact directories.

Pattern shared by the synthesized pages corpus and the persisted ANN
indexes: build into a tmp dir, single ``os.rename`` publish, ``_DONE``
marker last. An exclusive ``fcntl`` lock serializes concurrent builders
(two jobs racing the same cache key previously both rmtree'd the target
and the loser crashed on a non-empty rename — ADVICE round 1); the
re-check under the lock makes the loser a no-op, and once ``_DONE``
exists no process ever deletes the directory again, so readers can never
have it removed mid-read.
"""

from __future__ import annotations

import fcntl
import os
import shutil
from contextlib import contextmanager
from typing import Callable


@contextmanager
def _exclusive_lock(out_dir: str):
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    lock_path = out_dir + ".lock"
    with open(lock_path, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def ensure_published(out_dir: str, build_fn: Callable[[str], None]) -> str:
    """Return ``out_dir``, building it via ``build_fn(tmp_dir)`` exactly
    once across processes. ``build_fn`` must leave the finished artifact in
    the tmp dir it is given."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    with _exclusive_lock(out_dir):
        if os.path.exists(done):  # another builder won the race
            return out_dir
        tmp_dir = f"{out_dir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        build_fn(tmp_dir)
        shutil.rmtree(out_dir, ignore_errors=True)  # stale partial (no _DONE)
        os.rename(tmp_dir, out_dir)
        with open(done, "w") as f:
            f.write("ok")
    return out_dir
