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


_MANIFEST = "_MANIFEST"
_MARKERS = ("_DONE", _MANIFEST)


def _collect_entries(root: str) -> dict:
    """relpath -> (size, mtime_ns) for every artifact file under root."""
    entries = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f in _MARKERS:
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            entries[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return entries


def _write_manifest(root: str) -> None:
    entries = _collect_entries(root)
    with open(os.path.join(root, _MANIFEST), "w") as f:
        for rel in sorted(entries):
            size, mtime_ns = entries[rel]
            f.write(f"{size}\t{mtime_ns}\t{rel}\n")


def verify_manifest(out_dir: str) -> None:
    """Loud integrity gate for a published artifact: every file must match
    the size+mtime_ns recorded at publish time. A corrupted or tampered
    index (a truncated bucket file, a re-written generation) must FAIL the
    queries that read it, never silently serve stale or damaged rows.
    stat-only (no content hashing) — O(files) microseconds per access.
    Artifacts published before manifests existed (no _MANIFEST file) pass
    unchecked; rebuilding refreshes them."""
    mpath = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(mpath):
        return
    want = {}
    with open(mpath) as f:
        for line in f:
            size, mtime_ns, rel = line.rstrip("\n").split("\t", 2)
            want[rel] = (int(size), int(mtime_ns))
    have = _collect_entries(out_dir)
    if have != want:
        added = sorted(set(have) - set(want))[:3]
        missing = sorted(set(want) - set(have))[:3]
        changed = sorted(r for r in set(want) & set(have) if want[r] != have[r])[:3]
        raise RuntimeError(
            f"published artifact {out_dir} was modified after publish "
            f"(added={added}, missing={missing}, changed={changed}); a "
            f"corrupted cache must be rebuilt — delete the directory and rerun"
        )


def _bless_legacy(out_dir: str) -> None:
    """Artifacts published before manifests existed get one written from
    their CURRENT state on first access (under the builder lock), so they
    join the integrity contract from then on."""
    if os.path.exists(os.path.join(out_dir, _MANIFEST)):
        return
    with _exclusive_lock(out_dir):
        if not os.path.exists(os.path.join(out_dir, _MANIFEST)):
            _write_manifest(out_dir)


def ensure_published(out_dir: str, build_fn: Callable[[str], None]) -> str:
    """Return ``out_dir``, building it via ``build_fn(tmp_dir)`` exactly
    once across processes. ``build_fn`` must leave the finished artifact in
    the tmp dir it is given. Every access re-verifies the publish-time
    size+mtime manifest (see verify_manifest) so post-publish corruption
    fails loudly instead of serving damaged rows."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        _bless_legacy(out_dir)
        verify_manifest(out_dir)
        return out_dir
    with _exclusive_lock(out_dir):
        if os.path.exists(done):  # another builder won the race
            _bless_legacy(out_dir)
            verify_manifest(out_dir)
            return out_dir
        tmp_dir = f"{out_dir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        build_fn(tmp_dir)
        _write_manifest(tmp_dir)  # rename preserves inner-file mtimes
        shutil.rmtree(out_dir, ignore_errors=True)  # stale partial (no _DONE)
        os.rename(tmp_dir, out_dir)
        with open(done, "w") as f:
            f.write("ok")
    return out_dir


def content_keyed_dir(
    module_file: str, data_file: str, prefix: str, version: str = "v1"
) -> str:
    """Shared cache-dir recipe for code+content-keyed dump/state
    artifacts: /tmp/khlray_cache/<prefix>_<key> with
    key = sha256(md5(module bytes) | size:mtime_ns(data_file) | version).
    Editing the owning module or replacing the input file re-keys the
    artifact; bump ``version`` to force a rebuild with unchanged code."""
    import hashlib

    with open(module_file, "rb") as f:
        mod_md5 = hashlib.md5(f.read()).hexdigest()
    st = os.stat(data_file)
    key = hashlib.sha256(
        f"{mod_md5}|{st.st_size}:{st.st_mtime_ns}|{version}".encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp/khlray_cache", f"{prefix}_{key}")
