"""Stage-level checkpointing for multi-exchange pipelines.

The partition-level manifests (state/manifest.py) make the EMBARRASSINGLY
PARALLEL extract surface resumable at fragment granularity. Pipelines with
global exchanges (the LLM corpus recipe: model training, dedup groupby,
decontamination join) cannot checkpoint per input fragment — the natural
durability boundary is the STAGE: every exchange output is persisted as
partitioned parquet, atomically published (state/atomic.py), with a
lineage manifest chaining each stage to its parent.

Key chaining gives correct invalidation for free: a stage's key is
``sha256(parent_key | stage name | params | code fingerprint)``, so
editing a kernel, changing a threshold, or rebuilding an upstream stage
re-keys every downstream stage, while a killed-and-resubmitted job with
identical inputs skips every published stage in O(1) (the ``_DONE``
check). This is the standard dataflow-lineage recipe (deterministic
recomputation keyed by the transformation chain) applied at stage
granularity.

Artifacts are plain parquet directories — any stage output is
independently readable, and a resumed job can never observe a
half-written stage (tmp dir + single rename + ``_DONE`` last).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from typing import Callable, Dict, List, Optional

import pyarrow.parquet as pq

from .atomic import ensure_published

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _code_fingerprint(rel_paths: List[str]) -> str:
    h = hashlib.sha256()
    for rel in rel_paths:
        # absolute paths hash files OUTSIDE the package (job scripts)
        p = rel if os.path.isabs(rel) else os.path.join(_PKG_ROOT, rel)
        with open(p, "rb") as f:
            h.update(hashlib.md5(f.read()).digest())
    return h.hexdigest()[:16]


def _stage_files(path: str) -> List[str]:
    """All parquet fragments, including hive-partitioned subdirs."""
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def _dir_rows(path: str) -> int:
    """Row count from parquet footers (no data read)."""
    return sum(pq.read_metadata(p).num_rows for p in _stage_files(path))


class StageRunner:
    """Run named stages exactly once per (input chain, code, params).

    ``stage(name, build_fn, params)`` returns the published artifact dir;
    ``build_fn(tmp_dir)`` must leave finished parquet files in ``tmp_dir``.
    Stages MUST be invoked in a fixed order — each key folds the previous
    stage's key, which is what invalidates downstream work when anything
    upstream changes.
    """

    def __init__(
        self,
        work_dir: str,
        code_files: List[str],
        version: str = "v1",
    ) -> None:
        self.work_dir = work_dir
        self._chain = _code_fingerprint(code_files) + ":" + version
        self.manifests: List[Dict] = []

    def stage(
        self,
        name: str,
        build_fn: Callable[[str], None],
        params: str = "",
    ) -> str:
        key = hashlib.sha256(
            f"{self._chain}|{name}|{params}".encode()
        ).hexdigest()[:16]
        self._chain = key
        out_dir = os.path.join(self.work_dir, f"{name}-{key}")
        manifest_path = os.path.join(out_dir, "_manifest.json")

        def _build(tmp_dir: str) -> None:
            os.makedirs(tmp_dir, exist_ok=True)
            t0 = time.perf_counter()
            build_fn(tmp_dir)
            manifest = {
                "stage": name,
                "key": key,
                "params": params,
                "n_rows": _dir_rows(tmp_dir),
                "n_files": len(_stage_files(tmp_dir)),
                "wall_s": round(time.perf_counter() - t0, 3),
                "built_by_pid": os.getpid(),
            }
            with open(os.path.join(tmp_dir, "_manifest.json"), "w") as f:
                json.dump(manifest, f)

        skipped = os.path.exists(os.path.join(out_dir, "_DONE"))
        ensure_published(out_dir, _build)
        with open(manifest_path) as f:
            manifest = json.load(f)
        manifest["skipped"] = skipped
        self.manifests.append(manifest)
        return out_dir

    def lineage(self) -> List[Dict]:
        """The ordered stage manifests of this run (``skipped`` marks
        stages served from a previous job's checkpoint)."""
        return list(self.manifests)


def read_manifest(stage_dir: str) -> Optional[Dict]:
    p = os.path.join(stage_dir, "_manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
