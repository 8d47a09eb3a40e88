"""Per-partition lineage + checkpoint/resume for the extract pipeline.

The north_rule requires: "resumable from checkpoint with per-partition
lineage + metrics" — a killed ``ray job submit`` run must resume at
partition granularity.

Layout (the resumable-output pattern from the build brief / ray_guide):

    out_dir/
      part-00000/ *.parquet      # one directory per input partition
      part-00001/ ...
      _manifest/part-00000.json  # written AFTER the partition's data is
                                 # durable; its presence IS the checkpoint

A partition = one input parquet fragment (deterministic ordering by path).
Each manifest records the lineage the north_rule names: input fragment
ids, row counts, byte counts, the extraction-version hash (derived from
the algorithm source files, so changing an extractor auto-invalidates old
checkpoints), and wall time.

Writes are atomic: data goes to ``part-X.tmp-<pid>`` then a single
``os.rename`` publishes it; a crash mid-partition leaves no manifest, so
the rerun redoes exactly that partition. Output rows are deterministic per
input row, so redoing a partition is idempotent.

Reference analogue: the service is stateless per request with error
envelopes (app.py:394-401); this module is the batch-scale generalization
the reference never needed.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def extraction_version(cfg=None) -> str:
    """Hash of the extraction algorithm sources AND the effective config:
    a manifest written by a different algorithm version OR different
    pipeline config (mode, OCR params) is stale and its partition re-runs."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = []
    for rel in (
        "functions/textgeom.py",
        "functions/entities.py",
        "functions/html_extract.py",
        "functions/doc_extract.py",
        "stages/extract.py",
        "sources/wordbox.py",   # payload codec: parse changes alter output
        "sources/minipdf.py",   # real-PDF reader: ditto
    ):
        with open(os.path.join(pkg, rel), "rb") as f:
            parts.append(hashlib.md5(f.read()).hexdigest())
    if cfg is None:
        # derive from the live dataclass defaults — a hardcoded copy here
        # would silently drift when a default changes and mis-stamp
        # manifests relative to the parameters actually used
        from ..pipelines.extract_pipeline import ExtractConfig

        cfg = ExtractConfig()
    o = cfg.ocr
    parts.append(
        f"mode={cfg.mode}|debug={cfg.debug}|dpi={o.dpi}|lang={o.lang}"
        f"|contrast={o.contrast}|sharpen={o.sharpen}|psm={o.psm}"
    )
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def input_partitions(pages_path: str) -> List[str]:
    """Deterministic partition list: sorted parquet fragments."""
    if os.path.isdir(pages_path):
        frags = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    else:
        frags = [pages_path]
    if not frags:
        raise FileNotFoundError(f"no parquet fragments under {pages_path}")
    return frags


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{pid:05d}.json")


def load_manifest(out_dir: str, pid: int) -> Optional[Dict]:
    p = manifest_path(out_dir, pid)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def fragment_fingerprint(frag: str) -> str:
    """Cheap content identity for resume validation: size + mtime_ns."""
    st = os.stat(frag)
    return f"{st.st_size}:{st.st_mtime_ns}"


def completed_partitions(out_dir: str, version: str) -> Dict[int, Dict]:
    """Manifests matching the current extraction version."""
    done = {}
    for p in glob.glob(os.path.join(out_dir, "_manifest", "part-*.json")):
        with open(p) as f:
            m = json.load(f)
        if m.get("extraction_version") == version:
            done[m["partition_id"]] = m
    return done


def _manifest_valid(m: Dict, frag: str) -> bool:
    """A manifest only covers its partition if it was written for the SAME
    input fragment (path + size/mtime fingerprint): an input directory that
    gained/lost/changed fragments between runs must not silently map old
    manifests onto new partition ids."""
    if m.get("input_fragments") != [frag]:
        return False
    fp = m.get("fragment_fingerprint")
    return fp is None or fp == fragment_fingerprint(frag)


class FragmentExtractWorker:
    """Actor-pool worker: one *input fragment* per task → one output
    partition directory + its manifest, written atomically inside the task.

    This is the parallel resumable layout: the driver submits ONE Ray Data
    pipeline whose rows are (pid, fragment-path) work items, so a
    multi-node cluster processes every incomplete partition concurrently
    (the round-1 design looped fragments serially on the driver, paying
    per-fragment pipeline fixed costs and idling the cluster). Each task
    owns its partition end-to-end — extract, durable write, then manifest
    — so a killed run keeps every finished partition and a rerun redoes
    only unfinished ones. The OCR engine is built once per actor
    (``__init__``), amortized across fragments (north_star actor-pool
    requirement); per-fragment work is chunked so payload-heavy rows never
    build one giant in-memory table.
    """

    def __init__(
        self,
        out_dir: str,
        version: str,
        mode: str = "all",
        dpi: int = 300,
        lang: str = "rus+eng",
        contrast: float = 1.4,
        sharpen: bool = True,
        psm: int = 6,
        debug: bool = False,
        chunk_rows: int = 256,
    ):
        from ..stages.extract import OcrFallbackStage

        self.out_dir = out_dir
        # self-sufficient: the pipeline normally pre-creates _manifest/,
        # but the worker must not depend on that ordering
        os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
        self.version = version
        self.mode = mode
        self.debug = debug
        self.chunk_rows = chunk_rows
        self.ocr = OcrFallbackStage(
            dpi=dpi, lang=lang, mode=mode, contrast=contrast, sharpen=sharpen,
            psm=psm, debug=debug,
        )

    def _extract_fragment(self, frag: str) -> pa.Table:
        from ..stages.extract import extract_text_layer, meta_stage

        tbl = pq.read_table(frag, columns=["url", "warc_ts", "html", "text", "lang"])
        parts = []
        for start in range(0, tbl.num_rows, self.chunk_rows):
            chunk = tbl.slice(start, self.chunk_rows)
            out = self.ocr(
                extract_text_layer(meta_stage(chunk), mode=self.mode, debug=self.debug)
            )
            parts.append(out)
        if parts:
            return pa.concat_tables(parts)
        # legitimate 0-row fragment: run the chain on the empty table so
        # the partition publishes with the real output schema (a None here
        # would crash pq.write_table and wedge the partition forever)
        empty = tbl.slice(0, 0)
        return self.ocr(
            extract_text_layer(meta_stage(empty), mode=self.mode, debug=self.debug)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for pid, frag in zip(batch["pid"].to_pylist(), batch["frag"].to_pylist()):
            t0 = time.perf_counter()
            part_dir = os.path.join(self.out_dir, f"part-{pid:05d}")
            tmp_dir = f"{part_dir}.tmp-{os.getpid()}"
            shutil.rmtree(tmp_dir, ignore_errors=True)
            # drop the manifest BEFORE the data dir: a kill between the two
            # must never leave a manifest whose data is gone (manifest
            # presence == durable data is THE checkpoint invariant)
            try:
                os.remove(manifest_path(self.out_dir, pid))
            except FileNotFoundError:
                pass
            shutil.rmtree(part_dir, ignore_errors=True)  # stale partial
            out_tbl = self._extract_fragment(frag)
            os.makedirs(tmp_dir, exist_ok=True)
            pq.write_table(out_tbl, os.path.join(tmp_dir, "data-00000.parquet"))
            os.rename(tmp_dir, part_dir)
            manifest = {
                "partition_id": pid,
                "input_fragments": [frag],
                "fragment_fingerprint": fragment_fingerprint(frag),
                "row_count": out_tbl.num_rows,
                "bytes_in": int(pc.sum(out_tbl["n_bytes"]).as_py() or 0),
                "chars_out": int(pc.sum(out_tbl["n_chars"]).as_py() or 0),
                "error_rows": int(
                    out_tbl.num_rows
                    - (pc.sum(pc.cast(out_tbl["ok"], pa.int64())).as_py() or 0)
                ),
                "extraction_version": self.version,
                "wall_s": round(time.perf_counter() - t0, 3),
            }
            tmp_manifest = manifest_path(self.out_dir, pid) + f".tmp-{os.getpid()}"
            with open(tmp_manifest, "w") as f:
                json.dump(manifest, f)
            os.rename(tmp_manifest, manifest_path(self.out_dir, pid))
            rows.append(pid)
        return pa.table({"partition_id": pa.array(rows, pa.int64())})


def run_resumable_extract(
    pages_path: str,
    out_dir: str,
    cfg=None,
    max_partitions: Optional[int] = None,
) -> Dict:
    """Extract pages -> partitioned parquet + manifests, skipping finished
    partitions, processing all incomplete partitions IN PARALLEL through
    one streaming pipeline of fragment work items. Returns a summary dict.

    ``max_partitions`` bounds how many *incomplete* partitions this call
    processes (used by tests to simulate a killed run; None = all).
    """
    import ray
    import ray.data as rd

    from ..remote import remote_cls

    version = extraction_version(cfg)
    frags = input_partitions(pages_path)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    # a SIGKILLed run can leave another pid's ``part-X.tmp-<pid>`` dirs (and
    # manifest tmp files) behind; each worker only removes its OWN tmp, and
    # a non-underscore tmp dir with a truncated parquet file would be picked
    # up by dataset discovery over out_dir — sweep them all before resuming
    for stale in glob.glob(os.path.join(out_dir, "part-*.tmp-*")):
        shutil.rmtree(stale, ignore_errors=True)
    for stale in glob.glob(os.path.join(out_dir, "_manifest", "*.tmp-*")):
        try:
            os.remove(stale)
        except OSError:
            pass
    done = completed_partitions(out_dir, version)

    todo, skipped = [], []
    for pid, frag in enumerate(frags):
        if pid in done and _manifest_valid(done[pid], frag):
            skipped.append(pid)
        else:
            todo.append((pid, frag))
    if max_partitions is not None:
        todo = todo[:max_partitions]

    processed: List[int] = []
    if todo:
        work = pa.table(
            {
                "pid": pa.array([p for p, _ in todo], pa.int64()),
                "frag": pa.array([f for _, f in todo], pa.string()),
            }
        )
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # leave CPU headroom for the work-item repartition tasks: a pool
        # reserving every CPU starves the upstream operator and deadlocks
        pool = max(1, min(len(todo), ncpu - 2))
        from ..pipelines.extract_pipeline import ExtractConfig

        cfg = cfg or ExtractConfig()
        result = (
            rd.from_arrow(work)
            .repartition(len(todo))  # one fragment per task call
            .map_batches(
                remote_cls("khl_pdf_ocr_ray.state.manifest", "FragmentExtractWorker"),
                fn_constructor_kwargs={
                    "out_dir": out_dir,
                    "version": version,
                    "mode": cfg.mode,
                    "dpi": cfg.ocr.dpi,
                    "lang": cfg.ocr.lang,
                    "contrast": cfg.ocr.contrast,
                    "sharpen": cfg.ocr.sharpen,
                    "psm": cfg.ocr.psm,
                    "debug": cfg.debug,
                    "chunk_rows": cfg.extract_batch_size,
                },
                batch_format="pyarrow",
                batch_size=1,
                # fixed-size pool: autoscaling from 1 actor makes ramp-up
                # dominate wall time when fragments ≈ cores
                concurrency=(pool, pool),
                num_cpus=1,
            )
            .take_all()
        )
        processed = sorted(r["partition_id"] for r in result)

    return {
        "out_dir": out_dir,
        "partitions_total": len(frags),
        "processed": processed,
        "skipped_completed": skipped,
        "extraction_version": version,
    }


def lineage_table(out_dir: str, cfg=None) -> pa.Table:
    """The lineage/metrics table the north_rule asks for, one row per
    completed partition."""
    rows = sorted(
        completed_partitions(out_dir, extraction_version(cfg)).values(),
        key=lambda m: m["partition_id"],
    )
    if not rows:
        return pa.table(
            {
                "partition_id": pa.array([], pa.int64()),
                "row_count": pa.array([], pa.int64()),
                "bytes_in": pa.array([], pa.int64()),
                "chars_out": pa.array([], pa.int64()),
                "error_rows": pa.array([], pa.int64()),
                "extraction_version": pa.array([], pa.string()),
                "wall_s": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "partition_id": [m["partition_id"] for m in rows],
            "row_count": [m["row_count"] for m in rows],
            "bytes_in": [m["bytes_in"] for m in rows],
            "chars_out": [m["chars_out"] for m in rows],
            "error_rows": [m["error_rows"] for m in rows],
            "extraction_version": [m["extraction_version"] for m in rows],
            "wall_s": [m["wall_s"] for m in rows],
        }
    )
