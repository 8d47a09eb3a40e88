"""Fault-injection probe: SIGKILL task workers mid-pipeline and verify
the run completes with a bit-identical output fingerprint.

The streaming executor's lineage-based retry is the mechanism that makes
the 100 TB story survivable (a 256-node cluster loses workers
routinely): a killed map task is re-executed from its input blocks, so
the job completes and — because every kernel is deterministic — produces
the same bytes. This probe runs the flagship extract pipeline twice on
the same corpus: once clean, once while SIGKILLing live `ray::MapBatches`
worker processes during execution, and compares (row count, crc sum)
fingerprints computed over the deterministic output columns (url, text,
engine, ok — duration_s excluded).

Usage: python scripts/probe_fault.py [sf_dir]
"""

from __future__ import annotations

import os
import signal
import sys
import threading
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KILL_DELAYS = (1.2, 2.0)  # seconds after consume start
KILLS_PER_WAVE = 2


def fingerprint_batch(batch):
    import pyarrow as pa

    urls = batch["url"].to_pylist()
    texts = batch["text"].to_pylist()
    engines = batch["engine"].to_pylist()
    oks = batch["ok"].to_pylist()
    s = 0
    for u, t, e, k in zip(urls, texts, engines, oks):
        s += zlib.crc32(f"{u}|{t}|{e}|{k}".encode())
    return pa.table(
        {
            "n": pa.array([len(urls)], pa.int64()),
            "crc_sum": pa.array([s], pa.int64()),
        }
    )


def task_worker_pids(pattern: str = "ray::MapBatches") -> list:
    pids = []
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            continue
        if pattern in cmd:
            pids.append(int(pid))
    return pids


def run_once(pages_dir: str, kill: bool) -> tuple:
    from ray.data.aggregate import Sum

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract

    killed = []

    def killer():
        # wave 1..n: task workers; final wave: one OCR POOL ACTOR — Ray
        # Data actor pools run with max_restarts > 0, so the pool
        # respawns the actor and resubmits its in-flight batch
        t0 = time.time()
        for delay in KILL_DELAYS:
            time.sleep(max(0.0, t0 + delay - time.time()))
            victims = task_worker_pids()[:KILLS_PER_WAVE]
            for pid in victims:
                try:
                    os.kill(pid, signal.SIGKILL)
                    killed.append(pid)
                except OSError:
                    pass
        for pid in task_worker_pids("ray::OcrFallbackStage")[:1]:
            try:
                os.kill(pid, signal.SIGKILL)
                killed.append(pid)
            except OSError:
                pass

    th = threading.Thread(target=killer, daemon=True) if kill else None
    fp = run_extract(pages_dir).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )
    if th:
        th.start()
    agg = fp.aggregate(Sum("n", alias_name="n"), Sum("crc_sum", alias_name="c"))
    if th:
        th.join()
    return int(agg["n"]), int(agg["c"]), len(killed)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages

    pages_dir = synthesize_pages(sf_dir, repeat=10)

    n0, c0, _ = run_once(pages_dir, kill=False)
    print(f"clean:  rows={n0} crc_sum={c0}", flush=True)
    t0 = time.time()
    n1, c1, nk = run_once(pages_dir, kill=True)
    wall = time.time() - t0
    print(f"killed: rows={n1} crc_sum={c1} workers_killed={nk}", flush=True)
    ok = (n0, c0) == (n1, c1) and nk > 0
    print(
        f'{{"probe": "fault_injection", "rows": {n0}, "identical": '
        f'{str(ok).lower()}, "workers_killed": {nk}, '
        f'"killed_run_sec": {wall:.2f}}}'
    )
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
