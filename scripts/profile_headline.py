#!/usr/bin/env python
"""Profile the headline extract pipeline: per-stage wall/CPU via ds.stats().

Usage:
    python scripts/profile_headline.py [--repeat 160] [--cpus 32] [--stats]

Prints the headline wall seconds plus Ray Data's per-operator stats so the
read / extract / OCR-pool / write split is visible (VERDICT r2 item 8).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=160)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--stats", action="store_true")
    ap.add_argument("--ocr-width", type=int, default=0, help="OCR pool size (0=default)")
    ap.add_argument("--ocr-cpus", type=float, default=0.25)
    ap.add_argument("--ocr-batch", type=int, default=256)
    ap.add_argument("--extract-batch", type=int, default=256)
    ap.add_argument("--reserve-ratio", type=float, default=-1.0,
                    help="DataContext.op_resource_reservation_ratio override")
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if args.reserve_ratio >= 0:
        ctx.op_resource_reservation_ratio = args.reserve_ratio

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import (
        ExtractConfig,
        run_extract,
        synthesize_pages,
    )

    cfg = ExtractConfig(
        extract_batch_size=args.extract_batch,
        ocr_batch_size=args.ocr_batch,
        ocr_num_cpus=args.ocr_cpus,
    )
    if args.ocr_width:
        cfg.ocr_concurrency = (args.ocr_width, args.ocr_width)

    pages_dir = synthesize_pages(args.sf, repeat=args.repeat)
    out_dir = f"/tmp/khlray_profile_out_{args.cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    ds = run_extract(pages_dir, cfg)
    ds.write_parquet(out_dir)
    wall = time.perf_counter() - t0
    print(f"HEADLINE wall={wall:.2f}s repeat={args.repeat} cpus={args.cpus}")
    if args.stats:
        print(ds.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
