#!/usr/bin/env python
"""Noise-free sequential profile of the per-document extraction kernel.

Reads N pages from the cached bench corpus (no Ray) and runs the exact
stage bodies (meta_stage -> extract_text_layer -> OcrFallbackStage) in a
plain loop, reporting ms/doc and (with --cprofile) the hot functions.
Wall-clock on the shared sandbox swings +-50%; this sequential number is
the stable optimization target (BENCH/BASELINE.md tracks it).
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=160)
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import pages_cache_dir
    from khl_pdf_ocr_ray.stages.extract import (
        OcrFallbackStage,
        extract_text_layer,
        meta_stage,
    )

    pages_dir = pages_cache_dir(args.sf, repeat=args.repeat)
    if not os.path.isdir(pages_dir):
        print(f"corpus not cached at {pages_dir}; run bench.py first", file=sys.stderr)
        return 1
    frags = sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )
    tbl = None
    rows = 0
    parts = []
    for f in frags:
        t = pq.read_table(f, columns=["url", "warc_ts", "html", "text", "lang"])
        parts.append(t)
        rows += t.num_rows
        if rows >= args.n:
            break
    import pyarrow as pa

    tbl = pa.concat_tables(parts).slice(0, args.n)
    ocr = OcrFallbackStage()

    def run() -> int:
        total = 0
        for start in range(0, tbl.num_rows, args.batch):
            chunk = tbl.slice(start, args.batch)
            out = ocr(extract_text_layer(meta_stage(chunk)))
            total += out.num_rows
        return total

    run()  # warm (regex compile, imports)
    if args.cprofile:
        pr = cProfile.Profile()
        pr.enable()
        t0 = time.perf_counter()
        n = run()
        wall = time.perf_counter() - t0
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
        print(s.getvalue())
    else:
        t0 = time.perf_counter()
        c0 = time.process_time()
        n = run()
        wall = time.perf_counter() - t0
        cpu = time.process_time() - c0
        print(
            f"KERNEL n={n} wall={wall:.2f}s ms_per_doc={1000*wall/n:.4f} "
            f"cpu_ms_per_doc={1000*cpu/n:.4f}"
        )
        return 0
    print(f"KERNEL n={n} wall={wall:.2f}s ms_per_doc={1000*wall/n:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
