#!/usr/bin/env python
"""Production job entrypoint: pages parquet -> extracted parquet, resumable.

The ``ray job submit`` lifecycle (SURVEY.md §3 target lifecycle): on a
cluster this script is the job driver — it owns the Ray session, runs
preflight, streams the extract pipeline partition-by-partition with
manifests, and prints the lineage summary. Killed and re-submitted, it
resumes where it stopped.

    python scripts/run_extract_job.py --input /path/pages --output /tmp/out
    python scripts/run_extract_job.py --input ... --output ... --mode refs
    # re-run the same command after a kill: completed partitions skip

Exit codes: 0 done, 2 preflight failed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages parquet file or directory")
    ap.add_argument("--output", required=True, help="output directory (partitioned parquet + manifests)")
    ap.add_argument("--mode", default="all", choices=["all", "words", "refs", "goalies"])
    ap.add_argument("--debug", action="store_true",
                    help="surface the reference's debug=1 intermediate columns")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--max-partitions", type=int, default=None, help="bound partitions this invocation (testing)")
    ap.add_argument("--skip-preflight", action="store_true")
    ap.add_argument(
        "--export-jsonl",
        default=None,
        metavar="DIR",
        help="after extraction, also stream the output as JSON-lines shards "
        "into DIR (REPLACED if it exists; non-ASCII preserved verbatim — "
        "the reference service's JSON contract, ensure_ascii=False)",
    )
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import ExtractConfig
    from khl_pdf_ocr_ray.pipelines.preflight import preflight
    from khl_pdf_ocr_ray.state.manifest import lineage_table, run_resumable_extract

    try:
        if not args.skip_preflight:
            status = preflight(args.input)
            print(json.dumps({"preflight": status}), flush=True)
            if not status["ok"]:
                return 2

        cfg = ExtractConfig(mode=args.mode, debug=args.debug)
        summary = run_resumable_extract(
            args.input, args.output, cfg=cfg, max_partitions=args.max_partitions
        )
        lt = lineage_table(args.output, cfg=cfg)
        totals = {
            "rows": int(sum(lt["row_count"].to_pylist())),
            "bytes_in": int(sum(lt["bytes_in"].to_pylist())),
            "chars_out": int(sum(lt["chars_out"].to_pylist())),
            "error_rows": int(sum(lt["error_rows"].to_pylist())),
        }
        if args.export_jsonl:
            import shutil

            import ray.data as rd

            shutil.rmtree(args.export_jsonl, ignore_errors=True)
            # streaming re-shard: parquet partitions in, jsonl shards out
            rd.read_parquet(args.output).write_json(
                args.export_jsonl, force_ascii=False
            )
            totals["jsonl_dir"] = args.export_jsonl
        print(json.dumps({"job": summary, "lineage_totals": totals}), flush=True)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
