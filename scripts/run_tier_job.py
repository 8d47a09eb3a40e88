#!/usr/bin/env python
"""Resumable tier-export job: documents parquet -> hive-partitioned
training corpus split by quality tier (the deployable form of the
doc_tiers operator — what a mixing recipe actually consumes).

Stage-checkpointed like run_recipe_job.py (state/stage_ckpt.py): the
tiered export publishes atomically; kill and re-submit to skip
completed stages in O(1). The export is PARTITIONED BY TIER
(tier=0/1/2 subdirectories), so downstream mixing reads only the tiers
it samples — the resumable-partitioned-output contract at 100 TB (a
real deployment adds a shard key inside each tier; Ray's write_parquet
already emits one file per block, so partition recovery composes with
the stage checkpoint).

    python scripts/run_tier_job.py --input /root/testdata/sf0.001/documents.parquet \\
        --workdir /tmp/tier_job

Prints one JSON lineage line per stage plus the per-tier stats table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIER_CODE_FILES = [
    "pipelines/queries_tiers.py",
    "state/stage_ckpt.py",
    os.path.abspath(__file__),
]

_QT2 = "khl_pdf_ocr_ray.pipelines.queries_tiers"


def run_job(input_path: str, work_dir: str) -> dict:
    """Build (or resume) the tier export; returns {export_dir, stats_dir,
    lineage}."""
    from ray.data.aggregate import Sum

    from khl_pdf_ocr_ray.io import blocks_for_bytes, input_nbytes, read_parquet_clean
    from khl_pdf_ocr_ray.remote import remote_fn
    from khl_pdf_ocr_ray.state.stage_ckpt import StageRunner

    runner = StageRunner(work_dir, TIER_CODE_FILES)
    st = os.stat(input_path)
    input_params = f"{input_path}:{st.st_size}:{st.st_mtime_ns}"

    # 1. tier-partitioned export (map-only scoring; hive layout by tier)
    def _export(tmp: str) -> None:
        read_parquet_clean(
            input_path, columns=["doc_id", "lang", "text", "n_chars"]
        ).repartition(
            blocks_for_bytes(input_nbytes(input_path))  # size-derived fan-out
        ).map_batches(
            remote_fn(_QT2, "tier_with_text_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(
            tmp, partition_cols=["tier"]
        )

    export_dir = runner.stage("export", _export, params=input_params)

    # 2. per-tier mixing stats (reads ONLY metadata-light columns back;
    # the hive partition value comes back as string -> cast first)
    def _tier_cast(batch):
        import pyarrow as pa

        return batch.set_column(
            batch.schema.get_field_index("tier"),
            "tier",
            batch["tier"].cast(pa.int64()),
        )

    def _stats(tmp: str) -> None:
        import ray.data as rd

        # plain read_parquet: hive partition columns (tier) live in the
        # directory names, not the fragment footers read_parquet_clean probes
        rd.read_parquet(export_dir, columns=["tier", "n_chars"]).map_batches(
            _tier_cast, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            remote_fn(_QT2, "tier_stats_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).repartition(1).groupby("tier").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        ).write_parquet(tmp)

    stats_dir = runner.stage("stats", _stats)
    return {
        "export_dir": export_dir,
        "stats_dir": stats_dir,
        "lineage": runner.lineage(),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet file")
    ap.add_argument("--workdir", required=True, help="stage checkpoint directory")
    ap.add_argument(
        "--num-cpus",
        type=int,
        default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    result = run_job(args.input, args.workdir)
    for m in result["lineage"]:
        print(json.dumps(m))
    import pyarrow.parquet as pq

    stats = pq.read_table(result["stats_dir"]).to_pandas().sort_values("tier")
    print(stats.to_string(index=False))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
