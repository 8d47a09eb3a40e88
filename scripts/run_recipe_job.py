#!/usr/bin/env python
"""Resumable LLM corpus-build job: documents parquet -> cleaned, chunked
training corpus accounting, checkpointed at STAGE granularity.

The recipe's global exchanges (LM training, dedup groupby, decontamination
join) can't resume per input fragment like the extract job; instead every
exchange boundary persists as an atomically-published parquet stage with a
chained lineage manifest (state/stage_ckpt.py). Kill the job anywhere and
re-submit the same command: published stages are skipped in O(1), the
interrupted stage rebuilds from its parent's artifact, nothing re-runs
upstream.

    python scripts/run_recipe_job.py --input /root/testdata/sf0.001/documents.parquet \\
        --workdir /tmp/recipe_job
    # re-run after a kill: completed stages print "skipped"

Stages: input (planted-dup expansion) -> model (LM term counts) ->
survivors (quality gate) -> dedup (md5 keep-min) -> clean (eval-trigram
decontamination) -> stats (per-lang accounting, the job result).

Exit code 0; prints one JSON line per stage (the lineage) and the final
stats table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPE_CODE_FILES = [
    "pipelines/queries_recipe.py",
    "pipelines/queries_corpus.py",
    "pipelines/queries_prep.py",
    # stage WIRING and plumbing: editing the composition in this script, the
    # join semantics, or the checkpoint mechanics must also re-key every
    # stage — otherwise a resume serves stale artifacts as current
    "joins.py",
    "state/stage_ckpt.py",
    os.path.abspath(__file__),
]

_QR = "khl_pdf_ocr_ray.pipelines.queries_recipe"


def run_job(input_path: str, work_dir: str) -> dict:
    """Build (or resume) the corpus recipe; returns {stats_dir, lineage}."""
    from ray.data.aggregate import Count, Min, Sum

    from khl_pdf_ocr_ray.io import read_parquet_clean
    from khl_pdf_ocr_ray.joins import safe_join
    from khl_pdf_ocr_ray.pipelines.queries_corpus import lm_model_from_counts
    from khl_pdf_ocr_ray.remote import remote_fn
    from khl_pdf_ocr_ray.state.stage_ckpt import StageRunner

    runner = StageRunner(work_dir, RECIPE_CODE_FILES)
    st = os.stat(input_path)
    input_params = f"{input_path}:{st.st_size}:{st.st_mtime_ns}"

    # 1. expanded input (planted exact duplicates, same as llm_corpus_recipe)
    def _input(tmp: str) -> None:
        from khl_pdf_ocr_ray.io import blocks_for_bytes, input_nbytes

        read_parquet_clean(input_path, columns=["doc_id", "lang", "text"]).repartition(
            blocks_for_bytes(input_nbytes(input_path))  # size-derived fan-out
        ).map_batches(
            remote_fn(_QR, "recipe_input_batch"), batch_format="pyarrow"
        ).write_parquet(tmp)

    input_dir = runner.stage("input", _input, params=input_params)

    # 2. LM model: (term, n) counts table (combiner output is blocks x
    # vocab rows — coalesce width scales with the input's block count)
    def _model(tmp: str) -> None:
        from khl_pdf_ocr_ray.io import coalesce_for_input, input_nbytes

        read_parquet_clean(input_dir, columns=["text"]).map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_corpus", "lm_count_partial"),
            batch_format="pyarrow",
        ).repartition(coalesce_for_input(input_nbytes(input_dir))).groupby(
            "term"
        ).aggregate(
            Sum("n", alias_name="n")
        ).write_parquet(tmp)

    model_dir = runner.stage("model", _model)

    # 3. quality gate (map-only; model broadcast as kwargs)
    def _survivors(tmp: str) -> None:
        import pyarrow.parquet as pq

        counts = pq.read_table(model_dir).to_pandas()
        model = lm_model_from_counts(counts)
        read_parquet_clean(input_dir).map_batches(
            remote_fn(_QR, "recipe_filter_batch", model=model),
            batch_format="pyarrow",
        ).write_parquet(tmp)

    surv_dir = runner.stage("survivors", _survivors)

    # 4. exact dedup: md5 keep-min join
    def _dedup(tmp: str) -> None:
        survivors = read_parquet_clean(surv_dir)
        keep = (
            survivors.map_batches(
                remote_fn(_QR, "recipe_hash_batch"), batch_format="pyarrow"
            )
            .groupby("text_hash")
            .aggregate(Min("doc_id", alias_name="keep_doc_id"))
            .map_batches(remote_fn(_QR, "keep_ids_only"), batch_format="pyarrow")
        )
        joined = safe_join(survivors, keep, on=("doc_id",), right_on=("keep_doc_id",))
        assert joined is not None
        joined.select_columns(["doc_id", "lang", "text"]).write_parquet(tmp)

    dedup_dir = runner.stage("dedup", _dedup)

    # 5. decontamination: drop docs sharing an eval trigram
    def _clean(tmp: str) -> None:
        eval_ngs = (
            read_parquet_clean(input_dir, columns=["doc_id", "text"])
            .map_batches(
                remote_fn(
                    "khl_pdf_ocr_ray.pipelines.queries_prep",
                    "trigram_explode",
                    eval_side=True,
                ),
                batch_format="pyarrow",
            )
            .groupby("ng")
            .aggregate(Count(alias_name="_n"))
            .map_batches(remote_fn(_QR, "eval_ng_distinct"), batch_format="pyarrow")
        )
        deduped = read_parquet_clean(dedup_dir)
        train_ngs = deduped.select_columns(["doc_id", "text"]).map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_prep",
                "trigram_explode",
                eval_side=False,
            ),
            batch_format="pyarrow",
        )
        hit = safe_join(train_ngs, eval_ngs, on=("ng",), right_on=("ng_eval",))
        if hit is None:
            clean = deduped
        else:
            flagged = (
                hit.groupby("doc_id")
                .aggregate(Count(alias_name="_n"))
                .map_batches(
                    remote_fn(_QR, "flagged_ids_only"), batch_format="pyarrow"
                )
            )
            clean = safe_join(
                deduped, flagged, on=("doc_id",), right_on=("flagged_doc_id",),
                join_type="left_anti",
            )
            assert clean is not None
        clean.write_parquet(tmp)

    clean_dir = runner.stage("clean", _clean)

    # 6. per-lang chunk accounting (the job result)
    def _stats(tmp: str) -> None:
        read_parquet_clean(clean_dir, columns=["lang", "text"]).map_batches(
            remote_fn(_QR, "chunk_stats_partial"), batch_format="pyarrow"
        ).repartition(2).groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_tokens", alias_name="n_tokens"),
        ).write_parquet(tmp)

    stats_dir = runner.stage("stats", _stats)
    return {"stats_dir": stats_dir, "lineage": runner.lineage()}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet file")
    ap.add_argument("--workdir", required=True, help="stage checkpoint directory")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
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

    stats = pq.read_table(result["stats_dir"]).to_pandas().sort_values("lang")
    print(stats.to_string(index=False))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
