"""Smoke + resume test for the production job entrypoint
(scripts/run_extract_job.py): the `ray job submit` driver surface.

Runs in a subprocess because the script owns its own Ray session."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_extract_job.py")


def _run_job(pages_dir: str, out_dir: str, *extra: str):
    proc = subprocess.run(
        [
            sys.executable,
            SCRIPT,
            "--input",
            pages_dir,
            "--output",
            out_dir,
            "--num-cpus",
            "4",
            *extra,
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    return [json.loads(ln) for ln in lines]


def test_job_cli_runs_and_resumes(ray_session, tmp_path):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages

    pages_dir = synthesize_pages("/root/testdata/sf0.001", repeat=2)
    out_dir = str(tmp_path / "job_out")

    msgs = _run_job(pages_dir, out_dir)
    assert msgs[0]["preflight"]["ok"] is True
    job = msgs[1]["job"]
    assert job["partitions_total"] > 0
    assert len(job["processed"]) == job["partitions_total"]
    totals = msgs[1]["lineage_totals"]
    assert totals["rows"] > 0 and totals["chars_out"] > 0

    # output parquet rows match the lineage totals
    n_rows = pq.read_table(out_dir).num_rows
    assert n_rows == totals["rows"]

    # second submission: everything skips, nothing reprocessed — and the
    # jsonl export (the reference's JSON contract, ensure_ascii=False)
    # streams the same rows out as parseable lines with Cyrillic intact
    jsonl_dir = str(tmp_path / "jsonl_out")
    msgs2 = _run_job(pages_dir, out_dir, "--export-jsonl", jsonl_dir)
    job2 = msgs2[1]["job"]
    assert job2["processed"] == []
    assert len(job2["skipped_completed"]) == job["partitions_total"]
    totals2 = dict(msgs2[1]["lineage_totals"])
    assert totals2.pop("jsonl_dir") == jsonl_dir
    assert totals2 == totals

    n_lines = 0
    saw_cyrillic = False
    for fname in os.listdir(jsonl_dir):
        with open(os.path.join(jsonl_dir, fname), encoding="utf-8") as f:
            for line in f:
                rec = json.loads(line)
                assert "url" in rec and "text" in rec
                if any("Ѐ" <= ch <= "ӿ" for ch in rec["text"]):
                    saw_cyrillic = True
                n_lines += 1
    assert n_lines == totals["rows"]
    assert saw_cyrillic  # ensure_ascii=False parity: raw Cyrillic in the file
