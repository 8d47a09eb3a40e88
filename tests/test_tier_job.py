"""Tier-export job (scripts/run_tier_job.py): hive-partitioned output,
stats parity with the registry query, O(1) resume, and partitioned
lineage accounting (recursive fragment glob)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
DOCS = SF + "/documents.parquet"


def _run(workdir):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from run_tier_job import run_job

    return run_job(DOCS, workdir)


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "tier_job")


def test_tier_job_partitioned_export_and_resume(ray_session, workdir):
    from khl_pdf_ocr_ray.pipelines.queries_tiers import q_tier_stats

    res = _run(workdir)
    assert [m["skipped"] for m in res["lineage"]] == [False, False]

    # hive layout: one subdir per tier, fragments inside
    subdirs = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(res["export_dir"], "tier=*"))
    )
    assert subdirs == ["tier=0", "tier=1", "tier=2"]

    # lineage counted rows/files THROUGH the partition dirs
    export_m = res["lineage"][0]
    assert export_m["n_rows"] == 500 and export_m["n_files"] > 0

    # stats parity with the registry query
    got = (
        pq.read_table(res["stats_dir"])
        .to_pandas()
        .sort_values("tier")
        .reset_index(drop=True)
    )
    want = (
        q_tier_stats(SF)
        .to_pandas()
        .sort_values("tier")
        .reset_index(drop=True)[got.columns]
    )
    assert got.equals(want)
    # every doc landed in exactly one tier
    assert int(got["n_docs"].sum()) == 500

    # O(1) resume: both stages skipped, same artifacts
    res2 = _run(workdir)
    assert [m["skipped"] for m in res2["lineage"]] == [True, True]
    assert res2["export_dir"] == res["export_dir"]


def test_tier_export_rows_match_doc_tiers(ray_session, workdir):
    """The partitioned export, read back WITH the partition column,
    reproduces the doc_tiers assignment row-for-row."""
    import ray.data as rd

    from khl_pdf_ocr_ray.pipelines.queries_tiers import q_doc_tiers

    res = _run(workdir)
    back = (
        rd.read_parquet(res["export_dir"], columns=["doc_id", "tier"])
        .to_pandas()
        .astype({"doc_id": "int64", "tier": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        q_doc_tiers(SF)
        .to_pandas()[["doc_id", "tier"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back.equals(want)
