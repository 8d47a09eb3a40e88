"""Stage-checkpointed recipe job (scripts/run_recipe_job.py +
state/stage_ckpt.py): result parity with the registry query, O(1) resume
of published stages, mid-job interruption recovery, and key-chain
invalidation."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
DOCS = SF + "/documents.parquet"


def _run(workdir):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from run_recipe_job import run_job

    return run_job(DOCS, workdir)


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "recipe_job")


def test_job_matches_registry_query_and_resumes(ray_session, workdir):
    from khl_pdf_ocr_ray.pipelines.queries_recipe import q_llm_corpus_recipe

    res = _run(workdir)
    assert [m["skipped"] for m in res["lineage"]] == [False] * 6
    got = (
        pq.read_table(res["stats_dir"])
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want = (
        q_llm_corpus_recipe(SF)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)[got.columns]
    )
    assert got.equals(want)

    # full resume: every stage skipped, same artifact dirs
    res2 = _run(workdir)
    assert [m["skipped"] for m in res2["lineage"]] == [True] * 6
    assert res2["stats_dir"] == res["stats_dir"]
    assert [m["key"] for m in res2["lineage"]] == [m["key"] for m in res["lineage"]]


def test_job_recovers_from_mid_job_kill(ray_session, workdir):
    res = _run(workdir)
    # simulate a kill after stage 3: later stage artifacts lost (a real
    # kill would simply never have produced them; also plant a stale tmp
    # dir like an interrupted builder leaves behind)
    dirs = sorted(
        os.path.join(workdir, d) for d in os.listdir(workdir)
        if os.path.isdir(os.path.join(workdir, d))
    )
    assert len(dirs) == 6
    by_stage = {m["stage"]: os.path.join(workdir, f"{m['stage']}-{m['key']}")
                for m in res["lineage"]}
    for stage in ("clean", "stats"):
        shutil.rmtree(by_stage[stage])
    os.makedirs(by_stage["clean"] + ".tmp-99999", exist_ok=True)

    res2 = _run(workdir)
    skipped = {m["stage"]: m["skipped"] for m in res2["lineage"]}
    assert skipped == {
        "input": True, "model": True, "survivors": True,
        "dedup": True, "clean": False, "stats": False,
    }
    got = pq.read_table(res2["stats_dir"]).to_pandas().sort_values("lang")
    want = pq.read_table(res["stats_dir"]).to_pandas().sort_values("lang")
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_key_chain_invalidation(tmp_path):
    """A changed upstream param re-keys every downstream stage; same
    params reproduce the same keys (pure function of the chain)."""
    from khl_pdf_ocr_ray.state.stage_ckpt import StageRunner

    def touch(tmp):
        os.makedirs(tmp, exist_ok=True)

    r1 = StageRunner(str(tmp_path / "a"), ["state/stage_ckpt.py"])
    k1 = [r1.stage("s1", touch, params="p=1"), r1.stage("s2", touch)]
    r2 = StageRunner(str(tmp_path / "b"), ["state/stage_ckpt.py"])
    k2 = [r2.stage("s1", touch, params="p=2"), r2.stage("s2", touch)]
    # different upstream params -> both stages re-keyed
    assert os.path.basename(k1[0]) != os.path.basename(k2[0])
    assert os.path.basename(k1[1]) != os.path.basename(k2[1])
    r3 = StageRunner(str(tmp_path / "c"), ["state/stage_ckpt.py"])
    k3 = [r3.stage("s1", touch, params="p=1"), r3.stage("s2", touch)]
    assert [os.path.basename(p) for p in k3] == [os.path.basename(p) for p in k1]
