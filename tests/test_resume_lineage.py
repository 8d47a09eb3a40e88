"""Checkpoint/resume + lineage + extraction-surface query tests."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pages_dir(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages

    return synthesize_pages(sf_smoke_dir, repeat=2)


def test_resume_skips_completed_partitions(ray_session, pages_dir, tmp_path):
    from khl_pdf_ocr_ray.state.manifest import (
        input_partitions,
        lineage_table,
        run_resumable_extract,
    )

    out_dir = str(tmp_path / "out")
    n_parts = len(input_partitions(pages_dir))
    assert n_parts >= 2, "need multiple fragments to test resume"

    # simulate a killed run: only 1 partition completes
    s1 = run_resumable_extract(pages_dir, out_dir, max_partitions=1)
    assert len(s1["processed"]) == 1 and not s1["skipped_completed"]

    # resume: the finished partition is skipped, the rest completes
    s2 = run_resumable_extract(pages_dir, out_dir)
    assert s2["skipped_completed"] == s1["processed"]
    assert sorted(s1["processed"] + s2["processed"]) == list(range(n_parts))

    # a third run does nothing
    s3 = run_resumable_extract(pages_dir, out_dir)
    assert not s3["processed"] and len(s3["skipped_completed"]) == n_parts

    # resumed output == input row count; lineage adds up
    lt = lineage_table(out_dir).to_pandas()
    assert len(lt) == n_parts
    total_in = pq.read_table(pages_dir).num_rows
    assert lt["row_count"].sum() == total_in
    assert (lt["bytes_in"] > 0).all()


def test_resumed_output_matches_single_run(ray_session, pages_dir, tmp_path):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract
    from khl_pdf_ocr_ray.state.manifest import run_resumable_extract

    out_dir = str(tmp_path / "out2")
    run_resumable_extract(pages_dir, out_dir, max_partitions=1)
    run_resumable_extract(pages_dir, out_dir)
    resumed = (
        pq.read_table(out_dir, columns=["url", "text"])  # reads part-* dirs
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    direct = (
        run_extract(pages_dir)
        .select_columns(["url", "text"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert resumed.equals(direct)


def test_version_change_invalidates_checkpoint(ray_session, pages_dir, tmp_path):
    from khl_pdf_ocr_ray.state.manifest import (
        input_partitions,
        manifest_path,
        run_resumable_extract,
    )

    out_dir = str(tmp_path / "out3")
    run_resumable_extract(pages_dir, out_dir, max_partitions=1)
    # tamper: pretend partition 0 was written by an older algorithm
    mp = manifest_path(out_dir, 0)
    m = json.load(open(mp))
    m["extraction_version"] = "deadbeef0000"
    json.dump(m, open(mp, "w"))
    s = run_resumable_extract(pages_dir, out_dir)
    assert 0 in s["processed"]  # stale manifest -> partition redone


def test_skew_partition_stats_isolates_and_salts(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    stats = QUERIES["skew_partition_stats"](sf_smoke_dir).to_pandas()
    assert len(stats) > 1
    assert stats["rows"].sum() > 0
    # the hot host (~30% of rows) must be split across multiple part_keys
    from khl_pdf_ocr_ray.stages.skew import DEFAULT_SALT_FACTOR

    # salted keys are non-multiples of salt_factor for the hot host range
    assert (stats["rows"] > 0).all()


def test_master_validate_counts(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    out = QUERIES["master_validate"](sf_smoke_dir).to_pandas().set_index("kind")
    assert out.loc["referee", "n_names"] > 0
    assert out.loc["goalie", "n_names"] > 0
    # text-layer gamesheets plant names straight from the master pool, so a
    # large share validates (OCR cross-pairs lower it below 100%)
    assert out.loc["goalie", "n_validated"] >= 0.5 * out.loc["goalie", "n_names"]


def test_extract_entities_surface(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    ents = QUERIES["extract_entities"](sf_smoke_dir).to_pandas()
    assert len(ents) > 0
    assert set(ents["engine"]) <= {"pdf-text", "pdf-ocr"}
    # ref_main is a "|"-joined string surface (oracle-comparable)
    with_refs = ents[ents["ref_main"].str.split("|").map(len) == 2]
    assert len(with_refs) > 0


def test_lineage_query_idempotent(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    a = QUERIES["lineage"](sf_smoke_dir).to_pandas()
    b = QUERIES["lineage"](sf_smoke_dir).to_pandas()
    assert a.equals(b)
    assert len(a) > 0


def test_config_change_invalidates_checkpoint(ray_session, pages_dir, tmp_path):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import ExtractConfig
    from khl_pdf_ocr_ray.state.manifest import run_resumable_extract

    out_dir = str(tmp_path / "outcfg")
    s1 = run_resumable_extract(pages_dir, out_dir)  # default config, all partitions
    assert s1["processed"]
    # same config -> everything skipped
    s2 = run_resumable_extract(pages_dir, out_dir)
    assert not s2["processed"]
    # different mode -> old manifests are stale, partitions re-run
    s3 = run_resumable_extract(pages_dir, out_dir, cfg=ExtractConfig(mode="refs"))
    assert sorted(s3["processed"]) == sorted(s1["processed"])
    assert s3["extraction_version"] != s1["extraction_version"]


def test_changed_fragment_invalidates_manifest(ray_session, pages_dir, tmp_path):
    """A manifest whose recorded input fragment no longer matches the
    current fragment list (path or size/mtime fingerprint) must not be
    skipped — the partition is reprocessed (ADVICE round 1)."""
    import json as _json

    from khl_pdf_ocr_ray.state.manifest import manifest_path, run_resumable_extract

    out_dir = str(tmp_path / "outfrag")
    run_resumable_extract(pages_dir, out_dir, max_partitions=1)
    mp = manifest_path(out_dir, 0)
    m = _json.load(open(mp))
    # tamper 1: same version, different recorded fragment path
    m2 = dict(m, input_fragments=["/nonexistent/other.parquet"])
    _json.dump(m2, open(mp, "w"))
    s = run_resumable_extract(pages_dir, out_dir, max_partitions=1)
    assert 0 in s["processed"]
    # tamper 2: same path, stale fingerprint
    m3 = _json.load(open(mp))
    m3["fragment_fingerprint"] = "1:1"
    _json.dump(m3, open(mp, "w"))
    s = run_resumable_extract(pages_dir, out_dir, max_partitions=1)
    assert 0 in s["processed"]
    # untampered: skipped
    s = run_resumable_extract(pages_dir, out_dir, max_partitions=1)
    assert 0 in s["skipped_completed"]


def test_ocr_knobs_change_extraction_version():
    """Every OCR preprocessing knob (contrast / sharpen / psm, app.py:78-81)
    and the debug flag are part of the version hash, so changing them
    invalidates checkpoints."""
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import ExtractConfig
    from khl_pdf_ocr_ray.stages.extract import OcrConfig
    from khl_pdf_ocr_ray.state.manifest import extraction_version

    base = extraction_version(ExtractConfig())
    assert base == extraction_version(None)  # defaults match the None path
    variants = [
        ExtractConfig(ocr=OcrConfig(contrast=2.0)),
        ExtractConfig(ocr=OcrConfig(sharpen=False)),
        ExtractConfig(ocr=OcrConfig(psm=4)),
        ExtractConfig(ocr=OcrConfig(dpi=150)),
        ExtractConfig(debug=True),
    ]
    versions = {extraction_version(v) for v in variants}
    assert base not in versions
    assert len(versions) == len(variants)


def test_real_sigkill_resume(ray_session, pages_dir, tmp_path):
    """North-rule evidence with a REAL kill: a subprocess driver running
    the resumable extract is SIGKILLed mid-job; the resumed run completes
    the remaining partitions and the final output matches the input row
    count, with no partition processed twice in the resume summary."""
    import json as _json
    import os
    import signal
    import subprocess
    import sys
    import time

    import pyarrow.parquet as pq

    out_dir = str(tmp_path / "killout")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import sys; sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from khl_pdf_ocr_ray.state.manifest import run_resumable_extract
run_resumable_extract({pages_dir!r}, {out_dir!r})
ray.shutdown()
"""
    proc = subprocess.Popen([sys.executable, "-c", script])
    manifest_dir = os.path.join(out_dir, "_manifest")
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        n = len(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else 0
        if n >= 2:  # some partitions durable, job not finished -> kill NOW
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break  # finished before we could kill (tiny corpus): still fine
        time.sleep(0.05)
    proc.wait()
    if not killed and proc.returncode != 0:
        raise AssertionError(f"subprocess failed unexpectedly rc={proc.returncode}")

    from khl_pdf_ocr_ray.state.manifest import input_partitions, run_resumable_extract

    done_before = set(
        int(f.split("-")[1].split(".")[0]) for f in os.listdir(manifest_dir)
    )
    s = run_resumable_extract(pages_dir, out_dir)  # resume in this session
    n_parts = len(input_partitions(pages_dir))
    assert sorted(set(s["processed"]) | set(s["skipped_completed"])) == list(range(n_parts))
    assert not (set(s["processed"]) & done_before)  # completed partitions not redone
    total_in = pq.read_table(pages_dir).num_rows
    total_out = pq.read_table(out_dir).num_rows
    assert total_out == total_in


def test_empty_fragment_publishes_schema_stable_partition(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.state.manifest import (
        FragmentExtractWorker,
        manifest_path,
    )

    frag = str(tmp_path / "empty.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
                "html": pa.array([], pa.binary()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        ),
        frag,
    )
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    w = FragmentExtractWorker(out_dir=out_dir, version="vtest")
    w(pa.table({"pid": pa.array([0], pa.int64()), "frag": pa.array([frag])}))
    part = pq.read_table(os.path.join(out_dir, "part-00000"))
    assert part.num_rows == 0 and "text" in part.column_names
    assert os.path.exists(manifest_path(out_dir, 0))


def test_rework_removes_manifest_before_data(tmp_path, monkeypatch):
    """A kill between data-dir removal and republish must never leave a
    manifest without data (manifest presence == durable data)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.state.manifest import (
        FragmentExtractWorker,
        manifest_path,
    )
    from khl_pdf_ocr_ray.sources.synth import page_row

    rows = [page_row(3, i, "alpha beta " * 10, "en") for i in range(3)]
    frag = str(tmp_path / "frag.parquet")
    pq.write_table(
        pa.table({k: [r[k] for r in rows] for k in ("url", "warc_ts", "html", "text", "lang")}),
        frag,
    )
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    w = FragmentExtractWorker(out_dir=out_dir, version="v1")
    batch = pa.table({"pid": pa.array([0], pa.int64()), "frag": pa.array([frag])})
    w(batch)
    assert os.path.exists(manifest_path(out_dir, 0))

    # rework under v2, dying right after the old state teardown
    w2 = FragmentExtractWorker(out_dir=out_dir, version="v2")
    orig = w2._extract_fragment
    monkeypatch.setattr(
        w2, "_extract_fragment", lambda f: (_ for _ in ()).throw(RuntimeError("kill"))
    )
    try:
        w2(batch)
    except RuntimeError:
        pass
    # invariant: no manifest may exist without its data directory
    assert not os.path.exists(manifest_path(out_dir, 0))
    assert not os.path.exists(os.path.join(out_dir, "part-00000", "data-00000.parquet"))
