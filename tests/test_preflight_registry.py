"""Preflight (health-check analogue), stage registry, debug JSON sink."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pages_dir(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages

    return synthesize_pages(sf_smoke_dir, repeat=2)


def test_preflight_ok_on_valid_corpus(pages_dir):
    from khl_pdf_ocr_ray.pipelines.preflight import preflight

    st = preflight(pages_dir)
    assert st["ok"] and st["engine"] == "ready"
    assert st["n_fragments"] >= 2
    assert st["schema_missing"] == [] and st["schema_mistyped"] == []
    assert st["wbox_engine"] is True
    assert st["pymupdf"] is False  # absent in this container, reported honestly


def test_preflight_rejects_wrong_schema(tmp_path):
    from khl_pdf_ocr_ray.pipelines.preflight import preflight

    bad = tmp_path / "bad.parquet"
    pq.write_table(pa.table({"url": ["a"], "html": ["not-binary"]}), bad)
    st = preflight(str(bad))
    assert not st["ok"]
    assert "warc_ts" in st["schema_missing"]
    assert any(m.startswith("html:") for m in st["schema_mistyped"])


def test_preflight_missing_path(tmp_path):
    from khl_pdf_ocr_ray.pipelines.preflight import preflight

    st = preflight(str(tmp_path / "nope"))
    assert not st["ok"] and "input_error" in st


def test_debug_json_sink_preserves_unicode(ray_session, pages_dir, tmp_path):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract
    from khl_pdf_ocr_ray.pipelines.preflight import write_debug_json

    path = write_debug_json(run_extract(pages_dir), str(tmp_path / "dbg"), limit=20)
    lines = open(path, encoding="utf-8").read().strip().splitlines()
    assert len(lines) == 20
    rows = [json.loads(ln) for ln in lines]
    assert all("url" in r and "text" in r for r in rows)
    # non-ASCII stays raw (ensure_ascii=False), reference app.py:28
    assert any("\\u" not in ln for ln in lines)


def test_registry_builds_every_stage(ray_session):
    from khl_pdf_ocr_ray.stages.registry import REGISTRY, StageSpec, build_stage, register

    for name in REGISTRY:
        obj = build_stage(name)
        assert callable(obj) or isinstance(obj, type), name

    # a registered task stage actually runs through map_batches
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"doc_id": [1], "text": ["the quick brown fox and the dog"]})
    )
    out = ds.map_batches(
        build_stage("lang_id"), batch_format=REGISTRY["lang_id"].batch_format
    ).to_pandas()
    assert out.loc[0, "pred_lang"] == "en"

    register("custom_noop", StageSpec("khl_pdf_ocr_ray.stages.extract", "meta_stage", "task", "pyarrow", "x"))
    with pytest.raises(ValueError):
        register("custom_noop", REGISTRY["meta"])
