"""End-to-end byte-identity: Ray pipeline vs sequential per-doc oracle.

The north_rule's core invariant (BASELINE.json): byte-identical extracted
text per url. The oracle is a plain Python loop over
``extract_document`` (functions/doc_extract.py); the pipeline is the full
streaming Dataset graph (meta -> text-layer tasks -> OCR actor pool).
"""

import pyarrow.parquet as pq
import pytest

from khl_pdf_ocr_ray.functions.doc_extract import extract_document

DETERMINISTIC_COLS = [
    "content_type",
    "engine",
    "ok",
    "error",
    "text",
    "title",
    "span_starts",
    "span_ends",
    "span_kinds",
    "match_date",
    "match_time",
    "team_home",
    "team_away",
    "ref_main",
    "ref_linesmen",
    "gk_home_names",
    "gk_home_flags",
    "gk_away_names",
    "gk_away_flags",
]


@pytest.fixture(scope="module")
def pages_dir(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages

    return synthesize_pages(sf_smoke_dir, repeat=2)


def test_pipeline_matches_oracle_byte_identical(ray_session, pages_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract

    out = run_extract(pages_dir).to_pandas()
    assert len(out) > 0
    # oracle: sequential loop over the same parquet
    src = pq.read_table(pages_dir)
    oracle = {}
    for row in src.to_pylist():
        oracle[row["url"]] = extract_document(row["html"], row["text"])

    assert set(out["url"]) == set(oracle)
    mismatches = []
    for rec in out.to_dict("records"):
        exp = oracle[rec["url"]]
        for col in DETERMINISTIC_COLS:
            got, want = rec[col], exp[col]
            if isinstance(want, list):
                got = list(got)
            if got != want:
                mismatches.append((rec["url"], col, got, want))
    assert not mismatches, mismatches[:5]
    # the invariant the north_rule names: byte-identical text per url
    for rec in out.to_dict("records"):
        assert rec["text"] == oracle[rec["url"]]["text"]


def test_pipeline_covers_all_payload_kinds(ray_session, pages_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract

    out = run_extract(pages_dir).to_pandas()
    engines = set(out["engine"])
    assert "html" in engines
    assert "pdf-text" in engines
    assert "pdf-ocr" in engines  # scanned docs exercised the actor pool
    # real %PDF- rows flow through the application/pdf branch
    assert "application/pdf" in set(out["content_type"])
    assert (~out["ok"]).sum() > 0  # corrupt rows became in-band error rows
    assert not out["needs_ocr"].any()  # every flag consumed


def test_pipeline_schema_stable(ray_session, pages_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract
    from khl_pdf_ocr_ray.stages.extract import EXTRACTED_SCHEMA

    ds = run_extract(pages_dir)
    schema = ds.schema()
    assert schema.names == EXTRACTED_SCHEMA.names


def test_extracted_writes_partitioned_parquet(ray_session, pages_dir, tmp_path):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract

    out_dir = str(tmp_path / "extracted")
    run_extract(pages_dir).write_parquet(out_dir)
    back = pq.read_table(out_dir)
    assert back.num_rows > 0
    assert "text" in back.schema.names


def test_debug_mode_surfaces_reference_intermediates(ray_session, pages_dir):
    """ExtractConfig(debug=True) adds raw_ref_line / ocr_ref_line /
    ocr_fallback columns (app.py:203, 261, 336), byte-equal to the
    sequential oracle's debug output; debug=False omits them."""
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import ExtractConfig, run_extract

    plain = run_extract(pages_dir)
    assert "raw_ref_line" not in plain.schema().names

    out = run_extract(pages_dir, ExtractConfig(debug=True)).to_pandas()
    for col in ("raw_ref_line", "ocr_ref_line", "ocr_fallback"):
        assert col in out.columns

    src = pq.read_table(pages_dir)
    oracle = {
        row["url"]: extract_document(row["html"], row["text"], debug=True)
        for row in src.to_pylist()
    }
    for rec in out.to_dict("records"):
        exp = oracle[rec["url"]]
        assert rec["raw_ref_line"] == exp["raw_ref_line"], rec["url"]
        assert rec["ocr_ref_line"] == exp["ocr_ref_line"], rec["url"]
        assert rec["ocr_fallback"] == exp["ocr_fallback"], rec["url"]
    # the intermediates actually fire on this corpus
    assert (out["raw_ref_line"] != "").any()
    assert (out["ocr_fallback"] == "ocr").any()


def test_season_uid_envelope_columns(ray_session, pages_dir):
    """Gamesheet rows carry season/uid parsed from the reference URL shape
    (app.py:49-58, 359); non-gamesheet rows carry empty strings."""
    import re

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract

    out = run_extract(pages_dir).to_pandas()
    sheet = out[out["url"].str.contains("-start-ru.pdf")]
    assert len(sheet) > 0
    for rec in sheet.to_dict("records"):
        m = re.search(r"/(\d{4})/([^/]+)/game-", rec["url"])
        assert rec["season"] == m.group(1)
        assert rec["uid"] == m.group(2)
    other = out[~out["url"].str.contains("-start-ru.pdf")]
    assert (other["season"] == "").all() and (other["uid"] == "").all()
