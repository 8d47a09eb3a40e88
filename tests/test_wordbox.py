"""WBOX codec + raster stand-in + per-document extraction tests."""

import pytest

from khl_pdf_ocr_ray.functions.doc_extract import extract_document
from khl_pdf_ocr_ray.sources.synth import (
    PAGE_H,
    PAGE_W,
    make_gamesheet,
    page_row,
    _rng,
)
from khl_pdf_ocr_ray.sources.wordbox import (
    PayloadError,
    encode_wbox,
    parse_payload,
    rasterize,
    sniff_content_type,
)


def test_sniff():
    assert sniff_content_type(b"%PDF-1.7 ...") == "application/pdf"
    assert sniff_content_type(b"%WBOX1\n{}") == "application/x-wbox"
    assert sniff_content_type(b"  <!doctype html><html>") == "text/html"
    assert sniff_content_type(b"<p>hi</p>") == "text/html"
    assert sniff_content_type(b"\x00\x01junk") == "application/octet-stream"
    assert sniff_content_type(None) == "application/octet-stream"
    assert sniff_content_type(b"") == "application/octet-stream"


def test_wbox_roundtrip_unicode():
    pages = [{"width": 595, "height": 842, "words": [(10.5, 40.0, "Вратари"), (22.0, 40.0, "Петров")]}]
    doc = parse_payload(encode_wbox(pages))
    assert doc.page(0).words == [(10.5, 40.0, "Вратари"), (22.0, 40.0, "Петров")]
    assert doc.page(0).raster_words == doc.page(0).words  # defaults to text layer


def test_wbox_scanned_raster_section():
    pages = [{"width": 100, "height": 200, "words": [], "raster_words": [(5.0, 1.0, "скан")]}]
    doc = parse_payload(encode_wbox(pages))
    assert doc.page(0).words == []
    assert doc.page(0).raster_words == [(5.0, 1.0, "скан")]


def test_corrupt_payload_raises():
    with pytest.raises(PayloadError):
        parse_payload(b"%WBOX1\nnot json at all")
    with pytest.raises(PayloadError):
        parse_payload(b"\x00garbage")


def test_real_pdf_without_pymupdf_is_error_row():
    rec = extract_document(b"%PDF-1.4 whatever")
    assert rec["ok"] is False and "pdf_open_error" in rec["error"]


def test_raster_crop_geometry():
    pages = [{"width": 72, "height": 144, "words": [(10.0, 5.0, "top"), (100.0, 5.0, "bottom")]}]
    doc = parse_payload(encode_wbox(pages))
    r = rasterize(doc.page(0), dpi=300)
    assert (r.width, r.height) == (300, 600)  # 72pt * 300/72
    top_third = r.crop(0, 0, r.width, int(r.height * 0.33))
    assert [w[2] for w in top_third.words] == ["top"]
    assert top_third.ocr_lines() == ["top"]


def test_gamesheet_text_layer_extraction_matches_planted():
    rng = _rng("t", 1)
    sheet = make_gamesheet(rng, "9001")
    payload = encode_wbox([{"width": PAGE_W, "height": PAGE_H, "words": sheet["words"]}])
    rec = extract_document(payload)
    exp = sheet["expect"]
    assert rec["ok"] and rec["engine"] == "pdf-text"
    assert rec["match_date"] == exp["date"]
    assert rec["match_time"] == exp["time_msk"]
    assert rec["team_home"] == exp["home"]
    assert rec["team_away"] == exp["away"]
    assert rec["ref_main"] == exp["ref_main"]
    assert rec["ref_linesmen"] == exp["ref_linesmen"]
    assert rec["gk_home_names"] == exp["gk_home"]
    assert rec["gk_away_names"] == exp["gk_away"]
    # spans index into text
    lines = rec["text"].split("\n")
    assert len(lines) == len(rec["span_starts"])
    for s, e, ln in zip(rec["span_starts"], rec["span_ends"], lines):
        assert rec["text"][s:e] == ln


def test_gamesheet_many_seeds_plant_correctly():
    for i in range(25):
        sheet = make_gamesheet(_rng("seed", i), str(i))
        payload = encode_wbox([{"width": PAGE_W, "height": PAGE_H, "words": sheet["words"]}])
        rec = extract_document(payload)
        exp = sheet["expect"]
        assert rec["ref_main"] == exp["ref_main"], i
        assert rec["gk_home_names"] == exp["gk_home"], i
        assert rec["team_home"] == exp["home"], i


def test_scanned_gamesheet_uses_ocr_engine():
    sheet = make_gamesheet(_rng("s", 3), "777")
    payload = encode_wbox(
        [{"width": PAGE_W, "height": PAGE_H, "words": [], "raster_words": sheet["words"]}]
    )
    rec = extract_document(payload)
    assert rec["ok"] and rec["engine"] == "pdf-ocr"
    assert rec["text"]  # whole-page OCR text present
    assert rec["ref_main"]  # OCR referee fallback found name pairs
    # deterministic: same payload -> identical record
    assert extract_document(payload) == extract_document(payload)


def test_unknown_payload_with_pre_text_uses_crawler_text():
    rec = extract_document(b"\x01\x02\x03", pre_text="crawler text here")
    assert rec["ok"] and rec["engine"] == "crawler-text"
    assert rec["text"] == "crawler text here"


def test_unknown_payload_without_text_is_error():
    rec = extract_document(b"\x01\x02\x03", pre_text=None)
    assert rec["ok"] is False


def test_page_row_deterministic():
    a = page_row(7, 0, "some doc text here", "en")
    b = page_row(7, 0, "some doc text here", "en")
    assert a == b
    c = page_row(7, 1, "some doc text here", "en")
    assert c["url"] != a["url"]
