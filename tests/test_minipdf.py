"""Real-%PDF- path tests: mini reader/writer round-trip, the committed PDF
fixture through the per-doc oracle, and PDF rows through the pipeline.

When PyMuPDF is importable, parse_payload prefers it (reference-identical,
app.py:399); assertions that depend on the mini reader's exact coordinates
are gated on its absence.
"""

import os

import pytest

from khl_pdf_ocr_ray.sources import wordbox as wb
from khl_pdf_ocr_ray.sources.minipdf import build_pdf, extract_pdf_pages

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "gamesheet.pdf")

WORDS = [
    (100.0, 72.0, "Hello"),
    (100.0, 120.0, "world"),
    (115.0, 72.0, "Второй"),
    (115.0, 130.0, "ряд"),
]


@pytest.mark.parametrize("compress", [False, True])
def test_build_extract_roundtrip(compress):
    pdf = build_pdf([WORDS], compress=compress)
    assert pdf.startswith(b"%PDF-")
    pages = extract_pdf_pages(pdf)
    assert len(pages) == 1
    assert pages[0]["words"] == WORDS


def test_multipage_and_escapes():
    tricky = [(50.0, 72.0, "a(b)c\\d")]
    pdf = build_pdf([WORDS, tricky])
    pages = extract_pdf_pages(pdf)
    assert len(pages) == 2
    assert pages[1]["words"] == tricky


def test_parse_payload_routes_pdf():
    pdf = build_pdf([WORDS])
    assert wb.sniff_content_type(pdf) == "application/pdf"
    doc = wb.parse_payload(pdf)
    if not wb.HAS_PYMUPDF:
        assert doc.page(0).words == WORDS


def test_unsupported_pdf_is_error_row():
    from khl_pdf_ocr_ray.functions.doc_extract import extract_document

    rec = extract_document(b"%PDF-1.4\ngarbage, no streams")
    assert rec["ok"] is False
    assert "pdf_open_error" in rec["error"]


def test_committed_fixture_extracts_entities():
    """The committed real-PDF gamesheet runs the full extraction chain:
    sniff -> %PDF- parse -> lines/columns -> Cyrillic entity extractors."""
    from khl_pdf_ocr_ray.functions.doc_extract import extract_document

    payload = open(FIXTURE, "rb").read()
    assert payload.startswith(b"%PDF-")
    rec = extract_document(payload)
    assert rec["ok"] and rec["content_type"] == "application/pdf"
    if wb.HAS_PYMUPDF:  # pragma: no cover - wheel absent here
        pytest.skip("PyMuPDF decodes simple-font Cyrillic differently")
    assert rec["engine"] == "pdf-text"
    assert len(rec["ref_main"]) == 2 and len(rec["ref_linesmen"]) == 2
    assert rec["gk_home_names"] and rec["gk_away_names"]
    assert rec["match_date"] and rec["match_time"]
    assert rec["team_home"].startswith("ХК")


def test_pipeline_extracts_pdf_rows(ray_session, sf_smoke_dir):
    """The synthetic corpus now carries real %PDF- rows; the distributed
    pipeline must extract them (engine pdf-text, entities present)."""
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract, synthesize_pages

    pages_dir = synthesize_pages(sf_smoke_dir, repeat=2)
    out = run_extract(pages_dir).to_pandas()
    pdf_rows = out[out["content_type"] == "application/pdf"]
    assert len(pdf_rows) > 0
    assert (pdf_rows["ok"]).all()
    assert (pdf_rows["engine"] == "pdf-text").all()
    assert (pdf_rows["n_chars"] > 0).all()
    with_refs = pdf_rows[pdf_rows["ref_main"].map(len) == 2]
    assert len(with_refs) > 0


def test_roundtrip_property_random_words():
    """Property: any word grid (ASCII/Cyrillic tokens, arbitrary float
    coords, parens/backslashes) survives build_pdf -> extract_pdf_pages
    bit-exactly, compressed or not."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(
        alphabet=st.sampled_from(
            list("abcXYZ0123456789абвГДЕжз()\\-.,:;") 
        ),
        min_size=1,
        max_size=12,
    ).filter(lambda s: s.strip() == s and s)
    coord = st.floats(min_value=0.0, max_value=800.0).map(lambda v: round(v, 2))
    word = st.tuples(coord, coord, token)
    page = st.lists(word, min_size=0, max_size=40)

    @settings(max_examples=25, deadline=None)
    @given(pages=st.lists(page, min_size=1, max_size=3), compress=st.booleans())
    def check(pages, compress):
        pdf = build_pdf(pages, compress=compress)
        if all(len(p) == 0 for p in pages):
            return  # no text streams -> unsupported-subset error is correct
        got = extract_pdf_pages(pdf)
        got_pages = [g["words"] for g in got]
        # zero-word pages emit BT-less streams, which the reader skips
        want = [[(y, x, t) for y, x, t in p] for p in pages if p]
        assert len(got_pages) == len(want)
        for gp, wp in zip(got_pages, want):
            assert len(gp) == len(wp)
            for (gy, gx, gt), (wy, wx, wt) in zip(gp, wp):
                assert gt == wt
                # y rides as %.2f of (height - y): exact to writer precision
                assert abs(gy - wy) < 0.006 and abs(gx - wx) < 0.006

    check()


def test_tj_kerned_fixture_widths_column_split():
    """Committed TJ-kerned fixture (tests/fixtures/gen_tj_fixture.py): word
    x positions come from the font's /Widths array plus TJ kerning, and the
    upper-median column split matches the hand-computed expectation in the
    generator docstring. A reader ignoring /Widths (fixed CHAR_ADVANCE)
    would compute a different median and a different split."""
    import os

    from khl_pdf_ocr_ray.functions.textgeom import split_columns, upper_median_x
    from khl_pdf_ocr_ray.sources.minipdf import extract_pdf_pages

    path = os.path.join(os.path.dirname(__file__), "fixtures", "tj_kerned.pdf")
    with open(path, "rb") as f:
        pages = extract_pdf_pages(f.read())
    words = pages[0]["words"]
    assert words == [
        (50.0, 50.0, "AB"),
        (50.0, 80.0, "CD"),
        (50.0, 150.0, "EF"),
        (70.0, 50.0, "GH"),
        (70.0, 140.0, "IJ"),
        (70.0, 170.0, "KL"),
    ]
    assert upper_median_x(words) == 140.0
    _lines, cols = split_columns(words)
    assert sorted(t for _, _, t in cols["left"]) == ["AB", "CD", "GH", "IJ"]
    assert sorted(t for _, _, t in cols["right"]) == ["EF", "KL"]


def test_widths_fallback_without_widths_array_unchanged():
    """PDFs whose fonts declare no /Widths keep the documented fixed
    CHAR_ADVANCE fallback — existing fixtures parse byte-identically."""
    from khl_pdf_ocr_ray.sources.minipdf import (
        CHAR_ADVANCE,
        build_pdf,
        extract_pdf_pages,
        parse_font_widths,
    )

    pdf = build_pdf([[(100.0, 50.0, "hello"), (100.0, 120.0, "world")]])
    assert parse_font_widths(pdf) == {}  # writer emits no /Widths
    pages = extract_pdf_pages(pdf)
    assert pages[0]["words"] == [(100.0, 50.0, "hello"), (100.0, 120.0, "world")]
    assert CHAR_ADVANCE == 0.5


def test_show_operators_advance_text_position():
    """Consecutive Tj (and TJ-then-Tj) in one line must advance the pen —
    stacked-at-line-start words would corrupt reading order and the
    upper-median column split on wild PDFs."""
    import zlib

    from khl_pdf_ocr_ray.sources.minipdf import extract_pdf_pages

    content = b"BT /F1 10 Tf 100 700 Td (Hello) Tj (World) Tj ET"
    stream = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /MediaBox [0 0 595 842] >> endobj\n"
        b"2 0 obj << /Length " + str(len(stream)).encode() +
        b" /Filter /FlateDecode >> stream\n" + stream + b"\nendstream endobj\n"
        b"%%EOF"
    )
    pages = extract_pdf_pages(pdf)
    words = sorted(pages[0]["words"], key=lambda w: w[1])
    assert [w[2] for w in words] == ["Hello", "World"]
    x_hello, x_world = words[0][1], words[1][1]
    assert x_world > x_hello  # second show starts after the first's width


def test_escape_literal_degrades_non_cp1251():
    from khl_pdf_ocr_ray.sources.minipdf import _escape_literal

    assert _escape_literal("ok") == b"ok"
    assert b"?" in _escape_literal("漢字")  # CJK degrades, no crash
