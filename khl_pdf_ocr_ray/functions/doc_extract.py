"""Per-document extraction: one payload in, one extracted record out.

This is the engine's single-document semantics, assembled from the pure
kernels (textgeom/entities/html_extract/wordbox) in the same order the
reference service processes a request (/root/reference/app.py:376-419 ->
extract_all app.py:348-366). It is used two ways:

- inside the Ray ``map_batches`` extraction stage (stages/extract.py), and
- as the sequential *oracle* in tests: running this function doc-by-doc in
  a plain Python loop defines the byte-identity target the distributed
  pipeline must reproduce exactly.

Differences from the reference, by design (SURVEY.md §3): the document is
word-parsed ONCE and all extractors fan out over the shared representation
(the reference re-parses three times, app.py:183/235/304 — same result,
3x the work); errors are in-band rows, not HTTP codes.

Output record (flat columns; SURVEY.md §1.2's ``entities`` struct is
flattened for Arrow/groupby ergonomics):
  content_type, engine, ok, error, text, title,
  span_starts:list<int64>, span_ends:list<int64>, span_kinds:list<str>,
  match_date, match_time, team_home, team_away,
  ref_main:list<str>, ref_linesmen:list<str>,
  gk_home_names:list<str>, gk_home_flags:list<str>,
  gk_away_names:list<str>, gk_away_flags:list<str>
"""

from __future__ import annotations

from typing import Dict, List, Optional

from . import entities as E
from .html_extract import extract_main_content
from .textgeom import lines_from_words, reading_order, split_columns
from ..sources import wordbox as wb

REFS_CROP_FRACTION = 0.33   # top third of the page        (app.py:243)
GOALIE_CROP_FRACTION = 0.6  # top 60% of each half         (app.py:315-316)
OCR_DPI = 300               # app.py:242, 313


def _empty_record() -> Dict:
    ent = E.empty_entities()
    return {
        "content_type": "application/octet-stream",
        "engine": "",
        "ok": True,
        "error": "",
        "text": "",
        "title": "",
        "span_starts": [],
        "span_ends": [],
        "span_kinds": [],
        "match_date": ent["match"]["date"],
        "match_time": ent["match"]["time_msk"],
        "team_home": ent["match"]["teams"]["home"],
        "team_away": ent["match"]["teams"]["away"],
        "ref_main": [],
        "ref_linesmen": [],
        "gk_home_names": [],
        "gk_home_flags": [],
        "gk_away_names": [],
        "gk_away_flags": [],
    }


def _line_spans(lines: List[str]) -> Dict[str, List]:
    starts, ends, kinds = [], [], []
    off = 0
    for i, ln in enumerate(lines):
        if i:
            off += 1  # "\n"
        starts.append(off)
        off += len(ln)
        ends.append(off)
        kinds.append("line")
    return {"span_starts": starts, "span_ends": ends, "span_kinds": kinds}


def extract_html_doc(payload: bytes) -> Dict:
    """HTML payload -> extracted record (north_star component 1)."""
    rec = _empty_record()
    rec["content_type"] = "text/html"
    rec["engine"] = "html"
    out = extract_main_content(payload)
    rec["text"] = out["text"]
    rec["title"] = out["title"]
    rec["span_starts"] = [int(s["start"]) for s in out["spans"]]
    rec["span_ends"] = [int(s["end"]) for s in out["spans"]]
    rec["span_kinds"] = [s["kind"] for s in out["spans"]]
    return rec


def extract_doc_layout(
    doc: wb.ParsedDoc, run_ocr_fallback: bool = True, debug: bool = False
) -> Dict:
    """PDF/WBOX document -> extracted record.

    Text-layer path: reading-order words -> lines -> columns -> entities
    (app.py:348-354). OCR fallbacks fire under the reference's exact
    conditions: referees when main or linesmen missing (app.py:240), goalies
    when both columns empty (app.py:311); a document with an empty text
    layer additionally gets its full text from a whole-page OCR pass.
    ``debug`` surfaces the reference's debug=1 intermediates
    (raw_ref_line app.py:203, ocr_ref_line app.py:261, fallback app.py:336).
    """
    rec = _empty_record()
    rec["content_type"] = "application/x-wbox"
    page = doc.page(0)
    words = reading_order(page.words)
    lines, cols = split_columns(words)
    used_ocr = False
    if debug:
        rec["raw_ref_line"] = ""
        rec["ocr_ref_line"] = ""
        rec["ocr_fallback"] = ""

    # match metadata (no OCR fallback in the reference, app.py:182-186)
    meta = E.find_match_meta(lines, cols)

    # referees (app.py:234-263)
    main, linesmen, dbg = E.find_ref_lines(lines)
    if debug:
        rec["raw_ref_line"] = dbg.get("raw_ref_line", "")
    if (not main or not linesmen) and run_ocr_fallback:
        raster = wb.rasterize(page, dpi=OCR_DPI)
        crop = raster.crop(0, 0, raster.width, int(raster.height * REFS_CROP_FRACTION))
        o_main, o_linesmen, o_line = E.refs_from_ocr_lines(crop.ocr_lines())
        if o_main and o_linesmen:
            main, linesmen = o_main, o_linesmen
            used_ocr = True
            if debug:
                rec["ocr_ref_line"] = o_line

    # goalies (app.py:303-338)
    home = E.goalies_from_column(cols["left"])
    away = E.goalies_from_column(cols["right"])
    if not home and not away and run_ocr_fallback:
        raster = wb.rasterize(page, dpi=OCR_DPI)
        h_cut = int(raster.height * GOALIE_CROP_FRACTION)
        left = raster.crop(0, 0, raster.width // 2, h_cut)
        right = raster.crop(raster.width // 2, 0, raster.width, h_cut)
        home = E.goalies_from_ocr_lines(left.ocr_lines())
        away = E.goalies_from_ocr_lines(right.ocr_lines())
        if debug:
            rec["ocr_fallback"] = "ocr"  # set on attempt (app.py:336)
        if home or away:
            used_ocr = True

    # document text: text layer, else whole-page OCR
    if lines:
        text_lines = lines
        rec["engine"] = "pdf-ocr" if used_ocr else "pdf-text"
    else:
        raster = wb.rasterize(page, dpi=OCR_DPI)
        text_lines = raster.ocr_lines()
        rec["engine"] = "pdf-ocr"
        used_ocr = True
    rec["text"] = "\n".join(text_lines)
    rec.update(_line_spans(text_lines))

    rec["match_date"] = meta["date"]
    rec["match_time"] = meta["time_msk"]
    rec["team_home"] = meta["teams"]["home"]
    rec["team_away"] = meta["teams"]["away"]
    rec["ref_main"] = list(main)
    rec["ref_linesmen"] = list(linesmen)
    rec["gk_home_names"] = [g["name"] for g in home]
    rec["gk_home_flags"] = [g["flag"] for g in home]
    rec["gk_away_names"] = [g["name"] for g in away]
    rec["gk_away_flags"] = [g["flag"] for g in away]
    return rec


def extract_document(
    payload: Optional[bytes], pre_text: Optional[str] = None, debug: bool = False
) -> Dict:
    """Full per-document dispatch (the oracle): sniff -> route -> extract.

    ``pre_text`` is the crawler's pre-extracted text column; it is used only
    when the payload itself is missing/unknown (engine="crawler-text").
    Errors come back as ``ok=false`` records (app.py:394-401 analogue).
    """

    def _with_debug_defaults(rec: Dict) -> Dict:
        if debug:
            rec.setdefault("raw_ref_line", "")
            rec.setdefault("ocr_ref_line", "")
            rec.setdefault("ocr_fallback", "")
        return rec

    ctype = wb.sniff_content_type(payload)
    try:
        if ctype == "text/html":
            return _with_debug_defaults(extract_html_doc(payload))  # type: ignore[arg-type]
        if ctype in ("application/x-wbox", "application/pdf"):
            rec = extract_doc_layout(wb.parse_payload(payload), debug=debug)  # type: ignore[arg-type]
            rec["content_type"] = ctype
            return _with_debug_defaults(rec)
        # unknown payload: fall back to the crawler text column if present
        rec = _empty_record()
        if pre_text:
            rec["content_type"] = "text/plain"
            rec["engine"] = "crawler-text"
            rec["text"] = pre_text
            rec.update(_line_spans([pre_text]) if pre_text else {})
            return _with_debug_defaults(rec)
        rec["ok"] = False
        rec["engine"] = "none"
        rec["error"] = f"unsupported payload ({ctype})"
        return _with_debug_defaults(rec)
    except wb.PayloadError as e:
        rec = _empty_record()
        rec["content_type"] = ctype
        rec["engine"] = "none"
        rec["ok"] = False
        rec["error"] = str(e)
        return _with_debug_defaults(rec)
