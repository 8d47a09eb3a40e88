"""Ray Data extraction stages: sniff/route -> text-layer extract -> OCR pool.

Stage design (SURVEY.md §3 target lifecycle):

1. ``meta_stage`` — vectorized pyarrow projection: payload byte length,
   host(url), content-type sniff. Pure Arrow kernels, zero-copy.
2. ``ExtractTextLayer`` — stateless ``map_batches`` function doing the
   per-document parse (HTML block scoring / WBOX word geometry / entity
   regexes) WITHOUT any OCR; rows whose extraction needs the raster path
   are flagged ``needs_ocr`` (reference fallback conditions,
   /root/reference/app.py:240, 311). The document is parsed ONCE and all
   extractors fan out (the reference re-parses 3x, app.py:183/235/304).
3. ``OcrFallbackStage`` — an actor-pool ``map_batches`` class: the OCR
   engine is constructed once per actor in ``__init__`` (north_star's
   ActorPoolStrategy amortization; the tesseract-equivalent here is the
   deterministic WBOX raster reader since image libs are absent — the
   plumbing, batching and crop geometry are real). Rows not flagged pass
   through untouched; rasters never cross a stage boundary (SURVEY §4.2).

One pass over the data — the flag-and-pass-through design avoids the
double-execution that a filter/union split of a streaming Dataset causes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import entities as E
from ..functions.doc_extract import (
    GOALIE_CROP_FRACTION,
    OCR_DPI,
    REFS_CROP_FRACTION,
    extract_document,
    extract_html_doc,
    _empty_record,
    _line_spans,
)
from ..functions.textgeom import reading_order, split_columns
from ..sources import wordbox as wb

# --- declared output schema (SURVEY.md §1.2, flattened) ---------------------
EXTRACTED_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("host", pa.string()),
    ("season", pa.string()),  # gamesheet envelope fields parsed from the
    ("uid", pa.string()),     # URL (reference carries them per request, app.py:359)
    ("n_bytes", pa.int64()),
    ("content_type", pa.string()),
    ("engine", pa.string()),
    ("ok", pa.bool_()),
    ("error", pa.string()),
    ("needs_ocr", pa.bool_()),
    ("text", pa.string()),
    ("title", pa.string()),
    ("span_starts", pa.list_(pa.int64())),
    ("span_ends", pa.list_(pa.int64())),
    ("span_kinds", pa.list_(pa.string())),
    ("match_date", pa.string()),
    ("match_time", pa.string()),
    ("team_home", pa.string()),
    ("team_away", pa.string()),
    ("ref_main", pa.list_(pa.string())),
    ("ref_linesmen", pa.list_(pa.string())),
    ("gk_home_names", pa.list_(pa.string())),
    ("gk_home_flags", pa.list_(pa.string())),
    ("gk_away_names", pa.list_(pa.string())),
    ("gk_away_flags", pa.list_(pa.string())),
    ("n_chars", pa.int64()),
    ("duration_s", pa.float64()),
]
EXTRACTED_SCHEMA = pa.schema(EXTRACTED_FIELDS)

# reference debug=1 intermediates (app.py:203, 261, 336), opt-in columns
DEBUG_FIELDS = [
    ("raw_ref_line", pa.string()),
    ("ocr_ref_line", pa.string()),
    ("ocr_fallback", pa.string()),
]


def extracted_schema(debug: bool = False) -> pa.Schema:
    return pa.schema(EXTRACTED_FIELDS + (DEBUG_FIELDS if debug else []))


_RE_HOST = r"^[a-z]+://(?P<host>[^/]+)"
# {base}/{season}/{uid}/game-{uid}-start-ru.pdf (app.py:49-58 inverted)
_RE_GAMESHEET = r"/(?P<season>\d{4})/(?P<uid>[^/]+)/game-[^/]+-start-ru\.pdf$"


def meta_stage(batch: pa.Table) -> pa.Table:
    """Vectorized projection: n_bytes, host, season/uid envelope columns
    (pure Arrow kernels)."""
    n_bytes = pc.binary_length(batch["html"]).cast(pa.int64())
    host = pc.struct_field(pc.extract_regex(batch["url"], _RE_HOST), "host")
    sheet = pc.extract_regex(batch["url"], _RE_GAMESHEET)
    season = pc.fill_null(pc.struct_field(sheet, "season"), "")
    uid = pc.fill_null(pc.struct_field(sheet, "uid"), "")
    return (
        batch.append_column("n_bytes", pc.fill_null(n_bytes, 0))
        .append_column("host", host)
        .append_column("season", season)
        .append_column("uid", uid)
    )


_CARRIED = ("url", "warc_ts", "lang", "n_bytes", "host", "season", "uid")


def _records_to_table(base: pa.Table, recs: List[Dict], debug: bool = False) -> pa.Table:
    """Assemble the extracted table: carried-through input columns + per-doc
    record columns, with the declared Arrow schema."""
    schema = extracted_schema(debug)
    out_arrays = []
    for field in schema:
        name = field.name
        if name in _CARRIED:
            col = base[name]
            out_arrays.append(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            )
        else:
            out_arrays.append(pa.array([r[name] for r in recs], field.type))
    return pa.Table.from_arrays(out_arrays, schema=schema)


def _extract_text_layer_one(
    payload: Optional[bytes], pre_text: Optional[str], mode: str = "all",
    debug: bool = False,
) -> Dict:
    """Per-document text-layer extraction; flags rows for the OCR pool
    instead of running fallbacks inline.

    ``mode`` mirrors the reference's dispatch (app.py:405-412, M11):
    "all" | "words" (match meta only) | "refs" | "goalies"/"gk" — only the
    selected extractors run; unselected columns stay empty and do not
    trigger OCR fallbacks. ``debug`` adds the reference's debug=1
    intermediates (raw_ref_line app.py:203; the OCR stage fills
    ocr_ref_line / ocr_fallback)."""
    t0 = time.perf_counter()
    do_meta = mode in ("all", "words")
    do_refs = mode in ("all", "refs")
    do_gk = mode in ("all", "gk", "goalies")
    ctype = wb.sniff_content_type(payload)
    rec: Dict
    needs_ocr = False
    if ctype == "text/html":
        rec = extract_html_doc(payload)  # type: ignore[arg-type]
    elif ctype in ("application/x-wbox", "application/pdf"):
        try:
            doc = wb.parse_payload(payload)  # type: ignore[arg-type]
            page = doc.page(0)
            words = reading_order(page.words)
            lines, cols = split_columns(words)
            rec = _empty_record()
            rec["content_type"] = ctype
            rec["engine"] = "pdf-text"
            rec["text"] = "\n".join(lines)
            rec.update(_line_spans(lines))
            if do_meta:
                meta = E.find_match_meta(lines, cols)
                rec["match_date"] = meta["date"]
                rec["match_time"] = meta["time_msk"]
                rec["team_home"] = meta["teams"]["home"]
                rec["team_away"] = meta["teams"]["away"]
            main = linesmen = None
            home = away = None
            if do_refs:
                main, linesmen, dbg = E.find_ref_lines(lines)
                rec["ref_main"] = list(main)
                rec["ref_linesmen"] = list(linesmen)
                if debug:
                    rec["raw_ref_line"] = dbg.get("raw_ref_line", "")
            if do_gk:
                home = E.goalies_from_column(cols["left"])
                away = E.goalies_from_column(cols["right"])
                rec["gk_home_names"] = [g["name"] for g in home]
                rec["gk_home_flags"] = [g["flag"] for g in home]
                rec["gk_away_names"] = [g["name"] for g in away]
                rec["gk_away_flags"] = [g["flag"] for g in away]
            # reference OCR-fallback trigger conditions (app.py:240, 311),
            # gated on the active extractors
            needs_ocr = (
                not lines
                or (do_refs and (not main or not linesmen))
                or (do_gk and not home and not away)
            )
        except wb.PayloadError as e:
            rec = _empty_record()
            rec["content_type"] = ctype
            rec["engine"] = "none"
            rec["ok"] = False
            rec["error"] = str(e)
    else:
        rec = _empty_record()
        if pre_text:
            rec["content_type"] = "text/plain"
            rec["engine"] = "crawler-text"
            rec["text"] = pre_text
            rec.update(_line_spans([pre_text]))
        else:
            rec["ok"] = False
            rec["engine"] = "none"
            rec["error"] = f"unsupported payload ({ctype})"
    rec["needs_ocr"] = needs_ocr
    rec["n_chars"] = len(rec["text"])
    rec["duration_s"] = round(time.perf_counter() - t0, 6)
    if debug:
        rec.setdefault("raw_ref_line", "")
        rec.setdefault("ocr_ref_line", "")
        rec.setdefault("ocr_fallback", "")
    return rec


def extract_text_layer(batch: pa.Table, mode: str = "all", debug: bool = False) -> pa.Table:
    """map_batches body (stateless tasks): text-layer extraction.

    The payload column is dropped for non-OCR rows conceptually, but since
    flagged rows still need their payload in the OCR stage, the payload is
    carried in a pruned side column that the OCR stage drops.
    """
    payloads = batch["html"].to_pylist()
    pre_texts = batch["text"].to_pylist()
    recs = [
        _extract_text_layer_one(p, t, mode, debug) for p, t in zip(payloads, pre_texts)
    ]
    out = _records_to_table(batch, recs, debug)
    # carry payloads ONLY for rows that still need the raster path
    carried = [
        p if r["needs_ocr"] else None for p, r in zip(payloads, recs)
    ]
    return out.append_column("_payload", pa.array(carried, pa.binary()))


@dataclass
class OcrConfig:
    dpi: int = OCR_DPI
    lang: str = "rus+eng"     # reference TESS_LANG (app.py:44)
    # image preprocessing chain + engine mode (app.py:78-81): grayscale ->
    # contrast enhance -> SHARPEN -> tesseract --psm N. The stand-in engine
    # has no pixels to transform, but the knobs are config-complete so a
    # real tesseract drop-in reproduces reference output, and they are part
    # of the extraction-version hash (changing them invalidates checkpoints).
    contrast: float = 1.4
    sharpen: bool = True
    psm: int = 6


class FakeWboxOcrEngine:
    """Deterministic stand-in for a Tesseract/RapidOCR engine (the container
    has no image libs). Holds the 'model' state an actor amortizes; the
    ``image_to_lines`` call is where the reference's preprocessing + OCR
    chain plugs in for real rasters (app.py:78-81):

        gray = img.convert("L")
        gray = ImageEnhance.Contrast(gray).enhance(cfg.contrast)
        if cfg.sharpen: gray = gray.filter(ImageFilter.SHARPEN)
        pytesseract.image_to_string(gray, lang=cfg.lang,
                                    config=f"--psm {cfg.psm}")
    """

    def __init__(self, cfg: OcrConfig):
        self.cfg = cfg

    def page_raster(self, payload: bytes) -> wb.FakeRaster:
        doc = wb.parse_payload(payload)
        return wb.rasterize(doc.page(0), dpi=self.cfg.dpi)

    def image_to_lines(self, raster: wb.FakeRaster) -> List[str]:
        # real engine: preprocessing per the docstring, then tesseract with
        # self.cfg.lang / self.cfg.psm; the stand-in reads planted lines
        return raster.ocr_lines()


class OcrFallbackStage:
    """Actor-pool stage: OCR fallbacks for flagged rows; pass-through others.

    Use as ``ds.map_batches(OcrFallbackStage, concurrency=(k, K),
    batch_size=B, num_cpus=1, batch_format="pyarrow")`` — engine built once
    per actor (north_star ActorPoolStrategy requirement).
    """

    def __init__(
        self,
        dpi: int = OCR_DPI,
        lang: str = "rus+eng",
        mode: str = "all",
        contrast: float = 1.4,
        sharpen: bool = True,
        psm: int = 6,
        debug: bool = False,
    ):
        # plain-kwarg constructor: the args cross the actor boundary as
        # primitives (see remote.py — no package classes in ctor args)
        self.cfg = OcrConfig(dpi=dpi, lang=lang, contrast=contrast, sharpen=sharpen, psm=psm)
        self.engine = FakeWboxOcrEngine(self.cfg)
        self.mode = mode
        self.debug = debug

    def _ocr_one(self, rec: Dict, payload: bytes) -> Dict:
        """Apply the reference's three OCR fallbacks to one flagged row."""
        t0 = time.perf_counter()
        try:
            raster = self.engine.page_raster(payload)
        except wb.PayloadError as e:  # corrupt despite flag: error row
            rec["ok"] = False
            rec["error"] = str(e)
            rec["needs_ocr"] = False
            return rec
        used = False
        # referees (app.py:240-261)
        if self.mode in ("all", "refs") and (
            not rec["ref_main"] or not rec["ref_linesmen"]
        ):
            crop = raster.crop(
                0, 0, raster.width, int(raster.height * REFS_CROP_FRACTION)
            )
            main, linesmen, ln = E.refs_from_ocr_lines(
                self.engine.image_to_lines(crop)
            )
            if main and linesmen:
                rec["ref_main"], rec["ref_linesmen"] = main, linesmen
                used = True
                if self.debug:
                    rec["ocr_ref_line"] = ln  # app.py:261
        # goalies (app.py:311-335)
        if self.mode in ("all", "gk", "goalies") and (
            not rec["gk_home_names"] and not rec["gk_away_names"]
        ):
            h_cut = int(raster.height * GOALIE_CROP_FRACTION)
            left = raster.crop(0, 0, raster.width // 2, h_cut)
            right = raster.crop(raster.width // 2, 0, raster.width, h_cut)
            home = E.goalies_from_ocr_lines(self.engine.image_to_lines(left))
            away = E.goalies_from_ocr_lines(self.engine.image_to_lines(right))
            if self.debug:
                rec["ocr_fallback"] = "ocr"  # set on attempt (app.py:336)
            if home or away:
                rec["gk_home_names"] = [g["name"] for g in home]
                rec["gk_home_flags"] = [g["flag"] for g in home]
                rec["gk_away_names"] = [g["name"] for g in away]
                rec["gk_away_flags"] = [g["flag"] for g in away]
                used = True
        # whole-page text when the text layer was empty
        if not rec["text"]:
            lines = self.engine.image_to_lines(raster)
            rec["text"] = "\n".join(lines)
            rec.update(_line_spans(lines))
            rec["n_chars"] = len(rec["text"])
            used = True
        if used:
            rec["engine"] = "pdf-ocr"
        rec["needs_ocr"] = False
        rec["duration_s"] = round(rec["duration_s"] + time.perf_counter() - t0, 6)
        return rec

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(batch["needs_ocr"], False)
        n_flagged = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        if n_flagged == 0:
            return batch.drop_columns(["_payload"])
        # Python-object conversion ONLY for the flagged slice; the
        # pass-through majority stays zero-copy Arrow
        passthrough = batch.filter(pc.invert(mask)).drop_columns(["_payload"])
        flagged = batch.filter(mask)
        payloads = flagged["_payload"].to_pylist()
        recs = flagged.drop_columns(["_payload"]).to_pylist()
        for i, p in enumerate(payloads):
            if p is not None:
                recs[i] = self._ocr_one(recs[i], p)
        schema = extracted_schema(self.debug)
        done = pa.Table.from_pylist(recs, schema=schema)
        # within-batch row order changes (pass-through first) — the engine
        # guarantees per-url determinism, not row order
        return pa.concat_tables([passthrough.cast(schema), done])


def extract_document_oracle(payload: Optional[bytes], pre_text: Optional[str]) -> Dict:
    """Sequential oracle record for tests: identical semantics to
    text-layer stage + OCR stage composed (see functions.doc_extract)."""
    return extract_document(payload, pre_text)


# --- exploded words surface (M2: reference text_words, app.py:86-94) --------
def words_explode_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> one row per word box (url, page, y_x10, x_x10, token)
    in reading order — the engine's ``words`` intermediate table as a public
    surface (SURVEY.md §1.2). Coordinates are exported as fixed-point
    tenths (integers) so the surface is hash-comparable against the DuckDB
    oracle dump (floats hash unreliably across engines)."""

    urls: List[str] = []
    pages_col: List[int] = []
    ys: List[int] = []
    xs: List[int] = []
    toks: List[str] = []
    for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        ctype = wb.sniff_content_type(payload)
        if ctype not in ("application/x-wbox", "application/pdf"):
            continue
        try:
            doc = wb.parse_payload(payload)
        except wb.PayloadError:
            continue
        for pno, page in enumerate(doc.pages):
            for y, x, t in reading_order(page.words):
                urls.append(url)
                pages_col.append(pno)
                ys.append(int(y * 10 + 0.5))
                xs.append(int(x * 10 + 0.5))
                toks.append(t)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "page": pa.array(pages_col, pa.int64()),
            "y_x10": pa.array(ys, pa.int64()),
            "x_x10": pa.array(xs, pa.int64()),
            "token": pa.array(toks, pa.string()),
        }
    )
