"""Document payload codec: content-type sniffing + word-box access.

The reference opens real PDFs with PyMuPDF and reads word boxes
(``page.get_text("words")``, /root/reference/app.py:92) and rasterizes
pages for Tesseract (app.py:67-71). Neither PyMuPDF nor PIL/tesseract is
available in this container, so the engine defines a *pluggable* payload
layer:

- ``%PDF-`` payloads are parsed with PyMuPDF when importable, else they
  become ``ok=false`` error rows (clearly-marked stub path);
- ``%WBOX1`` payloads are a deterministic stand-in "document" format that
  carries exactly what a PDF parse would yield — per-page word boxes
  ``(y, x, token)`` in point coordinates, plus an optional ``raster_words``
  section standing in for the page image of a scanned document (empty text
  layer). All geometry/entity algorithms run unchanged on either source.
- anything starting with ``<`` / ``<!doctype`` is HTML.

The WBOX raster model reproduces the reference's crop geometry faithfully:
pixel dimensions = points * dpi/72 (app.py:68), crops by pixel box, and an
"OCR" of a crop = line reconstruction over the crop's scaled word boxes —
the deterministic fake demanded by the build brief (image libs absent);
the tesseract call sites are marked.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from ..functions.textgeom import Word, lines_from_words

WBOX_MAGIC = b"%WBOX1\n"
PDF_MAGIC = b"%PDF-"

try:  # real-PDF path: used automatically when the wheel is present
    import fitz  # type: ignore  # PyMuPDF

    HAS_PYMUPDF = True
except Exception:  # pragma: no cover - absent in this container
    fitz = None  # type: ignore
    HAS_PYMUPDF = False


class PayloadError(ValueError):
    """Unparseable document payload (-> ok=false error row, app.py:398-401)."""


def sniff_content_type(payload: Optional[bytes]) -> str:
    """Classify a payload: 'application/pdf' | 'application/x-wbox' |
    'text/html' | 'application/octet-stream' (unknown)."""
    if not payload:
        return "application/octet-stream"
    head = payload[:64]
    if head.startswith(PDF_MAGIC):
        return "application/pdf"
    if head.startswith(WBOX_MAGIC):
        return "application/x-wbox"
    stripped = head.lstrip()
    if stripped[:1] == b"<":
        return "text/html"
    return "application/octet-stream"


# --- WBOX encode ------------------------------------------------------------
def encode_wbox(pages: Sequence[Dict]) -> bytes:
    """Serialize pages -> WBOX bytes.

    Each page dict: ``{"width": float, "height": float,
    "words": [[y, x, token], ...], "raster_words": [[y, x, token], ...]}``
    (``raster_words`` optional; defaults to ``words``).
    """
    doc = {"v": 1, "pages": [
        {
            "width": float(p["width"]),
            "height": float(p["height"]),
            "words": [[float(y), float(x), str(t)] for y, x, t in p.get("words", [])],
            **(
                {"raster_words": [[float(y), float(x), str(t)] for y, x, t in p["raster_words"]]}
                if "raster_words" in p
                else {}
            ),
        }
        for p in pages
    ]}
    return WBOX_MAGIC + json.dumps(doc, ensure_ascii=False, separators=(",", ":")).encode("utf-8")


# --- parsed document --------------------------------------------------------
@dataclass
class DocPage:
    width: float
    height: float
    words: List[Word]               # text layer, unsorted (raw parse order)
    raster_words: List[Word]        # what a rasterization would show


@dataclass
class ParsedDoc:
    pages: List[DocPage]

    def page(self, pno: int = 0) -> DocPage:
        return self.pages[pno]


def parse_payload(payload: bytes) -> ParsedDoc:
    """Open a document payload, like ``fitz.open(stream=...)`` (app.py:399).

    Raises PayloadError for corrupt/unknown payloads; the caller turns that
    into an in-band ``ok=false`` row.
    """
    ctype = sniff_content_type(payload)
    if ctype == "application/x-wbox":
        try:
            doc = json.loads(payload[len(WBOX_MAGIC):].decode("utf-8"))
            pages = []
            for p in doc["pages"]:
                words = [(float(y), float(x), str(t)) for y, x, t in p["words"]]
                raster = [
                    (float(y), float(x), str(t))
                    for y, x, t in p.get("raster_words", p["words"])
                ]
                pages.append(
                    DocPage(float(p["width"]), float(p["height"]), words, raster)
                )
            if not pages:
                raise PayloadError("wbox: zero pages")
            return ParsedDoc(pages)
        except PayloadError:
            raise
        except Exception as e:
            raise PayloadError(f"wbox_parse_error: {e}") from e
    if ctype == "application/pdf":
        if HAS_PYMUPDF:  # reference-identical path when the wheel exists
            try:
                fdoc = fitz.open(stream=payload, filetype="pdf")  # pragma: no cover
                pages = []
                for pno in range(fdoc.page_count):
                    page = fdoc.load_page(pno)
                    raw = page.get_text("words")  # x0,y0,x1,y1,text,block,line,word
                    words = [(w[1], w[0], w[4]) for w in raw]
                    pages.append(DocPage(page.rect.width, page.rect.height, words, words))
                return ParsedDoc(pages)
            except Exception as e:  # pragma: no cover
                raise PayloadError(f"pdf_open_error: {e}") from e
        # no PyMuPDF: the built-in mini reader handles the simple-text-PDF
        # subset (sources/minipdf.py) so real %PDF- bytes still extract
        try:
            from .minipdf import extract_pdf_pages

            pages = [
                DocPage(p["width"], p["height"], p["words"], p["words"])
                for p in extract_pdf_pages(payload)
            ]
            return ParsedDoc(pages)
        except Exception as e:
            raise PayloadError(f"pdf_open_error: {e}") from e
    raise PayloadError(f"unsupported payload ({ctype})")


# --- raster stand-in (crop geometry of app.py:67-71, 242-243, 313-316) -----
@dataclass
class FakeRaster:
    """Pixel-space view of a page, dpi-scaled like ``fitz.Matrix(dpi/72)``."""

    width: int
    height: int
    words: List[Word]  # (y_px, x_px, token)
    scale: float

    def crop(self, x0: int, y0: int, x1: int, y1: int) -> "FakeRaster":
        kept = [w for w in self.words if x0 <= w[1] < x1 and y0 <= w[0] < y1]
        return FakeRaster(x1 - x0, y1 - y0, kept, self.scale)

    def ocr_lines(self) -> List[str]:
        """Deterministic stand-in for ``pytesseract.image_to_string`` +
        line split (app.py:74-83): reconstruct lines from the raster's word
        boxes with the y-tolerance scaled to pixel space."""
        return lines_from_words(self.words, tolerance=3.0 * self.scale)


def rasterize(page: DocPage, dpi: int = 300) -> FakeRaster:
    """Page -> pixel-space raster (app.py:67-71 geometry)."""
    scale = dpi / 72.0
    return FakeRaster(
        width=int(page.width * scale),
        height=int(page.height * scale),
        words=[(y * scale, x * scale, t) for y, x, t in page.raster_words],
        scale=scale,
    )
