"""Minimal PDF reader/writer for the real-``%PDF-`` path.

The reference opens PDFs with PyMuPDF (``fitz.open(stream=...)`` +
``page.get_text("words")``, /root/reference/app.py:92, 399). PyMuPDF is
not installable in this container, so round 1 left the ``%PDF-`` branch an
always-error stub. This module implements the subset of the public PDF
spec (ISO 32000: content streams, text-positioning and text-showing
operators, literal/hex strings, FlateDecode) needed to extract word boxes
from straightforward text PDFs — enough to run REAL ``%PDF-`` bytes
through the whole pipeline end-to-end. ``parse_payload`` still prefers
PyMuPDF when the wheel is present; this is the deterministic fallback.

Scope (documented, asserted by tests):
- text via ``Tj`` / ``'`` / ``"`` / ``TJ``, positioned by ``Td``/``TD``/
  ``Tm``/``T*``; one content stream per page, first ``/MediaBox`` applies;
- FlateDecode streams (zlib) and uncompressed streams;
- literal-string bytes >= 0x80 are decoded as cp1251 (the common simple-
  font encoding for Russian gamesheets); ASCII passes through;
- per-font ``/Widths`` arrays (with ``/FirstChar``/``/MissingWidth``) are
  honored for x-advance, so multi-word strings and ``TJ`` kerning arrays
  place each word at its true x — the upper-median column split
  (app.py:120-133 semantics) stays correct on wild PDFs; fonts without
  ``/Widths`` fall back to a fixed per-character advance (the writer
  below emits one word per ``Td`` so fixtures round-trip exactly either
  way).

The writer produces small, valid, xref-correct PDFs used as committed
fixtures and synthetic-corpus rows.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

Word = Tuple[float, float, str]  # (y, x, token) — y top-down, like fitz words

_RE_MEDIABOX = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_RE_STREAM_HEAD = re.compile(rb"<<((?:[^<>]|<<[^>]*>>)*?)>>\s*stream\r?\n", re.S)
_RE_LENGTH = re.compile(rb"/Length\s+(\d+)")
_RE_TOK = re.compile(
    rb"\((?:\\.|[^\\()])*\)"      # literal string (with escapes)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"                     # array delimiters (TJ)
    rb"|/[^\s/\[\]()<>{}]+"        # name
    rb"|[-+]?[.\d][.\d]*"          # number
    rb"|[A-Za-z'\"*]+"             # operator
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> str:
    """Bytes of a literal string (without parens) -> text; escapes per the
    spec, high bytes via cp1251."""
    if b"\\" not in raw:  # overwhelmingly common: no escapes at all
        return raw.decode("cp1251")
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and raw[j : j + 1].isdigit():
                    digits += raw[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # unknown escape: drop the backslash
            continue
        out += c
        i += 1
    return bytes(out).decode("cp1251")


def _decode_hex(raw: bytes) -> str:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("cp1251")


CHAR_ADVANCE = 0.5  # fallback per-char width (font-size units) when the
                    # font carries no /Widths array

_NUM_STARTS = frozenset(b"+-.0123456789")

_RE_OBJ = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_RE_WIDTHS = re.compile(rb"/Widths\s*\[([\s\d.+-]*)\]")
_RE_FIRSTCHAR = re.compile(rb"/FirstChar\s+(\d+)")
_RE_MISSINGW = re.compile(rb"/MissingWidth\s+([\d.+-]+)")
_RE_FONT_DICT = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_RE_FONT_REF = re.compile(rb"/([^\s/\[\]()<>{}]+)\s+(\d+)\s+0\s+R")

DEFAULT_GLYPH_W = 500.0  # 1/1000 text-space units when a code is unmapped


def parse_font_widths(payload: bytes) -> Dict[str, Dict[int, float]]:
    """Resource font name (e.g. "F1") -> {char code: glyph width/1000}.

    Only fonts that declare ``/Widths`` appear in the map; fonts without
    one use the CHAR_ADVANCE fallback. Resource names are assumed
    consistent across pages (true for the single-resource-dict PDFs this
    subset targets; a wild PDF with per-page conflicting names would need
    per-page resource resolution)."""
    by_obj: Dict[int, Dict[int, float]] = {}
    for m in _RE_OBJ.finditer(payload):
        body = m.group(2)
        if b"/Font" not in body and b"/Widths" not in body:
            continue
        mw = _RE_WIDTHS.search(body)
        if not mw:
            continue
        vals = [float(v) for v in mw.group(1).split()]
        mf = _RE_FIRSTCHAR.search(body)
        first = int(mf.group(1)) if mf else 0
        table = {first + i: w for i, w in enumerate(vals)}
        mm = _RE_MISSINGW.search(body)
        if mm:
            table[-1] = float(mm.group(1))
        by_obj[int(m.group(1))] = table
    fonts: Dict[str, Dict[int, float]] = {}
    for m in _RE_FONT_DICT.finditer(payload):
        for name, obj_id in _RE_FONT_REF.findall(m.group(1)):
            table = by_obj.get(int(obj_id))
            if table is not None:
                fonts[name.decode("latin-1")] = table
    return fonts


def _text_width(
    s: str, widths: Optional[Dict[int, float]], font_size: float
) -> float:
    """Advance of a shown string in text space: per-glyph /Widths when the
    font declares them, else the fixed fallback."""
    if widths is None:
        return len(s) * CHAR_ADVANCE * font_size
    raw = s.encode("cp1251", errors="replace")
    default = widths.get(-1, DEFAULT_GLYPH_W)
    return sum(widths.get(b, default) for b in raw) / 1000.0 * font_size


def _emit_words(
    words: List[Word], text: str, tx: float, ty: float,
    font_size: float, page_h: float,
    widths: Optional[Dict[int, float]] = None,
) -> None:
    y = page_h - ty
    parts = text.split(" ")
    x = tx
    space_w = _text_width(" ", widths, font_size)
    for p in parts:
        if p:
            words.append((y, x, p))
        x += _text_width(p, widths, font_size) + space_w


def _page_words(
    content: bytes, page_h: float,
    fonts: Optional[Dict[str, Dict[int, float]]] = None,
) -> List[Word]:
    words: List[Word] = []
    stack: List[object] = []
    in_array: Optional[List[object]] = None
    tx = ty = 0.0
    line_tx = line_ty = 0.0  # Td/TD/T* operate relative to the LINE start
    leading = 0.0
    font_size = 12.0
    widths: Optional[Dict[int, float]] = None  # current font's /Widths
    for m in _RE_TOK.finditer(content):
        tok = m.group(0)
        # first-byte dispatch: the tokenizer's alternatives have disjoint
        # leading bytes, so tok[0] alone routes each token class (this
        # replaces per-token re.fullmatch probes — 170+ tokens per stream)
        c = tok[0]
        if c == 0x5B:  # [
            in_array = []
            continue
        if c == 0x5D:  # ]
            stack.append(in_array)
            in_array = None
            continue
        target = in_array if in_array is not None else stack
        if c == 0x28:  # (
            target.append(("str", _decode_literal(tok[1:-1])))
            continue
        if c == 0x3C:  # <
            target.append(("str", _decode_hex(tok[1:-1])))
            continue
        if c == 0x2F:  # /
            target.append(("name", tok[1:].decode("latin-1")))
            continue
        if c in _NUM_STARTS:  # [-+.0-9] — the number alternative
            target.append(("num", float(tok)))
            continue
        op = tok
        if op == b"Tf" and len(stack) >= 1 and stack[-1][0] == "num":
            font_size = float(stack[-1][1])
            if len(stack) >= 2 and stack[-2][0] == "name":
                widths = (fonts or {}).get(stack[-2][1])
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            dx, dy = float(stack[-2][1]), float(stack[-1][1])
            line_tx += dx
            line_ty += dy
            tx, ty = line_tx, line_ty
            if op == b"TD":
                leading = -dy
        elif op == b"Tm" and len(stack) >= 6:
            line_tx, line_ty = float(stack[-2][1]), float(stack[-1][1])
            tx, ty = line_tx, line_ty
        elif op == b"T*":
            line_ty -= leading
            tx, ty = line_tx, line_ty
        elif op == b"TL" and stack:
            leading = float(stack[-1][1])
        elif op == b"Tj" and stack and stack[-1][0] == "str":
            _emit_words(words, stack[-1][1], tx, ty, font_size, page_h, widths)
            # a show op ADVANCES the text position (ISO 32000 9.4.4) —
            # without this, consecutive Tj in one line stack every word at
            # the line start, corrupting reading order and the median-x
            # column split on wild PDFs
            tx += _text_width(stack[-1][1], widths, font_size)
        elif op in (b"'", b'"') and stack and stack[-1][0] == "str":
            line_ty -= leading
            tx, ty = line_tx, line_ty
            _emit_words(words, stack[-1][1], tx, ty, font_size, page_h, widths)
            tx += _text_width(stack[-1][1], widths, font_size)
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            x = tx
            for kind, val in stack[-1]:
                if kind == "str":
                    _emit_words(words, val, x, ty, font_size, page_h, widths)
                    x += _text_width(val, widths, font_size)
                elif kind == "num":
                    # kerning adjustment: thousandths of text space,
                    # subtracted from the advance (ISO 32000 9.4.3)
                    x -= val / 1000.0 * font_size
            tx = x  # pen position after the array show
        elif op == b"BT":
            tx = ty = line_tx = line_ty = 0.0
        if op not in (b"[",):
            stack.clear()
    return words


def extract_pdf_pages(payload: bytes) -> List[Dict]:
    """PDF bytes -> [{"width", "height", "words": [(y, x, token), ...]}]
    — one entry per content stream, in document order. Raises ValueError
    for PDFs outside the supported subset (no text streams found)."""
    mb = _RE_MEDIABOX.search(payload)
    if mb:
        x0, y0, x1, y1 = (float(mb.group(i)) for i in range(1, 5))
        width, height = x1 - x0, y1 - y0
    else:
        width, height = 595.0, 842.0  # A4 default
    fonts = parse_font_widths(payload)
    pages = []
    for m in _RE_STREAM_HEAD.finditer(payload):
        head = m.group(1)
        start = m.end()
        ml = _RE_LENGTH.search(head)
        if ml:
            # the declared /Length bounds the body exactly — binary stream
            # data may legally contain the bytes "endstream"
            body = payload[start : start + int(ml.group(1))]
        else:
            end = payload.find(b"endstream", start)
            body = payload[start : end if end >= 0 else len(payload)]
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body)
            except Exception as e:
                raise ValueError(f"flate_error: {e}") from e
        if b"BT" not in body:
            continue  # not a text content stream (image/xobject/etc.)
        pages.append(
            {"width": width, "height": height, "words": _page_words(body, height, fonts)}
        )
    if not pages:
        raise ValueError("no text content streams found (unsupported PDF subset)")
    return pages


# --- writer ------------------------------------------------------------------
def _escape_literal(s: str) -> bytes:
    # errors="replace": degrade non-cp1251 glyphs like the reader side's
    # width table does, instead of crashing corpus generation on one token
    raw = s.encode("cp1251", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def build_pdf(
    pages: Sequence[Sequence[Word]],
    width: float = 595.0,
    height: float = 842.0,
    font_size: float = 10.0,
    compress: bool = False,
) -> bytes:
    """Words -> a small valid PDF (one ``Td``+``Tj`` per word, so the mini
    reader recovers (y, x, token) exactly). ``y`` is top-down like the
    reader's output."""
    streams = []
    for words in pages:
        ops = []
        for y, x, tok in words:
            ops.append(
                b"BT /F1 %.2f Tf %.2f %.2f Td (%s) Tj ET"
                % (font_size, x, height - y, _escape_literal(tok))
            )
        body = b"\n".join(ops)
        if compress:
            comp = zlib.compress(body)
            streams.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
        else:
            streams.append(
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body)
            )

    objects: List[bytes] = []
    n_pages = len(pages)
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % oid for oid in page_obj_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    )  # 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # 3
    for i in range(n_pages):
        content_id = page_obj_ids[i] + 1
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.2f %.2f] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (width, height, content_id)
        )
        objects.append(streams[i])

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)
