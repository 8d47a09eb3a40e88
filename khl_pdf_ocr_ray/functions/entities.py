"""Entity extractors over reconstructed lines/columns.

Pure functions, no Ray. Each replicates the corresponding reference
extractor semantics exactly (byte-identity target), with the reference
locations cited per function (reference: /root/reference/app.py).

Extractors:
- match metadata: date, Moscow time, team names (app.py:138-179)
- referees: header + name-pair parsing, plus the OCR-text variant which
  uses a *different* token-split regex (app.py:191-231 vs app.py:246-260)
- goalies: per-column section scan with Cyrillic С/Р -> Latin "C"/"R"
  flag mapping (app.py:273-300, 320-332)

All regexes are compiled at module import — once per worker process.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from .textgeom import Word, lines_from_words, normalize_ws

# --- compiled patterns (SURVEY.md §2.8 inventory) ---------------------------
RE_DATE_NUM = re.compile(r"\b\d{2}\.\d{2}\.\d{4}\b")                 # app.py:147
RE_DATE_RU = re.compile(r"\b\d{1,2}\s+[А-Яа-яё]+\s+20\d{2}")         # app.py:151
RE_TIME = re.compile(r"\b([01]\d|2[0-3]):[0-5]\d\b")                 # app.py:158
RE_CAPS_RUN = re.compile(r"[А-ЯЁ]{3,}")                              # app.py:171
RE_MULTI_SPACE = re.compile(r"\s{2,}")                               # app.py:175
RE_UPDATED = re.compile(r"Обновлено.*", re.I)                        # app.py:204
RE_SPLIT_TEXT = re.compile(r"[,\|;]+|\s+")                           # app.py:205 (quantified class)
RE_SPLIT_OCR = re.compile(r"[,|;]|\s+")                              # app.py:252 (UNquantified — intentional difference)
RE_NAME_TOKEN = re.compile(r"^[А-ЯЁ][а-яё\-]+$")                     # app.py:210
RE_FULL_NAME = re.compile(r"([А-ЯЁ][а-яё\-]+ [А-ЯЁ][а-яё\-]+(?: [А-ЯЁ][а-яё\-]+)?)")  # app.py:290
RE_FLAG_C = re.compile(r"\bС\b")                                     # app.py:295 (Cyrillic Es)
RE_FLAG_R = re.compile(r"\bР\b")                                     # app.py:297 (Cyrillic Er)
RE_LINEUP_STOP = re.compile(r"\bЗвено\s*\d")                         # app.py:288

REF_HEADER_MAIN = "Главный судья"
REF_HEADER_LINE = "Линейный судья"
GOALIE_HEADER = "Вратари"
LINEUP_PREFIX = "Звено"


# --- match metadata (app.py:138-179) ----------------------------------------
def find_date(lines: Sequence[str]) -> str:
    """First dd.mm.yyyy in lines[:160], else first Russian long date."""
    for ln in lines[:160]:
        m = RE_DATE_NUM.search(ln)
        if m:
            return m.group(0)
        m = RE_DATE_RU.search(ln)
        if m:
            # the reference strips a " г." suffix that the pattern can never
            # capture (match ends at the year) — kept for parity (app.py:153)
            return m.group(0).replace(" г.", "").strip()
    return ""


def find_time(lines: Sequence[str]) -> str:
    """First HH:MM (00-23:00-59) in lines[:200]."""
    for ln in lines[:200]:
        m = RE_TIME.search(ln)
        if m:
            return m.group(0)
    return ""


def top_caps_team(words_part: Sequence[Word]) -> str:
    """Team name: longest CAPS-run line in the top quarter of a column's
    y-range (app.py:163-175)."""
    if not words_part:
        return ""
    ys = [w[0] for w in words_part]
    y_cut = min(ys) + 0.25 * (max(ys) - min(ys))
    top = [w for w in words_part if w[0] <= y_cut]
    candidates = [
        ln
        for ln in lines_from_words(top, tolerance=3.0)
        if RE_CAPS_RUN.search(ln) and len(ln) >= 8
    ]
    if not candidates:
        return ""
    best = sorted(candidates, key=len, reverse=True)[0]
    return RE_MULTI_SPACE.sub(" ", best).strip()


def find_match_meta(lines: Sequence[str], cols: Dict[str, List[Word]]) -> Dict:
    """Assemble {date, time_msk, teams:{home, away}} (app.py:138-179)."""
    return {
        "date": find_date(lines),
        "time_msk": find_time(lines),
        "teams": {
            "home": top_caps_team(cols.get("left", [])),
            "away": top_caps_team(cols.get("right", [])),
        },
    }


# --- referees (app.py:191-231, OCR variant 246-260) -------------------------
def _pair_names_buffered(parts: Sequence[str]) -> List[str]:
    """Pair consecutive Cyrillic name tokens; the buffer resets on any
    non-name token (app.py:207-216)."""
    names: List[str] = []
    buf: List[str] = []
    for p in parts:
        if RE_NAME_TOKEN.match(p):
            buf.append(p)
            if len(buf) == 2:
                names.append(" ".join(buf))
                buf = []
        else:
            buf = []
    return names


def _pair_names_sliding(parts: Sequence[str]) -> List[str]:
    """Overlapping sliding-window pairs of adjacent name tokens
    (app.py:219-224 / 253-257)."""
    out: List[str] = []
    for a, b in zip(parts, parts[1:]):
        if RE_NAME_TOKEN.match(a) and RE_NAME_TOKEN.match(b):
            out.append(f"{a} {b}")
    return out


def find_ref_lines(lines: Sequence[str]) -> Tuple[List[str], List[str], Dict]:
    """Referees from the text layer (app.py:191-231).

    Header line must contain BOTH header substrings within lines[:100]; the
    following line carries the names. Returns (main[2], linesmen[2], debug).
    """
    header_idx = next(
        (
            i
            for i, ln in enumerate(lines[:100])
            if REF_HEADER_MAIN in ln and REF_HEADER_LINE in ln
        ),
        -1,
    )
    if header_idx == -1 or header_idx + 1 >= len(lines):
        return [], [], {"note": "ref header not found"}

    raw = lines[header_idx + 1]
    debug = {"raw_ref_line": raw}
    cleaned = RE_UPDATED.sub("", raw).strip()
    parts = [p for p in RE_SPLIT_TEXT.split(cleaned) if p]

    names = _pair_names_buffered(parts)
    if len(names) < 4 and len(parts) >= 4:
        alt = _pair_names_sliding(parts)
        if len(alt) >= 4:
            names = alt[:4]
    return names[:2], names[2:4], debug


def refs_from_ocr_lines(ocr_lines: Sequence[str]) -> Tuple[List[str], List[str], str]:
    """Referees from OCR output lines (app.py:246-260).

    Differences vs the text-layer path, kept deliberately: header searched in
    lines[:120]; split with the UNquantified class ``[,|;]|\\s+``; only the
    sliding-window pairing; requires >= 4 candidates. Returns
    (main, linesmen, matched_line).
    """
    header_idx = next(
        (
            i
            for i, ln in enumerate(ocr_lines[:120])
            if REF_HEADER_MAIN in ln and REF_HEADER_LINE in ln
        ),
        -1,
    )
    if header_idx == -1 or header_idx + 1 >= len(ocr_lines):
        return [], [], ""
    raw = ocr_lines[header_idx + 1]
    parts = [p for p in RE_SPLIT_OCR.split(raw) if p]
    cand = _pair_names_sliding(parts)
    if len(cand) >= 4:
        return cand[:2], cand[2:4], raw
    return [], [], ""


# --- goalies (app.py:273-300, OCR variant 320-332) --------------------------
def _name_and_flag(line: str) -> Dict | None:
    """Full-name + С/Р flag from one line (app.py:290-299)."""
    m = RE_FULL_NAME.search(line)
    if not m:
        return None
    flag = ""
    if RE_FLAG_C.search(line):
        flag = "C"
    elif RE_FLAG_R.search(line):
        flag = "R"
    return {"name": m.group(1).strip(), "flag": flag}


def goalies_from_column(words_part: Sequence[Word]) -> List[Dict]:
    """Goalie list from one column's words (app.py:273-300).

    Finds a line starting with "Вратари" in lines[:120], then scans the next
    <= 39 lines until a lineup ("Звено") marker, collecting name+flag rows.
    """
    if not words_part:
        return []
    lines = lines_from_words(words_part, tolerance=3.0)
    start = next(
        (i for i, ln in enumerate(lines[:120]) if ln.strip().startswith(GOALIE_HEADER)),
        -1,
    )
    if start == -1:
        return []
    out: List[Dict] = []
    for ln in lines[start + 1 : start + 40]:
        if ln.startswith(LINEUP_PREFIX) or RE_LINEUP_STOP.search(ln):
            break
        rec = _name_and_flag(ln)
        if rec is not None:
            out.append(rec)
    return out


def goalies_from_ocr_lines(ocr_lines: Sequence[str]) -> List[Dict]:
    """Goalies from OCR lines of one half-page crop (app.py:320-332):
    no header requirement, no stop marker — every line with a full name."""
    out: List[Dict] = []
    for ln in ocr_lines:
        rec = _name_and_flag(ln)
        if rec is not None:
            out.append(rec)
    return out


def empty_entities() -> Dict:
    """The ok-but-nothing-found entity shape (app.py:356-361 envelope)."""
    return {
        "match": {"date": "", "time_msk": "", "teams": {"home": "", "away": ""}},
        "referees": {"main": [], "linesmen": []},
        "goalies": {"home": [], "away": []},
    }
