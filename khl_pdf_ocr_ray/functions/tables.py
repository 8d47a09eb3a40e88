"""Table-region segmentation over word boxes.

The north_star names "column detection, table-region segmentation" for
PDF-shaped payloads; columns exist (textgeom.split_columns, app.py:120-133
semantics) and this module adds the table detector. The reference has no
analogue (app.py never segments tables) — the algorithm is the standard
aligned-grid heuristic over the word-box geometry:

1. y-cluster words into visual rows (textgeom.cluster_rows — the same
   greedy clustering the line reconstructor uses, so rows agree with the
   text surface);
2. a row is "tabular" against a column template if >= ``min_cols`` of its
   word x positions align (within ``x_tol``) with the template — the
   template being the x positions of the run's first row;
3. maximal runs of >= ``min_rows`` consecutive tabular rows become table
   regions, reported with their row/column counts, y span, and fill
   ratio (words / (rows x cols)).

Pure per-document geometry — runs inside ``map_batches`` bodies (the
blocks surface) and inside the sequential oracle twin, sharing this exact
code, so the driver's gate certifies the distributed plumbing around it.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .textgeom import DEFAULT_Y_TOL, cluster_rows

Word = Tuple[float, float, str]

DEFAULT_X_TOL = 2.0
MIN_ROWS = 3
MIN_COLS = 2


def _aligned_cols(xs: Sequence[float], template: Sequence[float], x_tol: float) -> int:
    """How many template column positions have a word starting within
    x_tol (each word consumes at most one column, two-pointer sweep)."""
    n = 0
    ti = 0
    for x in sorted(xs):
        while ti < len(template) and template[ti] < x - x_tol:
            ti += 1
        if ti < len(template) and abs(template[ti] - x) <= x_tol:
            n += 1
            ti += 1
    return n


def _table_runs(
    rows, x_tol: float, min_rows: int, min_cols: int
) -> List[Tuple[int, int, List[float]]]:
    """Maximal runs of consecutive tabular rows over the y-clustered row
    list: [(start, end, column template)] — the single run finder both
    the region surface and the cell surface derive from."""
    runs: List[Tuple[int, int, List[float]]] = []
    i = 0
    while i < len(rows):
        _ky, members = rows[i]
        template = sorted(x for x, _t in members)
        if len(template) < min_cols:
            i += 1
            continue
        j = i + 1
        while j < len(rows):
            xs = [x for x, _t in rows[j][1]]
            if _aligned_cols(xs, template, x_tol) < min_cols:
                break
            j += 1
        if j - i >= min_rows:
            runs.append((i, j, template))
            i = j
        else:
            i += 1
    return runs


def detect_table_regions(
    words: Sequence[Word],
    y_tol: float = DEFAULT_Y_TOL,
    x_tol: float = DEFAULT_X_TOL,
    min_rows: int = MIN_ROWS,
    min_cols: int = MIN_COLS,
) -> List[Dict]:
    """Word boxes -> table regions.

    Returns ``[{"y0", "y1", "n_rows", "n_cols", "n_words", "n_chars"}]``
    in top-to-bottom order; deterministic for a given word multiset.
    """
    rows = cluster_rows(words, y_tol)  # [(key_y, [(x, tok), ...])] sorted by y
    regions: List[Dict] = []
    for i, j, template in _table_runs(rows, x_tol, min_rows, min_cols):
        run = rows[i:j]
        n_words = sum(len(m) for _y, m in run)
        n_chars = sum(len(t) for _y, m in run for _x, t in m)
        regions.append(
            {
                "y0": float(run[0][0]),
                "y1": float(run[-1][0]),
                "n_rows": j - i,
                "n_cols": len(template),
                "n_words": n_words,
                "n_chars": n_chars,
            }
        )
    return regions


def table_cells(
    words: Sequence[Word],
    y_tol: float = DEFAULT_Y_TOL,
    x_tol: float = DEFAULT_X_TOL,
    min_rows: int = MIN_ROWS,
    min_cols: int = MIN_COLS,
) -> List[Tuple[int, int, int, str]]:
    """Word boxes -> structured cells: (table_id, row, col, text).

    Every word of a tabular run is assigned to its NEAREST template
    column (ties to the lower index — deterministic); words sharing a
    cell concatenate in x order. Rows keep their run-relative index, so a
    downstream consumer can rebuild the grid exactly."""
    rows = cluster_rows(words, y_tol)
    out: List[Tuple[int, int, int, str]] = []
    for tid, (i, j, template) in enumerate(
        _table_runs(rows, x_tol, min_rows, min_cols)
    ):
        for r, (_y, members) in enumerate(rows[i:j]):
            cells: Dict[int, List[str]] = {}
            for x, tok in sorted(members, key=lambda m: (m[0], m[1])):
                c = min(
                    range(len(template)),
                    key=lambda k: (abs(template[k] - x), k),
                )
                cells.setdefault(c, []).append(tok)
            for c in sorted(cells):
                out.append((tid, r, c, " ".join(cells[c])))
    return out


def table_block_rows(url: str, payload: bytes) -> List[Dict]:
    """The blocks-surface rows for a WBOX/PDF payload's table regions —
    shared verbatim by the distributed blocks query and the sequential
    oracle dump. Column meanings on table rows: ``text_len`` = chars in
    the region, ``link_density_x1e6`` = 0 (no links in PDF space),
    ``text_density_x100`` = fill ratio x100 (words / (rows x cols));
    tables are always kept."""
    from ..sources import wordbox as wb

    try:
        doc = wb.parse_payload(payload)
    except wb.PayloadError:
        return []
    out: List[Dict] = []
    block_id = 0
    for pno, page in enumerate(doc.pages):
        for reg in detect_table_regions(page.words):
            fill = reg["n_words"] / max(reg["n_rows"] * reg["n_cols"], 1)
            out.append(
                {
                    "url": url,
                    "block_id": block_id,
                    "kind": f"table:p{pno}r{reg['n_rows']}c{reg['n_cols']}",
                    "text_len": reg["n_chars"],
                    "link_density_x1e6": 0,
                    "text_density_x100": int(fill * 100),
                    "kept": True,
                }
            )
            block_id += 1
    return out


def table_cell_rows(url: str, payload: bytes) -> List[Dict]:
    """Structured-cell rows for a WBOX/PDF payload — the table regions
    resolved to their (page, table, row, col, text) grid. Shared verbatim
    by the distributed cells query and its sequential oracle twin."""
    from ..sources import wordbox as wb

    try:
        doc = wb.parse_payload(payload)
    except wb.PayloadError:
        return []
    out: List[Dict] = []
    tid_base = 0
    for pno, page in enumerate(doc.pages):
        cells = table_cells(page.words)
        for tid, r, c, text in cells:
            out.append(
                {
                    "url": url,
                    "page": pno,
                    "table_id": tid_base + tid,
                    "row": r,
                    "col": c,
                    "cell_text": text,
                }
            )
        if cells:
            tid_base += 1 + max(t for t, _r, _c, _x in cells)
    return out
