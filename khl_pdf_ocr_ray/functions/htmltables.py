"""HTML table extraction: <table>/<tr>/<td|th> -> structured cell grid.

The HTML twin of the PDF table-region segmentation (functions/tables.py /
``pdf_table_cells``): per document, every TOP-LEVEL table resolves to
(table_idx, row, col, is_header, text) cells. Built on the stdlib
``html.parser`` like the block scorer (the container has no lxml); pure
per-document function, runs inside ``map_batches``.

Semantics (deterministic, documented):
- tables are indexed in document order; only DEPTH-1 tables produce
  rows — a nested <table> inside a cell contributes its text to that
  CELL (flattened), not new grid rows;
- rows are <tr> in order; cells are <td>/<th> in order within their
  row; ``is_header`` is the tag kind;
- cell text is the concatenated character data under the cell,
  whitespace-normalized (textgeom.normalize_ws — the app.py:114
  convention); chrome subtrees (script/style/...) are dropped like the
  block scorer does;
- misnesting tolerated: an unclosed cell closes at the next cell/row/
  table boundary.

Reference analogue: /root/reference/app.py:120-133 reconstructs COLUMN
structure from PDF geometry; this is the same capability on the markup
side (north_star: "PDF layout parsing ... table-region segmentation"
generalized to the HTML payload class).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Tuple

from .html_extract import CHROME_TAGS
from .textgeom import normalize_ws

Cell = Tuple[int, int, int, bool, str]  # (table_idx, row, col, is_header, text)


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: List[Cell] = []
        self._skip_depth = 0
        self._table_depth = 0
        self._table_idx = -1
        self._row = -1
        self._col = -1
        self._in_cell = False
        self._is_header = False
        self._parts: List[str] = []

    def _flush_cell(self) -> None:
        if self._in_cell:
            self.cells.append(
                (
                    self._table_idx,
                    self._row,
                    self._col,
                    self._is_header,
                    normalize_ws("".join(self._parts)),
                )
            )
            self._in_cell = False
            self._parts = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._skip_depth or tag in CHROME_TAGS:
            self._skip_depth += 1
            return
        if tag == "table":
            if self._table_depth == 0:
                self._flush_cell()  # tolerate a table opening inside junk
                self._table_idx += 1
                self._row = -1
                self._col = -1
            self._table_depth += 1
            return
        if self._table_depth != 1:
            return  # outside any table, or flattened inside a nested one
        if tag == "tr":
            self._flush_cell()
            self._row += 1
            self._col = -1
        elif tag in ("td", "th"):
            self._flush_cell()
            self._col += 1
            self._in_cell = True
            self._is_header = tag == "th"
            self._parts = []

    def handle_endtag(self, tag: str) -> None:
        if self._skip_depth:
            self._skip_depth -= 1
            return
        if tag == "table":
            if self._table_depth == 1:
                self._flush_cell()
            self._table_depth = max(0, self._table_depth - 1)
            return
        if self._table_depth == 1 and tag in ("td", "th", "tr"):
            self._flush_cell()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_cell:
            self._parts.append(data)

    def close(self) -> None:
        super().close()
        self._flush_cell()


def extract_html_tables(payload: bytes) -> List[Cell]:
    """HTML bytes -> cell tuples for every top-level table (utf-8,
    errors replaced — same decode contract as the block scorer)."""
    parser = _TableParser()
    parser.feed(payload.decode("utf-8", errors="replace"))
    parser.close()
    return parser.cells
