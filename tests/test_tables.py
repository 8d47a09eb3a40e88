"""Table-region segmentation (functions/tables.py): planted grids, edge
cases, and the blocks-surface rows over a real %PDF- roster fixture."""

import os

from khl_pdf_ocr_ray.functions.tables import (
    detect_table_regions,
    table_block_rows,
)
from khl_pdf_ocr_ray.sources.minipdf import build_pdf

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "roster_table.pdf")


def _grid(y0, x_cols, n_rows, dy=12.0, prefix="c"):
    words = []
    for r in range(n_rows):
        for ci, x in enumerate(x_cols):
            words.append((y0 + r * dy, x, f"{prefix}{r}{ci}"))
    return words


def test_detect_planted_grid():
    words = _grid(100.0, [60.0, 160.0, 260.0], 5)
    regions = detect_table_regions(words)
    assert len(regions) == 1
    r = regions[0]
    assert (r["n_rows"], r["n_cols"]) == (5, 3)
    assert (r["y0"], r["y1"]) == (100.0, 148.0)
    assert r["n_words"] == 15


def test_prose_is_not_a_table():
    # every row shifted 13.7 units from the previous: no two consecutive
    # rows share >= 2 x positions within the 2.0 tolerance
    words = []
    for r in range(6):
        for w in range(4):
            words.append((100.0 + r * 12.0, 50.0 + w * 45.0 + r * 13.7, f"w{r}{w}"))
    assert detect_table_regions(words) == []


def test_two_separate_tables():
    words = _grid(100.0, [60.0, 160.0], 3, prefix="a") + _grid(
        400.0, [80.0, 200.0, 320.0], 4, prefix="b"
    )
    regions = detect_table_regions(words)
    assert [(r["n_rows"], r["n_cols"]) for r in regions] == [(3, 2), (4, 3)]


def test_min_rows_threshold():
    assert detect_table_regions(_grid(100.0, [60.0, 160.0], 2)) == []


def test_alignment_tolerance():
    # x jitter within the 2.0 tolerance OF THE RUN'S FIRST ROW still aligns
    words = []
    for r in range(4):
        jitter = (-1.0, 0.0, 1.0, -0.5)[r]
        for x in (60.0, 160.0, 260.0):
            words.append((100.0 + r * 12.0, x + jitter, f"t{r}"))
    regions = detect_table_regions(words)
    assert len(regions) == 1 and regions[0]["n_rows"] == 4


def test_roster_fixture_blocks_rows():
    """Committed gamesheet-with-roster %PDF- fixture: a header line plus a
    7x3 roster grid; the blocks surface reports exactly one table block
    with the hand-computed shape."""
    with open(FIXTURE, "rb") as f:
        payload = f.read()
    assert payload.startswith(b"%PDF-")
    rows = table_block_rows("u", payload)
    assert len(rows) == 1
    b = rows[0]
    assert b["kind"] == "table:p0r7c3"
    assert b["kept"] is True and b["link_density_x1e6"] == 0
    assert b["text_density_x100"] == 100  # full grid: 21 words / (7*3)


def test_roster_fixture_regenerable():
    """The fixture is exactly what the generator below produces —
    documents its provenance and keeps it reproducible."""
    with open(FIXTURE, "rb") as f:
        assert f.read() == _build_roster_pdf()


def _build_roster_pdf() -> bytes:
    words = [(40.0, 60.0, "Составы"), (40.0, 130.0, "команд")]  # header, 2 words
    # 7-row 3-column roster: number / name / position
    names = ["Иванов", "Петров", "Сидоров", "Козлов", "Смирнов", "Волков", "Орлов"]
    for r, nm in enumerate(names):
        y = 80.0 + r * 14.0
        words.append((y, 60.0, str(10 + r)))
        words.append((y, 110.0, nm))
        words.append((y, 260.0, "З" if r % 2 else "Н"))
    return build_pdf([words])


if __name__ == "__main__":
    with open(FIXTURE, "wb") as f:
        f.write(_build_roster_pdf())
    print(f"wrote {FIXTURE}")


def test_table_cells_grid_roundtrip():
    from khl_pdf_ocr_ray.functions.tables import table_cells

    words = _grid(100.0, [60.0, 160.0, 260.0], 4)
    cells = table_cells(words)
    # full 4x3 grid, each cell holding exactly its planted token
    assert len(cells) == 12
    assert all(t == 0 for t, _r, _c, _x in cells)
    got = {(r, c): x for _t, r, c, x in cells}
    for r in range(4):
        for c in range(3):
            assert got[(r, c)] == f"c{r}{c}"


def test_table_cells_multiword_cell_and_nearest_column():
    from khl_pdf_ocr_ray.functions.tables import table_cells

    words = _grid(100.0, [60.0, 160.0], 3)
    # extra word just right of column 1 in ROW 1 (the template is fixed by
    # row 0): nearest-column assignment concatenates it into that cell in
    # x order
    words.append((112.0, 161.5, "extra"))
    cells = {(r, c): x for _t, r, c, x in table_cells(words)}
    assert cells[(1, 1)] == "c11 extra"


def test_table_cells_two_tables_ids():
    from khl_pdf_ocr_ray.functions.tables import table_cells

    words = _grid(100.0, [60.0, 160.0], 3) + _grid(
        400.0, [80.0, 300.0, 500.0], 3, prefix="d"
    )
    tids = sorted({t for t, _r, _c, _x in table_cells(words)})
    assert tids == [0, 1]


def test_table_cell_rows_fixture_consistent_with_regions():
    """Cell rows must cover exactly the words the region surface counts."""
    with open(FIXTURE, "rb") as f:
        payload = f.read()
    blocks = table_block_rows("u", payload)
    from khl_pdf_ocr_ray.functions.tables import table_cell_rows

    cells = table_cell_rows("u", payload)
    assert blocks and cells
    n_words_regions = sum(b["text_len"] for b in blocks)
    n_chars_cells = sum(len(c["cell_text"].replace(" ", "")) for c in cells)
    # text_len counts chars; cell text joins words with single spaces
    assert n_chars_cells == n_words_regions
