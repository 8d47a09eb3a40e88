"""Kernel tests for the HTML table-cell extractor."""

from khl_pdf_ocr_ray.functions.htmltables import extract_html_tables


def test_basic_grid_with_header():
    html = (
        b"<html><body><table>"
        b"<tr><th>a</th><th>b</th></tr>"
        b"<tr><td>1</td><td>2</td></tr>"
        b"<tr><td>3</td><td>4</td></tr>"
        b"</table></body></html>"
    )
    cells = extract_html_tables(html)
    assert cells == [
        (0, 0, 0, True, "a"),
        (0, 0, 1, True, "b"),
        (0, 1, 0, False, "1"),
        (0, 1, 1, False, "2"),
        (0, 2, 0, False, "3"),
        (0, 2, 1, False, "4"),
    ]


def test_two_tables_indexed_in_order():
    html = (
        b"<table><tr><td>x</td></tr></table>"
        b"<p>between</p>"
        b"<table><tr><td>y</td></tr></table>"
    )
    cells = extract_html_tables(html)
    assert [(c[0], c[4]) for c in cells] == [(0, "x"), (1, "y")]


def test_nested_table_flattens_into_cell():
    html = (
        b"<table><tr><td>outer "
        b"<table><tr><td>inner</td></tr></table>"
        b" tail</td></tr></table>"
    )
    cells = extract_html_tables(html)
    assert len(cells) == 1
    assert cells[0] == (0, 0, 0, False, "outer inner tail")


def test_unclosed_cells_close_at_next_boundary():
    html = b"<table><tr><td>a<td>b<tr><td>c</table>"
    cells = extract_html_tables(html)
    assert cells == [
        (0, 0, 0, False, "a"),
        (0, 0, 1, False, "b"),
        (0, 1, 0, False, "c"),
    ]


def test_chrome_inside_cell_dropped_and_ws_normalized():
    html = (
        b"<table><tr><td>  keep <script>var x;</script>"
        b" \n this  </td></tr></table>"
    )
    cells = extract_html_tables(html)
    assert cells == [(0, 0, 0, False, "keep this")]


def test_no_tables_no_rows():
    assert extract_html_tables(b"<html><p>plain</p></html>") == []
