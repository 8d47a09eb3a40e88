"""Unit tests for the layout geometry kernel (SURVEY.md §5.1 / FIXTURES.md F4).

Golden values hand-derived from the reference semantics
(/root/reference/app.py:86-133), not from running the reference.
"""

from khl_pdf_ocr_ray.functions.textgeom import (
    cluster_rows,
    lines_from_words,
    normalize_ws,
    reading_order,
    split_columns,
    upper_median_x,
)


def test_reading_order_rounds_key_only():
    # y 10.04 and 10.01 both round to 10.0 -> ordered by x within the band
    words = [(10.04, 5.0, "b"), (10.01, 1.0, "a"), (9.9, 9.0, "z")]
    out = reading_order(words)
    assert [w[2] for w in out] == ["z", "a", "b"]
    # original y values preserved (rounding only in the key)
    assert out[1][0] == 10.01


def test_greedy_cluster_is_order_dependent():
    # FIXTURES.md F4: ys [10.0, 12.5, 14.0] tol 3.0 -> {10.0: [10.0, 12.5], 14.0: [14.0]}
    words = [(10.0, 0.0, "a"), (12.5, 1.0, "b"), (14.0, 2.0, "c")]
    rows = cluster_rows(words, tolerance=3.0)
    assert [ky for ky, _ in rows] == [10.0, 14.0]
    assert [[t for _, t in m] for _, m in rows] == [["a", "b"], ["c"]]
    # reversed input order clusters differently (14 absorbs 12.5)
    rows2 = cluster_rows(list(reversed(words)), tolerance=3.0)
    assert [ky for ky, _ in rows2] == [10.0, 14.0]
    assert [[t for _, t in m] for _, m in rows2] == [["a"], ["c", "b"]]


def test_lines_join_xsort_normalize():
    words = [(5.0, 100.0, "world"), (5.5, 10.0, "hello"), (50.0, 0.0, "  ")]
    assert lines_from_words(words) == ["hello world"]


def test_lines_drop_empty_and_collapse_ws():
    words = [(5.0, 0.0, "a"), (5.0, 10.0, "b   c")]
    assert lines_from_words(words) == ["a b c"]


def test_upper_median_and_ties_left():
    # xs sorted [1,2,3,4] -> upper median = xs[2] = 3; ties (x==3) go left
    words = [(0.0, 4.0, "d"), (0.0, 2.0, "b"), (0.0, 1.0, "a"), (0.0, 3.0, "c")]
    assert upper_median_x(words) == 3.0
    _lines, cols = split_columns(words)
    assert sorted(t for _, _, t in cols["left"]) == ["a", "b", "c"]
    assert [t for _, _, t in cols["right"]] == ["d"]


def test_split_columns_empty():
    lines, cols = split_columns([])
    assert lines == [] and cols == {"left": [], "right": []}


def test_normalize_ws():
    assert normalize_ws("  a\t b\n\nc ") == "a b c"
