"""Unit checks for the io sizing helpers: footer-only row counts and the
cardinality-aware reduce width (the q10 12s->2s fix)."""

import pyarrow as pa
import pyarrow.parquet as pq

from khl_pdf_ocr_ray.io import (
    _KEYS_PER_REDUCE,
    coalesce_for_input,
    coalesce_for_keys,
    input_nrows,
    table_nrows,
)


def test_input_nrows_reads_footers_only(tmp_path):
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": list(range(123))}), p1)
    pq.write_table(pa.table({"x": list(range(77))}), p2)
    assert input_nrows(p1) == 123
    assert input_nrows([p1, p2]) == 200
    assert input_nrows(str(tmp_path)) == 200
    assert table_nrows(str(tmp_path), "a") == 123


def test_coalesce_for_keys_widens_with_cardinality():
    nb = 10 << 20  # 10 MB input -> byte-derived width is the floor (2)
    low = coalesce_for_keys(nb, n_keys=100)
    assert low == coalesce_for_input(nb)  # low cardinality: bytes rule
    high = coalesce_for_keys(nb, n_keys=120_000)
    assert high > low
    # no reduce task owns more than ~_KEYS_PER_REDUCE keys (up to the
    # 4x-cores cap)
    assert high >= min(high, 120_000 // _KEYS_PER_REDUCE) > 2
