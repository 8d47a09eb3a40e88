"""Kernel tests for the parquet footer audit (queries_meta)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from khl_pdf_ocr_ray.pipelines.queries_meta import footer_scan_batch


def _write(tmp_path, name, table, row_group_size=None):
    p = os.path.join(str(tmp_path), name)
    pq.write_table(table, p, row_group_size=row_group_size)
    return p


def test_footer_scan_counts_and_nulls(tmp_path):
    t = pa.table(
        {
            "a": pa.array([1, 2, None, 4, None], pa.int64()),
            "b": pa.array(["x", None, "z", "w", "v"], pa.string()),
        }
    )
    p = _write(tmp_path, "t.parquet", t, row_group_size=2)  # 3 row groups
    out = footer_scan_batch(
        pa.table({"tbl": ["t"], "path": [p]})
    ).to_pandas().set_index("col")
    assert out.loc["a", "n_groups"] == 3
    assert out.loc["a", "n_values"] == 5
    assert out.loc["a", "null_count"] == 2
    assert out.loc["b", "null_count"] == 1
    # footprints come straight from the footer
    md = pq.ParquetFile(p).metadata
    comp = sum(
        md.row_group(i).column(0).total_compressed_size
        for i in range(md.num_row_groups)
    )
    assert out.loc["a", "comp_bytes"] == comp


def test_footer_scan_multi_file_partials_fold(tmp_path):
    t = pa.table({"a": pa.array(range(10), pa.int64())})
    p1 = _write(tmp_path, "x1.parquet", t)
    p2 = _write(tmp_path, "x2.parquet", t, row_group_size=5)
    out = footer_scan_batch(
        pa.table({"tbl": ["x", "x"], "path": [p1, p2]})
    ).to_pandas()
    # one partial row per FILE — the groupby folds them downstream
    assert len(out) == 2
    assert out["n_values"].sum() == 20
    assert sorted(out["n_groups"].tolist()) == [1, 2]
