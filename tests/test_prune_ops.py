"""Kernel tests for the scan-pruning evaluation."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from khl_pdf_ocr_ray.pipelines.queries_prune import (
    file_stats_batch,
    prune_finalize,
    select_count_partial,
)


def _write_ts(tmp_path, name, us_values):
    t = pa.table(
        {"warc_ts": pa.array(np.array(us_values, dtype="datetime64[us]"))}
    )
    p = os.path.join(str(tmp_path), name)
    pq.write_table(t, p)
    return p


def test_file_stats_exact_min_max(tmp_path):
    p = _write_ts(tmp_path, "a.parquet", [100, 500, 300])
    out = file_stats_batch(pa.table({"path": [p]})).to_pandas()
    assert out["ts_min"].tolist() == [100]
    assert out["ts_max"].tolist() == [500]
    assert out["n_rows"].tolist() == [3]


def test_select_count_half_open_predicate():
    batch = pa.table(
        {
            "path": pa.array(["/x/f.parquet"] * 4),
            "warc_ts": pa.array(np.array([10, 20, 30, 40], dtype="datetime64[us]")),
        }
    )
    out = select_count_partial(batch, t_lo=20, t_hi=40).to_pandas()
    assert out["file"].tolist() == ["f.parquet"]
    assert out["n_sel"].tolist() == [2]  # 20 and 30; 40 excluded


def test_prune_finalize_flags_and_guard():
    joined = pa.table(
        {
            "file": ["a", "b"],
            "ts_min": pa.array([0, 100], pa.int64()),
            "ts_max": pa.array([9, 200], pa.int64()),
            "n_rows": pa.array([5, 5], pa.int64()),
            "n_sel": pa.array([0, 3], pa.int64()),
        }
    )
    out = prune_finalize(joined, t_lo=50, t_hi=150).to_pandas()
    assert out["prunable"].tolist() == [True, False]
    # the loud invariant: a prunable file must have zero selected rows
    bad = pa.table(
        {
            "file": ["a"],
            "ts_min": pa.array([0], pa.int64()),
            "ts_max": pa.array([9], pa.int64()),
            "n_rows": pa.array([5], pa.int64()),
            "n_sel": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(AssertionError, match="pruning would drop"):
        prune_finalize(bad, t_lo=50, t_hi=150)
