"""Kernel tests for the grid-cell interval-overlap join."""

import numpy as np
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_interval import (
    CELL_US,
    expand_cells_batch,
    overlap_filter_batch,
)


def _spans(name_key, key_vals, lo_name, hi_name, lo, hi):
    return pa.table(
        {
            name_key: pa.array(key_vals),
            lo_name: pa.array(lo, pa.int64()),
            hi_name: pa.array(hi, pa.int64()),
        }
    )


def test_expand_covers_every_cell_in_range():
    t = _spans("user_id", [1], "a_start", "a_end", [0], [3 * CELL_US])
    out = expand_cells_batch(t, "a_start", "a_end")
    assert out["cell"].to_pylist() == [0, 1, 2, 3]


def test_expand_single_cell_span():
    t = _spans("user_id", [7], "a_start", "a_end", [CELL_US + 5], [CELL_US + 9])
    out = expand_cells_batch(t, "a_start", "a_end")
    assert out["cell"].to_pylist() == [1]
    assert out["user_id"].to_pylist() == [7]


def _joined(a0, a1, b0, b1, cell):
    return pa.table(
        {
            "user_id": pa.array([1] * len(cell), pa.int64()),
            "event_type": pa.array(["x"] * len(cell)),
            "a_start": pa.array([a0] * len(cell), pa.int64()),
            "a_end": pa.array([a1] * len(cell), pa.int64()),
            "b_start": pa.array([b0] * len(cell), pa.int64()),
            "b_end": pa.array([b1] * len(cell), pa.int64()),
            "cell": pa.array(cell, pa.int64()),
        }
    )


def test_owner_cell_keeps_exactly_one_copy():
    # both intervals cover cells 0..2; the pair meets in all three but
    # max(a_start, b_start) = b_start sits in cell 1 -> one survivor
    a0, a1 = 0, 3 * CELL_US - 1
    b0, b1 = CELL_US + 10, 2 * CELL_US + 10
    out = overlap_filter_batch(_joined(a0, a1, b0, b1, [0, 1, 2]))
    assert len(out) == 1
    assert out["overlap_us"].to_pylist() == [b1 - b0]


def test_non_overlap_excluded_touch_included():
    # disjoint: a ends before b starts
    out = overlap_filter_batch(_joined(0, 5, 10, 20, [0]))
    assert len(out) == 0
    # point touch (a_end == b_start) is a closed-interval overlap of 0 us
    out = overlap_filter_batch(_joined(0, 10, 10, 20, [0]))
    assert out["overlap_us"].to_pylist() == [0]


def test_expansion_then_filter_matches_bruteforce():
    rng = np.random.RandomState(7)
    a_lo = rng.randint(0, 10 * CELL_US, 40).astype(np.int64)
    a_hi = a_lo + rng.randint(1, 4 * CELL_US, 40)
    b_lo = rng.randint(0, 10 * CELL_US, 30).astype(np.int64)
    b_hi = b_lo + rng.randint(1, 4 * CELL_US, 30)
    a = _spans("user_id", list(range(40)), "a_start", "a_end", a_lo, a_hi)
    b = _spans("event_type", [f"t{i}" for i in range(30)], "b_start", "b_end", b_lo, b_hi)
    ae = expand_cells_batch(a, "a_start", "a_end").to_pandas()
    be = expand_cells_batch(b, "b_start", "b_end").to_pandas()
    joined = ae.merge(be, on="cell")
    out = overlap_filter_batch(pa.Table.from_pandas(joined, preserve_index=False))
    got = {
        (u, t)
        for u, t in zip(out["user_id"].to_pylist(), out["event_type"].to_pylist())
    }
    want = {
        (int(i), f"t{j}")
        for i in range(40)
        for j in range(30)
        if a_lo[i] <= b_hi[j] and b_lo[j] <= a_hi[i]
    }
    assert got == want
    assert len(out) == len(want)  # exactly one copy per pair
