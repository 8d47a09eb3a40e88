"""Kernel tests for vocab richness (Chao1/Good-Turing) and the
weighted median."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_rich import (
    rich_fof_partial,
    weighted_median_from_hist,
    wq_hist_partial,
)

RNG = np.random.default_rng(17)


def test_fof_partial_counts_frequency_classes():
    t = pa.table(
        {
            "term": ["a", "b", "c", "d"],
            "cnt": pa.array([1, 1, 2, 9], pa.int64()),
        }
    )
    out = rich_fof_partial(t).to_pandas().iloc[0]
    assert (out.n_distinct, out.n_tokens, out.f1, out.f2) == (4, 13, 2, 1)


def test_weighted_median_matches_expansion():
    """The discrete weighted median == the lower median of the
    weight-expanded multiset."""
    for _ in range(10):
        vals = np.sort(RNG.choice(1000, size=20, replace=False))
        w = RNG.integers(1, 9, size=20)
        hist = pd.DataFrame({"cents": vals, "w": w})
        W, med = weighted_median_from_hist(hist)
        expanded = np.sort(np.repeat(vals, w))
        assert W == int(w.sum())
        # lower median: smallest v with 2 * #(<= v) >= W
        want = expanded[(len(expanded) - 1) // 2]
        assert med == want, (med, want, vals, w)


def test_weighted_median_degenerate_single_value():
    W, med = weighted_median_from_hist(
        pd.DataFrame({"cents": [42], "w": [7]})
    )
    assert (W, med) == (7, 42)


def test_wq_hist_partial_sums_weights():
    t = pa.table(
        {
            "l_extendedprice": [10.0, 10.0, 20.0],
            "l_quantity": [2.0, 3.0, 4.0],
        }
    )
    out = (
        wq_hist_partial(t).to_pandas().sort_values("cents", ignore_index=True)
    )
    assert out.to_dict("records") == [
        {"cents": 1000, "w": 5},
        {"cents": 2000, "w": 4},
    ]
