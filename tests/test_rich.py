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


# --- PR-AUC / ECE (queries_prcurve) -----------------------------------------
def test_pr_auc_perfect_and_random_classifiers():
    from khl_pdf_ocr_ray.pipelines.queries_prcurve import (
        PR_FX,
        pr_auc_from_cells,
    )

    # perfect separation: all positives above all negatives -> AUC ~ 1
    cells = pd.DataFrame(
        {"score": [9, 8, 1, 0], "n": [5, 5, 5, 5], "n_pos": [5, 5, 0, 0]}
    )
    n_pos, n_neg, auc = pr_auc_from_cells(cells)
    assert (n_pos, n_neg) == (10, 10)
    assert auc == PR_FX  # exactly 1.0 in fx40
    # constant-rate classifier: precision == base rate at every
    # threshold -> AUC ~ p
    cells = pd.DataFrame(
        {"score": [3, 2, 1], "n": [10, 10, 10], "n_pos": [3, 3, 3]}
    )
    _, _, auc = pr_auc_from_cells(cells)
    assert abs(auc / PR_FX - 0.3) < 0.01


def test_pr_auc_matches_sklearn_style_reference():
    from khl_pdf_ocr_ray.pipelines.queries_prcurve import (
        PR_FX,
        pr_auc_from_cells,
    )

    rng = np.random.default_rng(21)
    scores = rng.integers(0, 50, size=400)
    labels = (rng.random(size=400) < scores / 60).astype(int)
    cells = (
        pd.DataFrame({"score": scores, "pos": labels})
        .groupby("score")
        .agg(n=("pos", "size"), n_pos=("pos", "sum"))
        .reset_index()
    )
    n_pos, n_neg, auc = pr_auc_from_cells(cells)
    # independent float reference: same step-curve rectangle rule
    c = cells.sort_values("score", ascending=False)
    ctp = c["n_pos"].cumsum().to_numpy()
    call = c["n"].cumsum().to_numpy()
    want = float(
        np.sum((c["n_pos"].to_numpy() / n_pos) * (ctp / call))
    )
    assert abs(auc / PR_FX - want) < 1e-6


def test_ece_zero_when_perfectly_calibrated():
    from khl_pdf_ocr_ray.pipelines.queries_prcurve import ece_from_bins

    bins = pd.DataFrame(
        {
            "n_docs": [10, 20],
            "pos_rate_milli": [100, 700],
            "mean_score_milli": [100, 700],
        }
    )
    assert int(ece_from_bins(bins).ece_ppm.iloc[0]) == 0
    bins["mean_score_milli"] = [200, 700]  # 10 docs off by 100 milli
    # 10 * 100 * 1000 // 30 = 33333
    assert int(ece_from_bins(bins).ece_ppm.iloc[0]) == 33333
