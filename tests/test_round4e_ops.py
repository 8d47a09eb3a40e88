"""Kernel tests for the round-4e operator wave (session 4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


# --- part_best_supplier ------------------------------------------------------


def test_best_supp_packed_argmin_tiebreak():
    """Min(packed) must pick lowest unit price, then lowest suppkey."""
    from khl_pdf_ocr_ray.pipelines.queries_relx import (
        SUPP_PACK,
        best_supp_partial,
    )

    df = pd.DataFrame(
        {
            "l_partkey": np.int64([1, 1, 1, 2]),
            "l_suppkey": np.int64([9, 3, 7, 5]),
            # unit prices: part 1 -> 2.00 (supp 9), 2.00 (supp 3), 3.00
            # (supp 7); tie at 200 cents resolves to supp 3
            "l_quantity": np.float64([2.0, 1.0, 1.0, 4.0]),
            "l_extendedprice": np.float64([4.0, 2.0, 3.0, 8.0]),
            "l_discount": np.float64([0.0, 0.0, 0.0, 0.0]),
        }
    )
    out = best_supp_partial(_t(df)).to_pandas().set_index("l_partkey")
    assert int(out.loc[1, "packed"]) == 200 * SUPP_PACK + 3
    assert int(out.loc[2, "packed"]) == 200 * SUPP_PACK + 5


def test_best_supp_pack_bound_asserts():
    from khl_pdf_ocr_ray.pipelines.queries_relx import (
        SUPP_PACK,
        best_supp_partial,
    )

    df = pd.DataFrame(
        {
            "l_partkey": np.int64([1]),
            "l_suppkey": np.int64([SUPP_PACK]),  # out of packing range
            "l_quantity": np.float64([1.0]),
            "l_extendedprice": np.float64([1.0]),
            "l_discount": np.float64([0.0]),
        }
    )
    with pytest.raises(AssertionError, match="SUPP_PACK"):
        best_supp_partial(_t(df))


# --- sole_return_suppliers ---------------------------------------------------


def test_sole_return_filter_semantics():
    """Qualify only: multi-supplier order, this supp returned, alone."""
    from khl_pdf_ocr_ray.pipelines.queries_relx import sole_return_filter

    df = pd.DataFrame(
        {
            # (n_supp, has_r, r_supp): qualifying row is supp 1 only
            "l_suppkey": np.int64([1, 2, 3, 4]),
            "has_r": np.int64([1, 0, 1, 1]),
            "n_supp": np.int64([2, 2, 2, 1]),  # supp 4: single-supp order
            "r_supp": np.int64([1, 1, 2, 1]),  # supp 3: two R-suppliers
        }
    )
    out = sole_return_filter(_t(df)).to_pandas()
    assert out["l_suppkey"].tolist() == [1]
    assert out["n"].tolist() == [1]


def test_order_supp_flags_max_over_lines():
    from khl_pdf_ocr_ray.pipelines.queries_relx import order_supp_flags

    df = pd.DataFrame(
        {
            "l_orderkey": np.int64([10, 10, 10]),
            "l_suppkey": np.int64([5, 5, 6]),
            "l_returnflag": ["N", "R", "N"],
        }
    )
    out = (
        order_supp_flags(_t(df))
        .to_pandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    assert out["has_r"].tolist() == [1, 0]


# --- idle_rich_customers -----------------------------------------------------


def test_idle_rich_cross_multiplied_boundary():
    """cents * n_pos > tot_pos: strict inequality — the exact-average
    customer is NOT rich."""
    from khl_pdf_ocr_ray.pipelines.queries_relx import idle_rich_rollup

    # avg over positives = (100 + 300) / 2 = 200
    df = pd.DataFrame(
        {
            "c_custkey": np.int64([1, 2, 3]),
            "c_nationkey": np.int64([0, 0, 1]),
            "cents": np.int64([200, 201, 199]),
        }
    )
    out = idle_rich_rollup(_t(df), tot_pos=400, n_pos=2).to_pandas()
    assert out["c_nationkey"].tolist() == [0]
    assert out["n"].tolist() == [1]  # only cents=201 passes
    assert out["cents"].tolist() == [201]


def test_recent_order_keys_cutoff_strict():
    from khl_pdf_ocr_ray.pipelines.queries_relx import recent_order_keys

    ts = np.array(
        ["2001-01-01", "2001-06-01", "2001-12-31"], dtype="datetime64[us]"
    )
    df = pd.DataFrame({"o_custkey": np.int64([1, 2, 3]), "o_orderdate": ts})
    cutoff = int(ts[1].astype(np.int64))  # strictly-after semantics
    out = recent_order_keys(_t(df), cutoff_us=cutoff).to_pandas()
    assert sorted(out["o_custkey"].tolist()) == [3]


# --- ks_drift ----------------------------------------------------------------


def test_ks_fold_matches_bruteforce():
    """Cross-multiplied KS == brute-force max |CDF_A - CDF_B|."""
    from fractions import Fraction

    from khl_pdf_ocr_ray.pipelines.queries_kstest import ks_fold

    rng = np.random.default_rng(11)
    a = rng.integers(0, 40, 300)
    b = np.concatenate([rng.integers(5, 45, 200), rng.integers(30, 60, 50)])
    vals = np.union1d(a, b)
    counts = pd.DataFrame(
        {
            "v": vals,
            "n_a": [(a == v).sum() for v in vals],
            "n_b": [(b == v).sum() for v in vals],
        }
    )
    row = ks_fold(counts)
    # brute force with exact rationals
    best = Fraction(0)
    for v in vals:
        d = abs(
            Fraction(int((a <= v).sum()), len(a))
            - Fraction(int((b <= v).sum()), len(b))
        )
        best = max(best, d)
    assert Fraction(row["ks_num"], row["n_a"] * row["n_b"]) == best
    assert row["ks_milli"] == (1000 * row["ks_num"]) // (len(a) * len(b))


def test_ks_fold_identical_slices_zero():
    from khl_pdf_ocr_ray.pipelines.queries_kstest import ks_fold

    counts = pd.DataFrame(
        {"v": [1, 2, 3], "n_a": [5, 3, 2], "n_b": [5, 3, 2]}
    )
    row = ks_fold(counts)
    assert row["ks_num"] == 0 and row["ks_milli"] == 0


def test_ks_fold_asserts_empty_slice():
    from khl_pdf_ocr_ray.pipelines.queries_kstest import ks_fold

    counts = pd.DataFrame({"v": [1], "n_a": [3], "n_b": [0]})
    with pytest.raises(AssertionError, match="empty"):
        ks_fold(counts)


# --- score_calibration --------------------------------------------------------


def test_calib_planted_curve_is_quadratic():
    """Measured pos rate per bin must track the planted (s/1000)^2."""
    from khl_pdf_ocr_ray.pipelines.queries_calib import (
        calib_finalize,
        calib_partial,
    )

    df = pd.DataFrame({"doc_id": np.arange(20000, dtype=np.int64)})
    part = calib_partial(_t(df))
    out = (
        calib_finalize(part)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert out["bin"].tolist() == list(range(10))
    assert int(out["n_docs"].sum()) == 20000
    for _, r in out.iterrows():
        s = r["mean_score_milli"] / 1000.0
        expected = s * s * 1000
        # hash noise: each bin holds ~2000 docs -> ~±3 sigma ≈ 33 milli
        assert abs(r["pos_rate_milli"] - expected) < 60, (r.to_dict(), expected)
    # monotone increasing and below the diagonal in the upper half
    rates = out["pos_rate_milli"].to_numpy()
    assert (np.diff(rates) >= -20).all()
    upper = out[out["bin"] >= 5]
    assert (upper["pos_rate_milli"] < upper["mean_score_milli"]).all()


def test_calib_bin_assignment_boundaries():
    from khl_pdf_ocr_ray.pipelines.queries_calib import (
        _M31,
        _M32,
        CALIB_MULT,
        calib_partial,
    )

    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    part = calib_partial(_t(df)).to_pandas()
    # per-batch fold: every bin cell within [0, 10)
    assert part["bin"].between(0, 9).all()
    # spot-verify one doc's score lands in its claimed bin
    did = 1234
    score = ((did % _M31) * CALIB_MULT) % _M32 % 1000
    assert 0 <= score < 1000


# --- daily_acf ----------------------------------------------------------------


def test_acf_fold_matches_numpy_reference():
    """Exact integer ACF == float np reference within 1 milli (floor)."""
    from khl_pdf_ocr_ray.pipelines.queries_acf import acf_fold

    rng = np.random.default_rng(5)
    n = 60
    base = 100 + 30 * np.sin(np.arange(n) * 2 * np.pi / 7)
    x = (base + rng.integers(-5, 6, n)).astype(np.int64)
    counts = pd.DataFrame({"day": np.arange(n, dtype=np.int64), "n": x})
    rows = acf_fold(counts, max_lag=7)
    mu = x.mean()
    c0 = ((x - mu) ** 2).sum()
    for r in rows:
        k = r["lag"]
        ck = ((x[:-k] - mu) * (x[k:] - mu)).sum()
        assert abs(r["r_milli"] - np.floor(1000 * ck / c0)) <= 1
    # weekly seasonality planted -> lag-7 must dominate lags 2..6
    r_by_lag = {r["lag"]: r["r_milli"] for r in rows}
    assert r_by_lag[7] > max(r_by_lag[k] for k in range(2, 7))


def test_acf_fold_zero_fills_gaps():
    from khl_pdf_ocr_ray.pipelines.queries_acf import acf_fold

    # days 0,1,3 present; day 2 missing -> series [5, 7, 0, 9]
    counts = pd.DataFrame(
        {"day": np.int64([0, 1, 3]), "n": np.int64([5, 7, 9])}
    )
    rows = acf_fold(counts, max_lag=1)
    assert rows[0]["n_days"] == 4
    x = [5, 7, 0, 9]
    y = [4 * v - 21 for v in x]
    c0 = sum(v * v for v in y)
    c1 = sum(y[t] * y[t + 1] for t in range(3))
    assert rows[0]["r_milli"] == (1000 * c1) // c0


def test_acf_fold_floored_negative_division():
    """Anti-correlated series: r_milli floors toward -inf, not zero."""
    from khl_pdf_ocr_ray.pipelines.queries_acf import acf_fold

    series = [10, 0, 10, 0, 10, 0, 10, 0, 10, 1]
    counts = pd.DataFrame(
        {
            "day": np.arange(10, dtype=np.int64),
            "n": np.int64(series),
        }
    )
    rows = acf_fold(counts, max_lag=1)
    assert rows[0]["r_milli"] < -700  # strong negative lag-1
    # floored semantics: Python // already floors; pin a known value
    y = [10 * v - sum(series) for v in series]
    c0 = sum(v * v for v in y)
    c1 = sum(y[t] * y[t + 1] for t in range(9))
    assert rows[0]["r_milli"] == (1000 * c1) // c0
    # the distinction is real here: floor != truncate for this series
    import math

    assert (1000 * c1) % c0 != 0
    assert (1000 * c1) // c0 == math.floor(1000 * c1 / c0)
    assert (1000 * c1) // c0 != math.trunc(1000 * c1 / c0)


def test_acf_fold_constant_series_asserts():
    from khl_pdf_ocr_ray.pipelines.queries_acf import acf_fold

    counts = pd.DataFrame(
        {"day": np.arange(5, dtype=np.int64), "n": np.int64([3, 3, 3, 3, 3])}
    )
    with pytest.raises(AssertionError, match="constant"):
        acf_fold(counts, max_lag=1)
