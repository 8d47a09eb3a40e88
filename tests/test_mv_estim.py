"""Kernel tests for queries_mv (incremental view maintenance),
queries_estim (AMS F2, l-diversity) and queries_rank2 (zipf fit,
percent_rank, above-avg decorrelation). Oracle parity is covered by the
auto-parametrized gate in test_queries.py."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# --- incremental MV maintenance ---------------------------------------------
def test_mv_base_build_is_cached(ray_session):
    from khl_pdf_ocr_ray.pipelines.queries_mv import ensure_mv_base

    d1 = ensure_mv_base(SF)
    marker = os.path.join(d1, "_DONE")
    m1 = os.stat(marker).st_mtime_ns
    d2 = ensure_mv_base(SF)
    assert d1 == d2
    assert os.stat(marker).st_mtime_ns == m1  # second call did not rebuild


def test_mv_retraction_to_zero_drops_source(ray_session):
    """A source whose support count reaches zero must leave n_sources
    (the counting-algebra distinct-maintenance property)."""
    import ray.data as rd

    from khl_pdf_ocr_ray.pipelines.queries_mv import mv_view_from

    base = rd.from_arrow(
        pa.table(
            {
                "lang": ["en", "en", "de"],
                "source": ["a", "b", "a"],
                "cnt": pa.array([2, 1, 3], pa.int64()),
                "chars": pa.array([20, 10, 30], pa.int64()),
            }
        )
    )
    delta = rd.from_arrow(
        pa.table(
            {
                "lang": ["en", "de"],
                "source": ["b", "c"],
                "cnt": pa.array([-1, 1], pa.int64()),
                "chars": pa.array([-10, 7], pa.int64()),
            }
        )
    )
    got = (
        mv_view_from(base, delta)
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    want = pd.DataFrame(
        {
            "lang": ["de", "en"],
            "n_docs": [4, 2],
            "total_chars": [37, 20],
            "n_sources": [2, 1],  # en lost source b; de gained c
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mv_delta_partial_signs():
    from khl_pdf_ocr_ray.pipelines.queries_mv import (
        MV_DEL_MOD,
        MV_INS_MOD,
        mv_delta_partial,
    )

    ids = [MV_INS_MOD, MV_DEL_MOD, MV_INS_MOD * MV_DEL_MOD, 1]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": ["en"] * 4,
            "source": ["s1", "s2", "s3", "s4"],
            "n_chars": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    out = (
        mv_delta_partial(t)
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )
    # 17 -> insert (+), 23 -> delete (-), 17*23 -> insert wins (17 | id),
    # 1 -> not in the delta at all
    assert out.to_dict("records") == [
        {"lang": "en", "source": "s1", "cnt": 1, "chars": 10},
        {"lang": "en", "source": "s2", "cnt": -1, "chars": -20},
        {"lang": "en", "source": "s3", "cnt": 1, "chars": 30},
    ]


# --- AMS F2 -----------------------------------------------------------------
def test_ams_signs_are_pm1_and_deterministic():
    from khl_pdf_ocr_ray.pipelines.queries_estim import ams_signs

    u = np.arange(1000, dtype=np.int64)
    s0 = ams_signs(u, 0)
    assert set(np.unique(s0)) == {-1, 1}
    assert (s0 == ams_signs(u, 0)).all()
    # different estimators decorrelate: not all signs equal
    assert (s0 != ams_signs(u, 7)).any()
    # roughly balanced
    assert abs(int(s0.sum())) < 200


def test_ams_finalize_median_of_means():
    from khl_pdf_ocr_ray.pipelines.queries_estim import ams_finalize

    zs = np.array([1, 2, 3, 4, 10, 0, 0, 0, 2, 2, 2, 2, 5, 5, 1, 1])
    row = ams_finalize(zs, exact_f2=10)
    g = [1 + 4 + 9 + 16, 100, 16, 52]  # per-group sums of z^2
    want = sorted(g)[1] + sorted(g)[2]
    assert int(row.ams_est_x8.iloc[0]) == want
    assert int(row.exact_f2.iloc[0]) == 10


def test_ams_estimate_is_in_range(ray_session):
    from khl_pdf_ocr_ray.pipelines.queries_estim import q_ams_f2_events

    row = q_ams_f2_events(SF).iloc[0]
    # median-of-means with 16 estimators: within 2x of truth on this data
    assert 0 < row.ams_est_x8 < 16 * row.exact_f2
    assert row.err_ppm < 1_000_000


# --- zipf / percent_rank / above-avg ----------------------------------------
def test_trunc_div_matches_duckdb():
    import duckdb

    from khl_pdf_ocr_ray.pipelines.queries_rank2 import trunc_div

    con = duckdb.connect()
    for a, b in [(-7, 2), (7, 2), (-7, -2), (7, -2), (-1, 3), (0, 5)]:
        want = con.execute(f"SELECT {a} // {b}").fetchone()[0]
        assert trunc_div(a, b) == want, (a, b)


def test_zipf_fit_on_exact_power_law():
    from khl_pdf_ocr_ray.pipelines.queries_rank2 import zipf_fit_from_top

    n = 150
    cnt = (1_000_000 / np.arange(1, n + 1)).astype(np.int64)
    top = pd.DataFrame({"term": [f"t{i:04d}" for i in range(n)], "cnt": cnt})
    row = zipf_fit_from_top(top).iloc[0]
    assert row.n_terms == n
    assert -1_010_000 < row.slope_x1e6 < -990_000  # slope ~ -1
    assert abs(row.intercept_x1e6 - 1_000_000 * np.log(1_000_000)) < 20_000


def test_pct_rank_annotate_matches_bruteforce():
    from khl_pdf_ocr_ray.pipelines.queries_rank2 import pct_rank_annotate

    rng = np.random.default_rng(3)
    x = rng.integers(0, 30, size=100).astype(np.int64)
    sizes, cnts = np.unique(x, return_counts=True)
    cum = np.cumsum(cnts)
    rank_min = np.concatenate(([0], cum[:-1])) + 1
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(100), pa.int64()),
            "n_chars": pa.array(x, pa.int64()),
        }
    )
    out = pct_rank_annotate(
        batch, (sizes, rank_min, cum, 100)
    ).to_pandas()
    srt = np.sort(x)
    for _, r in out.iterrows():
        lt = int((srt < r.n_chars).sum())
        le = int((srt <= r.n_chars).sum())
        assert r.pct_rank_ppm == lt * 1_000_000 // 99
        assert r.cume_ppm == le * 1_000_000 // 100


def test_above_avg_integer_compare_equals_float_avg():
    rng = np.random.default_rng(5)
    cents = rng.integers(100, 100000, size=500)
    cust = rng.integers(0, 40, size=500)
    df = pd.DataFrame({"c": cust, "v": cents})
    agg = df.groupby("c")["v"].agg(["count", "sum"])
    got = cents * agg["count"].to_numpy()[cust] > agg["sum"].to_numpy()[cust]
    want = cents > agg["sum"].to_numpy()[cust] / agg["count"].to_numpy()[cust]
    # strict-above under exact rational == float comparison here because
    # cents*cnt and sum are exact int64 (the engine never forms the float)
    assert (got == want).all()


def test_hill_estimator_on_planted_pareto():
    """Hill over an exact Pareto(alpha = 2) sample recovers alpha."""
    from khl_pdf_ocr_ray.pipelines.queries_rank2 import (
        HILL_K,
        hill_from_top,
    )

    rng = np.random.default_rng(12)
    u = rng.uniform(size=20000)
    x = (1000.0 / u ** (1 / 2.0)).astype(np.int64)  # Pareto, alpha = 2
    thr, alpha = hill_from_top(np.sort(x)[::-1][: HILL_K + 1])
    assert thr == np.sort(x)[::-1][HILL_K]
    assert 1_500_000 < alpha < 2_600_000  # ~2e6 at K = 100


def test_hill_partial_merge_preserves_top_multiset():
    from khl_pdf_ocr_ray.pipelines.queries_rank2 import (
        HILL_K,
        hill_from_top,
        hill_top_partial,
    )
    import pyarrow as pa

    rng = np.random.default_rng(13)
    x = rng.integers(10, 100000, size=3000).astype(np.int64)
    whole = hill_from_top(np.sort(x)[::-1][: HILL_K + 1])
    parts = [
        hill_top_partial(pa.table({"n_chars": x[i : i + 500]}))["x"]
        .to_numpy()
        .astype(np.int64)
        for i in range(0, 3000, 500)
    ]
    merged = hill_from_top(np.concatenate(parts))
    assert whole == merged
