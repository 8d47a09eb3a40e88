"""Kernel tests for queries_surv: the KM step table vs a hand-built
product-limit computation (with censoring and the everyone-dies
sentinel), and the Theil-Sen discrete median vs a pair loop."""

import math

import numpy as np
import pandas as pd
import pytest

from khl_pdf_ocr_ray.pipelines.queries_surv import (
    KM_FX,
    KM_SENT,
    km_steps,
    theil_sen_from_series,
)


def test_km_steps_product_limit_by_hand():
    """lifetimes: 3 users die at t=1, 1 dies at t=3, 2 censored at t=2.
    at-risk: t=1 -> 6, t=3 -> 1 (censored users left the risk set)."""
    hist = pd.DataFrame(
        {"t": [1, 2, 3], "c_all": [3, 2, 1], "d": [3, 0, 1]}
    )
    out = km_steps(hist)
    assert list(out.t_day) == [1, 3]
    assert list(out.at_risk) == [6, 1]
    assert list(out.deaths) == [3, 1]
    q1 = math.floor(math.log(3.0 / 6.0) * KM_FX)
    assert out.log_surv_fx.iloc[0] == q1
    # t=3 kills the whole remaining risk set -> sentinel step
    assert out.log_surv_fx.iloc[1] == q1 + KM_SENT


def test_km_steps_skips_censor_only_times():
    hist = pd.DataFrame({"t": [0, 5], "c_all": [4, 1], "d": [0, 1]})
    out = km_steps(hist)
    assert list(out.t_day) == [5]
    assert list(out.at_risk) == [1]


def test_km_log_survival_matches_float_product():
    """Sum of quantized step logs tracks the float KM product within
    quantization error (n_steps / 2^20)."""
    rng = np.random.default_rng(9)
    t = np.arange(20)
    c_all = rng.integers(1, 50, size=20)
    d = np.minimum(rng.integers(0, 10, size=20), c_all)
    hist = pd.DataFrame({"t": t, "c_all": c_all, "d": d})
    out = km_steps(hist)
    ar = np.cumsum(c_all[::-1])[::-1]
    surv = 1.0
    for row in out.itertuples(index=False):
        a = int(ar[row.t_day])
        surv *= (a - row.deaths) / a
        if surv == 0.0:
            break
        got = row.log_surv_fx / KM_FX
        assert got == pytest.approx(math.log(surv), abs=len(out) / KM_FX)


def test_theil_sen_matches_pair_loop_and_duckdb_median():
    import duckdb

    rng = np.random.default_rng(4)
    days = np.arange(30, dtype=np.int64)
    n = (5 * days + rng.integers(-20, 20, size=30)).astype(np.int64)
    n_days, n_pairs, slope = theil_sen_from_series(days, n)
    assert n_days == 30 and n_pairs == 30 * 29 // 2
    sl = sorted(
        (int(n[j]) - int(n[i])) / (int(days[j]) - int(days[i]))
        for i in range(30)
        for j in range(i + 1, 30)
    )
    assert slope == sl[(len(sl) - 1) // 2]
    # the engine's discrete pick == duckdb quantile_disc on the same set
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT unnest(?::DOUBLE[]) AS x", [list(sl)]
    )
    want = con.execute("SELECT quantile_disc(x, 0.5) FROM s").fetchone()[0]
    assert slope == want
    # robust: slope close to the planted trend despite noise
    assert 4.0 < slope < 6.0
