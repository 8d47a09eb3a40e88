"""Kernel tests for the SPRT sequential test and isotonic (PAV)
calibration: PAV vs the GCM hull twin on random cells, PAV properties
(monotone, mass-preserving), SPRT crossing logic vs a scalar loop."""

import numpy as np
import pandas as pd
import pytest

from khl_pdf_ocr_ray.pipelines.queries_iso import pav_pool
from khl_pdf_ocr_ray.pipelines.queries_sprt import (
    BOUND,
    LLR_NEG,
    LLR_POS,
    sprt_scan_day,
)

RNG = np.random.default_rng(31)


def gcm_reference(n: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Independent isotonic fit (lower hull of the CSD), returns
    per-cell (pool_pos, pool_n) rates in ppm."""
    cn = np.concatenate(([0], np.cumsum(n)))
    cp = np.concatenate(([0], np.cumsum(p)))
    hull = []
    for k in range(len(cn)):
        pt = (int(cn[k]), int(cp[k]))
        while len(hull) >= 2:
            (x1, y1), (x2, y2) = hull[-2], hull[-1]
            if (x2 - x1) * (pt[1] - y2) - (y2 - y1) * (pt[0] - x2) <= 0:
                hull.pop()
            else:
                break
        hull.append(pt)
    iso = np.empty(len(n), dtype=np.int64)
    for (x1, y1), (x2, y2) in zip(hull, hull[1:]):
        lo = int(np.searchsorted(cn, x1))
        hi = int(np.searchsorted(cn, x2))
        iso[lo:hi] = 1_000_000 * (y2 - y1) // (x2 - x1)
    return iso


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_pav_matches_gcm_hull(seed):
    rng = np.random.default_rng(seed)
    m = 60
    n = rng.integers(1, 20, size=m).astype(np.int64)
    p = np.array([rng.integers(0, ni + 1) for ni in n], dtype=np.int64)
    s = np.arange(m, dtype=np.int64)
    pool_pos, pool_n = pav_pool(s, n, p)
    got = 1_000_000 * pool_pos // pool_n
    want = gcm_reference(n, p)
    assert (got == want).all()


def test_pav_is_monotone_and_mass_preserving():
    m = 200
    n = RNG.integers(1, 30, size=m).astype(np.int64)
    p = np.array([RNG.integers(0, ni + 1) for ni in n], dtype=np.int64)
    pool_pos, pool_n = pav_pool(np.arange(m), n, p)
    rate = pool_pos / pool_n
    assert (np.diff(rate) >= 0).all()  # non-decreasing fit
    # pooled blocks conserve the positives they cover
    i = 0
    while i < m:
        j = i
        while j < m and pool_n[j] == pool_n[i] and pool_pos[j] == pool_pos[i]:
            j += 1
        # the run [i, j) is one pool IF its width matches pool_n
        if int(n[i:j].sum()) == pool_n[i]:
            assert int(p[i:j].sum()) == pool_pos[i]
        i = j


def test_sprt_scan_day_matches_scalar_loop():
    k = 500
    ts = np.sort(RNG.integers(0, 10**9, size=k)).astype(np.int64)
    is_p = RNG.random(size=k) < 0.4
    g = pd.DataFrame(
        {"day": 3, "ts_us": ts, "event_id": np.arange(k), "is_p": is_p}
    )
    entry_rank = {3: 1000}
    entry_llr = {3: BOUND // 2}
    out = sprt_scan_day(g, entry_rank, entry_llr)
    cum = BOUND // 2
    want = None
    for i in range(k):
        cum += LLR_POS if is_p[i] else LLR_NEG
        if cum >= BOUND or cum <= -BOUND:
            want = (1000 + i + 1, cum)
            break
    if want is None:
        assert len(out) == 0
    else:
        assert (int(out["rank"].iloc[0]), int(out["cum"].iloc[0])) == want


def test_sprt_no_crossing_returns_empty():
    g = pd.DataFrame(
        {
            "day": 0,
            "ts_us": [1, 2],
            "event_id": [0, 1],
            "is_p": [True, False],
        }
    )
    out = sprt_scan_day(g, {0: 0}, {0: 0})
    assert len(out) == 0


def test_sprt_constants_sane():
    assert LLR_POS > 0 > LLR_NEG
    assert BOUND > 0
