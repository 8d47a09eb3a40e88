"""Kernel tests for the grouped hypothesis-test suite (queries_stats2):
finalize formulas vs independent numpy references, batching invariance
of the hi/lo-split power-sum partials, and the dominance-counting
Kendall kernel vs an O(n^2) pair loop. (Oracle parity at sf0.001 is
covered by the auto-parametrized gate in test_queries.py.)"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_stats2 import (
    _SPLIT,
    kendall_from_cells,
    kt_cells_partial,
    mw_finalize,
    rank2_map,
    skewkurt_finalize,
    skewkurt_partial,
    spearman_from_cells,
    welch_finalize,
)

RNG = np.random.default_rng(7)


def test_skewkurt_finalize_matches_numpy():
    x = RNG.integers(10, 5000, size=400)
    n = len(x)
    s1, s2 = int(x.sum()), int((x.astype(object) ** 2).sum())
    s3 = int((x.astype(object) ** 3).sum())
    s4 = int((x.astype(object) ** 4).sum())
    skew, kurt = skewkurt_finalize(n, s1, s2, s3, s4)
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    m4 = ((x - mu) ** 4).mean()
    assert skew == pytest.approx(m3 / m2**1.5, rel=1e-9)
    assert kurt == pytest.approx(m4 / m2**2 - 3.0, rel=1e-9)


def test_skewkurt_partial_split_merge_equals_whole():
    """Batching invariance: partials over any split of the rows merge
    (int sums + hi/lo recombine) to the single-batch sums."""
    langs = RNG.choice(["en", "de"], size=300)
    x = RNG.integers(1, 30000, size=300)  # large enough that s4 > 2^40
    whole = skewkurt_partial(
        pa.table({"lang": langs, "n_chars": x})
    ).to_pandas()

    def fold(tables):
        acc = {}
        for t in tables:
            for r in t.to_pandas().itertuples(index=False):
                a = acc.setdefault(r.lang, [0, 0, 0, 0, 0])
                a[0] += r.n
                a[1] += r.s1
                a[2] += r.s2_hi * _SPLIT + r.s2_lo
                a[3] += r.s3_hi * _SPLIT + r.s3_lo
                a[4] += r.s4_hi * _SPLIT + r.s4_lo
        return acc

    whole_acc = fold(
        [skewkurt_partial(pa.table({"lang": langs, "n_chars": x}))]
    )
    split_acc = fold(
        [
            skewkurt_partial(
                pa.table({"lang": langs[i : i + 37], "n_chars": x[i : i + 37]})
            )
            for i in range(0, 300, 37)
        ]
    )
    assert whole_acc == split_acc
    # and the direct exact sums agree
    for lang in ("en", "de"):
        m = langs == lang
        xs = x[m].astype(object)
        assert whole_acc[lang] == [
            int(m.sum()),
            int(xs.sum()),
            int((xs**2).sum()),
            int((xs**3).sum()),
            int((xs**4).sum()),
        ]
    assert set(whole["lang"]) == {"en", "de"}


def test_welch_finalize_matches_numpy():
    a = RNG.integers(100, 900, size=120)
    b = RNG.integers(200, 1100, size=90)
    md, t, df = welch_finalize(
        len(a),
        int(a.sum()),
        int((a.astype(object) ** 2).sum()),
        len(b),
        int(b.sum()),
        int((b.astype(object) ** 2).sum()),
    )
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se = v1 / len(a) + v2 / len(b)
    assert md == pytest.approx(a.mean() - b.mean(), rel=1e-12)
    assert t == pytest.approx((a.mean() - b.mean()) / math.sqrt(se), rel=1e-9)
    want_df = se**2 / (
        (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
    )
    assert df == pytest.approx(want_df, rel=1e-9)


def test_rank2_map_is_twice_average_rank():
    cnts = np.array([2, 3, 1])  # data: 3,3,5,5,5,9
    # average ranks: 3 -> 1.5, 5 -> 4, 9 -> 6
    assert list(rank2_map(cnts)) == [3, 8, 12]


def test_spearman_from_cells_matches_scipy_formula():
    x = RNG.integers(0, 40, size=200)
    y = x + RNG.integers(-5, 6, size=200)  # correlated, with ties
    g = (
        pd.DataFrame({"x": x, "y": y})
        .groupby(["x", "y"], as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
    )
    n, rho = spearman_from_cells(g)
    assert n == 200
    # independent reference: Pearson of the fractional average ranks
    rx = pd.Series(x).rank().to_numpy()
    ry = pd.Series(y).rank().to_numpy()
    want = np.corrcoef(rx, ry)[0, 1]
    assert rho == pytest.approx(want, rel=1e-9)


def test_kendall_from_cells_matches_pair_loop():
    x = RNG.integers(0, 12, size=80)
    y = RNG.integers(0, 9, size=80)
    g = (
        pd.DataFrame({"xb": x, "yb": y})
        .groupby(["xb", "yb"], as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
    )
    n, C, D, tau = kendall_from_cells(g)
    assert n == 80
    c = d = tx = ty = 0
    for i in range(80):
        for j in range(i + 1, 80):
            dx, dy = x[i] - x[j], y[i] - y[j]
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                c += 1
            else:
                d += 1
    assert (C, D) == (c, d)
    n0 = 80 * 79 // 2
    # n1/n2 count pairs tied in x (resp. y) INCLUDING both-tied pairs
    n1 = tx
    n2 = ty
    want = (c - d) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
    assert tau == pytest.approx(want, rel=1e-9)


def test_kt_cells_partial_buckets_and_counts():
    t = pa.table(
        {
            "lang": ["en", "en", "en"],
            "n_chars": [31, 33, 33],
            "text": ["a b c", "a b", "a b"],
        }
    )
    out = kt_cells_partial(t).to_pandas().sort_values("xb", ignore_index=True)
    # 31 // 16 = 1 with 3 tokens -> yb 0;  33 // 16 = 2 with 2 tokens (x2)
    assert out.to_dict("records") == [
        {"lang": "en", "xb": 1, "yb": 0, "cnt": 1},
        {"lang": "en", "xb": 2, "yb": 0, "cnt": 2},
    ]


def test_mw_finalize_matches_rank_reference():
    a = RNG.integers(0, 50, size=60)  # purchase
    b = RNG.integers(10, 60, size=40)  # view
    hist = (
        pd.DataFrame(
            {
                "cents": np.concatenate([a, b]),
                "cp": [1] * 60 + [0] * 40,
                "cv": [0] * 60 + [1] * 40,
            }
        )
        .groupby("cents", as_index=False)
        .sum()
    )
    n1, n2, u_x2, z = mw_finalize(hist)
    assert (n1, n2) == (60, 40)
    ranks = pd.Series(np.concatenate([a, b])).rank().to_numpy()
    r1 = ranks[:60].sum()
    u1 = r1 - 60 * 61 / 2
    assert u_x2 == pytest.approx(2 * u1, abs=1e-9)
    nn = 100
    _, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    tie = float(np.sum(counts.astype(float) ** 3 - counts))
    var_u = (60 * 40 / 12) * ((nn + 1) - tie / (nn * (nn - 1)))
    want_z = (u1 - 60 * 40 / 2) / math.sqrt(var_u)
    assert z == pytest.approx(want_z, rel=1e-9)
