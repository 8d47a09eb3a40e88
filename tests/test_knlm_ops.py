"""Kernel tests for the exact-integer Kneser-Ney bigram LM."""

from fractions import Fraction

import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_knlm import (
    KN_D_DEN,
    KN_D_NUM,
    KN_SCALE,
    bigram_pair_partial,
    kn_fold,
)


def _counts(rows):
    w1, w2, n = zip(*rows)
    return pd.DataFrame({"w1": w1, "w2": w2, "n": n})


def test_partial_counts_adjacent_pairs():
    batch = pa.table({"text": pa.array(["a b a b", "b c"])})
    out = bigram_pair_partial(batch).to_pandas()
    got = {(r.w1, r.w2): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}


def test_kn_matches_fraction_reference():
    rows = [("a", "b", 5), ("a", "c", 1), ("b", "b", 3), ("c", "a", 2)]
    counts = _counts(rows)
    out = kn_fold(counts).set_index(["w1", "w2"])
    D = Fraction(KN_D_NUM, KN_D_DEN)
    c1 = {"a": 6, "b": 3, "c": 2}
    n1a = {"a": 2, "b": 1, "c": 1}
    n1b = {"b": 2, "c": 1, "a": 1}
    T = 4
    for w1, w2, c12 in rows:
        p = (
            Fraction(max(Fraction(c12) - D, 0), c1[w1])
            + D * n1a[w1] / c1[w1] * Fraction(n1b[w2], T)
        )
        want = (p * KN_SCALE + Fraction(1, 2)).__floor__()
        assert out.loc[(w1, w2), "p_fx"] == want


def test_kn_normalization():
    # when the continuation types of w1 cover EVERY bigram-type ender,
    # the observed-w2 sum is exactly the full-vocabulary normalization:
    # sum_x n1b(x) over x in {x,y,z} = 4 = T -> sum P = 1 exactly
    rows = [("h", "x", 10), ("h", "y", 4), ("h", "z", 1), ("q", "x", 2)]
    out = kn_fold(_counts(rows))
    s = out[out["w1"] == "h"]["p_fx"].sum()
    assert abs(s - KN_SCALE) <= 3  # 1.0 up to one rounding step per term
    # with a continuation type h never produces ("q","w"), the observed
    # sum drops strictly below 1 — that mass is reserved for unseen w2
    rows2 = rows + [("q", "w", 5)]
    out2 = kn_fold(_counts(rows2))
    s2 = out2[out2["w1"] == "h"]["p_fx"].sum()
    assert s2 < s


def test_singleton_bigram_discount_floor():
    # c12 = 1: 4*1-3 = 1 -> the discounted term is tiny but nonzero
    out = kn_fold(_counts([("a", "b", 1)]))
    # num = 1*1 + 3*1*1 = 4, den = 4*1*1 -> P = 1 exactly (only bigram)
    assert out["p_fx"].tolist() == [KN_SCALE]
