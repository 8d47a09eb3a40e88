"""Kernel tests for the KMV distinct/overlap sketch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_kmv import (
    KMV_K,
    KMV_SPACE,
    _kmv_hash,
    kmv_merge,
    kmv_pair_fold,
    kmv_partial,
)


def _sketch_df(pairs):
    ts, hs = zip(*pairs)
    return pd.DataFrame({"event_type": list(ts), "h": np.int64(hs)})


def test_hash_injective_on_small_ids():
    uid = np.arange(0, 5000, dtype=np.int64)
    h = _kmv_hash(uid)
    assert len(np.unique(h)) == len(uid)
    assert h.min() >= 0


def test_identical_sets_jaccard_full():
    hs = np.sort(_kmv_hash(np.arange(1, 200, dtype=np.int64)))[:KMV_K]
    df = _sketch_df([("a", x) for x in hs] + [("b", x) for x in hs])
    out = kmv_pair_fold(df).to_pandas()
    assert out["jaccard_permille"].tolist() == [1000]
    assert out["est_a"].tolist() == out["est_b"].tolist()
    assert out["est_union"].tolist() == out["est_a"].tolist()


def test_disjoint_sets_jaccard_zero_and_union_grows():
    a = np.sort(_kmv_hash(np.arange(1, 400, 2, dtype=np.int64)))[:KMV_K]
    b = np.sort(_kmv_hash(np.arange(2, 400, 2, dtype=np.int64)))[:KMV_K]
    df = _sketch_df([("a", x) for x in a] + [("b", x) for x in b])
    out = kmv_pair_fold(df).to_pandas()
    assert out["jaccard_permille"].tolist() == [0]
    # union's kth minimum <= either side's kth -> union estimate >= max side
    assert out["est_union"].iloc[0] >= max(
        out["est_a"].iloc[0], out["est_b"].iloc[0]
    )


def test_estimator_formula_exact():
    # planted sketch: h = 1..K exactly -> est = (K-1)*2^32 // K
    hs = np.arange(1, KMV_K + 1, dtype=np.int64)
    df = _sketch_df([("a", x) for x in hs] + [("b", x) for x in hs])
    out = kmv_pair_fold(df).to_pandas()
    assert out["est_a"].iloc[0] == (KMV_K - 1) * KMV_SPACE // KMV_K


def test_merge_under_k_is_exact_set():
    g = pd.DataFrame({"event_type": ["a"] * 5, "h": np.int64([3, 1, 2, 1, 5])})
    out = kmv_merge(g)
    assert out["h"].tolist() == [1, 2, 3, 5]  # the exact distinct set


def test_under_k_estimates_exact():
    # both sides under K: estimates and union are exact counts, jaccard
    # is exact over the union set
    a = np.int64([1, 2, 3])
    b = np.int64([2, 3, 4, 5])
    df = _sketch_df([("a", x) for x in a] + [("b", x) for x in b])
    out = kmv_pair_fold(df).to_pandas()
    assert out["est_a"].tolist() == [3]
    assert out["est_b"].tolist() == [4]
    assert out["est_union"].tolist() == [5]
    assert out["jaccard_permille"].tolist() == [1000 * 2 // 5]


def test_partial_keeps_k_smallest_per_type():
    n = KMV_K * 3
    t = pa.table(
        {
            "event_type": pa.array(["a"] * n + ["b"] * n, pa.string()),
            "h": pa.array(
                list(range(n, 0, -1)) + list(range(1000, 1000 + n)),
                pa.int64(),
            ),
        }
    )
    out = kmv_partial(t).to_pandas()
    a = out[out["event_type"] == "a"]["h"].tolist()
    b = out[out["event_type"] == "b"]["h"].tolist()
    assert a == list(range(1, KMV_K + 1))
    assert b == list(range(1000, 1000 + KMV_K))
