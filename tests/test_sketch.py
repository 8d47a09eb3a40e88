"""HyperLogLog sketch: merge-order independence + accuracy.

The dump-twin oracle (state/oracle_dump_near.py) relies on the register
max-merge being order/partition independent; these tests hold that
property directly, plus the estimator's accuracy envelope (p=12 -> ~1.6%
standard error; 5% is a generous deterministic bound for these inputs).
"""

import numpy as np
import pandas as pd

from khl_pdf_ocr_ray.stages.sketch import (
    HLL_M,
    hll_estimate,
    hll_partial,
    hll_sequential,
)


def _merge(parts) -> pd.DataFrame:
    df = pd.concat(parts, ignore_index=True)
    return df.groupby("register", as_index=False)["rank"].max()


def test_partition_merge_is_bit_identical_to_sequential():
    keys = (np.arange(120_000, dtype=np.int64) * 7919) % 37_000
    seq = hll_sequential(keys).sort_values("register").reset_index(drop=True)
    for n_chunks in (2, 7, 64):
        parts = [hll_partial(c) for c in np.array_split(keys, n_chunks)]
        merged = _merge(parts).sort_values("register").reset_index(drop=True)
        pd.testing.assert_frame_equal(merged, seq)
    # order independence: reversed chunk order merges identically
    parts = [hll_partial(c) for c in np.array_split(keys[::-1].copy(), 5)]
    merged = _merge(parts).sort_values("register").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, seq)


def test_estimate_accuracy():
    for true_n in (500, 10_000, 250_000):
        keys = np.arange(true_n, dtype=np.int64) * 1_000_003
        est = hll_estimate(hll_sequential(keys))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_small_range_linear_counting():
    keys = np.arange(40, dtype=np.int64)
    est = hll_estimate(hll_sequential(keys))
    assert abs(est - 40) <= 2  # linear counting is near-exact here


def test_empty_input():
    est = hll_estimate(hll_sequential(np.array([], dtype=np.int64)))
    assert est == 0


def test_register_bounds():
    keys = np.arange(50_000, dtype=np.int64)
    df = hll_sequential(keys)
    assert df["register"].between(0, HLL_M - 1).all()
    assert df["rank"].between(1, 64 - 12 + 1).all()


# --- count-min sketch --------------------------------------------------------
from khl_pdf_ocr_ray.stages.sketch import cms_partial, cms_query  # noqa: E402


def _cms_merge(parts) -> pd.DataFrame:
    df = pd.concat(parts, ignore_index=True)
    return df.groupby(["row", "col"], as_index=False)["n"].sum()


def test_cms_partition_merge_is_bit_identical_to_sequential():
    keys = [f"tok{i % 977}" for i in range(30_000)]
    counts = ((np.arange(30_000) % 7) + 1).astype(np.int64)
    seq = cms_partial(keys, counts)
    chunks = [(keys[i : i + 4096], counts[i : i + 4096]) for i in range(0, 30_000, 4096)]
    merged = _cms_merge([cms_partial(k, c) for k, c in chunks])
    a = seq.sort_values(["row", "col"]).reset_index(drop=True)
    b = merged.sort_values(["row", "col"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # estimates identical through either path
    probe = [f"tok{i}" for i in range(977)]
    assert (cms_query(seq, probe) == cms_query(merged, probe)).all()


def test_cms_one_sided_error_and_exactness_when_sparse():
    # distinct keys << w: no collisions expected -> estimates exact
    keys = [f"bigram {i}" for i in range(500)]
    counts = (np.arange(500, dtype=np.int64) % 13) + 1
    cells = cms_partial(keys, counts)
    est = cms_query(cells, keys)
    assert (est == counts).all()
    # an unseen key estimates >= 0 and the error is one-sided (>= truth)
    assert (cms_query(cells, ["never seen"]) >= 0).all()
