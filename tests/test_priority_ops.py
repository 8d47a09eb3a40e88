"""Kernel tests for Duffield priority sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_priority import (
    PS_FX,
    PS_K,
    priority_key,
    ps_fold,
    ps_prune,
)


def _docs(n, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": rng.integers(10, 600, size=n).astype(np.int64),
        }
    )


def test_prune_keeps_block_top_candidates():
    df = _docs(PS_K * 4)
    t = pa.Table.from_pandas(df, preserve_index=False)
    out = ps_prune(t).to_pandas()
    assert len(out) == PS_K + 1
    key = priority_key(
        df["doc_id"].to_numpy(np.int64), df["n_chars"].to_numpy(np.int64)
    )
    # the pruned keys are exactly the K+1 largest (with doc_id tie-break)
    order = np.lexsort((df["doc_id"].to_numpy(), -key))[: PS_K + 1]
    assert out["key"].tolist() == key[order].tolist()


def test_fold_estimator_unbiased_shape_and_total():
    """On a uniform-weight corpus, the Duffield estimate of the TOTAL
    (sum over sources) must be close to the true total weight —
    statistical sanity, not bit identity (that's the oracle's job)."""
    df = _docs(5000, seed=9)
    t = pa.Table.from_pandas(df, preserve_index=False)
    pruned = ps_prune(t).to_pandas()
    out = ps_fold(pruned).to_pandas()
    assert out["n_sampled"].sum() == PS_K
    est_total = out["est_w_fx16"].sum() / (1 << PS_FX)
    true_total = df["n_chars"].sum()
    assert abs(est_total - true_total) / true_total < 0.35


def test_fold_contribution_floor_is_tau():
    """Every sampled item contributes at least tau (the (K+1)th key)."""
    df = _docs(PS_K * 3, seed=5)
    pruned = ps_prune(pa.Table.from_pandas(df, preserve_index=False)).to_pandas()
    srt = pruned.sort_values(["key", "doc_id"], ascending=[False, True])
    tau = int(srt["key"].iloc[PS_K])
    out = ps_fold(pruned).to_pandas()
    # per-source estimate >= n_sampled * tau (max(w<<16, tau) >= tau)
    assert (out["est_w_fx16"] >= out["n_sampled"] * tau).all()


def test_fold_asserts_when_not_enough_candidates():
    df = _docs(PS_K)  # == K rows: no (K+1)th for tau
    pruned = ps_prune(pa.Table.from_pandas(df, preserve_index=False)).to_pandas()
    with pytest.raises(AssertionError, match="candidate rows"):
        ps_fold(pruned)


def test_weight_bound_asserted():
    with pytest.raises(AssertionError, match="weight bound"):
        priority_key(
            np.array([1], dtype=np.int64), np.array([1 << 15], dtype=np.int64)
        )
