"""Kernel-level checks for collocations_pmi beyond oracle parity:
combiner mergeability of the gram partials and the exact-integer
scoring path (bigint-safe where int64 would overflow)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_colloc import (
    PMI_SCALE,
    gram_count_partial,
    pmi_score_batch,
)


def _texts(n: int, seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        " ".join(rng.choice(vocab, rng.integers(0, 30)))
        for _ in range(n)
    ]
    rows[5] = ""  # empty and null rows must contribute nothing
    return pa.table({"text": pa.array(rows + [None], pa.string())})


def test_gram_partial_is_mergeable():
    """Summing per-slice partials equals the whole-table partial — the
    property the (w1, w2) groupby-sum relies on."""
    t = _texts(200)
    whole = (
        gram_count_partial(t)
        .to_pandas()
        .set_index(["w1", "w2"])["n"]
        .sort_index()
    )
    parts = pd.concat(
        [gram_count_partial(t.slice(i, 33)).to_pandas() for i in range(0, len(t), 33)],
        ignore_index=True,
    )
    merged = parts.groupby(["w1", "w2"])["n"].sum().sort_index()
    pd.testing.assert_series_equal(whole, merged, check_dtype=False)
    # pairs never span documents
    assert whole.sum() > 0


def test_pmi_scoring_is_bigint_safe():
    """n_ab * n_tok * 1e6 past int64: the Python-int path must not wrap
    (numpy int64 would), and the floor must match HUGEINT division."""
    n_tok = 40_000_000_000  # 4e10 tokens (a ~100 TB corpus)
    batch = pa.table(
        {
            "w1": ["a"],
            "w2": ["b"],
            "n_ab": pa.array([3_000_000], pa.int64()),
            "n_u1": pa.array([50_000_000], pa.int64()),
            "n_u2": pa.array([60_000_000], pa.int64()),
        }
    )
    out = pmi_score_batch(batch, n_tok=n_tok).to_pandas()
    expect = (3_000_000 * n_tok * PMI_SCALE) // (50_000_000 * 60_000_000)
    assert int(out["pmi_x1e6"].iloc[0]) == expect
    assert expect > 0
