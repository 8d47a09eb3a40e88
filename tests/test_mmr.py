"""MMR rerank tests: the greedy kernel vs an independent pure-python
re-implementation, diversity behavior on a planted redundant corpus,
and shortlist-merge determinism."""

import numpy as np
import pandas as pd
import pytest

from khl_pdf_ocr_ray.pipelines.queries_mmr import (
    FX,
    LAM_DEN_MINUS,
    LAM_NUM,
    MMR_K,
    MMR_SHORTLIST,
    cos_fx,
    mmr_greedy,
    mmr_sequential,
)

SF = "/root/testdata/sf0.001"
RNG = np.random.default_rng(23)


def python_mmr(ids, rel, pair, k):
    """Independent reference: dict/loop greedy, no numpy kernels."""
    ids = [int(i) for i in ids]
    rel = {int(i): int(r) for i, r in zip(ids, rel)}
    sim = {
        (int(ids[a]), int(ids[b])): int(pair[a][b])
        for a in range(len(ids))
        for b in range(len(ids))
    }
    picked = []
    remaining = set(ids)
    while remaining and len(picked) < k:
        best = None
        for c in sorted(remaining):
            ms = max((sim[(c, p)] for p, _ in picked), default=0)
            s = LAM_NUM * rel[c] - LAM_DEN_MINUS * ms
            if best is None or s > best[1]:
                best = (c, s)
        picked.append(best)
        remaining.discard(best[0])
    return picked


def test_greedy_matches_independent_python():
    n = 25
    ids = np.sort(RNG.choice(10000, size=n, replace=False)).astype(np.int64)
    rel = RNG.integers(0, FX, size=n).astype(np.int64)
    v = RNG.normal(size=(n, 8))
    pair = cos_fx(v, v)
    got = mmr_greedy(ids, rel, pair, 10)
    want = python_mmr(ids, rel, pair.tolist(), 10)
    assert got == want


def test_mmr_prefers_diverse_over_redundant():
    """Two near-duplicate highly-relevant docs + one slightly-less
    relevant but orthogonal doc: plain top-3 takes both duplicates
    first; MMR (lambda .7) demotes the duplicate below the orthogonal
    doc."""
    q = np.array([[1.0, 0.0, 0.0, 0.0]])
    docs = np.array(
        [
            [0.8, 0.6, 0.0, 0.0],  # id 1: rel .8
            [0.8, 0.6, 0.0, 0.0],  # id 2: EXACT duplicate of 1
            [0.8, 0.0, 0.6, 0.0],  # id 3: same rel, diverse direction
        ]
    )
    ids = np.array([1, 2, 3], dtype=np.int64)
    rel = cos_fx(q, docs)[0]
    pair = cos_fx(docs, docs)
    picks = [vid for vid, _ in mmr_greedy(ids, rel, pair, 3)]
    assert picks[0] == 1  # pure relevance first
    assert picks[1] == 3  # diversity beats the near-duplicate
    assert picks[2] == 2


def test_shortlist_merge_is_split_invariant():
    """Merging per-block partial top-M lists == global top-M (the
    integer (sim DESC, id ASC) order has no ties to break wrongly)."""
    from khl_pdf_ocr_ray.pipelines.queries_mmr import _merge_and_greedy

    n, dim = 300, 4
    ids = np.arange(n, dtype=np.int64)
    sims = RNG.integers(-FX, FX, size=n).astype(np.int64)
    vecs = np.ascontiguousarray(RNG.normal(size=(n, dim)).astype(np.float32))

    def partial_df(lo, hi):
        order = np.lexsort((ids[lo:hi], -sims[lo:hi]))[:MMR_SHORTLIST]
        return pd.DataFrame(
            {
                "query_id": 0,
                "vec_id": ids[lo:hi][order],
                "sim_fx": sims[lo:hi][order],
                "vec": [vecs[lo:hi][i].tobytes() for i in order],
            }
        )

    whole = _merge_and_greedy(partial_df(0, n), dim)
    split = _merge_and_greedy(
        pd.concat(
            [partial_df(0, 100), partial_df(100, 180), partial_df(180, n)],
            ignore_index=True,
        ),
        dim,
    )
    pd.testing.assert_frame_equal(whole, split)


def test_distributed_equals_sequential_twin(ray_session):
    from khl_pdf_ocr_ray.pipelines.queries_mmr import q_mmr_rerank

    got = q_mmr_rerank(SF)
    want = mmr_sequential(SF)
    pd.testing.assert_frame_equal(got, want)
    # shape contract: MMR_K rows per query, ranks 1..K
    assert (got.groupby("query_id")["rank"].max() == MMR_K).all()
    assert got["vec_id"].nunique() > 1
