"""Property-based tests for the round-5 session kernels: PAV
monotonicity/mass conservation, Kendall dominance-count bounds, the
rank-sum identity, MMR greedy invariants, and the weighted median."""

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from khl_pdf_ocr_ray.pipelines.queries_graphy import lpa_pack_round
from khl_pdf_ocr_ray.pipelines.queries_iso import pav_pool
from khl_pdf_ocr_ray.pipelines.queries_mmr import mmr_greedy
from khl_pdf_ocr_ray.pipelines.queries_rich import (
    weighted_median_from_hist,
)
from khl_pdf_ocr_ray.pipelines.queries_stats2 import (
    kendall_from_cells,
    rank2_map,
)

cells_strategy = st.lists(
    st.tuples(st.integers(1, 40), st.integers(0, 40)), min_size=1, max_size=60
)


@settings(max_examples=150, deadline=None)
@given(cells_strategy)
def test_pav_monotone_and_mass_preserving(cells):
    n = np.array([c[0] for c in cells], dtype=np.int64)
    p = np.array([min(c[1], c[0]) for c in cells], dtype=np.int64)
    pool_pos, pool_n = pav_pool(np.arange(len(cells)), n, p)
    rate = pool_pos / pool_n
    assert (np.diff(rate) >= -1e-15).all()
    # blocks tile the array exactly: starting at any block head, the
    # member cells' widths sum to the pooled width and their positives
    # to the pooled positives — no conditional skip, every cell is
    # covered by exactly one block
    i = 0
    while i < len(cells):
        width = int(pool_n[i])
        pos = int(pool_pos[i])
        acc_n = acc_p = 0
        j = i
        while acc_n < width:
            assert pool_n[j] == width and pool_pos[j] == pos
            acc_n += int(n[j])
            acc_p += int(p[j])
            j += 1
        assert acc_n == width and acc_p == pos
        i = j
    assert i == len(cells)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 6)),
        min_size=2,
        max_size=80,
    )
)
def test_kendall_counts_bounded(pairs):
    g = (
        pd.DataFrame(pairs, columns=["xb", "yb"])
        .groupby(["xb", "yb"], as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
    )
    n, C, D, tau = kendall_from_cells(g)
    assert n == len(pairs)
    n0 = n * (n - 1) // 2
    assert 0 <= C <= n0 and 0 <= D <= n0 and C + D <= n0
    if not np.isnan(tau):
        assert -1.0 - 1e-12 <= tau <= 1.0 + 1e-12


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(1, 50), min_size=1, max_size=50))
def test_rank_sum_identity(cnts):
    """sum over distinct values of cnt * avg_rank == n(n+1)/2, i.e.
    sum(cnt * r2) == n(n+1)."""
    c = np.array(cnts, dtype=np.int64)
    r2 = rank2_map(c)
    n = int(c.sum())
    assert int((c * r2).sum()) == n * (n + 1)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(2, 20),
    st.integers(0, 2**31),
)
def test_mmr_greedy_invariants(n, seed):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
    rel = rng.integers(-(1 << 20), 1 << 20, size=n).astype(np.int64)
    v = rng.normal(size=(n, 6))
    from khl_pdf_ocr_ray.pipelines.queries_mmr import cos_fx

    pair = cos_fx(v, v)
    picks = mmr_greedy(ids, rel, pair, 10)
    pids = [p for p, _ in picks]
    assert len(set(pids)) == len(pids)  # no repeats
    assert len(picks) == min(10, n)
    # first pick is pure max relevance with min-id ties
    best_rel = rel.max()
    tied = ids[rel == best_rel]
    assert pids[0] == int(tied.min())


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 20)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_median_balance(cells):
    hist = pd.DataFrame(cells, columns=["cents", "w"])
    W, med = weighted_median_from_hist(hist)
    below = sum(w for v, w in cells if v < med)
    at_or_below = sum(w for v, w in cells if v <= med)
    assert med in {v for v, _ in cells}
    assert 2 * at_or_below >= W  # med reaches half the mass
    assert 2 * below < W  # and the previous value does not


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 9)),
        min_size=1,
        max_size=80,
    )
)
def test_lpa_pack_round_matches_counter(pairs):
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    lbl = np.array([p[1] for p in pairs], dtype=np.int64)
    nodes, new = lpa_pack_round(src, lbl)
    by_node = defaultdict(list)
    for s, l in pairs:
        by_node[s].append(l)
    for nd, nl in zip(nodes, new):
        c = Counter(by_node[int(nd)])
        want = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        assert int(nl) == want
