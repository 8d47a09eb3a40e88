"""Kernel-level checks for the window/positional operators
(pipelines/queries_window.py) beyond the parametrized oracle parity test:
exact NTILE bucket formula vs DuckDB, prefix-sum contiguity of the packing
layout, rank-partial commutativity, and resample threshold arithmetic."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_window import (
    NTILE_K,
    PACK_SHARD,
    PACK_WINDOW,
    RANK_K,
    RESAMPLE_SCALE,
    RESAMPLE_TARGETS,
    ntile_of_rank,
    pack_assign_shard,
    rank_finalize_shard,
    rank_partial,
    resample_thresholds,
)


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (7, 3), (100, 4), (101, 4), (103, 4)])
def test_ntile_formula_matches_duckdb(n, k):
    rank = np.arange(n, dtype="int64")
    got = ntile_of_rank(rank, n, k)
    want = duckdb.sql(
        f"SELECT ntile({k}) OVER (ORDER BY i) AS t FROM range({n}) r(i) ORDER BY i"
    ).df()["t"].to_numpy()
    assert (got == want).all()


def test_ntile_fewer_rows_than_tiles():
    assert ntile_of_rank(np.array([0, 1]), 2, 4).tolist() == [1, 2]


def test_rank_partial_is_commutative_prefilter():
    """Splitting the orders of one customer across batches never drops a
    true top-K row: the per-batch top-K union contains the global top-K."""
    rng = np.random.default_rng(7)
    n = 40
    full = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_custkey": pa.array(np.full(n, 9), pa.int64()),
            "o_totalprice": pa.array(rng.uniform(10, 99, n), pa.float64()),
        }
    )
    merged = pa.concat_tables([rank_partial(full.slice(0, 13)),
                               rank_partial(full.slice(13))])
    final = rank_finalize_shard(merged.to_pandas())
    direct = rank_finalize_shard(rank_partial(full).to_pandas())
    pd.testing.assert_frame_equal(
        final.reset_index(drop=True), direct.reset_index(drop=True)
    )
    assert len(final) == RANK_K and final["rnk"].tolist() == [1, 2, 3]


def test_pack_offsets_are_contiguous():
    """Within a shard: off[i+1] == off[i] + dl[i]; bins consistent."""
    texts = ["a b c", "", "x " * 300, "y"]
    g = pd.DataFrame({"doc_id": [4, 5, 6, 7], "text": [t.strip() for t in texts]})
    out = pack_assign_shard(g, shard_offsets={4 // PACK_SHARD: 1000})
    assert out["off"].iloc[0] == 1000
    dl = out["dl"].to_numpy()
    off = out["off"].to_numpy()
    assert (off[1:] == off[:-1] + dl[:-1]).all()
    assert (out["first_bin"] == off // PACK_WINDOW).all()
    assert (out["last_bin"] == (off + dl - 1) // PACK_WINDOW).all()
    assert (dl >= 1).all()  # ''.split(' ') == [''] -> one token


def test_resample_thresholds_cap_and_cut():
    # en hugely over target 40% -> cut; fr under target -> keep all
    counts = {"en": 900, "zh": 25, "es": 25, "de": 25, "fr": 25}
    thr = resample_thresholds(counts)
    n = sum(counts.values())
    assert thr["fr"] == RESAMPLE_SCALE  # rate capped at 1
    expect_en = (RESAMPLE_TARGETS["en"] * n * RESAMPLE_SCALE) // (100 * 900)
    assert thr["en"] == expect_en < RESAMPLE_SCALE


# --- property tests (hypothesis) -------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 2000), st.integers(1, 12))
def test_ntile_property_bucket_sizes(n, k):
    """Bucket sizes differ by at most 1 and are non-increasing (the SQL
    NTILE contract), covering every (N % k) remainder case."""
    tiles = ntile_of_rank(np.arange(n, dtype="int64"), n, k)
    sizes = pd.Series(tiles).value_counts().sort_index()
    assert sizes.sum() == n
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(sizes.to_numpy()) <= 0).all()
    assert tiles.min() == 1 and tiles.max() == min(k, n)
    assert (np.diff(tiles) >= 0).all()  # monotone in rank


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=60),
    st.integers(2, 9),
)
def test_pack_prefix_sum_shard_invariant(dls, cut):
    """Two-level prefix sum equals the direct cumsum no matter where the
    shard boundary falls: offsets are a pure function of doc order."""
    texts = [" ".join(["w"] * max(1, d)) for d in dls]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    direct = np.concatenate(
        [[0], np.cumsum([len(t.split(" ")) for t in texts])[:-1]]
    )
    # emulate the two-level plan with an arbitrary shard size `cut`
    import khl_pdf_ocr_ray.pipelines.queries_window as qw

    old = qw.PACK_SHARD
    qw.PACK_SHARD = cut
    try:
        sums = {}
        for i, t in enumerate(texts):
            s = i // cut
            sums[s] = sums.get(s, 0) + len(t.split(" "))
        offs, acc = {}, 0
        for s in sorted(sums):
            offs[s] = acc
            acc += sums[s]
        outs = [
            qw.pack_assign_shard(g, shard_offsets=offs)
            for _, g in df.groupby(df["doc_id"] // cut)
        ]
        got = pd.concat(outs).sort_values("doc_id")["off"].to_numpy()
    finally:
        qw.PACK_SHARD = old
    assert (got == direct).all()
