"""Kernel-level checks for the embedding operators
(pipelines/queries_embed.py) beyond the parametrized oracle/dump parity:
batching-invariance of the assignment kernel, exactness of fixed-point
centroid updates, empty-cluster behavior, and the binary pack roundtrip."""

import numpy as np
import pandas as pd

from khl_pdf_ocr_ray.pipelines.queries_embed import (
    EMB_SCALE,
    KM_K,
    _unpack,
    emb_fixed,
    emb_pack_batch,
    km_assign,
    km_update_from_sums,
)


def _x(n, d=16, seed=3):
    return np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)


def test_km_assign_is_batching_invariant():
    """A row's assignment must not depend on its batch neighbours — the
    property the distributed/sequential bit-identity rests on."""
    x = _x(200).astype(np.float64)
    c = _x(KM_K, seed=9).astype(np.float64)
    whole = km_assign(x, c)
    parts = np.concatenate(
        [km_assign(x[i : i + 7], c) for i in range(0, len(x), 7)]
    )
    assert (whole == parts).all()


def test_km_assign_tie_breaks_to_lowest_cluster():
    x = np.array([[1.0, 0.0]])
    c = np.array([[1.0, 1.0], [1.0, -1.0]])  # equidistant
    assert km_assign(x, c).tolist() == [0]


def test_fixed_sums_split_invariant():
    """Integer fixed-point sums over any split equal the whole-array sum
    (the order-independence that float sums lack)."""
    x = _x(101).astype(np.float64)
    fx = emb_fixed(x)
    assert (fx[:40].sum(axis=0) + fx[40:].sum(axis=0) == fx.sum(axis=0)).all()
    # and the scale really is 2^20 floor-rounding
    assert fx[0, 0] == int(np.floor(np.float64(x[0, 0]) * EMB_SCALE + 0.5))


def test_km_update_keeps_empty_cluster_centroid():
    prev = np.ones((3, 2))
    sums = np.array([[2 * EMB_SCALE, 0], [0, 0], [4 * EMB_SCALE, 0]], dtype=np.int64)
    counts = np.array([2, 0, 1], dtype=np.int64)
    out = km_update_from_sums(sums, counts, prev)
    assert out[0].tolist() == [1.0, 0.0]
    assert out[1].tolist() == [1.0, 1.0]  # empty: unchanged
    assert out[2].tolist() == [4.0, 0.0]


def test_pack_unpack_roundtrip():
    x = _x(5)
    df = pd.DataFrame({"vec_id": range(5), "embedding": list(x)})
    packed = emb_pack_batch(df)
    back = _unpack(packed)
    assert back.shape == x.shape and (back == x).all()
