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
    import pyarrow as pa

    x = _x(5)
    df = pd.DataFrame({"vec_id": range(5), "embedding": list(x)})
    packed = emb_pack_batch(pa.Table.from_pandas(df, preserve_index=False))
    back = _unpack(packed["emb_bin"])
    assert back.shape == x.shape and (back == x).all()


# --- PCA kernels -------------------------------------------------------------
def _pca_df(n, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    from khl_pdf_ocr_ray.pipelines.queries_embed import EMB_DIM

    x = rng.normal(size=(n, EMB_DIM)).astype(np.float32)
    import pyarrow as pa

    x[:, 0] *= 5.0  # dominant variance direction = dim 0
    return pa.Table.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(x)}
        ),
        preserve_index=False,
    )


def test_pca_moments_split_invariant():
    """Summed per-batch moment rows equal the single-batch moments bit-
    for-bit (the property the distributed groupby relies on)."""
    from khl_pdf_ocr_ray.pipelines.queries_embed import pca_moment_partial

    df = _pca_df(53)
    whole = pca_moment_partial(df).to_pandas().set_index(["i", "j"])["v"]
    parts = pd.concat(
        [
            pca_moment_partial(df.slice(i, 17)).to_pandas()
            for i in range(0, df.num_rows, 17)
        ]
    )
    summed = parts.groupby(["i", "j"])["v"].sum()
    pd.testing.assert_series_equal(
        whole.sort_index(), summed.sort_index(), check_names=False
    )


def test_pca_model_finds_dominant_direction_and_fixed_sign():
    from khl_pdf_ocr_ray.pipelines.queries_embed import (
        pca_model_from_sums,
        pca_moment_partial,
    )

    df = _pca_df(400)
    mean, comps = pca_model_from_sums(pca_moment_partial(df).to_pandas())
    # PC1 is (close to) the inflated axis, and the sign rule makes the
    # largest-magnitude component positive
    assert abs(comps[0, 0]) > 0.95
    k = int(abs(comps[:, 0]).argmax())
    assert comps[k, 0] > 0
    k1 = int(abs(comps[:, 1]).argmax())
    assert comps[k1, 1] > 0
    # components are unit-norm and orthogonal
    import numpy as np

    assert np.allclose((comps**2).sum(axis=0), 1.0)
    assert abs(float(comps[:, 0] @ comps[:, 1])) < 1e-9


def test_pca_projection_batch_invariant():
    """Projection of a split frame equals the whole-frame projection
    exactly (fixed-order dim accumulation, no shape-dependent BLAS)."""
    from khl_pdf_ocr_ray.pipelines.queries_embed import (
        pca_model_from_sums,
        pca_moment_partial,
        pca_project_batch,
    )

    df = _pca_df(60)
    mean, comps = pca_model_from_sums(pca_moment_partial(df).to_pandas())
    whole = pca_project_batch(df, mean.tolist(), comps.tolist()).to_pandas()
    parts = pd.concat(
        [
            pca_project_batch(
                df.slice(i, 13), mean.tolist(), comps.tolist()
            ).to_pandas()
            for i in range(0, df.num_rows, 13)
        ]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, parts)


# --- SemDeDup -----------------------------------------------------------------
def test_semdedup_mark_rule():
    """Row i removed iff some EARLIER row has cosine >= SEM_TAU — kept
    status of the earlier row is irrelevant (order-parallel rule)."""
    import numpy as np

    from khl_pdf_ocr_ray.pipelines.queries_embed import SEM_TAU, semdedup_mark

    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    x = np.stack([a, b, a, a + 1e-3 * b, b])
    kept = semdedup_mark(x)
    # first occurrences of each direction survive; later near-copies don't
    assert kept.tolist() == [True, True, False, False, False]
    # orthogonal pair is below any sensible tau
    assert SEM_TAU > 0.0
    assert semdedup_mark(np.stack([a, b])).tolist() == [True, True]
    assert semdedup_mark(np.zeros((0, 3))).tolist() == []
    assert semdedup_mark(np.stack([a])).tolist() == [True]


def test_semdedup_lowest_id_always_kept(ray_session, sf_smoke_dir):
    """Per cluster: the lowest vec_id is always kept, and every removal has
    an earlier same-cluster row above the threshold."""
    import numpy as np
    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.queries_embed import SEM_TAU, q_semdedup

    df = q_semdedup(sf_smoke_dir).to_pandas().sort_values(
        ["cluster", "vec_id"]
    )
    first = df.groupby("cluster").head(1)
    assert first["kept"].all()
    emb = pq.read_table(
        f"{sf_smoke_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    vecs = {
        int(i): np.asarray(e, dtype=np.float64)
        for i, e in zip(emb["vec_id"], emb["embedding"])
    }

    def cos(u, v):
        nu, nv = np.linalg.norm(u), np.linalg.norm(v)
        return float(u @ v / ((nu or 1.0) * (nv or 1.0)))

    for _, grp in df.groupby("cluster"):
        ids = grp["vec_id"].tolist()
        kept = grp["kept"].tolist()
        for i, (vid, k) in enumerate(zip(ids, kept)):
            if not k:
                assert any(
                    cos(vecs[earlier], vecs[vid]) >= SEM_TAU
                    for earlier in ids[:i]
                ), vid


def test_semdedup_mark_tiled_equals_naive_loop():
    """The tiled prefix-compare must reproduce the published per-row rule
    bit-for-bit, including across chunk boundaries (SEM_CHUNK patched to a
    tiny width so a ~100-row matrix spans many tiles)."""
    import numpy as np

    from khl_pdf_ocr_ray.pipelines import queries_embed as qe

    rs = np.random.RandomState(5)
    # near-dup heavy so plenty of rows are removed
    base = rs.rand(10, 16)
    x = np.vstack([base[rs.randint(0, 10)] + rs.rand(16) * 0.8 for _ in range(97)])

    def naive(x):
        n = len(x)
        kept = np.ones(n, dtype=bool)
        norms = np.sqrt(np.einsum("ij,ij->i", x, x))
        norms[norms == 0.0] = 1.0
        xn = x / norms[:, None]
        for i in range(1, n):
            if (xn[:i] @ xn[i] >= qe.SEM_TAU).any():
                kept[i] = False
        return kept

    want = naive(x)
    got_default = qe.semdedup_mark(x)
    old_chunk = qe.SEM_CHUNK
    try:
        qe.SEM_CHUNK = 7  # prime, far smaller than n: exercises ragged tiles
        got_tiny = qe.semdedup_mark(x)
    finally:
        qe.SEM_CHUNK = old_chunk
    assert (got_default == want).all()
    assert (got_tiny == want).all()
    assert not want.all()  # the planted dups actually removed rows


def test_semdedup_giant_cluster_fails_loudly():
    """A cluster wider than SEM_CLUSTER_WIDTH_MAX must raise, not start a
    silent quadratic single task (round-5 brief item 6)."""
    import numpy as np
    import pytest as _pytest

    from khl_pdf_ocr_ray.pipelines import queries_embed as qe

    old = qe.SEM_CLUSTER_WIDTH_MAX
    try:
        qe.SEM_CLUSTER_WIDTH_MAX = 50
        with _pytest.raises(ValueError, match="SEM_CLUSTER_WIDTH_MAX"):
            qe.semdedup_mark(np.ones((51, 8)))
        # at exactly the cap it still runs
        assert len(qe.semdedup_mark(np.ones((50, 8)))) == 50
    finally:
        qe.SEM_CLUSTER_WIDTH_MAX = old
