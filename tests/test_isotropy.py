"""embedding_isotropy: quantization exactness and closed-form checks."""

import numpy as np
import pyarrow as pa


def _mk_batch(vecs):
    return pa.table(
        {"embedding": pa.array([list(map(float, v)) for v in vecs],
                               pa.list_(pa.float32()))}
    )


def test_iso_partial_quantization_exact():
    from khl_pdf_ocr_ray.pipelines.queries_isotropy import ISO_Q, iso_partial

    vecs = np.random.RandomState(0).randn(5, 4).astype(np.float32)
    out = iso_partial(_mk_batch(vecs)).to_pandas()
    q = np.floor(vecs.astype(np.float64) * ISO_Q).astype(np.int64)
    assert out["comp_sum"].tolist() == q.sum(axis=0).tolist()
    assert out["norm2_sum"].sum() == int((q.astype(object) ** 2).sum())
    assert out["n"].sum() == 5


def test_iso_partial_batching_invariant():
    from khl_pdf_ocr_ray.pipelines.queries_isotropy import iso_partial

    vecs = np.random.RandomState(1).randn(8, 4).astype(np.float32)
    whole = iso_partial(_mk_batch(vecs)).to_pandas()
    a = iso_partial(_mk_batch(vecs[:3])).to_pandas()
    b = iso_partial(_mk_batch(vecs[3:])).to_pandas()
    merged = a.set_index("dim_idx") + b.set_index("dim_idx")
    w = whole.set_index("dim_idx")
    assert (merged["comp_sum"] == w["comp_sum"]).all()
    assert merged["norm2_sum"].sum() == w["norm2_sum"].sum()
    assert merged["n"].sum() == w["n"].sum()


def test_isotropy_extremes(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_isotropy import (
        ISO_SCALE,
        q_embedding_isotropy,
    )

    out = q_embedding_isotropy(sf_smoke_dir)
    r = out.iloc[0]
    # normalized synthetic embeddings: mean norm2 == 1.0 exactly in fx
    assert abs(int(r["mean_norm2_fx"]) - ISO_SCALE) <= ISO_SCALE // 100
    # random directions: isotropy near 0, far below the collapse regime
    assert 0 <= int(r["isotropy_fx"]) < ISO_SCALE // 10
    assert int(r["dim"]) == 64
