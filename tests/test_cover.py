"""source_set_cover: greedy kernel properties + query sanity."""

import numpy as np
import pandas as pd


def test_greedy_cover_picks_max_marginal():
    from khl_pdf_ocr_ray.pipelines.queries_cover import greedy_cover

    # masks over sources [a, b, c]: a covers 5 grams alone, b 3 alone,
    # ab shares 4, c covers 0
    masks = np.array([0b001, 0b010, 0b011], dtype=np.int64)
    counts = np.array([5, 3, 4], dtype=np.int64)
    out = greedy_cover(masks, counts, ["a", "b", "c"])
    # a first (5+4=9), then b (+3); c adds nothing and is dropped
    assert out["source"].tolist() == ["a", "b"]
    assert out["marginal_grams"].tolist() == [9, 3]
    assert out["cumulative_grams"].tolist() == [9, 12]


def test_greedy_cover_tie_breaks_lexicographic():
    from khl_pdf_ocr_ray.pipelines.queries_cover import greedy_cover

    masks = np.array([0b01, 0b10], dtype=np.int64)
    counts = np.array([7, 7], dtype=np.int64)
    out = greedy_cover(masks, counts, ["zed", "alpha"])
    assert out["source"].tolist() == ["alpha", "zed"]


def test_greedy_cover_marginals_monotone():
    from khl_pdf_ocr_ray.pipelines.queries_cover import greedy_cover

    rs = np.random.RandomState(3)
    masks = rs.randint(1, 1 << 6, 200).astype(np.int64)
    counts = rs.randint(1, 50, 200).astype(np.int64)
    out = greedy_cover(masks, counts, [f"s{i}" for i in range(6)])
    # greedy marginal gains are non-increasing (submodularity)
    m = out["marginal_grams"].to_numpy()
    assert (np.diff(m) <= 0).all()
    assert out["cumulative_grams"].iloc[-1] == counts.sum()


def test_source_set_cover_query(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_cover import q_source_set_cover

    out = q_source_set_cover(sf_smoke_dir)
    assert len(out) > 0
    assert (np.diff(out["marginal_grams"].to_numpy()) <= 0).all()
    assert (
        out["cumulative_grams"].to_numpy()
        == out["marginal_grams"].cumsum().to_numpy()
    ).all()
