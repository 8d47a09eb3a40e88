"""Bloom-prefilter semi-join tests (the 100 TB probe-side pattern)."""

import numpy as np
import pandas as pd
import pytest


def test_bloom_no_false_negatives(ray_session):
    import ray.data as rd

    from khl_pdf_ocr_ray.functions.bloom import (
        DEFAULT_K,
        DEFAULT_M_BITS,
        _bit_positions,
        build_bloom,
    )

    keys = np.arange(0, 30_000, 7, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(4)
    bloom = build_bloom(ds, "k")
    pos = _bit_positions(keys, DEFAULT_M_BITS, DEFAULT_K)
    bits = (bloom[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    assert bits.all()  # every inserted key must probe positive


def test_bloom_filters_most_nonmembers(ray_session):
    import ray.data as rd

    from khl_pdf_ocr_ray.functions.bloom import (
        DEFAULT_K,
        DEFAULT_M_BITS,
        _bit_positions,
        build_bloom,
    )

    members = np.arange(0, 5_000, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": members}))
    bloom = build_bloom(ds, "k")
    probes = np.arange(1_000_000, 1_030_000, dtype=np.int64)  # disjoint
    pos = _bit_positions(probes, DEFAULT_M_BITS, DEFAULT_K)
    bits = (bloom[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    fp_rate = bits.all(axis=1).mean()
    assert fp_rate < 0.05  # 5k keys in 2^20 bits, k=4 -> ~1e-5 expected


def test_customers_semi_bloom_matches_plain_semi(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    plain = (
        QUERIES["customers_semi"](sf_smoke_dir)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    bloomed = (
        QUERIES["customers_semi_bloom"](sf_smoke_dir)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, bloomed)
