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


def test_dup_bloom_no_false_negatives_across_blocks(ray_session):
    """Every key occurring >= 2 times corpus-wide must hit the merged
    `twice` bitmap, regardless of how occurrences split across blocks."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from khl_pdf_ocr_ray.functions.bloom import (
        DEFAULT_K,
        DEFAULT_M_BITS,
        build_dup_bloom,
        dup_probe_batch,
    )

    def h(s):
        return hashlib.md5(str(s).encode()).hexdigest()

    # 300 unique keys + 50 dup keys, each dup occurring twice in
    # DIFFERENT halves (forces the cross-block once&once merge path)
    uniq = [h(f"u{i}") for i in range(300)]
    dups = [h(f"d{i}") for i in range(50)]
    half1 = pa.table({"line_md5": pa.array(uniq[:150] + dups)})
    half2 = pa.table({"line_md5": pa.array(uniq[150:] + dups)})
    ds = rd.from_arrow([half1, half2]).repartition(4)
    twice = build_dup_bloom(ds, "line_md5")
    hits = dup_probe_batch(
        pa.table({"line_md5": pa.array(dups)}),
        "line_md5", twice, DEFAULT_M_BITS, DEFAULT_K, keep_hits=True,
    )
    assert len(hits) == 50  # no false negatives, ever
    misses = dup_probe_batch(
        pa.table({"line_md5": pa.array(uniq)}),
        "line_md5", twice, DEFAULT_M_BITS, DEFAULT_K, keep_hits=False,
    )
    # false-positive rate is tiny at this fill factor; require most uniques
    # to skip the exact path (the property the prefilter exists for)
    assert len(misses) >= 290


def test_hex16_to_u64_matches_int_parse():
    import hashlib

    import numpy as np
    import pyarrow as pa

    from khl_pdf_ocr_ray.functions.bloom import hex16_to_u64

    vals = [hashlib.md5(str(i).encode()).hexdigest() for i in range(100)]
    got = hex16_to_u64(pa.chunked_array([pa.array(vals[:37]), pa.array(vals[37:])]))
    want = np.array([int(v[:16], 16) for v in vals], dtype=np.uint64)
    assert (got == want).all()
