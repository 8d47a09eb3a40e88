"""Kernel tests for the Bloom FPR evaluation."""

import numpy as np
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.functions.bloom import (
    DEFAULT_K,
    DEFAULT_M_BITS,
    _bit_positions,
)
from khl_pdf_ocr_ray.pipelines.queries_bloomeval import (
    PROBE_BASE,
    member_guard_batch,
    probe_count_batch,
)


def _bitmap_for(keys: np.ndarray) -> np.ndarray:
    words = np.zeros(DEFAULT_M_BITS // 64, dtype=np.uint64)
    pos = _bit_positions(keys, DEFAULT_M_BITS, DEFAULT_K).reshape(-1)
    np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
    return words


def test_members_always_hit():
    keys = np.arange(100, dtype=np.int64)
    bloom = _bitmap_for(keys)
    # probe ids j map to PROBE_BASE + j; plant the members AT those ids
    planted = _bitmap_for(np.arange(PROBE_BASE, PROBE_BASE + 50, dtype=np.int64))
    batch = pa.table({"id": pa.array(range(50), pa.int64())})
    out = probe_count_batch(batch, np.bitwise_or(bloom, planted),
                            DEFAULT_M_BITS, DEFAULT_K)
    assert out["n_fp"].to_pylist() == [50]  # no false negatives, ever


def test_empty_bitmap_no_hits():
    batch = pa.table({"id": pa.array(range(1000), pa.int64())})
    out = probe_count_batch(
        batch, np.zeros(DEFAULT_M_BITS // 64, dtype=np.uint64),
        DEFAULT_M_BITS, DEFAULT_K,
    )
    assert out["n_fp"].to_pylist() == [0]
    assert out["n_probes"].to_pylist() == [1000]


def test_fpr_near_analytic():
    rng = np.random.RandomState(11)
    n = 1500
    bloom = _bitmap_for(rng.randint(0, PROBE_BASE, n).astype(np.int64))
    batch = pa.table({"id": pa.array(range(65536), pa.int64())})
    fp = probe_count_batch(batch, bloom, DEFAULT_M_BITS, DEFAULT_K)[
        "n_fp"
    ].to_pylist()[0]
    expected = (1 - np.exp(-DEFAULT_K * n / DEFAULT_M_BITS)) ** DEFAULT_K
    assert fp / 65536 < 5 * expected + 1e-4  # sane order of magnitude


def test_member_guard_fires_on_collision():
    bad = pa.table({"user_id": pa.array([PROBE_BASE + 1], pa.int64())})
    with pytest.raises(AssertionError, match="collide"):
        member_guard_batch(bad)
    ok = pa.table({"user_id": pa.array([123], pa.int64())})
    assert member_guard_batch(ok) is ok
