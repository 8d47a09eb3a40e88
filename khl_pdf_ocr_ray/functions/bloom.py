"""Distributed Bloom-filter build + map-side prefilter.

The scale pattern for semi/anti joins whose probe side is too big to
broadcast exactly: build a fixed-size Bloom bitmap over the key column
(per-batch partial bitmaps, OR-merged streaming on the driver — memory is
O(m_bits) regardless of corpus size), broadcast the bitmap once via
``ray.put``, and prefilter the other side map-side BEFORE the exact join.
Bloom filters admit false positives but never false negatives, so the
prefilter preserves join correctness while cutting the exact join's
shuffle volume to ~|matches| + fp_rate * |non-matches|.

Hashing: k indexes derived from a splitmix64-style avalanche of the int64
key (vectorized numpy; deterministic, seedless).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_M_BITS = 1 << 20  # 128 KiB bitmap
DEFAULT_K = 4


def _mix64(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    z = (x + salt + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bit_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indexes for int64 keys."""
    u = keys.astype(np.int64).astype(np.uint64)
    cols = [
        (_mix64(u, np.uint64(1 + i)) % np.uint64(m_bits)).astype(np.int64)
        for i in range(k)
    ]
    return np.stack(cols, axis=1)


def bloom_partial_batch(
    batch: pa.Table, col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> pa.Table:
    """One batch -> a single row carrying this batch's partial bitmap
    (packed little-endian uint64 words as binary)."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    keys = batch[col].to_numpy(zero_copy_only=False)
    if len(keys):
        pos = _bit_positions(keys, m_bits, k).reshape(-1)
        np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
    return pa.table({"bitmap": pa.array([words.astype("<u8").tobytes()], pa.binary())})


def build_bloom(ds, col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> np.ndarray:
    """Dataset -> merged Bloom bitmap (driver memory O(m_bits): partial
    bitmaps are OR-merged streaming, one at a time)."""
    from ..remote import remote_fn

    partials = ds.map_batches(
        remote_fn("khl_pdf_ocr_ray.functions.bloom", "bloom_partial_batch",
                  col=col, m_bits=m_bits, k=k),
        batch_format="pyarrow",
    )
    merged = np.zeros(m_bits // 64, dtype=np.uint64)
    for batch in partials.iter_batches(batch_format="pyarrow"):
        for raw in batch["bitmap"].to_pylist():
            merged |= np.frombuffer(raw, dtype="<u8")
    return merged


def bloom_probe_batch(
    batch: pa.Table, col: str, bloom_ref, m_bits: int, k: int
) -> pa.Table:
    """Map-side prefilter: keep rows whose key is POSSIBLY in the set (the
    only sound Bloom prefilter direction — false positives are removed by
    the exact join that follows, false negatives never occur). A
    keep-misses variant is deliberately NOT offered: dropping Bloom hits
    before an anti join would silently lose the false-positive rows, which
    are legitimate anti-join results no downstream join can restore."""
    import ray

    bloom = ray.get(bloom_ref) if not isinstance(bloom_ref, np.ndarray) else bloom_ref
    keys = batch[col].to_numpy(zero_copy_only=False)
    if not len(keys):
        return batch
    pos = _bit_positions(keys, m_bits, k)
    bits = (bloom[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    return batch.filter(pa.array(bits.all(axis=1)))
