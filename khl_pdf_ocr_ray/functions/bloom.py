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


# --- duplicate-detection Bloom pair (Dolma/BFF-style prefilter) -------------
# A single Bloom bitmap can only answer "possibly seen"; duplicate
# PREfiltering needs "possibly seen TWICE". Each block contributes a
# (once, twice) bitmap pair; the pair merge
#     twice' = a.twice | b.twice | (a.once & b.once);  once' = a.once | b.once
# is associative, so a streaming fold (or tree reduce on a cluster) yields
# the global pair in O(m_bits) driver memory. Misses of the merged `twice`
# bitmap are PROVABLY unique keys (no false negatives) and can skip the
# exact dedup shuffle entirely; hits (true dups + fp_rate * uniques) flow
# to the exact path, which removes the false positives. Public idea:
# Bloom-filter dedup as in Soldaini et al., "Dolma" (2024) — reimplemented
# from the published description.


def hex16_to_u64(arr) -> np.ndarray:
    """Vectorized decode of the first 16 hex chars of every string to
    uint64 (the line_md5 columns are 32-char hex digests). No per-row
    Python: gathers straight from the Arrow data buffer."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    if int((offsets[1:] - offsets[:-1]).min()) < 16:
        raise ValueError("hex16_to_u64 needs >=16-char hex values")
    ch = data[starts[:, None] + np.arange(16)]
    nib = (ch - np.where(ch >= 97, 87, 48)).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(16):
        vals = (vals << np.uint64(4)) | nib[:, j]
    return vals


def _set_bits(words: np.ndarray, keys_u64: np.ndarray, m_bits: int, k: int) -> None:
    if len(keys_u64) == 0:
        return
    cols = [
        (_mix64(keys_u64, np.uint64(1 + i)) % np.uint64(m_bits)).astype(np.int64)
        for i in range(k)
    ]
    pos = np.stack(cols, axis=1).reshape(-1)
    np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))


def dup_bloom_partial_batch(
    batch: pa.Table, col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> pa.Table:
    """One batch -> one row with this batch's (once, twice) bitmaps.
    Within-batch duplicate keys go straight to `twice`."""
    nwords = m_bits // 64
    once = np.zeros(nwords, dtype=np.uint64)
    twice = np.zeros(nwords, dtype=np.uint64)
    keys = hex16_to_u64(batch[col])
    uniq, counts = np.unique(keys, return_counts=True)
    _set_bits(once, uniq, m_bits, k)
    _set_bits(twice, uniq[counts >= 2], m_bits, k)
    return pa.table(
        {
            "once": pa.array([once.astype("<u8").tobytes()], pa.binary()),
            "twice": pa.array([twice.astype("<u8").tobytes()], pa.binary()),
        }
    )


def build_dup_bloom(
    ds, col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> np.ndarray:
    """Dataset -> the merged `twice` bitmap (possibly-duplicate keys).
    Driver memory O(m_bits); partial pairs stream through the fold."""
    from ..remote import remote_fn

    partials = ds.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.functions.bloom",
            "dup_bloom_partial_batch",
            col=col,
            m_bits=m_bits,
            k=k,
        ),
        batch_format="pyarrow",
    )
    acc_once = np.zeros(m_bits // 64, dtype=np.uint64)
    acc_twice = np.zeros(m_bits // 64, dtype=np.uint64)
    for batch in partials.iter_batches(batch_format="pyarrow"):
        for o_raw, t_raw in zip(batch["once"].to_pylist(), batch["twice"].to_pylist()):
            o = np.frombuffer(o_raw, dtype="<u8")
            t = np.frombuffer(t_raw, dtype="<u8")
            acc_twice |= t | (acc_once & o)
            acc_once |= o
    return acc_twice


def dup_probe_batch(
    batch: pa.Table, col: str, bloom_ref, m_bits: int, k: int, keep_hits: bool
) -> pa.Table:
    """Split on the `twice` bitmap: hits = possibly-duplicate rows (feed
    the exact dedup), misses = provably-unique rows (skip the shuffle).
    Unlike bloom_probe_batch's semi-join direction, BOTH directions are
    sound here because a miss certifies global uniqueness, not absence."""
    import ray

    bloom = ray.get(bloom_ref) if not isinstance(bloom_ref, np.ndarray) else bloom_ref
    keys = hex16_to_u64(batch[col])
    if len(keys) == 0:
        return batch
    pos = _bit_positions(keys.astype(np.int64), m_bits, k)
    hit = ((bloom[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)).all(
        axis=1
    )
    return batch.filter(pa.array(hit if keep_hits else ~hit))


def dup_flag_batch(
    batch: pa.Table, col: str, bloom_ref, m_bits: int, k: int
) -> pa.Table:
    """dup_probe_batch as ONE pass: append an int64 `dup_flag` column
    (1 = possibly duplicate, 0 = provably unique) instead of filtering,
    so the hit and miss consumers share a single hash/probe computation."""
    import ray

    bloom = ray.get(bloom_ref) if not isinstance(bloom_ref, np.ndarray) else bloom_ref
    keys = hex16_to_u64(batch[col])
    if len(keys) == 0:
        return batch.append_column("dup_flag", pa.array([], pa.int64()))
    pos = _bit_positions(keys.astype(np.int64), m_bits, k)
    hit = ((bloom[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)).all(
        axis=1
    )
    return batch.append_column("dup_flag", pa.array(hit.astype(np.int64), pa.int64()))


def flag_take(batch: pa.Table, keep_hits: bool) -> pa.Table:
    """Split a dup_flag-carrying table into its hit or miss half."""
    import pyarrow.compute as pc

    want = 1 if keep_hits else 0
    return batch.filter(pc.equal(batch["dup_flag"], want)).drop_columns(
        ["dup_flag"]
    )
