"""Near-duplicate detection: MinHash+LSH, SimHash, exact n-gram Jaccard.

Published algorithms: MinHash resemblance sketching (Broder 1997, "On the
resemblance and containment of documents"), banded LSH (Indyk & Motwani
1998 / the classic b-bands-of-r-rows construction), SimHash (Charikar
2002, "Similarity estimation techniques from rounding algorithms"); the
banded Levenshtein DP is the standard Ukkonen-style |i-j| <= k diagonal
band (Ukkonen 1985).

Deduplication operators for a training-data pipeline (build brief: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine — exact dedup lives
in queries.q_dedup_exact; embedding dedup in stages/knn.py).

All hashing is seeded/deterministic (blake2b digests + fixed affine
permutations), so every operator's output is reproducible run-to-run.
The driver gate checks each against a sequential-twin DUMP oracle
(state/oracle_dump_near.py — same kernels run in a plain loop, results
parqueted, compared by value hash); the pytest suite additionally asserts
planted near-dup pairs are recovered.

Shuffle structure (the part that matters at 100 TB):
- minhash: map (sig per doc) -> explode to SLIM (shard, band_hash,
  doc_id) keys (24 B/row) -> groupby buckets -> per-bucket candidate
  pairs (bucket size capped) -> groupby pair dedup -> verify by hash-
  joining the sparse pair list against the packed signature table
  (doc_a then doc_b). Two extra join exchanges, but they move
  ~2 KB/doc total vs ~16 KB/doc if signatures rode the band rows —
  the right trade at scale, and no per-doc state on the driver.
- simhash: 64-bit fingerprint, 4x16-bit band bucketing, Hamming<=k verify
  inside buckets.
- ngram-jaccard: inverted index (shingle -> docs) with hot-shingle
  frequency cap, pair co-count, exact J from broadcast shingle counts.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

MINHASH_PERMS = 128
BUCKET_SHARDS = 256  # coarse shuffle key: many LSH buckets per group, so
                     # map_groups runs O(shards) vectorized calls, not
                     # O(buckets) tiny ones (hot-path fix, bench-verified)
LSH_BANDS = 16
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
SHINGLE_K = 3
BUCKET_CAP = 64          # max docs per LSH bucket before pair generation truncates
MERSENNE = (1 << 61) - 1
SIMHASH_BITS = 64
SIMHASH_BANDS = 4
HAMMING_MAX = 3
SHINGLE_DOC_FREQ_CAP = 50   # drop shingles present in more docs (hot-key guard:
                            # a shingle in d docs emits d^2/2 pairs, so the cap
                            # bounds per-shingle work; near-dup pairs share many
                            # LOW-frequency shingles, so recall survives)

_rs = np.random.RandomState(0xC0FFEE)
_A = _rs.randint(1, MERSENNE, size=MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_B = _rs.randint(0, MERSENNE, size=MINHASH_PERMS, dtype=np.int64).astype(np.uint64)


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def _shingles(text: str, k: int = SHINGLE_K) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([_hash64(g) for g in grams], dtype=np.uint64))


def _minhash_sig(shingle_hashes: np.ndarray) -> np.ndarray:
    if shingle_hashes.size == 0:
        return np.full(MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    # affine permutations mod a Mersenne prime, vectorized (n_shingles x perms)
    x = shingle_hashes.reshape(-1, 1) % MERSENNE
    vals = (x * _A.reshape(1, -1) + _B.reshape(1, -1)) % MERSENNE
    return vals.min(axis=0)


# --- MinHash + LSH ----------------------------------------------------------
# Arrow-native kernels: every map_batches body below is pyarrow in /
# pyarrow out (zero-copy from the object store) with numpy column math —
# no Arrow->pandas->Arrow copy on the text/signature hot path. Only the
# unavoidable per-doc tokenization loops over Python strings.
def _i64(arr) -> np.ndarray:
    """Arrow column -> int64 numpy (zero-copy when null-free)."""
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.int64)


def _sig_matrix(col) -> np.ndarray:
    """Packed-signature binary column -> (n, MINHASH_PERMS) int64 matrix."""
    bufs = col.to_pylist()
    if not bufs:
        return np.empty((0, MINHASH_PERMS), dtype=np.int64)
    return np.frombuffer(b"".join(bufs), dtype="<i8").reshape(
        len(bufs), MINHASH_PERMS
    )


def minhash_sig_batch(batch: pa.Table) -> pa.Table:
    """doc -> (doc_id, sig_bin): the 128 minhashes packed little-endian
    into one 1024-byte value. Packing at the source (a) lets the same
    table feed BOTH the band explode and the verify joins (Acero hash
    joins cannot carry list columns) and (b) drops the former separate
    pack stage + its materialize."""
    sig_bins = [
        _minhash_sig(_shingles(t or "")).astype(np.int64).astype("<i8").tobytes()
        for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {"doc_id": batch["doc_id"], "sig_bin": pa.array(sig_bins, pa.binary())}
    )


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def minhash_band_batch(batch: pa.Table) -> pa.Table:
    """sig rows -> slim LSH band rows (band_id, band_hash, doc_id, shard),
    fully vectorized: signatures unpack into an (n, bands, rows) cube and
    the band key is an FNV-1a fold over the band's row values (any
    deterministic 64-bit mix satisfies the LSH contract — equal bands
    collide, unequal bands split). The 1 KB signature does NOT ride the
    shuffle (it would inflate the exchange 16x); pairs are verified later
    by joining back to the sig table."""
    ids = _i64(batch["doc_id"])
    n = len(ids)
    cube = _sig_matrix(batch["sig_bin"]).view(np.uint64).reshape(
        n, LSH_BANDS, LSH_ROWS
    )
    h = np.full((n, LSH_BANDS), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(LSH_ROWS):
            h = (h ^ cube[:, :, j]) * _FNV_PRIME
    band_hash = (h % np.uint64(1 << 62)).astype(np.int64).reshape(-1)
    return pa.table(
        {
            "band_id": np.tile(np.arange(LSH_BANDS, dtype=np.int64), n),
            "band_hash": band_hash,
            "doc_id": np.repeat(ids, LSH_BANDS),
            "shard": band_hash % BUCKET_SHARDS,
        }
    )


def _group_bounds(*keys: np.ndarray):
    """Boundaries of equal-key runs in already-lexsorted key columns."""
    n = len(keys[0])
    change = np.zeros(n - 1, dtype=bool) if n > 1 else np.zeros(0, dtype=bool)
    for k in keys:
        change |= np.diff(k) != 0
    cuts = np.flatnonzero(change) + 1
    return np.concatenate(([0], cuts)), np.concatenate((cuts, [n]))


_EMPTY_PAIRS = pa.table(
    {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
)


def bucket_pairs(shard: pa.Table) -> pa.Table:
    """Candidate pairs within one bucket SHARD (many buckets per group —
    the coarse key keeps map_groups call count bounded; buckets above
    BUCKET_CAP truncate deterministically by doc_id order)."""
    if shard.num_rows < 2:
        return _EMPTY_PAIRS
    bid = _i64(shard["band_id"])
    bh = _i64(shard["band_hash"])
    did = _i64(shard["doc_id"])
    order = np.lexsort((did, bh, bid))
    bid, bh, did = bid[order], bh[order], did[order]
    starts, ends = _group_bounds(bid, bh)
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        ids = np.unique(did[s:e])[:BUCKET_CAP]
        if len(ids) < 2:
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return _EMPTY_PAIRS
    return pa.table(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    )


def pair_sig_agreement(batch: pa.Table, threshold_x100: int) -> pa.Table:
    """Join output (doc_a, doc_b, sig_a, sig_b packed) -> per-permutation
    agreement estimate, thresholded."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "est_jaccard_x100": pa.array([], pa.int64()),
            }
        )
    a = _sig_matrix(batch["sig_a"])
    b = _sig_matrix(batch["sig_b"])
    est = (100 * (a == b).mean(axis=1)).astype(np.int64)
    keep = est >= threshold_x100
    return pa.table(
        {
            "doc_a": _i64(batch["doc_a"])[keep],
            "doc_b": _i64(batch["doc_b"])[keep],
            "est_jaccard_x100": est[keep],
        }
    )


def rename_cols(batch: pa.Table, mapping: dict) -> pa.Table:
    """BY-NAME column rename (order-independent), Arrow in/out."""
    return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])


def minhash_dedup(docs, threshold_x100: int = 70):
    """documents Dataset(doc_id, text) -> near-dup pairs
    (doc_a < doc_b, est_jaccard_x100 >= threshold).

    Plan: sig table (materialized once, ~1 KB/doc) -> slim band rows
    (24 B/row) -> bucket groupby -> candidate pairs -> pair dedup ->
    DISTRIBUTED verification: the candidate pairs (sparse) are hash-joined
    against the packed signature table on doc_a then doc_b, and the
    per-permutation agreement is computed inside map_batches. No per-doc
    state ever lands on the driver, so the plan survives a corpus whose
    signature table exceeds driver memory (the round-1 design broadcast a
    ~1 KB/doc dict via ray.put)."""
    from ray.data.aggregate import Count

    from ..io import blocks_for_rows

    sigs = docs.map_batches(
        _rfn("minhash_sig_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
    ).materialize()  # probed by BOTH verify joins and the band explode
    # coalesce before the shuffles ONLY when the band table arrives as many
    # tiny blocks: Ray's sort-based groupby pays a per-block constant, so
    # hundreds of tiny blocks cost more than the data itself — but when the
    # block count is already near target, the repartition is a pure extra
    # all-to-all (~1.5 s fixed at toy scale, measured). Block count derives
    # from the band-row count (LSH_BANDS slim rows per doc, ~24 B each —
    # free off the materialized sig metadata), not a constant: at 100 TB
    # the band table is billions of rows and a fixed repartition(16) would
    # funnel the all-to-all into 16 giant blocks.
    bands = sigs.map_batches(
        _rfn("minhash_band_batch"), batch_format="pyarrow", zero_copy_batch=True
    )
    target = blocks_for_rows(sigs.count() * LSH_BANDS, lo=8)
    if sigs.num_blocks() > 2 * target:
        bands = bands.repartition(target)
    pairs = bands.groupby("shard").map_groups(
        _rfn("bucket_pairs"), batch_format="pyarrow"
    )
    uniq = (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .map_batches(_rfn("drop_n_bands"), batch_format="pyarrow")
    )
    from ..joins import safe_join

    with_a = safe_join(uniq, sigs, on=("doc_a",), right_on=("doc_id",))
    if with_a is None:
        return _empty_pairs_ds("est_jaccard_x100")
    with_a = with_a.map_batches(
        _rfn("rename_cols", mapping={"sig_bin": "sig_a"}), batch_format="pyarrow"
    )
    with_ab = safe_join(with_a, sigs, on=("doc_b",), right_on=("doc_id",))
    if with_ab is None:
        return _empty_pairs_ds("est_jaccard_x100")
    with_ab = with_ab.map_batches(
        _rfn("rename_cols", mapping={"sig_bin": "sig_b"}), batch_format="pyarrow"
    )
    return with_ab.map_batches(
        _rfn("pair_sig_agreement", threshold_x100=threshold_x100),
        batch_format="pyarrow",
    )


def _empty_pairs_ds(score_col: str):
    import pyarrow as _pa
    import ray.data as rd

    return rd.from_arrow(
        _pa.table(
            {
                "doc_a": _pa.array([], _pa.int64()),
                "doc_b": _pa.array([], _pa.int64()),
                score_col: _pa.array([], _pa.int64()),
            }
        )
    )


def drop_n_bands(batch: pa.Table) -> pa.Table:
    return batch.drop_columns(
        [c for c in batch.column_names if c == "n_bands"]
    )


# --- SimHash ----------------------------------------------------------------
def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over unigram token hashes + 16-bit band keys.
    Per-doc loop only for tokenization+vote; the 4-band explode is
    vectorized (repeat/tile), and the int64 shift is the same
    ``sh - 2^63`` value map as before (XOR of the top bit, reinterpreted)."""
    ids = _i64(batch["doc_id"])
    n = len(ids)
    sh_arr = np.zeros(n, dtype=np.uint64)
    for i, text in enumerate(batch["text"].to_pylist()):
        toks = (text or "").split()
        if not toks:
            continue
        hs = np.array([_hash64(t) for t in toks], dtype=np.uint64)
        bits = (
            (hs.reshape(-1, 1) >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & 1
        ).astype(np.int32)
        v = (2 * bits - 1).sum(axis=0)
        sh = np.uint64(0)
        for ix in np.nonzero(v > 0)[0]:
            sh |= np.uint64(1) << np.uint64(ix)
        sh_arr[i] = sh
    sim64 = (sh_arr ^ np.uint64(1 << 63)).view(np.int64)  # == int(sh) - 2^63
    band_id = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
    band_key = (
        (sh_arr.reshape(-1, 1) >> (np.uint64(16) * np.arange(SIMHASH_BANDS, dtype=np.uint64)))
        & np.uint64(0xFFFF)
    ).astype(np.int64).reshape(-1)
    return pa.table(
        {
            "doc_id": np.repeat(ids, SIMHASH_BANDS),
            "simhash": np.repeat(sim64, SIMHASH_BANDS),
            "band_id": band_id,
            "band_key": band_key,
            "shard": (band_id * 65536 + band_key) % BUCKET_SHARDS,
        }
    )


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized uint64 popcount (SWAR bit-trick; numpy uint64 wrap-around
    multiply is the intended semantics) — replaces the per-pair Python
    ``bin(int(v)).count('1')`` loop in the O(bucket^2) verify."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


_EMPTY_HAM = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "hamming": pa.array([], pa.int64()),
    }
)


def simhash_bucket_pairs(shard: pa.Table) -> pa.Table:
    if shard.num_rows < 2:
        return _EMPTY_HAM
    bid = _i64(shard["band_id"])
    bkey = _i64(shard["band_key"])
    did = _i64(shard["doc_id"])
    sh = _i64(shard["simhash"]).view(np.uint64) ^ np.uint64(1 << 63)  # back to raw
    order = np.lexsort((did, bkey, bid))
    bid, bkey, did, sh = bid[order], bkey[order], did[order], sh[order]
    starts, ends = _group_bounds(bid, bkey)
    out_a, out_b, out_h = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        g_ids = did[s:e][:BUCKET_CAP]
        g_sh = sh[s:e][:BUCKET_CAP]
        # all unordered in-bucket pairs in one vectorized popcount (bucket
        # is capped at BUCKET_CAP=64, so the pair matrix is <= 2016 rows)
        ia, ib = np.triu_indices(len(g_ids), k=1)
        ham = popcount64(g_sh[ia] ^ g_sh[ib])
        keep = (ham <= HAMMING_MAX) & (g_ids[ia] != g_ids[ib])
        out_a.append(g_ids[ia[keep]])
        out_b.append(g_ids[ib[keep]])
        out_h.append(ham[keep])
    if not out_a:
        return _EMPTY_HAM
    return pa.table(
        {
            "doc_a": np.concatenate(out_a),
            "doc_b": np.concatenate(out_b),
            "hamming": np.concatenate(out_h),
        }
    )


def simhash_dedup(docs):
    """documents Dataset -> pairs with Hamming(simhash) <= HAMMING_MAX."""
    from ray.data.aggregate import Min

    bands = docs.map_batches(
        _rfn("simhash_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
    )
    pairs = bands.groupby("shard").map_groups(
        _rfn("simhash_bucket_pairs"), batch_format="pyarrow"
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# --- exact n-gram Jaccard via inverted index --------------------------------
def shingle_explode_batch(batch: pa.Table) -> pa.Table:
    ids_out, sh_out = [], []
    for doc_id, text in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        hs = _shingles(text or "")
        if hs.size:
            sh_out.append((hs % np.uint64(1 << 62)).astype(np.int64))
            ids_out.append(np.full(hs.size, doc_id, dtype=np.int64))
    if not ids_out:
        return pa.table(
            {
                "shingle": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int64()),
            }
        )
    shingle = np.concatenate(sh_out)
    return pa.table(
        {
            "shingle": shingle,
            "doc_id": np.concatenate(ids_out),
            "shard": shingle % BUCKET_SHARDS,
        }
    )


_EMPTY_COMMON = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "common": pa.array([], pa.int64()),
    }
)


def shingle_doc_pairs(shard: pa.Table) -> pa.Table:
    """Co-occurrence pairs per shingle within one shard; hot shingles
    (doc freq > cap) dropped entirely — the deterministic frequency cap
    that guards the inverted index against quadratic hot keys."""
    if shard.num_rows < 2:
        return _EMPTY_COMMON
    sh = _i64(shard["shingle"])
    did = _i64(shard["doc_id"])
    order = np.lexsort((did, sh))
    sh, did = sh[order], did[order]
    starts, ends = _group_bounds(sh)
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        if e - s < 2 or e - s > SHINGLE_DOC_FREQ_CAP:
            continue
        ids = np.unique(did[s:e])
        if len(ids) < 2:
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return _EMPTY_COMMON
    doc_a = np.concatenate(out_a)
    return pa.table(
        {
            "doc_a": doc_a,
            "doc_b": np.concatenate(out_b),
            "common": np.ones(len(doc_a), dtype=np.int64),
        }
    )


def _ngram_common_join(docs, size_hint_bytes: int = 0):
    """Shared plumbing of the shingle-overlap family: inverted index ->
    per-shingle pairs -> pair co-count -> per-doc shingle counts joined
    onto both pair sides. Returns the (doc_a, doc_b, common, n_a, n_b)
    Dataset, or None when no pair co-occurs.

    ``size_hint_bytes`` = on-disk bytes of the source corpus (callers stat
    the input; 0 falls back to the parallelism floor): the exploded
    inverted index is ~4x the source text (one 24 B row per ~6 source
    bytes), so its coalesce block count is byte-derived, never a constant.
    """
    from ray.data.aggregate import Sum

    from ..io import blocks_for_bytes

    # the EXPLODED inverted index (one row per shingle occurrence — the
    # biggest intermediate at corpus scale) streams straight into the
    # shard groupby, never materialized; per-doc shingle counts come from
    # a separate cheap map over the docs (re-shingling once more is far
    # cheaper than pinning the exploded table in the object store)
    shingles = docs.map_batches(
        _rfn("shingle_explode_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
    ).repartition(blocks_for_bytes(size_hint_bytes * 4))
    pair_counts = (
        shingles.groupby("shard")
        .map_groups(_rfn("shingle_doc_pairs"), batch_format="pyarrow")
        # coalesce tiny per-shard blocks before the aggregate; the pair
        # stream is sparse (co-occurring low-freq shingles only), ~source
        # bytes at the default cap
        .repartition(blocks_for_bytes(size_hint_bytes))
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("common", alias_name="common"))
    )
    counts = docs.map_batches(
        _rfn("shingle_count_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
    )
    from ..joins import safe_join

    with_a = safe_join(pair_counts, counts, on=("doc_a",), right_on=("doc_id",))
    if with_a is None:
        return None
    with_a = with_a.map_batches(
        _rfn("rename_cols", mapping={"n_shingles": "n_a"}), batch_format="pyarrow"
    )
    with_ab = safe_join(with_a, counts, on=("doc_b",), right_on=("doc_id",))
    if with_ab is None:
        return None
    return with_ab.map_batches(
        _rfn("rename_cols", mapping={"n_shingles": "n_b"}), batch_format="pyarrow"
    )


def ngram_jaccard_dedup(docs, threshold_x100: int = 70, size_hint_bytes: int = 0):
    """Exact shingle-Jaccard pairs >= threshold: common/(n_a+n_b-common)
    over the shared inverted-index plumbing — a DISTRIBUTED join of the
    per-doc shingle-count table onto both pair sides (the round-1 design
    collected the counts driver-side and broadcast a dict; the join keeps
    driver memory O(1) at any corpus size)."""
    with_ab = _ngram_common_join(docs, size_hint_bytes)
    if with_ab is None:
        return _empty_pairs_ds("jaccard_x100")
    return with_ab.map_batches(
        _rfn("jaccard_finalize", threshold_x100=threshold_x100),
        batch_format="pyarrow",
    )


def containment_finalize(batch: pa.Table, threshold_x100: int) -> pa.Table:
    """(doc_a, doc_b, common, n_a, n_b) -> ORDERED containment rows:
    (contained, container, containment_x100) for each direction whose
    100*common // n_contained clears the threshold. Asymmetric by design
    (Broder 1997's containment, not resemblance): a short doc embedded in
    a long one scores ~100 one way and low the other — the case Jaccard
    misses."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_sub": pa.array([], pa.int64()),
                "doc_sup": pa.array([], pa.int64()),
                "containment_x100": pa.array([], pa.int64()),
            }
        )
    a = _i64(batch["doc_a"])
    b = _i64(batch["doc_b"])
    na = _i64(batch["n_a"])
    nb = _i64(batch["n_b"])
    common = _i64(batch["common"])
    c_ab = (100 * common) // np.maximum(na, 1)  # a contained in b
    c_ba = (100 * common) // np.maximum(nb, 1)  # b contained in a
    ka = c_ab >= threshold_x100
    kb = c_ba >= threshold_x100
    return pa.table(
        {
            "doc_sub": np.concatenate([a[ka], b[kb]]),
            "doc_sup": np.concatenate([b[ka], a[kb]]),
            "containment_x100": np.concatenate([c_ab[ka], c_ba[kb]]),
        }
    )


def ngram_containment(docs, threshold_x100: int = 80, size_hint_bytes: int = 0):
    """Asymmetric shingle-containment pairs >= threshold — the
    quote/embedding-document near-dup detector (a doc mostly CONTAINED in
    another is a dup even when Jaccard is low because the container is
    long). Same distributed plumbing and hot-shingle frequency cap as
    ngram_jaccard_dedup; only the finalize differs."""
    with_ab = _ngram_common_join(docs, size_hint_bytes)
    if with_ab is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_sub": pa.array([], pa.int64()),
                    "doc_sup": pa.array([], pa.int64()),
                    "containment_x100": pa.array([], pa.int64()),
                }
            )
        )
    return with_ab.map_batches(
        _rfn("containment_finalize", threshold_x100=threshold_x100),
        batch_format="pyarrow",
    )


def shingle_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_shingles): per-doc distinct-shingle
    counts computed directly from the text (no exploded index needed)."""
    ns = np.array(
        [int(_shingles(t or "").size) for t in batch["text"].to_pylist()],
        dtype=np.int64,
    )
    return pa.table({"doc_id": batch["doc_id"], "n_shingles": ns})


def jaccard_finalize(batch: pa.Table, threshold_x100: int) -> pa.Table:
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_x100": pa.array([], pa.int64()),
            }
        )
    na = _i64(batch["n_a"])
    nb = _i64(batch["n_b"])
    common = _i64(batch["common"])
    j = (100 * common) // np.maximum(na + nb - common, 1)
    keep = j >= threshold_x100
    return pa.table(
        {
            "doc_a": _i64(batch["doc_a"])[keep],
            "doc_b": _i64(batch["doc_b"])[keep],
            "jaccard_x100": j[keep],
        }
    )


def _rfn(attr: str, **kw):
    from ..remote import remote_fn

    return remote_fn("khl_pdf_ocr_ray.stages.dedup", attr, **kw)


def _ident():
    from ..remote import remote_fn

    return remote_fn("khl_pdf_ocr_ray.remote", "identity_batch")


# --- variant corpus for near-dup demos/tests --------------------------------
VARIANT_OFFSET = 1_000_000


def docs_with_variants(sf_dir: str):
    """documents plus a deterministic near-duplicate of every 3rd doc
    (doc_id + VARIANT_OFFSET, one appended token) — planted ground truth
    for the near-dup operators."""
    import os

    import ray.data as rd

    from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean

    path = os.path.join(sf_dir, "documents.parquet")
    docs = (
        read_parquet_clean(path, columns=["doc_id", "text"])
        # single-row-group driver file -> fan out the heavy per-doc maps,
        # block count derived from the file bytes
        .repartition(blocks_for_bytes(input_nbytes(path)))
        .materialize()  # consumed by two branches of the union: read once
    )
    variants = docs.map_batches(
        _rfn("mod3_filter"), batch_format="pyarrow"
    ).map_batches(_rfn("make_variant_batch"), batch_format="pyarrow")
    return docs.union(variants)


def make_variant_batch(batch: pa.Table) -> pa.Table:
    # arrow in / arrow out: union requires homogeneous block types with the
    # arrow blocks coming from read_parquet
    import pyarrow.compute as pc

    return pa.table(
        {
            "doc_id": pc.add(batch["doc_id"], VARIANT_OFFSET),
            "text": pc.binary_join_element_wise(
                pc.fill_null(batch["text"], ""), " near duplicate variant", ""
            ),
        }
    )


def threshold_filter(batch: pa.Table, col: str, lo: int) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.greater_equal(batch[col], lo))


def mod3_filter(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    keep = pc.equal(pc.subtract(batch["doc_id"], pc.multiply(pc.divide(batch["doc_id"], 3), 3)), 0)
    return batch.filter(keep)


# --- connected components over near-dup pairs -------------------------------
def union_find_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """Driver-side union-find over a pair DataFrame — kept as the sequential
    oracle for ``label_propagation_clusters`` (tests assert identical
    output); the production path is the distributed propagation below.

    Returns (doc_id, cluster_id=min member, cluster_size, keep) for every
    doc that appears in at least one pair; ``keep`` marks the cluster
    representative (min doc_id), i.e. the dedup survivor.
    """
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)

    nodes = sorted(parent)
    roots = {n: find(n) for n in nodes}
    sizes: Dict[int, int] = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    return pd.DataFrame(
        {
            "doc_id": nodes,
            "cluster_id": [roots[n] for n in nodes],
            "cluster_size": [sizes[roots[n]] for n in nodes],
            "keep": [roots[n] == n for n in nodes],
        }
    ).astype({"doc_id": "int64", "cluster_id": "int64", "cluster_size": "int64"})


def edges_undirected(batch: pa.Table) -> pa.Table:
    """(doc_a, doc_b) pairs -> both-direction (src, dst) message edges."""
    a, b = _i64(batch["doc_a"]), _i64(batch["doc_b"])
    return pa.table(
        {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
    )


def edge_self_labels(batch: pa.Table) -> pa.Table:
    """Initial labels: every node that appears in an edge, label = itself."""
    nodes = np.unique(
        np.concatenate([_i64(batch["doc_a"]), _i64(batch["doc_b"])])
    )
    return pa.table({"node": nodes, "label": nodes})


def messages_project(batch: pa.Table) -> pa.Table:
    """Join output (src, dst, label) -> (node=dst, label) message rows."""
    return pa.table({"node": batch["dst"], "label": batch["label"]})


def shortcut_project(batch: pa.Table) -> pa.Table:
    """Pointer-jumping join output (src_node, via, label) -> (node, label):
    src_node's new candidate label is its label's label."""
    return pa.table({"node": batch["src_node"], "label": batch["label"]})


CC_BROADCAST_MAX = 1 << 20  # edge tables below this fold driver-side


def _cc_local_clusters(et: pa.Table, max_rounds: int):
    """Driver-side min-label propagation over an under-cap edge table —
    the same fixed point (per-component label minimum) as the
    distributed loop, in vectorized numpy with pointer jumping. The
    union-find dump twin gates the result; a forced-branch test pins
    equivalence with the distributed loop."""
    src = _i64(et["src"])
    dst = _i64(et["dst"])
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    si = np.array([idx[int(s)] for s in src], dtype=np.int64)
    di = np.array([idx[int(d)] for d in dst], dtype=np.int64)
    label = np.arange(len(nodes), dtype=np.int64)
    for _ in range(max_rounds):
        prev = label.copy()
        # edge relax: dst takes min(label[dst], label[src]) (edges are
        # already both-direction)
        np.minimum.at(label, di, label[si])
        # pointer jumping: label <- label[label] until path-compressed
        while True:
            nxt = label[label]
            if (nxt == label).all():
                break
            label = nxt
        if (label == prev).all():
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds"
        )
    cluster_id = nodes[label]
    sizes = np.bincount(label, minlength=len(nodes))[label]
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array(cluster_id, pa.int64()),
            "cluster_size": pa.array(sizes.astype(np.int64), pa.int64()),
            "keep": pa.array(nodes == cluster_id),
        }
    )


def label_propagation_clusters(pairs_ds, max_rounds: int = 64, doubling: bool = False):
    """Distributed connected components: min-label propagation over the
    pair table (no driver-side union-find — the round-1 design collected
    every pair on the driver, which breaks on a duplication-heavy crawl).

    Per round: edges ⋈ labels on src  ->  (dst, label) messages  ->
    union with current labels  ->  groupby node min(label). Labels only
    decrease, so the sum of labels is a monotone convergence witness; the
    fixed point is exactly each node's component minimum (what union-find
    computes). Rounds needed = graph diameter (near-dup clusters are
    shallow; max_rounds is a runaway guard).

    ``doubling=True`` adds a POINTER-JUMPING step per round (label <-
    label[label], a labels-on-labels self join): the effective diameter
    halves every round, so convergence takes O(log d) rounds instead of
    O(d) — the path for long dup CHAINS (boilerplate that mutates a
    little per page). It costs one extra node-keyed join per round, so
    the default stays the plain step: near-dup clusters are overwhelmingly
    shallow (d <= 3) and the plain step converges in fewer total joins
    there. The fixed point is identical (labels stay within the
    component, only decrease, and stabilize only at the component min).

    Returns a Dataset (doc_id, cluster_id, cluster_size, keep) matching
    ``union_find_clusters`` row-for-row.
    """
    from ray.data.aggregate import Count, Min, Sum

    edges = pairs_ds.map_batches(
        _rfn("edges_undirected"), batch_format="pyarrow"
    ).materialize()
    n_edges = edges.count()  # free from materialized metadata
    if 0 < n_edges <= CC_BROADCAST_MAX:
        # the PAIR graph fits the broadcast cap (near-dup pair tables
        # are duplication-cardinality, tiny next to the corpus): fold
        # the propagation driver-side (same fixed point; union-find
        # dump twin + forced-branch test gate it). The loop below is
        # the duplication-heavy-crawl path where pairs are corpus-sized.
        import ray.data as rd

        et = pa.concat_tables(
            [b for b in edges.iter_batches(batch_format="pyarrow") if len(b)]
        )
        return rd.from_arrow(_cc_local_clusters(et, max_rounds))
    # the identity maps normalize the aggregates' blocks to Arrow:
    # union requires homogeneous block types across its inputs
    labels = (
        pairs_ds.map_batches(_rfn("edge_self_labels"), batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .map_batches(_ident(), batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    from ..joins import safe_join

    if labels.count() == 0:
        import pyarrow as _pa
        import ray.data as rd

        return rd.from_arrow(
            _pa.table(
                {
                    "doc_id": _pa.array([], _pa.int64()),
                    "cluster_id": _pa.array([], _pa.int64()),
                    "cluster_size": _pa.array([], _pa.int64()),
                    "keep": _pa.array([], _pa.bool_()),
                }
            )
        )
    from ..joins import partitions_for_rows

    nparts = partitions_for_rows(n_edges)
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # labels non-empty was checked above and edges non-empty follows
        # (labels come from the same pair table): streaming join, width
        # derived once from the materialized edge count
        msgs = safe_join(
            edges, labels, on=("src",), right_on=("node",),
            assume_non_empty=True, num_partitions=nparts,
        ).map_batches(
            _rfn("messages_project"), batch_format="pyarrow"
        )
        merged = labels.union(msgs)
        if doubling:
            # pointer jumping: node's label <- label-of-its-label
            lhs = labels.map_batches(
                _rfn("rename_cols", mapping={"node": "src_node", "label": "via"}),
                batch_format="pyarrow",
            )
            # keyed on VIA (= label values) — same giant-cluster skew
            # class as the counts join: fallback sizing
            jumped = safe_join(lhs, labels, on=("via",), right_on=("node",))
            merged = merged.union(
                jumped.map_batches(_rfn("shortcut_project"), batch_format="pyarrow")
            )
        labels = (
            merged.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(_ident(), batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
        cur = labels.sum("label")  # tiny driver scalar, monotone non-increasing
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    if not converged:
        # exhaustion is NOT convergence: unconverged labels silently split
        # clusters (a dup-chain with diameter > max_rounds would diverge
        # from the union-find oracle) — fail loudly instead
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds; raise max_rounds or "
            "pass doubling=True for O(log diameter) pointer jumping)"
        )
    # attach cluster sizes GIANT-CLUSTER-SAFE: a per-label aggregate Count
    # (combiner-backed, no task ever holds a whole cluster) joined back to
    # the label table — the previous groupby(label).map_groups placed one
    # entire cluster in one task, a memory wall for a pathological
    # all-duplicates crawl where one cluster is ~the corpus
    counts = (
        labels.groupby("label")
        .aggregate(Count(alias_name="cluster_size"))
        .map_batches(
            _rfn("rename_cols", mapping={"label": "cluster_label"}),
            batch_format="pyarrow",
        )
    )
    # keyed on LABEL — cluster-count cardinality with pathological skew
    # (a giant cluster puts every row under one key): keep the
    # materialize-fallback sizing, which collapses to one partition when
    # the counts side is tiny (multi-partition sizing would leave
    # empty-key partitions and trip the Join operator's schema-less
    # empty-block wart). Runs once per call, not per round.
    joined = safe_join(labels, counts, on=("label",), right_on=("cluster_label",))
    return joined.map_batches(_rfn("cluster_rows_project"), batch_format="pyarrow")


def cluster_rows_project(batch: pa.Table) -> pa.Table:
    """Join output (node, label, cluster_size) -> per-doc cluster table."""
    nodes = _i64(batch["node"])
    labs = _i64(batch["label"])
    return pa.table(
        {
            "doc_id": nodes,
            "cluster_id": labs,
            "cluster_size": batch["cluster_size"],
            "keep": nodes == labs,
        }
    )


def minhash_clusters(docs, threshold_x100: int = 70):
    """Full dedup decision: MinHash+LSH pairs -> distributed connected
    components -> per-doc (cluster_id, keep) Dataset, sorted by doc_id
    for a deterministic surface (never collected driver-side — at corpus
    scale the cluster table is big)."""
    pairs = minhash_dedup(docs, threshold_x100)
    return label_propagation_clusters(pairs).sort("doc_id")


# --- cluster-aware survivor selection (keep-best) ------------------------------
def doclen_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (ldoc, len_chars): codepoint length, identical to
    Python len() (the twin's rule)."""
    import pyarrow.compute as pc

    return pa.table(
        {
            "ldoc": batch["doc_id"],
            "len_chars": pc.cast(
                pc.utf8_length(pc.fill_null(batch["text"], "")), pa.int64()
            ),
        }
    )


def keep_best_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-cluster argmax by (len DESC, doc_id ASC): <= 1 row
    per (cluster, block) reaches the shuffle — the combiner form of the
    survivor argmax."""
    if batch.num_rows == 0:
        return batch.select(["cluster_id", "doc_id", "len_chars", "cluster_size"])
    cid = _i64(batch["cluster_id"])
    did = _i64(batch["doc_id"])
    ln = _i64(batch["len_chars"])
    order = np.lexsort((did, -ln, cid))
    cid_s = cid[order]
    _, first = np.unique(cid_s, return_index=True)
    keep = np.sort(order[first])
    return batch.select(["cluster_id", "doc_id", "len_chars", "cluster_size"]).take(
        keep
    )


def keep_best_final(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["len_chars", "doc_id"], ascending=[False, True]).head(1)
    return pd.DataFrame(
        {
            "cluster_id": g["cluster_id"].to_numpy(dtype=np.int64),
            "survivor_id": g["doc_id"].to_numpy(dtype=np.int64),
            "survivor_chars": g["len_chars"].to_numpy(dtype=np.int64),
            "n_members": g["cluster_size"].to_numpy(dtype=np.int64),
        }
    )


def cluster_keep_best(clusters_ds, docs):
    """Quality-aware dedup DECISION: per near-dup cluster, the survivor is
    the LONGEST member (ties to the lowest doc_id) — the keep-best rule a
    production dedup applies instead of keep-lowest-id (the longest copy
    usually carries the least-truncated text). Plan: cluster rows join the
    per-doc lengths, a per-batch argmax combiner (<= 1 row per (cluster,
    block)), then a per-cluster finalize over combiner winners only."""
    lens = docs.map_batches(_rfn("doclen_batch"), batch_format="pyarrow")
    from ..joins import safe_join

    joined = safe_join(clusters_ds, lens, on=("doc_id",), right_on=("ldoc",))
    if joined is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "cluster_id": pa.array([], pa.int64()),
                    "survivor_id": pa.array([], pa.int64()),
                    "survivor_chars": pa.array([], pa.int64()),
                    "n_members": pa.array([], pa.int64()),
                }
            )
        )
    return (
        joined.map_batches(_rfn("keep_best_partial"), batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(_rfn("keep_best_final"), batch_format="pandas")
    )


# --- incremental MinHash dedup against a persisted index ----------------------
def sig_rename_index(batch: pa.Table) -> pa.Table:
    return rename_cols(batch, {"doc_id": "idoc", "sig_bin": "sig_b"})


def band_rename_index(batch: pa.Table) -> pa.Table:
    return rename_cols(
        batch, {"band_id": "iband_id", "band_hash": "iband_hash", "doc_id": "old_doc"}
    )


def cand_project(batch: pa.Table) -> pa.Table:
    return pa.table({"new_doc": batch["doc_id"], "old_doc": batch["old_doc"]})


def drop_count_col2(batch: pa.Table) -> pa.Table:
    return batch.drop_columns([c for c in batch.column_names if c == "_n"])


def ensure_minhash_index(sf_dir: str) -> str:
    """Build (once, cached) the persisted MinHash index of the BASE corpus:

    - ``sigs/``  — (doc_id, sig_bin) packed 128-perm signatures;
    - ``bands/`` — slim (band_id, band_hash, doc_id) rows, parquet
      hive-partitioned by shard.

    This is how a crawl pipeline deduplicates EACH NEW SNAPSHOT against
    everything already ingested without re-signaturing history: the base
    corpus' signatures are computed exactly once, and every later crawl
    joins its own (new, small) band table against the persisted one. The
    cache key folds the source file's size+mtime fingerprint."""
    import os

    from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean
    from ..state.atomic import ensure_published

    path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(path)
    key = hashlib.sha256(
        f"{path}:{st.st_size}:{st.st_mtime_ns}:p{MINHASH_PERMS}b{LSH_BANDS}:v1".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join("/tmp/khlray_cache", f"mhidx_{key}")

    def _build(tmp_dir: str) -> None:
        os.makedirs(tmp_dir, exist_ok=True)
        docs = read_parquet_clean(path, columns=["doc_id", "text"]).repartition(
            blocks_for_bytes(input_nbytes(path))
        )
        sigs = docs.map_batches(
            _rfn("minhash_sig_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=512,
        ).materialize()  # consumed twice: sig sink + band explode
        sigs.write_parquet(os.path.join(tmp_dir, "sigs"))
        sigs.map_batches(
            _rfn("minhash_band_batch"), batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(os.path.join(tmp_dir, "bands"), partition_cols=["shard"])

    return ensure_published(out_dir, _build)


def minhash_dedup_incremental(sf_dir: str, threshold_x100: int = 70):
    """Near-dup pairs of a NEW snapshot against the persisted base index:
    the planted variant docs (doc_id + VARIANT_OFFSET) are the new crawl,
    the original documents table is the already-indexed history.

    Plan: signature the new snapshot only (small) -> its slim band rows
    join the PERSISTED band table on (band_id, band_hash) -> distinct
    (new, old) candidates -> verify by joining the new sigs and the
    persisted sig table, per-permutation agreement >= threshold. History
    is never re-signatured; the exchanges carry band keys and packed
    signatures of candidates only. Returns (doc_id, old_doc,
    est_jaccard_x100) with doc_id = the new snapshot's id."""
    import os

    import ray.data as rd
    from ray.data.aggregate import Count

    from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean
    from ..joins import safe_join
    from ..remote import remote_fn as _remote_fn

    index_dir = ensure_minhash_index(sf_dir)
    path = os.path.join(sf_dir, "documents.parquet")
    nb = input_nbytes(path)

    new_docs = (
        read_parquet_clean(path, columns=["doc_id", "text"])
        .repartition(blocks_for_bytes(nb))
        .map_batches(_rfn("mod3_filter"), batch_format="pyarrow")
        .map_batches(_rfn("make_variant_batch"), batch_format="pyarrow")
    )
    new_sigs = new_docs.map_batches(
        _rfn("minhash_sig_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
    ).materialize()  # probed by the verify join + the band explode
    new_bands = new_sigs.map_batches(
        _rfn("minhash_band_batch"), batch_format="pyarrow", zero_copy_batch=True
    )
    index_bands = rd.read_parquet(
        os.path.join(index_dir, "bands"), columns=["band_id", "band_hash", "doc_id"]
    ).map_batches(_rfn("band_rename_index"), batch_format="pyarrow")

    # both sides structurally non-empty (corpus + its own index)
    cand = safe_join(
        new_bands,
        index_bands,
        on=("band_id", "band_hash"),
        right_on=("iband_id", "iband_hash"),
        assume_non_empty=True,
        left_nbytes=nb,
        right_nbytes=nb,
    ).map_batches(_rfn("cand_project"), batch_format="pyarrow")
    uniq = (
        cand.groupby(["new_doc", "old_doc"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(_rfn("drop_count_col2"), batch_format="pyarrow")
    )

    def _empty():
        return _empty_pairs_ds("est_jaccard_x100").map_batches(
            _rfn("rename_cols", mapping={"doc_a": "doc_id", "doc_b": "old_doc"}),
            batch_format="pyarrow",
        )

    with_new = safe_join(uniq, new_sigs, on=("new_doc",), right_on=("doc_id",))
    if with_new is None:
        return _empty()
    with_new = with_new.map_batches(
        _rfn("rename_cols", mapping={"sig_bin": "sig_a"}), batch_format="pyarrow"
    )
    index_sigs = rd.read_parquet(os.path.join(index_dir, "sigs")).map_batches(
        _rfn("sig_rename_index"), batch_format="pyarrow"
    )
    with_both = safe_join(with_new, index_sigs, on=("old_doc",), right_on=("idoc",))
    if with_both is None:
        return _empty()
    return with_both.map_batches(
        _rfn("rename_cols", mapping={"new_doc": "doc_a", "old_doc": "doc_b"}),
        batch_format="pyarrow",
    ).map_batches(
        _rfn("pair_sig_agreement", threshold_x100=threshold_x100),
        batch_format="pyarrow",
    ).map_batches(
        _rfn("rename_cols", mapping={"doc_a": "doc_id", "doc_b": "old_doc"}),
        batch_format="pyarrow",
    )


# --- Edit-distance (fuzzy prefix) dedup --------------------------------------
FUZZY_PREFIX = 40       # compare the first N characters of each doc
FUZZY_MAXDIST = 5       # Levenshtein threshold for a candidate pair
FUZZY_LEN_BUCKET = 64   # blocking: pairs must share (lang, n_chars bucket)


def _pad_codes(strs: List[str], width: int):
    """Strings -> (codes (P, width) int32 zero-padded, lengths int64)."""
    codes = np.zeros((len(strs), width), dtype=np.int32)
    lens = np.empty(len(strs), dtype=np.int64)
    for i, s in enumerate(strs):
        s = s[:width]
        lens[i] = len(s)
        if s:
            codes[i, : len(s)] = np.fromiter(map(ord, s), dtype=np.int32, count=len(s))
    return codes, lens


_LEV_INF = 3 * FUZZY_PREFIX  # > any true distance; int16-safe under +1s


def levenshtein_pairs(
    a_codes: np.ndarray,
    a_lens: np.ndarray,
    b_codes: np.ndarray,
    b_lens: np.ndarray,
    max_dist: int | None = None,
) -> np.ndarray:
    """Vectorized-over-pairs BANDED Levenshtein DP.

    Every DP step is a numpy op over ALL P pairs at once, on TRANSPOSED
    (W, P) layouts so each row access is contiguous. With ``max_dist=k``
    only the |i-j| <= k diagonal band is computed (any alignment costing
    <= k stays inside it; cells outside count as +inf), so the work is
    W*(2k+1) vector steps instead of W^2 — results are exact wherever
    the true distance <= k and reported as >= _LEV_INF-ish values (> k)
    otherwise, which is all a thresholded dedup consumes. With
    ``max_dist=None`` the band covers the full table (exact everywhere).
    Matches single-character-edit (codepoint) semantics, i.e. DuckDB's
    ``levenshtein`` on ASCII/BMP text."""
    P, W = a_codes.shape
    k = W if max_dist is None else int(max_dist)
    at = np.ascontiguousarray(a_codes.T)
    bt = np.ascontiguousarray(b_codes.T)
    out = np.full(P, _LEV_INF, dtype=np.int64)
    done0 = a_lens == 0
    out[done0] = b_lens[done0]
    prev = np.full((W + 1, P), _LEV_INF, dtype=np.int16)
    for j in range(0, min(k, W) + 1):
        prev[j] = j
    cur = np.empty_like(prev)
    for i in range(1, W + 1):
        cur.fill(_LEV_INF)
        if i <= k:
            cur[0] = i
        ai = at[i - 1]
        for j in range(max(1, i - k), min(W, i + k) + 1):
            sub = prev[j - 1] + (ai != bt[j - 1]).astype(np.int16)
            np.minimum(sub, prev[j] + np.int16(1), out=sub)
            np.minimum(sub, cur[j - 1] + np.int16(1), out=sub)
            cur[j] = sub
        hit = a_lens == i
        if hit.any():
            idx = np.flatnonzero(hit)
            out[idx] = cur[b_lens[idx], idx]
        prev, cur = cur, prev
    return np.minimum(out, _LEV_INF)


def fuzzy_block_pairs(
    g: pd.DataFrame, prefix_len: int = FUZZY_PREFIX, max_dist: int = FUZZY_MAXDIST
) -> pd.DataFrame:
    """One (lang, length-bucket) block: all doc_a < doc_b pairs whose
    prefix edit distance is within max_dist. Quadratic INSIDE the block
    only — the blocking key bounds group size, exactly like the LSH
    bucket cap bounds minhash's pair generation (here uncapped because
    the oracle join must see the identical candidate set)."""
    order = np.argsort(g["doc_id"].to_numpy())
    ids = g["doc_id"].to_numpy()[order]
    prefs = [str(t)[:prefix_len] for t in g["text"].fillna("").iloc[order]]
    n = len(ids)
    if n < 2:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="int64"),
            }
        )
    codes, lens = _pad_codes(prefs, prefix_len)
    ia, ib = np.triu_indices(n, k=1)
    # length-difference prefilter: |la - lb| is a Levenshtein lower bound
    near = np.abs(lens[ia] - lens[ib]) <= max_dist
    ia, ib = ia[near], ib[near]
    d = levenshtein_pairs(codes[ia], lens[ia], codes[ib], lens[ib], max_dist=max_dist)
    keep = d <= max_dist
    return pd.DataFrame(
        {
            "doc_a": ids[ia][keep].astype("int64"),
            "doc_b": ids[ib][keep].astype("int64"),
            "dist": d[keep],
        }
    )
