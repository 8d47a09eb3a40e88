"""Distributed cardinality sketch: HyperLogLog over a key column.

The brief's "novel sketch" slot (custom operators list): estimate the
number of distinct keys in one pass with O(m) state, where exact
``distinct`` would shuffle every key. The register merge is a per-register
MAX — commutative, associative and order-independent — so the distributed
result is bit-identical to a sequential pass regardless of block layout,
which is what lets the driver hash-check it against a sequential-twin dump
(state/oracle_dump_near.py).

Design (Flajolet et al., HyperLogLog 2007, public algorithm):
- hash: splitmix64 finalizer (deterministic, no seed state);
- p = 12 -> m = 4096 registers (~1.6% relative error);
- rank arithmetic is PURE INTEGER (vectorized bit-length ladder), no
  float log2 — float clz misranks values near powers of two, which would
  break the dump-twin bit-identity;
- the estimate applies the standard bias/small-range corrections in
  float64; both the distributed and sequential paths call THIS function,
  so the float expression is shared and cannot drift.

100 TB plan: per-batch partial registers (a batch emits at most m rows),
one m-row-bounded shuffle (groupby register, Max), and a 4096-row driver
merge. Equivalent to the combiner->tiny-groupby pattern used by the
aggregate queries; never moves the key column itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12
HLL_M = 1 << HLL_P


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 finalizer)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bitlen64(w: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length for uint64 (no float anywhere)."""
    v = w.copy()
    n = np.zeros(w.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        n += np.where(big, s, 0)
        v = np.where(big, v >> np.uint64(s), v)
    return n + (v == 1)


def hll_partial(keys: np.ndarray) -> pd.DataFrame:
    """Keys (int64) -> sparse (register, rank) partial: per-register max
    rank seen in this batch. At most HLL_M rows leave the batch."""
    if len(keys) == 0:
        return pd.DataFrame({"register": [], "rank": []}).astype(
            {"register": "int64", "rank": "int64"}
        )
    h = splitmix64(keys.astype(np.uint64))
    reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rank = (64 - HLL_P + 1) - _bitlen64(w)  # w == 0 -> max rank, exact
    df = pd.DataFrame({"register": reg, "rank": rank})
    return df.groupby("register", as_index=False)["rank"].max()


def hll_estimate(registers: pd.DataFrame) -> int:
    """(register, rank) max-merged table -> rounded cardinality estimate.

    Shared by the distributed query and the sequential dump twin — the
    float64 expression is identical on both sides by construction."""
    m = HLL_M
    ranks = np.zeros(m, dtype=np.int64)
    if len(registers):
        ranks[registers["register"].to_numpy()] = registers["rank"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -ranks.astype(np.float64)))
    zeros = int(np.sum(ranks == 0))
    if e <= 2.5 * m and zeros > 0:  # linear-counting small-range correction
        e = m * np.log(m / float(zeros))
    return int(np.floor(e + 0.5))


def hll_partial_batch(batch: pa.Table, key: str) -> pa.Table:
    """map_batches body: one sparse register partial per batch."""
    keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
    df = hll_partial(keys)
    return pa.table(
        {
            "register": pa.array(df["register"].to_numpy(), pa.int64()),
            "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
        }
    )


def hll_sequential(keys: np.ndarray) -> pd.DataFrame:
    """Sequential twin: the whole key column in one partial (identical to
    any max-merge of batch partials, since max is order-independent)."""
    return hll_partial(keys)


# --- count-min sketch (heavy hitters) ---------------------------------------
# Cormode & Muthukrishnan 2005, public algorithm. Cell-wise ADDITION is the
# merge, so like the HLL registers it is commutative/associative/order-
# independent: the distributed estimate is bit-identical to a sequential
# pass. Heavy-hitter candidates: the consumer (q_bigram_topk_cms,
# queries_corpus.py) enumerates the DISTINCT key set from its count
# combiner and probes every key against the broadcast sketch — exact
# candidate coverage at the cost of a distinct-key aggregate. Per-batch
# local top-k unions (a smaller candidate superset) are the documented
# alternative when even the distinct-key table is too wide.

CMS_D = 4           # hash rows
CMS_W = 1 << 14     # 16384 counters per row
_CMS_SEEDS = np.array([0x243F6A88, 0x85A308D3, 0x13198A2E, 0x03707344], dtype=np.uint64)


def _cms_cols(hashes: np.ndarray) -> np.ndarray:
    """(n,) uint64 key hashes -> (d, n) int64 column indexes."""
    with np.errstate(over="ignore"):
        mixed = hashes[None, :] * np.uint64(0x9E3779B97F4A7C15) + _CMS_SEEDS[:, None]
        mixed = mixed ^ (mixed >> np.uint64(29))
        mixed = mixed * np.uint64(0xBF58476D1CE4E5B9)
        mixed = mixed ^ (mixed >> np.uint64(32))
    return (mixed % np.uint64(CMS_W)).astype(np.int64)


def _hash_str64(values) -> np.ndarray:
    """Deterministic 64-bit string hash (FNV-1a). Plain Python ints with
    an explicit 64-bit mask — several times faster per byte than numpy
    uint64 scalar ops (no per-op dispatch/errstate), SAME values, and the
    sequential twin runs this identical function."""
    mask = 0xFFFFFFFFFFFFFFFF
    out = np.empty(len(values), dtype=np.uint64)
    for i, s in enumerate(values):
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & mask
        out[i] = h
    return out


def cms_partial(keys, counts: np.ndarray) -> pd.DataFrame:
    """(string keys, int64 counts) -> sparse (row, col, n) cell increments.
    At most d x distinct-cells rows leave the batch."""
    if len(keys) == 0:
        return pd.DataFrame({"row": [], "col": [], "n": []}).astype(
            {"row": "int64", "col": "int64", "n": "int64"}
        )
    cols = _cms_cols(_hash_str64(keys))  # (d, n)
    frames = []
    for r in range(CMS_D):
        df = pd.DataFrame({"col": cols[r], "n": counts})
        g = df.groupby("col", as_index=False)["n"].sum()
        g.insert(0, "row", np.int64(r))
        frames.append(g)
    return pd.concat(frames, ignore_index=True).astype(
        {"row": "int64", "col": "int64", "n": "int64"}
    )


def cms_query(cells: pd.DataFrame, keys) -> np.ndarray:
    """Merged (row, col, n) cells + string keys -> estimated counts
    (min over the d rows)."""
    table = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(cells):
        table[cells["row"].to_numpy(), cells["col"].to_numpy()] = cells["n"].to_numpy()
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    cols = _cms_cols(_hash_str64(keys))  # (d, n)
    ests = np.stack([table[r, cols[r]] for r in range(CMS_D)])
    return ests.min(axis=0)
