"""Rendezvous-hashing shard assignment and resize-movement accounting.

``shard_resize_moves``: assign every document to a shard by
highest-random-weight (rendezvous) hashing (Thaler & Ravishankar 1996)
at K_OLD and K_OLD+1 shards, and emit the (old_shard, new_shard,
n_docs) transition matrix — the report that justifies growing a
partitioned output in place: HRW guarantees a key's argmax changes
ONLY when the new shard wins, so every off-diagonal cell must land in
new_shard == K_OLD and the moved fraction concentrates near
1/(K_OLD+1). A resumable 100 TB layout keyed this way reshards by
copying ~1/(K+1) of the data instead of rewriting everything
(consistent-hashing movement bound).

Exactness: the per-(doc, shard) weight is an integer 32-bit
multiply/xor-shift mix — numpy uint64 wraparound and DuckDB HUGEINT
modular arithmetic produce the SAME value bit-for-bit (products are
taken mod 2^64 on the numpy side, and 2^32 | 2^64 makes the final
mod-2^32 agree); ties break to the smallest shard id on both sides
(np.argmax first-max == row_number ORDER BY w DESC, shard ASC).

Plan / 100 TB notes: map-only — each batch computes K_OLD+1 weight
vectors vectorized and two argmaxes, then folds into <= K_OLD *
(K_OLD + 1) transition cells map-side; the only exchange is that
cell-cardinality Sum. The oracle pays doc x shard rows; the engine
never does.

Reference analogue: /root/reference/app.py has no layout surface;
brief scope (partitioning / resumable-output design evidence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QR = "khl_pdf_ocr_ray.pipelines.queries_hrw"

K_OLD = 8
K_NEW = K_OLD + 1
HRW_A = 2654435761  # Knuth multiplicative constant
HRW_B = 40503
_M32 = 0xFFFFFFFF


def hrw_weights(doc_id: np.ndarray, shard: int) -> np.ndarray:
    """Vectorized 32-bit HRW weight for one shard (uint64 wraparound)."""
    d = doc_id.astype(np.uint64)
    h = (d * np.uint64(HRW_A) + np.uint64((shard + 1) * HRW_B)) & np.uint64(_M32)
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(HRW_A)) & np.uint64(_M32)
    h ^= h >> np.uint64(13)
    return h


def resize_cells(batch: pa.Table) -> pa.Table:
    """documents batch -> (old_shard, new_shard, n_docs) cell partials."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = np.stack([hrw_weights(d, s) for s in range(K_NEW)])  # (K_NEW, n)
    old = np.argmax(w[:K_OLD], axis=0).astype(np.int64)  # first max = min s
    new = np.argmax(w, axis=0).astype(np.int64)
    t = pa.table(
        {
            "old_shard": pa.array(old, pa.int64()),
            "new_shard": pa.array(new, pa.int64()),
        }
    )
    g = t.group_by(["old_shard", "new_shard"]).aggregate([([], "count_all")])
    g = select_rename(
        g, old_shard="old_shard", new_shard="new_shard", n_docs="count_all"
    )
    return g.set_column(2, "n_docs", g["n_docs"].cast(pa.int64()))


def q_shard_resize_moves(sf_dir: str) -> "object":
    """(old_shard, new_shard, n_docs) transition matrix, K_OLD -> K_NEW."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QR, "resize_cells"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["old_shard", "new_shard"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


SQL_SHARD_RESIZE_MOVES = f"""
WITH sh AS (SELECT unnest(generate_series(0, {K_NEW - 1})) AS shard),
h1 AS (
  SELECT doc_id, shard,
         CAST((CAST(doc_id AS HUGEINT) * {HRW_A}
               + (shard + 1) * {HRW_B}) % 4294967296 AS BIGINT) AS h
  FROM documents, sh),
h2 AS (SELECT doc_id, shard, xor(h, h // 65536) AS h FROM h1),
h3 AS (
  SELECT doc_id, shard,
         CAST((CAST(h AS HUGEINT) * {HRW_A}) % 4294967296 AS BIGINT) AS h
  FROM h2),
h4 AS (SELECT doc_id, shard, xor(h, h // 8192) AS w FROM h3),
old AS (
  SELECT doc_id, shard AS old_shard FROM (
    SELECT doc_id, shard, row_number() OVER (
      PARTITION BY doc_id ORDER BY w DESC, shard ASC) AS rn
    FROM h4 WHERE shard < {K_OLD}) WHERE rn = 1),
nw AS (
  SELECT doc_id, shard AS new_shard FROM (
    SELECT doc_id, shard, row_number() OVER (
      PARTITION BY doc_id ORDER BY w DESC, shard ASC) AS rn
    FROM h4) WHERE rn = 1)
SELECT o.old_shard, n.new_shard, CAST(count(*) AS BIGINT) AS n_docs
FROM old o JOIN nw n USING (doc_id)
GROUP BY 1, 2
"""

HRW_QUERIES = {"shard_resize_moves": q_shard_resize_moves}
HRW_ORACLES = {"shard_resize_moves": SQL_SHARD_RESIZE_MOVES}
