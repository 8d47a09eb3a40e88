"""Shard source-mix entropy: shuffle-quality audit for training shards.

``shard_mix_entropy``: for each deterministic training shard (the
``shuffle_shards`` hash assignment, queries_eval.py), the Shannon
entropy of its SOURCE distribution in the repo's fixed-point log2 form —
the audit that catches a bad shard shuffle (a shard dominated by one
source trains a skewed step; a well-mixed shuffle gives every shard
near-corpus entropy). Output per shard: doc count, distinct sources and
``ent_fx = sum_s floor(n_s * (log2(n) - log2(n_s)) * 2^20 + 0.5)``
(the char_entropy convention: floor PER TERM, integer sum — no float
accumulation order anywhere, queries_corpus.py:1127).

Plan / 100 TB notes: map-side (shard, source, n) count combiners + one
Sum exchange bounded by shards x sources rows; the entropy fold runs
driver-side over that bounded rollup (shards and sources are config-
scale, never data-scale). Documents leave the scan only as count
partials.

Oracle: static SQL — identical per-term floor(log2...) arithmetic over
the same hash assignment (DuckDB's log2 == IEEE libm, the proven
char_entropy precedent).

Reference analogue: none in /root/reference/app.py; brief scope
(training-shard preparation diagnostics).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QS = "khl_pdf_ocr_ray.pipelines.queries_shardmix"

MIX_SCALE = 1 << 20  # shared fixed-point log2 radix


def shard_source_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (shard_id, source, n) count partials."""
    from .queries_eval import SHARD_K, SHARD_MOD, SHARD_PACK
    from .queries_window import RESAMPLE_MULT

    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (doc_id >= 0).all() and (doc_id < SHARD_PACK).all()
    pos_h = ((doc_id % 2147483647) * RESAMPLE_MULT) % SHARD_MOD
    t = pa.table(
        {
            "shard_id": pa.array(pos_h % SHARD_K, pa.int64()),
            "source": batch["source"],
            "n": pa.array(np.ones(len(doc_id), dtype=np.int64)),
        }
    )
    g = t.group_by(["shard_id", "source"]).aggregate([("n", "sum")])
    return select_rename(g, shard_id="shard_id", source="source", n="n_sum")


def entropy_fold(rollup: pd.DataFrame) -> pd.DataFrame:
    """(shard_id, source, n) rollup -> (shard_id, n_docs, n_sources,
    ent_fx). Bounded driver fold (shards x sources rows)."""
    out = {"shard_id": [], "n_docs": [], "n_sources": [], "ent_fx": []}
    for sid, g in rollup.groupby("shard_id"):
        ns = g["n"].astype(int)
        n = int(ns.sum())
        ent = sum(
            int(math.floor(v * (math.log2(n) - math.log2(v)) * MIX_SCALE + 0.5))
            for v in ns
        )
        out["shard_id"].append(int(sid))
        out["n_docs"].append(n)
        out["n_sources"].append(int(len(g)))
        out["ent_fx"].append(ent)
    return pd.DataFrame(
        {k: pd.Series(v, dtype="int64") for k, v in out.items()}
    )


def q_shard_mix_entropy(sf_dir: str) -> pd.DataFrame:
    """(shard_id, n_docs, n_sources, ent_fx)."""
    from ray.data.aggregate import Sum

    from .queries import _t

    rollup = (
        _t(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(
            remote_fn(_QS, "shard_source_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["shard_id", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: shards x sources rows
    )
    return entropy_fold(rollup)


def _sql() -> str:
    from .queries_eval import SHARD_K, SHARD_MOD
    from .queries_window import RESAMPLE_MULT

    return f"""
WITH h AS (
  SELECT source,
         (((doc_id % 2147483647) * {RESAMPLE_MULT}) % {SHARD_MOD})
           % {SHARD_K} AS shard_id
  FROM documents),
c AS (SELECT shard_id, source, count(*) AS n_s FROM h GROUP BY 1, 2),
t AS (SELECT shard_id, sum(n_s) AS n FROM c GROUP BY 1)
SELECT c.shard_id,
       CAST(t.n AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_sources,
       CAST(sum(CAST(floor(n_s * (log2(t.n) - log2(n_s)) * {MIX_SCALE}
                           + 0.5) AS BIGINT)) AS BIGINT) AS ent_fx
FROM c JOIN t ON t.shard_id = c.shard_id
GROUP BY c.shard_id, t.n
"""


SHARDMIX_QUERIES = {"shard_mix_entropy": q_shard_mix_entropy}
SHARDMIX_ORACLES = {"shard_mix_entropy": _sql()}
