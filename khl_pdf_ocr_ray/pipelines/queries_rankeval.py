"""NDCG@10 ranking evaluation per source (search / reranker eval).

The retrieval-eval primitive: treat each source as a query group, rank
its documents by a score (here token count — ``len(text.split(' '))``,
the corpus tokenization convention), grade relevance from an external
judgment table (qrels; here the deterministic stand-in rel =
(doc_id * 2654435761 mod 2^32) >> 30, the top two bits of the Knuth
multiplicative hash, grades 0..3 — independent of both the ranker AND
the source grouping, so the metric actually discriminates: the
synthetic corpus' length signals are all mutually correlated, and
doc_id's low bits are the source id, either of which would score a
degenerate constant everywhere — the planted-signal convention), and
compute NDCG@10 with the standard exponential gain in exact fixed
point:

  gain(rel) = 2^rel - 1                      in {0, 1, 3, 7}
  W_i       = round(2^20 / log2(i + 1))      i = 1..10 (module constants
                                             shared with the SQL oracle)
  DCG_fx    = sum_i gain(rel at score-rank i) * W_i   (ties: doc_id ASC)
  IDCG_fx   = sum_i gain(rel at rel-rank i)   * W_i   (ties: doc_id ASC)
  ndcg_milli = (1000 * DCG_fx) // IDCG_fx    (0 when IDCG_fx = 0)

Output: one row per source (source, n_docs, dcg_fx, idcg_fx, ndcg_milli).

Plan / 100 TB notes: a map-only scoring pass emits slim
(source, doc_id, score, rel) rows (text never shuffles); a per-batch
per-source top-10 SUPERSET combiner (vectorized lexsort + run filter,
the top_k_per_group pattern) keeps <= 20 rows per (source, block) — 10
under each ordering; the driver re-takes the true top-10 per ordering
and folds |sources| x 20 rows in exact Python ints (bounded-pull
class: query groups are vocabulary-sized next to the corpus).

Oracle: static SQL — two ROW_NUMBER windows + the same CASE-table
gains/weights.

Reference analogue: /root/reference/app.py has no ranking surface;
brief scope (search-evaluation operators over documents).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..remote import remote_fn

_QR = "khl_pdf_ocr_ray.pipelines.queries_rankeval"

NDCG_K = 10
# external-qrels stand-in: top 2 bits of the 32-bit Knuth multiplicative
# hash of doc_id (grades 0..3, decorrelated from score AND source)
REL_HASH = 2654435761
REL_M32 = 1 << 32
REL_SHIFT = 1 << 30
FX = 1 << 20
# W_i = round(2^20 / log2(i+1)); round() on float literals is
# deterministic — the SQL oracle interpolates these same integers
NDCG_W = {
    i: int(round(FX / math.log2(i + 1))) for i in range(1, NDCG_K + 1)
}
_GAIN = {0: 0, 1: 1, 2: 3, 3: 7}


def ndcg_score_rel(batch: pa.Table) -> pa.Table:
    """documents batch -> slim (source, doc_id, score, rel) rows."""
    text = pc.fill_null(batch["text"], "")
    score = pc.list_value_length(pc.split_pattern(text, " ")).cast(
        pa.int64()
    )
    doc = batch["doc_id"].cast(pa.int64())
    # uint64 wraparound == mod 2^64, so (doc * H) % 2^32 is exact at any
    # doc_id (the SQL twin widens to HUGEINT for the same guarantee)
    d = doc.to_numpy(zero_copy_only=False).astype(np.uint64)
    rel = ((d * np.uint64(REL_HASH)) % np.uint64(REL_M32)) // np.uint64(
        REL_SHIFT
    )
    return pa.table(
        {
            "source": batch["source"],
            "doc_id": doc,
            "score": score,
            "rel": pa.array(rel.astype(np.int64), pa.int64()),
        }
    )


def _topk_runs(scode: np.ndarray, order: np.ndarray, k: int) -> np.ndarray:
    """Positions (into ``order``) of the first k entries of every scode
    run; ``order`` must be sorted by scode first."""
    s = scode[order]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    rank = np.arange(len(s)) - np.repeat(starts, np.diff(np.r_[starts, len(s)]))
    return order[rank < k]


def ndcg_topk_partial(batch: pa.Table) -> pa.Table:
    """(source, doc_id, score, rel) rows -> per-source top-10 supersets
    under BOTH orderings, tagged kind 0 (by score) / 1 (by rel)."""
    src = batch["source"]
    enc = pc.dictionary_encode(
        src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    )
    scode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sources = enc.dictionary.to_pylist()
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    score = batch["score"].to_numpy(zero_copy_only=False).astype(np.int64)
    rel = batch["rel"].to_numpy(zero_copy_only=False).astype(np.int64)
    by_score = np.lexsort((doc, -score, scode))
    by_rel = np.lexsort((doc, -rel, scode))
    k0 = _topk_runs(scode, by_score, NDCG_K)
    k1 = _topk_runs(scode, by_rel, NDCG_K)
    idx = np.concatenate([k0, k1])
    kind = np.concatenate(
        [np.zeros(len(k0), np.int64), np.ones(len(k1), np.int64)]
    )
    return pa.table(
        {
            "source": pa.array(
                [sources[int(c)] for c in scode[idx]], pa.string()
            ),
            "kind": pa.array(kind, pa.int64()),
            "doc_id": pa.array(doc[idx], pa.int64()),
            "score": pa.array(score[idx], pa.int64()),
            "rel": pa.array(rel[idx], pa.int64()),
        }
    )


def ndcg_finalize(cells: pd.DataFrame, n_docs: dict) -> pd.DataFrame:
    """Superset rows -> per-source NDCG table, exact Python ints."""
    out = {"source": [], "n_docs": [], "dcg_fx": [], "idcg_fx": [],
           "ndcg_milli": []}
    for s in sorted(n_docs):
        g = cells[cells["source"] == s]
        top = g[g["kind"] == 0].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).drop_duplicates("doc_id").head(NDCG_K)
        ideal = g[g["kind"] == 1].sort_values(
            ["rel", "doc_id"], ascending=[False, True]
        ).drop_duplicates("doc_id").head(NDCG_K)
        dcg = sum(
            _GAIN[int(r)] * NDCG_W[i + 1]
            for i, r in enumerate(top["rel"].tolist())
        )
        idcg = sum(
            _GAIN[int(r)] * NDCG_W[i + 1]
            for i, r in enumerate(ideal["rel"].tolist())
        )
        out["source"].append(s)
        out["n_docs"].append(int(n_docs[s]))
        out["dcg_fx"].append(dcg)
        out["idcg_fx"].append(idcg)
        out["ndcg_milli"].append((1000 * dcg) // idcg if idcg else 0)
    return pd.DataFrame(
        {
            "source": out["source"],
            "n_docs": np.array(out["n_docs"], dtype=np.int64),
            "dcg_fx": np.array(out["dcg_fx"], dtype=np.int64),
            "idcg_fx": np.array(out["idcg_fx"], dtype=np.int64),
            "ndcg_milli": np.array(out["ndcg_milli"], dtype=np.int64),
        }
    )


def q_ndcg_eval(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, dcg_fx, idcg_fx, ndcg_milli). See docstring."""
    from ray.data.aggregate import Count

    from .queries import _t

    scored = _t(sf_dir, "documents", ["doc_id", "source", "text"]).map_batches(
        remote_fn(_QR, "ndcg_score_rel"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # reused twice (counts + top-k); slim int rows only
    counts = (
        scored.groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()  # |sources| rows
    )
    n_docs = {
        r.source: int(r.n_docs) for r in counts.itertuples()
    }
    cells = scored.map_batches(
        remote_fn(_QR, "ndcg_topk_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # <= |sources| x blocks x 2K rows — bounded-pull
    return ndcg_finalize(cells, n_docs)


_W_CASE = " ".join(f"WHEN {i} THEN {NDCG_W[i]}" for i in NDCG_W)
_G_CASE = " ".join(f"WHEN {r} THEN {g}" for r, g in _GAIN.items())

SQL_NDCG_EVAL = f"""
WITH d AS (
  SELECT source, doc_id,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
           AS score,
         CAST(((CAST(doc_id AS HUGEINT) * {REL_HASH}) % {REL_M32})
              // {REL_SHIFT} AS BIGINT) AS rel
  FROM documents),
ranked AS (
  SELECT source, rel,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id ASC) AS r
  FROM d),
ideal AS (
  SELECT source, rel,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY rel DESC, doc_id ASC) AS r
  FROM d),
dcg AS (
  SELECT source,
         CAST(sum((CASE rel {_G_CASE} END)
                  * (CASE r {_W_CASE} END)) AS BIGINT) AS dcg_fx
  FROM ranked WHERE r <= {NDCG_K} GROUP BY source),
idcg AS (
  SELECT source,
         CAST(sum((CASE rel {_G_CASE} END)
                  * (CASE r {_W_CASE} END)) AS BIGINT) AS idcg_fx
  FROM ideal WHERE r <= {NDCG_K} GROUP BY source),
cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM d GROUP BY source)
SELECT cnt.source, cnt.n_docs,
       coalesce(dcg.dcg_fx, 0) AS dcg_fx,
       coalesce(idcg.idcg_fx, 0) AS idcg_fx,
       CAST(CASE WHEN coalesce(idcg.idcg_fx, 0) = 0 THEN 0
            ELSE (1000 * dcg.dcg_fx) // idcg.idcg_fx
            END AS BIGINT) AS ndcg_milli
FROM cnt
LEFT JOIN dcg USING (source) LEFT JOIN idcg USING (source)
"""

RANKEVAL_QUERIES = {"ndcg_eval": q_ndcg_eval}
RANKEVAL_ORACLES = {"ndcg_eval": SQL_NDCG_EVAL}
