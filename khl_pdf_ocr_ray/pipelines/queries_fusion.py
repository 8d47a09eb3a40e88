"""Reciprocal-rank fusion of two document rankings (Cormack 2009).

The standard way a retrieval/curation stack combines heterogeneous
rankers (BM25 + dense KNN, quality + freshness): each system
contributes 1/(K + rank); the fused score is the sum. In exact integer
fixed point:

    rrf_fx = RRF_SCALE // (RRF_K + rank_a) + RRF_SCALE // (RRF_K + rank_b)

(one floor division per ranker — identical operands on both engines).
The two demonstration rankers are fully relational so the oracle is
static SQL: rank by chars (n_chars DESC, doc_id) and rank by tokens
(split(' ') count DESC, doc_id) — the fusion machinery is ranker-
agnostic; swapping in bm25_topk / knn scores is a column substitution.

Plan / 100 TB notes: each global ranking is ONE distributed sort + the
run-tagged rank machinery of queries_eval._global_rank (O(runs) driver
state, never a giant group); the two ranks are computed back-to-back on
the same flow (no join — the second rank rides the first's output);
the fused top-K is a sort + limit. Corpus text is dropped after the
one map that counts tokens.

Reference analogue: /root/reference/app.py has no retrieval surface;
brief scope (similarity-search / ranking operators).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..remote import remote_fn

_QU = "khl_pdf_ocr_ray.pipelines.queries_fusion"

RRF_K = 60
RRF_SCALE = 1 << 20
FUSE_TOPK = 100
LEN_CAP = 1 << 40  # descending sort via CAP - x; asserted per batch


def fuse_keys_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, neg_len, neg_tok, _const); text is
    dropped here, nothing corpus-sized moves again."""
    text = pc.fill_null(batch["text"], "")
    n_words = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (n_chars >= 0).all() and (n_chars < LEN_CAP).all()
    assert (n_words < LEN_CAP).all()
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "neg_len": pa.array(LEN_CAP - n_chars, pa.int64()),
            "neg_tok": pa.array(LEN_CAP - n_words, pa.int64()),
            "_const": pa.array(["x"] * len(batch), pa.string()),
        }
    )


def rrf_score_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, rank_len, rank_tok) -> + rrf_fx and the descending sort
    key (integer fixed point; one floor division per ranker)."""
    rl = batch["rank_len"].to_numpy(zero_copy_only=False).astype(np.int64)
    rt = batch["rank_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    fx = RRF_SCALE // (RRF_K + rl) + RRF_SCALE // (RRF_K + rt)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "rank_len": pa.array(rl, pa.int64()),
            "rank_tok": pa.array(rt, pa.int64()),
            "rrf_fx": pa.array(fx, pa.int64()),
            "neg_fx": pa.array(2 * RRF_SCALE - fx, pa.int64()),
        }
    )


def rrf_project(batch: pa.Table) -> pa.Table:
    return batch.select(["doc_id", "rank_len", "rank_tok", "rrf_fx"])


def q_rrf_fusion(sf_dir: str) -> rd.Dataset:
    """Fused top-FUSE_TOPK: (doc_id, rank_len, rank_tok, rrf_fx). See
    module docstring."""
    from .queries import _t
    from .queries_eval import _global_rank

    base = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"]).map_batches(
        remote_fn(_QU, "fuse_keys_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    r1 = _global_rank(
        base,
        sort_cols=["neg_len", "doc_id"],
        part_col="_const",
        key_cols=["neg_len", "doc_id"],
        out_col="rank_len",
    ).select_columns(["doc_id", "neg_tok", "_const", "rank_len"])
    r2 = _global_rank(
        r1,
        sort_cols=["neg_tok", "doc_id"],
        part_col="_const",
        key_cols=["neg_tok", "doc_id"],
        out_col="rank_tok",
    ).select_columns(["doc_id", "rank_len", "rank_tok"])
    return (
        r2.map_batches(
            remote_fn(_QU, "rrf_score_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["neg_fx", "doc_id"])
        .limit(FUSE_TOPK)
        .map_batches(
            remote_fn(_QU, "rrf_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_RRF_FUSION = f"""
WITH w AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_words
  FROM documents),
r AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
           AS rank_len,
         CAST(ROW_NUMBER() OVER (ORDER BY n_words DESC, doc_id) AS BIGINT)
           AS rank_tok
  FROM w)
SELECT doc_id, rank_len, rank_tok,
       CAST({RRF_SCALE} // ({RRF_K} + rank_len)
            + {RRF_SCALE} // ({RRF_K} + rank_tok) AS BIGINT) AS rrf_fx
FROM r
ORDER BY rrf_fx DESC, doc_id
LIMIT {FUSE_TOPK}
"""

FUSION_QUERIES = {"rrf_fusion": q_rrf_fusion}
FUSION_ORACLES = {"rrf_fusion": SQL_RRF_FUSION}
