"""MMR-diversified top-k reranking (Carbonell & Goldstein 1998).

``mmr_rerank``: for each of MMR_QUERIES query vectors, retrieve a
relevance shortlist of MMR_SHORTLIST candidates by cosine, then select
MMR_K results greedily by Maximal Marginal Relevance

    score = LAMBDA * rel(q, d) - (1 - LAMBDA) * max over selected s of
            sim(d, s)

— the standard redundancy-suppressing reranker for retrieval-augmented
corpus sampling (pick relevant-but-mutually-diverse exemplars).

Determinism contract: every similarity is the SHARED fixed-point kernel
``cos_fx`` (floor(2^20 * cosine), computed with one numpy op order), and
the greedy step is pure integers — score_x10 = 7 * rel_fx - 3 *
max_sim_fx with (score DESC, vec_id ASC) ties — so any batching of the
distributed shortlist pass is bit-identical, and the sequential twin
(same kernels, one batch) must agree exactly.

Plan: query matrix broadcast once (ray.put); ONE pass over embeddings
computes per-batch partial top-M rows per query (sim_fx + the candidate
vector, so the pairwise-diversity step never re-reads the corpus);
driver merges <= M x blocks rows by the exact integer order and runs the
greedy over an M x M fixed-point matrix per query. The corpus never
shuffles; driver state is shortlist-bounded.

100 TB notes: the shortlist pass is the ANN surface's concern at scale —
swap the scan for an ann_lsh / ann_ivf probe (same shortlist contract)
and MMR's cost stays O(queries x M^2) at the driver regardless of corpus
size.

Oracle: dump-twin (sequential single-batch run of the same kernels) —
the pure-python independent re-implementation lives in tests.

Reference analogue: none in /root/reference/app.py; brief scope
(similarity-search family next to knn_bruteforce / ann_* / ndcg_eval).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..remote import remote_fn

_QM = "khl_pdf_ocr_ray.pipelines.queries_mmr"

MMR_QUERIES = 4
MMR_SHORTLIST = 32
MMR_K = 8
FX = 1 << 20
LAM_NUM, LAM_DEN_MINUS = 7, 3  # lambda = 0.7, scores carry x10


def cos_fx(q: np.ndarray, d: np.ndarray) -> np.ndarray:
    """THE shared fixed-point cosine: floor(2^20 * (q @ d.T) / norms).
    One op order (matmul, outer norm product, divide, floor) keeps the
    doubles — and therefore the floors — identical everywhere."""
    num = q @ d.T
    qn = np.sqrt((q * q).sum(axis=1))
    dn = np.sqrt((d * d).sum(axis=1))
    den = np.outer(qn, dn)
    den = np.where(den == 0.0, 1.0, den)
    return np.floor(num / den * FX).astype(np.int64)


def mmr_greedy(
    cand_ids: np.ndarray, rel_fx: np.ndarray, pair_fx: np.ndarray, k: int
):
    """THE shared greedy: candidates (ids, relevance, pairwise sims) ->
    ordered pick list [(vec_id, score_x10)]. Pure integer argmax with
    (score DESC, vec_id ASC) ties."""
    n = len(cand_ids)
    picked: list = []
    avail = np.ones(n, dtype=bool)
    max_sim = np.zeros(n, dtype=np.int64)  # true max sim to picked set
    for step in range(min(k, n)):
        idxs = np.nonzero(avail)[0]
        # first pick is pure relevance (empty-max convention = 0); after
        # that the penalty is the TRUE max (which can be negative — no
        # clamping at zero). The argmax runs over the AVAILABLE subset
        # only (negating an int64 sentinel would wrap, so no sentinel
        # scores anywhere).
        pen = max_sim[idxs] if step else np.zeros(len(idxs), np.int64)
        score = LAM_NUM * rel_fx[idxs] - LAM_DEN_MINUS * pen
        loc = int(np.lexsort((cand_ids[idxs], -score))[0])
        best = int(idxs[loc])
        picked.append((int(cand_ids[best]), int(score[loc])))
        avail[best] = False
        col = pair_fx[:, best]
        max_sim = col.copy() if step == 0 else np.maximum(max_sim, col)
    return picked


def mmr_partial_batch(
    batch: pa.Table, query_ids, q_ref, shortlist: int
) -> pa.Table:
    """embeddings batch -> per-batch top-``shortlist`` candidate rows
    per query: (query_id, vec_id, sim_fx, vec packed as fixed-width
    binary float32)."""
    import ray

    q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.vstack(
        batch["embedding"].to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    sims = cos_fx(q, mat)  # (n_queries, n_batch)
    out_q, out_id, out_sim, out_vec = [], [], [], []
    for qi, qid in enumerate(query_ids):
        mask = ids != qid
        cids = ids[mask]
        csim = sims[qi][mask]
        cvec = mat[mask]
        order = np.lexsort((cids, -csim))[:shortlist]
        sel = np.ascontiguousarray(cvec[order].astype(np.float32))
        out_q.extend([qid] * len(order))
        out_id.extend(cids[order].tolist())
        out_sim.extend(csim[order].tolist())
        out_vec.extend(sel[i].tobytes() for i in range(len(order)))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "sim_fx": pa.array(out_sim, pa.int64()),
            "vec": pa.array(out_vec, pa.binary()),
        }
    )


def _merge_and_greedy(partials: pd.DataFrame, dim: int) -> pd.DataFrame:
    """Merge per-block shortlist partials to the global shortlist per
    query (exact integer order) and run the shared greedy."""
    rows = []
    for qid, g in partials.groupby("query_id", sort=True):
        g = g.sort_values(
            ["sim_fx", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(MMR_SHORTLIST)
        cand_ids = g["vec_id"].to_numpy().astype(np.int64)
        rel = g["sim_fx"].to_numpy().astype(np.int64)
        vecs = np.frombuffer(
            b"".join(g["vec"].tolist()), dtype=np.float32
        ).reshape(len(g), dim).astype(np.float64)
        pair = cos_fx(vecs, vecs)
        for rank, (vid, score) in enumerate(
            mmr_greedy(cand_ids, rel, pair, MMR_K), start=1
        ):
            rows.append((int(qid), rank, vid, score))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "vec_id", "mmr_x10"]
    ).astype("int64")


def q_mmr_rerank(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, vec_id, mmr_x10). See module docstring."""
    import ray

    from ..io import read_parquet_clean
    from ..stages.knn import load_queries

    qids, q = load_queries(sf_dir, MMR_QUERIES)
    dim = q.shape[1]
    q_ref = ray.put(q)
    ds = read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    partials = ds.map_batches(
        remote_fn(
            _QM,
            "mmr_partial_batch",
            query_ids=[int(v) for v in qids],
            q_ref=q_ref,
            shortlist=MMR_SHORTLIST,
        ),
        batch_format="pyarrow",
        batch_size=256,
    ).to_pandas()
    return _merge_and_greedy(partials, dim)


def mmr_sequential(sf_dir: str) -> pd.DataFrame:
    """Sequential twin: the same kernels over ONE in-memory batch."""
    from ..stages.knn import load_queries

    qids, q = load_queries(sf_dir, MMR_QUERIES)
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    sims = cos_fx(q, mat)
    rows = []
    for qi, qid in enumerate(qids):
        mask = ids != qid
        cids = ids[mask]
        csim = sims[qi][mask]
        cvec = mat[mask]
        order = np.lexsort((cids, -csim))[:MMR_SHORTLIST]
        pair = cos_fx(cvec[order], cvec[order])
        for rank, (vid, score) in enumerate(
            mmr_greedy(
                cids[order].astype(np.int64),
                csim[order].astype(np.int64),
                pair,
                MMR_K,
            ),
            start=1,
        ):
            rows.append((int(qid), rank, vid, score))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "vec_id", "mmr_x10"]
    ).astype("int64")


def _dumps_dir(sf_dir: str) -> str:
    from ..state.atomic import content_keyed_dir

    return content_keyed_dir(
        os.path.abspath(__file__),
        os.path.join(sf_dir, "embeddings.parquet"),
        "oracle_dumps_mmr",
    )


def mmr_oracle_sqls(sf_dir: str) -> Dict[str, str]:
    from ..state.atomic import ensure_published

    out_dir = _dumps_dir(sf_dir)

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(
                mmr_sequential(sf_dir), preserve_index=False
            ),
            os.path.join(tmp, "mmr_seq.parquet"),
        )

    ensure_published(out_dir, build)
    return {
        "mmr_rerank": (
            "SELECT query_id, rank, vec_id, mmr_x10 FROM "
            f"read_parquet('{os.path.join(out_dir, 'mmr_seq.parquet')}')"
        )
    }


MMR_QUERIES_REG = {"mmr_rerank": q_mmr_rerank}
