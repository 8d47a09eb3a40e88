"""Quality evaluation of the approximate dedup/ANN operators against
their exact counterparts — the "is the fast path good enough" report a
pipeline owner reads before flipping a corpus to the sub-quadratic
plans.

``ann_recall_eval`` — recall@5 of the LSH ANN probe (ann_lsh) against
exact brute-force cosine (knn_bruteforce), per query, in milli-units.
Both operators are independently oracle-certified; this op measures the
LSH approximation itself.

``minhash_pr_eval`` — precision / recall / F1 of the MinHash+LSH pair
finder (minhash_dups, ESTIMATED jaccard >= 0.70) against the exact
3-gram Jaccard >= 0.70 pair set (ngram_jaccard_dups), over the same
documents + planted variants. F1 uses the harmonic identity
F1 = 2|P∩T| / (|P| + |T|) so everything stays in exact integers.

Plan / 100 TB notes: the ANN eval folds two (n_queries x k)-row frames
driver-side (query budgets are human-sized). The minhash eval never
collects pairs: each side is tagged map-side ((doc_a, doc_b, p, t)
rows), ONE pair-keyed Sum merges them (pair volume = duplication
cardinality, the minhash exchange class), a per-batch combiner reduces
to (n_pred, n_truth, n_both) partials and the driver folds 3 ints —
no join operator (avoids the empty-hash-partition wart), no driver
materialization of the pair sets.

Oracles: derived IN SQL from the certified sequential dumps
(state/oracle_dump_near.py) joined against the certified exact-kNN SQL
— an independent relational computation of the same metrics.

Reference analogue: /root/reference/app.py has no dedup surface; brief
scope (dedup/ANN evaluation — first-class LLM-pipeline operators).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..remote import remote_fn

_QDE = "khl_pdf_ocr_ray.pipelines.queries_dedupeval"

ANN_N_QUERIES = 8
ANN_K = 5
PR_THRESHOLD_X100 = 70


def q_ann_recall_eval(sf_dir: str) -> pd.DataFrame:
    """(query_id, n_hits, recall_milli) — LSH vs exact top-5 per query."""
    from ..stages.knn import ann_lsh, knn_bruteforce

    lsh = ann_lsh(sf_dir, n_queries=ANN_N_QUERIES, k=ANN_K)
    ex = knn_bruteforce(sf_dir, n_queries=ANN_N_QUERIES, k=ANN_K)
    lset = set(zip(lsh["query_id"], lsh["neighbor_id"]))
    out_q, out_h, out_r = [], [], []
    for q in sorted(set(ex["query_id"])):
        truth = {
            (qq, nn)
            for qq, nn in zip(ex["query_id"], ex["neighbor_id"])
            if qq == q
        }
        hits = len(truth & lset)
        out_q.append(int(q))
        out_h.append(hits)
        out_r.append((1000 * hits) // ANN_K)
    return pd.DataFrame(
        {
            "query_id": np.array(out_q, dtype=np.int64),
            "n_hits": np.array(out_h, dtype=np.int64),
            "recall_milli": np.array(out_r, dtype=np.int64),
        }
    )


def pr_tag_batch(batch: pa.Table, p: int, t: int) -> pa.Table:
    n = len(batch)
    return pa.table(
        {
            "doc_a": batch["doc_a"].cast(pa.int64()),
            "doc_b": batch["doc_b"].cast(pa.int64()),
            "p": pa.array(np.full(n, p, dtype=np.int64), pa.int64()),
            "t": pa.array(np.full(n, t, dtype=np.int64), pa.int64()),
        }
    )


def pr_classify_partial(batch: pa.Table) -> pa.Table:
    """Merged (doc_a, doc_b, p, t) rows -> one (n_pred, n_truth, n_both)
    partial row."""
    p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = batch["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "n_pred": pa.array([int((p > 0).sum())], pa.int64()),
            "n_truth": pa.array([int((t > 0).sum())], pa.int64()),
            "n_both": pa.array([int(((p > 0) & (t > 0)).sum())], pa.int64()),
        }
    )


def pr_finalize(n_pred: int, n_truth: int, n_both: int) -> pd.DataFrame:
    precision = (1000 * n_both) // n_pred if n_pred else 0
    recall = (1000 * n_both) // n_truth if n_truth else 0
    f1 = (2000 * n_both) // (n_pred + n_truth) if n_pred + n_truth else 0
    return pd.DataFrame(
        {
            "n_pred": np.array([n_pred], dtype=np.int64),
            "n_truth": np.array([n_truth], dtype=np.int64),
            "n_both": np.array([n_both], dtype=np.int64),
            "precision_milli": np.array([precision], dtype=np.int64),
            "recall_milli": np.array([recall], dtype=np.int64),
            "f1_milli": np.array([f1], dtype=np.int64),
        }
    )


def q_minhash_pr_eval(sf_dir: str) -> pd.DataFrame:
    """One row: (n_pred, n_truth, n_both, precision_milli, recall_milli,
    f1_milli). See module docstring."""
    from ray.data.aggregate import Sum

    from ..io import input_nbytes
    from ..stages.dedup import (
        docs_with_variants,
        minhash_dedup,
        ngram_jaccard_dedup,
    )

    size_hint = input_nbytes(os.path.join(sf_dir, "documents.parquet"))
    pred = minhash_dedup(
        docs_with_variants(sf_dir), threshold_x100=PR_THRESHOLD_X100
    ).map_batches(
        remote_fn(_QDE, "pr_tag_batch", p=1, t=0),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    truth = ngram_jaccard_dedup(
        docs_with_variants(sf_dir),
        threshold_x100=PR_THRESHOLD_X100,
        size_hint_bytes=size_hint,
    ).map_batches(
        remote_fn(_QDE, "pr_tag_batch", p=0, t=1),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cells = (
        pred.union(truth)
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("p", alias_name="p"), Sum("t", alias_name="t"))
        .map_batches(
            remote_fn(_QDE, "pr_classify_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()  # one 3-int row per block
    )
    return pr_finalize(
        int(cells["n_pred"].sum()),
        int(cells["n_truth"].sum()),
        int(cells["n_both"].sum()),
    )


CURVE_THRESHOLDS = (70, 75, 80, 85, 90, 95)


def curve_hist_partial(batch: pa.Table) -> pa.Table:
    """minhash pair batch -> per-threshold >=t counts (cumulative curve
    partials; thresholds are a 6-element constant grid)."""
    est = (
        batch["est_jaccard_x100"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ts = np.array(CURVE_THRESHOLDS, dtype=np.int64)
    counts = (est[None, :] >= ts[:, None]).sum(axis=1).astype(np.int64)
    return pa.table(
        {
            "threshold_x100": pa.array(ts, pa.int64()),
            "n_pairs": pa.array(counts, pa.int64()),
        }
    )


def q_minhash_threshold_curve(sf_dir: str) -> "object":
    """(threshold_x100, n_pairs >= t) — the S-curve report a dedup owner
    reads to pick the similarity cutoff. One pass over the certified
    pair stream (duplication-cardinality), 6-row exchange."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import docs_with_variants, minhash_dedup

    return (
        minhash_dedup(
            docs_with_variants(sf_dir), threshold_x100=PR_THRESHOLD_X100
        )
        .map_batches(
            remote_fn(_QDE, "curve_hist_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("threshold_x100")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


def cluster_hist_partial(batch: pa.Table) -> pa.Table:
    """cluster-assignment batch -> (cluster_size, n_docs) partials."""
    t = batch.select(["cluster_size"])
    g = t.group_by("cluster_size").aggregate([([], "count_all")])
    out = pa.table(
        {
            "cluster_size": g["cluster_size"].cast(pa.int64()),
            "n_docs": g["count_all"].cast(pa.int64()),
        }
    )
    return out


def cluster_hist_finalize(batch: pa.Table) -> pa.Table:
    """(cluster_size, n_docs) -> + n_clusters = n_docs // size (every
    cluster of size s contributes exactly s member rows)."""
    s = (
        batch["cluster_size"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    d = batch["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(s) and (d % np.maximum(s, 1) != 0).any():
        raise RuntimeError(
            "cluster size histogram: member rows not divisible by size"
        )
    return batch.append_column(
        "n_clusters", pa.array(d // np.maximum(s, 1), pa.int64())
    )


def q_dup_cluster_histogram(sf_dir: str) -> "object":
    """(cluster_size, n_docs, n_clusters) over the minhash dup-cluster
    assignment — the dedup-savings shape report (giant-cluster watch)."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import docs_with_variants, minhash_clusters

    return (
        minhash_clusters(
            docs_with_variants(sf_dir), threshold_x100=PR_THRESHOLD_X100
        )
        .map_batches(
            remote_fn(_QDE, "cluster_hist_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("cluster_size")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .map_batches(
            remote_fn(_QDE, "cluster_hist_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def dedupeval_oracle_sqls(sf_dir: str) -> dict:
    """Dump-derived oracle SQL (state/oracle_dump_near.py dumps must
    exist — built on demand by ensure_dumps)."""
    from ..state.oracle_dump_near import ensure_dumps

    d = ensure_dumps(sf_dir)

    def p(name: str) -> str:
        return os.path.join(d, name)

    ann = f"""
WITH lsh AS (
  SELECT query_id, neighbor_id
  FROM read_parquet('{p("ann_lsh_seq.parquet")}')),
q AS (SELECT vec_id, embedding FROM embeddings
      ORDER BY vec_id LIMIT {ANN_N_QUERIES}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.vec_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims),
exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= {ANN_K})
SELECT e.query_id,
       CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST((1000 * count(l.neighbor_id)) // {ANN_K} AS BIGINT)
         AS recall_milli
FROM exact e LEFT JOIN lsh l
  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""
    pr = f"""
WITH p AS (SELECT doc_a, doc_b
           FROM read_parquet('{p("minhash_pairs_seq.parquet")}')),
t AS (SELECT doc_a, doc_b
      FROM read_parquet('{p("ngram_pairs_seq.parquet")}')),
np_ AS (SELECT CAST(count(*) AS BIGINT) AS n_pred FROM p),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM t),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_both
       FROM p JOIN t ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b)
SELECT n_pred, n_truth, n_both,
       CAST(CASE WHEN n_pred = 0 THEN 0
            ELSE (1000 * n_both) // n_pred END AS BIGINT)
         AS precision_milli,
       CAST(CASE WHEN n_truth = 0 THEN 0
            ELSE (1000 * n_both) // n_truth END AS BIGINT)
         AS recall_milli,
       CAST(CASE WHEN n_pred + n_truth = 0 THEN 0
            ELSE (2000 * n_both) // (n_pred + n_truth) END AS BIGINT)
         AS f1_milli
FROM np_ CROSS JOIN nt CROSS JOIN nb
"""
    tvals = ", ".join(f"({t})" for t in CURVE_THRESHOLDS)
    curve = f"""
WITH ts(threshold_x100) AS (VALUES {tvals}),
p AS (SELECT est_jaccard_x100
      FROM read_parquet('{p("minhash_pairs_seq.parquet")}'))
SELECT CAST(ts.threshold_x100 AS BIGINT) AS threshold_x100,
       CAST(coalesce(sum(CASE WHEN p.est_jaccard_x100
                               >= ts.threshold_x100
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
FROM ts LEFT JOIN p ON TRUE
GROUP BY ts.threshold_x100
"""
    hist = f"""
WITH c AS (SELECT cluster_id, cluster_size
           FROM read_parquet('{p("minhash_clusters_seq.parquet")}'))
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
FROM c GROUP BY cluster_size
"""
    return {
        "ann_recall_eval": ann,
        "minhash_pr_eval": pr,
        "minhash_threshold_curve": curve,
        "dup_cluster_histogram": hist,
    }


DEDUPEVAL_QUERIES = {
    "ann_recall_eval": q_ann_recall_eval,
    "minhash_pr_eval": q_minhash_pr_eval,
    "minhash_threshold_curve": q_minhash_threshold_curve,
    "dup_cluster_histogram": q_dup_cluster_histogram,
}
