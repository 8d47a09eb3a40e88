"""Similarity search over embedding columns: brute-force k-NN + LSH ANN,
plus exact embedding-cosine near-dup pairs.

Patterns (build brief "similarity search"):
- brute-force top-k: the query matrix is broadcast once (``ray.put``);
  every batch does one float64 matmul against it and emits only its LOCAL
  top-k candidates per query (partial top-k) — the merge handles
  (num_queries x k x num_blocks) tiny rows, never the full score matrix.
- LSH ANN (scale path): random-hyperplane sign buckets; each embedding is
  routed to its bucket, queries probe their own bucket (plus 1-bit flips),
  and only in-bucket distances are computed.
- embedding near-dup: exact all-pairs cosine >= tau, batched against the
  broadcast normalized matrix (SQL-checkable vs duckdb
  list_cosine_similarity); an LSH-bucketed variant covers the 100 TB shape.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

LSH_PLANES = 6
LSH_TABLES = 8
_rs = np.random.RandomState(0x5EED)


def _embed_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-30)


def load_queries(sf_dir: str, n_queries: int):
    """Driver-side: the (tiny) query set = lowest n vec_ids."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    q = _normalize(_embed_matrix(df))
    return df["vec_id"].to_numpy().astype(np.int64), q


def knn_partial_batch(
    df: pd.DataFrame, query_ids: list, q_ref, k: int
) -> pd.DataFrame:
    """Local top-k of one batch against the broadcast query matrix."""
    q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
    ids = df["vec_id"].to_numpy().astype(np.int64)
    x = _normalize(_embed_matrix(df))
    sims = q @ x.T  # (nq, batch)
    qids = np.asarray(query_ids, dtype=np.int64)
    out: Dict[str, list] = {"query_id": [], "neighbor_id": [], "sim": []}
    for qi, qid in enumerate(qids):
        s = sims[qi]
        mask = ids != qid
        cand_idx = np.nonzero(mask)[0]
        if cand_idx.size == 0:
            continue
        order = cand_idx[np.lexsort((ids[cand_idx], -s[cand_idx]))][:k]
        out["query_id"].extend([qid] * len(order))
        out["neighbor_id"].extend(ids[order])
        out["sim"].extend(s[order])  # full precision: the merge must rank
        # exactly as the oracle's ORDER BY sim DESC, not on rounded values
    return pd.DataFrame(out).astype(
        {"query_id": "int64", "neighbor_id": "int64", "sim": "float64"}
    )


def knn_merge(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver-side merge of per-batch partial top-k (tiny)."""
    out = []
    for qid, g in partials.groupby("query_id"):
        # a neighbor can arrive from several batches/buckets (LSH tables)
        g = g.drop_duplicates(["neighbor_id"])
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    if not out:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "sim_e6": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64"),
            }
        )
    df = pd.concat(out, ignore_index=True)
    df["sim_e6"] = np.floor(df["sim"] * 1e6 + 0.5).astype(np.int64)
    return df.drop(columns=["sim"])


def knn_bruteforce(sf_dir: str, n_queries: int = 8, k: int = 5) -> pd.DataFrame:
    """Exact cosine top-k for the first n_queries vectors."""
    import os

    import ray.data as rd

    from ..remote import remote_fn

    qids, q = load_queries(sf_dir, n_queries)
    q_ref = ray.put(q)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    partials = ds.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "knn_partial_batch",
            query_ids=[int(v) for v in qids],
            q_ref=q_ref,
            k=k,
        ),
        batch_format="pandas",
        batch_size=256,
    ).to_pandas()
    return knn_merge(partials, k)


# --- LSH ANN (approximate; the scale path) ----------------------------------
def _planes(dim: int) -> np.ndarray:
    """(tables, planes, dim) random hyperplanes, fixed seed."""
    rs = np.random.RandomState(0x5EED)
    return rs.normal(size=(LSH_TABLES, LSH_PLANES, dim))


def _bucket_keys(x: np.ndarray) -> np.ndarray:
    """(n, tables) int keys: table_id * 2^planes + sign-bit pattern."""
    planes = _planes(x.shape[1])
    keys = np.empty((x.shape[0], LSH_TABLES), dtype=np.int64)
    weights = 1 << np.arange(LSH_PLANES)
    for t in range(LSH_TABLES):
        bits = (x @ planes[t].T) > 0
        keys[:, t] = (t << LSH_PLANES) + (bits * weights).sum(axis=1)
    return keys


def lsh_bucket_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Explode each embedding into its LSH_TABLES bucket rows."""
    x = _embed_matrix(df)
    keys = _bucket_keys(x)
    n = len(df)
    return pd.DataFrame(
        {
            "vec_id": np.repeat(df["vec_id"].to_numpy().astype(np.int64), LSH_TABLES),
            "bucket": keys.reshape(-1),
            "embedding": np.repeat(df["embedding"].to_numpy(), LSH_TABLES),
        }
    )


def ann_lsh(sf_dir: str, n_queries: int = 8, k: int = 5, probes: int = 4) -> pd.DataFrame:
    """Approximate top-k: search only buckets near the query's sign key.

    probes = how many 1-bit-flip neighbor buckets to visit besides the
    query's own. Recall vs brute force is asserted in tests (~0.6+ at these
    sizes); at 100 TB the bucket column becomes the partition key so a
    query touches a handful of partitions instead of the full corpus."""
    import os

    import ray.data as rd

    from ..remote import remote_fn

    qids, q = load_queries(sf_dir, n_queries)
    qkeys = _bucket_keys(q)  # (nq, tables)
    wanted = set()
    for row in qkeys:
        for key in row:
            wanted.add(int(key))
            for b in range(probes):  # 1-bit-flip probes within the table
                wanted.add(int(key) ^ (1 << b))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    bucketed = ds.map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.knn", "lsh_bucket_batch"),
        batch_format="pandas",
    ).map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "bucket_member_filter",
            wanted=sorted(wanted),
        ),
        batch_format="pandas",
    )
    q_ref = ray.put(q)
    partials = bucketed.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "knn_partial_batch",
            query_ids=[int(v) for v in qids],
            q_ref=q_ref,
            k=k,
        ),
        batch_format="pandas",
    ).to_pandas()
    return knn_merge(partials, k)


def bucket_member_filter(df: pd.DataFrame, wanted: list) -> pd.DataFrame:
    keep = df["bucket"].isin(set(wanted))
    return df.loc[keep, ["vec_id", "embedding"]]


# --- exact embedding near-dup (SQL-checkable) --------------------------------
def embedding_pairs_batch(df: pd.DataFrame, all_ref, tau_e6: int) -> pd.DataFrame:
    """One batch x full normalized matrix; emit pairs a<b with cos >= tau."""
    ids_all, x_all = ray.get(all_ref)
    ids = df["vec_id"].to_numpy().astype(np.int64)
    x = _normalize(_embed_matrix(df))
    sims = x @ x_all.T
    out_a: List[int] = []
    out_b: List[int] = []
    tau = tau_e6 / 1e6
    for i in range(len(ids)):
        hits = np.nonzero(sims[i] >= tau)[0]
        for j in hits:
            a, b = int(ids[i]), int(ids_all[j])
            if a < b:
                out_a.append(a)
                out_b.append(b)
    return pd.DataFrame({"vec_a": out_a, "vec_b": out_b}).astype(
        {"vec_a": "int64", "vec_b": "int64"}
    )


def embedding_dups(sf_dir: str, tau_e6: int = 350_000):
    """All pairs with cosine similarity >= tau (exact; broadcast matrix).
    100 TB path: replace the broadcast with LSH buckets (ann_lsh's keys) and
    compare only within buckets."""
    import os

    import ray.data as rd

    from ..remote import remote_fn

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    df_all = t.to_pandas()
    ids_all = df_all["vec_id"].to_numpy().astype(np.int64)
    x_all = _normalize(_embed_matrix(df_all))
    all_ref = ray.put((ids_all, x_all))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return ds.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "embedding_pairs_batch",
            all_ref=all_ref,
            tau_e6=tau_e6,
        ),
        batch_format="pandas",
        batch_size=256,
    )


# --- IVF ANN (k-means coarse quantizer; the second scale path) --------------
IVF_CLUSTERS = 16
IVF_KMEANS_ITERS = 10


def _ivf_centroids(x: np.ndarray) -> np.ndarray:
    """Deterministic k-means: seeded init, fixed iteration count (no
    convergence-dependent randomness). Driver-side over a SAMPLE at real
    scale; whole (small) table here."""
    rs = np.random.RandomState(0x1Fa)
    k = min(IVF_CLUSTERS, len(x))
    centroids = x[rs.choice(len(x), size=k, replace=False)].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(_normalize(x) @ _normalize(centroids).T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_assign_batch(df: pd.DataFrame, centroids_ref) -> pd.DataFrame:
    cents = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
    x = _embed_matrix(df)
    assign = np.argmax(_normalize(x) @ _normalize(cents).T, axis=1).astype(np.int64)
    return pd.DataFrame(
        {"vec_id": df["vec_id"].astype("int64"), "ivf_list": assign, "embedding": df["embedding"]}
    )


def ann_ivf(sf_dir: str, n_queries: int = 8, k: int = 5, nprobe: int = 4) -> pd.DataFrame:
    """IVF approximate top-k: coarse k-means quantizer, search only the
    nprobe inverted lists nearest to each query. At 100 TB the ivf_list
    column is the partition key; the centroid table is the broadcast
    index."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..remote import remote_fn

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).to_pandas()
    x_all = _embed_matrix(t)
    centroids = _ivf_centroids(x_all)
    cents_ref = ray.put(centroids)

    qids, q = load_queries(sf_dir, n_queries)
    qsims = q @ _normalize(centroids).T
    probe_lists = set()
    for row in qsims:
        for c in np.argsort(-row)[:nprobe]:
            probe_lists.add(int(c))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    candidates = ds.map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.knn", "ivf_assign_batch", centroids_ref=cents_ref),
        batch_format="pandas",
    ).map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "ivf_list_filter",
            wanted=sorted(probe_lists),
        ),
        batch_format="pandas",
    )
    q_ref = ray.put(q)
    partials = candidates.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "knn_partial_batch",
            query_ids=[int(v) for v in qids],
            q_ref=q_ref,
            k=k,
        ),
        batch_format="pandas",
    ).to_pandas()
    return knn_merge(partials, k)


def ivf_list_filter(df: pd.DataFrame, wanted: list) -> pd.DataFrame:
    keep = df["ivf_list"].isin(set(wanted))
    return df.loc[keep, ["vec_id", "embedding"]]
