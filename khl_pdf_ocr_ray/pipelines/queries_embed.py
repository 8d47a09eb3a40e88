"""Embedding-column operators: grouped centroids and full-corpus
distributed k-means.

- ``lang_embedding_centroid`` — per-language centroid of the embedding
  column, reported as FIXED-POINT component sums (x 2^20) + counts so
  the value hash is exact: integer sums are order-independent under any
  batch split, and DuckDB reproduces them with
  ``unnest``/``generate_subscripts`` over the same join. STATIC-SQL
  checked. (The mean is sum/2^20/n — left to the caller so no float
  division enters the hashed result.)
- ``kmeans_clusters`` — K=8 Lloyd k-means over the WHOLE embedding
  table, 3 fixed iterations, returning the per-vector assignment. The
  iterative-algorithm operator: each iteration is one streaming
  map_batches pass emitting per-(cluster, dim) int64 fixed-point sums +
  counts (a K x D-row shuffle — never the vectors), and the driver
  rebuilds the K x D centroid matrix in canonical order. Checked against
  a sequential dump twin (state/oracle_dump_near.py) that runs the SAME
  kernels single-process: equality is bit-exact because (a) assignment
  is per-row — numpy reduces the squared distance along the 64-dim axis
  only, so a row's argmin never depends on its batch neighbours (the
  matmul formulation is deliberately avoided: BLAS kernel choice varies
  with matrix shape), and (b) centroid updates are exact integer sums.

All per-batch kernels are Arrow-native (pyarrow in/out, zero-copy from
the object store): the embedding list column unpacks through its
flattened values buffer into one (n, D) matrix — no per-row stacking, no
Arrow->pandas->Arrow copies. Only the map_groups finalizers (per-cluster
frames) remain pandas.

Scale notes (100 TB):
- lang_embedding_centroid joins embeddings to the doc table on id (hash
  join, both sides big) and then shuffles only |langs| x D combiner
  rows per block;
- kmeans_clusters broadcasts K x D centroids into each task as plain
  data (at real scale: ``ray.put`` once per iteration) and shuffles
  K x D x blocks combiner rows per pass; iterations scale linearly and
  independently of K-means' data size. Empty clusters keep their
  previous centroid (deterministic on both twins).
- combiner outputs grow with BLOCK COUNT x group cardinality, so every
  pre-groupby coalesce below derives its width from the input's block
  count / byte size, never a literal constant.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from ..io import coalesce_for_input, table_nbytes
from ..joins import safe_join
from ..remote import remote_fn

_QE = "khl_pdf_ocr_ray.pipelines.queries_embed"

EMB_SCALE = 1 << 20  # fixed-point: integer sums are order-independent
EMB_DIM = 64

KM_K = 8
KM_ITERS = 3


# --- shared kernels (imported by the sequential dump twin) ------------------
def emb_fixed(x: np.ndarray) -> np.ndarray:
    """float32 embeddings -> int64 fixed-point (x 2^20, floor-rounded).
    The *2^20 step is a power-of-two scale, exact in binary FP, so both
    engines compute floor of the identical double."""
    return np.floor(x.astype(np.float64) * EMB_SCALE + 0.5).astype(np.int64)


def km_assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment, ties to the lowest cluster id.
    Distances reduce along the dim axis per row (no cross-row BLAS), so
    the result is bit-identical under any batching."""
    d = np.empty((len(x), len(cents)), dtype=np.float64)
    for c in range(len(cents)):
        diff = x - cents[c]
        d[:, c] = np.einsum("ij,ij->i", diff, diff)
    return np.argmin(d, axis=1).astype(np.int64)


def km_update_from_sums(
    sums: np.ndarray, counts: np.ndarray, prev: np.ndarray
) -> np.ndarray:
    """(K, D) int64 fixed sums + (K,) counts -> float64 centroids, in
    canonical cluster/dim order; empty clusters keep their previous
    centroid."""
    out = prev.copy()
    nz = counts > 0
    out[nz] = (sums[nz].astype(np.float64) / EMB_SCALE) / counts[
        nz, None
    ].astype(np.float64)
    return out


def _matrix(df: pd.DataFrame) -> np.ndarray:
    """pandas embedding frame -> (n, D) float64 — driver-side / map_groups
    path only; the per-batch kernels use the Arrow ``_matrix_t``."""
    if df.empty:  # empty shuffle partitions are legitimate (joins.py)
        return np.zeros((0, EMB_DIM), dtype=np.float64)
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _matrix_t(batch: pa.Table) -> np.ndarray:
    """Arrow embedding list column -> (n, D) float64 via the flattened
    values buffer (one reshape, no per-row stacking). float32 -> float64
    is exact, so the doubles match the pandas path bit-for-bit."""
    if batch.num_rows == 0:
        return np.zeros((0, EMB_DIM), dtype=np.float64)
    flat = batch["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    return flat.astype(np.float64).reshape(batch.num_rows, -1)


def _ids_t(batch: pa.Table, col: str) -> np.ndarray:
    return np.asarray(batch[col].to_numpy(zero_copy_only=False), dtype=np.int64)


# --- per-batch stages (Arrow in / Arrow out) ---------------------------------
def emb_pack_batch(batch: pa.Table) -> pa.Table:
    """embedding list<float> -> raw float32 bytes: Arrow's hash join
    rejects list-typed non-key payloads, and a fixed-width binary column
    shuffles tighter anyway."""
    flat = batch["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    x = np.ascontiguousarray(flat, dtype=np.float32).reshape(batch.num_rows, -1)
    return pa.table(
        {
            "vec_id": batch["vec_id"],
            "emb_bin": pa.array([row.tobytes() for row in x], pa.binary()),
        }
    )


def _unpack(col) -> np.ndarray:
    """Packed float32 binary column (Arrow array or any bytes iterable)
    -> (n, D) float32 matrix."""
    bufs = col.to_pylist() if hasattr(col, "to_pylist") else list(col)
    if not bufs:  # empty join/shuffle partitions are legitimate (joins.py)
        return np.zeros((0, 1), dtype=np.float32)
    return np.frombuffer(b"".join(bufs), dtype=np.float32).reshape(len(bufs), -1)


def lang_centroid_partial(batch: pa.Table) -> pa.Table:
    """Per-(lang, dim) int64 fixed sums + counts for one batch."""
    fx = emb_fixed(_unpack(batch["emb_bin"]))
    langs = np.asarray(batch["lang"].to_pylist())
    uniq = np.unique(langs) if len(langs) else langs
    d = fx.shape[1]
    sums, ns = [], []
    for lang in uniq:
        m = langs == lang
        sums.append(fx[m].sum(axis=0))
        ns.append(int(m.sum()))
    if not len(uniq):
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "dim": pa.array([], pa.int64()),
                "sum_fx": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "lang": pa.array(np.repeat(uniq, d), pa.string()),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
            "sum_fx": np.concatenate(sums),
            "n_vecs": np.repeat(np.asarray(ns, dtype=np.int64), d),
        }
    )


def km_partial(batch: pa.Table, cents: List[List[float]]) -> pa.Table:
    """Assign one batch to centroids; emit (cluster, dim, sum_fx, n)."""
    c = np.asarray(cents, dtype=np.float64)
    x = _matrix_t(batch)
    assign = km_assign(x, c)
    fx = emb_fixed(x)
    d = fx.shape[1]
    ks = np.unique(assign)
    if not len(ks):
        return pa.table(
            {
                "cluster": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "sum_fx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    sums = np.stack([fx[assign == k].sum(axis=0) for k in ks])
    ns = np.array([int((assign == k).sum()) for k in ks], dtype=np.int64)
    return pa.table(
        {
            "cluster": np.repeat(ks, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(ks)),
            "sum_fx": sums.reshape(-1),
            "n": np.repeat(ns, d),
        }
    )


def km_assign_batch(batch: pa.Table, cents: List[List[float]]) -> pa.Table:
    c = np.asarray(cents, dtype=np.float64)
    return pa.table(
        {"vec_id": batch["vec_id"], "cluster": km_assign(_matrix_t(batch), c)}
    )


# --- plans ------------------------------------------------------------------
def q_lang_embedding_centroid(sf_dir: str) -> rd.Dataset:
    """Per-(lang, dim) fixed-point centroid sums over the embedding join."""
    from .queries import _t

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        remote_fn(_QE, "emb_pack_batch"), batch_format="pyarrow", zero_copy_batch=True
    )
    docs = _t(sf_dir, "documents", ["doc_id", "lang"])
    joined = safe_join(
        emb, docs, on=("vec_id",), right_on=("doc_id",),
        assume_non_empty=True,  # both tables are non-empty driver inputs
        left_nbytes=table_nbytes(sf_dir, "embeddings"),
        right_nbytes=table_nbytes(sf_dir, "documents"),
    )
    return (
        joined.map_batches(
            remote_fn(_QE, "lang_centroid_partial"), batch_format="pyarrow"
        )
        # |langs| x D combiner rows PER BLOCK: coalesce width scales with
        # the input's block count (never a literal 2)
        .repartition(coalesce_for_input(table_nbytes(sf_dir, "embeddings")))
        .groupby(["lang", "dim"])
        .aggregate(
            Sum("sum_fx", alias_name="sum_fx"),
            Sum("n_vecs", alias_name="n_vecs"),
        )
    )


SQL_LANG_EMBEDDING_CENTROID = f"""
WITH ex AS (
  SELECT d.lang,
         CAST(generate_subscripts(em.embedding, 1) - 1 AS BIGINT) AS dim,
         unnest(em.embedding) AS e
  FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id)
SELECT lang, dim,
       CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * {EMB_SCALE} + 0.5) AS BIGINT))
            AS BIGINT) AS sum_fx,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM ex GROUP BY lang, dim
"""


def km_seed_partial(batch: pa.Table) -> pa.Table:
    """Per-batch bottom-KM_K by vec_id: only each block's K winners can
    win globally, so <= K rows per block reach the driver."""
    vid = _ids_t(batch, "vec_id")
    return batch.take(np.argsort(vid, kind="stable")[:KM_K])


def kmeans_init(ds: rd.Dataset) -> np.ndarray:
    """Deterministic seeds: the embeddings of the KM_K lowest vec_ids,
    via a distributed bottom-K combiner — correct for ANY id domain (a
    `vec_id < KM_K` pushdown filter would silently under-seed a non-dense
    or non-zero-based id space and crash the iterate step) and never
    collects more than K rows per block."""
    parts = ds.map_batches(
        remote_fn(_QE, "km_seed_partial"), batch_format="pyarrow"
    ).to_pandas()  # <= KM_K x blocks rows
    df = parts.nsmallest(KM_K, "vec_id").sort_values("vec_id")
    if len(df) < KM_K:
        raise ValueError(f"kmeans needs >= {KM_K} vectors, got {len(df)}")
    return _matrix(df)


def kmeans_iterate(ds: rd.Dataset, cents: np.ndarray, iters: int) -> np.ndarray:
    """Fixed Lloyd iterations; each is one streaming pass + a K x D-row
    groupby. Drives both the production plan and (with a pandas 'dataset')
    nothing else — the dump twin uses the kernels directly."""
    # K x D combiner rows per block: derive the coalesce from the cached
    # working set's own block count (free metadata on a materialized ds)
    width = max(2, ds.num_blocks() // 16)
    for _ in range(iters):
        agg = (
            ds.map_batches(
                remote_fn(_QE, "km_partial", cents=cents.tolist()),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .repartition(width)
            .groupby(["cluster", "dim"])
            .aggregate(Sum("sum_fx", alias_name="sum_fx"), Sum("n", alias_name="n"))
            .to_pandas()  # K x D rows
        )
        sums = np.zeros((KM_K, EMB_DIM), dtype=np.int64)
        counts = np.zeros(KM_K, dtype=np.int64)
        for _, r in agg.iterrows():
            sums[int(r["cluster"]), int(r["dim"])] = int(r["sum_fx"])
            counts[int(r["cluster"])] = int(r["n"])
        cents = km_update_from_sums(sums, counts, cents)
    return cents


def q_kmeans_clusters(sf_dir: str) -> rd.Dataset:
    """Per-vector k-means assignment after KM_ITERS Lloyd iterations."""
    # iterative working set: materialized ONCE so the seed scan + 4 passes
    # (3 updates + final assign) don't re-read and re-partition the
    # parquet each time — the standard cache-the-iterate pattern; at
    # 100 TB the object store holds/spills the blocks and every pass is a
    # pure map over them
    ds = _t_emb(sf_dir)
    cents = kmeans_init(ds)
    cents = kmeans_iterate(ds, cents, KM_ITERS)
    return ds.map_batches(
        remote_fn(_QE, "km_assign_batch", cents=cents.tolist()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --- PCA (one-pass covariance -> driver eigh -> map-only projection) --------
PCA_NC = 2  # components kept


def pca_moment_partial(batch: pa.Table) -> pa.Table:
    """Per-batch int64 fixed-point moments, one row per statistic:
    (i, j, v) = upper-triangle Gram sums over the fixed-point ints for
    i <= j; (i, -1, v) = per-dim first-moment sums; (-1, -1, n) = row
    count. Integer sums are order-independent, so the downstream groupby
    Sum reproduces the sequential twin's bits under any batching.
    Shuffle volume: D*(D+3)/2 + 1 rows per block (~2.1k for D=64) —
    independent of batch size."""
    fx = emb_fixed(_matrix_t(batch))
    n, d = fx.shape
    # int64 matmul: exact for unit-norm embeddings (|fx| < 2^20, so each
    # Gram entry grows < 2^40 per row -> overflow headroom ~2^23 rows
    # corpus-wide). Beyond that, drop the Gram fixed-point to 2^10 (still
    # bit-reproducible; headroom 2^43 rows) or carry (hi, lo) int64 pairs.
    g = fx.T @ fx
    iu, ju = np.triu_indices(d)
    i = np.concatenate([iu, np.arange(d), [-1]]).astype(np.int64)
    j = np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int64)
    v = np.concatenate([g[iu, ju], fx.sum(axis=0), [n]]).astype(np.int64)
    return pa.table({"i": i, "j": j, "v": v})


def pca_model_from_sums(agg: pd.DataFrame):
    """(i, j, v) moment rows -> (mean: (D,) float64, comps: (D, NC)
    float64). Shared by the distributed plan and the sequential dump twin
    so every double is computed once, identically: covariance from the
    integer sums in a fixed operation order, then numpy eigh (same LAPACK
    in-process on both sides) with a deterministic sign rule (largest-
    magnitude component positive, ties to the lowest dim)."""
    n = int(agg.loc[(agg.i == -1) & (agg.j == -1), "v"].iloc[0])
    s = np.zeros(EMB_DIM, dtype=np.int64)
    first = agg[(agg.j == -1) & (agg.i >= 0)]
    s[first["i"].to_numpy(dtype=np.int64)] = first["v"].to_numpy(dtype=np.int64)
    g = np.zeros((EMB_DIM, EMB_DIM), dtype=np.int64)
    sec = agg[agg.j >= 0]
    gi = sec["i"].to_numpy(dtype=np.int64)
    gj = sec["j"].to_numpy(dtype=np.int64)
    g[gi, gj] = sec["v"].to_numpy(dtype=np.int64)
    g[gj, gi] = g[gi, gj]
    mean_fx = s.astype(np.float64) / float(n)
    cov = (g.astype(np.float64) / float(n)) - np.outer(mean_fx, mean_fx)
    cov /= float(EMB_SCALE) * float(EMB_SCALE)
    w, vv = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = vv[:, ::-1][:, :PCA_NC].copy()
    for c in range(PCA_NC):
        k = int(np.argmax(np.abs(comps[:, c])))
        if comps[k, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean_fx / float(EMB_SCALE), comps


def pca_project_batch(
    batch: pa.Table, mean: List[float], comps: List[List[float]]
) -> pa.Table:
    """Map-only projection onto the broadcast components, reported fixed-
    point (x 2^20). The dim accumulation runs in a fixed order (explicit
    loop over dims, vectorized across rows) — never a BLAS matmul, whose
    summation order can vary with matrix shape — so the doubles match the
    single-batch twin bit-for-bit."""
    m = np.asarray(mean, dtype=np.float64)
    cp = np.asarray(comps, dtype=np.float64)  # (D, NC)
    x = _matrix_t(batch)
    y = np.zeros((len(x), cp.shape[1]), dtype=np.float64)
    for d in range(cp.shape[0]):
        y += (x[:, d] - m[d])[:, None] * cp[d]
    out = {"vec_id": batch["vec_id"]}
    for c in range(cp.shape[1]):
        out[f"pc{c + 1}_fx"] = np.floor(y[:, c] * EMB_SCALE + 0.5).astype(np.int64)
    return pa.table(out)


def q_pca_project(sf_dir: str) -> rd.Dataset:
    """Distributed PCA: dimensionality reduction of the embedding column
    to PCA_NC components — covariance in ONE streaming pass of int64
    fixed-point moment combiners (a ~2.1k-row shuffle per block, never
    the vectors), eigendecomposition of the 64x64 matrix on the driver,
    then a map-only broadcast projection. Checked bit-exact against the
    sequential dump twin (state/oracle_dump_near.py). 100 TB: identical
    plan — pass 1 reduces to D^2/2 integer rows regardless of corpus
    size; pass 2 is embarrassingly parallel."""
    ds = _t_emb(sf_dir)
    agg = (
        ds.map_batches(
            remote_fn(_QE, "pca_moment_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # ~2.1k combiner rows per block: width scales with block count
        .repartition(max(2, ds.num_blocks() // 16))
        .groupby(["i", "j"])
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()  # D*(D+3)/2 + 1 rows
    )
    mean, comps = pca_model_from_sums(agg)
    return ds.map_batches(
        remote_fn(_QE, "pca_project_batch", mean=mean.tolist(), comps=comps.tolist()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --- cluster purity (external clustering evaluation) -------------------------
def purity_per_cluster(g: pd.DataFrame) -> pd.DataFrame:
    """One cluster's (lang, n) contingency rows -> (n_vecs, majority lang).
    Ties break to the lexicographically-lowest lang. The group is the
    contingency table (<= |langs| rows), never the vectors."""
    g = g.sort_values(["n", "lang"], ascending=[False, True])
    return pd.DataFrame(
        {
            "cluster": pd.Series([int(g["cluster"].iloc[0])], dtype="int64"),
            "n_vecs": pd.Series([int(g["n"].sum())], dtype="int64"),
            "top_lang": pd.Series([g["lang"].iloc[0]], dtype="string"),
            "top_n": pd.Series([int(g["n"].iloc[0])], dtype="int64"),
        }
    )


def q_cluster_lang_purity(sf_dir: str) -> rd.Dataset:
    """External evaluation of the k-means clustering against the declared
    language labels: per cluster, size + majority label + its count (the
    purity numerator/denominator — the division is left to the caller so
    no float enters the hashed result). Plan: the kmeans assignment
    Dataset joins the doc labels on id, reduces to a K x |langs|
    contingency via Count, then a K-group finalize. Only (vec_id,
    cluster) and contingency rows shuffle. The dump oracle recomputes the
    same contingency in SQL over the kmeans twin's assignments."""
    from ray.data.aggregate import Count

    from .queries import _t

    assigns = q_kmeans_clusters(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "lang"])
    joined = safe_join(
        assigns, docs, on=("vec_id",), right_on=("doc_id",),
        assume_non_empty=True,  # both sides non-empty on the driver corpora
        left_nbytes=table_nbytes(sf_dir, "embeddings"),  # slim assignment rows
        right_nbytes=table_nbytes(sf_dir, "documents"),
    )
    return (
        joined.groupby(["cluster", "lang"])
        .aggregate(Count(alias_name="n"))
        .repartition(2)  # K x |langs| contingency table (bounded, tiny)
        .groupby("cluster")
        .map_groups(remote_fn(_QE, "purity_per_cluster"), batch_format="pandas")
    )


# --- SemDeDup (within-cluster semantic dedup) --------------------------------
SEM_TAU = 0.35  # cosine threshold; matches the embedding_dups family
SEM_CHUNK = 1024  # prefix-compare tile width: memory per tile is
                  # SEM_CHUNK^2 doubles (~8 MB), independent of cluster size
SEM_CLUSTER_WIDTH_MAX = 32_768  # loud guard: a cluster wider than this is
                                # a ~10^9-dot-product single task — the
                                # operator's K must scale with the corpus
                                # (SemDeDup uses ~10^5 clusters at LAION
                                # scale); failing loudly beats a silent
                                # multi-minute straggler


def semdedup_mark(x: np.ndarray) -> np.ndarray:
    """Kept flags for one cluster's embedding matrix, rows pre-sorted by
    vec_id ascending: row i is REMOVED iff some earlier row j < i has
    cosine(x_j, x_i) >= SEM_TAU (the pairwise rule of SemDeDup, Abbas et
    al. 2023, arXiv:2303.09540 — one representative survives per dup
    pair, earliest id wins; 'earlier' is by id, NOT by kept status, so
    the decision for row i is independent of other removals and the rule
    is order-parallel). Shared verbatim by the distributed per-cluster
    task and the sequential dump twin — identical input matrix, identical
    doubles.

    Computed as tiled prefix matmuls (SEM_CHUNK x SEM_CHUNK blocks of
    x @ x.T, strict lower triangle): O(n^2) compute like the published
    rule, but O(SEM_CHUNK^2) peak memory and BLAS kernels instead of a
    per-row Python loop. Clusters wider than SEM_CLUSTER_WIDTH_MAX fail
    loudly — the guard for a degenerate k-means K rather than silent
    quadratic stragglers."""
    n = len(x)
    if n > SEM_CLUSTER_WIDTH_MAX:
        raise ValueError(
            f"semdedup cluster width {n} exceeds SEM_CLUSTER_WIDTH_MAX="
            f"{SEM_CLUSTER_WIDTH_MAX}: raise the k-means K so clusters stay "
            f"task-sized (K ~ corpus / target cluster width)"
        )
    kept = np.ones(n, dtype=bool)
    if n <= 1:
        return kept
    norms = np.sqrt(np.einsum("ij,ij->i", x, x))
    norms[norms == 0.0] = 1.0
    xn = x / norms[:, None]
    for rs in range(1, n, SEM_CHUNK):
        re_ = min(rs + SEM_CHUNK, n)
        rows = np.arange(rs, re_)
        hit = np.zeros(re_ - rs, dtype=bool)
        for cs in range(0, re_, SEM_CHUNK):
            ce = min(cs + SEM_CHUNK, re_)
            sims = xn[rs:re_] @ xn[cs:ce].T
            # strict prefix: column j counts for row i only when j < i
            cmask = np.arange(cs, ce)[None, :] < rows[:, None]
            hit |= ((sims >= SEM_TAU) & cmask).any(axis=1)
        kept[rs:re_] = ~hit
    return kept


def sem_assign_batch(batch: pa.Table, cents: List[List[float]]) -> pa.Table:
    """km_assign_batch, but CARRYING the embedding column: the per-cluster
    dedup needs the vectors co-located with their cluster id."""
    c = np.asarray(cents, dtype=np.float64)
    return pa.table(
        {
            "vec_id": batch["vec_id"],
            "cluster": km_assign(_matrix_t(batch), c),
            "embedding": batch["embedding"],
        }
    )


def semdedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
    """One cluster -> (vec_id, cluster, kept)."""
    g = g.sort_values("vec_id")
    kept = semdedup_mark(_matrix(g))
    return pd.DataFrame(
        {
            "vec_id": g["vec_id"].to_numpy(dtype=np.int64),
            "cluster": g["cluster"].to_numpy(dtype=np.int64),
            "kept": kept,
        }
    )


def q_semdedup(sf_dir: str) -> rd.Dataset:
    """SemDeDup: semantic (embedding-space) dedup — k-means partitions the
    corpus, then each cluster is deduplicated internally by pairwise
    cosine (>= SEM_TAU keeps the lowest vec_id). The published recipe for
    sub-quadratic embedding dedup: the O(n^2) compare runs within
    clusters only, so total work is sum m_k^2 ~ n^2/K.

    Plan: the cached embedding working set -> Lloyd iterations (slim
    K x D combiner shuffles) -> assignment carrying the vectors -> ONE
    cluster-keyed exchange -> per-cluster vectorized mark. 100 TB: K
    scales as corpus/target-cluster-size (SemDeDup uses ~10^5 clusters at
    LAION scale) so a cluster stays one-task-sized; a pathological giant
    cluster can shard the prefix compare chunk-vs-earlier-chunks without
    changing the rule (decision for row i depends only on earlier rows)."""
    ds = _t_emb(sf_dir)
    cents = kmeans_iterate(ds, kmeans_init(ds), KM_ITERS)
    return (
        ds.map_batches(
            remote_fn(_QE, "sem_assign_batch", cents=cents.tolist()),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("cluster")
        .map_groups(remote_fn(_QE, "semdedup_cluster"), batch_format="pandas")
    )


def _t_emb(sf_dir: str) -> rd.Dataset:
    from .queries import _t

    return _t(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()


# --- cluster topic labeling: distinctive terms per k-means cluster ----------
TOPTERMS_K = 5
TOPTERMS_SCALE = 1_000_000


def topterms_cw_partial(batch: pa.Table) -> pa.Table:
    """(cluster, term, n) combiner over the joined (cluster, text) rows;
    whitespace tokens, empties dropped (both engines)."""
    clusters = batch["cluster"].to_pylist()
    texts = batch["text"].to_pylist()
    oc, ow = [], []
    for c, t in zip(clusters, texts):
        for w in (t or "").split(" "):
            if w:
                oc.append(int(c))
                ow.append(w)
    t2 = pa.table(
        {"cluster": pa.array(oc, pa.int64()), "term": pa.array(ow, pa.string())}
    )
    g = t2.group_by(["cluster", "term"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "cluster": g["cluster"],
            "term": g["term"],
            "n": g["count_all"],
        }
    )


def q_cluster_top_terms(sf_dir: str) -> pa.Table:
    """Topic labels for the k-means clusters (the c-TF-IDF / BERTopic
    labeling step, with an exact integer lift score): for each cluster,
    the TOPTERMS_K terms maximizing lift = (tf_cw / T_c) / (gf_w / G),
    i.e. within-cluster frequency over corpus frequency, as
    floor(tf * G * 1e6 / (gf * T_c)); ties to the lexicographically
    smaller term.

    Plan: the certified k-means assignment pass -> a slim (vec_id,
    cluster) x (doc_id, text) join -> per-batch (cluster, term) count
    combiner -> ONE (cluster, term)-keyed Sum. The reduced table is
    (K x vocabulary)-sized, so the lift/top-k finalize folds on the
    driver in exact Python ints (same bounded-pull class as the LM
    vocabulary) — at web scale the vocab cap (top-M terms by gf) is the
    documented knob."""
    from ..io import table_nbytes
    from ..joins import safe_join
    from .queries import _t

    assign = q_kmeans_clusters(sf_dir).select_columns(["vec_id", "cluster"])
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    joined = safe_join(
        assign, docs, on=("vec_id",), right_on=("doc_id",),
        assume_non_empty=True,
        left_nbytes=table_nbytes(sf_dir, "embeddings"),
        right_nbytes=table_nbytes(sf_dir, "documents"),
    )
    cw = (
        joined.map_batches(
            remote_fn(_QE, "topterms_cw_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["cluster", "term"])
        .aggregate(Sum("n", alias_name="tf"))
        .to_pandas()  # K x vocabulary rows — bounded
    )
    gf = cw.groupby("term")["tf"].sum().to_dict()
    tc = cw.groupby("cluster")["tf"].sum().to_dict()
    gtot = int(cw["tf"].sum())
    rows = []
    for c, t, tf in cw[["cluster", "term", "tf"]].itertuples(index=False):
        lift = int(tf) * gtot * TOPTERMS_SCALE // (int(gf[t]) * int(tc[c]))
        rows.append((int(c), str(t), int(tf), lift))
    rows.sort(key=lambda r: (r[0], -r[3], r[1]))
    out = []
    rnk, prev = 0, None
    for c, t, tf, lift in rows:
        rnk = rnk + 1 if c == prev else 1
        prev = c
        if rnk <= TOPTERMS_K:
            out.append((c, rnk, t, tf, lift))
    return pa.table(
        {
            "cluster": pa.array([r[0] for r in out], pa.int64()),
            "rnk": pa.array([r[1] for r in out], pa.int64()),
            "term": pa.array([r[2] for r in out], pa.string()),
            "tf": pa.array([r[3] for r in out], pa.int64()),
            "lift_x1e6": pa.array([r[4] for r in out], pa.int64()),
        }
    )


EMBED_QUERIES = {
    "lang_embedding_centroid": q_lang_embedding_centroid,
    "kmeans_clusters": q_kmeans_clusters,
    "pca_project": q_pca_project,
    "cluster_lang_purity": q_cluster_lang_purity,  # dump-backed oracle
    "semdedup": q_semdedup,  # dump-backed oracle
    "cluster_top_terms": q_cluster_top_terms,  # dump-backed oracle
}

EMBED_ORACLES = {
    "lang_embedding_centroid": SQL_LANG_EMBEDDING_CENTROID,
}
