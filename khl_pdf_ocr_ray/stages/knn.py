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


def _embed_matrix(df: pd.DataFrame) -> np.ndarray:
    """pandas path (driver-side / map_groups / dump twin)."""
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _embed_matrix_t(batch: pa.Table) -> np.ndarray:
    """Arrow path: the embedding list column -> (n, D) float64 through the
    flattened values buffer (no per-row stacking; float32 -> float64 is
    exact, so the doubles match the pandas path bit-for-bit)."""
    flat = batch["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    return flat.astype(np.float64).reshape(batch.num_rows, -1)


def _ids64(batch: pa.Table, col: str = "vec_id") -> np.ndarray:
    return np.asarray(batch[col].to_numpy(zero_copy_only=False), dtype=np.int64)


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-30)


_EMPTY_PARTIAL = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    }
)


def load_queries(sf_dir: str, n_queries: int, parity: int = None):
    """The (tiny) query set = lowest n vec_ids (optionally of one id
    parity — the alignment operator's "foreign side").

    Scale shape: a distributed sort+limit over the SLIM vec_id column
    picks the ids, then a filter-pushdown read fetches just those
    embeddings — the driver never materializes the corpus (in a real
    deployment the query set is user input and this helper disappears)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..io import read_parquet_clean

    from ..remote import remote_fn

    path = os.path.join(sf_dir, "embeddings.parquet")
    id_ds = read_parquet_clean(path, columns=["vec_id"])
    if parity is not None:
        id_ds = id_ds.map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.stages.knn", "snapshot_filter_batch", parity=parity
            ),
            batch_format="pyarrow",
        )
    ids = (
        id_ds.sort("vec_id")
        .limit(n_queries)
        .to_pandas()["vec_id"]
        .astype("int64")
        .tolist()
    )
    t = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=pc.field("vec_id").isin(ids),
    )
    df = t.to_pandas().sort_values("vec_id")
    q = _normalize(_embed_matrix(df))
    return df["vec_id"].to_numpy().astype(np.int64), q


def knn_partial_batch(
    batch: pa.Table, query_ids: list, q_ref, k: int
) -> pa.Table:
    """Local top-k of one batch against the broadcast query matrix.

    The batch is deduped by vec_id first: LSH probe reads deliver a vector
    once per probed bucket, and duplicate rows (identical sim, adjacent in
    the sort) could otherwise crowd a genuine top-k candidate out of this
    batch's local top-k — the union of per-batch top-k over DISTINCT
    candidates is guaranteed to contain the global top-k."""
    if batch.num_rows == 0:
        return _EMPTY_PARTIAL
    q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
    all_ids = _ids64(batch)
    keep = np.sort(np.unique(all_ids, return_index=True)[1])  # first per id
    if len(keep) < len(all_ids):
        batch = batch.take(keep)
    ids = all_ids[keep]
    x = _normalize(_embed_matrix_t(batch))
    sims = q @ x.T  # (nq, batch)
    qids = np.asarray(query_ids, dtype=np.int64)
    out_q, out_n, out_s = [], [], []
    for qi, qid in enumerate(qids):
        s = sims[qi]
        cand_idx = np.nonzero(ids != qid)[0]
        if cand_idx.size == 0:
            continue
        order = cand_idx[np.lexsort((ids[cand_idx], -s[cand_idx]))][:k]
        out_q.append(np.full(len(order), qid, dtype=np.int64))
        out_n.append(ids[order])
        out_s.append(s[order])  # full precision: the merge must rank
        # exactly as the oracle's ORDER BY sim DESC, not on rounded values
    if not out_q:
        return _EMPTY_PARTIAL
    return pa.table(
        {
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "sim": np.concatenate(out_s),
        }
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
    from ..io import read_parquet_clean

    ds = read_parquet_clean(
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
        batch_format="pyarrow",
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


def lsh_bucket_batch(batch: pa.Table) -> pa.Table:
    """Explode each embedding into its LSH_TABLES bucket rows (an Arrow
    take on the repeated row index — the list column is never unpacked
    into Python objects)."""
    keys = _bucket_keys(_embed_matrix_t(batch))
    rep = batch.select(["vec_id", "embedding"]).take(
        np.repeat(np.arange(batch.num_rows, dtype=np.int64), LSH_TABLES)
    )
    return rep.append_column("bucket", pa.array(keys.reshape(-1), pa.int64()))


def _index_dir(sf_dir: str, kind: str, params: str) -> str:
    """Deterministic cache location for a persisted ANN index."""
    import hashlib
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(path)
    # size+mtime_ns content fingerprint (same convention as
    # state/manifest.fragment_fingerprint): a regenerated file with equal
    # byte size must not serve a stale index
    key = hashlib.sha256(
        f"{path}:{st.st_size}:{st.st_mtime_ns}:{params}:v1".encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp/khlray_cache", f"annidx_{kind}_{key}")


def ensure_lsh_index(sf_dir: str) -> str:
    """Build (once, cached) the persisted LSH index: the embeddings table
    exploded into its LSH_TABLES bucket rows and written as parquet
    HASH-PARTITIONED BY BUCKET (hive layout, one directory per bucket).

    This is the 100 TB shape the round-1 version only described in prose:
    the expensive full-corpus bucketing pass runs once at index-build
    time; every query afterwards reads ONLY its probed bucket partitions
    (a pruned ``read_parquet`` over a handful of directories) instead of
    re-scanning and re-bucketing the corpus per call."""
    import os

    import ray.data as rd

    from ..remote import remote_fn
    from ..state.atomic import ensure_published

    out_dir = _index_dir(sf_dir, "lsh", f"t{LSH_TABLES}p{LSH_PLANES}")

    def _build(tmp_dir: str) -> None:
        from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean

        path = os.path.join(sf_dir, "embeddings.parquet")
        # fan-out sized from the input bytes (single-row-group driver file)
        ds = read_parquet_clean(path, columns=["vec_id", "embedding"]).repartition(
            blocks_for_bytes(input_nbytes(path))
        )
        ds.map_batches(
            remote_fn("khl_pdf_ocr_ray.stages.knn", "lsh_bucket_batch"),
            batch_format="pyarrow",
        ).write_parquet(tmp_dir, partition_cols=["bucket"])

    return ensure_published(out_dir, _build)


def ensure_lsh_index_snapshots(sf_dir: str) -> str:
    """The APPEND-ONLY index-maintenance path: build the LSH index from a
    base snapshot (even vec_ids), then append a second snapshot (odd
    vec_ids) as additional parquet files INSIDE the same bucket partition
    directories — no rewrite of existing files, which is how a persisted
    100 TB index absorbs a new crawl. Hive partition discovery treats a
    directory's files as a union, so every probe sees base+appended rows;
    bucket CONTENT equals the single-shot build's, hence probe results
    are bit-identical (asserted by the shared ann_lsh oracle and a test).
    Each snapshot write is a separate streaming pass; crash-safety comes
    from the atomic publish of the whole two-write build here — in
    production each append publishes a manifest like state/stage_ckpt.py."""
    import os

    from ..remote import remote_fn
    from ..state.atomic import ensure_published

    out_dir = _index_dir(sf_dir, "lshsnap", f"t{LSH_TABLES}p{LSH_PLANES}")

    def _build(tmp_dir: str) -> None:
        from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean

        path = os.path.join(sf_dir, "embeddings.parquet")
        nblocks = blocks_for_bytes(input_nbytes(path))
        for parity in (0, 1):  # snapshot 0 = base build, 1 = append
            ds = (
                read_parquet_clean(path, columns=["vec_id", "embedding"])
                .repartition(nblocks)
                .map_batches(
                    remote_fn(
                        "khl_pdf_ocr_ray.stages.knn",
                        "snapshot_filter_batch",
                        parity=parity,
                    ),
                    batch_format="pyarrow",
                )
                .map_batches(
                    remote_fn("khl_pdf_ocr_ray.stages.knn", "lsh_bucket_batch"),
                    batch_format="pyarrow",
                )
            )
            ds.write_parquet(tmp_dir, partition_cols=["bucket"])

    return ensure_published(out_dir, _build)


def snapshot_filter_batch(batch, parity: int):
    """Rows of one snapshot half (vec_id parity)."""
    import pyarrow.compute as pc

    mod = pc.subtract(
        batch["vec_id"], pc.multiply(pc.divide(batch["vec_id"], 2), 2)
    )
    return batch.filter(pc.equal(mod, parity))


def _probe_partitions(index_dir: str, col: str, wanted: set) -> list:
    """Parquet files of the probed hive partitions (only those that exist
    — empty buckets have no directory). Ray's read_parquet wants concrete
    file paths when given a list."""
    import glob
    import os

    files: list = []
    for key in sorted(wanted):
        files.extend(
            sorted(glob.glob(os.path.join(index_dir, f"{col}={key}", "*.parquet")))
        )
    return files


def ann_lsh(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    probes: int = 4,
    index_dir: str = None,
) -> pd.DataFrame:
    """Approximate top-k over the PERSISTED LSH index: compute the query's
    bucket keys (+1-bit-flip probes), then read only those bucket
    partitions and rank in-bucket candidates. Recall vs brute force is
    asserted in tests; at 100 TB the partition pruning means a query batch
    touches probes×tables directories, not the corpus. ``index_dir``
    overrides the index (the incremental-maintenance query probes the
    snapshot-appended index through this same path)."""
    import ray.data as rd

    from ..remote import remote_fn

    if index_dir is None:
        index_dir = ensure_lsh_index(sf_dir)
    qids, q = load_queries(sf_dir, n_queries)
    qkeys = _bucket_keys(q)  # (nq, tables)
    wanted = set()
    for row in qkeys:
        for key in row:
            wanted.add(int(key))
            # 1-bit-flip probes within the table; clamp so flips never
            # spill into the table-id bits (probes > LSH_PLANES would
            # probe ANOTHER table's keyspace and silently lose recall)
            for b in range(min(probes, LSH_PLANES)):
                wanted.add(int(key) ^ (1 << b))

    paths = _probe_partitions(index_dir, "bucket", wanted)
    if not paths:
        return knn_merge(pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []}), k)
    q_ref = ray.put(q)
    partials = (
        rd.read_parquet(paths, columns=["vec_id", "embedding"])
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.stages.knn",
                "knn_partial_batch",
                query_ids=[int(v) for v in qids],
                q_ref=q_ref,
                k=k,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return knn_merge(partials, k)


# --- margin-based embedding alignment (bitext-mining shape) ------------------
ALIGN_QUERIES = 64
ALIGN_MARGIN_E6 = 20_000  # absolute cosine margin: best - second >= 0.02


def align_merge(partials: pd.DataFrame, margin_e6: int) -> pd.DataFrame:
    """Driver-side merge of per-batch top-2 partials: global best + second
    per query; keep pairs whose fixed-point margin clears the threshold.
    The union of per-batch top-2 over distinct candidates contains the
    global top-2, so the merge is batching-invariant."""
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.drop_duplicates(["neighbor_id"]).sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        )
        if len(g) < 2:
            continue
        margin = np.floor((g["sim"].iloc[0] - g["sim"].iloc[1]) * 1e6 + 0.5)
        if margin >= margin_e6:
            out.append((int(qid), int(g["neighbor_id"].iloc[0]), int(margin)))
    return pd.DataFrame(
        out, columns=["query_id", "match_id", "margin_e6"]
    ).astype({"query_id": "int64", "match_id": "int64", "margin_e6": "int64"})


def embedding_align(
    sf_dir: str,
    n_queries: int = ALIGN_QUERIES,
    margin_e6: int = ALIGN_MARGIN_E6,
) -> pd.DataFrame:
    """Margin-based alignment of two corpus halves (the bitext-mining /
    cross-snapshot document-alignment recipe of Artetxe & Schwenk 2019,
    "Margin-based parallel corpus mining"): for each query vector of the
    odd-id half, its best even-id neighbor is a MATCH only when the best
    cosine beats the runner-up by a margin — absolute-difference margin,
    which needs exactly the top-2 the distributed partial top-k already
    computes. Plan: broadcast the bounded query matrix, per-batch top-2
    over the even half (the candidate corpus is never broadcast), tiny
    driver merge. 100 TB: identical shape — the probe set is bounded by
    construction (alignment runs query-side-batched), candidates stream."""
    import os

    import ray.data as rd

    from ..io import read_parquet_clean
    from ..remote import remote_fn

    qids, q = load_queries(sf_dir, n_queries, parity=1)
    q_ref = ray.put(q)
    path = os.path.join(sf_dir, "embeddings.parquet")
    partials = (
        read_parquet_clean(path, columns=["vec_id", "embedding"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.stages.knn", "snapshot_filter_batch", parity=0),
            batch_format="pyarrow",
        )
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.stages.knn",
                "knn_partial_batch",
                query_ids=[int(v) for v in qids],
                q_ref=q_ref,
                k=2,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return align_merge(partials, margin_e6)


# --- exact embedding near-dup (SQL-checkable) --------------------------------
TRIANGLE_BLOCKS = 8  # B: replication factor of the all-pairs triangle join


def triangle_replicate_batch(batch: pa.Table, n_blocks: int) -> pa.Table:
    """All-pairs triangle partitioning (the exact distributed form of a
    self cross-join): every vector in block g = vec_id % B is replicated to
    the B unordered block-pair keys {(min(g,o), max(g,o)) : o in 0..B-1},
    so each unordered vector pair meets in EXACTLY one group task. Work
    stays O(n^2) (the semantics are all-pairs) but memory per task is
    2 blocks and nothing is broadcast or driver-materialized — the
    round-1 design shipped the full normalized matrix via ray.put."""
    ids = _ids64(batch)
    n = len(ids)
    g = ids % n_blocks
    # fully vectorized replication (n x B): no per-row Python in the one
    # stage that touches every vector B times
    gi = np.repeat(g, n_blocks)
    other = np.tile(np.arange(n_blocks, dtype=np.int64), n)
    g1 = np.minimum(gi, other)
    g2 = np.maximum(gi, other)
    rep = batch.select(["vec_id", "embedding"]).take(
        np.repeat(np.arange(n, dtype=np.int64), n_blocks)
    )
    return pa.table(
        {
            "pair_key": g1 * n_blocks + g2,
            "grp": gi,
            "vec_id": rep["vec_id"],
            "embedding": rep["embedding"],
        }
    )


def triangle_block_pairs(group: pd.DataFrame, tau_e6: int, n_blocks: int) -> pd.DataFrame:
    """One block-pair task: exact cosine over members of blocks (g1, g2);
    emits vec_a < vec_b with cos >= tau. Same float64 math as the oracle
    (per-vector normalize, float64 dot), so the threshold boundary agrees
    bit-for-bit with the broadcast formulation."""
    empty = pd.DataFrame({"vec_a": [], "vec_b": []}).astype(
        {"vec_a": "int64", "vec_b": "int64"}
    )
    if group.empty:
        return empty
    key = int(group["pair_key"].iloc[0])
    g1, g2 = key // n_blocks, key % n_blocks
    tau = tau_e6 / 1e6
    if g1 == g2:
        ids = group["vec_id"].to_numpy().astype(np.int64)
        x = _normalize(_embed_matrix(group))
        sims = x @ x.T
        ia, ib = np.nonzero(sims >= tau)
        keep = ids[ia] < ids[ib]
        out_a = ids[ia[keep]]
        out_b = ids[ib[keep]]
    else:
        left = group[group["grp"] == g1]
        right = group[group["grp"] == g2]
        if left.empty or right.empty:
            return empty
        ids_l = left["vec_id"].to_numpy().astype(np.int64)
        ids_r = right["vec_id"].to_numpy().astype(np.int64)
        sims = _normalize(_embed_matrix(left)) @ _normalize(_embed_matrix(right)).T
        ia, ib = np.nonzero(sims >= tau)
        # blocks are disjoint (vec_id % B), so a != b always
        a = ids_l[ia]
        b = ids_r[ib]
        out_a = np.minimum(a, b)
        out_b = np.maximum(a, b)
    return pd.DataFrame({"vec_a": out_a, "vec_b": out_b}).astype(
        {"vec_a": "int64", "vec_b": "int64"}
    )


def embedding_dups(sf_dir: str, tau_e6: int = 350_000):
    """All pairs with cosine similarity >= tau — EXACT (matches the
    all-pairs SQL oracle) and fully distributed: a triangle-partitioned
    self-join (B-fold replication, B(B+1)/2 block-pair tasks) instead of
    broadcasting the full matrix. At 100 TB exact all-pairs is inherently
    O(n^2) compute, but this plan bounds every task to 2/B of the corpus
    and keeps the driver at O(1); the sub-quadratic APPROXIMATE path is
    the LSH/IVF bucket family (ann_lsh / ann_ivf)."""
    import os

    import ray.data as rd

    from ..remote import remote_fn

    from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = read_parquet_clean(path, columns=["vec_id", "embedding"]).repartition(
        blocks_for_bytes(input_nbytes(path))
    )
    replicated = ds.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "triangle_replicate_batch",
            n_blocks=TRIANGLE_BLOCKS,
        ),
        batch_format="pyarrow",
        batch_size=256,
    )
    return replicated.groupby("pair_key").map_groups(
        remote_fn(
            "khl_pdf_ocr_ray.stages.knn",
            "triangle_block_pairs",
            tau_e6=tau_e6,
            n_blocks=TRIANGLE_BLOCKS,
        ),
        batch_format="pandas",
    )


EMB_BUCKET_CAP = 1024  # max vectors per LSH bucket before pair generation
                       # truncates (deterministic: sorted vec_id) — the same
                       # hot-bucket discipline as stages/dedup.py BUCKET_CAP.
                       # Near-dup corpora produce pathological buckets (10^5
                       # boilerplate-identical embeddings in one bucket would
                       # be an O(10^10) single-task matmul); capping bounds
                       # every task to cap^2 dot products. Recall survives
                       # because multi-table LSH gives near-dup pairs many
                       # bucket chances and truncation keeps the cap LOWEST
                       # vec_ids, identical on every table they co-occur in.


def bucket_group_pairs(group: pd.DataFrame, tau_e6: int) -> pd.DataFrame:
    """All-pairs cosine within one LSH bucket; emits vec_a < vec_b with
    cos >= tau. Buckets larger than EMB_BUCKET_CAP truncate
    deterministically (sorted vec_id) BEFORE the matmul, and the pair
    emit is a vectorized upper-triangle mask — no per-pair Python."""
    empty = pd.DataFrame({"vec_a": [], "vec_b": []}).astype(
        {"vec_a": "int64", "vec_b": "int64"}
    )
    if len(group) < 2:
        return empty
    g = group.drop_duplicates("vec_id").sort_values("vec_id")
    if len(g) > EMB_BUCKET_CAP:
        g = g.iloc[:EMB_BUCKET_CAP]
    ids = g["vec_id"].to_numpy().astype(np.int64)
    x = _normalize(_embed_matrix(g))
    sims = x @ x.T
    # ids ascend, so the strict upper triangle IS the vec_a < vec_b set
    iu_r, iu_c = np.triu_indices(len(ids), k=1)
    keep = sims[iu_r, iu_c] >= tau_e6 / 1e6
    return pd.DataFrame(
        {"vec_a": ids[iu_r[keep]], "vec_b": ids[iu_c[keep]]}
    ).astype({"vec_a": "int64", "vec_b": "int64"})


def embedding_dups_lsh(sf_dir: str, tau_e6: int = 350_000):
    """APPROXIMATE embedding near-dup — the sub-quadratic 100 TB path:
    read the persisted LSH index (parquet partitioned by bucket), compare
    only WITHIN buckets, dedup pairs found in several tables. Work is
    sum(bucket_size^2) instead of n^2; recall vs the exact
    ``embedding_dups`` is asserted in tests (multi-table LSH catches most
    >= tau pairs; the exact operator remains the oracle-checked one)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..remote import remote_fn

    import os

    from ..io import blocks_for_bytes, input_nbytes

    index_dir = ensure_lsh_index(sf_dir)
    # plain read: index files are Ray-written (metadata-clean) and the
    # hive `bucket` partition column must be reconstructed from dir names
    ds = rd.read_parquet(index_dir)
    pairs = ds.groupby("bucket").map_groups(
        remote_fn("khl_pdf_ocr_ray.stages.knn", "bucket_group_pairs", tau_e6=tau_e6),
        batch_format="pandas",
    )
    # coalesce the tiny per-bucket pair blocks; sized from the (slim) pair
    # volume ~ input vector bytes, never a constant
    n_coalesce = blocks_for_bytes(
        input_nbytes(os.path.join(sf_dir, "embeddings.parquet")), lo=4
    )
    return (
        pairs.repartition(n_coalesce)
        .groupby(["vec_a", "vec_b"])
        .aggregate(Count(alias_name="n_buckets"))
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.stages.knn", "drop_n_buckets"),
            batch_format="pyarrow",
        )
    )


def drop_n_buckets(batch: pa.Table) -> pa.Table:
    return batch.drop_columns([c for c in batch.column_names if c == "n_buckets"])


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


def ivf_assign_batch(batch: pa.Table, centroids_ref) -> pa.Table:
    cents = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
    x = _embed_matrix_t(batch)
    assign = np.argmax(_normalize(x) @ _normalize(cents).T, axis=1).astype(np.int64)
    return pa.table(
        {"vec_id": batch["vec_id"], "ivf_list": assign, "embedding": batch["embedding"]}
    )


IVF_TRAIN_SAMPLE = 65_536  # k-means trains on the first N vec_ids (at real
                           # scale the quantizer never sees the full corpus)


def ensure_ivf_index(sf_dir: str) -> str:
    """Build (once, cached) the persisted IVF index:

    - ``centroids.parquet`` — the coarse k-means quantizer, trained on a
      bounded deterministic sample (first IVF_TRAIN_SAMPLE vec_ids);
    - data parquet HASH-PARTITIONED BY ``ivf_list`` — every embedding
      assigned to its nearest centroid by a distributed map, written
      hive-style so queries prune to their nprobe lists.

    The round-1 version re-ran k-means AND full-corpus assignment on
    every call; here both are one-time index-build costs and the
    ``ivf_list`` directory IS the partition key the docstring promised."""
    import os

    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..remote import remote_fn
    from ..state.atomic import ensure_published

    out_dir = _index_dir(sf_dir, "ivf", f"k{IVF_CLUSTERS}i{IVF_KMEANS_ITERS}s{IVF_TRAIN_SAMPLE}")

    def _build(tmp_dir: str) -> None:
        # bounded training sample fetched WITHOUT materializing the corpus
        # driver-side: distributed slim sort for the ids, pushdown read
        import pyarrow.compute as _pc

        from ..io import read_parquet_clean

        path = os.path.join(sf_dir, "embeddings.parquet")
        sample_ids = (
            read_parquet_clean(path, columns=["vec_id"])
            .sort("vec_id")
            .limit(IVF_TRAIN_SAMPLE)
            .to_pandas()["vec_id"]
            .astype("int64")
            .tolist()
        )
        sample = (
            _pq.read_table(
                path,
                columns=["vec_id", "embedding"],
                filters=_pc.field("vec_id").isin(sample_ids),
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        centroids = _ivf_centroids(_embed_matrix(sample))
        cents_ref = ray.put(centroids)
        from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean

        ds = read_parquet_clean(path, columns=["vec_id", "embedding"]).repartition(
            blocks_for_bytes(input_nbytes(path))
        )
        os.makedirs(tmp_dir, exist_ok=True)
        ds.map_batches(
            remote_fn("khl_pdf_ocr_ray.stages.knn", "ivf_assign_batch", centroids_ref=cents_ref),
            batch_format="pyarrow",
        ).write_parquet(os.path.join(tmp_dir, "lists"), partition_cols=["ivf_list"])
        _pq.write_table(
            pa.table({"centroid": [c.tolist() for c in centroids]}),
            os.path.join(tmp_dir, "centroids.parquet"),
        )

    return ensure_published(out_dir, _build)


def ensure_ivf_index_snapshots(sf_dir: str) -> str:
    """IVF index maintenance: assign and append a second snapshot (odd
    vec_ids) into the list partitions built from the base snapshot (even
    ids), with the quantizer FROZEN — the centroids come from the
    original full build (ensure_ivf_index) and are NOT retrained on
    append. Retraining on append would reshuffle every existing list;
    freezing is how production IVF indexes absorb new data (and why they
    are periodically rebuilt). Because the quantizer is identical and
    assignment is per-row, list content equals the single-shot build's —
    probes are bit-identical, certified by sharing ann_ivf's oracle."""
    import os
    import shutil

    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..remote import remote_fn
    from ..state.atomic import ensure_published

    base_dir = ensure_ivf_index(sf_dir)
    out_dir = _index_dir(
        sf_dir, "ivfsnap", f"k{IVF_CLUSTERS}i{IVF_KMEANS_ITERS}s{IVF_TRAIN_SAMPLE}"
    )

    def _build(tmp_dir: str) -> None:
        from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean

        centroids = np.stack(
            _pq.read_table(os.path.join(base_dir, "centroids.parquet"))
            .to_pandas()["centroid"]
            .to_numpy()
        ).astype(np.float64)
        cents_ref = ray.put(centroids)
        path = os.path.join(sf_dir, "embeddings.parquet")
        nblocks = blocks_for_bytes(input_nbytes(path))
        os.makedirs(tmp_dir, exist_ok=True)
        for parity in (0, 1):  # snapshot 0 = base build, 1 = append
            (
                read_parquet_clean(path, columns=["vec_id", "embedding"])
                .repartition(nblocks)
                .map_batches(
                    remote_fn(
                        "khl_pdf_ocr_ray.stages.knn",
                        "snapshot_filter_batch",
                        parity=parity,
                    ),
                    batch_format="pyarrow",
                )
                .map_batches(
                    remote_fn(
                        "khl_pdf_ocr_ray.stages.knn",
                        "ivf_assign_batch",
                        centroids_ref=cents_ref,
                    ),
                    batch_format="pyarrow",
                )
                .write_parquet(os.path.join(tmp_dir, "lists"), partition_cols=["ivf_list"])
            )
        shutil.copy2(
            os.path.join(base_dir, "centroids.parquet"),
            os.path.join(tmp_dir, "centroids.parquet"),
        )

    return ensure_published(out_dir, _build)


def ann_ivf(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    nprobe: int = 4,
    index_dir: str = None,
) -> pd.DataFrame:
    """IVF approximate top-k over the PERSISTED index: load the (tiny)
    centroid table, pick each query's nprobe nearest lists, read only
    those list partitions and rank candidates. ``index_dir`` overrides
    the index (the incremental-maintenance query probes the
    snapshot-appended index through this same path)."""
    import os

    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..remote import remote_fn

    if index_dir is None:
        index_dir = ensure_ivf_index(sf_dir)
    centroids = np.stack(
        _pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        .to_pandas()["centroid"]
        .to_numpy()
    ).astype(np.float64)

    qids, q = load_queries(sf_dir, n_queries)
    qsims = q @ _normalize(centroids).T
    probe_lists = set()
    for row in qsims:
        for c in np.argsort(-row)[:nprobe]:
            probe_lists.add(int(c))

    paths = _probe_partitions(os.path.join(index_dir, "lists"), "ivf_list", probe_lists)
    if not paths:
        return knn_merge(pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []}), k)
    q_ref = ray.put(q)
    partials = (
        rd.read_parquet(paths, columns=["vec_id", "embedding"])
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.stages.knn",
                "knn_partial_batch",
                query_ids=[int(v) for v in qids],
                q_ref=q_ref,
                k=k,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return knn_merge(partials, k)


# --- IVF-PQ: product-quantized inverted lists ---------------------------------
# The 100 TB embedding-storage technique (Jegou et al. 2011, "Product
# Quantization for Nearest Neighbor Search"): vectors live in the index as
# PQ_M uint8 codes (8 bytes for a 64-dim float32 vector - 32x smaller), and
# queries rank candidates by ADC (asymmetric distance computation) against
# per-query lookup tables, never touching raw vectors.
PQ_M = 8        # subspaces (64 dims -> 8 dims each)
PQ_K = 256      # centroids per subspace codebook (8-bit codes — standard PQ)
PQ_ITERS = 10   # deterministic Lloyd iterations per codebook
PQ_SHORTLIST = 32  # ADC candidates per query refined by exact rerank


def _pq_codebooks(x: np.ndarray) -> np.ndarray:
    """(N, D) training sample -> (PQ_M, PQ_K, D/PQ_M) codebooks; the same
    deterministic k-means style as _ivf_centroids (seeded init, fixed
    iterations), one sub-quantizer per subspace. Trains on NORMALIZED
    vectors because ADC approximates the cosine numerator."""
    xn = _normalize(x)
    d = xn.shape[1]
    ds = d // PQ_M
    rs = np.random.RandomState(0x9C7)
    books = np.empty((PQ_M, min(PQ_K, len(xn)), ds), dtype=np.float64)
    for m in range(PQ_M):
        sub = xn[:, m * ds:(m + 1) * ds]
        k = min(PQ_K, len(sub))
        cents = sub[rs.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(PQ_ITERS):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[m] = cents
    return books


def pq_encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(N, D) vectors -> (N, PQ_M) uint8 codes: per subspace the nearest
    codebook entry by L2 (ties to the lowest index via argmin). Encodes
    NORMALIZED vectors, matching the codebook training space."""
    xn = _normalize(x)
    ds = books.shape[2]
    codes = np.empty((len(xn), PQ_M), dtype=np.uint8)
    for m in range(PQ_M):
        sub = xn[:, m * ds:(m + 1) * ds]
        d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def ivfpq_encode_batch(batch: pa.Table, centroids_ref, books_ref) -> pa.Table:
    """Distributed index-build map: coarse list + packed PQ code per row.
    Only (vec_id, list, 8-byte code) is written - vectors never persist."""
    cents = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
    books = ray.get(books_ref) if not isinstance(books_ref, np.ndarray) else books_ref
    x = _embed_matrix_t(batch)
    assign = np.argmax(_normalize(x) @ _normalize(cents).T, axis=1).astype(np.int64)
    codes = pq_encode(x, books)
    return pa.table(
        {
            "vec_id": batch["vec_id"],
            "ivf_list": assign,
            "code": pa.array([c.tobytes() for c in codes], pa.binary()),
        }
    )


def ensure_ivfpq_index(sf_dir: str) -> str:
    """Build (once, cached) the persisted IVF-PQ index: coarse centroids +
    per-subspace codebooks trained on the same bounded deterministic
    sample as the flat IVF index, then ONE distributed encode pass whose
    output rows are (vec_id, ivf_list, 8-byte code) - hive-partitioned by
    list. Index bytes per vector: 8 + id, vs 256 for raw float32."""
    import os

    import pyarrow.parquet as _pq
    import pyarrow.compute as _pc

    from ..remote import remote_fn
    from ..state.atomic import ensure_published

    out_dir = _index_dir(
        sf_dir, "ivfpq", f"k{IVF_CLUSTERS}m{PQ_M}c{PQ_K}i{PQ_ITERS}s{IVF_TRAIN_SAMPLE}"
    )

    def _build(tmp_dir: str) -> None:
        from ..io import blocks_for_bytes, input_nbytes, read_parquet_clean

        path = os.path.join(sf_dir, "embeddings.parquet")
        sample_ids = (
            read_parquet_clean(path, columns=["vec_id"])
            .sort("vec_id")
            .limit(IVF_TRAIN_SAMPLE)
            .to_pandas()["vec_id"]
            .astype("int64")
            .tolist()
        )
        sample = (
            _pq.read_table(
                path,
                columns=["vec_id", "embedding"],
                filters=_pc.field("vec_id").isin(sample_ids),
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        xs = _embed_matrix(sample)
        centroids = _ivf_centroids(xs)
        books = _pq_codebooks(xs)
        cents_ref = ray.put(centroids)
        books_ref = ray.put(books)
        ds = read_parquet_clean(path, columns=["vec_id", "embedding"]).repartition(
            blocks_for_bytes(input_nbytes(path))
        )
        os.makedirs(tmp_dir, exist_ok=True)
        ds.map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.stages.knn",
                "ivfpq_encode_batch",
                centroids_ref=cents_ref,
                books_ref=books_ref,
            ),
            batch_format="pyarrow",
        ).write_parquet(os.path.join(tmp_dir, "lists"), partition_cols=["ivf_list"])
        _pq.write_table(
            pa.table({"centroid": [c.tolist() for c in centroids]}),
            os.path.join(tmp_dir, "centroids.parquet"),
        )
        _pq.write_table(
            pa.table(
                {
                    "m": pa.array(
                        [m for m in range(books.shape[0]) for _ in range(books.shape[1])],
                        pa.int64(),
                    ),
                    "j": pa.array(
                        [j for _ in range(books.shape[0]) for j in range(books.shape[1])],
                        pa.int64(),
                    ),
                    "entry": [books[m][j].tolist() for m in range(books.shape[0]) for j in range(books.shape[1])],
                }
            ),
            os.path.join(tmp_dir, "codebooks.parquet"),
        )

    return ensure_published(out_dir, _build)


def pq_adc_partial(
    batch: pa.Table, query_ids: list, luts_ref, k: int
) -> pa.Table:
    """Per-batch ADC partial top-k: decode each row's 8-byte code and rank
    by the per-query lookup-table sum, accumulated over subspaces in a
    FIXED order so the doubles match the sequential twin bit-for-bit."""
    if batch.num_rows == 0:
        return _EMPTY_PARTIAL
    luts = ray.get(luts_ref) if not isinstance(luts_ref, np.ndarray) else luts_ref
    all_ids = _ids64(batch)
    keep = np.sort(np.unique(all_ids, return_index=True)[1])  # first per id
    if len(keep) < len(all_ids):
        batch = batch.take(keep)
    ids = all_ids[keep]
    codes = np.frombuffer(
        b"".join(batch["code"].to_pylist()), dtype=np.uint8
    ).reshape(len(ids), PQ_M)
    qids = np.asarray(query_ids, dtype=np.int64)
    out_q, out_n, out_s = [], [], []
    for qi, qid in enumerate(qids):
        s = np.zeros(len(codes), dtype=np.float64)
        for m in range(PQ_M):  # fixed accumulation order (both engines)
            s += luts[qi, m, codes[:, m]]
        cand_idx = np.nonzero(ids != qid)[0]
        if cand_idx.size == 0:
            continue
        order = cand_idx[np.lexsort((ids[cand_idx], -s[cand_idx]))][:k]
        out_q.append(np.full(len(order), qid, dtype=np.int64))
        out_n.append(ids[order])
        out_s.append(s[order])
    if not out_q:
        return _EMPTY_PARTIAL
    return pa.table(
        {
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "sim": np.concatenate(out_s),
        }
    )


def pq_query_luts(q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(nq, D) normalized queries -> (nq, PQ_M, PQ_K) ADC tables:
    lut[qi, m, j] = dot(q_sub, codebook entry) - summing the per-subspace
    dots over m approximates the full cosine numerator."""
    ds = books.shape[2]
    nq = len(q)
    luts = np.empty((nq, books.shape[0], books.shape[1]), dtype=np.float64)
    for m in range(books.shape[0]):
        luts[:, m, :] = q[:, m * ds:(m + 1) * ds] @ books[m].T
    return luts


def ann_ivfpq(
    sf_dir: str, n_queries: int = 8, k: int = 5, nprobe: int = 4
) -> pd.DataFrame:
    """IVF-PQ approximate top-k over the persisted compressed index: the
    query's nprobe nearest coarse lists are read (8-byte codes only,
    never vectors), ranked by ADC lookup-table sums per batch, merged on
    the driver. Same probe/merge scaffolding as ann_ivf; the candidate
    payload is 32x smaller."""
    import os

    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..remote import remote_fn

    index_dir = ensure_ivfpq_index(sf_dir)
    centroids = np.stack(
        _pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        .to_pandas()["centroid"]
        .to_numpy()
    ).astype(np.float64)
    bt = _pq.read_table(os.path.join(index_dir, "codebooks.parquet")).to_pandas()
    n_m = int(bt["m"].max()) + 1
    n_j = int(bt["j"].max()) + 1
    books = np.zeros((n_m, n_j, len(bt["entry"].iloc[0])), dtype=np.float64)
    for _, r in bt.iterrows():
        books[int(r["m"]), int(r["j"])] = np.asarray(r["entry"], dtype=np.float64)

    qids, q = load_queries(sf_dir, n_queries)
    qsims = q @ _normalize(centroids).T
    probe_lists = set()
    for row in qsims:
        for c in np.argsort(-row)[:nprobe]:
            probe_lists.add(int(c))
    paths = _probe_partitions(os.path.join(index_dir, "lists"), "ivf_list", probe_lists)
    if not paths:
        return knn_merge(pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []}), k)
    luts_ref = ray.put(pq_query_luts(q, books))
    partials = (
        rd.read_parquet(paths, columns=["vec_id", "code"])
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.stages.knn",
                "pq_adc_partial",
                query_ids=[int(v) for v in qids],
                luts_ref=luts_ref,
                k=PQ_SHORTLIST,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    # reduce the per-batch partial top-lists to the GLOBAL ADC
    # top-PQ_SHORTLIST per query (tiny driver merge): the union of batch
    # locals is a superset whose extra members would depend on batch
    # boundaries — the global cut is the batching-invariant shortlist the
    # sequential twin computes
    cut = []
    for _qid, g in partials.groupby("query_id"):
        g = g.drop_duplicates(["neighbor_id"]).sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(PQ_SHORTLIST)
        cut.append(g)
    partials = pd.concat(cut, ignore_index=True) if cut else partials
    # refinement (the standard IVFPQ+refine step): the ADC shortlist —
    # PQ_SHORTLIST ids per query, a few hundred rows — is re-ranked with
    # EXACT cosine over a pushdown read of just those vectors, so the
    # compressed index pays its 32x storage win without giving up final
    # ranking quality (ADC alone ranks ~0.67 recall@5 on this corpus).
    short_ids = sorted(set(partials["neighbor_id"].astype("int64").tolist()))
    if not short_ids:
        return knn_merge(pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []}), k)
    import pyarrow.compute as _pc

    cand = (
        _pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            filters=_pc.field("vec_id").isin(short_ids),
        ).to_pandas()
    )
    # exact sims for the WHOLE shortlist (no pre-cut: a top-k before the
    # allowed filter could discard one query's allowed candidate in favor
    # of ids another query surfaced)
    exact = knn_partial_batch(
        pa.Table.from_pandas(cand, preserve_index=False),
        [int(v) for v in qids],
        q,
        len(cand),
    ).to_pandas()
    # keep only (query, neighbor) pairs the ADC shortlist proposed: the
    # rerank must not smuggle in candidates PQ never surfaced
    allowed = set(zip(partials["query_id"].astype("int64"),
                      partials["neighbor_id"].astype("int64")))
    exact = exact[[(int(a), int(b)) in allowed for a, b in
                   zip(exact["query_id"], exact["neighbor_id"])]]
    return knn_merge(exact, k)
