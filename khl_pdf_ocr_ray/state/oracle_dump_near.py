"""Sequential-oracle dumps for the near-dup / similarity-search family.

Round-2 closed the extraction surface's oracle gap with sequential dumps
(state/oracle_dump.py); this module does the same for the remaining
rows-only queries: ``minhash_dups``, ``minhash_clusters``,
``simhash_dups``, ``ngram_jaccard_dups``, ``ann_lsh``, ``ann_ivf`` and
``embedding_dups_lsh``.

Method: a plain SINGLE-PROCESS, SINGLE-BATCH execution — the same
per-record kernels (held independently by the pytest planted-pair /
recall / union-find-parity tests) applied to the whole corpus as ONE
pandas DataFrame, with the relational plumbing done by in-memory pandas
groupbys instead of Ray shuffles. The driver's DuckDB gate then certifies
that the DISTRIBUTED plan — band/bucket shuffles, signature hash-joins,
label-propagation rounds, partitioned-index probe reads — reproduces the
sequential semantics exactly. Grouping keys are global functions of the
row (band hash, shingle, bucket id), so per-shard grouping in the
distributed plan partitions the same groups the sequential groupby sees;
bucket truncation (sorted doc_id, BUCKET_CAP) is inside the shared
kernels and therefore identical on both sides.

For the union-find side of ``minhash_clusters`` the sequential
implementation is genuinely independent of the production path
(driver-side union-find vs distributed min-label propagation).

Dumps are cached on the content fingerprints (size + mtime_ns) of the
source tables plus an md5 of the kernel modules (stages/dedup.py,
stages/knn.py) — editing a kernel rebuilds the dumps.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .atomic import ensure_published

THRESHOLD_X100 = 70  # matches q_minhash_dups / q_ngram_jaccard_dups
TAU_E6 = 350_000     # matches q_embedding_dups_lsh
N_QUERIES, TOP_K, LSH_PROBES, IVF_NPROBE = 8, 5, 4, 4  # match queries.py


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def dumps_dir(sf_dir: str) -> str:
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = []
    for rel in (
        "stages/dedup.py",
        "stages/knn.py",
        "stages/sketch.py",
        "pipelines/queries_corpus.py",
        "pipelines/queries_search.py",
        "pipelines/queries_embed.py",
        "pipelines/queries_prep.py",    # trigram/chunk constants (recipe twin)
        "pipelines/queries_recipe.py",  # recipe kernels
        "pipelines/queries_kl.py",      # source-KL fixed-point constants
    ):
        with open(os.path.join(pkg, rel), "rb") as f:
            parts.append(hashlib.md5(f.read()).hexdigest())
    for name in ("documents.parquet", "embeddings.parquet", "events.parquet"):
        parts.append(_fingerprint(os.path.join(sf_dir, name)))
    key = hashlib.sha256(("|".join(parts) + "|v6").encode()).hexdigest()[:16]
    return os.path.join("/tmp/khlray_cache", f"oracle_dumps_near_{key}")


def _docs_with_variants_df(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of stages.dedup.docs_with_variants: documents plus
    a near-duplicate of every 3rd doc (same offset/suffix rules)."""
    from ..stages.dedup import VARIANT_OFFSET

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    var = docs[docs["doc_id"] % 3 == 0].copy()
    var["doc_id"] = var["doc_id"] + VARIANT_OFFSET
    var["text"] = var["text"].fillna("") + " near duplicate variant"
    return pd.concat([docs, var], ignore_index=True)


def _minhash_pairs(docs: pd.DataFrame) -> pd.DataFrame:
    from ..stages.dedup import (
        MINHASH_PERMS,
        bucket_pairs,
        minhash_band_batch,
        minhash_sig_batch,
    )

    docs_t = pa.Table.from_pandas(docs[["doc_id", "text"]], preserve_index=False)
    sigs = minhash_sig_batch(docs_t)  # (doc_id, sig_bin) Arrow table
    bands = minhash_band_batch(sigs)
    uniq = bucket_pairs(bands).to_pandas().drop_duplicates(["doc_a", "doc_b"])
    sig_ids = sigs["doc_id"].to_pylist()
    sig_mat = np.frombuffer(
        b"".join(sigs["sig_bin"].to_pylist()), dtype="<i8"
    ).reshape(len(sig_ids), MINHASH_PERMS)
    sig_map = {int(d): sig_mat[i] for i, d in enumerate(sig_ids)}
    if uniq.empty:
        return pd.DataFrame(
            {"doc_a": [], "doc_b": [], "est_jaccard_x100": []}
        ).astype({"doc_a": "int64", "doc_b": "int64", "est_jaccard_x100": "int64"})
    a = np.stack([sig_map[int(d)] for d in uniq["doc_a"]])
    b = np.stack([sig_map[int(d)] for d in uniq["doc_b"]])
    est = (100 * (a == b).mean(axis=1)).astype(np.int64)  # same expr as the
    # distributed pair_sig_agreement, so the floor at the threshold agrees
    out = pd.DataFrame(
        {"doc_a": uniq["doc_a"], "doc_b": uniq["doc_b"], "est_jaccard_x100": est}
    ).astype({"doc_a": "int64", "doc_b": "int64", "est_jaccard_x100": "int64"})
    return out[out["est_jaccard_x100"] >= THRESHOLD_X100].reset_index(drop=True)


def _simhash_pairs(docs: pd.DataFrame) -> pd.DataFrame:
    from ..stages.dedup import simhash_batch, simhash_bucket_pairs

    docs_t = pa.Table.from_pandas(docs[["doc_id", "text"]], preserve_index=False)
    bands = simhash_batch(docs_t)
    pairs = simhash_bucket_pairs(bands).to_pandas()
    if pairs.empty:
        return pairs
    return (
        pairs.groupby(["doc_a", "doc_b"], as_index=False)["hamming"]
        .min()
        .astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    )


def _ngram_pairs(docs: pd.DataFrame) -> pd.DataFrame:
    from ..stages.dedup import (
        jaccard_finalize,
        shingle_count_batch,
        shingle_doc_pairs,
        shingle_explode_batch,
    )

    docs_t = pa.Table.from_pandas(docs[["doc_id", "text"]], preserve_index=False)
    exploded = shingle_explode_batch(docs_t)
    raw = shingle_doc_pairs(exploded).to_pandas()
    empty = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard_x100": []}).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard_x100": "int64"}
    )
    if raw.empty:
        return empty
    common = raw.groupby(["doc_a", "doc_b"], as_index=False)["common"].sum()
    counts = shingle_count_batch(docs_t).to_pandas()
    m = common.merge(
        counts.rename(columns={"doc_id": "doc_a", "n_shingles": "n_a"}), on="doc_a"
    ).merge(counts.rename(columns={"doc_id": "doc_b", "n_shingles": "n_b"}), on="doc_b")
    return jaccard_finalize(
        pa.Table.from_pandas(m, preserve_index=False), THRESHOLD_X100
    ).to_pandas().reset_index(drop=True)


CONTAIN_X100 = 80  # matches q_ngram_containment


def _containment_pairs(docs: pd.DataFrame) -> pd.DataFrame:
    """Sequential twin of stages.dedup.ngram_containment: same capped
    inverted index and co-counts, containment finalize in both
    directions."""
    from ..stages.dedup import (
        containment_finalize,
        shingle_count_batch,
        shingle_doc_pairs,
        shingle_explode_batch,
    )

    docs_t = pa.Table.from_pandas(docs[["doc_id", "text"]], preserve_index=False)
    raw = shingle_doc_pairs(shingle_explode_batch(docs_t)).to_pandas()
    empty = pd.DataFrame(
        {"doc_sub": [], "doc_sup": [], "containment_x100": []}
    ).astype({"doc_sub": "int64", "doc_sup": "int64", "containment_x100": "int64"})
    if raw.empty:
        return empty
    common = raw.groupby(["doc_a", "doc_b"], as_index=False)["common"].sum()
    counts = shingle_count_batch(docs_t).to_pandas()
    m = common.merge(
        counts.rename(columns={"doc_id": "doc_a", "n_shingles": "n_a"}), on="doc_a"
    ).merge(counts.rename(columns={"doc_id": "doc_b", "n_shingles": "n_b"}), on="doc_b")
    return containment_finalize(
        pa.Table.from_pandas(m, preserve_index=False), CONTAIN_X100
    ).to_pandas().reset_index(drop=True)


def _embedding_align_seq(emb: pd.DataFrame) -> pd.DataFrame:
    """Sequential twin of stages.knn.embedding_align: one-batch top-2 over
    the full even half (the global top-2 by construction), same margin
    merge."""
    from ..stages.knn import (
        ALIGN_MARGIN_E6,
        ALIGN_QUERIES,
        _embed_matrix,
        _normalize,
        align_merge,
        knn_partial_batch,
    )

    odd = emb[emb["vec_id"] % 2 == 1].sort_values("vec_id").head(ALIGN_QUERIES)
    qids = odd["vec_id"].to_numpy().astype(np.int64)
    q = _normalize(_embed_matrix(odd))
    cands = emb[emb["vec_id"] % 2 == 0][["vec_id", "embedding"]]
    partials = knn_partial_batch(
        pa.Table.from_pandas(cands, preserve_index=False),
        [int(v) for v in qids], q, 2,
    ).to_pandas()
    return align_merge(partials, ALIGN_MARGIN_E6)


def _minhash_incremental_seq(docs: pd.DataFrame) -> pd.DataFrame:
    """Sequential twin of stages.dedup.minhash_dedup_incremental: base
    corpus signatures + the variant snapshot's, band-key candidate merge,
    same per-permutation verify."""
    from ..stages.dedup import (
        MINHASH_PERMS,
        VARIANT_OFFSET,
        minhash_band_batch,
        minhash_sig_batch,
    )

    base_sigs = minhash_sig_batch(
        pa.Table.from_pandas(docs[["doc_id", "text"]], preserve_index=False)
    )
    base_bands = minhash_band_batch(base_sigs).to_pandas()
    var = docs[docs["doc_id"] % 3 == 0].copy()
    var["doc_id"] = var["doc_id"] + VARIANT_OFFSET
    var["text"] = var["text"].fillna("") + " near duplicate variant"
    new_sigs = minhash_sig_batch(
        pa.Table.from_pandas(var[["doc_id", "text"]], preserve_index=False)
    )
    new_bands = minhash_band_batch(new_sigs).to_pandas()
    cand = new_bands.merge(
        base_bands, on=["band_id", "band_hash"], suffixes=("_new", "_old")
    )
    uniq = cand[["doc_id_new", "doc_id_old"]].drop_duplicates()
    empty = pd.DataFrame(
        {"doc_id": [], "old_doc": [], "est_jaccard_x100": []}
    ).astype({"doc_id": "int64", "old_doc": "int64", "est_jaccard_x100": "int64"})
    if uniq.empty:
        return empty

    def _mat(sigs):
        ids = sigs["doc_id"].to_pylist()
        m = np.frombuffer(b"".join(sigs["sig_bin"].to_pylist()), "<i8").reshape(
            len(ids), MINHASH_PERMS
        )
        return {int(d): m[i] for i, d in enumerate(ids)}

    nm, om = _mat(new_sigs), _mat(base_sigs)
    a = np.stack([nm[int(d)] for d in uniq["doc_id_new"]])
    b = np.stack([om[int(d)] for d in uniq["doc_id_old"]])
    est = (100 * (a == b).mean(axis=1)).astype(np.int64)
    out = pd.DataFrame(
        {
            "doc_id": uniq["doc_id_new"].astype("int64").to_numpy(),
            "old_doc": uniq["doc_id_old"].astype("int64").to_numpy(),
            "est_jaccard_x100": est,
        }
    )
    return out[out["est_jaccard_x100"] >= THRESHOLD_X100].reset_index(drop=True)


def _minhash_keep_best_seq(docs: pd.DataFrame) -> pd.DataFrame:
    """Sequential twin of the keep-best survivor selection: union-find
    clusters over the same pair set, then per-cluster argmax by
    (len DESC, doc_id ASC)."""
    from ..stages.dedup import union_find_clusters

    pairs = _minhash_pairs(docs)
    empty = pd.DataFrame(
        {"cluster_id": [], "survivor_id": [], "survivor_chars": [], "n_members": []}
    ).astype(
        {
            "cluster_id": "int64",
            "survivor_id": "int64",
            "survivor_chars": "int64",
            "n_members": "int64",
        }
    )
    if pairs.empty:
        return empty
    uf = union_find_clusters(pairs)
    lens = {int(d): len(t or "") for d, t in zip(docs["doc_id"], docs["text"])}
    uf = uf.assign(len_chars=[lens[int(d)] for d in uf["doc_id"]])
    out = []
    for cid, g in uf.groupby("cluster_id"):
        g = g.sort_values(["len_chars", "doc_id"], ascending=[False, True])
        out.append(
            (
                int(cid),
                int(g["doc_id"].iloc[0]),
                int(g["len_chars"].iloc[0]),
                int(g["cluster_size"].iloc[0]),
            )
        )
    return pd.DataFrame(
        out, columns=["cluster_id", "survivor_id", "survivor_chars", "n_members"]
    ).astype(
        {
            "cluster_id": "int64",
            "survivor_id": "int64",
            "survivor_chars": "int64",
            "n_members": "int64",
        }
    )


def _load_embeddings(sf_dir: str) -> pd.DataFrame:
    return pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).to_pandas()


def _queries(emb: pd.DataFrame):
    """Twin of stages.knn.load_queries (no Ray): lowest N vec_ids."""
    from ..stages.knn import _embed_matrix, _normalize

    q = emb.sort_values("vec_id").head(N_QUERIES)
    return q["vec_id"].to_numpy().astype(np.int64), _normalize(_embed_matrix(q))


def _ann_lsh_seq(emb: pd.DataFrame) -> pd.DataFrame:
    from ..stages.knn import (
        LSH_PLANES,
        _bucket_keys,
        knn_merge,
        knn_partial_batch,
        lsh_bucket_batch,
    )

    qids, q = _queries(emb)
    wanted = set()
    for row in _bucket_keys(q):
        for key in row:
            wanted.add(int(key))
            # same clamp as stages/knn.ann_lsh: bit flips must never
            # spill into the table-id bits
            for b in range(min(LSH_PROBES, LSH_PLANES)):
                wanted.add(int(key) ^ (1 << b))
    exploded = lsh_bucket_batch(
        pa.Table.from_pandas(emb[["vec_id", "embedding"]], preserve_index=False)
    ).to_pandas()
    cands = exploded[exploded["bucket"].isin(wanted)][["vec_id", "embedding"]]
    partials = knn_partial_batch(
        pa.Table.from_pandas(cands, preserve_index=False),
        [int(v) for v in qids], q, TOP_K,
    ).to_pandas()
    return knn_merge(partials, TOP_K)[["query_id", "neighbor_id", "rank"]]


def _ann_ivf_seq(emb: pd.DataFrame) -> pd.DataFrame:
    from ..stages.knn import (
        IVF_TRAIN_SAMPLE,
        _embed_matrix,
        _ivf_centroids,
        _normalize,
        knn_merge,
        knn_partial_batch,
    )

    sample = emb.sort_values("vec_id").head(IVF_TRAIN_SAMPLE)
    centroids = _ivf_centroids(_embed_matrix(sample))
    x = _embed_matrix(emb)
    assign = np.argmax(_normalize(x) @ _normalize(centroids).T, axis=1).astype(np.int64)
    qids, q = _queries(emb)
    probe = set()
    for row in q @ _normalize(centroids).T:
        for c in np.argsort(-row)[:IVF_NPROBE]:
            probe.add(int(c))
    cands = emb[np.isin(assign, sorted(probe))][["vec_id", "embedding"]]
    partials = knn_partial_batch(
        pa.Table.from_pandas(cands, preserve_index=False),
        [int(v) for v in qids], q, TOP_K,
    ).to_pandas()
    return knn_merge(partials, TOP_K)[["query_id", "neighbor_id", "rank"]]


def _ann_ivfpq_seq(emb: pd.DataFrame) -> pd.DataFrame:
    """IVF-PQ twin: the same coarse-quantizer/codebook/encode/ADC kernels
    single-process. Per-row doubles match the distributed plan exactly —
    codebooks train on the identical sorted sample, codes are per-row
    argmins, and the ADC sum accumulates subspaces in the same fixed
    order."""
    from ..stages.knn import (
        IVF_TRAIN_SAMPLE,
        PQ_SHORTLIST,
        _embed_matrix,
        _ivf_centroids,
        _normalize,
        _pq_codebooks,
        knn_merge,
        knn_partial_batch,
        pq_adc_partial,
        pq_encode,
        pq_query_luts,
    )

    sample = emb.sort_values("vec_id").head(IVF_TRAIN_SAMPLE)
    xs = _embed_matrix(sample)
    centroids = _ivf_centroids(xs)
    books = _pq_codebooks(xs)
    x = _embed_matrix(emb)
    assign = np.argmax(_normalize(x) @ _normalize(centroids).T, axis=1).astype(np.int64)
    codes = pq_encode(x, books)
    qids, q = _queries(emb)
    probe = set()
    for row in q @ _normalize(centroids).T:
        for c in np.argsort(-row)[:IVF_NPROBE]:
            probe.add(int(c))
    m = np.isin(assign, sorted(probe))
    cands = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].to_numpy()[m].astype(np.int64),
            "code": pd.Series([c.tobytes() for c in codes[m]], dtype=object),
        }
    )
    luts = pq_query_luts(q, books)
    partials = pq_adc_partial(
        pa.Table.from_pandas(cands, preserve_index=False),
        [int(v) for v in qids], luts, PQ_SHORTLIST,
    ).to_pandas()
    # refinement twin: exact rerank of the ADC shortlist, same allowed-set
    # rule as the distributed path
    short_ids = sorted(set(partials["neighbor_id"].astype("int64").tolist()))
    cand = emb[emb["vec_id"].isin(short_ids)][["vec_id", "embedding"]]
    exact = knn_partial_batch(
        pa.Table.from_pandas(cand, preserve_index=False),
        [int(v) for v in qids], q, len(cand),
    ).to_pandas()
    allowed = set(
        zip(partials["query_id"].astype("int64"), partials["neighbor_id"].astype("int64"))
    )
    exact = exact[
        [
            (int(a), int(b)) in allowed
            for a, b in zip(exact["query_id"], exact["neighbor_id"])
        ]
    ]
    return knn_merge(exact, TOP_K)[["query_id", "neighbor_id", "rank"]]


def _emb_lsh_pairs(emb: pd.DataFrame) -> pd.DataFrame:
    from ..stages.knn import bucket_group_pairs, lsh_bucket_batch

    exploded = lsh_bucket_batch(
        pa.Table.from_pandas(emb[["vec_id", "embedding"]], preserve_index=False)
    ).to_pandas()
    parts = [
        bucket_group_pairs(g, TAU_E6) for _, g in exploded.groupby("bucket", sort=False)
    ]
    pairs = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        {"vec_a": [], "vec_b": []}
    )
    return (
        pairs.drop_duplicates(["vec_a", "vec_b"])
        .astype({"vec_a": "int64", "vec_b": "int64"})
        .reset_index(drop=True)
    )


def _build_dumps(sf_dir: str, out_dir: str) -> None:
    from ..stages.dedup import union_find_clusters

    os.makedirs(out_dir, exist_ok=True)

    def _write(name: str, df: pd.DataFrame) -> None:
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(out_dir, name),
        )

    # source-KL drift: an INDEPENDENT Counter pass over the raw documents
    # (no shared rollup with the distributed plan; only the fixed-point
    # log2 form is shared, by definition)
    import collections

    import numpy as np
    import pyarrow.parquet as _pq

    raw = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    ).to_pandas()
    per_src: dict = collections.defaultdict(collections.Counter)
    for s, t in zip(raw["source"], raw["text"]):
        per_src[s].update((t or "").split(" "))
    corpus_c: collections.Counter = collections.Counter()
    for c in per_src.values():
        corpus_c.update(c)
    n_corpus = sum(corpus_c.values())
    _SC = 1 << 20

    def _lfx(c: int, n: int) -> int:
        return int(np.floor(np.log2(c / n) * _SC + 0.5))

    kl_rows = {"source": [], "n_tokens": [], "kl_fx": [], "kl_micro": []}
    for s in sorted(per_src):
        cnt = per_src[s]
        n_s = sum(cnt.values())
        kl = sum(
            c * (_lfx(c, n_s) - _lfx(corpus_c[w], n_corpus))
            for w, c in cnt.items()
        )
        kl_rows["source"].append(s)
        kl_rows["n_tokens"].append(n_s)
        kl_rows["kl_fx"].append(kl)
        kl_rows["kl_micro"].append(1_000_000 * kl // (n_s * _SC))
    _write(
        "source_kl_seq.parquet",
        pd.DataFrame(kl_rows).astype(
            {"n_tokens": "int64", "kl_fx": "int64", "kl_micro": "int64"}
        ),
    )

    docs = _docs_with_variants_df(sf_dir)
    mh = _minhash_pairs(docs)
    _write("minhash_pairs_seq.parquet", mh)
    # clusters: the INDEPENDENT sequential algorithm (union-find) over the
    # sequential pairs — double-checks both the pair set and the
    # distributed label propagation
    _write(
        "minhash_clusters_seq.parquet",
        union_find_clusters(mh).sort_values("doc_id").reset_index(drop=True),
    )
    _write("simhash_pairs_seq.parquet", _simhash_pairs(docs))
    _write("ngram_pairs_seq.parquet", _ngram_pairs(docs))
    _write("ngram_containment_seq.parquet", _containment_pairs(docs))
    raw_docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    _write("minhash_incr_seq.parquet", _minhash_incremental_seq(raw_docs))
    _write("minhash_keepbest_seq.parquet", _minhash_keep_best_seq(docs))

    # embedding-cluster twin: union-find (the independent sequential CC
    # algorithm) over pairs derived by DuckDB's OWN cosine — both the pair
    # rule and the clustering are independent of the production path
    import duckdb

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ep = duckdb.sql(
        f"""SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM '{emb_path}' a JOIN '{emb_path}' b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding)
              >= {TAU_E6} / 1000000.0"""
    ).df()
    _write(
        "emb_clusters_seq.parquet",
        union_find_clusters(ep).sort_values("doc_id").reset_index(drop=True),
    )

    emb = _load_embeddings(sf_dir)
    _write("ann_lsh_seq.parquet", _ann_lsh_seq(emb))
    _write("embedding_align_seq.parquet", _embedding_align_seq(emb))
    _write("ann_ivf_seq.parquet", _ann_ivf_seq(emb))
    _write("ann_ivfpq_seq.parquet", _ann_ivfpq_seq(emb))
    _write("emb_lsh_pairs_seq.parquet", _emb_lsh_pairs(emb))

    # HLL sketch twin: the whole user_id column in one sequential partial
    # (register max-merge is order-independent, so this is bit-identical
    # to the distributed batch-partial plan)
    from ..stages.sketch import hll_estimate, hll_sequential

    users = (
        pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
        .to_pandas()["user_id"]
        .to_numpy()
        .astype(np.int64)
    )
    est = hll_estimate(hll_sequential(users))
    _write(
        "hll_users_seq.parquet",
        pd.DataFrame({"distinct_users_est": pd.array([est], dtype="int64")}),
    )

    # grouped HLL twin: one sequential per-type pass (same register
    # max-merge argument as the global sketch)
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    ).to_pandas()
    rows = []
    for etype, g in ev.groupby("event_type", sort=True):
        est_t = hll_estimate(
            hll_sequential(g["user_id"].to_numpy().astype(np.int64))
        )
        rows.append({"event_type": etype, "distinct_users_est": est_t})
    _write(
        "hll_by_type_seq.parquet",
        pd.DataFrame(rows).astype({"distinct_users_est": "int64"}),
    )

    # count-min-sketch heavy hitters twin: one sequential partial over the
    # full bigram counter (cell-wise sum is order-independent, so it equals
    # any merge of batch partials), then the same min-over-rows estimates
    from collections import Counter

    from ..stages.sketch import cms_partial, cms_query

    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).to_pandas()["text"]
    c: Counter = Counter()
    for t in texts:
        ws = (t or "").split(" ")
        for i in range(len(ws) - 1):
            c[ws[i] + " " + ws[i + 1]] += 1
    keys = list(c.keys())
    cells = cms_partial(keys, np.fromiter(c.values(), dtype=np.int64, count=len(c)))
    est_all = cms_query(cells, keys)
    top = (
        pd.DataFrame({"bigram": keys, "n_est": est_all})
        .sort_values(["n_est", "bigram"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    _write("bigram_cms_seq.parquet", top)

    # BM25 twin: one sequential pass with the SAME tokenizer and
    # fixed-point scoring kernel as the distributed plan
    # (pipelines/queries_search.py). Scores are integer (x 2^20) sums of
    # per-term contributions whose only transcendental (idf) is a scalar
    # per query term, so equality is bit-exact under any batching. The
    # plumbing under test is the distributed stats combiner + in-batch
    # scoring + partial-top-k + final sort.
    from ..pipelines.queries_search import (
        BM25_TOP_K,
        bm25_doc_score_scaled,
        bm25_idf,
        doc_search_stats,
    )

    ddf = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    per_doc = []  # (doc_id, dl, {term: tf})
    total_tokens = 0
    for d, t in zip(ddf["doc_id"], ddf["text"]):
        dl, counts = doc_search_stats(t)
        total_tokens += dl
        if counts:
            per_doc.append((int(d), dl, counts))
    n_docs = len(ddf)
    avgdl = float(np.float64(total_tokens) / np.float64(n_docs))
    dfreq: Dict[str, int] = {}
    for _d, _dl, counts in per_doc:
        for term in counts:
            dfreq[term] = dfreq.get(term, 0) + 1
    idf_by_term = {t: bm25_idf(df_t, n_docs) for t, df_t in dfreq.items()}
    rows = [
        {
            "doc_id": d,
            "n_terms": len(counts),
            "score_x1m": bm25_doc_score_scaled(counts, dl, idf_by_term, avgdl),
        }
        for d, dl, counts in per_doc
    ]
    topk = (
        pd.DataFrame(rows)
        .astype({"doc_id": "int64", "n_terms": "int64", "score_x1m": "int64"})
        .sort_values(["score_x1m", "doc_id"], ascending=[False, True])
        .head(BM25_TOP_K)
        .reset_index(drop=True)
    )
    _write("bm25_topk_seq.parquet", topk)

    # k-means twin: the SAME kernels (km_assign / emb_fixed /
    # km_update_from_sums, pipelines/queries_embed.py) run single-process
    # over the full matrix. Assignment reduces distances along the dim
    # axis per row and centroid updates are exact integer sums, so the
    # distributed plan's per-batch partials reproduce these bits exactly;
    # the plumbing under test is the per-iteration combiner shuffle and
    # the centroid rebuild.
    from ..pipelines.queries_embed import (
        KM_ITERS,
        KM_K,
        emb_fixed,
        km_assign,
        km_update_from_sums,
    )

    full = emb.sort_values("vec_id")
    x = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    # same seed rule as queries_embed.kmeans_init: the KM_K LOWEST ids
    # (not `id < K`, which under-seeds a non-dense id space)
    cents = x[:KM_K]
    for _ in range(KM_ITERS):
        assign = km_assign(x, cents)
        fx = emb_fixed(x)
        sums = np.zeros((KM_K, x.shape[1]), dtype=np.int64)
        counts = np.zeros(KM_K, dtype=np.int64)
        for k in range(KM_K):
            m = assign == k
            counts[k] = int(m.sum())
            if counts[k]:
                sums[k] = fx[m].sum(axis=0)
        cents = km_update_from_sums(sums, counts, cents)
    final_assign = km_assign(x, cents)
    _write(
        "kmeans_seq.parquet",
        pd.DataFrame(
            {
                "vec_id": full["vec_id"].astype("int64"),
                "cluster": final_assign,
            }
        ),
    )

    # SemDeDup twin: the SAME semdedup_mark kernel per cluster over the
    # same final centroids' assignment; rows sorted by vec_id on both
    # sides, so each cluster's input matrix (and hence its doubles) is
    # identical to the distributed per-cluster task's.
    from ..pipelines.queries_embed import semdedup_mark

    sem_ids, sem_cl, sem_kept = [], [], []
    vec_ids = full["vec_id"].to_numpy(dtype=np.int64)
    for k in np.unique(final_assign):
        m = final_assign == k
        kept = semdedup_mark(x[m])  # full is vec_id-sorted already
        sem_ids.extend(vec_ids[m].tolist())
        sem_cl.extend([int(k)] * int(m.sum()))
        sem_kept.extend(kept.tolist())
    _write(
        "semdedup_seq.parquet",
        pd.DataFrame(
            {
                "vec_id": pd.Series(sem_ids, dtype="int64"),
                "cluster": pd.Series(sem_cl, dtype="int64"),
                "kept": pd.Series(sem_kept, dtype="bool"),
            }
        ),
    )

    # PCA twin: the SAME kernels (pca_moment_partial over the whole table
    # as one batch -> identical integer moment sums; pca_model_from_sums
    # -> identical doubles and eigh; pca_project_batch -> fixed-order dim
    # accumulation). The plumbing under test is the distributed moment
    # combiner shuffle and the broadcast projection.
    from ..pipelines.queries_embed import (
        pca_model_from_sums,
        pca_moment_partial,
        pca_project_batch,
    )

    full_t = pa.Table.from_pandas(
        full[["vec_id", "embedding"]], preserve_index=False
    )
    moments = pca_moment_partial(full_t).to_pandas()
    mean, comps = pca_model_from_sums(moments)
    _write(
        "pca_seq.parquet",
        pca_project_batch(full_t, mean.tolist(), comps.tolist()).to_pandas(),
    )

    # unigram-LM twin: same kernels single-process (integer counts and
    # per-doc integer log-prob sums are order-independent; the per-term
    # log2 doubles come from the one shared lm_model_from_counts).
    from ..pipelines.queries_corpus import (
        lm_count_partial,
        lm_model_from_counts,
        lm_score_batch,
    )

    docs_raw = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    model = lm_model_from_counts(lm_count_partial(docs_raw).to_pandas())
    _write("unigram_lm_seq.parquet", lm_score_batch(docs_raw, model).to_pandas())

    # bigram-LM twin: same kernels single-process (one full-table count
    # pass IS the reduced gram table; per-doc integer NLL sums are
    # order-independent; the per-pair log2 doubles come from the one
    # shared lm2_model_from_counts).
    from ..pipelines.queries_corpus import (
        lm2_count_partial,
        lm2_model_from_counts,
        lm2_score_batch,
    )

    model2 = lm2_model_from_counts(lm2_count_partial(docs_raw).to_pandas())
    _write(
        "bigram_lm_seq.parquet", lm2_score_batch(docs_raw, model2).to_pandas()
    )

    # DSIR twin: same count/model/score kernels single-process (integer
    # bucket counts and per-doc integer weight sums are order-independent;
    # the per-bucket log2 doubles come from the one shared
    # dsir_model_from_counts); selection = the same (logw DESC, id ASC)
    # head in pandas.
    from ..pipelines.queries_corpus import (
        DSIR_KEEP,
        dsir_count_partial,
        dsir_model_from_counts,
        dsir_score_batch,
    )

    docs_dsir = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    ratios = dsir_model_from_counts(dsir_count_partial(docs_dsir).to_pandas())
    scored = dsir_score_batch(docs_dsir, ratios).to_pandas()
    _write(
        "dsir_topk_seq.parquet",
        scored.sort_values(["logw_fx", "doc_id"], ascending=[False, True]).head(
            DSIR_KEEP
        ),
    )

    # domain-classifier twin: the same gradient/update/score kernels with
    # the whole table as ONE batch — the per-batch combiner already
    # aggregates, so the distributed groupby-Sum is the only plumbing
    # under test (per-doc doubles share operands; contributions floor to
    # int64 before any sum).
    from ..pipelines.queries_corpus import (
        LR_ITERS,
        DSIR_B,
        lr_grad_partial,
        lr_score_batch,
        lr_train_input,
        lr_update,
    )

    train_lr = lr_train_input(docs_dsir)
    w_lr = [0] * DSIR_B
    b_lr = 0
    for _ in range(LR_ITERS):
        g = lr_grad_partial(train_lr, w_lr, b_lr).to_pandas()
        w_lr, b_lr = lr_update(w_lr, b_lr, g)
    _write(
        "domain_clf_seq.parquet", lr_score_batch(train_lr, w_lr, b_lr).to_pandas()
    )

    # llm_corpus_recipe twin: the SAME stage kernels chained sequentially
    # with pandas plumbing (filter -> md5-min dedup -> eval-trigram
    # decontamination -> chunk accounting). The distributed plan under
    # test is the 5-exchange composition.
    from ..pipelines.queries_prep import trigram_explode
    from ..pipelines.queries_recipe import (
        chunk_stats_partial,
        recipe_filter_batch,
        recipe_hash_batch,
        recipe_input_batch,
    )

    docs3 = recipe_input_batch(
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "text"],
        )
    )
    recipe_model = lm_model_from_counts(lm_count_partial(docs3).to_pandas())
    surv = recipe_filter_batch(docs3, recipe_model)
    hdf = recipe_hash_batch(surv).to_pandas()
    keep_ids = set(hdf.groupby("text_hash")["doc_id"].min())
    surv_pd = surv.to_pandas()
    dedup_pd = surv_pd[surv_pd["doc_id"].isin(keep_ids)]
    ev_set = set(trigram_explode(docs3, eval_side=True).to_pandas()["ng"])
    tr = trigram_explode(
        pa.table(
            {
                "doc_id": pa.array(dedup_pd["doc_id"], pa.int64()),
                "text": pa.array(dedup_pd["text"], pa.string()),
            }
        ),
        eval_side=False,
    ).to_pandas()
    flagged = set(tr[tr["ng"].isin(ev_set)]["doc_id"])
    clean_pd = dedup_pd[~dedup_pd["doc_id"].isin(flagged)]
    stats = chunk_stats_partial(
        pa.table(
            {
                "lang": pa.array(clean_pd["lang"], pa.string()),
                "text": pa.array(clean_pd["text"], pa.string()),
            }
        )
    ).to_pandas()
    _write("llm_recipe_seq.parquet", stats)

    # T5 span corruption: ONE sequential pass of the same batch kernel
    from ..pipelines.queries_prep import span_corruption_batch

    span_docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    _write("span_corruption_seq.parquet", span_corruption_batch(span_docs).to_pandas())


def ensure_dumps(sf_dir: str) -> str:
    out_dir = dumps_dir(sf_dir)
    return ensure_published(out_dir, lambda tmp: _build_dumps(sf_dir, tmp))


def near_oracle_sqls(sf_dir: str) -> Dict[str, str]:
    """Oracle SQL for the near-dup/ANN family (dumps built on demand)."""
    d = ensure_dumps(sf_dir)

    def p(name: str) -> str:
        return os.path.join(d, name)

    from ..pipelines.queries_contrastive import contrastive_oracle_sql
    from ..pipelines.queries_dupmatrix import dupmatrix_oracle_sql

    return {
        "dup_source_matrix": dupmatrix_oracle_sql(p("minhash_pairs_seq.parquet")),
        "contrastive_pairs": contrastive_oracle_sql(
            p("minhash_clusters_seq.parquet")
        ),
        "minhash_dups": f"SELECT doc_a, doc_b, est_jaccard_x100 FROM read_parquet('{p('minhash_pairs_seq.parquet')}')",
        "source_kl_drift": f"SELECT source, n_tokens, kl_fx, kl_micro FROM read_parquet('{p('source_kl_seq.parquet')}')",
        "minhash_clusters": f"SELECT doc_id, cluster_id, cluster_size, keep FROM read_parquet('{p('minhash_clusters_seq.parquet')}')",
        "simhash_dups": f"SELECT doc_a, doc_b, hamming FROM read_parquet('{p('simhash_pairs_seq.parquet')}')",
        "ngram_jaccard_dups": f"SELECT doc_a, doc_b, jaccard_x100 FROM read_parquet('{p('ngram_pairs_seq.parquet')}')",
        "ngram_containment": f"SELECT doc_sub, doc_sup, containment_x100 FROM read_parquet('{p('ngram_containment_seq.parquet')}')",
        "minhash_incremental": f"SELECT doc_id, old_doc, est_jaccard_x100 FROM read_parquet('{p('minhash_incr_seq.parquet')}')",
        "minhash_keep_best": f"SELECT cluster_id, survivor_id, survivor_chars, n_members FROM read_parquet('{p('minhash_keepbest_seq.parquet')}')",
        "ann_lsh": f"SELECT query_id, neighbor_id, rank FROM read_parquet('{p('ann_lsh_seq.parquet')}')",
        "embedding_align": f"SELECT query_id, match_id, margin_e6 FROM read_parquet('{p('embedding_align_seq.parquet')}')",
        # the appended-snapshot index holds the same bucket content, so the
        # incremental query must reproduce the SAME sequential twin
        "ann_lsh_incremental": f"SELECT query_id, neighbor_id, rank FROM read_parquet('{p('ann_lsh_seq.parquet')}')",
        "ann_ivf": f"SELECT query_id, neighbor_id, rank FROM read_parquet('{p('ann_ivf_seq.parquet')}')",
        "ann_ivf_incremental": f"SELECT query_id, neighbor_id, rank FROM read_parquet('{p('ann_ivf_seq.parquet')}')",
        "ann_ivfpq": f"SELECT query_id, neighbor_id, rank FROM read_parquet('{p('ann_ivfpq_seq.parquet')}')",
        "embedding_dups_lsh": f"SELECT vec_a, vec_b FROM read_parquet('{p('emb_lsh_pairs_seq.parquet')}')",
        "embedding_clusters": f"SELECT doc_id, cluster_id, cluster_size, keep FROM read_parquet('{p('emb_clusters_seq.parquet')}')",
        "hll_distinct_users": f"SELECT distinct_users_est FROM read_parquet('{p('hll_users_seq.parquet')}')",
        "bigram_topk_cms": f"SELECT bigram, n_est FROM read_parquet('{p('bigram_cms_seq.parquet')}')",
        "hll_users_by_type": f"SELECT event_type, distinct_users_est FROM read_parquet('{p('hll_by_type_seq.parquet')}')",
        "bm25_topk": f"SELECT doc_id, n_terms, score_x1m FROM read_parquet('{p('bm25_topk_seq.parquet')}')",
        "kmeans_clusters": f"SELECT vec_id, cluster FROM read_parquet('{p('kmeans_seq.parquet')}')",
        # cluster topic labels: independent relational derivation (UNNEST
        # + windows) over the kmeans twin's assignments
        "cluster_top_terms": f"""
WITH a AS (SELECT vec_id, cluster FROM read_parquet('{p('kmeans_seq.parquet')}')),
words AS (
  SELECT a.cluster, t.w AS term
  FROM a JOIN documents d ON d.doc_id = a.vec_id,
       UNNEST(string_split(coalesce(d.text, ''), ' ')) AS t(w)
  WHERE t.w <> ''),
cw AS (SELECT cluster, term, CAST(count(*) AS HUGEINT) AS tf
       FROM words GROUP BY 1, 2),
gf AS (SELECT term, CAST(sum(tf) AS HUGEINT) AS gf FROM cw GROUP BY 1),
tc AS (SELECT cluster, CAST(sum(tf) AS HUGEINT) AS tc FROM cw GROUP BY 1),
g AS (SELECT CAST(sum(tf) AS HUGEINT) AS gtot FROM cw),
s AS (
  SELECT cw.cluster, cw.term, CAST(cw.tf AS BIGINT) AS tf,
         CAST(cw.tf * g.gtot * 1000000 // (gf.gf * tc.tc) AS BIGINT)
           AS lift_x1e6
  FROM cw
  JOIN gf ON cw.term = gf.term
  JOIN tc ON cw.cluster = tc.cluster
  CROSS JOIN g)
SELECT cluster, rnk, term, tf, lift_x1e6 FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY cluster
            ORDER BY lift_x1e6 DESC, term) AS BIGINT) AS rnk
  FROM s) WHERE rnk <= 5
""",
        "semdedup": f"SELECT vec_id, cluster, kept FROM read_parquet('{p('semdedup_seq.parquet')}')",
        "pca_project": f"SELECT vec_id, pc1_fx, pc2_fx FROM read_parquet('{p('pca_seq.parquet')}')",
        "unigram_logprob": f"SELECT doc_id, n_tokens, neg_logprob_fx FROM read_parquet('{p('unigram_lm_seq.parquet')}')",
        "bigram_logprob": f"SELECT doc_id, n_bigrams, nll2_fx FROM read_parquet('{p('bigram_lm_seq.parquet')}')",
        "dsir_topk": f"SELECT doc_id, n_feats, logw_fx FROM read_parquet('{p('dsir_topk_seq.parquet')}')",
        "domain_classifier": f"SELECT doc_id, y, prob_fx, pred_target FROM read_parquet('{p('domain_clf_seq.parquet')}')",
        # ccnet_buckets: the scores are the certified unigram twin's; the
        # NTILE is an INDEPENDENT relational derivation in SQL of what the
        # distributed sort + two-level rank assignment computes
        "ccnet_buckets": f"""
SELECT s.doc_id, d.lang, s.neg_logprob_fx,
       CAST(ntile(3) OVER (PARTITION BY d.lang
                           ORDER BY s.neg_logprob_fx, s.doc_id) AS BIGINT)
         AS bucket
FROM read_parquet('{p('unigram_lm_seq.parquet')}') s
JOIN documents d ON s.doc_id = d.doc_id
""",
        "llm_corpus_recipe": f"SELECT lang, n_docs, n_chunks, n_tokens FROM read_parquet('{p('llm_recipe_seq.parquet')}')",
        "span_corruption": f"SELECT doc_id, n_spans, input_text, target_text FROM read_parquet('{p('span_corruption_seq.parquet')}')",
        # purity: the contingency recomputed in SQL over the kmeans twin's
        # assignments joined to the documents view — an INDEPENDENT
        # relational derivation of what the distributed join+Count builds
        "cluster_lang_purity": f"""
WITH a AS (SELECT vec_id, cluster FROM read_parquet('{p('kmeans_seq.parquet')}')),
c AS (SELECT a.cluster, d.lang, count(*) AS n
      FROM a JOIN documents d ON a.vec_id = d.doc_id GROUP BY 1, 2),
r AS (SELECT cluster, lang, n,
             row_number() OVER (PARTITION BY cluster ORDER BY n DESC, lang) AS rk,
             sum(n) OVER (PARTITION BY cluster) AS n_vecs
      FROM c)
SELECT cluster, CAST(n_vecs AS BIGINT) AS n_vecs, lang AS top_lang,
       CAST(n AS BIGINT) AS top_n
FROM r WHERE rk = 1
""",
    }
