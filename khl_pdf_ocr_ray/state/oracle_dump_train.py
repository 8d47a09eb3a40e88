"""Sequential-oracle dumps for the round-4 training-engine operators
(pipelines/queries_train.py): ``bpe_merges`` and ``compression_ratio``.

Same method as oracle_dump_near.py: a single-process, single-batch
execution of the SAME kernels over the whole documents table, with the
relational plumbing done by in-memory Arrow group_bys instead of Ray
shuffles. Separate cache key (this module + queries_train.py + the
documents fingerprint) so iterating on these operators never rebuilds
the expensive near-dup/ANN dump family.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict

import pyarrow as pa
import pyarrow.parquet as pq

from .atomic import ensure_published


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def dumps_dir(sf_dir: str) -> str:
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = []
    for rel in (
        "pipelines/queries_train.py",
        "pipelines/queries_graph.py",  # coreness twin shares the edge rule
        "pipelines/queries_layout.py",  # compaction FFD kernel (shared)
        "pipelines/queries_cover.py",   # set-cover tokenizer + greedy (shared)
        "state/oracle_dump_train.py",
        "stages/dedup.py",  # variant-corpus rule (cdc twin input)
    ):
        with open(os.path.join(pkg, rel), "rb") as f:
            parts.append(hashlib.md5(f.read()).hexdigest())
    parts.append(_fingerprint(os.path.join(sf_dir, "documents.parquet")))
    key = hashlib.sha256(("|".join(parts) + "|v1").encode()).hexdigest()[:16]
    return os.path.join("/tmp/khlray_cache", f"oracle_dumps_train_{key}")


def _bpe_merges_seq(docs: pa.Table) -> pa.Table:
    """Sequential twin: the distributed plan's kernels run single-batch;
    the vocabulary groupby and per-round pair groupby collapse to one
    in-memory Arrow group_by each — integer counts, identical bits."""
    from ..functions.arrowkit import select_rename
    from ..pipelines.queries_train import (
        BPE_MERGES,
        bpe_apply_merge,
        bpe_best_pair,
        bpe_pair_partial,
        bpe_symbolize,
        bpe_word_partial,
    )

    wt = bpe_word_partial(docs)
    vocab = wt.group_by("word").aggregate([("n", "sum")])
    syms = bpe_symbolize(select_rename(vocab, word="word", n="n_sum"))
    rank, left, right, merged, n = [], [], [], [], []
    for r in range(1, BPE_MERGES + 1):
        pairs = bpe_pair_partial(syms)  # single batch == global counts
        best = bpe_best_pair(pairs)
        if best is None:
            break
        bl, br, bn = best
        rank.append(r)
        left.append(bl)
        right.append(br)
        merged.append(bl + br)
        n.append(bn)
        syms = bpe_apply_merge(syms, bl, br)
    return pa.table(
        {
            "merge_rank": pa.array(rank, pa.int64()),
            "lhs": pa.array(left, pa.string()),
            "rhs": pa.array(right, pa.string()),
            "merged": pa.array(merged, pa.string()),
            "n": pa.array(n, pa.int64()),
        }
    )


def _cdc_dedup_seq(sf_dir: str) -> pa.Table:
    """Sequential CDC twin: same chunking/hash kernels over the planted-
    variant corpus, winner pick + join as in-memory pandas merges."""
    from ..pipelines.queries_train import cdc_doc_partial, cdc_occurrence_partial
    from .oracle_dump_near import _docs_with_variants_df

    dv = _docs_with_variants_df(sf_dir)
    occ = cdc_occurrence_partial(
        pa.table(
            {
                "doc_id": pa.array(dv["doc_id"].tolist(), pa.int64()),
                "text": pa.array(dv["text"].tolist(), pa.string()),
            }
        )
    ).to_pandas()
    first = occ.groupby("chash", as_index=False)["pos"].min()
    first = first.rename(columns={"pos": "first_pos"})
    j = occ.merge(first, on="chash")
    acc = cdc_doc_partial(
        pa.table(
            {
                "doc_id": pa.array(j["doc_id"].tolist(), pa.int64()),
                "clen": pa.array(j["clen"].tolist(), pa.int64()),
                "pos": pa.array(j["pos"].tolist(), pa.int64()),
                "first_pos": pa.array(j["first_pos"].tolist(), pa.int64()),
            }
        )
    )  # single batch == global per-doc sums
    return acc


def _bpe_encode_seq(docs: pa.Table, merges_t: pa.Table) -> pa.Table:
    """Sequential encode twin: same vocabulary + encode kernels, single
    batch, deterministic (n desc, token asc) top-k on the driver."""
    import numpy as np

    from ..functions.arrowkit import select_rename
    from ..pipelines.queries_train import (
        BPE_ENCODE_TOP_K,
        bpe_encode_partial,
        bpe_word_partial,
    )

    wt = bpe_word_partial(docs)
    vocab = select_rename(
        wt.group_by("word").aggregate([("n", "sum")]), word="word", n="n_sum"
    )
    merges = list(zip(merges_t["lhs"].to_pylist(), merges_t["rhs"].to_pylist()))
    tok = bpe_encode_partial(vocab, merges)  # single batch == global counts
    n = tok["n"].to_numpy(zero_copy_only=False)
    t = tok["token"].to_numpy(zero_copy_only=False)
    order = np.lexsort((t, -n))[:BPE_ENCODE_TOP_K]
    return tok.take(order)


def _build_dumps(sf_dir: str, tmp_dir: str) -> None:
    from ..pipelines.queries_train import compress_ratio_batch

    os.makedirs(tmp_dir, exist_ok=True)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pq.write_table(
        compress_ratio_batch(docs), os.path.join(tmp_dir, "compress_seq.parquet")
    )
    merges_t = _bpe_merges_seq(docs.select(["text"]))
    pq.write_table(merges_t, os.path.join(tmp_dir, "bpe_merges_seq.parquet"))
    pq.write_table(
        _bpe_encode_seq(docs.select(["text"]), merges_t),
        os.path.join(tmp_dir, "bpe_encode_seq.parquet"),
    )
    pq.write_table(
        _bpe_fertility_seq(sf_dir, merges_t),
        os.path.join(tmp_dir, "bpe_fertility_seq.parquet"),
    )
    pq.write_table(
        _cdc_dedup_seq(sf_dir), os.path.join(tmp_dir, "cdc_dedup_seq.parquet")
    )
    pq.write_table(
        _temperature_sample_seq(sf_dir),
        os.path.join(tmp_dir, "temperature_seq.parquet"),
    )
    pq.write_table(
        _coreness_seq(sf_dir), os.path.join(tmp_dir, "coreness_seq.parquet")
    )
    pq.write_table(
        _compaction_seq(sf_dir), os.path.join(tmp_dir, "compaction_seq.parquet")
    )
    pq.write_table(
        _source_cover_seq(sf_dir),
        os.path.join(tmp_dir, "source_cover_seq.parquet"),
    )


def _source_cover_seq(sf_dir: str) -> pa.Table:
    """Sequential set-cover twin: the whole documents table through the
    SAME tokenizer kernel as ONE batch, a pandas OR-fold for the per-gram
    source masks (no sharding — the fold is associative, so shard
    partitioning cannot change it), then the SHARED greedy_cover kernel.
    The gate certifies the sharded distributed fold + mask-keyed Sum
    reproduce this exactly."""
    import numpy as np

    from ..pipelines.queries_cover import (
        cover_pairs_partial,
        greedy_cover,
        source_list,
    )

    sources = source_list(sf_dir)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )
    pairs = cover_pairs_partial(docs, sources).to_pandas()
    masks = pairs.groupby("gram")["src_bit"].apply(
        lambda srs: int(np.bitwise_or.reduce(srs.to_numpy(dtype=np.int64)))
    )
    hist = (
        masks.to_frame("mask").groupby("mask", as_index=False).size()
        .rename(columns={"size": "n_grams"})
    )
    out = greedy_cover(
        hist["mask"].to_numpy(), hist["n_grams"].to_numpy(), sources
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _compaction_seq(sf_dir: str) -> pa.Table:
    """Sequential compaction-plan twin: the whole file inventory in one
    pandas frame, sharded and packed with the SAME ffd_pack kernel the
    distributed map_groups stage runs — the gate certifies the
    distributed inventory aggregation + per-shard packing reproduces
    this exactly."""
    import numpy as np

    from ..pipelines.queries_layout import (
        BIN_CAP,
        BIN_STRIDE,
        FILE_DOCS,
        PLAN_SHARDS,
        ffd_pack,
    )

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    ).to_pandas()
    docs["file_id"] = docs["doc_id"].to_numpy() // FILE_DOCS
    inv = (
        docs.groupby("file_id", as_index=False)["n_chars"]
        .sum()
        .rename(columns={"n_chars": "size_chars"})
    )
    fid = inv["file_id"].to_numpy().astype(np.int64)
    size = inv["size_chars"].to_numpy().astype(np.int64)
    bin_id = np.zeros(len(fid), dtype=np.int64)
    for shard in range(PLAN_SHARDS):
        m = fid % PLAN_SHARDS == shard
        if m.any():
            bin_id[m] = shard * BIN_STRIDE + ffd_pack(fid[m], size[m], BIN_CAP)
    return pa.table(
        {
            "file_id": pa.array(fid, pa.int64()),
            "size_chars": pa.array(size, pa.int64()),
            "bin_id": pa.array(bin_id, pa.int64()),
        }
    )


def _coreness_seq(sf_dir: str) -> pa.Table:
    """INDEPENDENT coreness oracle: the classic Batagelj-Zaversnik peel
    (repeatedly remove the minimum-degree node), a different algorithm
    from the production H-index iteration — their agreement checks the
    math, not just the plumbing. Sequential over the planted graph,
    which is CORE_NODES-bounded by construction."""
    from collections import defaultdict

    from ..pipelines.queries_graph import CORE_NODES

    d = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy()
    a = d % CORE_NODES
    b = (d // 7) % CORE_NODES
    u = (a * a) // CORE_NODES
    v = (b * b) // CORE_NODES
    adj = defaultdict(set)
    for x, y in zip(u.tolist(), v.tolist()):
        if x != y:
            adj[x].add(y)
            adj[y].add(x)
    deg = {n: len(s) for n, s in adj.items()}
    alive = set(adj)
    core: Dict[int, int] = {}
    while alive:
        k = min(deg[n] for n in alive)
        stack = [n for n in alive if deg[n] <= k]
        while stack:
            n = stack.pop()
            if n not in alive:
                continue
            core[n] = k
            alive.discard(n)
            for w in adj[n]:
                if w in alive:
                    deg[w] -= 1
                    if deg[w] <= k:
                        stack.append(w)
    nodes = sorted(core)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "coreness": pa.array([core[n] for n in nodes], pa.int64()),
        }
    )


def _temperature_sample_seq(sf_dir: str) -> pa.Table:
    """Sequential temperature-sampling twin: same threshold helper (the
    ONE place the alpha doubles are computed) + same hash-keep rule."""
    from ..pipelines.queries_train import (
        TEMP_SCALE,
        temperature_thresholds,
    )
    from ..pipelines.queries_window import RESAMPLE_MULT

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    ).to_pandas()
    thresholds = temperature_thresholds(t["lang"].value_counts().to_dict())
    thr = t["lang"].map(thresholds).astype("int64")
    keep = ((t["doc_id"] % 2147483647) * RESAMPLE_MULT) % TEMP_SCALE < thr
    kept = t[keep]
    g = (
        kept.groupby("lang", as_index=False)
        .agg(kept_docs=("doc_id", "size"), kept_chars=("n_chars", "sum"))
        .sort_values("lang")
    )
    return pa.table(
        {
            "lang": pa.array(g["lang"].tolist(), pa.string()),
            "kept_docs": pa.array(g["kept_docs"].astype("int64").tolist(), pa.int64()),
            "kept_chars": pa.array(
                g["kept_chars"].astype("int64").tolist(), pa.int64()
            ),
        }
    )


def _bpe_fertility_seq(sf_dir: str, merges_t: pa.Table) -> pa.Table:
    """Sequential fertility twin: same kernels, single batch, with the
    relational plumbing as in-memory Arrow group_bys + a pandas merge."""
    from ..functions.arrowkit import select_rename
    from ..pipelines.queries_train import (
        bpe_word_partial,
        bpe_word_tokens,
        fertility_finalize,
        fertility_partial,
        lang_word_partial,
    )

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    lw = lang_word_partial(docs)  # single batch == global counts
    vocab = select_rename(
        bpe_word_partial(docs.select(["text"]))
        .group_by("word")
        .aggregate([("n", "sum")]),
        word="word",
        n="n_sum",
    )
    merges = list(zip(merges_t["lhs"].to_pylist(), merges_t["rhs"].to_pylist()))
    wt = bpe_word_tokens(vocab, merges).to_pandas()
    j = lw.to_pandas().merge(wt, on="word")
    part = fertility_partial(
        pa.table(
            {
                "lang": pa.array(j["lang"].tolist(), pa.string()),
                "n": pa.array(j["n"].astype("int64").tolist(), pa.int64()),
                "n_subwords": pa.array(
                    j["n_subwords"].astype("int64").tolist(), pa.int64()
                ),
            }
        )
    )
    return fertility_finalize(
        select_rename(
            part.group_by("lang").aggregate(
                [("words", "sum"), ("subwords", "sum")]
            ),
            lang="lang",
            words="words_sum",
            subwords="subwords_sum",
        )
    )


def ensure_dumps(sf_dir: str) -> str:
    out_dir = dumps_dir(sf_dir)
    return ensure_published(out_dir, lambda tmp: _build_dumps(sf_dir, tmp))


def train_oracle_sqls(sf_dir: str) -> Dict[str, str]:
    d = ensure_dumps(sf_dir)

    def p(name: str) -> str:
        return os.path.join(d, name)

    return {
        "bpe_merges": (
            "SELECT merge_rank, lhs, rhs, merged, n "
            f"FROM read_parquet('{p('bpe_merges_seq.parquet')}')"
        ),
        "bpe_encode": (
            "SELECT token, n "
            f"FROM read_parquet('{p('bpe_encode_seq.parquet')}')"
        ),
        "bpe_fertility": (
            "SELECT lang, words, subwords, fertility_x1000 "
            f"FROM read_parquet('{p('bpe_fertility_seq.parquet')}')"
        ),
        "compression_ratio": (
            "SELECT doc_id, n_bytes, comp_permille "
            f"FROM read_parquet('{p('compress_seq.parquet')}')"
        ),
        "cdc_chunk_dedup": (
            "SELECT doc_id, n_chunks, n_bytes, dup_chunks, dup_bytes "
            f"FROM read_parquet('{p('cdc_dedup_seq.parquet')}')"
        ),
        "temperature_sample": (
            "SELECT lang, kept_docs, kept_chars "
            f"FROM read_parquet('{p('temperature_seq.parquet')}')"
        ),
        "doc_graph_coreness": (
            "SELECT node, coreness "
            f"FROM read_parquet('{p('coreness_seq.parquet')}')"
        ),
        "compaction_plan": (
            "SELECT file_id, size_chars, bin_id "
            f"FROM read_parquet('{p('compaction_seq.parquet')}')"
        ),
        "source_set_cover": (
            "SELECT step, source, marginal_grams, cumulative_grams "
            f"FROM read_parquet('{p('source_cover_seq.parquet')}')"
        ),
    }
