"""Prefix-filtered all-pairs cosine set-similarity self-join.

The AllPairs / PPJoin family (Bayardo, Ma, Srikant, "Scaling Up All Pairs
Similarity Search", WWW 2007; Vernica, Carey, Li, "Efficient Parallel
Set-Similarity Joins Using MapReduce", SIGMOD 2010 — public papers, ideas
reimplemented from the published algorithms, no code consulted): find every
document pair whose 4-word-shingle sets have cosine similarity >= t
WITHOUT comparing all O(n^2) pairs.

Sets are binary shingle sets, so cosine(x, y) = |x ∩ y| / sqrt(|x||y|) and
the whole predicate is exact int64 math:

    dot^2 * 1_000_000 >= T2_PPM * |x| * |y|        (T2_PPM = t^2 * 1e6)

Filter math (t = 0.8, t2 = 0.64), all derived from dot <= min(|x|,|y|) and
dot >= t*sqrt(|x||y|):
- size filter: a matching pair satisfies t2*max(|x|,|y|) <= min(|x|,|y|).
- overlap bound: dot >= t2*|x| for EACH side x of a matching pair.
- prefix filter: order all shingles by (global df asc, shingle asc); with
  prefix_x = first |x| - ceil(t2*|x|) + 1 shingles of x, any matching pair
  shares at least one shingle lying in BOTH prefixes. (If not: every
  shared shingle is outside one of the prefixes; take the pair's
  latest-ordered prefix end — all shared shingles outside THAT side's
  prefix fit in its suffix of size ceil(t2*|x|) - 1 < t2*|x| <= dot,
  a contradiction.)

Distributed plan (slim string/int columns only; document text never
shuffles past the first tokenize pass; NO per-group Python and NO
vocabulary-sized Ray groupby anywhere on the corpus-sized paths — the
round-4 profiles showed per-token map_groups costing 289 s of remote
time and a 200k-group Ray aggregate costing ~6.5 s at sf0.1, so both
are replaced by sort + vectorized segment kernels with exact batch-edge
repair):

    shingle explode, carrying |x| per row + a 64-bit
    token hash (vectorized polars hash)                  [map]
    -> sort by thash; df = contiguous-segment length,
       computed vectorized per batch; the <= 2 segments
       touching each batch edge are repaired exactly by
       a TINY aggregate + join over edge rows only       [int exchange]
    -> global sort by (doc_id, df, token)                [doc exchange]
    -> VECTORIZED prefix pick per batch: docs fully
       inside a batch are handled by pure numpy
       (position-within-run < prefix length); the <= 2
       batch-EDGE docs per batch are flagged and
       repaired by a tiny map_groups over edge docs
       only (O(#blocks) groups, never O(docs))           [map]
    -> candidate pairs = prefix SELF-JOIN on thash +
       vectorized (id order, size filter) batch filter   [int exchange]
    -> pair dedup                                        [pair exchange]
    -> exact dot via two joins over candidate docs only  [pair-sized]
    -> integer threshold + cos2_ppm finalize             [map]

CORRECTNESS UNDER HASHING: the prefix-filter completeness lemma holds
for ANY globally consistent total token order — df-ascending is a
performance heuristic (rare shingles first), not a correctness
requirement. Keying df and the candidate join on the 64-bit hash can
therefore only (a) perturb the order on hash collisions (still one
consistent global order: (df(hash), token)) or (b) add false candidate
pairs on cross-token collisions — and every candidate is verified by an
EXACT string-intersection count before the threshold. Result bits are
collision-independent; the independent naive oracle certifies it.

100 TB notes: every exchange is keyed by shingle-hash / doc_id / pair —
the widest is the shingle explode (corpus tokens, ~doc_len rows per
doc). Prefixes hold only the RAREST shingles of each doc, so the
self-join's per-token groups stay small on natural corpora; a degenerate
corpus (tiny shingle vocabulary) degrades toward the exact quadratic
join — structurally visible as the join's output volume, not a task
OOM. The df map is never broadcast or driver-held (vocabulary-sized);
batch-edge repair state is O(#blocks). The verify stage probes only docs
that appear in some candidate pair (broadcast sorted-id filter, bounded
by candidate count). Exchange widths use TOKEN_ROWS_PER_PART (slim rows)
rather than the document-row default.

The DuckDB oracle is an INDEPENDENT algorithm — the naive exact all-pairs
join with no prefix/size filtering — so agreement checks the filter math
itself, not just the plumbing (same convention as the coreness peel twin,
state/oracle_dump_train.py:143).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..functions.arrowkit import select_rename
from ..joins import partitions_for_rows, safe_join
from ..remote import remote_fn

_QJ = "khl_pdf_ocr_ray.pipelines.queries_simjoin"

SHINGLE_W = 4
COS_T2_PPM = 640_000  # t = 0.8 -> t^2 in parts-per-million
TOKEN_ROWS_PER_PART = 65536  # slim (id, token) rows per exchange partition

import re

_RE_NONALPHA = re.compile(r"[^a-z]+")


# --- kernels (the tokenizer contract is shared with the SQL oracle:
#     lower + split on [^a-z]+ + drop empties, then 4-word shingles) -------
def doc_shingles(text: str) -> list:
    words = [w for w in _RE_NONALPHA.split((text or "").lower()) if w]
    return sorted(
        {
            " ".join(words[i : i + SHINGLE_W])
            for i in range(len(words) - SHINGLE_W + 1)
        }
    )


def shingle_explode(batch: pa.Table) -> pa.Table:
    """(doc_id, token, n, thash) rows, distinct per doc, n = |doc's
    shingle set|, thash = vectorized 64-bit token hash (polars; int64
    bit-view). Per-doc string assembly is inherently per-record work
    (same cost class as the zlib/crc kernels); everything downstream is
    vectorized."""
    import polars as pl

    ids, toks, ns = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ss = doc_shingles(t)
        for s in ss:
            ids.append(d)
            toks.append(s)
            ns.append(len(ss))
    tok_arr = pa.array(toks, pa.string())
    h = (
        pl.from_arrow(tok_arr).hash(seed=7).to_numpy().view(np.int64)
        if len(toks)
        else np.zeros(0, np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "token": tok_arr,
            "n": pa.array(ns, pa.int64()),
            "thash": pa.array(h, pa.int64()),
        }
    )


def _segments(keys: np.ndarray):
    """starts, per-row segment length, per-row edge flag (first/last key
    of the batch) for a batch sorted by `keys`."""
    starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
    seg_len = np.diff(np.append(starts, len(keys)))
    row_len = np.repeat(seg_len, seg_len)
    edge = (keys == keys[0]) | (keys == keys[-1])
    return starts, row_len, edge


def df_attach_batch(batch: pa.Table) -> pa.Table:
    """One batch of the thash-sorted token table -> rows with df attached.
    A segment fully inside the batch is globally complete (the sort is
    global), so its length IS the token's exact df; the <= 2 segments
    touching the batch edges get df from the exact repair stage (their
    in-batch length here is a placeholder, flagged `edge`)."""
    if len(batch) == 0:
        return batch.append_column("df", pa.array([], pa.int64())) \
                    .append_column("edge", pa.array([], pa.bool_()))
    keys = batch["thash"].to_numpy(zero_copy_only=False)
    _starts, row_len, edge = _segments(keys)
    return batch.append_column("df", pa.array(row_len, pa.int64())) \
                .append_column("edge", pa.array(edge))


def df_interior_project(batch: pa.Table) -> pa.Table:
    return batch.filter(pa.compute.invert(batch["edge"])).select(
        ["doc_id", "token", "n", "thash", "df"]
    )


def df_edge_project(batch: pa.Table) -> pa.Table:
    return batch.filter(batch["edge"]).select(["doc_id", "token", "n", "thash"])


def df_edge_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the edge-segment df repair: rows are
    globally distinct (doc, token) pairs, so counts are Sum partials."""
    g = batch.group_by(["thash"]).aggregate([("doc_id", "count")])
    return select_rename(g, thash="thash", df="doc_id_count")


def prefix_len_of(n: np.ndarray) -> np.ndarray:
    """prefix_len = n - ceil(t2*n) + 1 (>= 1 for all n >= 1), t2 = 0.64."""
    return n - (64 * n + 99) // 100 + 1


def ap_select_batch(batch: pa.Table) -> pa.Table:
    """One batch of the (doc_id, df, token) global sort -> prefix rows.

    Docs FULLY INSIDE the batch are resolved vectorized: position within
    the doc's run < prefix length. The first and last doc of the batch
    may continue in neighboring batches, so their raw rows are passed
    through flagged `edge` for the tiny exact repair stage (every edge
    doc's rows are flagged in every batch that holds them, so the repair
    group always sees the complete doc)."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "thash": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "edge": pa.array([], pa.bool_()),
            }
        )
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    n = batch["n"].to_numpy(zero_copy_only=False)
    starts, seg_row_len, edge = _segments(ids)
    pos = np.arange(len(ids)) - np.repeat(starts, np.diff(np.append(starts, len(ids))))
    keep = (~edge) & (pos < prefix_len_of(n))
    out = batch.filter(pa.array(keep | edge))
    return out.append_column("edge", pa.array(edge[keep | edge]))


def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Exact per-doc prefix pick — used ONLY for batch-edge docs (O(#blocks)
    groups). Output schema matches the vectorized path."""
    df = df.sort_values(["df", "token"], kind="mergesort")
    pref = int(prefix_len_of(np.int64(len(df))))  # the ONE formula
    out = df.iloc[:pref][["doc_id", "thash", "n"]].copy()
    return out


def ap_interior_project(batch: pa.Table) -> pa.Table:
    return batch.filter(pa.compute.invert(batch["edge"])).select(
        ["doc_id", "thash", "n"]
    )


def ap_edge_project(batch: pa.Table) -> pa.Table:
    return batch.filter(batch["edge"]).select(
        ["doc_id", "token", "df", "n", "thash"]
    )


def pair_filter_batch(batch: pa.Table) -> pa.Table:
    """Joined prefix rows -> candidate pairs: canonical id order plus the
    size filter 16*max <= 25*min (t2*max <= min). Vectorized."""
    a = batch["doc_id"].to_numpy(zero_copy_only=False)
    b = batch["doc_id_r"].to_numpy(zero_copy_only=False)
    na = batch["n"].to_numpy(zero_copy_only=False)
    nb = batch["n_r"].to_numpy(zero_copy_only=False)
    lo = np.minimum(na, nb)
    hi = np.maximum(na, nb)
    keep = (a < b) & (16 * hi <= 25 * lo)
    return pa.table(
        {
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "size_a": pa.array(na[keep], pa.int64()),
            "size_b": pa.array(nb[keep], pa.int64()),
        }
    )


def filter_cand_docs(batch: pa.Table, ids_ref, col: str) -> pa.Table:
    """Broadcast sorted-id semi filter: keep rows whose doc is in some
    candidate pair. The id array is candidate-sized (ray.put once)."""
    ids = ray.get(ids_ref) if not isinstance(ids_ref, np.ndarray) else ids_ref
    keys = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.minimum(np.searchsorted(ids, keys), len(ids) - 1)
    return batch.filter(pa.array(ids[pos] == keys))


def dot_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the intersection count: rows are globally
    distinct (pair, token) tuples, so within-batch counts are Sum partials."""
    g = batch.group_by(["doc_a", "doc_b", "size_a", "size_b"]).aggregate(
        [("token", "count")]
    )
    return select_rename(
        g,
        doc_a="doc_a",
        doc_b="doc_b",
        size_a="size_a",
        size_b="size_b",
        dot="token_count",
    )


def cosine_finalize(batch: pa.Table) -> pa.Table:
    """Exact integer threshold + scaled score. int64 headroom: the
    predicate computes dot^2 * 1e6, exact while dot <= ~3.0e6 shingles
    (a ~12 MB document); beyond that numpy would WRAP silently where the
    SQL twin errors loudly, so fail loudly here too (the pagerank
    'documented headroom' convention — switch to object-dtype math if a
    real corpus ever trips this)."""
    dot = batch["dot"].to_numpy(zero_copy_only=False).astype(np.int64)
    sa = batch["size_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    sb = batch["size_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(dot) and int(dot.max()) > 3_000_000:
        raise RuntimeError(
            f"allpairs_cosine: dot={int(dot.max())} exceeds the int64 "
            "headroom of the dot^2*1e6 predicate (documents of ~3e6+ "
            "shingles); use object-dtype scoring for this corpus"
        )
    keep = dot * dot * 1_000_000 >= COS_T2_PPM * sa * sb
    t = batch.filter(pa.array(keep))
    dk = dot[keep]
    cos2 = dk * dk * 1_000_000 // (sa[keep] * sb[keep])
    return t.append_column("cos2_ppm", pa.array(cos2, pa.int64()))


_EMPTY_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("size_a", pa.int64()),
        ("size_b", pa.int64()),
        ("dot", pa.int64()),
        ("cos2_ppm", pa.int64()),
    ]
)


def q_allpairs_cosine(sf_dir: str) -> rd.Dataset:
    """See module docstring."""
    from .queries import _t

    toks = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            remote_fn(_QJ, "shingle_explode"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # reused 3x: df build, prefix assembly, verify probe
    )
    n_tok = toks.count()  # free from materialized metadata
    width = partitions_for_rows(n_tok, TOKEN_ROWS_PER_PART)
    # df via ONE int sort + vectorized segment counts; only segments
    # touching a batch edge pay the (tiny) aggregate + join repair
    by_hash = (
        toks.sort("thash")
        .map_batches(
            remote_fn(_QJ, "df_attach_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # consumed twice: interior pass-through + edge repair
    )
    df_interior = by_hash.map_batches(
        remote_fn(_QJ, "df_interior_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    edges_raw = by_hash.map_batches(
        remote_fn(_QJ, "df_edge_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    edge_df = (
        edges_raw.map_batches(
            remote_fn(_QJ, "df_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("thash")
        .aggregate(Sum("df", alias_name="df"))
        .rename_columns({"thash": "thash_r"})
    )
    df_edges = safe_join(
        edges_raw,
        edge_df,
        on=("thash",),
        right_on=("thash_r",),
        assume_non_empty=True,  # inner join; empty edge set is fine
        num_partitions=max(8, width // 8),
    ).select_columns(["doc_id", "token", "n", "thash", "df"])
    with_df = df_interior.union(df_edges)
    selected = (
        with_df.sort(["doc_id", "df", "token"])
        .map_batches(
            remote_fn(_QJ, "ap_select_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # consumed twice: interior pass-through + edge repair
    )
    interior = selected.map_batches(
        remote_fn(_QJ, "ap_interior_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    edge_pref = (
        selected.map_batches(
            remote_fn(_QJ, "ap_edge_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("doc_id")
        .map_groups(remote_fn(_QJ, "prefix_rows"), batch_format="pandas")
    )
    pref = interior.union(edge_pref).materialize()  # self-join: both sides
    pref_r = pref.rename_columns(
        {"doc_id": "doc_id_r", "thash": "thash_r", "n": "n_r"}
    )
    cands = safe_join(
        pref,
        pref_r,
        on=("thash",),
        right_on=("thash_r",),
        assume_non_empty=True,  # self join of a non-empty prefix table
        num_partitions=max(8, partitions_for_rows(pref.count(), TOKEN_ROWS_PER_PART)),
    ).map_batches(
        remote_fn(_QJ, "pair_filter_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # pair dedup; emptiness is data-dependent -> count explicitly and exit
    # early on pair-free corpora
    pairs = (
        cands.groupby(["doc_a", "doc_b"])
        .aggregate(
            Min("size_a", alias_name="size_a"),
            Min("size_b", alias_name="size_b"),
        )
        .materialize()
    )
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(_EMPTY_SCHEMA.empty_table())
    # candidate doc ids: bounded by 2 * n_pairs (candidates, not corpus)
    ids: set = set()
    for b in pairs.select_columns(["doc_a", "doc_b"]).iter_batches(
        batch_format="pyarrow"
    ):
        ids.update(b["doc_a"].to_pylist())
        ids.update(b["doc_b"].to_pylist())
    ids_ref = ray.put(np.array(sorted(ids), dtype=np.int64))
    tok_cand = toks.map_batches(
        remote_fn(_QJ, "filter_cand_docs", ids_ref=ids_ref, col="doc_id"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["doc_id", "token"])
    # the verify joins' BIG side is the candidate-doc token table, not the
    # pair table — size partitions by its upper bound (the full token
    # count); a pair-count-sized width put 375k-row joins in ONE partition
    # on a 10x corpus and the Join operator degrades superlinearly there
    pw = max(8, partitions_for_rows(n_tok, TOKEN_ROWS_PER_PART))
    a_rows = safe_join(
        pairs,
        tok_cand,
        on=("doc_a",),
        right_on=("doc_id",),
        assume_non_empty=True,  # every pair doc passed the id filter
        num_partitions=pw,
    ).select_columns(["doc_a", "doc_b", "size_a", "size_b", "token"])
    tok_b = tok_cand.rename_columns({"doc_id": "doc_id_r", "token": "token_r"})
    both = safe_join(
        a_rows,
        tok_b,
        on=("doc_b", "token"),
        right_on=("doc_id_r", "token_r"),
        assume_non_empty=True,
        num_partitions=pw,
    ).select_columns(["doc_a", "doc_b", "size_a", "size_b", "token"])
    return (
        both.map_batches(
            remote_fn(_QJ, "dot_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["doc_a", "doc_b", "size_a", "size_b"])
        .aggregate(Sum("dot", alias_name="dot"))
        .map_batches(
            remote_fn(_QJ, "cosine_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# Independent naive exact oracle: no prefix/size filter anywhere.
SQL_ALLPAIRS_COSINE = """
WITH w AS (
  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) rn
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t,
           generate_subscripts(string_split_regex(lower(text), '[^a-z]+'), 1) AS pos
    FROM documents
  ) WHERE t <> ''
), sh AS (
  SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t || ' ' || d.t AS token
  FROM w a
  JOIN w b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
  JOIN w c ON c.doc_id = a.doc_id AND c.rn = a.rn + 2
  JOIN w d ON d.doc_id = a.doc_id AND d.rn = a.rn + 3
), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS dot
  FROM sh a JOIN sh b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, sa.n AS size_a, sb.n AS size_b, p.dot,
       p.dot * p.dot * 1000000 // (sa.n * sb.n) AS cos2_ppm
FROM pair p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE p.dot * p.dot * 1000000 >= 640000 * sa.n * sb.n
"""

SIMJOIN_QUERIES = {"allpairs_cosine": q_allpairs_cosine}
SIMJOIN_ORACLES = {"allpairs_cosine": SQL_ALLPAIRS_COSINE}
