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
shuffles past the first tokenize pass):

    shingle explode (distinct per doc)                  [map]
    -> df per shingle (per-batch combiner + groupby)    [token exchange]
    -> df joined back to shingle rows                   [token exchange]
    -> per-doc prefix selection                         [doc exchange]
    -> candidate pairs per prefix token (+ size filter) [token exchange]
    -> pair dedup                                       [pair exchange]
    -> exact dot via two joins over candidate docs only [pair-sized]
    -> integer threshold + cos2_ppm finalize            [map]

100 TB notes: every exchange is keyed by shingle / doc_id / pair — the
widest is the shingle explode (corpus tokens, ~doc_len rows per doc).
Prefix groups hold only the RAREST shingles of each doc, so candidate
groups stay small on natural corpora; a degenerate corpus (tiny shingle
vocabulary) degrades toward the exact quadratic join and the pair kernel
logs loudly past PAIR_GROUP_WARN docs per group. The verify stage probes
only docs that appear in some candidate pair (broadcast sorted-id filter,
bounded by candidate count, never the corpus).

The DuckDB oracle is an INDEPENDENT algorithm — the naive exact all-pairs
join with no prefix/size filtering — so agreement checks the filter math
itself, not just the plumbing (same convention as the coreness peel twin,
state/oracle_dump_train.py:143).
"""

from __future__ import annotations

import logging
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..functions.arrowkit import select_rename
from ..joins import partitions_for_rows, safe_join
from ..remote import remote_fn

logger = logging.getLogger(__name__)

_QJ = "khl_pdf_ocr_ray.pipelines.queries_simjoin"

SHINGLE_W = 4
COS_T2_PPM = 640_000  # t = 0.8 -> t^2 in parts-per-million
PAIR_GROUP_WARN = 4096

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
    """(doc_id, token) rows, distinct per doc. Per-doc string assembly is
    inherently per-record work (same cost class as the zlib/crc kernels);
    everything downstream of this pass is vectorized or grouped."""
    ids, toks = [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        for s in doc_shingles(t):
            ids.append(d)
            toks.append(s)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "token": pa.array(toks, pa.string()),
        }
    )


def df_partial(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency combiner. (doc_id, token) rows are
    globally distinct, so a within-batch count is a valid Sum partial."""
    g = batch.group_by(["token"]).aggregate([("doc_id", "count")])
    return select_rename(g, token="token", df="doc_id_count")


def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
    """One doc's shingles -> its prefix rows under the global (df, token)
    order. prefix_len = n - ceil(t2*n) + 1 (>= 1 for all n >= 1)."""
    df = df.sort_values(["df", "token"], kind="mergesort")
    n = len(df)
    pref = n - (64 * n + 99) // 100 + 1
    out = df.iloc[:pref][["token", "doc_id"]].copy()
    out["n"] = np.int64(n)
    return out


def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
    """One prefix-token group -> candidate pairs passing the size filter
    (16*max <= 25*min, i.e. t2*max <= min). Vectorized over the triangle."""
    m = len(df)
    if m > PAIR_GROUP_WARN:
        logger.warning(
            "allpairs_cosine: prefix group of %d docs for token %r — "
            "degenerate (tiny-vocabulary) corpus; candidate generation is "
            "quadratic in this group",
            m,
            df["token"].iloc[0],
        )
    df = df.sort_values("doc_id", kind="mergesort")
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    ns = df["n"].to_numpy(dtype=np.int64)
    ii, jj = np.triu_indices(m, k=1)
    na, nb = ns[ii], ns[jj]
    lo = np.minimum(na, nb)
    hi = np.maximum(na, nb)
    keep = 16 * hi <= 25 * lo
    return pd.DataFrame(
        {
            "doc_a": ids[ii][keep],
            "doc_b": ids[jj][keep],
            "size_a": na[keep],
            "size_b": nb[keep],
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
    """Exact integer threshold + scaled score."""
    dot = batch["dot"].to_numpy(zero_copy_only=False).astype(np.int64)
    sa = batch["size_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    sb = batch["size_b"].to_numpy(zero_copy_only=False).astype(np.int64)
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
    width = partitions_for_rows(n_tok)
    df = (
        toks.map_batches(
            remote_fn(_QJ, "df_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .rename_columns({"token": "token_r"})
    )
    with_df = safe_join(
        toks,
        df,
        on=("token",),
        right_on=("token_r",),
        assume_non_empty=True,  # every shingle has df >= 1 by construction
        num_partitions=width,
    ).select_columns(["doc_id", "token", "df"])
    cands = (
        with_df.groupby("doc_id")
        .map_groups(remote_fn(_QJ, "prefix_rows"), batch_format="pandas")
        .groupby("token")
        .map_groups(remote_fn(_QJ, "pair_rows"), batch_format="pandas")
    )
    # pair dedup; emptiness is data-dependent -> safe_join's materialize
    # regime would apply anyway, so take the count explicitly and exit
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
    )
    pw = partitions_for_rows(n_pairs)
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
