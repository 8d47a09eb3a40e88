"""Keyword search + BM25 ranking over the documents corpus.

Text retrieval is the missing sibling of the embedding similarity search
family (stages/knn.py): given a fixed bag-of-words query, find and rank
matching documents. Two operators:

- ``keyword_search`` — the inverted-index surface: one row per
  (matching doc, query term) with the integer retrieval statistics
  (tf, df, dl). Static-SQL checked: DuckDB recomputes the same stats
  with ``string_split`` + ``unnest`` (tokenization is a single literal
  space on both sides, same contract as queries_corpus.py).
- ``bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75) top-10 ranking over the
  same statistics. The per-term score is a float kernel
  (``bm25_term_score``) shared by the distributed plan and the
  sequential dump twin (state/oracle_dump_near.py), and the per-doc sum
  accumulates in sorted-term order on both sides, so the value hash is
  bit-identical — the driver certifies that the DISTRIBUTED plumbing
  (tf explode, df shuffle, term join, per-doc grouping, partial top-k)
  reproduces the sequential semantics.

Scale notes (100 TB):
- the tf pass emits rows only for query-term matches — the shuffle is
  O(matching docs x query terms), never O(corpus tokens);
- df is a |terms|-row aggregate joined back (never a broadcast of
  anything unbounded; the term list itself is the user's query, small
  by construction);
- corpus scalars (N docs, total tokens -> avgdl) are a one-pass
  per-batch combiner reduced to two numbers on the driver; in a
  deployment avgdl is a precomputed corpus statistic;
- the ranking sorts only per-batch top-k survivors (<= k rows per
  block), not the matched set.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from ..joins import safe_join
from ..remote import remote_fn

_QS = "khl_pdf_ocr_ray.pipelines.queries_search"

SEARCH_TERMS = ("spark", "stream", "vector")  # fixed query, kept sorted
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


# --- kernels (shared with the sequential oracle twin) -----------------------
def doc_search_stats(text: str) -> tuple:
    """(dl, {term: tf}) for one document — the single tokenizer used by
    the distributed plan AND the dump twin (split on one literal space,
    '' -> [''], matching DuckDB string_split)."""
    toks = (text or "").split(" ")
    counts = Counter(toks)
    return len(toks), {t: counts[t] for t in SEARCH_TERMS if counts[t]}


def bm25_term_score(
    tf: int, df: int, dl: int, n_docs: int, avgdl: float
) -> np.float64:
    """Okapi BM25 per-term contribution, np.float64 scalar ops only so the
    distributed and sequential twins produce identical bits."""
    idf = np.log(
        np.float64(1.0)
        + (np.float64(n_docs) - np.float64(df) + np.float64(0.5))
        / (np.float64(df) + np.float64(0.5))
    )
    tf_f = np.float64(tf)
    denom = tf_f + np.float64(BM25_K1) * (
        np.float64(1.0 - BM25_B) + np.float64(BM25_B) * (np.float64(dl) / np.float64(avgdl))
    )
    return idf * (tf_f * np.float64(BM25_K1 + 1.0)) / denom


def bm25_doc_score(rows, dl: int, n_docs: int, avgdl: float) -> float:
    """Sum of per-term scores in sorted-term order (rows: iterable of
    (term, tf, df), any order). Shared by both twins."""
    score = np.float64(0.0)
    for term, tf, df in sorted(rows):
        score = score + bm25_term_score(int(tf), int(df), int(dl), n_docs, avgdl)
    return float(score)


# --- per-batch stages -------------------------------------------------------
def search_tf_partial(batch: pa.Table) -> pa.Table:
    """docs -> (doc_id, term, tf, dl) rows, query-term matches only."""
    ids, terms, tfs, dls = [], [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        dl, counts = doc_search_stats(t)
        for term, tf in counts.items():
            ids.append(d)
            terms.append(term)
            tfs.append(tf)
            dls.append(dl)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
        }
    )


def corpus_len_partial(batch: pa.Table) -> pa.Table:
    """One (n_docs, n_tokens) row per batch — combiner feed for the two
    corpus scalars behind avgdl."""
    n_tokens = 0
    for t in batch["text"].to_pylist():
        n_tokens += len((t or "").split(" "))
    return pa.table(
        {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
        }
    )


def keyword_project(df: pd.DataFrame) -> pd.DataFrame:
    return df[["doc_id", "term", "tf", "df", "dl"]]


def bm25_group_score(g: pd.DataFrame, n_docs: int, avgdl: float) -> pd.DataFrame:
    """One doc's matched-term rows -> (doc_id, n_terms, score)."""
    dl = int(g["dl"].iloc[0])
    score = bm25_doc_score(
        zip(g["term"], g["tf"], g["df"]), dl, n_docs, avgdl
    )
    return pd.DataFrame(
        {
            "doc_id": pd.Series([int(g["doc_id"].iloc[0])], dtype="int64"),
            "n_terms": pd.Series([len(g)], dtype="int64"),
            "score": pd.Series([score], dtype="float64"),
        }
    )


def bm25_topk_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial top-k so the final sort sees <= k rows per block."""
    return df.sort_values(["score", "doc_id"], ascending=[False, True]).head(
        BM25_TOP_K
    )


# --- plans ------------------------------------------------------------------
def _matched_with_df(sf_dir: str) -> rd.Dataset:
    from .queries import _t

    tf = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_QS, "search_tf_partial"), batch_format="pyarrow"
    )
    df = (
        tf.groupby("term")
        .aggregate(Count(alias_name="df"))
        .rename_columns({"term": "term_r"})
    )
    joined = safe_join(tf, df, on=("term",), right_on=("term_r",))
    assert joined is not None  # the fixed query terms occur in the corpus
    return joined


def q_keyword_search(sf_dir: str) -> rd.Dataset:
    """Inverted-index match rows (doc_id, term, tf, df, dl)."""
    return _matched_with_df(sf_dir).map_batches(
        remote_fn(_QS, "keyword_project"), batch_format="pandas"
    )


def q_bm25_topk(sf_dir: str) -> rd.Dataset:
    """BM25 top-10 docs for the fixed query (score DESC, doc_id ASC)."""
    from .queries import _t

    stats = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_QS, "corpus_len_partial"), batch_format="pyarrow")
        .sum(["n_docs", "n_tokens"])
    )
    n_docs = int(stats["sum(n_docs)"])
    avgdl = float(np.float64(stats["sum(n_tokens)"]) / np.float64(n_docs))
    return (
        _matched_with_df(sf_dir)
        .groupby("doc_id")
        .map_groups(
            remote_fn(_QS, "bm25_group_score", n_docs=n_docs, avgdl=avgdl),
            batch_format="pandas",
        )
        .map_batches(remote_fn(_QS, "bm25_topk_partial"), batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(BM25_TOP_K)
    )


SEARCH_QUERIES: Dict[str, object] = {
    "keyword_search": q_keyword_search,
    "bm25_topk": q_bm25_topk,
}

_TERMS_SQL = ", ".join(f"'{t}'" for t in SEARCH_TERMS)

# bm25_topk's oracle is the sequential dump twin (state/oracle_dump_near.py)
SEARCH_ORACLES: Dict[str, str] = {
    "keyword_search": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf FROM toks
  WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT tf.doc_id, tf.term, tf.tf, df.df, dl.dl
FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
""",
}
