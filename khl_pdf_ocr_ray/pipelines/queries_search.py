"""Keyword search + BM25 ranking over the documents corpus.

Text retrieval is the missing sibling of the embedding similarity search
family (stages/knn.py): given a fixed bag-of-words query, find and rank
matching documents. Two operators:

- ``keyword_search`` — the inverted-index surface: one row per
  (matching doc, query term) with the integer retrieval statistics
  (tf, df, dl). Static-SQL checked: DuckDB recomputes the same stats
  with ``string_split`` + ``unnest`` (tokenization is a single literal
  space on both sides, same contract as queries_corpus.py).
- ``bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75) top-10 ranking. Scores are
  FIXED-POINT (x 2^20, floor-rounded) so every sum is an exact int64
  sum — order-independent, hence bit-identical between the distributed
  plan and the sequential dump twin (state/oracle_dump_near.py) no
  matter how batches split. The only transcendental (idf's log) runs
  ONCE PER QUERY TERM as a scalar on the driver, never vectorized over
  rows, so SIMD-vs-scalar libm drift cannot enter; everything per-row
  is IEEE +,*,/ which is bit-deterministic elementwise.

Scale notes (100 TB):
- ``bm25_topk`` is TWO map passes and (almost) no shuffle: pass 1 is a
  per-batch combiner reduced to |terms|+2 driver scalars (df per query
  term, corpus N and token total -> avgdl; in a deployment these are
  precomputed corpus statistics); pass 2 scores each doc inside the
  batch that tokenized it (a doc's rows never leave their block) and
  keeps a per-batch top-k, so the final sort sees <= k rows per block.
- ``keyword_search`` emits rows only for query-term matches — the
  exchange is O(matching docs x query terms), never O(corpus tokens);
  df is a |terms|-row aggregate joined back (never a broadcast of
  anything unbounded).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from ..joins import partitions_for_rows, safe_join
from ..remote import remote_fn

_QS = "khl_pdf_ocr_ray.pipelines.queries_search"

SEARCH_TERMS = ("spark", "stream", "vector")  # fixed query, kept sorted
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
BM25_SCALE = 1 << 20  # fixed-point: integer sums are order-independent


# --- kernels (shared with the sequential oracle twin) -----------------------
def doc_search_stats(text: str) -> tuple:
    """(dl, {term: tf}) for one document — the single tokenizer used by
    the distributed plan AND the dump twin (split on one literal space,
    '' -> [''], matching DuckDB string_split)."""
    toks = (text or "").split(" ")
    counts = Counter(toks)
    return len(toks), {t: counts[t] for t in SEARCH_TERMS if counts[t]}


def bm25_idf(df: int, n_docs: int) -> float:
    """BM25+1 idf — the ONE transcendental, evaluated as a scalar (never
    over row arrays) so both twins hit the identical libm code path."""
    return float(
        np.log(
            np.float64(1.0)
            + (np.float64(n_docs) - np.float64(df) + np.float64(0.5))
            / (np.float64(df) + np.float64(0.5))
        )
    )


def bm25_term_score(tf: int, df: int, dl: int, n_docs: int, avgdl: float) -> float:
    """Okapi BM25 per-term contribution (float; tests/reference only —
    production paths use the fixed-point variant below)."""
    return bm25_idf(df, n_docs) * _tf_part(tf, dl, avgdl)


def _tf_part(tf: int, dl: int, avgdl: float) -> float:
    tf_f = np.float64(tf)
    denom = tf_f + np.float64(BM25_K1) * (
        np.float64(1.0 - BM25_B)
        + np.float64(BM25_B) * (np.float64(dl) / np.float64(avgdl))
    )
    return float(tf_f * np.float64(BM25_K1 + 1.0) / denom)


def bm25_term_score_scaled(
    tf: int, dl: int, idf: float, avgdl: float
) -> int:
    """floor(score * 2^20 + 1/2) as int — IEEE +,*,/ only (idf is a
    precomputed scalar), so bit-deterministic under any batching."""
    s = np.float64(idf) * np.float64(_tf_part(tf, dl, avgdl))
    return int(np.floor(s * np.float64(BM25_SCALE) + np.float64(0.5)))


def bm25_doc_score_scaled(
    counts: Dict[str, int], dl: int, idf_by_term: Dict[str, float], avgdl: float
) -> int:
    """Sum of fixed-point per-term scores — exact integer arithmetic,
    order-independent. Shared by both twins."""
    return sum(
        bm25_term_score_scaled(tf, dl, idf_by_term[t], avgdl)
        for t, tf in counts.items()
    )


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


def corpus_stats_partial(batch: pa.Table) -> pa.Table:
    """One combiner row per batch: (n_docs, n_tokens, df_<term>...) —
    everything pass 2 needs, reduced to |terms|+2 driver scalars."""
    n_tokens = 0
    dfs = {t: 0 for t in SEARCH_TERMS}
    for t in batch["text"].to_pylist():
        dl, counts = doc_search_stats(t)
        n_tokens += dl
        for term in counts:
            dfs[term] += 1
    cols = {
        "n_docs": pa.array([batch.num_rows], pa.int64()),
        "n_tokens": pa.array([n_tokens], pa.int64()),
    }
    for term in SEARCH_TERMS:
        cols[f"df_{term}"] = pa.array([dfs[term]], pa.int64())
    return pa.table(cols)


def keyword_project(batch: pa.Table) -> pa.Table:
    return batch.select(["doc_id", "term", "tf", "df", "dl"])


def bm25_score_batch(
    batch: pa.Table, idf_by_term: Dict[str, float], avgdl: float
) -> pa.Table:
    """docs -> per-batch top-k (doc_id, n_terms, score_x1m). Each doc is
    scored inside the batch that tokenized it (no shuffle); only the
    k best rows per batch survive to the final sort."""
    ids, n_terms, scores = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        dl, counts = doc_search_stats(t)
        if not counts:
            continue
        ids.append(d)
        n_terms.append(len(counts))
        scores.append(bm25_doc_score_scaled(counts, dl, idf_by_term, avgdl))
    out = (
        pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_terms": pd.Series(n_terms, dtype="int64"),
                "score_x1m": pd.Series(scores, dtype="int64"),
            }
        )
        .sort_values(["score_x1m", "doc_id"], ascending=[False, True])
        .head(BM25_TOP_K)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


# --- plans ------------------------------------------------------------------
def q_keyword_search(sf_dir: str) -> rd.Dataset:
    """Inverted-index match rows (doc_id, term, tf, df, dl)."""
    from .queries import _t

    tf = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_QS, "search_tf_partial"), batch_format="pyarrow"
    ).materialize()  # df derives from tf's plan; unmaterialized, safe_join
    # would tokenize the whole corpus twice (once per join side)
    df = (
        tf.groupby("term")
        .aggregate(Count(alias_name="df"))
        .rename_columns({"term": "term_r"})
    )
    # tf is materialized (its FREE row count prices the join) and both
    # sides are structurally non-empty -> streaming join, no barrier on
    # the term-dictionary aggregate
    joined = safe_join(
        tf, df, on=("term",), right_on=("term_r",),
        assume_non_empty=True,
        num_partitions=partitions_for_rows(tf.count()),
    )
    return joined.map_batches(
        remote_fn(_QS, "keyword_project"), batch_format="pyarrow"
    )


def bm25_query_stats(sf_dir: str) -> tuple:
    """(n_docs, avgdl, {term: idf}) — the |terms|+2 corpus scalars from
    one combiner pass (a deployment precomputes these once per corpus)."""
    from .queries import _t

    stats = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_QS, "corpus_stats_partial"), batch_format="pyarrow")
        .sum(["n_docs", "n_tokens"] + [f"df_{t}" for t in SEARCH_TERMS])
    )
    n_docs = int(stats["sum(n_docs)"])
    avgdl = float(np.float64(stats["sum(n_tokens)"]) / np.float64(n_docs))
    idf = {
        t: bm25_idf(int(stats[f"sum(df_{t})"]), n_docs) for t in SEARCH_TERMS
    }
    return n_docs, avgdl, idf


def q_bm25_topk(sf_dir: str) -> rd.Dataset:
    """BM25 top-10 docs for the fixed query (score DESC, doc_id ASC)."""
    from .queries import _t

    _n_docs, avgdl, idf = bm25_query_stats(sf_dir)
    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            remote_fn(_QS, "bm25_score_batch", idf_by_term=idf, avgdl=avgdl),
            batch_format="pyarrow",
        )
        .sort(["score_x1m", "doc_id"], descending=[True, False])
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
