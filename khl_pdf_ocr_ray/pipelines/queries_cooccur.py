"""Windowed token co-occurrence counts (skip-gram statistics).

``cooccurrence_window``: over every document, count unordered token-type
pairs whose positions lie within a window of W=4 (positions i < j,
j - i <= W; equal types at different positions count — the diagonal is
real signal for repetitive text). These are the co-occurrence statistics
a word2vec/GloVe-style embedding trainer consumes, and the word-level
twin of collocations_pmi's adjacent-bigram counts.

Plan / 100 TB notes: pair extraction is per-document numpy (W shifted
zips — O(len * W) per doc, no quadratic blowup); counts collapse
map-side per batch so the ONE exchange is keyed by the pair vocabulary
(<= V^2 but in practice Zipf-truncated), never by corpus positions. At
open vocabulary, hash-bucket the pair axis (the tfidf/top-k class) —
counts stay mergeable.

Oracle: static SQL — positional unnest + bounded self-join with
least/greatest canonicalization.

Reference analogue: none in /root/reference/app.py; brief scope (text
analysis / embedding-training prep).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..remote import remote_fn

_QC = "khl_pdf_ocr_ray.pipelines.queries_cooccur"

COOC_W = 4  # max position distance


def cooccur_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (tok_a, tok_b, n) pair-count partials."""
    counts: Counter = Counter()
    for text in batch["text"].to_pylist():
        # RAW split positions: an empty token (double space) occupies a
        # position but can't pair — matches the SQL subscript semantics
        toks = (text or "").split(" ")
        for d in range(1, COOC_W + 1):
            for a, b in zip(toks, toks[d:]):
                if a and b:
                    counts[(a, b) if a <= b else (b, a)] += 1
    if counts:
        pairs, ns = zip(*sorted(counts.items()))
        a_col, b_col = zip(*pairs)
    else:
        a_col, b_col, ns = (), (), ()
    return pa.table(
        {
            "tok_a": pa.array(list(a_col), pa.string()),
            "tok_b": pa.array(list(b_col), pa.string()),
            "n": pa.array(list(ns), pa.int64()),
        }
    )


def q_cooccurrence_window(sf_dir: str) -> "object":
    """(tok_a, tok_b, n) — unordered within-window pair counts."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QC, "cooccur_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["tok_a", "tok_b"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_COOCCURRENCE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents),
t AS (SELECT doc_id, tok, i FROM toks WHERE tok <> '')
SELECT least(a.tok, b.tok) AS tok_a,
       greatest(a.tok, b.tok) AS tok_b,
       CAST(count(*) AS BIGINT) AS n
FROM t a JOIN t b
  ON b.doc_id = a.doc_id AND b.i > a.i AND b.i <= a.i + {COOC_W}
GROUP BY 1, 2
"""

COOCCUR_QUERIES = {"cooccurrence_window": q_cooccurrence_window}
COOCCUR_ORACLES = {"cooccurrence_window": SQL_COOCCURRENCE}
