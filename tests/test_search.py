"""Kernel-level checks for the keyword-search / BM25 family
(pipelines/queries_search.py): tokenizer parity with DuckDB string_split,
independent-formula score parity, and ranking semantics."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from khl_pdf_ocr_ray.pipelines.queries_search import (
    BM25_B,
    BM25_K1,
    BM25_SCALE,
    SEARCH_TERMS,
    bm25_doc_score_scaled,
    bm25_idf,
    bm25_term_score,
    bm25_term_score_scaled,
    doc_search_stats,
)


@pytest.mark.parametrize(
    "text",
    [
        "",
        "spark",
        "spark spark vector",
        "a  spark",  # double space -> empty token counted in dl
        " spark ",  # leading/trailing -> empty tokens
        "sparkle vectors",  # no exact-token match
    ],
)
def test_tokenizer_matches_duckdb_string_split(text):
    con = duckdb.connect()
    toks = con.execute(
        "SELECT unnest(string_split(?, ' ')) AS t", [text]
    ).df()["t"].tolist()
    dl, counts = doc_search_stats(text)
    assert dl == len(toks)
    for term in SEARCH_TERMS:
        assert counts.get(term, 0) == sum(1 for t in toks if t == term)
    con.close()


def test_term_score_matches_independent_formula():
    """Re-derive BM25 with plain math.* — agreement to float tolerance
    (the shared-kernel twins are bit-exact; this guards the formula)."""
    for tf, df, dl, n, avgdl in [(1, 10, 50, 100, 40.0), (7, 3, 12, 500, 55.5)]:
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        expect = idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
        )
        got = float(bm25_term_score(tf, df, dl, n, avgdl))
        assert got == pytest.approx(expect, rel=1e-12)


def test_doc_score_order_independent_input():
    """Fixed-point sums are exact integer arithmetic — any term order
    (i.e. any batch split) yields the same score."""
    idf = {t: bm25_idf(50 + i, 200) for i, t in enumerate(SEARCH_TERMS)}
    counts = {"vector": 2, "spark": 5, "stream": 1}
    rev = dict(reversed(list(counts.items())))
    a = bm25_doc_score_scaled(counts, 40, idf, 35.0)
    b = bm25_doc_score_scaled(rev, 40, idf, 35.0)
    assert isinstance(a, int) and a == b


def test_scaled_score_tracks_float_kernel():
    """floor(float_score * SCALE + 1/2) == the scaled kernel when idf is
    fed the same scalar (the float kernel is the documentation reference)."""
    for tf, df, dl, n, avgdl in [(1, 10, 50, 100, 40.0), (7, 3, 12, 500, 55.5)]:
        f = bm25_term_score(tf, df, dl, n, avgdl)
        s = bm25_term_score_scaled(tf, dl, bm25_idf(df, n), avgdl)
        assert abs(s - f * BM25_SCALE) <= 1.0


def test_ranking_semantics():
    """Rarer term (lower df) outscores a common one at equal tf; higher tf
    wins within a term; longer docs are penalized."""
    n, avgdl = 1000, 50.0
    rare = bm25_term_score(2, 5, 50, n, avgdl)
    common = bm25_term_score(2, 500, 50, n, avgdl)
    assert rare > common
    assert bm25_term_score(4, 50, 50, n, avgdl) > bm25_term_score(1, 50, 50, n, avgdl)
    assert bm25_term_score(2, 50, 20, n, avgdl) > bm25_term_score(2, 50, 200, n, avgdl)


def test_scores_are_deterministic():
    v1 = bm25_term_score_scaled(3, 42, bm25_idf(17, 12345), 47.25)
    v2 = bm25_term_score_scaled(3, 42, bm25_idf(17, 12345), 47.25)
    assert isinstance(v1, int) and v1 == v2
    assert v1 > 0
