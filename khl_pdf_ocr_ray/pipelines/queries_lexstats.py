"""Lexical-diversity corpus statistics: type-token ratio and distinct-n.

Two corpus-health metrics a training-data pipeline reads before mixing
sources (vocabulary collapse and n-gram duplication are the classic
symptoms of template/boilerplate-heavy crawls, Self-BLEU/distinct-n in
the generation-diversity literature):

- ``type_token_ratio``  — per language: distinct word count (types),
  total word count (tokens) and TTR = types/tokens as an exact
  fixed-point ratio floor(2^20 * types / tokens);
- ``trigram_diversity`` — per language: distinct / total word TRIGRAM
  counts and their fixed-point ratio (distinct-3). Trigrams are built
  inside each document (no cross-document adjacency), fully vectorized
  (Arrow split -> flat token values + offsets -> numpy index math over
  row ids — the collocations_pmi adjacency pattern, extended to
  triples).

Tokenization is the module-wide contract of queries_corpus: a single
literal-space split on BOTH engines (Python/Arrow ``split(' ')`` ==
DuckDB ``string_split(text, ' ')``), empty tokens included — the token
streams are identical, so counts cannot drift.

Plan (shared by both queries): per-batch (lang, gram) pre-reduce ->
ONE (lang, gram)-keyed exchange summing the partials -> a per-batch
(lang, types=count, tokens=sum) second combiner -> a |langs|-row final
Sum -> map-only integer ratio. The corpus text never shuffles; the
first exchange moves only per-batch distinct-gram partial counts (the
n-gram-count bound every corpus-statistics operator here shares), the
second moves |langs| rows per block.

100 TB notes: both exchanges are combiner-backed; distinct-gram
cardinality is the working set (standard for n-gram statistics; the
vocabulary and trigram tables are corpus properties, not corpus-sized).
The ratio arithmetic is int64-safe to ~8.8e12 types (2^63 / 2^20).

Reference analogue: /root/reference/app.py has no corpus-statistics
surface; brief scope (text-analysis operators over the documents
table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QX = "khl_pdf_ocr_ray.pipelines.queries_lexstats"

LEX_SCALE = 1 << 20  # fixed-point scale shared with the SQL twins


def _flat_tokens(batch: pa.Table):
    """(token values, row ids) of the batch's space-split token stream,
    empty tokens INCLUDED (string_split parity)."""
    toks = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
    la = toks.combine_chunks()
    off = la.offsets.to_numpy().astype("int64")
    row_id = np.repeat(np.arange(len(la), dtype="int64"), np.diff(off))
    return la.values, row_id


def lex_word_partial(batch: pa.Table) -> pa.Table:
    """One batch -> per-batch (lang, gram, n) word counts."""
    values, row_id = _flat_tokens(batch)
    lang = pc.take(
        batch["lang"].combine_chunks(), pa.array(row_id, pa.int64())
    )
    g = (
        pa.table({"lang": lang, "gram": values})
        .group_by(["lang", "gram"])
        .aggregate([([], "count_all")])
    )
    g = select_rename(g, lang="lang", gram="gram", n="count_all")
    return g.set_column(2, "n", pc.cast(g["n"], pa.int64()))


def lex_trigram_partial(batch: pa.Table) -> pa.Table:
    """One batch -> per-batch (lang, gram, n) trigram counts; a trigram
    is three consecutive tokens of the SAME document, joined with a
    single space (tokens contain no spaces by construction of the
    split, so the join is injective)."""
    values, row_id = _flat_tokens(batch)
    empty = pa.table(
        {
            "lang": pa.array([], pa.string()),
            "gram": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if len(values) < 3:
        return empty
    same = (row_id[:-2] == row_id[1:-1]) & (row_id[1:-1] == row_id[2:])
    pos = np.flatnonzero(same)
    if pos.size == 0:
        return empty
    w1 = values.take(pa.array(pos))
    w2 = values.take(pa.array(pos + 1))
    w3 = values.take(pa.array(pos + 2))
    tri = pc.binary_join_element_wise(w1, w2, w3, " ")
    lang = pc.take(
        batch["lang"].combine_chunks(), pa.array(row_id[pos], pa.int64())
    )
    g = (
        pa.table({"lang": lang, "gram": tri})
        .group_by(["lang", "gram"])
        .aggregate([([], "count_all")])
    )
    g = select_rename(g, lang="lang", gram="gram", n="count_all")
    return g.set_column(2, "n", pc.cast(g["n"], pa.int64()))


def lex_rollup_partial(batch: pa.Table) -> pa.Table:
    """Reduced (lang, gram, n) rows -> per-batch (lang, types, tokens)
    partials: each input row is one distinct gram."""
    g = (
        pa.table({"lang": batch["lang"], "n": pc.cast(batch["n"], pa.int64())})
        .group_by("lang")
        .aggregate([("n", "count"), ("n", "sum")])
    )
    return select_rename(g, lang="lang", types="n_count", tokens="n_sum")


def lex_ratio(batch: pa.Table, types_col: str, tokens_col: str,
              ratio_col: str) -> pa.Table:
    """Map-only exact fixed-point ratio floor(2^20 * types / tokens)."""
    types = batch["types"].to_numpy(zero_copy_only=False).astype(np.int64)
    tokens = batch["tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "lang": batch["lang"],
            types_col: pa.array(types, pa.int64()),
            tokens_col: pa.array(tokens, pa.int64()),
            ratio_col: pa.array((types * LEX_SCALE) // tokens, pa.int64()),
        }
    )


def _lex_pipeline(sf_dir: str, partial_fn: str, types_col: str,
                  tokens_col: str, ratio_col: str) -> rd.Dataset:
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["lang", "text"])
        .map_batches(
            remote_fn(_QX, partial_fn),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lang", "gram"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            remote_fn(_QX, "lex_rollup_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(
            Sum("types", alias_name="types"),
            Sum("tokens", alias_name="tokens"),
        )
        .map_batches(
            remote_fn(
                _QX,
                "lex_ratio",
                types_col=types_col,
                tokens_col=tokens_col,
                ratio_col=ratio_col,
            ),
            batch_format="pyarrow",
        )
    )


def q_type_token_ratio(sf_dir: str) -> rd.Dataset:
    """(lang, n_types, n_tokens, ttr_fx). See module docstring."""
    return _lex_pipeline(
        sf_dir, "lex_word_partial", "n_types", "n_tokens", "ttr_fx"
    )


def q_trigram_diversity(sf_dir: str) -> rd.Dataset:
    """(lang, n_tri_distinct, n_tri_total, div_fx). See module
    docstring."""
    return _lex_pipeline(
        sf_dir, "lex_trigram_partial", "n_tri_distinct", "n_tri_total",
        "div_fx",
    )


# --- SQL twins (DuckDB, driver views) ----------------------------------

SQL_TYPE_TOKEN_RATIO = f"""
WITH u AS (
  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
c AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY lang, w)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST((count(*) * {LEX_SCALE}) // sum(n) AS BIGINT) AS ttr_fx
FROM c GROUP BY lang
"""

SQL_TRIGRAM_DIVERSITY = f"""
WITH u AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents),
g AS (
  SELECT lang,
         w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i)
           AS tri
  FROM u QUALIFY tri IS NOT NULL),
c AS (
  SELECT lang, tri, CAST(count(*) AS BIGINT) AS n FROM g
  GROUP BY lang, tri)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tri_distinct,
       CAST(sum(n) AS BIGINT) AS n_tri_total,
       CAST((count(*) * {LEX_SCALE}) // sum(n) AS BIGINT) AS div_fx
FROM c GROUP BY lang
"""

LEXSTATS_QUERIES = {
    "type_token_ratio": q_type_token_ratio,
    "trigram_diversity": q_trigram_diversity,
}

LEXSTATS_ORACLES = {
    "type_token_ratio": SQL_TYPE_TOKEN_RATIO,
    "trigram_diversity": SQL_TRIGRAM_DIVERSITY,
}
