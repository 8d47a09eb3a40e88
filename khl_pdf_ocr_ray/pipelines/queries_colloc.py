"""Collocation mining: top-K bigrams by pointwise mutual information.

The tokenizer-prep operator: statistical phrase detection (Mikolov
2013's word2vec phrases, classic NLP collocation extraction) scores a
bigram (a, b) by how much more often it co-occurs than independence
predicts — PMI = P(ab) / (P(a) P(b)) = n_ab * N / (n_a * n_b). High-PMI
bigrams become single tokens / merge candidates.

Exactness contract: the score is the INTEGER ratio x 1e6 — at real
corpus sizes ``n_ab * N * 1e6`` overflows int64, so the Ray kernel
computes it with Python's arbitrary-precision ints over the (bounded,
min-count-filtered) candidate set and the oracle uses HUGEINT, both
flooring once; the final ordering ties break on (w1, w2).

Plan, one corpus pass:
- a map stage extracts tokens AND adjacent pairs fully vectorized
  (Arrow split -> flat values + offsets -> numpy index math: a pair is
  two consecutive kept tokens with the same row id; no per-row Python)
  and pre-reduces to per-batch gram counts, tagging unigrams with
  w2 = '' (never a real token — empties are filtered before pairing,
  matching the SQL's list_filter);
- ONE (w1, w2)-keyed exchange sums the partials; the result is
  materialized once as the reused working set (distinct-gram-sized,
  never driver-collected) feeding four consumers: the vocab slice, the
  |vocab|-row token total, and the candidate filter;
- bigrams surviving MIN_N join unigram counts for each side (slim x
  slim; emptiness of the candidate set is data-dependent, so these use
  safe_join's materialize fallback by design);
- the candidate-sized scoring map runs Python-int exact arithmetic
  (bounded by the min-count filter: <= N_tok / MIN_N rows), then a
  top-K sort.

Reference analogue: /root/reference/app.py has no corpus-statistics
surface; brief scope (LLM training-data operators, tokenizer prep —
complements bpe_merges' greedy pair learning with the statistical
scoring path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QC = "khl_pdf_ocr_ray.pipelines.queries_colloc"

PMI_MIN_N = 25     # a bigram needs this many occurrences to be scored
PMI_TOP_K = 50
PMI_SCALE = 1_000_000


def gram_count_partial(batch: pa.Table) -> pa.Table:
    """One batch -> per-batch gram counts: (w1, w2='', n) unigram rows
    and (w1, w2, n) adjacent-pair rows. Vectorized end to end: Arrow
    split, numpy adjacency over (flat values, row ids), Arrow group_by
    for the per-batch reduce."""
    toks = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
    la = toks.combine_chunks()
    values = la.values
    nrows = len(la)
    off = la.offsets.to_numpy().astype("int64")
    row_id = np.repeat(np.arange(nrows, dtype="int64"), np.diff(off))
    keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    fpos = np.flatnonzero(keep)
    frow = row_id[fpos]
    out_parts = []
    if fpos.size:
        uni = (
            pa.table({"w1": values.take(pa.array(fpos))})
            .group_by("w1")
            .aggregate([([], "count_all")])
        )
        uni = select_rename(uni, w1="w1", n="count_all")
        out_parts.append(
            pa.table(
                {
                    "w1": uni["w1"],
                    "w2": pa.array([""] * uni.num_rows, pa.string()),
                    "n": pc.cast(uni["n"], pa.int64()),
                }
            )
        )
    if fpos.size > 1:
        pair = frow[:-1] == frow[1:]  # consecutive kept tokens, same doc
        w1_idx, w2_idx = fpos[:-1][pair], fpos[1:][pair]
        if w1_idx.size:
            bi = (
                pa.table(
                    {
                        "w1": values.take(pa.array(w1_idx)),
                        "w2": values.take(pa.array(w2_idx)),
                    }
                )
                .group_by(["w1", "w2"])
                .aggregate([([], "count_all")])
            )
            bi = select_rename(bi, w1="w1", w2="w2", n="count_all")
            out_parts.append(
                pa.table(
                    {
                        "w1": bi["w1"],
                        "w2": bi["w2"],
                        "n": pc.cast(bi["n"], pa.int64()),
                    }
                )
            )
    if not out_parts:
        return pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(out_parts)


def uni_project(batch: pa.Table, name: str) -> pa.Table:
    u = batch.filter(pc.equal(batch["w2"], ""))
    return pa.table({name: u["w1"], f"n_{name}": u["n"]})


def bi_candidates(batch: pa.Table) -> pa.Table:
    b = batch.filter(
        pc.and_(pc.not_equal(batch["w2"], ""), pc.greater_equal(batch["n"], PMI_MIN_N))
    )
    return pa.table({"w1": b["w1"], "w2": b["w2"], "n_ab": b["n"]})


def pmi_score_batch(batch: pa.Table, n_tok: int) -> pa.Table:
    """Exact integer PMI x 1e6 with Python bigints — the batch is
    candidate-sized (<= N_tok / MIN_N rows globally), so the per-row
    Python cost is bounded by construction."""
    n_ab = batch["n_ab"].to_pylist()
    n1 = batch["n_u1"].to_pylist()
    n2 = batch["n_u2"].to_pylist()
    score = [
        (a * n_tok * PMI_SCALE) // (b * c) for a, b, c in zip(n_ab, n1, n2)
    ]
    return pa.table(
        {
            "w1": batch["w1"],
            "w2": batch["w2"],
            "n_ab": batch["n_ab"],
            "pmi_x1e6": pa.array(score, pa.int64()),
        }
    )


def q_collocations_pmi(sf_dir: str) -> rd.Dataset:
    """Top-K bigram collocations by exact integer PMI. See module
    docstring for the plan."""
    from ..joins import safe_join
    from .queries import _t

    grams = (
        _t(sf_dir, "documents", ["text"])
        .map_batches(remote_fn(_QC, "gram_count_partial"), batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # distinct-gram-sized working set, four consumers
    )
    unis1 = grams.map_batches(remote_fn(_QC, "uni_project", name="u1"),
                              batch_format="pyarrow")
    unis2 = grams.map_batches(remote_fn(_QC, "uni_project", name="u2"),
                              batch_format="pyarrow")
    n_tok = int(unis1.sum("n_u1") or 0)  # |vocab|-row aggregate
    cands = grams.map_batches(remote_fn(_QC, "bi_candidates"),
                              batch_format="pyarrow")
    j1 = safe_join(cands, unis1, on=("w1",), right_on=("u1",))
    empty = rd.from_arrow(
        pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n_ab": pa.array([], pa.int64()),
                "pmi_x1e6": pa.array([], pa.int64()),
            }
        )
    )
    if j1 is None:
        return empty
    j2 = safe_join(j1, unis2, on=("w2",), right_on=("u2",))
    if j2 is None:
        return empty
    return (
        j2.map_batches(remote_fn(_QC, "pmi_score_batch", n_tok=n_tok),
                       batch_format="pyarrow")
        .sort(["pmi_x1e6", "w1", "w2"], descending=[True, False, False])
        .limit(PMI_TOP_K)
    )


SQL_COLLOCATIONS_PMI = f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
uni AS (
  SELECT u.w AS w, CAST(count(*) AS BIGINT) AS n
  FROM toks, unnest(t) AS u(w) GROUP BY u.w),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tok FROM uni),
bi AS (
  SELECT p.pr[1] AS w1, p.pr[2] AS w2, CAST(count(*) AS BIGINT) AS n_ab
  FROM toks, unnest(list_zip(t, t[2:])) AS p(pr)
  WHERE p.pr[2] IS NOT NULL
  GROUP BY w1, w2
  HAVING count(*) >= {PMI_MIN_N}),
scored AS (
  SELECT bi.w1, bi.w2, bi.n_ab,
         CAST((CAST(bi.n_ab AS HUGEINT) * tot.n_tok * {PMI_SCALE})
              // (CAST(u1.n AS HUGEINT) * u2.n) AS BIGINT) AS pmi_x1e6
  FROM bi, tot
  JOIN uni u1 ON bi.w1 = u1.w
  JOIN uni u2 ON bi.w2 = u2.w)
SELECT * FROM scored
ORDER BY pmi_x1e6 DESC, w1, w2
LIMIT {PMI_TOP_K}
"""


COLLOC_QUERIES = {
    "collocations_pmi": q_collocations_pmi,
}

COLLOC_ORACLES = {
    "collocations_pmi": SQL_COLLOCATIONS_PMI,
}
