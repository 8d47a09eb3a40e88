"""Chi-square term/class feature selection over the documents corpus.

The standard filter-method feature selector for corpus curation and
classifier bootstrapping (Manning/Schuetze IR ch. 13): for every
(class c = lang, term t) cell of the document-frequency contingency
table

    n11 = docs of class c containing t      n10 = df(t) - n11
    n01 = n(c) - n11                        n00 = N - n(c) - n10

    chi2 = N * (n11*n00 - n10*n01)^2
           / ((n11+n01) * (n10+n00) * (n11+n10) * (n01+n00))

reported in exact integer milli-units (Python-int finalize — the
products exceed int64 at corpus scale; the oracle uses HUGEINT for the
same reason). Degenerate margins (term in every doc / no doc, class
empty / universal) define chi2 = 0 on both engines.

Tokenization is the module-wide corpus contract: ``split(' ')`` ==
DuckDB ``string_split`` with empties kept; "containing" means the term
appears in the doc's DISTINCT token set.

Plan / 100 TB notes: ONE corpus pass — a fully vectorized per-batch
distinct-(doc, term) reduction (dictionary-encode + packed-int64
np.unique; no Python loop over rows) emits (lang, term) partial doc
counts, then one vocab-x-langs-bounded keyed Sum. Class sizes ride the
same exchange as per-batch (lang, __docs__) sentinel rows, so there is
no second pass and no join. The finalize pulls vocab x |langs| rows to
the driver — the LM-vocabulary bounded-pull class (cluster_top_terms /
unigram_logprob); web-scale vocab wants the same top-M gf cap those
operators document.

Reference analogue: /root/reference/app.py has no feature-selection
surface; brief scope (text-analysis operators over documents).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..remote import remote_fn

_QF = "khl_pdf_ocr_ray.pipelines.queries_featsel"

CHI2_UNIT = 1000  # milli-units
# sentinel term carrying per-class doc counts on the same exchange;
# a space can never be a token of split(' ')
_CLASS_SENTINEL = " "


def chi2_pairs_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (lang, term, n) distinct-doc partial counts,
    plus one (lang, _CLASS_SENTINEL, n_docs) sentinel row per lang."""
    text = pc.fill_null(batch["text"], "")
    lang = batch["lang"]
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks).combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    v = max(1, len(vocab))
    # distinct (doc, term) pairs via one packed-int64 unique
    uk = np.unique(parent.astype(np.int64) * v + codes)
    doc_pos = uk // v
    term_code = uk % v
    # lang per doc position -> integer codes for the pair count
    lenc = pc.dictionary_encode(
        lang.combine_chunks() if isinstance(lang, pa.ChunkedArray) else lang
    )
    lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    langs = lenc.dictionary.to_pylist()
    pair = lcodes[doc_pos] * v + term_code
    up, cnt = np.unique(pair, return_counts=True)
    out_lang = [langs[int(x)] for x in up // v]
    out_term = [vocab[int(x)] for x in up % v]
    out_n = cnt.astype(np.int64)
    # sentinel rows: per-lang doc counts on the same exchange
    ul, ucnt = np.unique(lcodes, return_counts=True)
    return pa.table(
        {
            "lang": pa.array(
                out_lang + [langs[int(x)] for x in ul], pa.string()
            ),
            "term": pa.array(
                out_term + [_CLASS_SENTINEL] * len(ul), pa.string()
            ),
            "n": pa.array(
                np.concatenate([out_n, ucnt.astype(np.int64)]), pa.int64()
            ),
        }
    )


def chi2_finalize(cells: pd.DataFrame) -> pd.DataFrame:
    """(lang, term, n) aggregated cells incl. sentinel rows -> the chi2
    table, exact Python-int arithmetic (vocab x |langs| rows)."""
    sent = cells["term"] == _CLASS_SENTINEL
    n_c = {
        r.lang: int(r.n) for r in cells[sent].itertuples()
    }
    body = cells[~sent]
    big_n = sum(n_c.values())
    df_t: dict = {}
    for r in body.itertuples():
        df_t[r.term] = df_t.get(r.term, 0) + int(r.n)
    out_lang, out_term, out_n11, out_chi2 = [], [], [], []
    for r in body.itertuples():
        n11 = int(r.n)
        nc = n_c[r.lang]
        df = df_t[r.term]
        n10 = df - n11
        n01 = nc - n11
        n00 = big_n - nc - n10
        denom = df * (big_n - df) * nc * (big_n - nc)
        if denom == 0:
            chi2 = 0
        else:
            num = n11 * n00 - n10 * n01
            chi2 = (CHI2_UNIT * big_n * num * num) // denom
        out_lang.append(r.lang)
        out_term.append(r.term)
        out_n11.append(n11)
        out_chi2.append(chi2)
    return pd.DataFrame(
        {
            "lang": out_lang,
            "term": out_term,
            "n11": np.array(out_n11, dtype=np.int64),
            "chi2_milli": np.array(out_chi2, dtype=np.int64),
        }
    )


def q_term_chi2(sf_dir: str) -> pd.DataFrame:
    """(lang, term, n11, chi2_milli). See module docstring."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["lang", "text"])
        .map_batches(
            remote_fn(_QF, "chi2_pairs_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lang", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocab x |langs| rows — LM-vocabulary bounded pull
    )
    return chi2_finalize(cells)


SQL_TERM_CHI2 = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, lang,
         unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents),
cell AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS n11
  FROM pairs GROUP BY lang, term),
cl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_c FROM documents GROUP BY lang),
tt AS (SELECT term, CAST(sum(n11) AS BIGINT) AS df FROM cell GROUP BY term),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT cell.lang, cell.term, cell.n11,
  CAST(CASE WHEN df = 0 OR df = n OR n_c = 0 OR n_c = n THEN 0
       ELSE ({CHI2_UNIT} * CAST(n AS HUGEINT)
             * (CAST(cell.n11 AS HUGEINT) * (n - n_c - (df - cell.n11))
                - CAST(df - cell.n11 AS HUGEINT) * (n_c - cell.n11))
             * (CAST(cell.n11 AS HUGEINT) * (n - n_c - (df - cell.n11))
                - CAST(df - cell.n11 AS HUGEINT) * (n_c - cell.n11)))
            // (CAST(df AS HUGEINT) * (n - df) * n_c * (n - n_c))
       END AS BIGINT) AS chi2_milli
FROM cell
JOIN cl USING (lang) JOIN tt USING (term) CROSS JOIN tot
"""

FEATSEL_QUERIES = {"term_chi2": q_term_chi2}
FEATSEL_ORACLES = {"term_chi2": SQL_TERM_CHI2}
