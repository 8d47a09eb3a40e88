"""Robust statistics + split-balance audit over documents.

``trimmed_mean_by_lang`` — the 10%-trimmed mean of document length per
language (drop the lowest and highest n//10 by (n_chars, doc_id)): the
robust location estimate corpus reports use when megadocs and stubs
would swamp a plain mean.

``split_chi2_balance`` — the audit run right after train_test_split:
is language distributed independently of the split? Full 2 x |langs|
contingency chi-square, per-cell terms in exact milli-units using THE
corpus split hash (queries.hash_residue — one implementation, the SQL
twin spells the identical expression):

  term_milli = (1000 * (o*N - rt*ct)^2) // (N * rt * ct)

Plan / 100 TB notes: the trimmed mean reuses the generic global-rank
machinery (queries_eval._global_rank: ONE distributed sort + run-tag +
O(runs x langs) driver offset fold — never a per-lang giant group);
per-lang totals ride a |langs|-row driver dict broadcast into the trim
filter; kept-sum partials reduce map-side and the milli finalize is
exact Python ints (1000 * sum exceeds int64 past ~10^16 chars). The
balance audit is ONE map-side (split, lang) combiner pass + a
2|langs|-cell driver fold.

Oracles: static SQL — ROW_NUMBER/COUNT windows; HUGEINT contingency
closed form over the same hash expression.

Reference analogue: /root/reference/app.py has no statistics surface;
brief scope (corpus-statistics operators over documents).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QR = "khl_pdf_ocr_ray.pipelines.queries_robust"

TRIM_DIV = 10  # drop n//10 rows at each tail
# THE corpus split-hash constants. queries.SPLIT_ID_MOD/SPLIT_MULT/
# SPLIT_TRAIN_PCT own the values; literals here because the ORACLES dict
# is built at import time and importing .queries from module body would
# be circular (queries.py imports this module at its bottom). Pinned by
# tests/test_round4d_ops.py::test_split_constants_match_corpus_rule.
SPLIT_ID_MOD_LOCAL = 2_147_483_647
SPLIT_MULT_LOCAL = 2_654_435_761
SPLIT_TRAIN_PCT_LOCAL = 90


def trim_filter(batch: pa.Table, counts: dict) -> pa.Table:
    """Keep rows with n//TRIM_DIV < rn <= n - n//TRIM_DIV, then reduce to
    (lang, kept_sum, kept_n) partials."""
    lang = batch["lang"]
    enc = pc.dictionary_encode(
        lang.combine_chunks() if isinstance(lang, pa.ChunkedArray) else lang
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # Python lookup only over the per-batch lang VOCAB, never per row
    nmap = np.array(
        [counts[v] for v in enc.dictionary.to_pylist()], dtype=np.int64
    )
    rn = batch["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = nmap[codes]
    cut = n // TRIM_DIV
    keep = pa.array((rn > cut) & (rn <= n - cut))
    t = pa.table(
        {"lang": lang, "kept": batch["n_chars"].cast(pa.int64())}
    ).filter(keep)
    g = t.group_by("lang").aggregate([("kept", "sum"), ("kept", "count")])
    g = select_rename(g, lang="lang", kept_sum="kept_sum",
                      kept_n="kept_count")
    return pa.table(
        {
            "lang": g["lang"],
            "kept_sum": g["kept_sum"].cast(pa.int64()),
            "kept_n": g["kept_n"].cast(pa.int64()),
        }
    )


def q_trimmed_mean_by_lang(sf_dir: str) -> pd.DataFrame:
    """(lang, n_docs, n_kept, trimmed_mean_milli). See module docstring."""
    from ray.data.aggregate import Count, Sum

    from .queries import _t
    from .queries_eval import _global_rank

    docs = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    ranked = _global_rank(
        docs,
        sort_cols=["lang", "n_chars", "doc_id"],
        part_col="lang",
        key_cols=["lang", "n_chars", "doc_id"],
        out_col="rn",
    )
    totals = (
        docs.groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()  # |langs| rows
    )
    counts = {r.lang: int(r.n_docs) for r in totals.itertuples()}
    sums = (
        ranked.map_batches(
            remote_fn(_QR, "trim_filter", counts=counts),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(
            Sum("kept_sum", alias_name="kept_sum"),
            Sum("kept_n", alias_name="kept_n"),
        )
        .to_pandas()  # |langs| rows
    )
    out = {"lang": [], "n_docs": [], "n_kept": [], "trimmed_mean_milli": []}
    for r in sorted(sums.itertuples(), key=lambda r: r.lang):
        ks, kn = int(r.kept_sum), int(r.kept_n)
        out["lang"].append(r.lang)
        out["n_docs"].append(counts[r.lang])
        out["n_kept"].append(kn)
        out["trimmed_mean_milli"].append((1000 * ks) // kn if kn else 0)
    return pd.DataFrame(
        {
            "lang": out["lang"],
            "n_docs": np.array(out["n_docs"], dtype=np.int64),
            "n_kept": np.array(out["n_kept"], dtype=np.int64),
            "trimmed_mean_milli": np.array(
                out["trimmed_mean_milli"], dtype=np.int64
            ),
        }
    )


def split_lang_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (split, lang, n) contingency partials using THE
    corpus split hash."""
    from .queries import SPLIT_TRAIN_PCT, hash_residue

    residue = hash_residue(batch["doc_id"].cast(pa.int64()), 100)
    split = pc.if_else(
        pc.less(residue, SPLIT_TRAIN_PCT),
        pa.scalar("train"),
        pa.scalar("test"),
    )
    t = pa.table({"split": split, "lang": batch["lang"]})
    g = t.group_by(["split", "lang"]).aggregate([([], "count_all")])
    g = select_rename(g, split="split", lang="lang", n="count_all")
    return g.set_column(2, "n", g["n"].cast(pa.int64()))


def split_chi2_finalize(cells: pd.DataFrame) -> pd.DataFrame:
    """Aggregated (split, lang, n) cells -> per-cell chi-square terms,
    exact Python ints."""
    c = {
        (r.split, r.lang): int(r.n) for r in cells.itertuples()
    }
    splits = sorted({s for s, _ in c})
    langs = sorted({la for _, la in c})
    big_n = sum(c.values())
    rt = {s: sum(c.get((s, la), 0) for la in langs) for s in splits}
    ct = {la: sum(c.get((s, la), 0) for s in splits) for la in langs}
    out = {"split": [], "lang": [], "n": [], "term_milli": []}
    for s in splits:
        for la in langs:
            o = c.get((s, la), 0)
            denom = big_n * rt[s] * ct[la]
            if denom == 0:
                term = 0
            else:
                dev = o * big_n - rt[s] * ct[la]
                term = (1000 * dev * dev) // denom
            out["split"].append(s)
            out["lang"].append(la)
            out["n"].append(o)
            out["term_milli"].append(term)
    return pd.DataFrame(
        {
            "split": out["split"],
            "lang": out["lang"],
            "n": np.array(out["n"], dtype=np.int64),
            "term_milli": np.array(out["term_milli"], dtype=np.int64),
        }
    )


def q_split_chi2_balance(sf_dir: str) -> pd.DataFrame:
    """(split, lang, n, term_milli) — the full 2 x |langs| grid."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["doc_id", "lang"])
        .map_batches(
            remote_fn(_QR, "split_lang_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["split", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # 2 x |langs| rows — vocabulary-bounded
    )
    return split_chi2_finalize(cells)


SQL_TRIMMED_MEAN_BY_LANG = f"""
WITH r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT lang,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST((1000 * CAST(sum(n_chars) AS HUGEINT)) // count(*) AS BIGINT)
         AS trimmed_mean_milli
FROM r
WHERE rn > n // {TRIM_DIV} AND rn <= n - n // {TRIM_DIV}
GROUP BY lang
"""


def _sql_split_chi2() -> str:
    return f"""
WITH cell AS (
  SELECT CASE WHEN ((doc_id % {SPLIT_ID_MOD_LOCAL}) * {SPLIT_MULT_LOCAL})
                   % 100 < {SPLIT_TRAIN_PCT_LOCAL}
              THEN 'train' ELSE 'test' END AS split,
         lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
grid AS (
  SELECT s.split, l.lang
  FROM (SELECT DISTINCT split FROM cell) s
  CROSS JOIN (SELECT DISTINCT lang FROM cell) l),
f AS (
  SELECT grid.split, grid.lang,
         CAST(coalesce(cell.n, 0) AS HUGEINT) AS o
  FROM grid LEFT JOIN cell USING (split, lang)),
rt AS (SELECT split, sum(o) AS r FROM f GROUP BY split),
ct AS (SELECT lang, sum(o) AS c FROM f GROUP BY lang),
tot AS (SELECT sum(o) AS big_n FROM f)
SELECT f.split, f.lang, CAST(f.o AS BIGINT) AS n,
       CAST(CASE WHEN tot.big_n * rt.r * ct.c = 0 THEN 0
            ELSE (1000 * (f.o * tot.big_n - rt.r * ct.c)
                       * (f.o * tot.big_n - rt.r * ct.c))
                 // (tot.big_n * rt.r * ct.c)
            END AS BIGINT) AS term_milli
FROM f JOIN rt USING (split) JOIN ct USING (lang) CROSS JOIN tot
"""


ROBUST_QUERIES = {
    "trimmed_mean_by_lang": q_trimmed_mean_by_lang,
    "split_chi2_balance": q_split_chi2_balance,
}
ROBUST_ORACLES = {
    "trimmed_mean_by_lang": SQL_TRIMMED_MEAN_BY_LANG,
    "split_chi2_balance": _sql_split_chi2(),
}
