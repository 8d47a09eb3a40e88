"""Vocabulary richness (Chao1 / Good-Turing) and weighted quantiles.

- ``vocab_richness`` — the unseen-species statistics of the corpus
  vocabulary: distinct terms D, singleton/doubleton counts f1/f2, the
  bias-corrected Chao1 richness lower bound
  D + f1*(f1-1) // (2*(f2+1)) (Chao 1984), and the Good-Turing unseen
  probability mass f1/N in ppm — what Heaps-law fits (vocab_growth)
  estimate by extrapolation, estimated here from frequency-of-
  frequencies instead. Plan: the zipf term-count pass (ONE term-keyed
  Sum exchange), then a per-batch frequency-class combiner folds the
  vocabulary table to a 5-integer row per block — the driver sees one
  row per block, never the vocabulary.
- ``weighted_median_price`` — the quantity-weighted lower median of
  lineitem extended price (cents): the weighted-quantile primitive
  (discrete: smallest value v with 2 * cumweight(<= v) >= W). Plan:
  a (cents, weight) histogram combiner -> value-domain-bounded Sum
  exchange -> driver walk (the events_mad / doc_size_quantiles
  convention). The fact table never shuffles.

Oracles: static SQL (frequency-of-frequencies GROUP BY; window
cumulative weights with the same discrete rule).

Reference analogue: none in /root/reference/app.py; brief scope
(text-analysis family next to vocab_growth / heaps / type_token_ratio;
aggregation family for the weighted quantile).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..remote import remote_fn

_QRH = "khl_pdf_ocr_ray.pipelines.queries_rich"


def rich_fof_partial(batch: pa.Table) -> pa.Table:
    """Global (term, cnt) rows -> one frequency-class partial row per
    batch: (n_distinct, n_tokens, f1, f2)."""
    c = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "n_distinct": pa.array([len(c)], pa.int64()),
            "n_tokens": pa.array([int(c.sum())], pa.int64()),
            "f1": pa.array([int((c == 1).sum())], pa.int64()),
            "f2": pa.array([int((c == 2).sum())], pa.int64()),
        }
    )


def q_vocab_richness(sf_dir: str) -> pd.DataFrame:
    """One row: (n_distinct, n_tokens, f1, f2, chao1, gt_unseen_ppm)."""
    from .queries import _t

    parts = (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_rank2",
                      "zipf_term_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            remote_fn(_QRH, "rich_fof_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .sum()
    )
    d = int(parts["n_distinct"])
    n = int(parts["n_tokens"])
    f1 = int(parts["f1"])
    f2 = int(parts["f2"])
    chao1 = d + f1 * (f1 - 1) // (2 * (f2 + 1))
    gt = f1 * 1_000_000 // n
    return pd.DataFrame(
        [(d, n, f1, f2, chao1, gt)],
        columns=[
            "n_distinct",
            "n_tokens",
            "f1",
            "f2",
            "chao1",
            "gt_unseen_ppm",
        ],
    ).astype("int64")


SQL_VOCAB_RICHNESS = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS term
  FROM documents),
cnt AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
s AS (
  SELECT count(*) AS d, sum(cnt) AS n,
         count(*) FILTER (WHERE cnt = 1) AS f1,
         count(*) FILTER (WHERE cnt = 2) AS f2
  FROM cnt)
SELECT CAST(d AS BIGINT) AS n_distinct, CAST(n AS BIGINT) AS n_tokens,
       CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
       CAST(d + f1 * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT) AS chao1,
       CAST(f1 * 1000000 // n AS BIGINT) AS gt_unseen_ppm
FROM s
"""


# --- weighted_median_price --------------------------------------------------
def wq_hist_partial(batch: pa.Table) -> pa.Table:
    """lineitem batch -> per-batch (cents, w) weighted histogram
    (weight = integer quantity)."""
    from .queries import _cents

    cents = _cents(batch["l_extendedprice"])
    # the repo-wide quantity convention: direct integral cast (the
    # values are exact integral doubles), twinned with CAST AS BIGINT
    w = pc.cast(batch["l_quantity"], pa.int64())
    g = pa.table({"cents": cents, "w": w}).group_by(["cents"]).aggregate(
        [("w", "sum")]
    )
    return pa.table({"cents": g["cents"], "w": g["w_sum"]})


def weighted_median_from_hist(hist: pd.DataFrame):
    """THE shared rule: sorted (value, weight) -> (W, lower weighted
    median) = smallest v with 2 * cumweight(<= v) >= W."""
    h = hist.sort_values("cents", ignore_index=True)
    w = h["w"].to_numpy().astype(np.int64)
    cum = np.cumsum(w)
    W = int(cum[-1])
    i = int(np.searchsorted(2 * cum, W, side="left"))
    return W, int(h["cents"].iloc[i])


def q_weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """One row: (total_weight, wmedian_cents)."""
    from .queries import _t

    hist = (
        _t(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])
        .map_batches(
            remote_fn(_QRH, "wq_hist_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("cents")
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )
    W, med = weighted_median_from_hist(hist)
    return pd.DataFrame(
        [(W, med)], columns=["total_weight", "wmedian_cents"]
    ).astype("int64")


SQL_WEIGHTED_MEDIAN_PRICE = """
WITH h AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         sum(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY cents),
c AS (
  SELECT cents, sum(w) OVER (ORDER BY cents) AS cum,
         sum(w) OVER () AS total
  FROM h)
SELECT CAST(max(total) AS BIGINT) AS total_weight,
       CAST(min(cents) FILTER (WHERE 2 * cum >= total) AS BIGINT)
         AS wmedian_cents
FROM c
"""


RICH_QUERIES = {
    "vocab_richness": q_vocab_richness,
    "weighted_median_price": q_weighted_median_price,
}
RICH_ORACLES = {
    "vocab_richness": SQL_VOCAB_RICHNESS,
    "weighted_median_price": SQL_WEIGHTED_MEDIAN_PRICE,
}
