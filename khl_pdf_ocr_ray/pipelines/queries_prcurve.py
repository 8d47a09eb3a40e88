"""Precision-recall AUC and expected calibration error (ECE).

Completes the classifier-evaluation family (score_auc = ROC,
score_calibration = reliability bins, decile_lift, ndcg_eval,
isotonic_calibration) over the same planted Knuth score/label signal:

- ``score_auc_pr`` — the area under the precision-recall STEP curve
  swept over the 1000 distinct score thresholds (predict positive iff
  score >= t): at each threshold TP/FP come from descending cumulative
  sums of the per-score (n, n_pos) histogram, and the area adds
  rectangle terms  dTP * P(t)  with the precision ratio kept exact:
  term_fx = dTP * ctp * 2^40 // (n_pos_total * (ctp + cfp)). Every
  term is an int64 (descending-order cumsums are deterministic data,
  the division happens per cell), so the sum is order-independent and
  bit-identical to the SQL twin — no float accumulation anywhere.
  PR-AUC is the metric that matters under class imbalance, where ROC
  AUC (score_auc) saturates.
- ``calibration_ece`` — the expected calibration error over the
  score_calibration bins: ece_ppm = sum over bins of
  n_b * |pos_rate_milli - mean_score_milli| * 1000 // N — the single
  headline number a model monitor alerts on, derived with the same
  integer milli bin statistics as the reliability diagram.

Plan: both are ONE map-side histogram/bin combiner pass (<= 1000 score
cells / 10 bins per batch) -> one bounded Sum exchange -> a driver walk
over the domain-bounded table. Only doc_id leaves the scan.

Oracles: static SQL — same histograms via window cumulative sums, same
integer term arithmetic.

Reference analogue: none in /root/reference/app.py; brief scope
(evaluation family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Sum

from ..remote import remote_fn
from .queries_calib import CALIB_BINS

_QPR = "khl_pdf_ocr_ray.pipelines.queries_prcurve"

PR_FX = 1 << 40


def pr_auc_from_cells(cells: pd.DataFrame):
    """THE shared finalize: per-score (n, n_pos) cells -> exact
    fixed-point PR-AUC (descending-threshold rectangle sum)."""
    c = cells.sort_values("score", ascending=False, ignore_index=True)
    n = c["n"].to_numpy().astype(np.int64)
    pos = c["n_pos"].to_numpy().astype(np.int64)
    ctp = np.cumsum(pos)
    call = np.cumsum(n)
    cfp = call - ctp
    n_pos = int(ctp[-1])
    n_neg = int(cfp[-1])
    terms = (pos.astype(object) * ctp * PR_FX) // (n_pos * (ctp + cfp))
    return n_pos, n_neg, int(sum(int(t) for t in terms))


def q_score_auc_pr(sf_dir: str) -> pd.DataFrame:
    """One row: (n_pos, n_neg, pr_auc_fx40)."""
    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_iso", "iso_cell_partial"
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("score")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
        .to_pandas()
    )
    n_pos, n_neg, auc = pr_auc_from_cells(cells)
    return pd.DataFrame(
        [(n_pos, n_neg, auc)], columns=["n_pos", "n_neg", "pr_auc_fx40"]
    ).astype("int64")


SQL_SCORE_AUC_PR = f"""
WITH c AS (
  SELECT ((doc_id % 2147483647) * 2654435761) % 4294967296 % 1000
           AS score,
         CASE WHEN (((doc_id + 998244353) % 2147483647) * 2654435761)
                   % 4294967296 % 1000000
              < (((doc_id % 2147483647) * 2654435761) % 4294967296 % 1000)
                * (((doc_id % 2147483647) * 2654435761) % 4294967296 % 1000)
              THEN 1 ELSE 0 END AS pos
  FROM documents),
h AS (SELECT score, count(*) AS n, sum(pos) AS n_pos
      FROM c GROUP BY score),
w AS (
  SELECT n_pos AS dtp,
         sum(n_pos) OVER (ORDER BY score DESC) AS ctp,
         sum(n - n_pos) OVER (ORDER BY score DESC) AS cfp
  FROM h),
tot AS (SELECT sum(n_pos) AS np_, sum(n - n_pos) AS nn FROM h)
SELECT CAST(tot.np_ AS BIGINT) AS n_pos, CAST(tot.nn AS BIGINT) AS n_neg,
       CAST((SELECT sum(CAST(dtp AS HUGEINT) * ctp * {PR_FX}
                        // (tot.np_ * (ctp + cfp))) FROM w)
            AS BIGINT) AS pr_auc_fx40
FROM tot
"""


def ece_from_bins(bins: pd.DataFrame) -> pd.DataFrame:
    """THE shared finalize: reliability bins -> one (n_docs, ece_ppm)
    row (integer milli bin stats, one division at the end)."""
    n = bins["n_docs"].to_numpy().astype(np.int64)
    diff = np.abs(
        bins["pos_rate_milli"].to_numpy().astype(np.int64)
        - bins["mean_score_milli"].to_numpy().astype(np.int64)
    )
    total = int(n.sum())
    ece = int((n * diff).sum()) * 1000 // total
    return pd.DataFrame(
        [(total, ece)], columns=["n_docs", "ece_ppm"]
    ).astype("int64")


def q_calibration_ece(sf_dir: str) -> pd.DataFrame:
    """One row: (n_docs, ece_ppm) from the score_calibration bins."""
    from .queries_calib import q_score_calibration

    bins = q_score_calibration(sf_dir)
    bins = bins.to_pandas() if hasattr(bins, "to_pandas") else bins
    return ece_from_bins(bins)


SQL_CALIBRATION_ECE = f"""
WITH c AS (
  SELECT ((doc_id % 2147483647) * 2654435761) % 4294967296 % 1000
           AS score,
         CASE WHEN (((doc_id + 998244353) % 2147483647) * 2654435761)
                   % 4294967296 % 1000000
              < (((doc_id % 2147483647) * 2654435761) % 4294967296 % 1000)
                * (((doc_id % 2147483647) * 2654435761) % 4294967296 % 1000)
              THEN 1 ELSE 0 END AS pos
  FROM c_base),
b AS (
  SELECT least(score // {1000 // CALIB_BINS}, {CALIB_BINS - 1}) AS bin,
         count(*) AS n, sum(pos) AS n_pos, sum(score) AS ssum
  FROM c GROUP BY bin),
m AS (
  SELECT n, abs(1000 * n_pos // n - ssum // n) AS diff FROM b)
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(n * diff) * 1000 // sum(n) AS BIGINT) AS ece_ppm
FROM m
"""


PRCURVE_QUERIES = {
    "score_auc_pr": q_score_auc_pr,
    "calibration_ece": q_calibration_ece,
}
PRCURVE_ORACLES = {
    "score_auc_pr": SQL_SCORE_AUC_PR,
    "calibration_ece": SQL_CALIBRATION_ECE.replace("c_base", "documents"),
}
