"""Classifier-calibration reliability bins (integer-exact).

``score_calibration`` — the reliability-diagram primitive an ML data
pipeline runs on any quality/language/domain classifier before using
its scores to gate data: bucket documents by predicted score, compare
each bucket's mean predicted score against its observed positive
rate. A well-calibrated classifier tracks the diagonal; this corpus'
planted signal is deliberately OVERCONFIDENT (true rate = (s/1000)^2)
so the measured curve bends below the diagonal in a known closed form
the tests verify.

Signal plant (the docs_with_variants / ndcg qrels convention — the
synthetic corpus' 31-word vocabulary carries no organic correlated
score, measured: en-stopword share is bimodal {0,1000} and flat in
lang, and o_orderstatus is uniform in o_orderdate):
  score   = knuth(doc_id) % 1000            (uniform predicted score)
  label   = knuth(doc_id + SALT) % 10^6 < score^2
Both sides of the oracle compute the identical hashes; nothing is
float. The doc_id is reduced mod 2^31 BEFORE the multiply so the
closed form stays inside int64 at any corpus size.

Output: one row per populated fixed-width score bin (bin 0-9):
(bin, n_docs, n_pos, pos_rate_milli, mean_score_milli).

Plan / 100 TB notes: ONE map-side pass folds per-doc (score, label)
to <= 10 bin cells per batch; ONE <= 10-group Sum exchange; map-only
integer finalize. Only doc_id leaves the scan — the projection prunes
text entirely.

Oracle: static SQL — the same Knuth arithmetic and floor divisions.

Reference analogue: /root/reference/app.py has no eval surface; brief
scope (evaluation family next to score_auc / ndcg_eval / lang_confusion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QCB = "khl_pdf_ocr_ray.pipelines.queries_calib"

CALIB_MULT = 2654435761          # Knuth multiplicative constant (repo-wide)
CALIB_SALT = 998244353           # additive salt for the independent label hash
CALIB_BINS = 10
_M31 = 2147483647
_M32 = 4294967296


def calib_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (bin, n, n_pos, score) partials (score = sum)."""
    did = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    score = ((did % _M31) * CALIB_MULT) % _M32 % 1000
    h2 = (((did + CALIB_SALT) % _M31) * CALIB_MULT) % _M32 % 1_000_000
    is_pos = (h2 < score * score).astype(np.int64)
    b = np.minimum(score // (1000 // CALIB_BINS), CALIB_BINS - 1)
    t = pa.table(
        {
            "bin": pa.array(b, pa.int64()),
            "n_pos": pa.array(is_pos, pa.int64()),
            "score": pa.array(score, pa.int64()),
        }
    )
    g = t.group_by("bin").aggregate(
        [([], "count_all"), ("n_pos", "sum"), ("score", "sum")]
    )
    g = select_rename(
        g, bin="bin", n="count_all", n_pos="n_pos_sum", score="score_sum"
    )
    return g.set_column(1, "n", g["n"].cast(pa.int64()))


def calib_finalize(batch: pa.Table) -> pa.Table:
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_pos = batch["n_pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    ssum = batch["score"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "bin": batch["bin"].cast(pa.int64()),
            "n_docs": pa.array(n, pa.int64()),
            "n_pos": pa.array(n_pos, pa.int64()),
            "pos_rate_milli": pa.array((1000 * n_pos) // n, pa.int64()),
            "mean_score_milli": pa.array(ssum // n, pa.int64()),
        }
    )


def q_score_calibration(sf_dir: str) -> "object":
    """(bin, n_docs, n_pos, pos_rate_milli, mean_score_milli)."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QCB, "calib_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bin")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_pos", alias_name="n_pos"),
            Sum("score", alias_name="score"),
        )
        .map_batches(
            remote_fn(_QCB, "calib_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_SCORE_CALIBRATION = f"""
WITH s AS (
  SELECT ((doc_id % {_M31}) * {CALIB_MULT}) % {_M32} % 1000 AS score,
         CASE WHEN (((doc_id + {CALIB_SALT}) % {_M31}) * {CALIB_MULT})
                   % {_M32} % 1000000
              < (((doc_id % {_M31}) * {CALIB_MULT}) % {_M32} % 1000)
                * (((doc_id % {_M31}) * {CALIB_MULT}) % {_M32} % 1000)
              THEN 1 ELSE 0 END AS is_pos
  FROM documents),
b AS (
  SELECT LEAST(score // {1000 // CALIB_BINS}, {CALIB_BINS - 1}) AS bin,
         is_pos, score
  FROM s)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_pos) AS BIGINT) AS n_pos,
       CAST((1000 * sum(is_pos)) // count(*) AS BIGINT) AS pos_rate_milli,
       CAST(sum(score) // count(*) AS BIGINT) AS mean_score_milli
FROM b GROUP BY bin
"""

CALIB_QUERIES = {"score_calibration": q_score_calibration}
CALIB_ORACLES = {"score_calibration": SQL_SCORE_CALIBRATION}
