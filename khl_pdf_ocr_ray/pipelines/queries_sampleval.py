"""Sampling-estimator error audit: hash-sample estimate vs exact count.

``sample_error_eval``: per language, the exact document count next to
the estimate a deterministic 1-in-SAMPLE_RATE hash sample would have
produced (estimate = SAMPLE_RATE x sampled count), with the absolute
error in permille — the calibration evidence behind every sampled
probe in the engine (the hot-host skew probe, stages/skew.py, uses
exactly this estimator family; this op quantifies what that probe's
error looks like on this corpus). The sample is the repo's standard
Knuth multiplicative residue on the row key, so it is layout- and
shard-independent: ``(doc_id * 2654435761) % 2^32 < 2^32 / RATE``.

Plan / 100 TB notes: MAP-ONLY — each batch folds (lang, n_exact,
n_sampled) partials; ONE lang-cardinality exchange; integer finalize.
The exact side rides along for the audit — a deployed probe would run
only the sampled branch and skip the full pass.

Oracle: static SQL (same residue arithmetic in HUGEINT).

Reference analogue: /root/reference/app.py has no sampling surface;
brief scope (probe-calibration evidence for the skew machinery).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QSE = "khl_pdf_ocr_ray.pipelines.queries_sampleval"

SAMPLE_RATE = 100  # 1-in-100
KNUTH = 2654435761
_M32 = 1 << 32
_THRESH = _M32 // SAMPLE_RATE


def sample_count_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (lang, n_exact, n_sampled) partials."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = (d * np.uint64(KNUTH)) & np.uint64(_M32 - 1)
    in_sample = (h < np.uint64(_THRESH)).astype(np.int64)
    t = pa.table(
        {
            "lang": batch["lang"],
            "one": pa.array(np.ones(len(d), dtype=np.int64), pa.int64()),
            "s": pa.array(in_sample, pa.int64()),
        }
    )
    g = t.group_by("lang").aggregate([("one", "sum"), ("s", "sum")])
    g = select_rename(g, lang="lang", n_exact="one_sum", n_sampled="s_sum")
    return pa.table(
        {
            "lang": g["lang"],
            "n_exact": g["n_exact"].cast(pa.int64()),
            "n_sampled": g["n_sampled"].cast(pa.int64()),
        }
    )


def sample_eval_finalize(batch: pa.Table) -> pa.Table:
    ne = batch["n_exact"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = batch["n_sampled"].to_numpy(zero_copy_only=False).astype(np.int64)
    est = ns * SAMPLE_RATE
    err = 1000 * np.abs(est - ne) // ne
    return pa.table(
        {
            "lang": batch["lang"],
            "n_exact": pa.array(ne, pa.int64()),
            "n_sampled": pa.array(ns, pa.int64()),
            "n_est": pa.array(est, pa.int64()),
            "err_permille": pa.array(err, pa.int64()),
        }
    )


def q_sample_error_eval(sf_dir: str) -> "object":
    """(lang, n_exact, n_sampled, n_est, err_permille)."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "lang"])
        .map_batches(
            remote_fn(_QSE, "sample_count_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(
            Sum("n_exact", alias_name="n_exact"),
            Sum("n_sampled", alias_name="n_sampled"),
        )
        .map_batches(
            remote_fn(_QSE, "sample_eval_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_SAMPLE_ERROR_EVAL = f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(CASE WHEN (CAST(doc_id AS HUGEINT) * {KNUTH})
                            % {_M32} < {_THRESH}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
  FROM documents GROUP BY lang)
SELECT lang, n_exact, n_sampled,
       CAST(n_sampled * {SAMPLE_RATE} AS BIGINT) AS n_est,
       CAST(1000 * abs(n_sampled * {SAMPLE_RATE} - n_exact) // n_exact
            AS BIGINT) AS err_permille
FROM c
"""

SAMPLEVAL_QUERIES = {"sample_error_eval": q_sample_error_eval}
SAMPLEVAL_ORACLES = {"sample_error_eval": SQL_SAMPLE_ERROR_EVAL}
