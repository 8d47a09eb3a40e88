"""Priority sampling (Duffield, Lund & Thorup 2007) with exact
fixed-point arithmetic.

``priority_sample``: a weight-proportional sample of K documents
(weight = n_chars) with the Duffield subset-sum estimator, reported
per source: how many sampled, their raw weight, and the unbiased
estimate ``sum max(w_i, tau)`` of the source's TOTAL weight — the
sampling primitive a mixing pipeline uses to audit quotas from a
bounded sample instead of a full pass.

Determinism contract: priority = w / u with u uniform from the
repo-wide Knuth hash. Both sides rank by the SAME pinned fixed-point
key ``w * 2^48 // (h + 1)`` (priority scaled by 2^16) with doc_id as
the tie-break, so the sampled set and the estimator are bit-identical
by construction — the fixed-point key IS the definition, not an
approximation of a float order. Estimates are reported in the same
2^16 fixed point (``est_w_fx16``), exact integers end to end.
Weight bound: w < 2^15 keeps w * 2^48 inside int64 (asserted).

Plan / 100 TB notes: map-side per-block top-(K+1) prune (numpy
argpartition) BEFORE the distributed sort — the sort's input is
``blocks x (K+1)`` slim rows, not the corpus; tau is the (K+1)-th
global key; the per-source fold runs on K driver rows (report-sized).

Oracle: static SQL — same hash, same fixed-point key, row_number
ranking, same max(w << 16, tau) estimator.

Reference analogue: /root/reference/app.py has no sampling surface;
brief scope (weighted sampling alongside quota/temperature/stratified).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..remote import remote_fn

_QP = "khl_pdf_ocr_ray.pipelines.queries_priority"

PS_K = 100
PS_MULT = 2654435761  # Knuth multiplicative constant (repo-wide)
PS_MOD31 = 2147483647
PS_SPACE = 1 << 32
PS_FX = 16  # estimator fixed-point scale (2^16)


def priority_key(doc_id: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pinned fixed-point priority key: w * 2^48 // (knuth(id) + 1)."""
    h = (
        (doc_id.astype(np.uint64) % np.uint64(PS_MOD31))
        * np.uint64(PS_MULT)
    ) % np.uint64(PS_SPACE)
    assert (w < (1 << 15)).all() and (w >= 0).all(), (
        "priority_sample weight bound: w < 2^15 keeps w*2^48 in int64"
    )
    return (w.astype(np.int64) << 48) // (h.astype(np.int64) + 1)


def ps_prune(batch: pa.Table) -> pa.Table:
    """documents batch -> this block's top-(K+1) candidate rows."""
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = priority_key(did, w)
    keep = min(len(did), PS_K + 1)
    # top keep by (key desc, doc_id asc): lexsort on (-key, doc_id)
    order = np.lexsort((did, -key))[:keep]
    return pa.table(
        {
            "doc_id": pa.array(did[order], pa.int64()),
            "source": batch["source"].take(pa.array(order)),
            "w": pa.array(w[order], pa.int64()),
            "key": pa.array(key[order], pa.int64()),
        }
    )


def ps_fold(top: pd.DataFrame) -> pa.Table:
    """Global top-(K+1) rows -> per-source Duffield estimates."""
    assert len(top) >= PS_K + 1, (
        f"priority_sample needs > K={PS_K} candidate rows, got {len(top)}"
    )
    top = top.sort_values(
        ["key", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    tau = int(top["key"].iloc[PS_K])  # the (K+1)-th priority key
    samp = top.iloc[:PS_K]
    w = samp["w"].to_numpy(np.int64)
    contrib = np.maximum(w << PS_FX, tau)
    df = pd.DataFrame(
        {
            "source": samp["source"].to_numpy(),
            "n_sampled": np.ones(len(samp), np.int64),
            "w_sampled": w,
            "est": contrib,
        }
    )
    g = (
        df.groupby("source", as_index=False)
        .agg(
            n_sampled=("n_sampled", "sum"),
            w_sampled=("w_sampled", "sum"),
            est_w_fx16=("est", "sum"),
        )
        .sort_values("source")
    )
    return pa.table(
        {
            "source": pa.array(g["source"].tolist(), pa.string()),
            "n_sampled": pa.array(g["n_sampled"].to_numpy(np.int64), pa.int64()),
            "w_sampled": pa.array(g["w_sampled"].to_numpy(np.int64), pa.int64()),
            "est_w_fx16": pa.array(
                g["est_w_fx16"].to_numpy(np.int64), pa.int64()
            ),
        }
    )


def q_priority_sample(sf_dir: str) -> "object":
    """(source, n_sampled, w_sampled, est_w_fx16)."""
    from .queries import _t

    top = (
        _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .map_batches(
            remote_fn(_QP, "ps_prune"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["key", "doc_id"], descending=[True, False])
        .limit(PS_K + 1)
        .to_pandas()  # K+1 rows — sample-sized by construction
    )
    return ps_fold(top)


SQL_PRIORITY_SAMPLE = f"""
WITH d AS (
  SELECT doc_id, source, n_chars AS w,
         (n_chars * {1 << 48})
           // (((doc_id % {PS_MOD31}) * {PS_MULT}) % {PS_SPACE} + 1) AS key
  FROM documents),
r AS (
  SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rnk FROM d),
tau AS (SELECT key AS t FROM r WHERE rnk = {PS_K} + 1)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(w) AS BIGINT) AS w_sampled,
       CAST(sum(greatest(w * {1 << PS_FX}, tau.t)) AS BIGINT) AS est_w_fx16
FROM r CROSS JOIN tau
WHERE rnk <= {PS_K}
GROUP BY source
"""

PRIORITY_QUERIES = {"priority_sample": q_priority_sample}
PRIORITY_ORACLES = {"priority_sample": SQL_PRIORITY_SAMPLE}
