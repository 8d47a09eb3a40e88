"""Deterministic Poisson bootstrap confidence interval.

``bootstrap_mean_ci``: estimate a confidence interval for the mean
event value with the POISSON BOOTSTRAP (Chamandy et al. 2012, "The
Poisson bootstrap for large data") — the resampling scheme that works
in one streaming pass: instead of drawing n rows with replacement per
replicate (which needs global coordination), every row independently
receives a Poisson(1) weight per replicate, and the replicate mean is
the weighted mean. With BOOT_B replicates the per-batch partial is a
BOOT_B x 2 integer table — embarrassingly mergeable.

Determinism contract: the per-(row, replicate) uniform is plain integer
hashing (event_id and replicate mixed through the repo-wide Knuth
multiply, reduced to 20 bits), and the Poisson(1) inverse CDF is
quantized ONCE at import into integer thresholds inlined into the SQL
twin — the weight is just "how many cumulative thresholds the uniform
cleared" (a sum of 6 boolean casts; weights capped at 7, the P < 1e-7
tail). Everything up to the final per-replicate division is exact
int64; replicate means are identical doubles on both engines, and the
CI bounds are DISCRETE order statistics of the replicate means (no
interpolation).

Plan: ONE pass, (BOOT_B + 1)-row partials per batch (the extra row
carries the unweighted totals), one Sum exchange, a 33-row driver fold. The corpus never shuffles.

Oracle: static SQL — generate_series replicates, the same hash and
threshold ladder, same discrete percentile picks.

Reference analogue: none in /root/reference/app.py; brief scope
(statistics family next to welch_t_value / ks_drift / sample_error_eval).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from ..remote import remote_fn

_QBT = "khl_pdf_ocr_ray.pipelines.queries_boot"

BOOT_B = 32  # replicates
_MULT = 2654435761
_U_BITS = 20
_U_MOD = 1 << _U_BITS
# Poisson(1) cumulative probabilities quantized to 20 bits, computed
# ONCE here and inlined into the SQL as integer literals: weight w =
# number of thresholds the uniform clears (caps at 7, tail P < 1e-7)
_POIS_CUM = []
_acc = 0.0
for _k in range(7):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CUM.append(int(math.floor(_acc * _U_MOD)))
# lo/hi CI picks: discrete order statistics of the BOOT_B sorted means
BOOT_LO_IDX = 1  # ~ 3rd percentile for B = 32
BOOT_HI_IDX = BOOT_B - 2


def boot_uniform(event_id: np.ndarray, r: int) -> np.ndarray:
    """THE shared 20-bit uniform per (row, replicate). The mix is
    reduced mod 2^31 BEFORE the Knuth multiply (the score_calibration
    convention) so the product stays inside int64 at any id magnitude —
    numpy would silently wrap where DuckDB raises."""
    mix = ((event_id % (1 << 31)) * 40503 + r + 1) % (1 << 31)
    return (mix * _MULT) % (1 << 32) % _U_MOD


def boot_partial(batch: pa.Table) -> pa.Table:
    """events batch -> BOOT_B + 1 rows (r, sw, swc): Poisson-weight
    count and weighted cents sum per replicate, plus the UNWEIGHTED
    totals as row r = -1 (so the operator is genuinely one pass — no
    separate totals scan)."""
    from .queries import _cents

    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = _cents(batch["value"]).to_numpy(zero_copy_only=False)
    cums = np.array(_POIS_CUM, dtype=np.int64)
    rows_r = np.empty(BOOT_B + 1, dtype=np.int64)
    sw = np.empty(BOOT_B + 1, dtype=np.int64)
    swc = np.empty(BOOT_B + 1, dtype=np.int64)
    for r in range(BOOT_B):
        u = boot_uniform(eid, r)
        w = np.searchsorted(cums, u, side="right")  # thresholds cleared
        rows_r[r] = r
        sw[r] = int(w.sum())
        swc[r] = int((w * cents).sum())
    rows_r[BOOT_B] = -1  # totals row: n and plain cents sum
    sw[BOOT_B] = len(eid)
    swc[BOOT_B] = int(cents.sum())
    return pa.table(
        {
            "r": pa.array(rows_r),
            "sw": pa.array(sw),
            "swc": pa.array(swc),
        }
    )


def boot_finalize(parts: pd.DataFrame, n_events: int, total_cents: int):
    """THE shared finalize: replicate sums -> (mean, lo, hi) doubles
    (discrete order-statistic CI)."""
    p = parts.sort_values("r", ignore_index=True)
    means = np.array(
        [
            float(swc) / sw
            for swc, sw in zip(p["swc"].astype(object), p["sw"].astype(object))
        ]
    )
    s = np.sort(means)
    return (
        float(total_cents) / n_events,
        float(s[BOOT_LO_IDX]),
        float(s[BOOT_HI_IDX]),
    )


def q_bootstrap_mean_ci(sf_dir: str) -> pd.DataFrame:
    """One row: (n_events, mean_cents, boot_lo, boot_hi)."""
    from .queries import _t

    allrows = (
        _t(sf_dir, "events", ["event_id", "value"])
        .map_batches(
            remote_fn(_QBT, "boot_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("r")
        .aggregate(Sum("sw", alias_name="sw"), Sum("swc", alias_name="swc"))
        .to_pandas()
    )
    tot = allrows[allrows["r"] == -1]
    parts = allrows[allrows["r"] >= 0]
    n_events = int(tot["sw"].iloc[0])
    total_cents = int(tot["swc"].iloc[0])
    mean, lo, hi = boot_finalize(parts, n_events, total_cents)
    return pd.DataFrame(
        [(n_events, mean, lo, hi)],
        columns=["n_events", "mean_cents", "boot_lo", "boot_hi"],
    )


def _sql() -> str:
    ladder = " + ".join(
        f"CASE WHEN u >= {c} THEN 1 ELSE 0 END" for c in _POIS_CUM
    )
    return f"""
WITH e AS (
  SELECT event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS r),
w AS (
  SELECT r.r, e.cents,
         ((((e.event_id % 2147483648) * 40503 + r.r + 1) % 2147483648)
          * {_MULT}) % 4294967296 % {_U_MOD} AS u
  FROM e CROSS JOIN r),
ww AS (SELECT r, cents, {ladder} AS w FROM w),
reps AS (
  SELECT r, sum(CAST(w AS HUGEINT)) AS sw,
         sum(CAST(w AS HUGEINT) * cents) AS swc
  FROM ww GROUP BY r),
means AS (
  SELECT CAST(swc AS DOUBLE) / sw AS m,
         row_number() OVER (ORDER BY CAST(swc AS DOUBLE) / sw) AS rk
  FROM reps),
tot AS (SELECT count(*) AS n, sum(CAST(cents AS HUGEINT)) AS c FROM e)
SELECT CAST(tot.n AS BIGINT) AS n_events,
       CAST(tot.c AS DOUBLE) / tot.n AS mean_cents,
       (SELECT m FROM means WHERE rk = {BOOT_LO_IDX + 1}) AS boot_lo,
       (SELECT m FROM means WHERE rk = {BOOT_HI_IDX + 1}) AS boot_hi
FROM tot
"""


SQL_BOOTSTRAP_MEAN_CI = _sql()

BOOT_QUERIES = {"bootstrap_mean_ci": q_bootstrap_mean_ci}
BOOT_ORACLES = {"bootstrap_mean_ci": SQL_BOOTSTRAP_MEAN_CI}
