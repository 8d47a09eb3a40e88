"""Wald's Sequential Probability Ratio Test over the event stream.

``sprt_purchase_rate``: process events in (ts, event_id) order as a
Bernoulli stream (x = 1 iff event_type == 'purchase') and run the SPRT
for H0: p = P0 vs H1: p = P1 with alpha = beta = 0.05 — the sequential
decision primitive of online A/B and data-quality monitors (stop as
soon as the evidence crosses a boundary instead of waiting for a fixed
sample).

Everything is integer by construction: the two per-observation
log-likelihood-ratio increments and the +-ln(19) boundaries are
quantized ONCE at import time (floor(x * 2^20)) and inlined as literal
constants into the SQL twin — no cross-engine transcendental calls at
query time. The cumulative LLR is then an exact int64 prefix sum over
a deterministic total order.

Plan (the pack_sequences / events_watermark two-level scan shape):
pass 1 is a per-batch (day, n, llr_sum) combiner -> day-keyed Sum ->
the driver holds one (entry_rank, entry_llr) pair per DAY (exclusive
prefix over the ~60-row day table; associative, so it tree-reduces at
10^12 rows); pass 2 re-scans with the day-entry table shipped in the
task closure, sorts WITHIN each day shard only, and emits at most one
first-crossing candidate row per day; the driver takes the min rank.
The stream never goes through a global sort and never lands on the
driver.

Oracle: static SQL — row_number + ROWS-frame cumulative sum over the
same total order, same literal constants.

Reference analogue: none in /root/reference/app.py; brief scope
(streaming-stats family next to events_watermark / cusum_drift).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..remote import remote_fn

_QSP = "khl_pdf_ocr_ray.pipelines.queries_sprt"

DAY_US = 86_400_000_000
FX = 1 << 20
P0, P1 = 0.18, 0.22
# quantized once; the SQL twin inlines these INTEGERS (no ln() at query
# time on either engine)
LLR_POS = int(math.floor(math.log(P1 / P0) * FX))  # x = 1 step
LLR_NEG = int(math.floor(math.log((1 - P1) / (1 - P0)) * FX))  # x = 0 step
BOUND = int(math.floor(math.log(19.0) * FX))  # ln((1-b)/a), a = b = .05


def sprt_day_partial(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch (day, n, llr) partials."""
    from .queries import _floordiv_us

    day = _floordiv_us(pc.cast(batch["ts"], pa.int64()), DAY_US)
    is_p = pc.equal(batch["event_type"], "purchase")
    llr = pc.if_else(is_p, LLR_POS, LLR_NEG)
    t = pa.table({"day": day, "one": pa.repeat(1, len(batch)), "llr": llr})
    g = t.group_by(["day"]).aggregate([("one", "sum"), ("llr", "sum")])
    return pa.table(
        {
            "day": g["day"],
            "n": pc.cast(g["one_sum"], pa.int64()),
            "llr": pc.cast(g["llr_sum"], pa.int64()),
        }
    )


def sprt_scan_day(g: pd.DataFrame, entry_rank: dict, entry_llr: dict):
    """One day shard -> at most one first-crossing candidate row
    (rank, cum llr at the crossing). Sorts within the shard only."""
    day = int(g["day"].iloc[0])
    g = g.sort_values(["ts_us", "event_id"], ignore_index=True)
    step = np.where(g["is_p"].to_numpy(), LLR_POS, LLR_NEG).astype(np.int64)
    cum = entry_llr[day] + np.cumsum(step)
    hit = np.nonzero((cum >= BOUND) | (cum <= -BOUND))[0]
    if len(hit) == 0:
        return pd.DataFrame({"rank": [], "cum": []}).astype("int64")
    i = int(hit[0])
    return pd.DataFrame(
        {
            "rank": [entry_rank[day] + i + 1],
            "cum": [int(cum[i])],
        }
    ).astype("int64")


def sprt_day_project(batch: pa.Table) -> pa.Table:
    """events batch -> slim (day, ts_us, event_id, is_p) rows for the
    per-day scan."""
    from .queries import _floordiv_us

    us = pc.cast(batch["ts"], pa.int64())
    return pa.table(
        {
            "day": _floordiv_us(us, DAY_US),
            "ts_us": us,
            "event_id": batch["event_id"],
            "is_p": pc.equal(batch["event_type"], "purchase"),
        }
    )


def q_sprt_purchase_rate(sf_dir: str) -> pd.DataFrame:
    """One row: (n_total, final_llr_fx, decision, n_at_decision,
    llr_at_decision)."""
    from .queries import _t

    days = (
        _t(sf_dir, "events", ["ts", "event_type"])
        .map_batches(
            remote_fn(_QSP, "sprt_day_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"), Sum("llr", alias_name="llr"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    n_total = int(days["n"].sum())
    final_llr = int(days["llr"].sum())
    cum_n = np.concatenate(([0], np.cumsum(days["n"].to_numpy())[:-1]))
    cum_l = np.concatenate(([0], np.cumsum(days["llr"].to_numpy())[:-1]))
    entry_rank = {int(d): int(r) for d, r in zip(days["day"], cum_n)}
    entry_llr = {int(d): int(v) for d, v in zip(days["day"], cum_l)}

    cands = (
        _t(sf_dir, "events", ["ts", "event_id", "event_type"])
        .map_batches(
            remote_fn(_QSP, "sprt_day_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .map_groups(
            remote_fn(
                _QSP,
                "sprt_scan_day",
                entry_rank=entry_rank,
                entry_llr=entry_llr,
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if len(cands):
        best = cands.sort_values("rank", ignore_index=True).iloc[0]
        cum = int(best["cum"])
        decision = "h1" if cum >= BOUND else "h0"
        n_at, llr_at = int(best["rank"]), cum
    else:
        decision, n_at, llr_at = "none", 0, 0
    return pd.DataFrame(
        [(n_total, final_llr, decision, n_at, llr_at)],
        columns=[
            "n_total",
            "final_llr_fx",
            "decision",
            "n_at_decision",
            "llr_at_decision",
        ],
    )


SQL_SPRT_PURCHASE_RATE = f"""
WITH e AS (
  SELECT ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN {LLR_POS} ELSE {LLR_NEG} END AS st
  FROM events),
w AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) AS rn,
         sum(st) OVER (ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM e),
x AS (SELECT rn, cum FROM w
      WHERE cum >= {BOUND} OR cum <= -{BOUND}
      ORDER BY rn LIMIT 1),
tot AS (SELECT count(*) AS n_total, sum(st) AS final_llr FROM e)
SELECT CAST(tot.n_total AS BIGINT) AS n_total,
       CAST(tot.final_llr AS BIGINT) AS final_llr_fx,
       coalesce((SELECT CASE WHEN cum >= {BOUND} THEN 'h1'
                             ELSE 'h0' END FROM x), 'none') AS decision,
       CAST(coalesce((SELECT rn FROM x), 0) AS BIGINT) AS n_at_decision,
       CAST(coalesce((SELECT cum FROM x), 0) AS BIGINT) AS llr_at_decision
FROM tot
"""


SPRT_QUERIES = {"sprt_purchase_rate": q_sprt_purchase_rate}
SPRT_ORACLES = {"sprt_purchase_rate": SQL_SPRT_PURCHASE_RATE}
