"""Pipeline-health monitoring: CUSUM drift detection over daily volume.

A data-quality monitor every production ingest runs next to the corpus
build: detect sustained upward shifts in daily event volume (crawler
loops, duplicate floods, upstream re-sends) with a one-sided CUSUM
chart (Page 1954) in exact integer milli-units:

  mean_milli  = (1000 * total_events) // n_days
  slack_milli = mean_milli // 100          (the CUSUM "k" allowance)
  h_milli     = 3 * mean_milli             (decision threshold)
  s_0         = max(0, 1000*c_0 - mean_milli - slack_milli)
  s_t         = max(0, s_{t-1} + 1000*c_t - mean_milli - slack_milli)
  alarm_t     = 1 if s_t > h_milli else 0

Output: one row per day (day, n_events, cusum_milli, alarm).

Plan: the corpus reduces to |days| rows by a combiner-backed per-day
Count (the events payload never shuffles); the CUSUM recurrence is a
sequential scan over that |days|-row series, folded driver-side — the
same bounded-driver-state class as the watermark/prefix-sum operators
(|days| is a calendar property, not corpus-sized; at 10 years it is
~3.7k rows). All arithmetic is int64 over non-negative values
(max(0, .) keeps the running sum non-negative; DuckDB ``//`` truncates
on negatives, so dividends stay >= 0 by construction).

Oracle: an INDEPENDENT relational derivation — DuckDB recursive CTE
over the day series computes the same recurrence.

Reference analogue: /root/reference/app.py has no monitoring surface;
brief scope (streaming-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from ..remote import remote_fn

_QM = "khl_pdf_ocr_ray.pipelines.queries_monitor"

DAY_US = 86_400_000_000
CUSUM_SLACK_DIV = 100  # slack = mean // 100 (the "k" allowance; the
#   synthetic corpus' daily variance is ~5% of mean, so this keeps the
#   accumulate/decay path live at every test scale — 12-26 nonzero
#   cusum days measured at sf0.001/0.01/0.1)
CUSUM_H_MULT = 3       # alarm threshold = 3 * mean (alarm firing on the
#   uniform synthetic corpus would need data-tuned constants; the alarm
#   path is held by the planted-drift unit test instead)


def day_tag(batch: pa.Table) -> pa.Table:
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table({"day": pa.array(ts_us // DAY_US, pa.int64())})


def cusum_fold(days: np.ndarray, counts: np.ndarray):
    """The CUSUM recurrence over the ordered day series (|days|-sized,
    shared verbatim by tests). Returns (cusum_milli, alarm) arrays."""
    order = np.argsort(days)
    c = counts[order].astype(np.int64)
    mean_milli = int((1000 * int(c.sum())) // len(c))
    slack = mean_milli // CUSUM_SLACK_DIV
    h = CUSUM_H_MULT * mean_milli
    s = np.zeros(len(c), dtype=np.int64)
    run = 0
    for i in range(len(c)):
        run = max(0, run + 1000 * int(c[i]) - mean_milli - slack)
        s[i] = run
    alarm = (s > h).astype(np.int64)
    out_s = np.empty_like(s)
    out_a = np.empty_like(alarm)
    out_s[order] = s
    out_a[order] = alarm
    return out_s, out_a


def q_cusum_drift(sf_dir: str) -> "object":
    """(day, n_events, cusum_milli, alarm). See module docstring."""
    import pandas as pd

    from .queries import _t

    daily = (
        _t(sf_dir, "events", ["ts"])
        .map_batches(
            remote_fn(_QM, "day_tag"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()  # |days| rows — calendar-bounded, never corpus-sized
    )
    days = daily["day"].to_numpy().astype(np.int64)
    counts = daily["n_events"].to_numpy().astype(np.int64)
    s, a = cusum_fold(days, counts)
    return pd.DataFrame(
        {
            "day": days,
            "n_events": counts,
            "cusum_milli": s,
            "alarm": a,
        }
    ).sort_values("day", ignore_index=True)


SQL_CUSUM_DRIFT = f"""
WITH RECURSIVE d AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
p AS (
  SELECT day, n, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn
  FROM d),
m AS (
  SELECT (1000 * sum(n)) // count(*) AS mean_milli FROM d),
k AS (
  SELECT mean_milli,
         mean_milli // {CUSUM_SLACK_DIV} AS slack,
         {CUSUM_H_MULT} * mean_milli AS h
  FROM m)
, rec AS (
  SELECT p.day, p.n, p.rn,
         GREATEST(0, 1000 * p.n - k.mean_milli - k.slack) AS s
  FROM p CROSS JOIN k WHERE p.rn = 1
  UNION ALL
  SELECT p.day, p.n, p.rn,
         GREATEST(0, rec.s + 1000 * p.n - k.mean_milli - k.slack) AS s
  FROM rec JOIN p ON p.rn = rec.rn + 1 CROSS JOIN k)
SELECT rec.day,
       rec.n AS n_events,
       CAST(rec.s AS BIGINT) AS cusum_milli,
       CAST(CASE WHEN rec.s > k.h THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM rec CROSS JOIN k
"""

MONITOR_QUERIES = {"cusum_drift": q_cusum_drift}
MONITOR_ORACLES = {"cusum_drift": SQL_CUSUM_DRIFT}
