"""Holt double-exponential-smoothing forecast over daily event volume.

The capacity-planning companion to the CUSUM monitor: smooth the daily
count series with level + trend state and backtest the one-step-ahead
forecast, all in exact integer milli-units with dyadic smoothing
factors (alpha = 1/2, beta = 1/4). FLOOR division is the recurrence;
the trend dividend goes negative on decreasing series and DuckDB ``//``
TRUNCATES toward zero there (measured: ``-7 // 2 = -3`` vs Python's
``-4``), so the oracle emulates floor explicitly via
``(x - ((x % d) + d) % d) // d`` on both divisions:

  y_t = 1000 * n_t
  t=0:  f_0 = y_0;             l_0 = y_0;  b_0 = 0;  err_0 = 0
  t>0:  f_t = l_{t-1} + b_{t-1}
        l_t = (y_t + f_t) // 2
        b_t = (l_t - l_{t-1} + 3 * b_{t-1}) // 4
        err_t = |y_t - f_t|

Output: one row per day
(day, n_events, level_milli, trend_milli, forecast_milli, abs_err_milli).

Plan / 100 TB notes: the corpus reduces to |days| rows via the
combiner-backed per-day Count (the events payload never shuffles); the
recurrence folds driver-side over calendar-bounded state (~3.7k rows a
decade) — the CUSUM / watermark bounded-driver-state class.

Oracle: an INDEPENDENT relational derivation — a DuckDB recursive CTE
over the ROW_NUMBER-ordered day series computes the same recurrence.

Reference analogue: /root/reference/app.py has no forecasting surface;
brief scope (streaming-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa  # noqa: F401  (remote day_tag kernel reuse)

from ..remote import remote_fn

_QM = "khl_pdf_ocr_ray.pipelines.queries_monitor"  # reuse day_tag

DAY_US = 86_400_000_000


def holt_fold(days: np.ndarray, counts: np.ndarray):
    """The Holt recurrence over the ordered day series (|days|-sized,
    shared verbatim by tests). Returns (level, trend, forecast, abs_err)
    arrays aligned with the INPUT order."""
    order = np.argsort(days)
    c = counts[order].astype(np.int64)
    n = len(c)
    lv = np.zeros(n, dtype=np.int64)
    tr = np.zeros(n, dtype=np.int64)
    fc = np.zeros(n, dtype=np.int64)
    er = np.zeros(n, dtype=np.int64)
    l_prev = b_prev = 0
    for i in range(n):
        y = 1000 * int(c[i])
        if i == 0:
            f = y
            lev = y
            b = 0
            err = 0
        else:
            f = l_prev + b_prev
            lev = (y + f) // 2
            b = (lev - l_prev + 3 * b_prev) // 4
            err = abs(y - f)
        lv[i], tr[i], fc[i], er[i] = lev, b, f, err
        l_prev, b_prev = lev, b
    out = []
    for a in (lv, tr, fc, er):
        o = np.empty_like(a)
        o[order] = a
        out.append(o)
    return tuple(out)


def q_holt_forecast(sf_dir: str) -> pd.DataFrame:
    """(day, n_events, level_milli, trend_milli, forecast_milli,
    abs_err_milli). See module docstring."""
    from ray.data.aggregate import Count

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
    lv, tr, fc, er = holt_fold(days, counts)
    return pd.DataFrame(
        {
            "day": days,
            "n_events": counts,
            "level_milli": lv,
            "trend_milli": tr,
            "forecast_milli": fc,
            "abs_err_milli": er,
        }
    ).sort_values("day", ignore_index=True)


def _fdiv(x: str, d: int) -> str:
    """FLOOR-division SQL for a possibly-negative dividend (DuckDB //
    truncates toward zero): subtract the non-negative remainder first."""
    return f"(({x}) - ((({x}) % {d}) + {d}) % {d}) // {d}"


_L_EXPR = _fdiv("1000 * p.n + h.l + h.b", 2)
_B_EXPR = _fdiv(f"({_L_EXPR}) - h.l + 3 * h.b", 4)

SQL_HOLT_FORECAST = f"""
WITH RECURSIVE d AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
p AS (
  SELECT day, n, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn
  FROM d),
h AS (
  SELECT rn, day, n,
         1000 * n AS f,
         1000 * n AS l,
         CAST(0 AS BIGINT) AS b,
         CAST(0 AS BIGINT) AS err
  FROM p WHERE rn = 1
  UNION ALL
  SELECT p.rn, p.day, p.n,
         h.l + h.b AS f,
         {_L_EXPR} AS l,
         {_B_EXPR} AS b,
         abs(1000 * p.n - (h.l + h.b)) AS err
  FROM h JOIN p ON p.rn = h.rn + 1)
SELECT day, n AS n_events,
       CAST(l AS BIGINT) AS level_milli,
       CAST(b AS BIGINT) AS trend_milli,
       CAST(f AS BIGINT) AS forecast_milli,
       CAST(err AS BIGINT) AS abs_err_milli
FROM h
"""

FORECAST_QUERIES = {"holt_forecast": q_holt_forecast}
FORECAST_ORACLES = {"holt_forecast": SQL_HOLT_FORECAST}
