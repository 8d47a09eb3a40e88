"""Seasonal-naive forecast backtest over daily event volume.

``seasonal_backtest``: for each candidate seasonality lag (1 = naive
"same as yesterday", 7 = weekly-naive), backtest the predictor
``forecast(day) = volume(day - lag)`` over the calendar-zero-filled
daily series and report the exact integer error sums — the
model-selection table read before trusting any volume forecast
(holt_forecast's sanity floor: a model that can't beat lag-7 naive on
MAE has learned nothing). Outputs per lag: n_days scored, total
absolute error, MAE in milli-events (floored), and the count of days
the naive call was exact.

Exactness: the series is integer counts; |x_t - x_{t-lag}| sums in
int64; mae_milli = 1000 * sae // n — no floats anywhere, so the
SQL window twin agrees bit-for-bit. Calendar gaps zero-fill (a silent
day IS an observation of 0 — the daily_acf convention).

Plan / 100 TB notes: identical exchange shape to daily_acf — ONE
map-side (day, n) combiner (only ts leaves the scan), ONE day-keyed
Sum, then a driver fold bounded by calendar days (decades of days ~
10^4 rows).

Oracle: static SQL (generate_series zero-fill + lag window).

Reference analogue: /root/reference/app.py has no time-series surface;
brief scope (pipeline-health forecasting evidence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..remote import remote_fn
from .queries_acf import DAY_US, acf_day_partial  # shared day-count partial

_QB = "khl_pdf_ocr_ray.pipelines.queries_backtest"

BACKTEST_LAGS = (1, 7)


def backtest_fold(counts: pd.DataFrame, lags=BACKTEST_LAGS) -> pd.DataFrame:
    """(day, n) rows -> per-lag exact backtest errors (Python ints)."""
    df = counts.sort_values("day").reset_index(drop=True)
    days = df["day"].to_numpy(dtype=np.int64)
    lo, hi = int(days[0]), int(days[-1])
    nd = hi - lo + 1
    x = np.zeros(nd, dtype=np.int64)
    x[days - lo] = df["n"].to_numpy(dtype=np.int64)
    rows = {"lag": [], "n_days": [], "sae": [], "mae_milli": [], "n_exact": []}
    for k in lags:
        assert k < nd, f"seasonal_backtest: lag {k} >= series length {nd}"
        err = np.abs(x[k:] - x[:-k])
        n = nd - k
        rows["lag"].append(k)
        rows["n_days"].append(n)
        rows["sae"].append(int(err.sum()))
        rows["mae_milli"].append(1000 * int(err.sum()) // n)
        rows["n_exact"].append(int((err == 0).sum()))
    return pd.DataFrame(
        {
            "lag": np.int64(rows["lag"]),
            "n_days": np.int64(rows["n_days"]),
            "sae": np.int64(rows["sae"]),
            "mae_milli": np.int64(rows["mae_milli"]),
            "n_exact": np.int64(rows["n_exact"]),
        }
    )


def q_seasonal_backtest(sf_dir: str) -> pd.DataFrame:
    """(lag, n_days, sae, mae_milli, n_exact) for lags 1 and 7."""
    from ray.data.aggregate import Sum

    from .queries import _t

    counts = (
        _t(sf_dir, "events", ["ts"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_acf", "acf_day_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per calendar day
    )
    return backtest_fold(counts)


_LAG_LIST = ", ".join(str(k) for k in BACKTEST_LAGS)

SQL_SEASONAL_BACKTEST = f"""
WITH d AS (
  SELECT epoch_us(ts) // {DAY_US} AS day FROM events),
cnt AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY day),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
cal AS (
  SELECT gs.day, coalesce(cnt.n, 0) AS n
  FROM (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b) gs
  LEFT JOIN cnt ON cnt.day = gs.day),
e AS (
  SELECT l.k, abs(a.n - p.n) AS err
  FROM (SELECT unnest([{_LAG_LIST}]) AS k) l
  JOIN cal a ON true
  JOIN cal p ON p.day = a.day - l.k)
SELECT CAST(k AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(err) AS BIGINT) AS sae,
       CAST(1000 * sum(err) // count(*) AS BIGINT) AS mae_milli,
       CAST(sum(CASE WHEN err = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
FROM e GROUP BY k
"""

BACKTEST_QUERIES = {"seasonal_backtest": q_seasonal_backtest}
BACKTEST_ORACLES = {"seasonal_backtest": SQL_SEASONAL_BACKTEST}
