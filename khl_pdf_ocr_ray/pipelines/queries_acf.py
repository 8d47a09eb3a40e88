"""Lag-k autocorrelation of daily event volume, exact in integers.

``daily_acf`` — the seasonality probe a pipeline-health monitor runs
on its daily ingest-volume series (weekly cycles show as a lag-7
peak; CUSUM drift and Holt forecasting live next door in
queries_monitor / queries_forecast). The ACF needs NO square root:
r_k = c_k / c_0 shares one variance denominator, so with the
mean cleared by scaling (y_t = n * x_t - S, all integers) the
statistic is an exact integer ratio. r_milli uses FLOORED division
(negative correlations floor consistently on both sides — DuckDB
``//`` truncates toward zero, so the oracle emulates floor via the
``(a - ((a % b + b) % b)) // b`` identity, the holt_forecast
precedent).

Calendar gaps zero-fill over [min_day, max_day] (a silent day IS a
volume observation of 0, and it keeps lags aligned to real days).

Output: one row per lag 1..ACF_MAX_LAG:
(lag, n_days, r_milli).

Plan / 100 TB notes: ONE map-side (day, n) count combiner over events
(only ts leaves the scan), ONE day-keyed Sum exchange, then a
driver-side fold over the DAILY series — bounded by calendar days
(years of data = thousands of rows; the context_length_budget class).
The fold runs in arbitrary-precision Python ints (y^2 sums overflow
int64 once daily volume exceeds ~10^9; the SQL twin uses HUGEINT),
so there is no silent-overflow scale cliff — at most a slow driver
fold, never a wrong answer.

Oracle: static SQL — generate_series zero-fill, HUGEINT products,
the same floored division.

Reference analogue: /root/reference/app.py has no time-series
surface; brief scope (streaming-shaped/temporal family §2.9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QA = "khl_pdf_ocr_ray.pipelines.queries_acf"

DAY_US = 86_400_000_000
ACF_MAX_LAG = 7


def acf_day_partial(batch: pa.Table) -> pa.Table:
    """events batch -> (day, n) count partials (floored day bucket)."""
    from .queries import _floordiv_us

    ep = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
    t = pa.table({"day": _floordiv_us(ep, DAY_US)})
    g = t.group_by("day").aggregate([([], "count_all")])
    g = select_rename(g, day="day", n="count_all")
    return g.set_column(1, "n", g["n"].cast(pa.int64()))


def acf_fold(counts, max_lag: int = ACF_MAX_LAG) -> list:
    """(day, n) rows -> [(lag, n_days, r_milli)] in exact Python ints.
    Shared by the distributed plan's driver fold and the tests."""
    df = counts.sort_values("day").reset_index(drop=True)
    days = df["day"].to_numpy(dtype=np.int64)
    lo, hi = int(days[0]), int(days[-1])
    nd = hi - lo + 1
    x = [0] * nd
    for d, n in zip(days, df["n"].to_numpy(dtype=np.int64)):
        x[int(d) - lo] = int(n)
    tot = sum(x)
    y = [nd * v - tot for v in x]  # mean cleared, still integer
    c0 = sum(v * v for v in y)
    assert c0 > 0, "daily_acf: constant series has no autocorrelation"
    out = []
    for k in range(1, max_lag + 1):
        assert k < nd, f"daily_acf: lag {k} >= series length {nd}"
        ck = sum(y[t] * y[t + k] for t in range(nd - k))
        out.append(
            {"lag": k, "n_days": nd, "r_milli": (1000 * ck) // c0}
        )
    return out


def q_daily_acf(sf_dir: str) -> "object":
    """(lag, n_days, r_milli) for lags 1..ACF_MAX_LAG."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .queries import _t

    counts = (
        _t(sf_dir, "events", ["ts"])
        .map_batches(
            remote_fn(_QA, "acf_day_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per calendar day
    )
    return pd.DataFrame(acf_fold(counts))


SQL_DAILY_ACF = f"""
WITH d AS (
  SELECT epoch_us(ts) // {DAY_US} AS day FROM events),
cnt AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY day),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
cal AS (
  SELECT gs.day, coalesce(cnt.n, 0) AS n
  FROM (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b) gs
  LEFT JOIN cnt ON cnt.day = gs.day),
s AS (SELECT CAST(count(*) AS BIGINT) AS nd, sum(n) AS tot FROM cal),
y AS (
  SELECT cal.day, CAST(s.nd * cal.n - s.tot AS HUGEINT) AS y
  FROM cal CROSS JOIN s),
c0 AS (SELECT sum(y * y) AS c0 FROM y),
ck AS (
  SELECT l.k, sum(a.y * b2.y) AS c
  FROM (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS k) l
  JOIN y a ON true
  JOIN y b2 ON b2.day = a.day + l.k
  GROUP BY l.k)
SELECT CAST(ck.k AS BIGINT) AS lag,
       (SELECT CAST(nd AS BIGINT) FROM s) AS n_days,
       CAST((1000 * ck.c - (((1000 * ck.c) % c0.c0 + c0.c0) % c0.c0))
            // c0.c0 AS BIGINT) AS r_milli
FROM ck CROSS JOIN c0
"""

ACF_QUERIES = {"daily_acf": q_daily_acf}
ACF_ORACLES = {"daily_acf": SQL_DAILY_ACF}
