"""Survival analysis (Kaplan-Meier) and Theil-Sen robust trend.

- ``km_retention`` — the Kaplan-Meier product-limit estimator over user
  lifetimes with RIGHT CENSORING (the statistic cohort_retention's
  fixed-window matrix cannot express): lifetime = last - first event in
  whole days; a user whose last event falls inside the final
  KM_CENSOR_DAYS of the stream is censored (still active), everyone
  else churned at their lifetime. Survival is reported in LOG fixed
  point — each step contributes q = floor(ln((n_t - d_t)/n_t) * 2^20)
  (SENTINEL for a step that kills everyone, since ln 0 diverges), and
  S(t) is the cumulative sum — so the product-limit chain is an
  order-independent integer sum instead of a float product.
  Plan: per-batch (user, min, max) combiner -> ONE user-keyed Min/Max
  exchange -> global-max broadcast -> (lifetime, censored) histogram
  (day-domain bounded) -> driver walk computing at-risk suffix sums and
  the step terms. Events never shuffle; driver state is day-bounded.
- ``theil_sen_daily`` — the Theil-Sen robust slope of the daily event
  count series: median over all day pairs of
  (n_j - n_i) / (t_j - t_i). The series is day-bounded so the O(D^2)
  pair set stays tiny next to the corpus; the only corpus-sized work is
  the day-count combiner. Median = the quantile_disc pick
  (sorted[(n-1) // 2] — pinned by test against DuckDB), so the result
  is an exact element of the slope multiset, not an interpolated float.

Oracles: static SQL (same day arithmetic, same ln quantization, same
discrete-median rule).

Reference analogue: none in /root/reference/app.py; brief scope
(temporal-analytics family next to cohort_retention / holt_forecast /
cusum_drift).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Max, Min, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QSV = "khl_pdf_ocr_ray.pipelines.queries_surv"

DAY_US = 86_400_000_000
KM_CENSOR_DAYS = 7
KM_FX = 1 << 20
KM_SENT = -(40 << 20)  # pinned value for an everyone-dies step (ln 0)
SURV_CELL_CAP = 5_000_000


def km_fl_partial(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch (user_id, f, l) epoch-us partials."""
    us = pc.cast(batch["ts"], pa.int64())
    g = (
        pa.table({"user_id": batch["user_id"], "us": us})
        .group_by(["user_id"])
        .aggregate([("us", "min"), ("us", "max")])
    )
    return select_rename(g, user_id="user_id", f="us_min", l="us_max")


def km_lifetime_hist(batch: pa.Table, gmax: int) -> pa.Table:
    """(user, f, l) rows -> per-batch (t, c_all, d) lifetime histogram
    (d = uncensored 'deaths'; censored = l within the final window)."""
    f = batch["f"].to_numpy(zero_copy_only=False).astype(np.int64)
    l = batch["l"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = (l - f) // DAY_US
    cens = l >= gmax - KM_CENSOR_DAYS * DAY_US
    tt = pa.table(
        {
            "t": pa.array(t, pa.int64()),
            "one": pa.array(np.ones(len(t), np.int64)),
            "d": pa.array((~cens).astype(np.int64), pa.int64()),
        }
    )
    g = tt.group_by(["t"]).aggregate([("one", "sum"), ("d", "sum")])
    return pa.table(
        {"t": g["t"], "c_all": g["one_sum"], "d": g["d_sum"]}
    )


def km_steps(hist: pd.DataFrame) -> pd.DataFrame:
    """THE shared finalize: (t, c_all, d) histogram -> KM step table
    (t_day, at_risk, deaths, log_surv_fx)."""
    h = hist.sort_values("t", ignore_index=True)
    c_all = h["c_all"].to_numpy().astype(np.int64)
    d = h["d"].to_numpy().astype(np.int64)
    ar = np.cumsum(c_all[::-1])[::-1]  # at-risk suffix sums
    rows = []
    acc = 0
    for t, a, dd in zip(h["t"], ar, d):
        if dd == 0:
            continue
        q = (
            int(math.floor(math.log(float(a - dd) / a) * KM_FX))
            if a > dd
            else KM_SENT
        )
        acc += q
        rows.append((int(t), int(a), int(dd), acc))
    return pd.DataFrame(
        rows, columns=["t_day", "at_risk", "deaths", "log_surv_fx"]
    ).astype("int64")


def q_km_retention(sf_dir: str) -> pd.DataFrame:
    """(t_day, at_risk, deaths, log_surv_fx) per death time."""
    from .queries import _t

    fl = (
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(
            remote_fn(_QSV, "km_fl_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(Min("f", alias_name="f"), Max("l", alias_name="l"))
        .materialize()
    )
    gmax = int(fl.max("l"))
    hist = (
        fl.map_batches(
            remote_fn(_QSV, "km_lifetime_hist", gmax=gmax),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("t")
        .aggregate(
            Sum("c_all", alias_name="c_all"), Sum("d", alias_name="d")
        )
        .to_pandas()
    )
    assert len(hist) <= SURV_CELL_CAP, "lifetime day domain exceeds cap"
    return km_steps(hist)


SQL_KM_RETENTION = f"""
WITH u AS (
  SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
  FROM events GROUP BY user_id),
g AS (SELECT max(l) AS gmax FROM u),
lt AS (
  SELECT (l - f) // {DAY_US} AS t,
         CASE WHEN l >= g.gmax - {KM_CENSOR_DAYS * DAY_US}
              THEN 0 ELSE 1 END AS dth
  FROM u, g),
h AS (SELECT t, count(*) AS c_all, sum(dth) AS d FROM lt GROUP BY t),
suf AS (SELECT t, d, sum(c_all) OVER (ORDER BY t DESC) AS ar FROM h),
steps AS (
  SELECT t, ar, d,
         CASE WHEN ar > d
              THEN CAST(floor(ln(CAST(ar - d AS DOUBLE) / ar) * {KM_FX})
                        AS BIGINT)
              ELSE {KM_SENT} END AS q
  FROM suf WHERE d > 0)
SELECT CAST(t AS BIGINT) AS t_day, CAST(ar AS BIGINT) AS at_risk,
       CAST(d AS BIGINT) AS deaths,
       CAST(sum(q) OVER (ORDER BY t) AS BIGINT) AS log_surv_fx
FROM steps
"""


# --- theil_sen_daily --------------------------------------------------------
def ts_day_partial(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch (day, n) count partials."""
    from .queries import _floordiv_us

    day = _floordiv_us(pc.cast(batch["ts"], pa.int64()), DAY_US)
    g = pa.table({"day": day}).group_by(["day"]).aggregate(
        [([], "count_all")]
    )
    return pa.table({"day": g["day"], "n": g["count_all"]})


def theil_sen_from_series(days: np.ndarray, n: np.ndarray):
    """THE shared finalize: (sorted day, count) series -> the discrete
    median of all pairwise slopes (sorted[(P-1)//2], the quantile_disc
    rule) as a double, plus the pair count."""
    order = np.argsort(days)
    t = days[order].astype(np.int64)
    y = n[order].astype(np.int64)
    i, j = np.triu_indices(len(t), k=1)
    slopes = (y[j] - y[i]).astype(np.float64) / (t[j] - t[i])
    s = np.sort(slopes)
    k = (len(s) - 1) // 2
    return len(t), len(s), float(s[k])


def q_theil_sen_daily(sf_dir: str) -> pd.DataFrame:
    """One row: (n_days, n_pairs, ts_slope)."""
    from .queries import _t

    daily = (
        _t(sf_dir, "events", ["ts"])
        .map_batches(
            remote_fn(_QSV, "ts_day_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    assert len(daily) <= 20000, "day domain exceeds the pairwise cap"
    n_days, n_pairs, slope = theil_sen_from_series(
        daily["day"].to_numpy().astype(np.int64),
        daily["n"].to_numpy().astype(np.int64),
    )
    return pd.DataFrame(
        [(n_days, n_pairs, slope)],
        columns=["n_days", "n_pairs", "ts_slope"],
    ).astype({"n_days": "int64", "n_pairs": "int64"})


SQL_THEIL_SEN_DAILY = f"""
WITH d AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, count(*) AS n
  FROM events GROUP BY day),
p AS (
  SELECT CAST(b.n - a.n AS DOUBLE) / (b.day - a.day) AS slope
  FROM d a JOIN d b ON b.day > a.day),
nd AS (SELECT count(*) AS n_days FROM d)
SELECT CAST(nd.n_days AS BIGINT) AS n_days,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pairs,
       (SELECT quantile_disc(slope, 0.5) FROM p) AS ts_slope
FROM nd
"""


SURV_QUERIES = {
    "km_retention": q_km_retention,
    "theil_sen_daily": q_theil_sen_daily,
}
SURV_ORACLES = {
    "km_retention": SQL_KM_RETENTION,
    "theil_sen_daily": SQL_THEIL_SEN_DAILY,
}
