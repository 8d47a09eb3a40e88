"""User-journey mining over sessionized event streams.

Two product-analytics staples:

``session_paths_topk`` — the top-20 session-opening paths (first <= 3
event types of every session, joined with '>'), the "common user
journeys" report. Sessions use THE corpus sessionization rule
(gap > SESSION_GAP_S, the sessionize/session_lift convention); order
within a session is (ts, event_id).

``rolling_7d_active_users`` — distinct users active in the trailing
7-day window ending at each day present in the stream (the rolling-MAU
family; a sliding COUNT(DISTINCT), which no single groupby expresses).

Plan / 100 TB notes: both reduce the stream BEFORE the wide exchange.
Paths: a per-user ordered fold (groupby.map_groups — the sessionize
exchange class) emits (path, n) partials, <= |sessions| rows per user;
ONE path-keyed Sum (path vocabulary <= |types|^3 + |types|^2 + |types|);
top-20 by (n DESC, path ASC) on the vocabulary-sized result. Rolling
actives: a per-batch distinct-(user, day) combiner slims the exchange,
a per-user fold emits each COVERED window day exactly once (<= 7 x
active-days rows, pre-deduped so no second distinct exchange), ONE
day-keyed Count; the day grid rides a separate |days|-row pass and the
phantom tail windows are filtered driver-side (calendar-bounded).

Oracles: static SQL — windowed session ids + ordered string_agg; a
DISTINCT pair self-join over the day grid.

Reference analogue: /root/reference/app.py has no analytics surface;
brief scope (streaming-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..remote import remote_fn

_QJ = "khl_pdf_ocr_ray.pipelines.queries_journeys"

PATH_LEN = 3
PATH_TOP_K = 20
PATH_SEP = ">"
DAY_US = 86_400_000_000
ROLL_DAYS = 7
# THE corpus sessionization gap. queries.SESSION_GAP_S owns the value;
# a literal here because the ORACLES dict is built at import time and
# importing .queries from module body would be circular (queries.py
# imports this module at its bottom). Pinned by
# tests/test_round4d_ops.py::test_journeys_gap_matches_corpus_rule.
SESSION_GAP_S_LOCAL = 1800


def session_paths_per_user(g: pd.DataFrame) -> pd.DataFrame:
    """One user's stream -> (path, n) partial counts of session-opening
    paths (first PATH_LEN events per session)."""
    g = g.sort_values(["ts", "event_id"])
    ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    brk = np.ones(len(ts), dtype=np.int64)
    if len(ts) > 1:
        brk[1:] = (
            np.diff(ts) > SESSION_GAP_S_LOCAL * 1_000_000
        ).astype(np.int64)
    sid = np.cumsum(brk)
    rank = np.arange(len(ts)) - np.repeat(
        np.flatnonzero(brk == 1),
        np.diff(np.r_[np.flatnonzero(brk == 1), len(ts)]),
    )
    types = g["event_type"].to_numpy()
    paths: dict = {}
    head = rank < PATH_LEN
    for s in np.unique(sid[head]):
        m = head & (sid == s)
        p = PATH_SEP.join(types[m])
        paths[p] = paths.get(p, 0) + 1
    items = sorted(paths.items())
    return pd.DataFrame(
        {
            "path": np.array([p for p, _ in items], dtype=object),
            "n": np.array([n for _, n in items], dtype=np.int64),
        }
    )


def q_session_paths_topk(sf_dir: str) -> pd.DataFrame:
    """(path, n) — top-20 by (n DESC, path ASC). See module docstring."""
    from ray.data.aggregate import Sum

    from .queries import _t

    counts = (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(
            remote_fn(_QJ, "session_paths_per_user"),
            batch_format="pandas",
        )
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # path-vocabulary rows — |types|-bounded
    )
    counts = counts.sort_values(
        ["n", "path"], ascending=[False, True], ignore_index=True
    )
    return counts.head(PATH_TOP_K).reset_index(drop=True)


def user_day_partial(batch: pa.Table) -> pa.Table:
    """events batch -> batch-distinct (user_id, day) rows."""
    user = batch["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ts_us = (
        batch["ts"]
        .cast(pa.timestamp("us"))  # unit-explicit: ns fixtures == us tables
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    day = ts_us // DAY_US
    span = int(day.max() - day.min()) + 1 if len(day) else 1
    uk = np.unique((user - (user.min() if len(user) else 0)) * span
                   + (day - (day.min() if len(day) else 0)))
    if len(day):
        u0, d0 = int(user.min()), int(day.min())
    else:
        u0 = d0 = 0
    return pa.table(
        {
            "user_id": pa.array(uk // span + u0, pa.int64()),
            "day": pa.array(uk % span + d0, pa.int64()),
        }
    )


def cover_windows_per_user(g: pd.DataFrame) -> pd.DataFrame:
    """One user's distinct (user, day) rows -> each trailing-window day
    the user covers, exactly once: union of [day, day+6] ranges."""
    days = np.unique(g["day"].to_numpy().astype(np.int64))
    cov = np.unique(
        (days[:, None] + np.arange(ROLL_DAYS, dtype=np.int64)).ravel()
    )
    return pd.DataFrame({"wday": cov})


def q_rolling_7d_active_users(sf_dir: str) -> pd.DataFrame:
    """(day, n_active_7d) for every day present in the stream."""
    from ray.data.aggregate import Count

    from .queries import _t

    ev = _t(sf_dir, "events", ["user_id", "ts"])
    counts = (
        ev.map_batches(
            remote_fn(_QJ, "user_day_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(
            remote_fn(_QJ, "cover_windows_per_user"),
            batch_format="pandas",
        )
        .groupby("wday")
        .aggregate(Count(alias_name="n_active_7d"))
        .to_pandas()  # |days| + 6 rows — calendar-bounded
    )
    grid = (
        ev.map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_monitor", "day_tag"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .aggregate(Count(alias_name="x"))
        .to_pandas()  # |days| rows
    )
    days = set(grid["day"].astype(np.int64).tolist())
    out = counts[counts["wday"].isin(days)].rename(columns={"wday": "day"})
    out = out.sort_values("day", ignore_index=True)
    out["day"] = out["day"].astype(np.int64)
    out["n_active_7d"] = out["n_active_7d"].astype(np.int64)
    return out[["day", "n_active_7d"]]


def _sql_paths() -> str:
    return f"""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > {SESSION_GAP_S_LOCAL}
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o),
r AS (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn
  FROM s),
p AS (
  SELECT user_id, sid,
         string_agg(event_type, '{PATH_SEP}' ORDER BY rn) AS path
  FROM r WHERE rn <= {PATH_LEN} GROUP BY user_id, sid)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY path
ORDER BY n DESC, path ASC LIMIT {PATH_TOP_K}
"""


SQL_ROLLING_7D = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events),
grid AS (SELECT DISTINCT day FROM ud),
w AS (
  SELECT DISTINCT u.user_id, g.day
  FROM ud u JOIN grid g
    ON g.day BETWEEN u.day AND u.day + {ROLL_DAYS - 1})
SELECT day, CAST(count(*) AS BIGINT) AS n_active_7d
FROM w GROUP BY day
"""

JOURNEYS_QUERIES = {
    "session_paths_topk": q_session_paths_topk,
    "rolling_7d_active_users": q_rolling_7d_active_users,
}
JOURNEYS_ORACLES = {
    "session_paths_topk": _sql_paths(),
    "rolling_7d_active_users": SQL_ROLLING_7D,
}
