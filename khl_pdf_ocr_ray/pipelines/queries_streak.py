"""Gaps-and-islands: longest same-type event streak per user.

``user_longest_streak``: for each user, the length of the longest run
of CONSECUTIVE events (ordered by ts, tie-pinned by event_id) sharing
one event_type — the classic gaps-and-islands window shape (the SQL
twin is the ``rn - rn_per_type`` island identity), used for
engagement/abuse signals ("N purchases in a row", "M errors in a
row").

Plan / 100 TB notes: only (user_id, event_id, ts, event_type) leaves
the scan; ONE user-keyed exchange feeds a per-user ``map_groups`` that
sorts the user's events and computes run lengths vectorized (np.diff
on the type-change mask). Groups are user-activity-bounded; a
pathologically hot user takes the same (user, day)-bucket + boundary-
merge upgrade the sessionize operator already implements
(stages/temporal.py:140-170) — the run state crossing a bucket edge is
(first_type, first_run, last_type, last_run, best), an O(1) merge.

Oracle: static SQL (two window row_numbers, island GROUP BY).

Reference analogue: /root/reference/app.py has no stream surface;
brief scope (SURVEY.md §2.9 streaming-shaped operators at depth).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..remote import remote_fn

_QS = "khl_pdf_ocr_ray.pipelines.queries_streak"


def streak_slim(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_type": batch["event_type"],
        }
    )


def user_streak_fold(group: pd.DataFrame) -> pd.DataFrame:
    """One user's events -> (user_id, max_streak)."""
    g = group.sort_values(["ts", "event_id"], kind="mergesort")
    types = g["event_type"].to_numpy()
    n = len(types)
    if n == 0:
        return pd.DataFrame({"user_id": [], "max_streak": []}).astype(
            {"user_id": "int64", "max_streak": "int64"}
        )
    # island boundaries: positions where the type changes
    change = np.flatnonzero(types[1:] != types[:-1])
    bounds = np.concatenate(([0], change + 1, [n]))
    best = int(np.diff(bounds).max())
    return pd.DataFrame(
        {
            "user_id": np.int64([int(g["user_id"].iloc[0])]),
            "max_streak": np.int64([best]),
        }
    )


def q_user_longest_streak(sf_dir: str) -> "object":
    """(user_id, max_streak)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
        .map_batches(
            remote_fn(_QS, "streak_slim"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(remote_fn(_QS, "user_streak_fold"), batch_format="pandas")
    )


SQL_USER_LONGEST_STREAK = """
WITH e AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rnt
  FROM events),
runs AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS streak
  FROM e GROUP BY user_id, event_type, rn - rnt)
SELECT user_id, CAST(max(streak) AS BIGINT) AS max_streak
FROM runs GROUP BY user_id
"""

STREAK_QUERIES = {"user_longest_streak": q_user_longest_streak}
STREAK_ORACLES = {"user_longest_streak": SQL_USER_LONGEST_STREAK}
