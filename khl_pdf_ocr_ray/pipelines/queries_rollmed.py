"""Rolling order-statistic window: 5-event running median per user.

``rolling_median5``: for every event with at least 4 predecessors in
its user's (ts, event_id)-ordered stream, the MEDIAN of the last 5
fixed-point values — the robust-smoothing window (median filters shrug
off the single-spike outliers that wreck a moving average; this is the
order-statistic sibling of ``events_sliding`` / ``events_ewma``). The
window length is ODD by design: the median is then an order statistic
(the middle element), exact in integers — no float averaging of two
middles, so Ray and the SQL window agree bit-for-bit.

Plan / 100 TB notes: only (user_id, event_id, ts, v) leaves the scan
(value fixed-pointed map-side); ONE user-keyed exchange feeds a
per-user fold that sorts once and takes all window medians in one
vectorized ``sliding_window_view`` + ``np.median`` call. Groups are
user-activity-bounded; the hot-user upgrade is the sessionize
(user, day)-bucket shape with a (window-1)-row carry between buckets
(the events_sliding boundary convention).

Oracle: static SQL (median() OVER a 5-row frame, emitted only for
full windows).

Reference analogue: /root/reference/app.py has no stream surface;
brief scope (SURVEY.md §2.9 windowed operators at depth).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..remote import remote_fn

_QRM = "khl_pdf_ocr_ray.pipelines.queries_rollmed"

WIN = 5  # MUST stay odd — the exactness argument above relies on it


def rollmed_slim(batch: pa.Table) -> pa.Table:
    """events batch -> (user_id, event_id, ts, v) fixed-point rows."""
    return pa.table(
        {
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "v": pc.cast(
                pc.floor(pc.add(pc.multiply(batch["value"], 1000.0), 0.5)),
                pa.int64(),
            ),
        }
    )


def user_rollmed_fold(group: pd.DataFrame) -> pd.DataFrame:
    """One user's events -> (user_id, event_id, med_x1000) full windows."""
    empty = pd.DataFrame(
        {"user_id": [], "event_id": [], "med_x1000": []}
    ).astype({"user_id": "int64", "event_id": "int64", "med_x1000": "int64"})
    g = group.sort_values(["ts", "event_id"], kind="mergesort")
    v = g["v"].to_numpy().astype(np.int64)
    if len(v) < WIN:
        return empty
    wins = np.lib.stride_tricks.sliding_window_view(v, WIN)
    med = np.median(wins, axis=1).astype(np.int64)  # odd WIN: exact middle
    return pd.DataFrame(
        {
            "user_id": g["user_id"].to_numpy()[WIN - 1 :].astype(np.int64),
            "event_id": g["event_id"].to_numpy()[WIN - 1 :].astype(np.int64),
            "med_x1000": med,
        }
    )


def q_rolling_median5(sf_dir: str) -> "object":
    """(user_id, event_id, med_x1000)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(
            remote_fn(_QRM, "rollmed_slim"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(remote_fn(_QRM, "user_rollmed_fold"), batch_format="pandas")
    )


SQL_ROLLING_MEDIAN5 = f"""
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT user_id, event_id, rn,
         median(v) OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN {WIN - 1} PRECEDING AND CURRENT ROW)
           AS med
  FROM e)
SELECT user_id, event_id, CAST(med AS BIGINT) AS med_x1000
FROM m WHERE rn >= {WIN}
"""

ROLLMED_QUERIES = {"rolling_median5": q_rolling_median5}
ROLLMED_ORACLES = {"rolling_median5": SQL_ROLLING_MEDIAN5}
