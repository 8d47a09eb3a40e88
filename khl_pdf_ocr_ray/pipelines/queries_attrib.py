"""Multi-touch linear attribution with exact integer credit.

``linear_attribution``: every purchase distributes 1000 milli-credits
equally across that user's clicks in the preceding hour (strictly
before the purchase); division remainders go to the MOST RECENT clicks
(largest-remainder apportionment, the source_budget_apportion
convention) so the split is exact integers and order-deterministic
(recency ties pinned by event_id). Output: per click event, its total
credits over all purchases it assisted — the attribution table a
marketing/ranking pipeline joins back onto click features.

Plan / 100 TB notes: only (user_id, event_id, ts, event_type) leaves
the scan, pre-filtered to clicks+purchases map-side; ONE user-keyed
exchange feeds a per-user fold that sorts once and two-pointers the
1-hour window per purchase (O(events + credited pairs) per user).
Groups are user-activity-bounded; the hot-user upgrade is the
sessionize (user, day)-bucket shape with a 1-hour carry overlap.

Oracle: static SQL (window join + row_number recency rank + the same
1000//n + remainder arithmetic).

Reference analogue: /root/reference/app.py has no stream surface;
brief scope (SURVEY.md §2.9 streaming-shaped operators at depth).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..remote import remote_fn

_QA = "khl_pdf_ocr_ray.pipelines.queries_attrib"

ATTRIB_WINDOW_US = 3_600_000_000  # 1 hour
ATTRIB_CREDITS = 1000  # milli-credits per purchase


def attrib_slim(batch: pa.Table) -> pa.Table:
    """events batch -> (user_id, event_id, ts, is_purchase) clicks+purchases."""
    keep = pc.or_(
        pc.equal(batch["event_type"], "click"),
        pc.equal(batch["event_type"], "purchase"),
    )
    b = batch.filter(keep)
    return pa.table(
        {
            "user_id": b["user_id"].cast(pa.int64()),
            "event_id": b["event_id"].cast(pa.int64()),
            "ts": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "is_purchase": pc.cast(
                pc.equal(b["event_type"], "purchase"), pa.int64()
            ),
        }
    )


def user_attrib_fold(group: pd.DataFrame) -> pd.DataFrame:
    """One user's clicks+purchases -> (event_id, credits_milli) totals."""
    empty = pd.DataFrame({"event_id": [], "credits_milli": []}).astype(
        {"event_id": "int64", "credits_milli": "int64"}
    )
    g = group.sort_values(["ts", "event_id"], kind="mergesort")
    ts = g["ts"].to_numpy(np.int64)
    eid = g["event_id"].to_numpy(np.int64)
    isp = g["is_purchase"].to_numpy(np.int64)
    click_idx = np.flatnonzero(isp == 0)
    credits: dict = {}
    lo = 0  # two-pointer over the click stream
    cts = ts[click_idx]
    ceid = eid[click_idx]
    for p in np.flatnonzero(isp == 1):
        pt = ts[p]
        while lo < len(cts) and cts[lo] < pt - ATTRIB_WINDOW_US:
            lo += 1
        # clicks strictly before the purchase, within the window
        hi = np.searchsorted(cts, pt, side="left")
        # recency ties at the same ts resolve by event_id: the slice is
        # (ts, event_id)-sorted, so reversed order == recency rank
        win = list(range(lo, hi))
        n = len(win)
        if n == 0:
            continue
        base, rem = divmod(ATTRIB_CREDITS, n)
        for rank, i in enumerate(reversed(win), start=1):
            credits[int(ceid[i])] = (
                credits.get(int(ceid[i]), 0) + base + (1 if rank <= rem else 0)
            )
    if not credits:
        return empty
    ks = sorted(credits)
    return pd.DataFrame(
        {
            "event_id": np.int64(ks),
            "credits_milli": np.int64([credits[k] for k in ks]),
        }
    )


def q_linear_attribution(sf_dir: str) -> "object":
    """(event_id, credits_milli) — per click, summed over purchases."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
        .map_batches(
            remote_fn(_QA, "attrib_slim"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(remote_fn(_QA, "user_attrib_fold"), batch_format="pandas")
    )


SQL_LINEAR_ATTRIBUTION = f"""
WITH p AS (
  SELECT user_id, event_id AS pid, epoch_us(ts) AS pts
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, event_id AS cid, epoch_us(ts) AS cts
  FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.pid, c.cid,
         row_number() OVER (
           PARTITION BY p.pid ORDER BY c.cts DESC, c.cid DESC) AS rnk,
         count(*) OVER (PARTITION BY p.pid) AS n
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.cts < p.pts AND c.cts >= p.pts - {ATTRIB_WINDOW_US})
SELECT cid AS event_id,
       CAST(sum({ATTRIB_CREDITS} // n
                + CASE WHEN rnk <= {ATTRIB_CREDITS} % n THEN 1 ELSE 0 END)
            AS BIGINT) AS credits_milli
FROM j GROUP BY cid
"""

ATTRIB_QUERIES = {"linear_attribution": q_linear_attribution}
ATTRIB_ORACLES = {"linear_attribution": SQL_LINEAR_ATTRIBUTION}
