"""Bot/velocity flagging over the events stream.

The abuse-detection primitive a log pipeline runs before analytics:
flag users whose event velocity is implausibly high — at least
BOT_MIN_EVENTS events AND a mean inter-event gap of at most
BOT_MAX_GAP_S seconds. The mean gap needs NO ordered fold: over a
user's sorted stream the consecutive-gap mean telescopes to
(max(ts) - min(ts)) / (n - 1), so three combiner-mergeable aggregates
(Min, Max, Count) are the whole exchange.

Output: one row per flagged user (user_id, n_events, mean_gap_s),
mean_gap_s = (span_us // (n-1)) // 1e6 in exact integers.

Thresholds sit inside the synthetic corpus' live range (n 49-86, mean
gap 8.3-14.3 h at sf0.01) so both the flagged and unflagged branches
are populated at every test scale; real deployments re-tune per
stream (the doc_tiers threshold convention).

Plan / 100 TB notes: ONE map-side (user, min, max, n) combiner pass
(the events payload never shuffles), ONE user-keyed Min/Max/Sum
exchange, a map-only integer finalize+filter. No ordered per-user
fold anywhere — the telescoping identity removes the sessionize-class
exchange this would otherwise need.

Oracle: static SQL with the same telescoped expression.

Reference analogue: /root/reference/app.py has no abuse surface;
brief scope (streaming-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QV = "khl_pdf_ocr_ray.pipelines.queries_velocity"

BOT_MIN_EVENTS = 60
BOT_MAX_GAP_S = 36_000


def velocity_partial(batch: pa.Table) -> pa.Table:
    """events batch -> (user_id, min_us, max_us, n) partials."""
    t = pa.table(
        {
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
        }
    )
    g = t.group_by("user_id").aggregate(
        [("ts_us", "min"), ("ts_us", "max"), ([], "count_all")]
    )
    g = select_rename(
        g, user_id="user_id", min_us="ts_us_min", max_us="ts_us_max",
        n="count_all",
    )
    return g.set_column(3, "n", g["n"].cast(pa.int64()))


def velocity_finalize(batch: pa.Table) -> pa.Table:
    """(user, min, max, n) -> flagged rows (user_id, n_events,
    mean_gap_s)."""
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = batch["min_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = batch["max_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    gap_s = ((hi - lo) // np.maximum(n - 1, 1)) // 1_000_000
    flag = (n >= BOT_MIN_EVENTS) & (gap_s <= BOT_MAX_GAP_S) & (n >= 2)
    keep = pa.array(flag)
    return pa.table(
        {
            "user_id": batch["user_id"].cast(pa.int64()),
            "n_events": pa.array(n, pa.int64()),
            "mean_gap_s": pa.array(gap_s, pa.int64()),
        }
    ).filter(keep)


def q_bot_velocity_flags(sf_dir: str) -> "object":
    """(user_id, n_events, mean_gap_s) for flagged users only."""
    from ray.data.aggregate import Max, Min, Sum

    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(
            remote_fn(_QV, "velocity_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(
            Min("min_us", alias_name="min_us"),
            Max("max_us", alias_name="max_us"),
            Sum("n", alias_name="n"),
        )
        .map_batches(
            remote_fn(_QV, "velocity_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_BOT_VELOCITY_FLAGS = f"""
WITH u AS (
  SELECT user_id,
         epoch_us(min(ts)) AS min_us,
         epoch_us(max(ts)) AS max_us,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id)
SELECT user_id, n AS n_events,
       CAST(((max_us - min_us) // GREATEST(n - 1, 1)) // 1000000
            AS BIGINT) AS mean_gap_s
FROM u
WHERE n >= {BOT_MIN_EVENTS} AND n >= 2
  AND ((max_us - min_us) // GREATEST(n - 1, 1)) // 1000000
      <= {BOT_MAX_GAP_S}
"""

VELOCITY_QUERIES = {"bot_velocity_flags": q_bot_velocity_flags}
VELOCITY_ORACLES = {"bot_velocity_flags": SQL_BOT_VELOCITY_FLAGS}
