"""Out-of-order / late-data streaming operators.

A streaming engine ingesting crawl events sees event time diverge from
arrival time: a fetcher retries, a frontier shard stalls, and records
arrive minutes late. The engine tracks a WATERMARK (max event time seen
so far, minus an allowed-lateness slack) and classifies each arriving
record as on-time, late-but-accepted, or dropped (its window already
closed). ``events_watermark`` reproduces that accounting as a batch
operator with exactly-reproducible semantics:

- arrival order = ``event_id`` order (the driver's events table is
  arrival-ordered; verified monotonic);
- the events table is arrival-ordered on disk, so late arrivals are
  PLANTED deterministically (same synthesize-on-read convention as
  ``docs_with_variants``): every 37th event's event time is shifted
  back 61..7260 s by a multiplicative hash of its id — some land
  within the 1800 s allowed lateness (late-accepted), some beyond it
  (dropped);
- watermark before row i = max planted event time over all rows with
  smaller event_id (the strictly-preceding prefix max), minus nothing:
  lateness is judged against the raw prefix max, the 1800 s slack is
  the drop threshold.

The prefix max over a global order is the sequential part; it is
distributed the same way ``pack_sequences`` distributes its prefix sum
(queries_window.py): contiguous ``event_id // STREAM_SHARD`` shards
reduce to ONE (shard, max) row each, the driver prefix-maxes that tiny
summary (one row per shard — max is associative, so at 10^12 events the
summary itself tree-reduces through one more level of the same scan
instead of landing on the driver), and a second sharded pass seeds each
shard's in-shard running max with its exclusive prefix. Three
exchanges: a |shards|-row aggregate, one slim shard-keyed shuffle
(event_id, ets_us, event_type — the payload never moves), and a
|types|x|hours|-row final sum.

Output: per (event_type, hour-of-event-time) totals with late/dropped
accounting — the restatement table a streaming engine would publish
when windows finalize.

Reference analogue: /root/reference/app.py processes one document per
request and has no stream ordering surface; this is brief scope
(streaming-shaped operators, SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Max, Sum

from ..remote import remote_fn

_QS = "khl_pdf_ocr_ray.pipelines.queries_stream"

LATE_EVERY = 37            # every 37th event_id arrives late (planted)
LATE_MULT = 40503          # multiplicative hash for the planted delay;
                           # small enough that event_id * LATE_MULT stays
                           # in int64 far past 10^12 ids (DuckDB would
                           # error on overflow, Arrow would wrap)
LATE_SPAN_S = 7200         # planted delays span 61..7260 s
LATE_MIN_S = 61
ALLOWED_LATENESS_S = 1800  # late events beyond this slack are dropped
STREAM_SHARD = 2048        # contiguous event_ids per prefix-max shard;
                           # scales with corpus so the shard summary
                           # stays task-sized (see module docstring)
_NO_PREV = np.iinfo(np.int64).min  # "no preceding row" sentinel


def _planted_ets_us(event_id: pa.ChunkedArray, ts: pa.ChunkedArray):
    """Deterministic late-arrival plant: event time in microseconds,
    shifted back for every LATE_EVERY-th id. Pure int64 arithmetic so
    the DuckDB oracle reproduces it bit-exactly."""
    us = pc.cast(ts, pa.int64())
    delay_s = pc.add(
        pc.subtract(
            pc.multiply(event_id, LATE_MULT),
            pc.multiply(
                pc.divide(pc.multiply(event_id, LATE_MULT), LATE_SPAN_S),
                LATE_SPAN_S,
            ),
        ),
        LATE_MIN_S,
    )
    is_late = pc.equal(
        pc.subtract(
            event_id,
            pc.multiply(pc.divide(event_id, LATE_EVERY), LATE_EVERY),
        ),
        0,
    )
    return pc.if_else(
        is_late, pc.subtract(us, pc.multiply(delay_s, 1_000_000)), us
    )


def wm_shard_max_partial(batch: pa.Table) -> pa.Table:
    """Pass 1 combiner: (shard, max planted ets) — one row per shard
    present in the batch, so the aggregate exchange moves |shards| rows,
    not |events|."""
    ets = _planted_ets_us(batch["event_id"], batch["ts"])
    shard = pc.divide(batch["event_id"], STREAM_SHARD)
    t = pa.table({"shard": shard, "ets_us": ets})
    g = t.group_by("shard").aggregate([("ets_us", "max")])
    from ..functions.arrowkit import select_rename

    return select_rename(g, shard="shard", max_ets="ets_us_max")


def wm_project(batch: pa.Table) -> pa.Table:
    """Pass 2 projection: slim shard-keyed rows (the props/value payload
    never enters the shuffle)."""
    return pa.table(
        {
            "shard": pc.divide(batch["event_id"], STREAM_SHARD),
            "event_id": batch["event_id"],
            "ets_us": _planted_ets_us(batch["event_id"], batch["ts"]),
            "event_type": batch["event_type"],
        }
    )


def wm_shard_classify(
    g: pd.DataFrame, prefix_max: dict[int, int]
) -> pd.DataFrame:
    """One contiguous shard: in-shard exclusive running max seeded with
    the shard's exclusive prefix, then vectorized late/dropped flags and
    a per-(event_type, hour) partial sum."""
    if g.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="string"),
                "hour": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "n_late": pd.Series(dtype="int64"),
                "n_dropped": pd.Series(dtype="int64"),
            }
        )
    g = g.sort_values("event_id", kind="mergesort")
    ets = g["ets_us"].to_numpy()
    seed = prefix_max.get(int(g["shard"].iloc[0]), _NO_PREV)
    prev = np.empty(len(g), dtype="int64")
    prev[0] = seed
    if len(g) > 1:
        np.maximum.accumulate(ets[:-1], out=prev[1:])
        np.maximum(prev[1:], seed, out=prev[1:])
    has_prev = prev != _NO_PREV
    late = has_prev & (ets < prev)
    dropped = has_prev & (ets < prev - ALLOWED_LATENESS_S * 1_000_000)
    hour = np.floor_divide(ets, 3_600_000_000)
    out = (
        pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy(),
                "hour": hour,
                "n_events": np.ones(len(g), dtype="int64"),
                "n_late": late.astype("int64"),
                "n_dropped": dropped.astype("int64"),
            }
        )
        .groupby(["event_type", "hour"], as_index=False, sort=False)
        .sum()
    )
    return out.astype(
        {
            "event_type": "string",
            "hour": "int64",
            "n_events": "int64",
            "n_late": "int64",
            "n_dropped": "int64",
        }
    )


def q_events_watermark(sf_dir: str) -> rd.Dataset:
    """Watermark late-data accounting over the arrival-ordered events
    stream: per (event_type, event-time hour) totals with late and
    dropped (beyond 1800 s allowed lateness) counts. Two-level
    distributed prefix max — see module docstring for the plan and its
    10^12-row story."""
    from .queries import _t

    events = _t(sf_dir, "events", ["event_id", "ts", "event_type"])

    shard_max = (
        events.map_batches(
            remote_fn(_QS, "wm_shard_max_partial"), batch_format="pyarrow"
        )
        .groupby("shard")
        .aggregate(Max("max_ets", alias_name="max_ets"))
        .to_pandas()  # one row per STREAM_SHARD contiguous ids — bounded
        .sort_values("shard")
    )
    # exclusive prefix max over the shard summary (driver-side, |shards|
    # rows; associative -> tree-reduces at real scale)
    prefix_max: dict[int, int] = {}
    run = _NO_PREV
    for shard, mx in zip(
        shard_max["shard"].astype(int), shard_max["max_ets"].astype(int)
    ):
        prefix_max[shard] = run
        run = max(run, mx)

    return (
        events.map_batches(remote_fn(_QS, "wm_project"), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            remote_fn(_QS, "wm_shard_classify", prefix_max=prefix_max),
            batch_format="pandas",
        )
        .groupby(["event_type", "hour"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_late", alias_name="n_late"),
            Sum("n_dropped", alias_name="n_dropped"),
        )
    )


SQL_EVENTS_WATERMARK = f"""
WITH planted AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % {LATE_EVERY} = 0
              THEN epoch_us(ts)
                   - (((event_id * {LATE_MULT}) % {LATE_SPAN_S}) + {LATE_MIN_S})
                     * 1000000
              ELSE epoch_us(ts) END AS ets_us
  FROM events),
wm AS (
  SELECT event_type, ets_us,
         max(ets_us) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_prev
  FROM planted)
SELECT event_type,
       ets_us // 3600000000 AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN max_prev IS NOT NULL AND ets_us < max_prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(sum(CASE WHEN max_prev IS NOT NULL
                      AND ets_us < max_prev - {ALLOWED_LATENESS_S} * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM wm
GROUP BY event_type, hour
"""


# ======================================================================
# markov_transitions — first-order event-type transition counts
# ======================================================================
def transitions_per_user(g) -> "pd.DataFrame":
    """One user's (ts, event_id)-ordered stream -> (prev, cur, n) pair
    counts (a per-user partial for the pair groupby)."""
    import pandas as pd

    g = g.sort_values(["ts", "event_id"])
    et = g["event_type"].to_numpy()
    if len(et) < 2:
        return pd.DataFrame(
            {
                "prev_type": pd.Series(dtype="string"),
                "cur_type": pd.Series(dtype="string"),
                "n": pd.Series(dtype="int64"),
            }
        )
    df = pd.DataFrame({"prev_type": et[:-1], "cur_type": et[1:]})
    out = df.groupby(["prev_type", "cur_type"], as_index=False).size()
    return out.rename(columns={"size": "n"}).astype({"n": "int64"})


def q_markov_transitions(sf_dir: str) -> rd.Dataset:
    """First-order Markov transition counts over per-user event streams
    (session-model estimation / next-action prediction feed): per-user
    ordered pair counting (groups = one user's stream), then ONE
    |types|^2-keyed Sum. The pair exchange carries <= |types|^2 rows per
    user — never the stream itself."""
    from ray.data.aggregate import Sum as _Sum

    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(
            remote_fn(_QS, "transitions_per_user"), batch_format="pandas"
        )
        .groupby(["prev_type", "cur_type"])
        .aggregate(_Sum("n", alias_name="n"))
    )


SQL_MARKOV_TRANSITIONS = """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev AS prev_type, event_type AS cur_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
"""


# ======================================================================
# daily_new_users — first-seen cohorting + cumulative distinct growth
# ======================================================================
US_PER_DAY = 86_400_000_000


def first_seen_partial(batch: "pa.Table") -> "pa.Table":
    """Per-batch (user, min event-day) — partial for the per-user Min."""
    import numpy as np
    import pyarrow as pa_

    ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    day = ts.astype(np.int64) // US_PER_DAY
    t = pa_.table(
        {
            "user_id": batch["user_id"],
            "day": pa_.array(day, pa_.int64()),
        }
    )
    g = t.group_by("user_id").aggregate([("day", "min")])
    return pa_.table({"user_id": g["user_id"], "day": g["day_min"]})


def newuser_day_partial(batch: "pa.Table") -> "pa.Table":
    import pyarrow as pa_

    g = batch.group_by("day").aggregate([([], "count_all")])
    return pa_.table({"day": g["day"], "new_users": g["count_all"]})


def q_daily_new_users(sf_dir: str) -> "pa.Table":
    """User-growth accounting: per-day NEW (first-seen) users and the
    cumulative distinct-user curve — the expanding-window COUNT(DISTINCT)
    expressed shuffle-free: a per-user Min (first-seen day), a per-day
    count, and a |days|-row driver cumsum. The corpus-sized exchanges are
    both combiner-backed and user-/day-keyed."""
    import pyarrow as pa_

    from ray.data.aggregate import Min as _Min, Sum as _Sum

    from .queries import _t

    days = (
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(
            remote_fn(_QS, "first_seen_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(_Min("day", alias_name="day"))
        .map_batches(
            remote_fn(_QS, "newuser_day_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("day")
        .aggregate(_Sum("new_users", alias_name="new_users"))
        .to_pandas()  # one row per active day — bounded
        .sort_values("day")
    )
    cum = days["new_users"].astype("int64").cumsum()
    return pa_.table(
        {
            "day": pa_.array(days["day"].astype("int64"), pa_.int64()),
            "new_users": pa_.array(
                days["new_users"].astype("int64"), pa_.int64()
            ),
            "cum_users": pa_.array(cum, pa_.int64()),
        }
    )


SQL_DAILY_NEW_USERS = f"""
WITH f AS (
  SELECT user_id,
         CAST(min(epoch_us(ts) // {US_PER_DAY}) AS BIGINT) AS day
  FROM events GROUP BY 1),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY 1)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM d
"""


STREAM_QUERIES = {
    "events_watermark": q_events_watermark,
    "markov_transitions": q_markov_transitions,
    "daily_new_users": q_daily_new_users,
}

STREAM_ORACLES = {
    "events_watermark": SQL_EVENTS_WATERMARK,
    "markov_transitions": SQL_MARKOV_TRANSITIONS,
    "daily_new_users": SQL_DAILY_NEW_USERS,
}
