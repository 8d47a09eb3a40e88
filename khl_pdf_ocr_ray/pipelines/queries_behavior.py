"""User-behavior analytics: cohort retention matrix + inter-arrival
dispersion.

Two standard product/ops analytics every event-warehouse job scheduler
runs next to the corpus build:

- ``cohort_retention`` — the classic retention triangle: users are
  cohorted by their FIRST active week; each later active week counts
  them once at offset (week - cohort_week). Output one row per
  (cohort_week, week_offset) with the distinct-user count.
- ``interarrival_dispersion`` — per-user burstiness via the index of
  dispersion of inter-event gaps, D = Var/Mean, in exact integer
  milli-units:

      D_milli = (1000 * (n * sum(x^2) - sum(x)^2)) // (n * sum(x))

  over the microsecond gaps x between consecutive events ordered by
  (ts, event_id). Pure integer arithmetic (no sqrt), so both engines
  hash identically; gap^2 exceeds int64 (~1e22 for day-scale gaps) so
  the per-user fold runs in exact Python ints / HUGEINT.

Plans / 100 TB notes:
- cohort_retention: ONE corpus pass — a per-batch distinct-(user, week)
  combiner bounds the first exchange at |users| x |weeks| rows; the
  cohort week is just the per-user Min over those SAME rows, one slim
  user-keyed join attaches it (user-cardinality strings+ints), then a
  |cohorts| x |offsets| Count. The events payload never shuffles twice.
- interarrival_dispersion: per-user gap statistics need each user's
  ordered stream once — groupby(user).map_groups, the sessionize /
  markov_transitions exchange class (groups are per-user streams, never
  the corpus); the fold emits ONE row per user. Skewed power users are
  the known hazard; the sessionize salting note applies unchanged.

Reference analogue: /root/reference/app.py has no behavioral-analytics
surface; brief scope (streaming-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..remote import remote_fn

_QB = "khl_pdf_ocr_ray.pipelines.queries_behavior"

DAY_US = 86_400_000_000
WEEK_DAYS = 7


def user_week_partial(batch: pa.Table) -> pa.Table:
    """events batch -> distinct (user_id, week) partials."""
    user = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    week = (ts_us // DAY_US) // WEEK_DAYS
    pairs = np.unique(np.stack([user, week], axis=1), axis=0)
    return pa.table(
        {
            "user_id": pa.array(pairs[:, 0], pa.int64()),
            "week": pa.array(pairs[:, 1], pa.int64()),
        }
    )


def cohort_tag(batch: pa.Table) -> pa.Table:
    """(user, week, cohort_week) -> (cohort_week, week_offset)."""
    week = batch["week"].to_numpy(zero_copy_only=False).astype(np.int64)
    cw = batch["cohort_week"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "cohort_week": pa.array(cw, pa.int64()),
            "week_offset": pa.array(week - cw, pa.int64()),
        }
    )


def retention_finalize(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "cohort_week": batch["cohort_week"].cast(pa.int64()),
            "week_offset": batch["week_offset"].cast(pa.int64()),
            "n_users": batch["n_users"].cast(pa.int64()),
        }
    )


def q_cohort_retention(sf_dir: str) -> rd.Dataset:
    """(cohort_week, week_offset, n_users). See module docstring."""
    from ray.data.aggregate import Count, Min

    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    pairs = (
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(
            remote_fn(_QB, "user_week_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["user_id", "week"])
        .aggregate(Count(alias_name="c_"))
        .select_columns(["user_id", "week"])
        .materialize()  # consumed twice: cohort Min + the offset join
    )
    n_pairs = pairs.count()  # free from materialized metadata
    cohort = (
        pairs.groupby("user_id")
        .aggregate(Min("week", alias_name="cohort_week"))
        .rename_columns({"user_id": "cuser"})
    )
    joined = safe_join(
        pairs,
        cohort,
        join_type="inner",
        on=("user_id",),
        right_on=("cuser",),
        assume_non_empty=True,  # both sides derive from the same rows
        num_partitions=partitions_for_rows(n_pairs),
    )
    return (
        joined.map_batches(
            remote_fn(_QB, "cohort_tag"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Count(alias_name="n_users"))
        .map_batches(
            remote_fn(_QB, "retention_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def dispersion_per_user(g: pd.DataFrame) -> pd.DataFrame:
    """One user's stream -> (user_id, n_gaps, dispersion_milli), exact
    Python-int fold (gap^2 overflows int64 at day-scale gaps)."""
    g = g.sort_values(["ts", "event_id"])
    # unit-explicit: microseconds regardless of the pandas datetime64
    # resolution the batch arrived in (parquet gives us, ad-hoc ns)
    ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    if len(ts) < 2:
        return pd.DataFrame(
            {"user_id": [], "n_gaps": [], "dispersion_milli": []}
        ).astype({"user_id": "int64", "n_gaps": "int64", "dispersion_milli": "int64"})
    gaps = [int(x) for x in np.diff(ts)]
    n = len(gaps)
    s1 = sum(gaps)
    s2 = sum(x * x for x in gaps)
    disp = (1000 * (n * s2 - s1 * s1)) // (n * s1) if s1 > 0 else 0
    return pd.DataFrame(
        {
            "user_id": np.array([int(g["user_id"].iloc[0])], dtype=np.int64),
            "n_gaps": np.array([n], dtype=np.int64),
            "dispersion_milli": np.array([disp], dtype=np.int64),
        }
    )


def q_interarrival_dispersion(sf_dir: str) -> rd.Dataset:
    """(user_id, n_gaps, dispersion_milli). See module docstring."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts"])
        .groupby("user_id")
        .map_groups(
            remote_fn(_QB, "dispersion_per_user"), batch_format="pandas"
        )
    )


SQL_COHORT_RETENTION = f"""
WITH pairs AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // {DAY_US}) // {WEEK_DAYS} AS week
  FROM events),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM pairs GROUP BY user_id)
SELECT c.cohort_week,
       p.week - c.cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM pairs p JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""

SQL_INTERARRIVAL_DISPERSION = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
  FROM events),
g AS (
  SELECT user_id, CAST(t - prev AS HUGEINT) AS x
  FROM o WHERE prev IS NOT NULL)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(CASE WHEN sum(x) = 0 THEN 0
            ELSE (1000 * (count(*) * sum(x * x) - sum(x) * sum(x)))
                 // (count(*) * sum(x))
            END AS BIGINT) AS dispersion_milli
FROM g GROUP BY user_id
"""

# --- session-level co-occurrence lift --------------------------------------
# market-basket association over sessionized streams: for event types a, b
#   lift_milli = (1000 * S * n_ab) // (n_a * n_b)
# with S = total sessions, n_x = sessions containing x, n_ab = sessions
# containing both. Sessions follow the sessionize contract (gap > 30 min
# splits, ordered by ts; ts ties can never split a session so membership
# is order-independent). The per-user fold emits <= |types|^2 + |types|
# + 1 rows per user (pairs, singles, session total ride ONE exchange via
# sentinel keys) — never the stream. Hot-user hazard = the
# markov_transitions class; the sessionize salting note applies.

_LIFT_TOTAL = ""  # sentinel type_b: row carries a per-type session count
# (type_a = "" too: the row is the user's total session count)


def session_pairs_per_user(g: pd.DataFrame) -> pd.DataFrame:
    """One user's stream -> (type_a, type_b, n) session-distinct pair /
    single / total partial counts."""
    from .queries import SESSION_GAP_S

    g = g.sort_values("ts")
    ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    brk = np.ones(len(ts), dtype=np.int64)
    if len(ts) > 1:
        brk[1:] = (np.diff(ts) > SESSION_GAP_S * 1_000_000).astype(np.int64)
    sid = np.cumsum(brk)
    types = g["event_type"].to_numpy()
    out_a, out_b, out_n = [], [], []
    pair_n: dict = {}
    single_n: dict = {}
    for s in np.unique(sid):
        tset = sorted(set(types[sid == s]))
        for i, a in enumerate(tset):
            single_n[a] = single_n.get(a, 0) + 1
            for b in tset[i + 1 :]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    for (a, b), n in sorted(pair_n.items()):
        out_a.append(a); out_b.append(b); out_n.append(n)
    for a, n in sorted(single_n.items()):
        out_a.append(a); out_b.append(_LIFT_TOTAL); out_n.append(n)
    out_a.append(_LIFT_TOTAL); out_b.append(_LIFT_TOTAL)
    out_n.append(int(sid.max()) if len(sid) else 0)
    return pd.DataFrame(
        {
            "type_a": np.array(out_a, dtype=object),
            "type_b": np.array(out_b, dtype=object),
            "n": np.array(out_n, dtype=np.int64),
        }
    )


def lift_finalize(cells: pd.DataFrame) -> pd.DataFrame:
    """Aggregated (type_a, type_b, n) incl. sentinels -> the lift table,
    exact Python ints (|types|^2 rows)."""
    total = int(
        cells.loc[
            (cells["type_a"] == _LIFT_TOTAL) & (cells["type_b"] == _LIFT_TOTAL),
            "n",
        ].iloc[0]
    )
    singles = {
        r.type_a: int(r.n)
        for r in cells[
            (cells["type_b"] == _LIFT_TOTAL) & (cells["type_a"] != _LIFT_TOTAL)
        ].itertuples()
    }
    body = cells[(cells["type_a"] != _LIFT_TOTAL) & (cells["type_b"] != _LIFT_TOTAL)]
    rows = []
    for r in body.itertuples():
        na, nb = singles[r.type_a], singles[r.type_b]
        lift = (1000 * total * int(r.n)) // (na * nb) if na and nb else 0
        rows.append((r.type_a, r.type_b, int(r.n), na, nb, lift))
    rows.sort()
    return pd.DataFrame(
        rows, columns=["type_a", "type_b", "n_ab", "n_a", "n_b", "lift_milli"]
    ).astype(
        {
            "n_ab": "int64",
            "n_a": "int64",
            "n_b": "int64",
            "lift_milli": "int64",
        }
    )


def q_session_lift(sf_dir: str) -> pd.DataFrame:
    """(type_a, type_b, n_ab, n_a, n_b, lift_milli). See section note."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "events", ["user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(
            remote_fn(_QB, "session_pairs_per_user"), batch_format="pandas"
        )
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |types|^2 rows — event-type-vocabulary bounded
    )
    return lift_finalize(cells)


SQL_SESSION_LIFT = """
WITH gaps AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps),
st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
tot AS (SELECT CAST(count(*) AS BIGINT) AS s
        FROM (SELECT DISTINCT user_id, sid FROM st)),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_x
  FROM st GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.sid = b.sid
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.n_ab,
       sa.n_x AS n_a, sb.n_x AS n_b,
       CAST((1000 * tot.s * p.n_ab) // (sa.n_x * sb.n_x) AS BIGINT)
         AS lift_milli
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN tot
"""


# --- week-over-week growth --------------------------------------------------


def week_tag(batch: pa.Table) -> pa.Table:
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table(
        {"week": pa.array((ts_us // DAY_US) // WEEK_DAYS, pa.int64())}
    )


def weekly_growth_fold(weeks: np.ndarray, counts: np.ndarray):
    """(prev_n, growth_milli) per ordered week; first week (and a
    zero-count predecessor) reports 0. |weeks|-sized, calendar-bounded
    — the CUSUM driver-fold class. Shared verbatim by tests."""
    order = np.argsort(weeks)
    c = counts[order].astype(np.int64)
    prev = np.zeros(len(c), dtype=np.int64)
    prev[1:] = c[:-1]
    growth = np.where(prev > 0, (1000 * c) // np.maximum(prev, 1) - 1000, 0)
    out_p = np.empty_like(prev)
    out_g = np.empty_like(growth)
    out_p[order] = prev
    out_g[order] = growth
    return out_p, out_g


def q_weekly_growth(sf_dir: str) -> pd.DataFrame:
    """(week, n_events, prev_n, growth_milli). Combiner-backed weekly
    Count, then a |weeks|-row driver fold."""
    from ray.data.aggregate import Count

    from .queries import _t

    weekly = (
        _t(sf_dir, "events", ["ts"])
        .map_batches(
            remote_fn(_QB, "week_tag"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("week")
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()  # |weeks| rows — calendar-bounded
    )
    weeks = weekly["week"].to_numpy().astype(np.int64)
    counts = weekly["n_events"].to_numpy().astype(np.int64)
    prev, growth = weekly_growth_fold(weeks, counts)
    return pd.DataFrame(
        {
            "week": weeks,
            "n_events": counts,
            "prev_n": prev,
            "growth_milli": growth,
        }
    ).sort_values("week", ignore_index=True)


SQL_WEEKLY_GROWTH = f"""
WITH d AS (
  SELECT (epoch_us(ts) // {DAY_US}) // {WEEK_DAYS} AS week,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
l AS (
  SELECT week, n_events,
         CAST(COALESCE(LAG(n_events) OVER (ORDER BY week), 0) AS BIGINT)
           AS prev_n
  FROM d)
SELECT week, n_events, prev_n,
       CAST(CASE WHEN prev_n > 0
                 THEN (1000 * n_events) // prev_n - 1000
                 ELSE 0 END AS BIGINT) AS growth_milli
FROM l
"""

BEHAVIOR_QUERIES = {
    "cohort_retention": q_cohort_retention,
    "interarrival_dispersion": q_interarrival_dispersion,
    "session_lift": q_session_lift,
    "weekly_growth": q_weekly_growth,
}

BEHAVIOR_ORACLES = {
    "cohort_retention": SQL_COHORT_RETENTION,
    "interarrival_dispersion": SQL_INTERARRIVAL_DISPERSION,
    "session_lift": SQL_SESSION_LIFT,
    "weekly_growth": SQL_WEEKLY_GROWTH,
}
