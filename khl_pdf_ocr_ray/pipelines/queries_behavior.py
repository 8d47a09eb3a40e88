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

BEHAVIOR_QUERIES = {
    "cohort_retention": q_cohort_retention,
    "interarrival_dispersion": q_interarrival_dispersion,
}

BEHAVIOR_ORACLES = {
    "cohort_retention": SQL_COHORT_RETENTION,
    "interarrival_dispersion": SQL_INTERARRIVAL_DISPERSION,
}
