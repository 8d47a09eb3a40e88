"""Ingestion-side duplicate suppression with bounded (TTL'd) state.

A crawl ingestion front-end sees the same logical record arrive more
than once — fetcher retries, frontier re-queues, at-least-once queue
semantics. Exactly-once ingestion dedupes on a record key held in a
per-key state store, and that store is BOUNDED: keys are evicted after
a TTL, so a duplicate arriving after eviction is (correctly, by
design) re-admitted as new. ``events_ingest_dedup`` reproduces that
accounting batch-side with exactly-reproducible semantics:

- a record key is (user_id, event_type, ts) — identical event time,
  same actor, same action = the same logical record;
- arrival order is a synthetic sequence: originals arrive at
  ``event_id * 2``; PLANTED duplicate arrivals (synthesize-on-read,
  the ``docs_with_variants`` convention — every 13th event re-arrives
  once) land at an odd seq ``event_id*2 + 2*delta + 1`` so planted
  arrivals never collide with originals, with delta spanning 1..8192
  — some inside the 4096-seq TTL (suppressed), some beyond it
  (re-admitted);
- state REFRESHES on every sighting (the common dedup-cache behavior):
  an arrival is suppressed iff the gap to the key's PREVIOUS arrival
  (kept or suppressed) is <= TTL — a per-key LAG chain, not a
  distance-to-first rule.

Plan: ONE pruned read whose map stage emits originals + planted
duplicates in the same batch (no union, no re-read), a single
hash(user_id)-sharded exchange of slim (seq, user_id, event_type,
ts_us) rows — every key's arrivals share a user_id, so a shard holds
complete keys — then a fully vectorized per-shard LAG (sort + shift,
one C call per task, never one Python call per key), reduced to
|types| rows per shard before the final tiny sum. The payload never
enters the shuffle; driver-held state is zero.

Reference analogue: /root/reference/app.py is stateless per request
and re-fetches on every call; dedup-at-ingest is brief scope (LLM
training-data pipeline operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..remote import remote_fn

_QI = "khl_pdf_ocr_ray.pipelines.queries_ingest"

DUP_EVERY = 13        # every 13th event re-arrives once (planted)
DUP_MULT = 48271      # Lehmer multiplier for the planted arrival delay;
                      # event_id * DUP_MULT stays in int64 far past
                      # 10^13 ids
DUP_SPAN = 8192       # planted seq delays span 3..16385 (2*delta+1)
INGEST_TTL = 4096     # dedup-state TTL in seq units; planted delays
                      # straddle it so both outcomes are exercised
INGEST_SHARDS = 64    # coarse user-hash shards for the LAG pass
_MULT_U = 2654435761  # Knuth multiplicative constant (shared with
                      # stages/temporal.py's user sharding)


def _mod(x, d: int):
    """Non-negative x % d for positive x via truncating divide (Arrow
    has no modulo kernel)."""
    return pc.subtract(x, pc.multiply(pc.divide(x, d), d))


def ingest_arrivals(batch: pa.Table) -> pa.Table:
    """Originals + planted duplicate arrivals, one map stage: originals
    at seq = 2*event_id, every DUP_EVERY-th event re-arrives at the odd
    seq 2*event_id + 2*delta + 1, delta = (event_id*DUP_MULT) % DUP_SPAN
    + 1. Slim output — the props/value payload never leaves the read."""
    ts_us = pc.cast(batch["ts"], pa.int64())
    shard = _mod(pc.multiply(batch["user_id"], _MULT_U), INGEST_SHARDS)
    orig = pa.table(
        {
            "shard": shard,
            "seq": pc.multiply(batch["event_id"], 2),
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "ts_us": ts_us,
        }
    )
    is_dup = pc.equal(_mod(batch["event_id"], DUP_EVERY), 0)
    d = batch.filter(is_dup)
    if d.num_rows == 0:
        return orig
    delta = pc.add(_mod(pc.multiply(d["event_id"], DUP_MULT), DUP_SPAN), 1)
    dups = pa.table(
        {
            "shard": _mod(pc.multiply(d["user_id"], _MULT_U), INGEST_SHARDS),
            "seq": pc.add(pc.multiply(d["event_id"], 2), pc.add(pc.multiply(delta, 2), 1)),
            "user_id": d["user_id"],
            "event_type": d["event_type"],
            "ts_us": pc.cast(d["ts"], pa.int64()),
        }
    )
    return pa.concat_tables([orig, dups])


def ingest_dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One user shard (complete keys): vectorized per-key LAG — sort by
    (key, seq), gap to the previous same-key arrival, suppressed iff
    gap <= TTL. Reduces to |event_type| partial rows per shard."""
    if g.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="string"),
                "n_arrivals": pd.Series(dtype="int64"),
                "n_suppressed": pd.Series(dtype="int64"),
                "n_admitted": pd.Series(dtype="int64"),
            }
        )
    g = g.sort_values(
        ["user_id", "event_type", "ts_us", "seq"], kind="mergesort"
    )
    same_key = (
        g["user_id"].eq(g["user_id"].shift())
        & g["event_type"].eq(g["event_type"].shift())
        & g["ts_us"].eq(g["ts_us"].shift())
    )
    gap = g["seq"] - g["seq"].shift()
    suppressed = (same_key & (gap <= INGEST_TTL)).to_numpy()
    out = (
        pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy(),
                "n_arrivals": np.ones(len(g), dtype="int64"),
                "n_suppressed": suppressed.astype("int64"),
                "n_admitted": (~suppressed).astype("int64"),
            }
        )
        .groupby("event_type", as_index=False, sort=False)
        .sum()
    )
    return out.astype(
        {
            "event_type": "string",
            "n_arrivals": "int64",
            "n_suppressed": "int64",
            "n_admitted": "int64",
        }
    )


def q_events_ingest_dedup(sf_dir: str) -> rd.Dataset:
    """Exactly-once ingestion accounting: per event_type arrival totals
    with suppressed (duplicate within the TTL'd state window) and
    admitted (first sighting, or re-admitted after state eviction)
    counts. See module docstring for the plan."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
        .map_batches(remote_fn(_QI, "ingest_arrivals"), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(remote_fn(_QI, "ingest_dedup_shard"), batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_arrivals", alias_name="n_arrivals"),
            Sum("n_suppressed", alias_name="n_suppressed"),
            Sum("n_admitted", alias_name="n_admitted"),
        )
    )


SQL_EVENTS_INGEST_DEDUP = f"""
WITH arrivals AS (
  SELECT event_id * 2 AS seq, user_id, event_type, ts FROM events
  UNION ALL
  SELECT event_id * 2 + 2 * (((event_id * {DUP_MULT}) % {DUP_SPAN}) + 1) + 1
           AS seq,
         user_id, event_type, ts
  FROM events WHERE event_id % {DUP_EVERY} = 0),
lagged AS (
  SELECT event_type,
         seq - lag(seq) OVER (PARTITION BY user_id, event_type, ts
                              ORDER BY seq) AS gap
  FROM arrivals)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_arrivals,
       CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= {INGEST_TTL}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
       CAST(sum(CASE WHEN gap IS NULL OR gap > {INGEST_TTL}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
FROM lagged
GROUP BY event_type
"""


INGEST_QUERIES = {
    "events_ingest_dedup": q_events_ingest_dedup,
}

INGEST_ORACLES = {
    "events_ingest_dedup": SQL_EVENTS_INGEST_DEDUP,
}
