"""Sequential-pattern support mining (ordered pair with gap allowed).

``seq_pair_support``: for every ordered event-type pair (ta, tb), the
number of USERS whose stream contains some ta event strictly before
some tb event (any gap, not just adjacent) — the support statistic of
sequence-pattern mining (AprioriAll/PrefixSpan's length-2 patterns).
Distinct from ``markov_transitions`` (ADJACENT pairs, counted per
occurrence) and ``funnel_conversion`` (one fixed ordered chain).

Closed form that makes it combiner-friendly: a user exhibits ta -> tb
iff min ts(ta) < max ts(tb) within that user's stream — only per-(user,
type) FIRST and LAST timestamps are needed, and (min, max) merge
associatively across batches. Plan: per-batch (user, type, min_ts,
max_ts) combiner -> ONE (user, type)-keyed Min/Max exchange (bounded by
|users| x |types|, never events) -> user-sharded vectorized pair kernel
(each shard emits <= |types|^2 rows per user, pre-reduced to per-shard
support partials) -> a |types|^2-row Sum. The events table never moves;
the big exchange carries 4-column rows bounded by user-type cardinality.

100 TB notes: both exchanges are combiner-backed; the user-shard keeps
map_groups at O(shards) vectorized calls (the BUCKET_SHARDS
convention). ta == tb is a valid pattern (the type recurs) and holds
iff first < last strictly — same form, no special case.

Oracle: static SQL, the identical first<last self-join closed form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QSP = "khl_pdf_ocr_ray.pipelines.queries_seqpat"

SEQPAT_SHARDS = 64


def seqpat_fl_partial(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch (user_id, event_type, f, l) partials
    (f/l as int64 epoch-us so Min/Max merge exactly)."""
    us = pc.cast(batch["ts"], pa.int64())
    g = (
        pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "ts_us": us,
            }
        )
        .group_by(["user_id", "event_type"])
        .aggregate([("ts_us", "min"), ("ts_us", "max")])
    )
    return select_rename(
        g,
        user_id="user_id",
        event_type="event_type",
        f="ts_us_min",
        l="ts_us_max",
    )


def seqpat_shard_batch(batch: pa.Table) -> pa.Table:
    """Merged (user, type, f, l) rows -> add shard = user % SEQPAT_SHARDS."""
    u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column("shard", pa.array(u % SEQPAT_SHARDS))


def seqpat_pairs_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """One user shard -> per-shard (ta, tb, support) partials: the
    first<last cross-compare per user, vectorized with a self-merge."""
    m = g[["user_id", "event_type", "f", "l"]].merge(
        g[["user_id", "event_type", "f", "l"]], on="user_id", suffixes=("_a", "_b")
    )
    hit = m[m["f_a"] < m["l_b"]]
    r = (
        hit.groupby(["event_type_a", "event_type_b"], as_index=False)
        .size()
        .rename(
            columns={
                "event_type_a": "ta",
                "event_type_b": "tb",
                "size": "support",
            }
        )
    )
    return r.astype({"ta": "string", "tb": "string", "support": "int64"})


def q_seq_pair_support(sf_dir: str) -> rd.Dataset:
    """(ta, tb, support) — see module docstring."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(
            remote_fn(_QSP, "seqpat_fl_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["user_id", "event_type"])
        .aggregate(Min("f", alias_name="f"), Max("l", alias_name="l"))
        .map_batches(
            remote_fn(_QSP, "seqpat_shard_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(remote_fn(_QSP, "seqpat_pairs_kernel"), batch_format="pandas")
        .groupby(["ta", "tb"])
        .aggregate(Sum("support", alias_name="support"))
    )


SQL_SEQ_PAIR_SUPPORT = """
WITH fl AS (
  SELECT user_id, event_type,
         min(CAST(ts AS BIGINT)) AS f, max(CAST(ts AS BIGINT)) AS l
  FROM (SELECT user_id, event_type, epoch_us(ts) AS ts FROM events)
  GROUP BY user_id, event_type)
SELECT a.event_type AS ta, b.event_type AS tb,
       CAST(count(*) AS BIGINT) AS support
FROM fl a JOIN fl b ON a.user_id = b.user_id AND a.f < b.l
GROUP BY a.event_type, b.event_type
"""

SEQPAT_QUERIES = {"seq_pair_support": q_seq_pair_support}
SEQPAT_ORACLES = {"seq_pair_support": SQL_SEQ_PAIR_SUPPORT}
