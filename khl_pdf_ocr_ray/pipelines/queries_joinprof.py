"""Join-explosion profiling (the pre-join advisor for skewed keys).

``join_explosion_profile``: for a declared join (the planted two-sided-
skew stream x tag dimension of ``skew_join_salted``), the top-K join
keys by OUTPUT fan-out — per key the probe-side row count, build-side
row count, and their product (the rows an inner join emits for that
key) — plus a global rank. This is the profile a pipeline reads before
choosing between the plain hash join, ``skew_join`` (broadcast the hot
build slice) and ``salted_skew_join`` (salt + replicate): the top row's
``out_rows`` IS the size of the straggler partition a plain shuffle
join would build.

Plan: per-batch per-key count combiners on each side -> two slim keyed
Sum exchanges (bounded by key cardinality, never rows) -> one key-keyed
join of the two count tables -> product map -> global sort by
(out_rows desc, key) + limit K -> single tiny batch gets ranks. The
sort runs over the key-cardinality profile table, not data; at extreme
key cardinality a per-batch top-K superset combiner (the
top_k_per_group machinery) drops the sort to K x blocks rows —
documented, not needed at any realistic key count.

Oracle: static SQL, identical counts/product/tie-break
(ROW_NUMBER OVER (ORDER BY out_rows DESC, key)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QJP = "khl_pdf_ocr_ray.pipelines.queries_joinprof"

JOINPROF_K = 10


def jp_left_partial(batch: pa.Table) -> pa.Table:
    """Planted stream batch -> per-batch (key, nl) count partials."""
    g = batch.select(["user_id"]).group_by(["user_id"]).aggregate(
        [([], "count_all")]
    )
    return select_rename(g, key="user_id", nl="count_all")


def jp_right_partial(batch: pa.Table) -> pa.Table:
    """Tag-dimension batch -> per-batch (key, nr) count partials."""
    g = batch.select(["u_r"]).group_by(["u_r"]).aggregate([([], "count_all")])
    return select_rename(g, rkey="u_r", nr="count_all")


def jp_product(batch: pa.Table) -> pa.Table:
    nl = batch["nl"].to_numpy(zero_copy_only=False).astype(np.int64)
    nr = batch["nr"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "key": pc.cast(batch["key"], pa.int64()),
            "n_left": pa.array(nl),
            "n_right": pa.array(nr),
            "out_rows": pa.array(nl * nr),
        }
    )


def jp_rank(batch: pa.Table) -> pa.Table:
    """One coalesced top-K batch (already globally sorted) -> ranked."""
    n = batch.num_rows
    return pa.table(
        {
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "key": pc.cast(batch["key"], pa.int64()),
            "n_left": pc.cast(batch["n_left"], pa.int64()),
            "n_right": pc.cast(batch["n_right"], pa.int64()),
            "out_rows": pc.cast(batch["out_rows"], pa.int64()),
        }
    )


def q_join_explosion_profile(sf_dir: str) -> rd.Dataset:
    """(rank, key, n_left, n_right, out_rows) — top-K join keys of the
    planted two-sided-skew join by output fan-out."""
    from ..joins import safe_join
    from .queries import _t
    from .queries_rel import _QR

    ev = _t(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        remote_fn(_QR, "skew_plant_batch"), batch_format="pyarrow"
    )
    left = (
        ev.map_batches(
            remote_fn(_QJP, "jp_left_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("key")
        .aggregate(Sum("nl", alias_name="nl"))
    )
    from ray.data.aggregate import Count

    dim = (
        ev.map_batches(remote_fn(_QR, "skew_dim_partial"), batch_format="pyarrow")
        .groupby("u_r")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["u_r"])
        .map_batches(remote_fn(_QR, "skew_tag_dim_batch"), batch_format="pyarrow")
    )
    right = (
        dim.map_batches(
            remote_fn(_QJP, "jp_right_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("rkey")
        .aggregate(Sum("nr", alias_name="nr"))
    )
    # materialize-fallback sizing on purpose: both sides are KEY-CARDINALITY
    # count tables (slim), and byte-based partition sizing would overshoot
    # their distinct-key count — the empty-partition hazard the joins
    # module documents for low-cardinality keys. The fallback counts the
    # materialized tables for free and collapses to few/one partition.
    prof = safe_join(
        left,
        right,
        on=("key",),
        right_on=("rkey",),
    )
    assert prof is not None  # events is never empty -> both count tables exist
    prof = prof.map_batches(
        remote_fn(_QJP, "jp_product"), batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        prof.sort(["out_rows", "key"], descending=[True, False])
        .limit(JOINPROF_K)
        .repartition(1)
        .map_batches(remote_fn(_QJP, "jp_rank"), batch_format="pyarrow")
    )


SQL_JOIN_EXPLOSION_PROFILE = f"""
WITH ev AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS user_id
  FROM events),
u AS (SELECT DISTINCT user_id AS u_r FROM ev),
dim AS (
  SELECT u_r, CAST(t.t AS BIGINT) AS tag
  FROM u, unnest([0, 1, 2]) AS t(t) WHERE u_r = 0
  UNION ALL
  SELECT u_r, CAST(u_r % 3 AS BIGINT) AS tag FROM u WHERE u_r <> 0),
l AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_left
      FROM ev GROUP BY 1),
r AS (SELECT u_r AS key, CAST(count(*) AS BIGINT) AS n_right
      FROM dim GROUP BY 1),
p AS (SELECT l.key, n_left, n_right, n_left * n_right AS out_rows
      FROM l JOIN r ON l.key = r.key)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY out_rows DESC, key) AS BIGINT) AS rank,
       key, n_left, n_right, out_rows
FROM p
ORDER BY out_rows DESC, key
LIMIT {JOINPROF_K}
"""

JOINPROF_QUERIES = {"join_explosion_profile": q_join_explosion_profile}
JOINPROF_ORACLES = {"join_explosion_profile": SQL_JOIN_EXPLOSION_PROFILE}
