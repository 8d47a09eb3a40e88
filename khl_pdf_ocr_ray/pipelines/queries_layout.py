"""Data-layout operators: Z-order clustering stats + compaction planning.

Two table-maintenance operators every 100 TB lakehouse job scheduler
runs between ingest and query (Delta/Iceberg ``OPTIMIZE`` family):

- ``zorder_layout`` — assign every event row a Morton (Z-order) key
  interleaving the bits of its two query dimensions (user bucket,
  day bucket) and report per-Z-bucket locality stats: row count,
  distinct users, and the min/max of BOTH dimensions inside the
  bucket. The witness of the layout's value is in the output itself:
  Z-buckets cover small rectangles in (user, day) space, so a
  two-dimensional range scan prunes to few buckets — unlike a sort
  on either single dimension.
- ``compaction_plan`` — small-file compaction planning: derive the
  table's "file" inventory (synthesized deterministically as
  ``file_id = doc_id // FILE_DOCS`` with size = total chars — the
  metadata a real manifest provides for free), then FIRST-FIT
  DECREASING bin-pack files into target-size output bins,
  independently inside each planning shard. The output (file_id,
  size_chars, bin_id) IS the rewrite plan a compactor executes.

Plans / 100 TB notes:
- zorder: the Morton key is map-only integer bit math (no shuffle to
  ASSIGN the layout — a real rewrite would `sort` by zkey, which is
  the one unavoidable exchange of any clustering rewrite). The stats
  here move one (zbucket, user) combiner-backed exchange (bounded by
  buckets x users-per-bucket, i.e. the pair-distinct volume, never
  raw rows) plus a |buckets|-row rollup.
- compaction: FFD is inherently sequential, so the industry plan
  (and this one) shards it: planning runs per PLAN_SHARDS partition
  of the file inventory via ``groupby().map_groups`` — each group
  holds |files|/shards METADATA rows (file manifests are ~1e6-1e8
  rows at 100 TB, not data-sized), the corpus text itself never
  moves, and shards plan in parallel. Oracle: the same FFD kernel
  run sequentially (state/oracle_dump_train.py) — the gate certifies
  the distributed inventory + sharded packing reproduces it exactly.

Reference analogue: /root/reference/app.py has no storage-layout
surface; brief scope (resumable partitioned output / table
maintenance at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QY = "khl_pdf_ocr_ray.pipelines.queries_layout"

Z_DIM_BITS = 8           # bits per dimension -> 16-bit Morton key
Z_DIM = 1 << Z_DIM_BITS  # 256 buckets per dimension
Z_BUCKET_SHIFT = 6       # zbucket = zkey >> 6 -> 1024 Z-buckets
DAY_US = 86_400_000_000

FILE_DOCS = 50           # docs per synthesized input file
PLAN_SHARDS = 4          # independent compaction planning shards
BIN_CAP = 65_536         # target output-file size (chars)
BIN_STRIDE = 1_000_000   # global bin_id = shard * stride + local bin


def _morton16(u: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Interleave the low Z_DIM_BITS bits of u (odd positions) and d
    (even positions). Vectorized over the batch; the loop is over the
    8 bit positions, not rows."""
    z = np.zeros(len(u), dtype=np.int64)
    for i in range(Z_DIM_BITS):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((d >> i) & 1) << (2 * i)
    return z


def zorder_pair_partial(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch (zbucket, user_id) locality partials."""
    user = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    u = user % Z_DIM
    d = (ts_us // DAY_US) % Z_DIM  # ts >= epoch by corpus contract
    zb = _morton16(u, d) >> Z_BUCKET_SHIFT
    t = pa.table(
        {
            "zbucket": pa.array(zb, pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "u": pa.array(u, pa.int64()),
            "d": pa.array(d, pa.int64()),
        }
    )
    g = t.group_by(["zbucket", "user_id"]).aggregate(
        [([], "count_all"), ("u", "min"), ("u", "max"), ("d", "min"), ("d", "max")]
    )
    g = select_rename(
        g,
        zbucket="zbucket",
        user_id="user_id",
        n="count_all",
        umin="u_min",
        umax="u_max",
        dmin="d_min",
        dmax="d_max",
    )
    return g.set_column(2, "n", g["n"].cast(pa.int64()))


def zorder_finalize(batch: pa.Table) -> pa.Table:
    """|buckets|-row rollup -> stable column order, all int64."""
    return pa.table(
        {
            "zbucket": batch["zbucket"].cast(pa.int64()),
            "n_rows": batch["n_rows"].cast(pa.int64()),
            "n_users": batch["n_users"].cast(pa.int64()),
            "u_min": batch["u_min"].cast(pa.int64()),
            "u_max": batch["u_max"].cast(pa.int64()),
            "d_min": batch["d_min"].cast(pa.int64()),
            "d_max": batch["d_max"].cast(pa.int64()),
        }
    )


def q_zorder_layout(sf_dir: str) -> rd.Dataset:
    """(zbucket, n_rows, n_users, u_min, u_max, d_min, d_max). See
    module docstring."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(
            remote_fn(_QY, "zorder_pair_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["zbucket", "user_id"])
        .aggregate(
            Sum("n", alias_name="n"),
            Min("umin", alias_name="umin"),
            Max("umax", alias_name="umax"),
            Min("dmin", alias_name="dmin"),
            Max("dmax", alias_name="dmax"),
        )
        .groupby("zbucket")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Count(alias_name="n_users"),
            Min("umin", alias_name="u_min"),
            Max("umax", alias_name="u_max"),
            Min("dmin", alias_name="d_min"),
            Max("dmax", alias_name="d_max"),
        )
        .map_batches(
            remote_fn(_QY, "zorder_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# --- compaction planning ------------------------------------------------


def file_size_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> per-batch (file_id, size_chars) partials."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table(
        {
            "file_id": pa.array(doc // FILE_DOCS, pa.int64()),
            "size_chars": pa.array(n, pa.int64()),
        }
    )
    g = t.group_by("file_id").aggregate([("size_chars", "sum")])
    return select_rename(g, file_id="file_id", size_chars="size_chars_sum")


def ffd_pack(file_ids: np.ndarray, sizes: np.ndarray, cap: int) -> np.ndarray:
    """First-fit decreasing over ONE shard's file inventory: sort by
    (size desc, file_id asc), place each file in the first bin with
    room, else open a new bin. Returns the local bin index per input
    position. The loop is over manifest rows (metadata-scale), shared
    verbatim by the sequential oracle twin."""
    order = np.lexsort((file_ids, -sizes))
    bins: list = []  # remaining capacity per open bin
    out = np.zeros(len(file_ids), dtype=np.int64)
    for pos in order:
        s = int(sizes[pos])
        for b, room in enumerate(bins):
            if s <= room:
                bins[b] = room - s
                out[pos] = b
                break
        else:
            bins.append(max(0, cap - s))  # oversize file -> own full bin
            out[pos] = len(bins) - 1
    return out


def plan_shard_group(g: pd.DataFrame) -> pd.DataFrame:
    """One planning shard's (file_id, size_chars) inventory -> FFD bin
    assignments with globally unique bin ids."""
    fid = g["file_id"].to_numpy().astype(np.int64)
    size = g["size_chars"].to_numpy().astype(np.int64)
    local = ffd_pack(fid, size, BIN_CAP)
    shard = int(g["plan_shard"].iloc[0])
    return pd.DataFrame(
        {
            "file_id": fid,
            "size_chars": size,
            "bin_id": shard * BIN_STRIDE + local,
        }
    )


def file_shard_tag(batch: pa.Table) -> pa.Table:
    fid = batch["file_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column(
        "plan_shard", pa.array(fid % PLAN_SHARDS, pa.int64())
    )


def q_compaction_plan(sf_dir: str) -> rd.Dataset:
    """(file_id, size_chars, bin_id). See module docstring."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(
            remote_fn(_QY, "file_size_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("file_id")
        .aggregate(Sum("size_chars", alias_name="size_chars"))
        .map_batches(
            remote_fn(_QY, "file_shard_tag"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("plan_shard")
        .map_groups(remote_fn(_QY, "plan_shard_group"), batch_format="pandas")
    )


# --- SQL twins (zorder is static SQL; compaction's FFD twin lives in
# --- state/oracle_dump_train.py) ----------------------------------------

_MORTON_SQL = " + ".join(
    f"(((u >> {i}) & 1) << {2 * i + 1}) + (((d >> {i}) & 1) << {2 * i})"
    for i in range(Z_DIM_BITS)
)

SQL_ZORDER_LAYOUT = f"""
WITH dims AS (
  SELECT user_id,
         user_id % {Z_DIM} AS u,
         (epoch_us(ts) // {DAY_US}) % {Z_DIM} AS d
  FROM events),
z AS (
  SELECT user_id, u, d, ({_MORTON_SQL}) // {1 << Z_BUCKET_SHIFT} AS zbucket
  FROM dims),
pairs AS (
  SELECT zbucket, user_id, CAST(count(*) AS BIGINT) AS n,
         MIN(u) AS umin, MAX(u) AS umax, MIN(d) AS dmin, MAX(d) AS dmax
  FROM z GROUP BY zbucket, user_id)
SELECT zbucket,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(umin) AS BIGINT) AS u_min,
       CAST(max(umax) AS BIGINT) AS u_max,
       CAST(min(dmin) AS BIGINT) AS d_min,
       CAST(max(dmax) AS BIGINT) AS d_max
FROM pairs GROUP BY zbucket
"""

LAYOUT_QUERIES = {
    "zorder_layout": q_zorder_layout,
    "compaction_plan": q_compaction_plan,
}

LAYOUT_ORACLES = {
    "zorder_layout": SQL_ZORDER_LAYOUT,
    # compaction_plan: dump-backed (state/oracle_dump_train.py)
}
