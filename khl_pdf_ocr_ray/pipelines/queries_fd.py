"""Approximate functional-dependency discovery (data-profiling class:
TANE/Metanome's single-column FD check, the schema-inference pass a
pipeline runs before trusting a column as a join/partition key).

``fd_discovery``: for each candidate dependency lhs -> rhs over the
driver tables, report the distinct-lhs count, how many lhs values map to
MORE than one rhs (violations), the maximum rhs fan-out of any lhs, and
whether the FD holds exactly. A held FD with n_lhs == table rows also
certifies lhs as a key.

Plan per candidate: pruned 2-column read -> per-batch DISTINCT
(lhs, rhs) combiner -> ONE lhs-keyed Count exchange (rows = distinct
pair count, never table rows) -> per-batch (n_lhs, n_viol, max_fanout)
partials -> a |candidates|-row driver-side union. Every exchange is
bounded by the pair-distinct cardinality of the column pair — the
profiling bound, independent of table size. Candidates are config, so
the whole query is |candidates| independent slim pipelines.

100 TB notes: pair-distinct cardinality of a true key is the table's
row count — for key-candidate columns this is the honest cost of exact
verification (the same bound as dedup_exact); sampled or sketched
(HLL-per-lhs) variants trade exactness for a smaller exchange and can
reuse stages/sketch.py, documented not built.

Oracle: static SQL, one UNION ALL leg per candidate with the identical
COUNT(DISTINCT)/FILTER/MAX closed form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QFD = "khl_pdf_ocr_ray.pipelines.queries_fd"

# (table, lhs, rhs) — keys that hold and plausible-but-false dependencies
FD_CANDIDATES = (
    ("nation", "n_nationkey", "n_regionkey"),     # holds: lhs is the key
    ("customer", "c_custkey", "c_mktsegment"),    # holds: lhs is the key
    ("customer", "c_nationkey", "c_mktsegment"),  # violated: many segments per nation
    ("orders", "o_custkey", "o_orderpriority"),   # violated: priorities vary per customer
    ("events", "user_id", "event_type"),          # violated: users emit many types
    ("lineitem", "l_orderkey", "l_returnflag"),   # may hold or not — data decides
)


FD_SHARDS = 64


def fd_pair_distinct(batch: pa.Table, lhs: str, rhs: str) -> pa.Table:
    """One batch -> per-batch DISTINCT (lhs, rhs) pairs, stringified,
    sharded by an lhs hash so every copy of an lhs lands in one shard
    group (the BUCKET_SHARDS convention: O(shards) vectorized kernel
    calls, 2 exchanges total instead of 3 keyed aggregates)."""
    import zlib

    g = batch.select([lhs, rhs]).group_by([lhs, rhs]).aggregate([])
    lv = pc.cast(g[lhs], pa.string())
    rv = pc.cast(g[rhs], pa.string())
    shard = np.fromiter(
        (zlib.crc32(v.encode("utf-8")) % FD_SHARDS for v in lv.to_pylist()),
        dtype=np.int64,
        count=len(lv),
    )
    return pa.table({"lhs": lv, "rhs": rv, "shard": pa.array(shard)})


def fd_shard_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """One lhs shard -> ONE (n_lhs, n_viol, max_fanout) partial row:
    cross-batch pair dedup + per-lhs rhs fan-out, vectorized."""
    g = g.drop_duplicates(["lhs", "rhs"])
    fan = g.groupby("lhs")["rhs"].nunique()
    return pd.DataFrame(
        {
            "n_lhs": pd.array([len(fan)], dtype="int64"),
            "n_viol": pd.array([int((fan > 1).sum())], dtype="int64"),
            "max_fanout": pd.array(
                [int(fan.max()) if len(fan) else 0], dtype="int64"
            ),
        }
    )


def _fd_stats(sf_dir: str, table: str, lhs: str, rhs: str) -> dict:
    from .queries import _t

    rolled = (
        _t(sf_dir, table, [lhs, rhs])
        .map_batches(
            remote_fn(_QFD, "fd_pair_distinct", lhs=lhs, rhs=rhs),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(remote_fn(_QFD, "fd_shard_kernel"), batch_format="pandas")
        .groupby(None)
        .aggregate(
            Sum("n_lhs", alias_name="n_lhs"),
            Sum("n_viol", alias_name="n_viol"),
            Max("max_fanout", alias_name="max_fanout"),
        )
        .to_pandas()  # exactly one row: the candidate's profile
    )
    r = rolled.iloc[0]
    return {
        "dependency": f"{table}.{lhs} -> {rhs}",
        "n_lhs": int(r["n_lhs"]),
        "n_viol": int(r["n_viol"]),
        "max_fanout": int(r["max_fanout"]),
        "holds": bool(int(r["n_viol"]) == 0),
    }


def q_fd_discovery(sf_dir: str) -> pd.DataFrame:
    """(dependency, n_lhs, n_viol, max_fanout, holds) per candidate."""
    rows = [_fd_stats(sf_dir, t, l, r) for t, l, r in FD_CANDIDATES]
    df = pd.DataFrame(rows)
    return df.astype(
        {
            "dependency": "string",
            "n_lhs": "int64",
            "n_viol": "int64",
            "max_fanout": "int64",
            "holds": "bool",
        }
    )


def _fd_leg(table: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{table}.{lhs} -> {rhs}' AS dependency,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(count(*) FILTER (WHERE fanout > 1) AS BIGINT) AS n_viol,
       CAST(max(fanout) AS BIGINT) AS max_fanout,
       count(*) FILTER (WHERE fanout > 1) = 0 AS holds
FROM (SELECT CAST({lhs} AS VARCHAR) AS l,
             CAST(count(DISTINCT CAST({rhs} AS VARCHAR)) AS BIGINT) AS fanout
      FROM {table} GROUP BY 1)"""


SQL_FD_DISCOVERY = "\nUNION ALL\n".join(
    _fd_leg(t, l, r) for t, l, r in FD_CANDIDATES
)

# --- inclusion-dependency discovery (foreign-key certification) --------------
# The companion profiling pass: does every value of child.col appear in
# parent.col? A held IND with a held key on the parent side certifies a
# usable FK join path; the violation count quantifies referential damage
# (the dangling-row accounting a pipeline needs before an inner join
# silently drops rows).
IND_CANDIDATES = (
    # (child_table, child_col, parent_table, parent_col)
    ("orders", "o_custkey", "customer", "c_custkey"),      # true FK
    ("customer", "c_nationkey", "nation", "n_nationkey"),  # true FK
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),    # true FK
    ("supplier", "s_nationkey", "nation", "n_nationkey"),  # true FK
    ("nation", "n_regionkey", "region", "r_regionkey"),    # true FK
    ("events", "user_id", "customer", "c_custkey"),        # plausible, data decides
)


def ind_distinct_col(batch: pa.Table, col: str, side: int) -> pa.Table:
    """One batch -> per-batch DISTINCT stringified values, tagged with the
    side bit (1 = child, 2 = parent) and sharded by a value hash so every
    copy of a value meets in one shard group."""
    import zlib

    g = batch.select([col]).group_by([col]).aggregate([])
    vals = pc.cast(g[col], pa.string())
    n = g.num_rows
    shard = np.fromiter(
        (zlib.crc32(v.encode("utf-8")) % FD_SHARDS for v in vals.to_pylist()),
        dtype=np.int64,
        count=n,
    )
    return pa.table(
        {
            "val": vals,
            "side": pa.array(np.full(n, side, dtype=np.int64)),
            "shard": pa.array(shard),
        }
    )


def ind_shard_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """One value shard -> ONE (n_child, n_missing) partial row: per-val
    min/max side (batching-invariant — a val may surface from many
    batches per side, so counting rows would be wrong), vectorized."""
    agg = g.groupby("val")["side"].agg(["min", "max"])
    child = agg["min"].to_numpy() == 1
    missing = agg["max"].to_numpy() == 1
    return pd.DataFrame(
        {
            "n_child": pd.array([int(child.sum())], dtype="int64"),
            "n_missing": pd.array([int(missing.sum())], dtype="int64"),
        }
    )


def _ind_stats(sf_dir: str, ct: str, cc: str, pt: str, pc_: str) -> dict:
    from .queries import _t

    child = _t(sf_dir, ct, [cc]).map_batches(
        remote_fn(_QFD, "ind_distinct_col", col=cc, side=1),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    parent = _t(sf_dir, pt, [pc_]).map_batches(
        remote_fn(_QFD, "ind_distinct_col", col=pc_, side=2),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rolled = (
        child.union(parent)
        .groupby("shard")
        .map_groups(remote_fn(_QFD, "ind_shard_kernel"), batch_format="pandas")
        .groupby(None)
        .aggregate(
            Sum("n_child", alias_name="n_child"),
            Sum("n_missing", alias_name="n_missing"),
        )
        .to_pandas()
    )
    r = rolled.iloc[0]
    return {
        "dependency": f"{ct}.{cc} IN {pt}.{pc_}",
        "n_child_distinct": int(r["n_child"]),
        "n_missing": int(r["n_missing"]),
        "holds": bool(int(r["n_missing"]) == 0),
    }


def q_ind_discovery(sf_dir: str) -> pd.DataFrame:
    """(dependency, n_child_distinct, n_missing, holds) per candidate."""
    rows = [_ind_stats(sf_dir, *cand) for cand in IND_CANDIDATES]
    df = pd.DataFrame(rows)
    return df.astype(
        {
            "dependency": "string",
            "n_child_distinct": "int64",
            "n_missing": "int64",
            "holds": "bool",
        }
    )


def _ind_leg(ct: str, cc: str, pt: str, pc_: str) -> str:
    return f"""
SELECT '{ct}.{cc} IN {pt}.{pc_}' AS dependency,
       (SELECT CAST(count(DISTINCT CAST({cc} AS VARCHAR)) AS BIGINT)
        FROM {ct}) AS n_child_distinct,
       (SELECT CAST(count(*) AS BIGINT) FROM
         (SELECT DISTINCT CAST({cc} AS VARCHAR) AS v FROM {ct}) c
        WHERE c.v NOT IN
          (SELECT CAST({pc_} AS VARCHAR) FROM {pt})) AS n_missing,
       (SELECT count(*) FROM
         (SELECT DISTINCT CAST({cc} AS VARCHAR) AS v FROM {ct}) c
        WHERE c.v NOT IN
          (SELECT CAST({pc_} AS VARCHAR) FROM {pt})) = 0 AS holds"""


SQL_IND_DISCOVERY = "\nUNION ALL\n".join(
    _ind_leg(*cand) for cand in IND_CANDIDATES
)

FD_QUERIES = {"fd_discovery": q_fd_discovery, "ind_discovery": q_ind_discovery}
FD_ORACLES = {"fd_discovery": SQL_FD_DISCOVERY, "ind_discovery": SQL_IND_DISCOVERY}
