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


def fd_pair_distinct(batch: pa.Table, lhs: str, rhs: str) -> pa.Table:
    """One batch -> per-batch DISTINCT (lhs, rhs) pairs, stringified so
    every candidate's pair table unions through one schema."""
    g = batch.select([lhs, rhs]).group_by([lhs, rhs]).aggregate([])
    return pa.table(
        {
            "lhs": pc.cast(g[lhs], pa.string()),
            "rhs": pc.cast(g[rhs], pa.string()),
        }
    )


def fd_rollup_partial(batch: pa.Table) -> pa.Table:
    """(lhs, fanout) rows -> one (n_lhs, n_viol, max_fanout) partial."""
    fan = batch["fanout"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "n_lhs": pa.array([len(fan)], pa.int64()),
            "n_viol": pa.array([int((fan > 1).sum())], pa.int64()),
            "max_fanout": pa.array(
                [int(fan.max()) if len(fan) else 0], pa.int64()
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
        .groupby(["lhs", "rhs"])
        .aggregate(Count(alias_name="_n"))  # cross-batch pair dedup
        .groupby("lhs")
        .aggregate(Count(alias_name="fanout"))
        .map_batches(
            remote_fn(_QFD, "fd_rollup_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
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

FD_QUERIES = {"fd_discovery": q_fd_discovery}
FD_ORACLES = {"fd_discovery": SQL_FD_DISCOVERY}
