"""Correlated-subquery relational patterns, rewritten as aggregates.

Three classic warehouse shapes the TPC-H spec expresses with
correlated subqueries / EXISTS, each rewritten into the shuffle-
friendly aggregate form a distributed engine actually runs:

``part_best_supplier`` (Q2-flavored argmin-per-group): for every part
traded in lineitem, the supplier offering the lowest effective unit
price. The argmin + tie-break (lowest suppkey among ties) is ONE Min
aggregate over a packed ``unit_cents * 2^21 + suppkey`` int64 — no
join-back to re-find the argmin row, no per-group sort.

``sole_return_suppliers`` (Q21-flavored multi-EXISTS): suppliers who,
in multi-supplier orders, were the ONLY supplier with a returned
('R') line. The EXISTS / NOT EXISTS pair folds into per-(order,
supplier) flag aggregates joined against a per-order rollup.

``idle_rich_customers`` (Q22-flavored): customers with an
above-average positive balance and NO orders in the corpus' final
365 days (the cutoff derives from max(o_orderdate), so both branches
are populated at every scale — "no orders at all" is empty at small
scale factors, see q_customers_anti). The scalar AVG subquery becomes
one broadcast (sum, count) pair compared exactly via
cross-multiplication (cents * n_pos > sum_pos_cents — no float
division anywhere); the NOT EXISTS becomes a distributed anti join
against the recent-order keys.

Plan / 100 TB notes: lineitem never leaves its partials — both
lineitem operators pre-aggregate map-side to (order, supplier) /
(part) cells before any exchange. part/supplier/nation name lookups
ride ray.put broadcasts (dimension class). The single real join in
sole_return_suppliers is order-cardinality x order-cardinality on the
streaming safe_join path; idle_rich_customers' anti join is the
existing hash anti machinery keyed on custkey. Packing bound asserted
loudly (suppkey < 2^21, unit_cents < 2^40) — at larger key spaces
widen the pack, the assert names the knob.

Oracles: static SQL — the same packed-min / flag-fold / cross-
multiplied expressions (floor(x*100+0.5) cents; division order in the
unit-price expression is identical on both sides so IEEE doubles
agree bit-for-bit).

Reference analogue: /root/reference/app.py has no relational surface;
brief scope (SURVEY.md §2.4 join-strategy coverage at depth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QX = "khl_pdf_ocr_ray.pipelines.queries_relx"

SUPP_PACK = 1 << 21  # suppkey packing radix; assert guards the bound


# --- part_best_supplier ------------------------------------------------------


def best_supp_partial(batch: pa.Table) -> pa.Table:
    """lineitem batch -> (l_partkey, packed) per-batch min partials.
    packed = unit_cents * SUPP_PACK + suppkey: Min(packed) IS the
    (min unit price, then min suppkey) argmin."""
    unit = pc.multiply(
        pc.divide(
            pc.multiply(
                batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
            ),
            batch["l_quantity"],
        ),
        100.0,
    )
    cents = pc.cast(pc.floor(pc.add(unit, 0.5)), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    supp = batch["l_suppkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    assert (cents >= 0).all() and (cents < (1 << 40)).all(), (
        "unit_cents outside pack range — widen SUPP_PACK layout"
    )
    assert (supp >= 0).all() and (supp < SUPP_PACK).all(), (
        "suppkey >= 2^21 — widen SUPP_PACK"
    )
    t = pa.table(
        {
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "packed": pa.array(cents * SUPP_PACK + supp, pa.int64()),
        }
    )
    g = t.group_by("l_partkey").aggregate([("packed", "min")])
    return select_rename(g, l_partkey="l_partkey", packed="packed_min")


def best_supp_finalize(batch: pa.Table, maps_ref) -> pa.Table:
    """(l_partkey, packed) -> decoded row with broadcast dim names."""
    import ray as _ray

    p_brand, s_name = _ray.get(maps_ref)
    packed = batch["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
    part = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = packed // SUPP_PACK
    supp = packed % SUPP_PACK
    return pa.table(
        {
            "p_partkey": pa.array(part, pa.int64()),
            "p_brand": pa.array([p_brand[int(k)] for k in part], pa.string()),
            "s_suppkey": pa.array(supp, pa.int64()),
            "s_name": pa.array([s_name[int(k)] for k in supp], pa.string()),
            "unit_cents": pa.array(cents, pa.int64()),
        }
    )


def q_part_best_supplier(sf_dir: str) -> "object":
    """(p_partkey, p_brand, s_suppkey, s_name, unit_cents)."""
    import os

    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Min

    from .queries import _t

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    maps_ref = ray.put(
        (
            {
                int(k): str(v)
                for k, v in zip(
                    part["p_partkey"].to_pylist(), part["p_brand"].to_pylist()
                )
            },
            {
                int(k): str(v)
                for k, v in zip(
                    supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist()
                )
            },
        )
    )
    return (
        _t(
            sf_dir,
            "lineitem",
            [
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
        )
        .map_batches(
            remote_fn(_QX, "best_supp_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_partkey")
        .aggregate(Min("packed", alias_name="packed"))
        .map_batches(
            remote_fn(_QX, "best_supp_finalize", maps_ref=maps_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# --- sole_return_suppliers ---------------------------------------------------


def order_supp_flags(batch: pa.Table) -> pa.Table:
    """lineitem batch -> (l_orderkey, l_suppkey, has_r) partials."""
    t = pa.table(
        {
            "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "has_r": pc.cast(
                pc.equal(batch["l_returnflag"], "R"), pa.int64()
            ),
        }
    )
    g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("has_r", "max")])
    return select_rename(
        g, l_orderkey="l_orderkey", l_suppkey="l_suppkey", has_r="has_r_max"
    )


def order_rollup_partial(batch: pa.Table) -> pa.Table:
    """(order, supplier, has_r) -> per-order (n_supp, r_supp) partials."""
    t = batch.select(["l_orderkey", "has_r"])
    g = t.group_by("l_orderkey").aggregate(
        [([], "count_all"), ("has_r", "sum")]
    )
    g = select_rename(
        g, l_orderkey="l_orderkey", n_supp="count_all", r_supp="has_r_sum"
    )
    return pa.table(
        {
            "l_orderkey": g["l_orderkey"],
            "n_supp": g["n_supp"].cast(pa.int64()),
            "r_supp": g["r_supp"].cast(pa.int64()),
        }
    )


def sole_return_filter(batch: pa.Table) -> pa.Table:
    """joined rows -> (l_suppkey, n) partials for the qualifying rows:
    multi-supplier order, this supplier returned, nobody else did."""
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(batch["n_supp"], 2),
            pc.equal(batch["has_r"], 1),
        ),
        pc.equal(batch["r_supp"], 1),
    )
    t = batch.filter(keep).select(["l_suppkey"])
    g = t.group_by("l_suppkey").aggregate([([], "count_all")])
    g = select_rename(g, l_suppkey="l_suppkey", n="count_all")
    return g.set_column(1, "n", g["n"].cast(pa.int64()))


def sole_names(batch: pa.Table, names_ref) -> pa.Table:
    import ray as _ray

    s_name = _ray.get(names_ref)
    sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "s_suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array([s_name[int(k)] for k in sk], pa.string()),
            "n_orders": batch["n_orders"].cast(pa.int64()),
        }
    )


def q_sole_return_suppliers(sf_dir: str) -> "object":
    """(s_suppkey, s_name, n_orders)."""
    import os

    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Max, Sum

    from ..io import table_nbytes
    from ..joins import safe_join
    from .queries import _t

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    names_ref = ray.put(
        {
            int(k): str(v)
            for k, v in zip(
                supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist()
            )
        }
    )
    pairs = (
        _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(
            remote_fn(_QX, "order_supp_flags"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("has_r", alias_name="has_r"))
        .materialize()  # reused: per-order rollup + the join probe side
    )
    per_order = (
        pairs.map_batches(
            remote_fn(_QX, "order_rollup_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_orderkey")
        .aggregate(
            Sum("n_supp", alias_name="n_supp"),
            Sum("r_supp", alias_name="r_supp"),
        )
    )
    joined = safe_join(
        pairs,
        per_order,
        on=("l_orderkey",),
        right_on=("l_orderkey",),
        assume_non_empty=True,  # both derive from lineitem, never empty
        left_nbytes=table_nbytes(sf_dir, "orders"),
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    return (
        joined.map_batches(
            remote_fn(_QX, "sole_return_filter"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_suppkey")
        .aggregate(Sum("n", alias_name="n_orders"))
        .map_batches(
            remote_fn(_QX, "sole_names", names_ref=names_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# --- idle_rich_customers -----------------------------------------------------


def order_epoch_project(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "ep": batch["o_orderdate"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
        }
    )


def cust_cents_project(batch: pa.Table) -> pa.Table:
    cents = pc.cast(
        pc.floor(pc.add(pc.multiply(batch["c_acctbal"], 100.0), 0.5)),
        pa.int64(),
    )
    return pa.table(
        {
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "c_nationkey": batch["c_nationkey"].cast(pa.int64()),
            "cents": cents,
        }
    )


def pos_balance_partial(batch: pa.Table) -> pa.Table:
    """(cents) -> single-row (tot_pos, n_pos) partial."""
    pos = batch.filter(pc.greater(batch["cents"], 0))
    return pa.table(
        {
            "k": pa.array([0], pa.int64()),
            "tot_pos": pa.array(
                [int(pc.sum(pos["cents"]).as_py() or 0)], pa.int64()
            ),
            "n_pos": pa.array([pos.num_rows], pa.int64()),
        }
    )


def idle_rich_rollup(batch: pa.Table, tot_pos: int, n_pos: int) -> pa.Table:
    """anti-joined customers -> per-nation (n, cents) partials for the
    above-average rows (exact cross-multiplied compare)."""
    cents = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pa.array(cents * n_pos > tot_pos)
    t = batch.filter(keep).select(["c_nationkey", "cents"])
    g = t.group_by("c_nationkey").aggregate(
        [([], "count_all"), ("cents", "sum")]
    )
    g = select_rename(
        g, c_nationkey="c_nationkey", n="count_all", cents="cents_sum"
    )
    return pa.table(
        {
            "c_nationkey": g["c_nationkey"],
            "n": g["n"].cast(pa.int64()),
            "cents": g["cents"].cast(pa.int64()),
        }
    )


def idle_rich_names(batch: pa.Table, nation_name: dict) -> pa.Table:
    nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "nation": pa.array(
                [nation_name[int(k)] for k in nk], pa.string()
            ),
            "n_customers": batch["n_customers"].cast(pa.int64()),
            "total_cents": batch["total_cents"].cast(pa.int64()),
        }
    )


IDLE_DAYS = 365
DAY_US = 86_400_000_000


def recent_order_keys(batch: pa.Table, cutoff_us: int) -> pa.Table:
    """orders batch -> custkeys with an order strictly after cutoff."""
    ep = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
    t = pa.table(
        {"o_custkey": batch["o_custkey"].cast(pa.int64()), "ep": ep}
    ).filter(pc.greater(ep, cutoff_us))
    g = t.select(["o_custkey"]).group_by("o_custkey").aggregate([])
    return g


def q_idle_rich_customers(sf_dir: str) -> "object":
    """(nation, n_customers, total_cents)."""
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..io import table_nbytes
    from ..joins import safe_join
    from .queries import _t

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    nation_name = {
        int(k): str(v)
        for k, v in zip(
            nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()
        )
    }
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    max_us = int(
        orders.map_batches(
            remote_fn(_QX, "order_epoch_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).max("ep")
    )
    cutoff_us = max_us - IDLE_DAYS * DAY_US
    recent = orders.map_batches(
        remote_fn(_QX, "recent_order_keys", cutoff_us=cutoff_us),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = (
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(
            remote_fn(_QX, "cust_cents_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # reused: scalar pass + anti join
    )
    scal = (
        cust.map_batches(
            remote_fn(_QX, "pos_balance_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("k")
        .aggregate(
            Sum("tot_pos", alias_name="tot_pos"),
            Sum("n_pos", alias_name="n_pos"),
        )
        .take_all()  # exactly one row
    )
    tot_pos, n_pos = int(scal[0]["tot_pos"]), int(scal[0]["n_pos"])
    idle = safe_join(
        cust,
        recent,
        on=("c_custkey",),
        right_on=("o_custkey",),
        join_type="left_anti",
        assume_non_empty=True,  # the max-date order itself is recent
        left_nbytes=table_nbytes(sf_dir, "customer"),
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    return (
        idle.map_batches(
            remote_fn(_QX, "idle_rich_rollup", tot_pos=tot_pos, n_pos=n_pos),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("c_nationkey")
        .aggregate(
            Sum("n", alias_name="n_customers"),
            Sum("cents", alias_name="total_cents"),
        )
        .map_batches(
            remote_fn(_QX, "idle_rich_names", nation_name=nation_name),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_PART_BEST_SUPPLIER = f"""
WITH u AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(((l_extendedprice * (1 - l_discount)) / l_quantity)
                    * 100 + 0.5) AS BIGINT) AS unit_cents
  FROM lineitem),
m AS (
  SELECT l_partkey,
         min(unit_cents * {SUPP_PACK} + l_suppkey) AS packed
  FROM u GROUP BY l_partkey)
SELECT m.l_partkey AS p_partkey, p.p_brand,
       CAST(m.packed % {SUPP_PACK} AS BIGINT) AS s_suppkey, s.s_name,
       CAST(m.packed // {SUPP_PACK} AS BIGINT) AS unit_cents
FROM m
JOIN part p ON p.p_partkey = m.l_partkey
JOIN supplier s ON s.s_suppkey = m.packed % {SUPP_PACK}
"""

SQL_SOLE_RETURN_SUPPLIERS = """
WITH ps AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
os AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(has_r) AS BIGINT) AS r_supp
  FROM ps GROUP BY l_orderkey)
SELECT ps.l_suppkey AS s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS n_orders
FROM ps
JOIN os ON os.l_orderkey = ps.l_orderkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE os.n_supp >= 2 AND ps.has_r = 1 AND os.r_supp = 1
GROUP BY ps.l_suppkey, s.s_name
"""

SQL_IDLE_RICH_CUSTOMERS = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer),
s AS (
  SELECT CAST(sum(cents) AS BIGINT) AS tot_pos,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM c WHERE cents > 0),
mx AS (SELECT max(epoch_us(o_orderdate)) AS max_us FROM orders)
SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(c.cents) AS BIGINT) AS total_cents
FROM c CROSS JOIN s CROSS JOIN mx
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.cents * s.n_pos > s.tot_pos
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND epoch_us(o.o_orderdate) > mx.max_us - {IDLE_DAYS} * {DAY_US})
GROUP BY n.n_name
"""

RELX_QUERIES = {
    "part_best_supplier": q_part_best_supplier,
    "sole_return_suppliers": q_sole_return_suppliers,
    "idle_rich_customers": q_idle_rich_customers,
}
RELX_ORACLES = {
    "part_best_supplier": SQL_PART_BEST_SUPPLIER,
    "sole_return_suppliers": SQL_SOLE_RETURN_SUPPLIERS,
    "idle_rich_customers": SQL_IDLE_RICH_CUSTOMERS,
}
