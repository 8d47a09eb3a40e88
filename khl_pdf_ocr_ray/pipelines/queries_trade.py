"""Deep relational rollups: the 5-table trade matrix and RFM segments.

``nation_trade_matrix`` — TPC-H Q7-flavored: revenue (discounted
extended price, integer cents) between every (customer nation,
supplier nation) pair, through lineitem -> orders -> customer and
lineitem -> supplier -> nation. The deepest join tree in the registry;
exercises the broadcast-vs-hash strategy split end to end.

``customer_rfm_segments`` — classic RFM marketing segmentation: bucket
every customer by Recency (days from last order to the corpus' newest
order), Frequency (order count) and Monetary (lifetime cents), then
count customers per (r, f, m) cell. Thresholds sit inside the
synthetic corpus' live range (orders/cust 1-25 median 10, spend
0.06M-6.2M$ median 2.5M$, last-order span 1996-2001 at sf0.01) so
every axis is populated at every test scale; real deployments re-tune
per book — the doc_tiers threshold convention.

Plan / 100 TB notes (trade matrix): per-row cents conversion FIRST
(the corpus money convention — int64 cents ride every exchange, no
float accumulation anywhere); supplier->nation and nation->name ride
BROADCAST lookups (dimension tables, the supplier_enrich class);
lineitem pre-aggregates to (l_orderkey, supp_nation) cells map-side
BEFORE the orders join (the exchange moves |orders| x |nations| rows,
not |lineitem|); the two real joins (orders, customer) run safe_join's
STREAMING path with byte-sized partitions. RFM: ONE per-customer
combiner-backed aggregate (Max date / Count / Sum cents), a driver
scalar for the corpus max date, a map-only bucket pass, a 27-cell
rollup.

Oracles: static SQL — the same join tree / CASE buckets with per-row
floor(x*100 + 0.5) cents.

Reference analogue: /root/reference/app.py has no relational surface;
brief scope (§2.4 join-strategy coverage at depth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QT = "khl_pdf_ocr_ray.pipelines.queries_trade"

DAY_US = 86_400_000_000
# RFM bucket thresholds (bucket 0 = best)
RFM_R_DAYS = (180, 540)          # recency: <=180d, <=540d, else
RFM_F_ORDERS = (13, 7)           # frequency: >=13, >=7, else
RFM_M_CENTS = (300_000_000, 150_000_000)  # monetary: >=3.0M$, >=1.5M$


def line_supp_cells(batch: pa.Table, supp_nation: dict) -> pa.Table:
    """lineitem batch -> (l_orderkey, supp_nation, cents, n) partials.
    Per-row cents FIRST, broadcast supplier->nationkey lookup via
    vocabulary-sized dictionary decode (never per-row Python)."""
    disc = pc.multiply(
        batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
    )
    cents = pc.cast(
        pc.floor(pc.add(pc.multiply(disc, 100.0), 0.5)), pa.int64()
    )
    sk = batch["l_suppkey"].cast(pa.int64())
    enc = pc.dictionary_encode(
        sk.combine_chunks() if isinstance(sk, pa.ChunkedArray) else sk
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nmap = np.array(
        [supp_nation[int(v)] for v in enc.dictionary.to_pylist()],
        dtype=np.int64,
    )
    t = pa.table(
        {
            "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
            "supp_nation": pa.array(nmap[codes], pa.int64()),
            "cents": cents,
        }
    )
    g = t.group_by(["l_orderkey", "supp_nation"]).aggregate(
        [("cents", "sum"), ([], "count_all")]
    )
    g = select_rename(
        g,
        l_orderkey="l_orderkey",
        supp_nation="supp_nation",
        cents="cents_sum",
        n="count_all",
    )
    return g.set_column(3, "n", g["n"].cast(pa.int64()))


def cust_cells(batch: pa.Table) -> pa.Table:
    """joined batch -> (c_nationkey, supp_nation, cents, n) partials."""
    t = batch.select(["c_nationkey", "supp_nation", "cents", "n"])
    g = t.group_by(["c_nationkey", "supp_nation"]).aggregate(
        [("cents", "sum"), ("n", "sum")]
    )
    return select_rename(
        g,
        c_nationkey="c_nationkey",
        supp_nation="supp_nation",
        cents="cents_sum",
        n="n_sum",
    )


def trade_names(batch: pa.Table, nation_name: dict) -> pa.Table:
    """(c_nationkey, supp_nation) keys -> names via the broadcast tiny
    nation map."""
    ck = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(int)
    sk = batch["supp_nation"].to_numpy(zero_copy_only=False).astype(int)
    return pa.table(
        {
            "cust_nation": pa.array(
                [nation_name[int(k)] for k in ck], pa.string()
            ),
            "supp_nation": pa.array(
                [nation_name[int(k)] for k in sk], pa.string()
            ),
            "revenue_cents": batch["revenue_cents"].cast(pa.int64()),
            "n_lines": batch["n_lines"].cast(pa.int64()),
        }
    )


def q_nation_trade_matrix(sf_dir: str) -> "object":
    """(cust_nation, supp_nation, revenue_cents, n_lines)."""
    import pyarrow.parquet as pq
    import os

    from ray.data.aggregate import Sum

    from ..io import table_nbytes
    from ..joins import safe_join
    from .queries import _t

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    supp_nation = {
        int(k): int(v)
        for k, v in zip(
            supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()
        )
    }
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
    cells = (
        _t(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(
            remote_fn(_QT, "line_supp_cells", supp_nation=supp_nation),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["l_orderkey", "supp_nation"])
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    with_cust = safe_join(
        cells,
        orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        assume_non_empty=True,  # lineitem/orders never empty
        left_nbytes=table_nbytes(sf_dir, "orders"),
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    enriched = safe_join(
        with_cust.map_batches(
            remote_fn(_QT, "cust_cells_pre"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        cust,
        on=("o_custkey",),
        right_on=("c_custkey",),
        assume_non_empty=True,  # orders/customer never empty
        left_nbytes=table_nbytes(sf_dir, "customer"),
        right_nbytes=table_nbytes(sf_dir, "customer"),
    )
    return (
        enriched.map_batches(
            remote_fn(_QT, "cust_cells"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["c_nationkey", "supp_nation"])
        .aggregate(
            Sum("cents", alias_name="revenue_cents"),
            Sum("n", alias_name="n_lines"),
        )
        .map_batches(
            remote_fn(_QT, "trade_names", nation_name=nation_name),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def cust_cells_pre(batch: pa.Table) -> pa.Table:
    """Pre-aggregate the order-joined cells to (o_custkey, supp_nation)
    before the customer join — the shuffle moves customer-cardinality
    cells, not order-cardinality ones."""
    t = batch.select(["o_custkey", "supp_nation", "cents", "n"])
    g = t.group_by(["o_custkey", "supp_nation"]).aggregate(
        [("cents", "sum"), ("n", "sum")]
    )
    return select_rename(
        g,
        o_custkey="o_custkey",
        supp_nation="supp_nation",
        cents="cents_sum",
        n="n_sum",
    )


def rfm_partial(batch: pa.Table) -> pa.Table:
    """orders batch -> per-customer (last_us, n, cents) partials."""
    cents = pc.cast(
        pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
        pa.int64(),
    )
    t = pa.table(
        {
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "last_us": batch["o_orderdate"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "cents": cents,
        }
    )
    g = t.group_by("o_custkey").aggregate(
        [("last_us", "max"), ("cents", "sum"), ([], "count_all")]
    )
    g = select_rename(
        g,
        o_custkey="o_custkey",
        last_us="last_us_max",
        cents="cents_sum",
        n="count_all",
    )
    return g.set_column(3, "n", g["n"].cast(pa.int64()))


def rfm_bucket(batch: pa.Table, max_us: int) -> pa.Table:
    """per-customer rows -> (r_bucket, f_bucket, m_bucket, n) partials."""
    last = batch["last_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    days = (max_us - last) // DAY_US
    r = np.full(len(n), 2, dtype=np.int64)
    r[days <= RFM_R_DAYS[1]] = 1
    r[days <= RFM_R_DAYS[0]] = 0
    f = np.full(len(n), 2, dtype=np.int64)
    f[n >= RFM_F_ORDERS[1]] = 1
    f[n >= RFM_F_ORDERS[0]] = 0
    m = np.full(len(n), 2, dtype=np.int64)
    m[cents >= RFM_M_CENTS[1]] = 1
    m[cents >= RFM_M_CENTS[0]] = 0
    t = pa.table(
        {
            "r_bucket": pa.array(r, pa.int64()),
            "f_bucket": pa.array(f, pa.int64()),
            "m_bucket": pa.array(m, pa.int64()),
        }
    )
    g = t.group_by(["r_bucket", "f_bucket", "m_bucket"]).aggregate(
        [([], "count_all")]
    )
    g = select_rename(
        g,
        r_bucket="r_bucket",
        f_bucket="f_bucket",
        m_bucket="m_bucket",
        n_customers="count_all",
    )
    return g.set_column(3, "n_customers", g["n_customers"].cast(pa.int64()))


def q_customer_rfm_segments(sf_dir: str) -> "object":
    """(r_bucket, f_bucket, m_bucket, n_customers)."""
    from ray.data.aggregate import Count, Max, Sum

    from .queries import _t

    per_cust = (
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(
            remote_fn(_QT, "rfm_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("o_custkey")
        .aggregate(
            Max("last_us", alias_name="last_us"),
            Sum("cents", alias_name="cents"),
            Sum("n", alias_name="n"),
        )
        .materialize()  # reused: corpus-max scalar + bucket pass
    )
    max_us = int(per_cust.max("last_us"))
    return (
        per_cust.map_batches(
            remote_fn(_QT, "rfm_bucket", max_us=max_us),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["r_bucket", "f_bucket", "m_bucket"])
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


SQL_NATION_TRADE_MATRIX = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY cn.n_name, sn.n_name
"""

SQL_CUSTOMER_RFM_SEGMENTS = f"""
WITH pc AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate)) AS last_us,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey),
mx AS (SELECT max(last_us) AS max_us FROM pc),
b AS (
  SELECT CAST(CASE
           WHEN (mx.max_us - pc.last_us) // {DAY_US} <= {RFM_R_DAYS[0]}
             THEN 0
           WHEN (mx.max_us - pc.last_us) // {DAY_US} <= {RFM_R_DAYS[1]}
             THEN 1
           ELSE 2 END AS BIGINT) AS r_bucket,
         CAST(CASE WHEN pc.n >= {RFM_F_ORDERS[0]} THEN 0
                   WHEN pc.n >= {RFM_F_ORDERS[1]} THEN 1
                   ELSE 2 END AS BIGINT) AS f_bucket,
         CAST(CASE WHEN pc.cents >= {RFM_M_CENTS[0]} THEN 0
                   WHEN pc.cents >= {RFM_M_CENTS[1]} THEN 1
                   ELSE 2 END AS BIGINT) AS m_bucket
  FROM pc CROSS JOIN mx)
SELECT r_bucket, f_bucket, m_bucket,
       CAST(count(*) AS BIGINT) AS n_customers
FROM b GROUP BY r_bucket, f_bucket, m_bucket
"""

TRADE_QUERIES = {
    "nation_trade_matrix": q_nation_trade_matrix,
    "customer_rfm_segments": q_customer_rfm_segments,
}
TRADE_ORACLES = {
    "nation_trade_matrix": SQL_NATION_TRADE_MATRIX,
    "customer_rfm_segments": SQL_CUSTOMER_RFM_SEGMENTS,
}
