"""Market-share and promo-ratio rollups (TPC-H Q8/Q14 flavored).

``market_share_yearly`` — Q8 rewrite: for lineitems of one part type
(``SHARE_PART_TYPE``), per order year, the revenue supplied by one
nation's suppliers (``SHARE_NATION``) as an exact integer permille of
total revenue. Revenue = discounted extended price in int64 cents (the
corpus money convention — floor(x*100 + 0.5) per row, never a float
accumulation).

``promo_ratio_monthly`` — Q14 rewrite over ``l_shipdate``: per ship
month (yyyymm int), promo-part revenue as an exact permille of total
revenue. No orders join at all — the month rides the lineitem row.

Plan / 100 TB notes: part-type membership and supplier->nation are
DIMENSION lookups and ride broadcast (sorted-key binary search /
vocabulary-sized dict decode — never a shuffle join against the fact
table). Q8 pre-aggregates lineitem to (l_orderkey, cents, nat_cents)
cells map-side so the single real join (orders, for the year) moves
order-cardinality cells, streamed via safe_join's byte-sized path.
Q14 is map-only + a |months|-cardinality exchange. Permille division
happens once per output row on already-summed int64 cents.

Oracles: static SQL — the same join tree / CASE arithmetic with
per-row floor(x*100 + 0.5) cents and integer ``//`` permille.

Reference analogue: /root/reference/app.py has no relational surface;
brief scope (SURVEY.md §2.4 join-strategy coverage at depth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QM = "khl_pdf_ocr_ray.pipelines.queries_mktshare"

SHARE_PART_TYPE = "STANDARD"
SHARE_NATION = "NATION_0"
PROMO_PART_TYPE = "PROMO"


def _line_cents(batch: pa.Table) -> pa.ChunkedArray:
    """Per-row discounted revenue in int64 cents (corpus convention)."""
    disc = pc.multiply(
        batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
    )
    return pc.cast(pc.floor(pc.add(pc.multiply(disc, 100.0), 0.5)), pa.int64())


def _member_mask(keys: pa.ChunkedArray, member_keys: list) -> np.ndarray:
    """Membership of int64 keys in a broadcast sorted key list via
    binary search (dimension-sized, never per-row Python)."""
    k = keys.to_numpy(zero_copy_only=False).astype(np.int64)
    mk = np.asarray(member_keys, dtype=np.int64)
    if len(mk) == 0:
        return np.zeros(len(k), dtype=bool)
    pos = np.minimum(np.searchsorted(mk, k), len(mk) - 1)
    return mk[pos] == k


def share_cells(
    batch: pa.Table, part_keys: list, supp_nation: dict, target_nat: int
) -> pa.Table:
    """lineitem batch -> (l_orderkey, cents, nat_cents) per-order cells
    for SHARE_PART_TYPE lines; supplier nation via broadcast dict."""
    keep = _member_mask(batch["l_partkey"], part_keys)
    b = batch.filter(pa.array(keep))
    if b.num_rows == 0:
        return pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "nat_cents": pa.array([], pa.int64()),
            }
        )
    cents = _line_cents(b)
    sk = b["l_suppkey"].cast(pa.int64())
    enc = pc.dictionary_encode(
        sk.combine_chunks() if isinstance(sk, pa.ChunkedArray) else sk
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nmap = np.array(
        [supp_nation[int(v)] for v in enc.dictionary.to_pylist()],
        dtype=np.int64,
    )
    is_nat = nmap[codes] == target_nat
    cn = cents.to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table(
        {
            "l_orderkey": b["l_orderkey"].cast(pa.int64()),
            "cents": pa.array(cn, pa.int64()),
            "nat_cents": pa.array(np.where(is_nat, cn, 0), pa.int64()),
        }
    )
    g = t.group_by("l_orderkey").aggregate(
        [("cents", "sum"), ("nat_cents", "sum")]
    )
    return select_rename(
        g, l_orderkey="l_orderkey", cents="cents_sum", nat_cents="nat_cents_sum"
    )


def share_year_partial(batch: pa.Table) -> pa.Table:
    """order-joined cells -> per-year (cents, nat_cents) partials."""
    yr = pc.year(batch["o_orderdate"].cast(pa.timestamp("us"))).cast(pa.int64())
    t = pa.table(
        {
            "o_year": yr,
            "cents": batch["cents"].cast(pa.int64()),
            "nat_cents": batch["nat_cents"].cast(pa.int64()),
        }
    )
    g = t.group_by("o_year").aggregate(
        [("cents", "sum"), ("nat_cents", "sum")]
    )
    return select_rename(
        g, o_year="o_year", cents="cents_sum", nat_cents="nat_cents_sum"
    )


def share_finalize(batch: pa.Table) -> pa.Table:
    """summed per-year rows -> permille share (int64 floor division)."""
    tot = batch["total_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    nat = batch["nation_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (tot > 0).all(), "year rows exist only where lines exist"
    return pa.table(
        {
            "o_year": batch["o_year"].cast(pa.int64()),
            "nation_cents": pa.array(nat, pa.int64()),
            "total_cents": pa.array(tot, pa.int64()),
            "share_permille": pa.array(1000 * nat // tot, pa.int64()),
        }
    )


def q_market_share_yearly(sf_dir: str) -> "object":
    """(o_year, nation_cents, total_cents, share_permille)."""
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..io import table_nbytes
    from ..joins import safe_join
    from .queries import _t

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    part_keys = sorted(
        int(k)
        for k, t in zip(part["p_partkey"].to_pylist(), part["p_type"].to_pylist())
        if t == SHARE_PART_TYPE
    )
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
    target = next(
        int(k)
        for k, v in zip(
            nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()
        )
        if str(v) == SHARE_NATION
    )
    cells = (
        _t(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(
            remote_fn(
                _QM,
                "share_cells",
                part_keys=part_keys,
                supp_nation=supp_nation,
                target_nat=target,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_orderkey")
        .aggregate(
            Sum("cents", alias_name="cents"),
            Sum("nat_cents", alias_name="nat_cents"),
        )
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = safe_join(
        cells,
        orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        assume_non_empty=True,  # lineitem/orders never empty
        left_nbytes=table_nbytes(sf_dir, "orders"),
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    return (
        joined.map_batches(
            remote_fn(_QM, "share_year_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("o_year")
        .aggregate(
            Sum("cents", alias_name="total_cents"),
            Sum("nat_cents", alias_name="nation_cents"),
        )
        .map_batches(
            remote_fn(_QM, "share_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def promo_month_partial(batch: pa.Table, promo_keys: list) -> pa.Table:
    """lineitem batch -> per-month (cents, promo_cents) partials."""
    cents = _line_cents(batch).to_numpy(zero_copy_only=False).astype(np.int64)
    promo = _member_mask(batch["l_partkey"], promo_keys)
    ship = batch["l_shipdate"].cast(pa.timestamp("us"))
    ym = pc.add(
        pc.multiply(pc.year(ship).cast(pa.int64()), 100),
        pc.month(ship).cast(pa.int64()),
    )
    t = pa.table(
        {
            "ship_month": ym,
            "cents": pa.array(cents, pa.int64()),
            "promo_cents": pa.array(np.where(promo, cents, 0), pa.int64()),
        }
    )
    g = t.group_by("ship_month").aggregate(
        [("cents", "sum"), ("promo_cents", "sum")]
    )
    return select_rename(
        g,
        ship_month="ship_month",
        cents="cents_sum",
        promo_cents="promo_cents_sum",
    )


def promo_finalize(batch: pa.Table) -> pa.Table:
    tot = batch["total_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    pr = batch["promo_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (tot > 0).all(), "month rows exist only where lines exist"
    return pa.table(
        {
            "ship_month": batch["ship_month"].cast(pa.int64()),
            "promo_cents": pa.array(pr, pa.int64()),
            "total_cents": pa.array(tot, pa.int64()),
            "promo_permille": pa.array(1000 * pr // tot, pa.int64()),
        }
    )


def q_promo_ratio_monthly(sf_dir: str) -> "object":
    """(ship_month, promo_cents, total_cents, promo_permille)."""
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from .queries import _t

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    promo_keys = sorted(
        int(k)
        for k, t in zip(part["p_partkey"].to_pylist(), part["p_type"].to_pylist())
        if t == PROMO_PART_TYPE
    )
    return (
        _t(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(
            remote_fn(_QM, "promo_month_partial", promo_keys=promo_keys),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("ship_month")
        .aggregate(
            Sum("cents", alias_name="total_cents"),
            Sum("promo_cents", alias_name="promo_cents"),
        )
        .map_batches(
            remote_fn(_QM, "promo_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_MARKET_SHARE_YEARLY = f"""
WITH tn AS (
  SELECT n_nationkey FROM nation WHERE n_name = '{SHARE_NATION}'),
l AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cents,
         CASE WHEN s.s_nationkey = tn.n_nationkey THEN 1 ELSE 0 END AS is_nat
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
   AND p.p_type = '{SHARE_PART_TYPE}'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  CROSS JOIN tn)
SELECT o_year,
       CAST(sum(cents * is_nat) AS BIGINT) AS nation_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(1000 * sum(cents * is_nat) // sum(cents) AS BIGINT)
         AS share_permille
FROM l GROUP BY o_year
"""

SQL_PROMO_RATIO_MONTHLY = f"""
WITH l AS (
  SELECT CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate) AS BIGINT)
           AS ship_month,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cents,
         CASE WHEN p.p_type = '{PROMO_PART_TYPE}' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey)
SELECT ship_month,
       CAST(sum(cents * is_promo) AS BIGINT) AS promo_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(1000 * sum(cents * is_promo) // sum(cents) AS BIGINT)
         AS promo_permille
FROM l GROUP BY ship_month
"""

MKTSHARE_QUERIES = {
    "market_share_yearly": q_market_share_yearly,
    "promo_ratio_monthly": q_promo_ratio_monthly,
}
MKTSHARE_ORACLES = {
    "market_share_yearly": SQL_MARKET_SHARE_YEARLY,
    "promo_ratio_monthly": SQL_PROMO_RATIO_MONTHLY,
}
