"""Scalar-subquery relational patterns II: per-group-average compare,
global-argmax window, disjunctive predicate pushdown.

Three more TPC-H-spec shapes (Q17 / Q15 / Q19 flavored) rewritten into
the forms a distributed engine actually runs:

``small_qty_revenue`` (Q17-flavored): revenue sitting in lineitem rows
whose quantity is below 20% of that part's average quantity, rolled up
per brand. The correlated scalar subquery (per-part AVG) disappears:
lineitem pre-aggregates map-side to (partkey, qty) CELLS (qty is an
integer 1..50, so <= 50 cells per part — a >= 50x payload reduction
before the only exchange), and one ``groupby(partkey).map_groups``
computes the part's (sum_qty, n) from its own cells and filters them —
NO join anywhere. The 0.2 * avg compare is exact integer
cross-multiplication: ``qty * 5 * n < sum_qty``.

``top_window_suppliers`` (Q15-flavored): the supplier(s) with maximum
revenue in a 90-day shipdate window, ties kept. The window derives
from min(l_shipdate) (+180d..+270d) so it is populated at every scale
(the q_idle_rich_customers cutoff convention). The view + scalar MAX
subquery becomes: map-side per-supplier cent partials -> ONE
supplier-cardinality Sum exchange -> the rollup (dimension-sized) is
materialized once and reused for the driver-scalar global Max and the
equality filter.

``promo_revenue_disjunct`` (Q19-flavored): revenue under a disjunction
of (brand, size-range, qty-range) arms. The part side is a DIMENSION:
it rides a ray.put broadcast map (partkey -> (brand, size)); the OR-of-
ANDs is evaluated vectorized per batch and only (arm, cents) partials
leave the scan — the classic predicate-pushdown shape with zero
shuffle beyond a <= 3-row aggregate.

Exactness: cents are floor(x * 100 + 0.5) per ROW before any sum; the
float expression ``ext * (1 - disc) * 100`` is written in the same
association order on both sides so IEEE doubles agree bit-for-bit
(the queries_relx convention).

Reference analogue: /root/reference/app.py has no relational surface;
brief scope (SURVEY.md §2.4 relational coverage at depth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QX2 = "khl_pdf_ocr_ray.pipelines.queries_relx2"

DAY_US = 86_400_000_000
WIN_LO_DAYS = 180  # window start offset from min(l_shipdate)
WIN_HI_DAYS = 270  # window end (exclusive)

# Q19-flavored disjunction arms: (brand, size_lo, size_hi, qty_lo, qty_hi)
PROMO_ARMS = (
    ("Brand#3", 1, 15, 1, 11),
    ("Brand#12", 10, 30, 10, 20),
    ("Brand#23", 25, 50, 20, 30),
)


def _row_cents(batch: pa.Table) -> np.ndarray:
    """floor(ext * (1 - disc) * 100 + 0.5) per row — the shared cents
    kernel; association order matches the SQL text exactly."""
    x = pc.multiply(
        pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        ),
        100.0,
    )
    return (
        pc.cast(pc.floor(pc.add(x, 0.5)), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


# --- small_qty_revenue (Q17) -------------------------------------------------


def qty_cell_partial(batch: pa.Table) -> pa.Table:
    """lineitem batch -> (l_partkey, qty, n_lines, rev_cents) cells."""
    t = pa.table(
        {
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "qty": pc.cast(batch["l_quantity"], pa.int64()),
            "rev": pa.array(_row_cents(batch), pa.int64()),
        }
    )
    g = t.group_by(["l_partkey", "qty"]).aggregate(
        [([], "count_all"), ("rev", "sum")]
    )
    g = select_rename(
        g, l_partkey="l_partkey", qty="qty", n_lines="count_all", rev_cents="rev_sum"
    )
    return pa.table(
        {
            "l_partkey": g["l_partkey"],
            "qty": g["qty"],
            "n_lines": g["n_lines"].cast(pa.int64()),
            "rev_cents": g["rev_cents"].cast(pa.int64()),
        }
    )


def small_qty_fold(group: pa.Table) -> pa.Table:
    """One part's cells -> its below-20%-of-avg rollup (exact integers:
    keep cells with qty * 5 * n < sum_qty). Groups are <= 50 cells per
    source block, re-merged here."""
    qty = group["qty"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = group["n_lines"].to_numpy(zero_copy_only=False).astype(np.int64)
    rev = group["rev_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    sum_qty = int((qty * n).sum())
    n_tot = int(n.sum())
    keep = qty * 5 * n_tot < sum_qty
    if not keep.any():
        return pa.table(
            {
                "l_partkey": pa.array([], pa.int64()),
                "n_small": pa.array([], pa.int64()),
                "rev_small": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "l_partkey": pa.array([int(group["l_partkey"][0].as_py())], pa.int64()),
            "n_small": pa.array([int(n[keep].sum())], pa.int64()),
            "rev_small": pa.array([int(rev[keep].sum())], pa.int64()),
        }
    )


def brand_tag(batch: pa.Table, brand_ref) -> pa.Table:
    import ray as _ray

    brand = _ray.get(brand_ref)
    pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "p_brand": pa.array([brand[int(k)] for k in pk], pa.string()),
            "n_small": batch["n_small"],
            "rev_small": batch["rev_small"],
        }
    )


def q_small_qty_revenue(sf_dir: str) -> "object":
    """(p_brand, n_small_lines, rev_cents) — revenue in below-20%-of-
    part-average-quantity lines, per brand."""
    import os

    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from .queries import _t

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    brand_ref = ray.put(
        {
            int(k): str(v)
            for k, v in zip(
                part["p_partkey"].to_pylist(), part["p_brand"].to_pylist()
            )
        }
    )
    cells = _t(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        remote_fn(_QX2, "qty_cell_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    per_part = cells.groupby("l_partkey").map_groups(
        remote_fn(_QX2, "small_qty_fold"), batch_format="pyarrow"
    )
    out = (
        per_part.map_batches(
            remote_fn(_QX2, "brand_tag", brand_ref=brand_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("p_brand")
        .aggregate(
            Sum("n_small", alias_name="n_small_lines"),
            Sum("rev_small", alias_name="rev_cents"),
        )
    )
    return out


# --- top_window_suppliers (Q15) ----------------------------------------------


def window_rev_partial(batch: pa.Table, lo_us: int, hi_us: int) -> pa.Table:
    """lineitem batch -> per-supplier window-revenue cent partials."""
    ts = pc.cast(batch["l_shipdate"], pa.int64())
    keep = pc.and_(pc.greater_equal(ts, lo_us), pc.less(ts, hi_us))
    b = batch.filter(keep)
    if b.num_rows == 0:
        return pa.table(
            {
                "l_suppkey": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
    t = pa.table(
        {
            "l_suppkey": b["l_suppkey"].cast(pa.int64()),
            "rev": pa.array(_row_cents(b), pa.int64()),
        }
    )
    g = t.group_by("l_suppkey").aggregate([("rev", "sum")])
    g = select_rename(g, l_suppkey="l_suppkey", rev="rev_sum")
    return g.set_column(1, "rev", g["rev"].cast(pa.int64()))


def top_supp_names(batch: pa.Table, names_ref) -> pa.Table:
    import ray as _ray

    s_name = _ray.get(names_ref)
    sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "s_suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array([s_name[int(k)] for k in sk], pa.string()),
            "rev_cents": batch["rev_cents"].cast(pa.int64()),
        }
    )


def q_top_window_suppliers(sf_dir: str) -> "object":
    """(s_suppkey, s_name, rev_cents) — max-revenue supplier(s) in the
    +180d..+270d shipdate window, ties kept."""
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Max, Sum

    from .queries import _t

    # window bounds: one pruned-column scan for min(l_shipdate) — a
    # driver SCALAR, not data (the idle_rich_customers cutoff convention)
    ship = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_shipdate"]
    )
    lo0 = pc_.min(ship["l_shipdate"]).cast(pa.int64()).as_py()
    lo_us = lo0 + WIN_LO_DAYS * DAY_US
    hi_us = lo0 + WIN_HI_DAYS * DAY_US

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
    rollup = (
        _t(
            sf_dir,
            "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(
            remote_fn(_QX2, "window_rev_partial", lo_us=lo_us, hi_us=hi_us),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_suppkey")
        .aggregate(Sum("rev", alias_name="rev_cents"))
        .materialize()  # supplier-cardinality (dimension-sized); reused
        # twice: global-max scalar + equality filter
    )
    best = rollup.aggregate(Max("rev_cents"))["max(rev_cents)"]
    return rollup.filter(
        expr=f"rev_cents == {int(best)}"
    ).map_batches(
        remote_fn(_QX2, "top_supp_names", names_ref=names_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --- promo_revenue_disjunct (Q19) --------------------------------------------


def promo_arm_partial(batch: pa.Table, dims_ref) -> pa.Table:
    """lineitem batch -> (arm, n_lines, rev_cents) partials under the
    OR-of-ANDs; the part dimension comes in via broadcast."""
    import ray as _ray

    brand_arr, size_arr = _ray.get(dims_ref)
    pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    qty = (
        pc.cast(batch["l_quantity"], pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    cents = _row_cents(batch)
    brands = brand_arr[pk]
    sizes = size_arr[pk]
    rows = {"arm": [], "n_lines": [], "rev_cents": []}
    for arm_id, (brand, slo, shi, qlo, qhi) in enumerate(PROMO_ARMS):
        m = (
            (brands == brand)
            & (sizes >= slo)
            & (sizes <= shi)
            & (qty >= qlo)
            & (qty <= qhi)
        )
        if m.any():
            rows["arm"].append(arm_id)
            rows["n_lines"].append(int(m.sum()))
            rows["rev_cents"].append(int(cents[m].sum()))
    return pa.table(
        {
            "arm": pa.array(rows["arm"], pa.int64()),
            "n_lines": pa.array(rows["n_lines"], pa.int64()),
            "rev_cents": pa.array(rows["rev_cents"], pa.int64()),
        }
    )


def q_promo_revenue_disjunct(sf_dir: str) -> "object":
    """(arm, n_lines, rev_cents) — one row per disjunction arm."""
    import os

    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from .queries import _t

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    pk = np.asarray(part["p_partkey"].to_pylist(), dtype=np.int64)
    n = int(pk.max()) + 1
    brand_arr = np.empty(n, dtype=object)
    size_arr = np.zeros(n, dtype=np.int64)
    brand_arr[pk] = np.asarray(part["p_brand"].to_pylist(), dtype=object)
    size_arr[pk] = np.asarray(part["p_size"].to_pylist(), dtype=np.int64)
    dims_ref = ray.put((brand_arr, size_arr))
    return (
        _t(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(
            remote_fn(_QX2, "promo_arm_partial", dims_ref=dims_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("arm")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("rev_cents", alias_name="rev_cents"),
        )
    )


# --- oracles -----------------------------------------------------------------

SQL_SMALL_QTY_REVENUE = """
WITH cells AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1, 2),
stats AS (
  SELECT l_partkey, CAST(sum(qty * n_lines) AS BIGINT) AS sum_qty,
         CAST(sum(n_lines) AS BIGINT) AS n_tot
  FROM cells GROUP BY 1)
SELECT p.p_brand, CAST(sum(c.n_lines) AS BIGINT) AS n_small_lines,
       CAST(sum(c.rev_cents) AS BIGINT) AS rev_cents
FROM cells c
JOIN stats s ON s.l_partkey = c.l_partkey
JOIN part p ON p.p_partkey = c.l_partkey
WHERE c.qty * 5 * s.n_tot < s.sum_qty
GROUP BY 1
"""

SQL_TOP_WINDOW_SUPPLIERS = f"""
WITH mn AS (SELECT min(epoch_us(l_shipdate)) AS lo FROM lineitem),
r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem CROSS JOIN mn
  WHERE epoch_us(l_shipdate) >= mn.lo + {WIN_LO_DAYS} * {DAY_US}
    AND epoch_us(l_shipdate) <  mn.lo + {WIN_HI_DAYS} * {DAY_US}
  GROUP BY 1)
SELECT r.l_suppkey AS s_suppkey, s.s_name, r.rev_cents
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_cents = (SELECT max(rev_cents) FROM r)
"""

_ARM_SQL = " UNION ALL ".join(
    f"""
SELECT {arm_id} AS arm, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{brand}' AND p.p_size BETWEEN {slo} AND {shi}
  AND l.l_quantity BETWEEN {qlo} AND {qhi}
HAVING count(*) > 0
"""
    for arm_id, (brand, slo, shi, qlo, qhi) in enumerate(PROMO_ARMS)
)
SQL_PROMO_REVENUE_DISJUNCT = _ARM_SQL

RELX2_QUERIES = {
    "small_qty_revenue": q_small_qty_revenue,
    "top_window_suppliers": q_top_window_suppliers,
    "promo_revenue_disjunct": q_promo_revenue_disjunct,
}
RELX2_ORACLES = {
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "top_window_suppliers": SQL_TOP_WINDOW_SUPPLIERS,
    "promo_revenue_disjunct": SQL_PROMO_REVENUE_DISJUNCT,
}
