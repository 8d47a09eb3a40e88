"""Declarative data-quality constraint suite (Deequ-style).

``dq_constraints``: evaluate a fixed set of declared expectations over
the corpus tables — referential integrity, domain membership, range,
uniqueness, non-emptiness, fixed vector dimensionality — and emit one
row per constraint: ``(constraint, n_checked, n_violations)``. The
report a pipeline gate reads before promoting a snapshot (Schelter et
al. 2018 "Automating Large-Scale Data Quality Verification").

Plan / 100 TB notes: every table-local constraint is a map-side
counting partial folded by a scalar Sum — constraints on the same
table share ONE scan pass (orders and lineitem kernels return all
their table's partials at once). Referential integrity runs the
certified exact anti-join (customers_anti family) over key-count
cells: the fact side pre-aggregates to (key, n) map-side so the
exchange moves distinct keys, and the violating ROW count is Sum(n)
over anti-surviving keys — never a broadcast of the referenced table
(orders/customer are fact-sized at deployment). Uniqueness = rows
minus distinct keys from the same cell stream. Output is
|constraints| rows assembled at the driver from scalar folds.

Oracle: static SQL — one UNION ALL branch per constraint with the
same NOT IN / range / count(DISTINCT) arithmetic.

Reference analogue: /root/reference/app.py:349-362 validates inputs
per document (error rows); this is the corpus-level generalization
(brief scope: pipeline QC surfaces).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QD = "khl_pdf_ocr_ray.pipelines.queries_dq"

DQ_QTY_LO, DQ_QTY_HI = 1.0, 50.0
DQ_EVENT_DOMAIN = ("click", "error", "purchase", "signup", "view")
DQ_EMBED_DIM = 64


def orders_dq_partial(batch: pa.Table) -> pa.Table:
    """ONE orders scan -> (n, viol_price) counting partial."""
    bad = pc.sum(
        pc.cast(pc.less_equal(batch["o_totalprice"], 0.0), pa.int64())
    ).as_py() or 0
    return pa.table(
        {
            "n": pa.array([batch.num_rows], pa.int64()),
            "viol_price": pa.array([int(bad)], pa.int64()),
        }
    )


def lineitem_dq_partial(batch: pa.Table) -> pa.Table:
    """ONE lineitem scan -> (n, viol_qty) counting partial."""
    q = batch["l_quantity"]
    ok = pc.and_(pc.greater_equal(q, DQ_QTY_LO), pc.less_equal(q, DQ_QTY_HI))
    bad = batch.num_rows - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
    return pa.table(
        {
            "n": pa.array([batch.num_rows], pa.int64()),
            "viol_qty": pa.array([int(bad)], pa.int64()),
        }
    )


def events_dq_partial(batch: pa.Table) -> pa.Table:
    ok = pc.is_in(batch["event_type"], value_set=pa.array(DQ_EVENT_DOMAIN))
    bad = batch.num_rows - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
    return pa.table(
        {
            "n": pa.array([batch.num_rows], pa.int64()),
            "viol_domain": pa.array([int(bad)], pa.int64()),
        }
    )


def documents_dq_partial(batch: pa.Table) -> pa.Table:
    t = batch["text"]
    bad = pc.sum(
        pc.cast(
            pc.or_kleene(pc.is_null(t), pc.equal(t, "")), pa.int64()
        ).fill_null(1)
    ).as_py() or 0
    return pa.table(
        {
            "n": pa.array([batch.num_rows], pa.int64()),
            "viol_text": pa.array([int(bad)], pa.int64()),
        }
    )


def embeddings_dq_partial(batch: pa.Table) -> pa.Table:
    ln = pc.list_value_length(batch["embedding"]).cast(pa.int64())
    bad = batch.num_rows - (
        pc.sum(pc.cast(pc.equal(ln, DQ_EMBED_DIM), pa.int64())).as_py() or 0
    )
    return pa.table(
        {
            "n": pa.array([batch.num_rows], pa.int64()),
            "viol_dim": pa.array([int(bad)], pa.int64()),
        }
    )


def key_cells(batch: pa.Table, key: str) -> pa.Table:
    """fact batch -> (key, n) map-side cells for FK / uniqueness."""
    g = batch.select([key]).group_by(key).aggregate([([], "count_all")])
    g = select_rename(g, **{key: key, "n": "count_all"})
    return g.set_column(1, "n", g["n"].cast(pa.int64()))


def _fk_violations(sf_dir, fact, fact_key, ref, ref_key) -> tuple:
    """(n_checked_rows, violating_rows) for fact.key ⊆ ref.key — exact
    anti-join over key cells (the customers_anti pattern)."""
    from ray.data.aggregate import Sum

    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    cells = (
        _t(sf_dir, fact, [fact_key])
        .map_batches(
            remote_fn(_QD, "key_cells", key=fact_key),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(fact_key)
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # reused: row total + anti-join probe side
    )
    n_rows = int(cells.sum("n") or 0)
    # sizing from the materialized count is FREE here, and collapses tiny
    # inputs to 1 partition (the empty-hash-partition Join wart guard)
    anti = safe_join(
        cells,
        _t(sf_dir, ref, [ref_key]),
        on=(fact_key,),
        right_on=(ref_key,),
        join_type="left_anti",
        assume_non_empty=True,  # base tables never empty
        num_partitions=partitions_for_rows(cells.count()),
    )
    viol = 0 if anti is None else int(anti.sum("n") or 0)
    return n_rows, viol


def q_dq_constraints(sf_dir: str) -> "object":
    """(constraint, n_checked, n_violations) — one row per expectation."""
    from .queries import _t

    def _scan(table, cols, fn):
        ds = _t(sf_dir, table, cols).map_batches(
            remote_fn(_QD, fn),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        df = ds.to_pandas()  # |blocks| counting partials — report-sized
        return {c: int(df[c].sum()) for c in df.columns}

    rows = []
    o = _scan("orders", ["o_totalprice"], "orders_dq_partial")
    rows.append(("orders_totalprice_positive", o["n"], o["viol_price"]))
    li = _scan("lineitem", ["l_quantity"], "lineitem_dq_partial")
    rows.append(("lineitem_qty_range", li["n"], li["viol_qty"]))
    ev = _scan("events", ["event_type"], "events_dq_partial")
    rows.append(("events_type_domain", ev["n"], ev["viol_domain"]))
    dc = _scan("documents", ["text"], "documents_dq_partial")
    rows.append(("documents_text_nonempty", dc["n"], dc["viol_text"]))
    em = _scan("embeddings", ["embedding"], "embeddings_dq_partial")
    rows.append(("embeddings_dim_fixed", em["n"], em["viol_dim"]))

    # uniqueness: rows - distinct keys, from one (key, n) cell stream
    from ray.data.aggregate import Sum

    cells = (
        _t(sf_dir, "orders", ["o_orderkey"])
        .map_batches(
            remote_fn(_QD, "key_cells", key="o_orderkey"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("o_orderkey")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # reused: key count + row count
    )
    n_keys = cells.count()
    n_rows = int(cells.sum("n") or 0)
    rows.append(("orders_orderkey_unique", n_rows, n_rows - n_keys))

    n, v = _fk_violations(sf_dir, "orders", "o_custkey", "customer", "c_custkey")
    rows.append(("orders_custkey_fk", n, v))
    n, v = _fk_violations(sf_dir, "lineitem", "l_orderkey", "orders", "o_orderkey")
    rows.append(("lineitem_orderkey_fk", n, v))

    df = pd.DataFrame(rows, columns=["constraint", "n_checked", "n_violations"])
    return pa.table(
        {
            "constraint": pa.array(df["constraint"].tolist(), pa.string()),
            "n_checked": pa.array(
                df["n_checked"].to_numpy(np.int64), pa.int64()
            ),
            "n_violations": pa.array(
                df["n_violations"].to_numpy(np.int64), pa.int64()
            ),
        }
    )


SQL_DQ_CONSTRAINTS = f"""
SELECT 'orders_totalprice_positive' AS constraint,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations
FROM orders
UNION ALL
SELECT 'lineitem_qty_range', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_quantity >= {DQ_QTY_LO}
                      AND l_quantity <= {DQ_QTY_HI}
                     THEN 0 ELSE 1 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events_type_domain', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN event_type IN
                     ('click','error','purchase','signup','view')
                     THEN 0 ELSE 1 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'documents_text_nonempty', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
            AS BIGINT)
FROM documents
UNION ALL
SELECT 'embeddings_dim_fixed', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN len(embedding) = {DQ_EMBED_DIM} THEN 0 ELSE 1 END)
            AS BIGINT)
FROM embeddings
UNION ALL
SELECT 'orders_orderkey_unique', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer)
                     THEN 0 ELSE 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM orders)
                     THEN 0 ELSE 1 END) AS BIGINT)
FROM lineitem
"""

DQ_QUERIES = {"dq_constraints": q_dq_constraints}
DQ_ORACLES = {"dq_constraints": SQL_DQ_CONSTRAINTS}
