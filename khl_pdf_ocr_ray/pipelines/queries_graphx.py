"""Local clustering coefficient per node of the planted doc graph.

Completes the graph-analytics trio (PageRank = centrality, coreness =
degeneracy, triangles = closure) with the per-node LOCAL CLUSTERING
COEFFICIENT — the standard community/spam signal

  lcc(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1))    for deg >= 2,
           0                                             otherwise,

reported as exact fixed point floor(2^20 * 2T / (d*(d-1))).

Graph: the doc_graph_triangles planted convention (u = doc_id % N,
v = (doc_id // 7) % N, canonical lo < hi edges, dupes dropped) so the
static SQL twin recomputes everything relationally.

Plan: REUSES the degree-oriented triangle machinery of
queries_train.py (orientation bounds wedge fanout at O(sqrt(m));
each triangle found once) — one extra |V|-row left-outer join attaches
triangle counts to the degree table (nodes in no triangle must appear
with lcc = 0, so the join direction is degrees <- triangles), then a
map-only integer finalize. All exchanges are node- or edge-count
sized; the corpus contributes only the initial edge-derivation scan.

Reference analogue: /root/reference/app.py has no graph surface; brief
scope (web-graph curation operators).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..remote import remote_fn

_QGX = "khl_pdf_ocr_ray.pipelines.queries_graphx"

LCC_SCALE = 1 << 20


def lcc_finalize(batch: pa.Table) -> pa.Table:
    """(node, deg, n_triangles?) -> (node, deg, n_triangles, lcc_fx)."""
    node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    deg = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    tri = pc.fill_null(batch["n_triangles"], 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    denom = deg * (deg - 1)
    lcc = np.where(deg >= 2, (2 * tri * LCC_SCALE) // np.maximum(denom, 1), 0)
    return pa.table(
        {
            "node": pa.array(node, pa.int64()),
            "deg": pa.array(deg, pa.int64()),
            "n_triangles": pa.array(tri, pa.int64()),
            "lcc_fx": pa.array(lcc.astype(np.int64), pa.int64()),
        }
    )


def q_graph_clustering_coeff(sf_dir: str) -> rd.Dataset:
    """(node, deg, n_triangles, lcc_fx). See module docstring."""
    from ..io import coalesce_for_input, table_nbytes
    from ..joins import partitions_for_rows, safe_join
    from .queries import _t
    from .queries_train import _QT, TRI_NODES, q_doc_graph_triangles

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    deg = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QT, "tri_edges_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="c_"))
        .select_columns(["lo", "hi"])
        .map_batches(
            remote_fn(_QT, "tri_deg_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("node")
        .aggregate(Sum("one", alias_name="deg"))
    )
    tri = q_doc_graph_triangles(sf_dir).rename_columns({"node": "t_node"})
    joined = safe_join(
        deg,
        tri,
        join_type="left_outer",
        on=("node",),
        right_on=("t_node",),
        assume_non_empty=True,  # planted graph: both sides structurally non-empty
        num_partitions=partitions_for_rows(TRI_NODES),  # |V| <= TRI_NODES
    )
    return joined.map_batches(
        remote_fn(_QGX, "lcc_finalize"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# Triangle CTE shared with SQL_DOC_GRAPH_TRIANGLES (queries_train.py);
# the degree CTE + left join + CASE are this operator's own derivation.
def _sql(tri_nodes: int) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT
         LEAST(doc_id % {tri_nodes}, (doc_id // 7) % {tri_nodes}) AS lo,
         GREATEST(doc_id % {tri_nodes}, (doc_id // 7) % {tri_nodes}) AS hi
  FROM documents
  WHERE doc_id % {tri_nodes} != (doc_id // 7) % {tri_nodes}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT lo AS node FROM e UNION ALL SELECT hi FROM e)
  GROUP BY node),
t AS (
  SELECT a.lo AS x, a.hi AS y, b.hi AS z
  FROM e a
  JOIN e b ON b.lo = a.lo AND b.hi > a.hi
  JOIN e c ON c.lo = a.hi AND c.hi = b.hi),
tri AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT x AS node FROM t
        UNION ALL SELECT y FROM t
        UNION ALL SELECT z FROM t)
  GROUP BY node)
SELECT d.node,
       d.deg,
       CAST(COALESCE(tri.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.deg >= 2
                 THEN (2 * COALESCE(tri.n_triangles, 0) * {LCC_SCALE})
                      // (d.deg * (d.deg - 1))
                 ELSE 0 END AS BIGINT) AS lcc_fx
FROM deg d LEFT JOIN tri ON tri.node = d.node
"""


SQL_GRAPH_CLUSTERING_COEFF = _sql(100)  # == queries_train.TRI_NODES
# (tests assert the constant agreement so the twin can't drift)

# --- degree assortativity -------------------------------------------------


def assort_moment_partial(batch: pa.Table) -> pa.Table:
    """(lo, hi, dx, dy) edge rows -> one moment row per batch, BOTH
    orientations counted (the standard undirected convention, which
    makes sum_x == sum_y and sum_x2 == sum_y2 by symmetry). Per-block
    int64 is exact while deg^2 x block_rows < 2^63 (~4e18 at deg 1e7 x
    40k-row blocks — documented headroom; the driver fold is Python-int
    exact)."""
    dx = batch["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
    dy = batch["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = 2 * len(dx)
    sx = int(dx.sum()) + int(dy.sum())
    sxy = 2 * int((dx * dy).sum())
    sx2 = int((dx * dx).sum()) + int((dy * dy).sum())
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
            "sx2": pa.array([sx2], pa.int64()),
        }
    )


def assort_finalize(n: int, sx: int, sxy: int, sx2: int):
    """Signed fixed-point squared Pearson correlation of degrees across
    edge endpoints: sign(cov) * 1000 * cov^2 // var^2 (var_x == var_y by
    the both-orientations symmetry). Exact Python ints; shared by the
    test brute force."""
    cov = n * sxy - sx * sx
    var = n * sx2 - sx * sx
    if var == 0:
        return 0
    mag = (1000 * cov * cov) // (var * var)
    return -mag if cov < 0 else mag


def q_graph_assortativity(sf_dir: str) -> "object":
    """One row: (n_ends, sum_deg, sum_prod, sum_deg2, assort_r2_milli) —
    degree assortativity of the planted doc graph (Newman 2002; spam
    farms are disassortative, organic webs assortative). Moments reduce
    map-side to one row per block; the driver folds a handful of int64
    rows in exact Python ints (same class as lang_ols_slope)."""
    import pandas as pd

    from ..io import coalesce_for_input, table_nbytes
    from ..joins import partitions_for_rows, safe_join
    from .queries import _t
    from .queries_train import _QT, TRI_NODES

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QT, "tri_edges_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="c_"))
        .select_columns(["lo", "hi"])
        .materialize()  # consumed 3x: deg derivation + two endpoint joins
    )
    deg = (
        edges.map_batches(
            remote_fn(_QT, "tri_deg_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("node")
        .aggregate(Sum("one", alias_name="deg"))
    )
    np_ = partitions_for_rows(TRI_NODES)
    j1 = safe_join(
        edges,
        deg.rename_columns({"node": "n1", "deg": "dx"}),
        join_type="inner",
        on=("lo",),
        right_on=("n1",),
        assume_non_empty=True,  # every edge endpoint has a degree row
        num_partitions=np_,
    )
    j2 = safe_join(
        j1,
        deg.rename_columns({"node": "n2", "deg": "dy"}),
        join_type="inner",
        on=("hi",),
        right_on=("n2",),
        assume_non_empty=True,
        num_partitions=np_,
    )
    parts = j2.map_batches(
        remote_fn(_QGX, "assort_moment_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # one row per block — O(blocks) driver pull
    n = int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    sxy = int(parts["sxy"].sum())
    sx2 = int(parts["sx2"].sum())
    return pd.DataFrame(
        {
            "n_ends": np.array([n], dtype=np.int64),
            "sum_deg": np.array([sx], dtype=np.int64),
            "sum_prod": np.array([sxy], dtype=np.int64),
            "sum_deg2": np.array([sx2], dtype=np.int64),
            "assort_r2_milli": np.array(
                [assort_finalize(n, sx, sxy, sx2)], dtype=np.int64
            ),
        }
    )


def _assort_sql(tri_nodes: int) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT
         LEAST(doc_id % {tri_nodes}, (doc_id // 7) % {tri_nodes}) AS lo,
         GREATEST(doc_id % {tri_nodes}, (doc_id // 7) % {tri_nodes}) AS hi
  FROM documents
  WHERE doc_id % {tri_nodes} != (doc_id // 7) % {tri_nodes}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT lo AS node FROM e UNION ALL SELECT hi FROM e)
  GROUP BY node),
xy AS (
  SELECT d1.deg AS x, d2.deg AS y
  FROM e JOIN deg d1 ON d1.node = e.lo JOIN deg d2 ON d2.node = e.hi
  UNION ALL
  SELECT d2.deg, d1.deg
  FROM e JOIN deg d1 ON d1.node = e.lo JOIN deg d2 ON d2.node = e.hi),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2
  FROM xy)
SELECT CAST(n AS BIGINT) AS n_ends,
       CAST(sx AS BIGINT) AS sum_deg,
       CAST(sxy AS BIGINT) AS sum_prod,
       CAST(sx2 AS BIGINT) AS sum_deg2,
       CAST(CASE WHEN (n * sx2 - sx * sx) = 0 THEN 0
            WHEN (n * sxy - sx * sx) < 0
            THEN -((1000 * (n * sxy - sx * sx) * (n * sxy - sx * sx))
                   // ((n * sx2 - sx * sx) * (n * sx2 - sx * sx)))
            ELSE (1000 * (n * sxy - sx * sx) * (n * sxy - sx * sx))
                 // ((n * sx2 - sx * sx) * (n * sx2 - sx * sx))
            END AS BIGINT) AS assort_r2_milli
FROM m
"""


SQL_GRAPH_ASSORTATIVITY = _assort_sql(100)  # == queries_train.TRI_NODES
# (test_round4c_ops pins the constant agreement, same as the lcc twin)

GRAPHX_QUERIES = {
    "graph_clustering_coeff": q_graph_clustering_coeff,
    "graph_assortativity": q_graph_assortativity,
}
GRAPHX_ORACLES = {
    "graph_clustering_coeff": SQL_GRAPH_CLUSTERING_COEFF,
    "graph_assortativity": SQL_GRAPH_ASSORTATIVITY,
}
