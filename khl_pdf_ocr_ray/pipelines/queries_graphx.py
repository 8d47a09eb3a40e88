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

GRAPHX_QUERIES = {"graph_clustering_coeff": q_graph_clustering_coeff}
GRAPHX_ORACLES = {"graph_clustering_coeff": SQL_GRAPH_CLUSTERING_COEFF}
