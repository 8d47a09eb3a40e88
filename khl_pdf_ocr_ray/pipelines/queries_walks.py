"""Deterministic random-walk generation over the planted doc graph
(node2vec/DeepWalk sampling shape: the walk corpus that feeds graph
embeddings; also the crawl-frontier exploration primitive).

``graph_random_walks``: from every positive-degree node of the skewed
planted doc graph (the queries_graph edge rule), WALKS_PER_NODE walks of
WALK_STEPS steps. The "randomness" is a fixed integer hash of
(walk_id, step, current node) — deterministic, batching-invariant, and
expressible in SQL, so the driver gate can replay the exact walks: at
node u the walk takes neighbor rank H(walk, step, u) mod degree(u) with
neighbors ranked ascending. Output one row per visited position
(walk_id, step, node).

Plan: the distinct-edge table reduces map-side (per-batch distinct
combiner -> one (lo,hi) groupby); the adjacency (sorted neighbor arrays
+ degrees) is CORE_NODES-bounded — a planted-graph constant, the
BFS_BROADCAST / dimension-table class — so it broadcasts via ray.put
and each step is a vectorized map-only batch transform over the walk
rows (walk state is one row per walk; billions of walks stream through
map_batches against the one broadcast adjacency). For graphs whose
adjacency exceeds the broadcast bound, each step becomes a
(cur, pick)-keyed join against a rank-annotated edge table — the same
two-regime convention as BFS/SSSP, documented here, broadcast
implemented (the planted graph is dimension-sized by construction).

Oracle: static recursive SQL — WITH RECURSIVE over the window-ranked
adjacency with the IDENTICAL hash arithmetic (all intermediates
< 2^60, exact in BIGINT on both engines).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from ..remote import remote_fn

_QW = "khl_pdf_ocr_ray.pipelines.queries_walks"

WALKS_PER_NODE = 2
WALK_STEPS = 4
# hash constants: inner combination stays < 2^31, the product < 2^63
_W_A = 1000003
_W_B = 10007
_W_C = 257
_W_MULT = 2654435761
_W_MOD = 1 << 31


def walk_hash(walk_id: np.ndarray, step: int, node: np.ndarray) -> np.ndarray:
    """The shared deterministic choice hash (int64-exact on both
    engines)."""
    inner = walk_id * _W_A + step * _W_B + node * _W_C
    return ((inner * _W_MULT) % _W_MOD).astype(np.int64)


def walk_step_batch(batch: pa.Table, adj_ref, step: int) -> pa.Table:
    """(walk_id, node) rows at step-1 -> rows at ``step``: pick neighbor
    rank H(walk, step, node) mod degree via the broadcast adjacency."""
    import ray

    nodes, offsets, neighbors = (
        ray.get(adj_ref) if not isinstance(adj_ref, tuple) else adj_ref
    )
    wid = batch["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cur = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(nodes, cur)
    assert (nodes[pos] == cur).all(), "walk reached a node outside adjacency"
    deg = offsets[pos + 1] - offsets[pos]
    pick = walk_hash(wid, step, cur) % deg
    nxt = neighbors[offsets[pos] + pick]
    return pa.table(
        {
            "walk_id": pa.array(wid),
            "step": pa.array(np.full(len(wid), step, dtype=np.int64)),
            "node": pa.array(nxt.astype(np.int64)),
        }
    )


def _adjacency(edges: pd.DataFrame):
    """Distinct (lo, hi) frame -> (sorted nodes, CSR offsets, neighbor
    array with per-node neighbors ascending)."""
    src = np.concatenate([edges["lo"].to_numpy(), edges["hi"].to_numpy()]).astype(
        np.int64
    )
    dst = np.concatenate([edges["hi"].to_numpy(), edges["lo"].to_numpy()]).astype(
        np.int64
    )
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    nodes, starts = np.unique(src, return_index=True)
    offsets = np.concatenate([starts, [len(src)]]).astype(np.int64)
    return nodes, offsets, dst


def q_graph_random_walks(sf_dir: str) -> rd.Dataset:
    """(walk_id, step, node) walk traces — see module docstring."""
    import ray

    from .queries import _t

    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_graph", "graph_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()  # CORE_NODES^2-bounded planted graph: dimension class
    )
    nodes, offsets, neighbors = _adjacency(edges)
    adj_ref = ray.put((nodes, offsets, neighbors))

    wid = np.repeat(nodes, WALKS_PER_NODE) * WALKS_PER_NODE + np.tile(
        np.arange(WALKS_PER_NODE, dtype=np.int64), len(nodes)
    )
    start = pa.table(
        {
            "walk_id": pa.array(wid),
            "step": pa.array(np.zeros(len(wid), dtype=np.int64)),
            "node": pa.array(np.repeat(nodes, WALKS_PER_NODE)),
        }
    )
    steps = [rd.from_arrow(start).repartition(4).materialize()]
    for t in range(1, WALK_STEPS + 1):
        steps.append(
            steps[-1]
            .map_batches(
                remote_fn(_QW, "walk_step_batch", adj_ref=adj_ref, step=t),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()  # each step feeds the next AND the union: tiny
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.union(s)
    return out


SQL_GRAPH_RANDOM_WALKS = f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT
         least(((doc_id % 100) * (doc_id % 100)) // 100,
               (((doc_id // 7) % 100) * ((doc_id // 7) % 100)) // 100) AS lo,
         greatest(((doc_id % 100) * (doc_id % 100)) // 100,
               (((doc_id // 7) % 100) * ((doc_id // 7) % 100)) // 100) AS hi
  FROM documents
  WHERE ((doc_id % 100) * (doc_id % 100)) // 100
        <> (((doc_id // 7) % 100) * ((doc_id // 7) % 100)) // 100),
ud AS (
  SELECT lo AS src, hi AS dst FROM e
  UNION ALL
  SELECT hi AS src, lo AS dst FROM e),
adj AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk,
         count(*) OVER (PARTITION BY src) AS deg
  FROM ud),
starts AS (SELECT DISTINCT src AS node FROM ud),
walks AS (
  SELECT CAST(node * {WALKS_PER_NODE} + t.k AS BIGINT) AS walk_id,
         CAST(0 AS BIGINT) AS step, CAST(node AS BIGINT) AS node
  FROM starts, range({WALKS_PER_NODE}) t(k)
  UNION ALL
  SELECT w.walk_id, w.step + 1, CAST(a.dst AS BIGINT)
  FROM walks w
  JOIN adj a ON a.src = w.node
   AND a.rnk = ((w.walk_id * {_W_A} + (w.step + 1) * {_W_B}
                 + w.node * {_W_C}) * {_W_MULT}) % {_W_MOD} % a.deg
  WHERE w.step < {WALK_STEPS})
SELECT walk_id, step, node FROM walks
"""

WALKS_QUERIES = {"graph_random_walks": q_graph_random_walks}
WALKS_ORACLES = {"graph_random_walks": SQL_GRAPH_RANDOM_WALKS}
