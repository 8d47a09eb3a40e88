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


ADJ_BROADCAST_MAX = 1 << 20  # adjacency entries below this broadcast
                             # (the BFS_BROADCAST / skew_join convention);
                             # above it every step runs the two-join
                             # shuffle regime


def ranked_edge_batch(batch: pa.Table) -> pa.Table:
    """Distinct (lo, hi) -> both directions, tagged with the src shard
    for the per-src rank kernel."""
    lo = pc.cast(batch["lo"], pa.int64()).combine_chunks()
    hi = pc.cast(batch["hi"], pa.int64()).combine_chunks()
    t = pa.table(
        {
            "src": pa.concat_arrays([lo, hi]),
            "dst": pa.concat_arrays([hi, lo]),
        }
    )
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    return t.append_column("rshard", pa.array(s % 64))


def rank_edges_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """One src shard -> (src, rnk, dst, deg): neighbors ranked ascending
    per src, vectorized (one lexsort + cumcount per shard)."""
    g = g.sort_values(["src", "dst"], kind="mergesort")
    rnk = g.groupby("src", sort=False).cumcount().to_numpy()
    deg = g.groupby("src", sort=False)["dst"].transform("size").to_numpy()
    return pd.DataFrame(
        {
            "src": g["src"].to_numpy(np.int64),
            "rnk": rnk.astype(np.int64),
            "dst": g["dst"].to_numpy(np.int64),
            "deg": deg.astype(np.int64),
        }
    )


def walk_pick_batch(batch: pa.Table, step: int) -> pa.Table:
    """Frontier rows joined with their degree -> (walk_id, node, pick)
    probe keys for the ranked-edge join."""
    wid = batch["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cur = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    deg = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    pick = walk_hash(wid, step, cur) % deg
    return pa.table(
        {
            "walk_id": pa.array(wid),
            "node": pa.array(cur),
            "pick": pa.array(pick),
        }
    )


def walk_next_project(batch: pa.Table, step: int) -> pa.Table:
    """Joined probe x ranked-edge rows -> the next frontier."""
    n = batch.num_rows
    return pa.table(
        {
            "walk_id": pc.cast(batch["walk_id"], pa.int64()),
            "step": pa.array(np.full(n, step, dtype=np.int64)),
            "node": pc.cast(batch["dst"], pa.int64()),
        }
    )


def q_graph_random_walks(sf_dir: str, force: str | None = None) -> rd.Dataset:
    """(walk_id, step, node) walk traces — see module docstring.

    ``force``: None (size-based regime pick), "broadcast", "shuffle"
    (test hook; forced-branch equivalence proven in tests/test_walks)."""
    import ray

    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    assert force in (None, "broadcast", "shuffle")
    edges_ds = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_graph", "graph_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_n"))
        .materialize()
    )
    n_adj = 2 * edges_ds.count()
    use_broadcast = force == "broadcast" or (
        force is None and n_adj <= ADJ_BROADCAST_MAX
    )

    if use_broadcast:
        edges = edges_ds.to_pandas()  # within ADJ_BROADCAST_MAX by regime pick
        nodes, offsets, neighbors = _adjacency(edges)
        adj_ref = ray.put((nodes, offsets, neighbors))
        start_nodes = nodes
    else:
        ranked = (
            edges_ds.map_batches(
                remote_fn(_QW, "ranked_edge_batch"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("rshard")
            .map_groups(remote_fn(_QW, "rank_edges_kernel"), batch_format="pandas")
            .materialize()  # probed every step
        )
        deg_tbl = ranked.groupby("src").aggregate(Count(alias_name="deg")).materialize()
        # start set: distinct srcs — node-bounded pull, same bound as the
        # broadcast regime's adjacency nodes
        start_nodes = np.sort(
            deg_tbl.select_columns(["src"]).to_pandas()["src"].to_numpy(np.int64)
        )

    wid = np.repeat(start_nodes, WALKS_PER_NODE) * WALKS_PER_NODE + np.tile(
        np.arange(WALKS_PER_NODE, dtype=np.int64), len(start_nodes)
    )
    start = pa.table(
        {
            "walk_id": pa.array(wid),
            "step": pa.array(np.zeros(len(wid), dtype=np.int64)),
            "node": pa.array(np.repeat(start_nodes, WALKS_PER_NODE)),
        }
    )
    steps = [rd.from_arrow(start).repartition(4).materialize()]
    nparts = partitions_for_rows(len(wid))
    for t in range(1, WALK_STEPS + 1):
        if use_broadcast:
            nxt = steps[-1].map_batches(
                remote_fn(_QW, "walk_step_batch", adj_ref=adj_ref, step=t),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            with_deg = safe_join(
                steps[-1],
                deg_tbl,
                on=("node",),
                right_on=("src",),
                assume_non_empty=True,  # frontier + degree table never empty
                num_partitions=nparts,
            )
            probes = with_deg.map_batches(
                remote_fn(_QW, "walk_pick_batch", step=t),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            nxt = safe_join(
                probes,
                ranked,
                on=("node", "pick"),
                right_on=("src", "rnk"),
                assume_non_empty=True,  # pick < deg by construction
                num_partitions=nparts,
            ).map_batches(
                remote_fn(_QW, "walk_next_project", step=t),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        steps.append(nxt.materialize())  # feeds the next step AND the union
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
