"""Distributed breadth-first traversal: single-source shortest hop depths.

The missing graph-algorithm family next to PageRank (fixed-point
iteration), coreness (monotone value iteration), triangles (join
counting) and connected components (label propagation): FRONTIER
EXPANSION. Crawl-graph uses: hop distance from a seed whitelist
(trust/spam propagation radius, crawl-depth budgeting, link-farm
neighborhood probes).

Graph: a planted ring-with-chords over BFS_NODES ids (ring edge
(u, u+1 mod N) from every doc, chord (u, u+8 mod N) from every 5th doc)
— diameter ~7 on the test corpora, so the frontier loop genuinely
iterates (the denser coreness graph collapses in 2 hops).

Plan, per round (classic distributed BFS — e.g. Pregel-style frontier
semantics, reimplemented; expansion is frontier-size-adaptive per the
skew_join convention):

    frontier small: broadcast sorted ids -> map-side edge
                    filter + per-batch distinct      [map, no join]
    frontier large: frontier ⋈ edges (src) + distinct [shuffle join]
    visited small:  broadcast sorted visited -> map-side
                    anti-filter                       [map, no join]
    visited large:  candidates LEFT ANTI visited      [keyed join]
    visited := visited ∪ new      (materialized iterate)
    stop when new is empty; loud RuntimeError at the cap

    Under the broadcast cap a round is therefore JOIN-OPERATOR-FREE
    (two map passes over the materialized edge table) — the Join
    operator's per-run fixed cost times 8 rounds was the dominant
    toy-scale term (10.6 s -> see BENCH). Above the cap both steps are
    the keyed-join plans, and the driver holds no node state.

Driver state per round: ONE row count (the new-frontier size) — never
nodes or edges. The final (node, min depth) aggregate is one tiny
groupby (nodes are unique in `visited` by construction; the groupby
collapses within-round duplicates only).

The ORACLE is an INDEPENDENT algorithm: DuckDB's recursive CTE explores
(node, depth) pairs with UNION-distinct semantics and takes min(depth)
per node — no frontier/anti-join machinery shared with the engine.

100 TB notes: frontier and visited are node-keyed Datasets (never
driver-collected); each round is two slim keyed joins; round count =
graph diameter (small for web graphs). BFS_MAX_ROUNDS caps runaway
diameters loudly (pointer-doubling is the documented upgrade if a real
corpus ever trips it, same policy as label propagation).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min

from ..joins import safe_join
from ..remote import remote_fn

_QB = "khl_pdf_ocr_ray.pipelines.queries_bfs"

BFS_NODES = 64
BFS_CHORD = 8
BFS_CHORD_EVERY = 5
BFS_SEED = 0
BFS_MAX_ROUNDS = 40
# frontier-size-adaptive expansion (the skew_join convention): below this
# the frontier broadcasts (ray.put sorted ids, map-side edge filter — no
# Join operator and no driver state beyond the frontier itself); above it
# the expansion is a keyed shuffle join. Web-graph BFS frontiers start and
# end small; the shuffle path carries the big middle rounds at scale.
BFS_BROADCAST_MAX = 1 << 20


def bfs_edge_partial(batch: pa.Table) -> pa.Table:
    """doc_id -> planted ring/chord edges, both directions, per-batch
    distinct (the global distinct happens in the edge groupby)."""
    import numpy as np

    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = d % BFS_NODES
    ring_v = (u + 1) % BFS_NODES
    cu = u[d % BFS_CHORD_EVERY == 0]
    cv = (cu + BFS_CHORD) % BFS_NODES
    src = np.concatenate([u, ring_v, cu, cv])
    dst = np.concatenate([ring_v, u, cv, cu])
    g = (
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
        .group_by(["src", "dst"])
        .aggregate([([], "count_all")])
    )
    return g.select(["src", "dst"])


def bfs_nbr_project(batch: pa.Table) -> pa.Table:
    """Joined (frontier x edges) rows -> per-batch-distinct neighbor
    candidates (map-side combiner; global dedup is the anti-join +
    final min-aggregate, so no Ray aggregate runs per round)."""
    g = batch.group_by("dst").aggregate([([], "count_all")])
    return pa.table({"node": g["dst"]})


def bfs_expand_broadcast(batch: pa.Table, fr_ref) -> pa.Table:
    """Map-side frontier expansion for SMALL frontiers (the skew_join
    convention: hot/small side broadcast, no Join operator): keep edge
    rows whose src is in the broadcast sorted frontier, emit per-batch
    distinct dst."""
    import numpy as np
    import ray

    fr = ray.get(fr_ref) if not isinstance(fr_ref, np.ndarray) else fr_ref
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.minimum(np.searchsorted(fr, src), len(fr) - 1)
    hit = batch.filter(pa.array(fr[pos] == src))
    g = hit.group_by("dst").aggregate([([], "count_all")])
    return pa.table({"node": g["dst"]})


def bfs_expand_unvisited_broadcast(batch: pa.Table, fr_ref, vis_ref) -> pa.Table:
    """ONE map pass for the fully-under-cap round: expand the broadcast
    frontier over the edge batch AND anti-filter against the broadcast
    visited set; emits per-batch-distinct new nodes (cross-batch dedup
    on the driver — the candidate set is cap-bounded by the guard)."""
    import numpy as np
    import ray

    fr = ray.get(fr_ref) if not isinstance(fr_ref, np.ndarray) else fr_ref
    vis = ray.get(vis_ref) if not isinstance(vis_ref, np.ndarray) else vis_ref
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.minimum(np.searchsorted(fr, src), len(fr) - 1)
    hit = batch.filter(pa.array(fr[pos] == src))
    dst = hit["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    vpos = np.minimum(np.searchsorted(vis, dst), len(vis) - 1)
    new = np.unique(dst[vis[vpos] != dst])
    return pa.table({"node": pa.array(new, pa.int64())})


def bfs_edges_ds(sf_dir: str) -> rd.Dataset:
    """Corpus -> globally-distinct planted (src, dst) edge Dataset,
    materialized (iterated against every BFS round; also reused by the
    double-sweep diameter operator in queries_graphy)."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QB, "bfs_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["src", "dst"])
        .aggregate(Min("src", alias_name="_one"))
        .select_columns(["src", "dst"])
        .materialize()
    )


def q_graph_bfs_depths(sf_dir: str) -> rd.Dataset:
    """See module docstring."""
    return bfs_depths_from(bfs_edges_ds(sf_dir), BFS_SEED)


def bfs_depths_from(edges: rd.Dataset, seed_node: int) -> rd.Dataset:
    """Frontier-expansion BFS from ``seed_node`` over a materialized
    (src, dst) edge Dataset -> (node, depth). The seed is a parameter so
    the double-sweep diameter operator can rerun the identical traversal
    from the first sweep's peak."""
    import numpy as np

    import ray

    seed = pa.table(
        {
            "node": pa.array([seed_node], pa.int64()),
            "depth": pa.array([0], pa.int64()),
        }
    )
    # Under the broadcast cap the traversal state (depth per reached
    # node) lives DRIVER-SIDE — the frontier/visited arrays are the
    # broadcast payloads anyway — and a round is ONE fused
    # expand+anti-filter map over the materialized edge table. Past the
    # cap the state moves into Datasets for good and every step is the
    # keyed distributed plan (frontier ⋈ edges, candidates LEFT ANTI
    # visited); the driver then holds one row count per round only.
    visited = rd.from_arrow(seed).materialize()
    frontier = visited.select_columns(["node"]).materialize()
    n_frontier = 1
    depth_of = {seed_node: 0}
    frontier_ids = np.array([seed_node], dtype=np.int64)
    visited_ids = frontier_ids.copy()
    for depth in range(1, BFS_MAX_ROUNDS + 1):
        if visited_ids is not None and len(visited_ids) <= BFS_BROADCAST_MAX \
                and n_frontier <= BFS_BROADCAST_MAX:
            cand = edges.map_batches(
                remote_fn(
                    _QB,
                    "bfs_expand_unvisited_broadcast",
                    fr_ref=ray.put(frontier_ids),
                    vis_ref=ray.put(visited_ids),
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            # collect per-batch candidates (cap-bounded by the guard);
            # Ray skips the UDF on empty input blocks, which then pass
            # through with the EDGE schema — filter those out by name
            parts = [
                b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
                for b in cand.iter_batches(batch_format="pyarrow")
                if "node" in b.schema.names and len(b)
            ]
            new_ids = np.unique(
                np.concatenate(parts + [np.array([], dtype=np.int64)])
            )
            n_new = len(new_ids)
            if n_new == 0:
                break
            for n in new_ids:
                depth_of[int(n)] = depth
            frontier_ids = new_ids
            visited_ids = np.union1d(visited_ids, new_ids)
            n_frontier = n_new
            if len(visited_ids) > BFS_BROADCAST_MAX:
                # state outgrew the cap: move it into Datasets for good
                visited = rd.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(
                                list(depth_of), pa.int64()
                            ),
                            "depth": pa.array(
                                list(depth_of.values()), pa.int64()
                            ),
                        }
                    )
                ).materialize()
                frontier = rd.from_arrow(
                    pa.table({"node": pa.array(new_ids, pa.int64())})
                ).materialize()
                frontier_ids = visited_ids = None
            continue

        if visited_ids is not None:
            # entering distributed mode round 1 (forced or cap=0): the
            # seed Datasets already hold the same state
            frontier_ids = visited_ids = None
        nbrs = safe_join(
            frontier,
            edges,
            on=("node",),
            right_on=("src",),
            assume_non_empty=True,
            num_partitions=8,
        ).map_batches(
            remote_fn(_QB, "bfs_nbr_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        vis_r = visited.select_columns(["node"]).rename_columns(
            {"node": "node_r"}
        )
        new = safe_join(
            nbrs,
            vis_r,
            on=("node",),
            right_on=("node_r",),
            join_type="left_anti",
            assume_non_empty=True,
            num_partitions=1,
        ).materialize()
        n_new = new.count()  # the ONLY per-round driver state above cap
        if n_new == 0:
            break
        new_d = new.map_batches(
            remote_fn(_QB, "bfs_stamp_depth", depth=depth),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        visited = visited.union(new_d).materialize()
        frontier = new
        n_frontier = n_new
    else:
        raise RuntimeError(
            f"graph_bfs_depths: frontier still non-empty after "
            f"{BFS_MAX_ROUNDS} rounds — diameter exceeds the cap; raise "
            f"BFS_MAX_ROUNDS or switch to a doubling traversal"
        )
    if visited_ids is not None:  # converged while under the broadcast cap
        ns = sorted(depth_of)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(ns, pa.int64()),
                    "depth": pa.array([depth_of[n] for n in ns], pa.int64()),
                }
            )
        )
    # collapse within-round duplicates (anti-join guarantees cross-round
    # uniqueness); tiny: |reached nodes| rows
    return visited.groupby("node").aggregate(Min("depth", alias_name="depth"))


def bfs_stamp_depth(batch: pa.Table, depth: int) -> pa.Table:
    return batch.append_column(
        "depth", pa.array([depth] * len(batch), pa.int64())
    )


SQL_GRAPH_BFS_DEPTHS = f"""
WITH RECURSIVE base AS (
  SELECT DISTINCT doc_id % {BFS_NODES} AS u,
                  (doc_id % {BFS_NODES} + 1) % {BFS_NODES} AS v
  FROM documents
  UNION
  SELECT DISTINCT doc_id % {BFS_NODES} AS u,
                  (doc_id % {BFS_NODES} + {BFS_CHORD}) % {BFS_NODES} AS v
  FROM documents WHERE doc_id % {BFS_CHORD_EVERY} = 0
), e AS (
  SELECT u AS src, v AS dst FROM base UNION SELECT v, u FROM base
), walk(node, depth) AS (
  SELECT CAST({BFS_SEED} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, w.depth + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.depth < {BFS_MAX_ROUNDS}
)
SELECT node, min(depth) AS depth FROM walk GROUP BY node
"""

# ======================================================================
# Weighted single-source shortest paths (Bellman-Ford / min-plus
# relaxation) over the same planted graph with deterministic edge
# weights w(u, v) = 1 + (u + v) % 5 (symmetric by construction).
# ======================================================================
SSSP_MAX_ROUNDS = 80
# adaptive compare/expand: below this the dist table broadcasts
# (ray.put) and each round is MAP-ONLY over the materialized edge
# table; above it both the expansion and the improvement compare run as
# node-keyed shuffle joins (the 100 TB path — dist is host-cardinality
# there). Same convention as BFS_BROADCAST_MAX / skew_join.
SSSP_BROADCAST_MAX = 1 << 20


def sssp_edge_partial(batch: pa.Table) -> pa.Table:
    """Planted edges with weights, per-batch distinct."""
    import numpy as np

    e = bfs_edge_partial(batch)
    src = e["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = e["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    return e.append_column("w", pa.array(1 + (src + dst) % 5, pa.int64()))


def sssp_relax_broadcast(batch: pa.Table, dist_ref) -> pa.Table:
    """One relaxation sweep, map-side: for edge rows whose src has a
    current distance, emit (dst, src_dist + w); per-batch min per dst."""
    import numpy as np
    import ray

    nodes, dists = (
        ray.get(dist_ref) if not isinstance(dist_ref, tuple) else dist_ref
    )
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.minimum(np.searchsorted(nodes, src), len(nodes) - 1)
    hit = nodes[pos] == src
    if not hit.any():
        return pa.table(
            {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
        )
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)[hit]
    w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)[hit]
    cand = dists[pos[hit]] + w
    t = pa.table(
        {"node": pa.array(dst, pa.int64()), "dist": pa.array(cand, pa.int64())}
    )
    g = t.group_by("node").aggregate([("dist", "min")])
    return pa.table({"node": g["node"], "dist": g["dist_min"]})


def q_graph_sssp(sf_dir: str) -> rd.Dataset:
    """Weighted SSSP by distributed Bellman-Ford (min-plus relaxation):
    per round, relax every edge out of the current dist table, min-merge
    the candidates back in, converged when the (node count, dist sum)
    fingerprint stops moving — dists only ever decrease and reach-counts
    only grow, so the pair is invariant iff nothing changed. Driver
    state per round: two scalars (and, under the broadcast cap, the
    node-sized dist arrays — the keyed-join path above the cap never
    collects them). The compare step is deliberately JOIN-FREE: Ray's
    Join operator emits schema-less blocks for empty hash partitions,
    which poison a downstream join when the dist table is smaller than
    the partition count; the union + min-merge + fingerprint form needs
    one less exchange anyway. Weighted complement of graph_bfs_depths'
    hop metric."""
    import numpy as np

    import ray

    from .queries import _t
    from ray.data.aggregate import Count as _Count, Min as _Min, Sum as _Sum

    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QB, "sssp_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["src", "dst"])
        .aggregate(_Min("w", alias_name="w"))
        .materialize()  # iterated against every round; edge-distinct
    )
    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([BFS_SEED], pa.int64()),
                "dist": pa.array([0], pa.int64()),
            }
        )
    ).materialize()
    # under the broadcast cap the dist table lives DRIVER-SIDE as two
    # sorted arrays (they are the per-round broadcast payload anyway),
    # so a round is ONE distributed relax map over the materialized edge
    # table + a local min-merge — no union/groupby/aggregate exchanges.
    # Past the cap the state moves into a Dataset for good and every
    # step is the keyed distributed plan.
    nodes = np.array([BFS_SEED], dtype=np.int64)
    dvals = np.array([0], dtype=np.int64)
    fp = (1, 0)  # (reached nodes, dist sum) convergence fingerprint
    for _ in range(SSSP_MAX_ROUNDS):
        if nodes is not None and fp[0] <= SSSP_BROADCAST_MAX:
            ref = ray.put((nodes, dvals))
            cand_ds = edges.map_batches(
                remote_fn(_QB, "sssp_relax_broadcast", dist_ref=ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            # <= |reached nodes| x edge-blocks rows (cap-bounded); Ray
            # skips the UDF on empty input blocks, which pass through
            # with the EDGE schema — filter those out by name
            cparts = [
                b.select(["node", "dist"]).to_pandas()
                for b in cand_ds.iter_batches(batch_format="pyarrow")
                if "node" in b.schema.names and len(b)
            ]
            import pandas as _pd

            cand = (
                _pd.concat(cparts)
                if cparts
                else _pd.DataFrame({"node": [], "dist": []})
            )
            cm = cand.groupby("node", as_index=False)["dist"].min()
            merged = {int(n): int(d) for n, d in zip(nodes, dvals)}
            for n, d in zip(cm["node"], cm["dist"]):
                n, d = int(n), int(d)
                if n not in merged or d < merged[n]:
                    merged[n] = d
            nodes = np.array(sorted(merged), dtype=np.int64)
            dvals = np.array([merged[n] for n in nodes], dtype=np.int64)
            new_fp = (len(nodes), int(dvals.sum()))
            if new_fp[0] > SSSP_BROADCAST_MAX:
                # state outgrew the cap: move it into a Dataset for good
                dist = rd.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(nodes, pa.int64()),
                            "dist": pa.array(dvals, pa.int64()),
                        }
                    )
                ).materialize()
                nodes = dvals = None
        else:  # node-keyed join path (the 100 TB branch)
            if nodes is not None:
                # entering distributed mode round 1 (forced or cap=0):
                # the Dataset `dist` already holds the same state; the
                # driver arrays are dead from here on
                nodes = dvals = None
            # partitions from the KNOWN dist row count (the fingerprint):
            # collapses to 1 for small tables — which also sidesteps the
            # Join operator's schema-less empty-partition blocks
            from ..joins import partitions_for_rows

            cand_min = safe_join(
                dist, edges, on=("node",), right_on=("src",),
                assume_non_empty=True,
                num_partitions=max(partitions_for_rows(fp[0]), 1),
            ).map_batches(
                remote_fn(_QB, "sssp_relax_join"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            dist = (
                dist.union(cand_min)
                .groupby("node")
                .aggregate(_Min("dist", alias_name="dist"))
                .materialize()
            )
            agg = dist.aggregate(
                _Count(alias_name="n"), _Sum("dist", alias_name="s")
            )
            new_fp = (int(agg["n"]), int(agg["s"]))
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"graph_sssp: still improving after {SSSP_MAX_ROUNDS} rounds — "
            f"negative-weight-like divergence or a pathological diameter; "
            f"raise SSSP_MAX_ROUNDS"
        )
    if nodes is not None:  # converged while under the broadcast cap
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "dist": pa.array(dvals, pa.int64()),
                }
            )
        )
    return dist


def sssp_relax_join(batch: pa.Table) -> pa.Table:
    """Joined (dist x edges) rows -> candidate (dst, dist + w), per-batch
    min per dst."""
    import numpy as np

    d = batch["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table(
        {
            "node": batch["dst"],
            "dist": pa.array(d + w, pa.int64()),
        }
    )
    g = t.group_by("node").aggregate([("dist", "min")])
    return pa.table({"node": g["node"], "dist": g["dist_min"]})


SQL_GRAPH_SSSP = f"""
WITH RECURSIVE base AS (
  SELECT DISTINCT doc_id % {BFS_NODES} AS u,
                  (doc_id % {BFS_NODES} + 1) % {BFS_NODES} AS v
  FROM documents
  UNION
  SELECT DISTINCT doc_id % {BFS_NODES} AS u,
                  (doc_id % {BFS_NODES} + {BFS_CHORD}) % {BFS_NODES} AS v
  FROM documents WHERE doc_id % {BFS_CHORD_EVERY} = 0
), e AS (
  SELECT u AS src, v AS dst, 1 + (u + v) % 5 AS w FROM base
  UNION SELECT v, u, 1 + (u + v) % 5 FROM base
), walk(node, dist, hops) AS (
  SELECT CAST({BFS_SEED} AS BIGINT), CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w.dist + e.w, w.hops + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {BFS_NODES}
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node
"""

BFS_QUERIES = {
    "graph_bfs_depths": q_graph_bfs_depths,
    "graph_sssp": q_graph_sssp,
}
BFS_ORACLES = {
    "graph_bfs_depths": SQL_GRAPH_BFS_DEPTHS,
    "graph_sssp": SQL_GRAPH_SSSP,
}
