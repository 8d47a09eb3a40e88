"""Link prediction + 2-hop neighborhood aggregation on the doc graph.

Two classic web-graph operators for crawl frontier expansion and
related-page mining, both over the SKEWED planted doc graph (the
queries_graph node rule: ``node = ((doc_id % 100)^2) // 100`` gives
sqrt-law degrees, so candidate scores have real spread):

- ``graph_common_neighbors`` — link prediction over NON-adjacent node
  pairs: common-neighbor count, resource-allocation index (Zhou, Lu,
  Zhang 2009: sum over common neighbors w of 1/deg(w)) and Jaccard
  similarity of neighborhoods. All three scores are exact integer
  arithmetic (RA terms and the Jaccard ratio are floor-scaled by 2^20
  BEFORE summing/dividing) so the Ray and DuckDB sides cannot drift on
  float rounding.
- ``graph_two_hop`` — GNN-style 2-hop neighborhood aggregation: per
  node, the number of length-2 paths, the distinct 2-hop neighbor
  count and the degree mass reachable in 2 hops (sum of deg(v) over
  distinct 2-hop neighbors v != u).

Plan (one pass each, no iteration):
- corpus -> per-batch distinct-edge combiner -> ONE (lo, hi) exchange
  -> the distinct edge table, materialized once (slim, reused by the
  wedge stage and the adjacency/anti-join consumers; its row count
  sizes every downstream join for free);
- wedges are enumerated per CENTER node (groupby(src).map_groups):
  within a center's group the RA term floor(2^20 / deg(center)) is a
  group-local constant (deg(center) == group size), so wedge rows
  carry their RA contribution without any degree join;
- pair scores reduce on ONE (u, v)-keyed exchange; the anti-join
  against the edge table (keep non-adjacent pairs only) and the
  endpoint-degree attach are sized from the materialized edge count
  (streaming safe_join, no extra barrier);
- endpoint degrees attach map-side from a ray.put broadcast when the
  degree table fits LP_BROADCAST_MAX (|V| rows — the planted graph and
  any host-class graph), else through two streaming joins; both
  branches share the jaccard kernel and a forced-branch test pins
  their equivalence.

100 TB notes: wedge enumeration is the one superlinear stage — a hot
center of degree d emits d^2/2 pairs (inherent to the index: it counts
length-2 paths). At web scale the standard mitigations compose with
this plan unchanged: cap or sample neighbor lists of super-hub centers
(they contribute ~0 to RA anyway: term = 2^20/deg), or pre-filter
centers by degree percentile from the free degree table. Everything
else is slim int64 exchanges bounded by |E| and the candidate-pair
cardinality.

Reference analogue: /root/reference/app.py has no graph surface; brief
scope (web-graph curation / crawl scheduling operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..remote import remote_fn

_QL = "khl_pdf_ocr_ray.pipelines.queries_linkpred"
_QG = "khl_pdf_ocr_ray.pipelines.queries_graph"

LP_SCALE = 1 << 20          # fixed-point scale shared with the SQL twins
LP_BROADCAST_MAX = 1 << 20  # degree tables under this attach map-side


def lp_adj_partial(batch: pa.Table) -> pa.Table:
    """Distinct (lo, hi) edges -> both directed (src, dst) rows."""
    lo = pc.cast(batch["lo"], pa.int64()).combine_chunks()
    hi = pc.cast(batch["hi"], pa.int64()).combine_chunks()
    return pa.table(
        {
            "src": pa.concat_arrays([lo, hi]),
            "dst": pa.concat_arrays([hi, lo]),
        }
    )


def lp_wedge_group(g: pd.DataFrame) -> pd.DataFrame:
    """One CENTER node's adjacency rows -> all unordered neighbor pairs
    (u < v) with the center's RA contribution. deg(center) == group
    size, so the RA term needs no degree join; neighbor lists are
    distinct by construction (edges were distinct), so each (u, v) has
    exactly one row per center."""
    nbrs = np.sort(g["dst"].to_numpy().astype(np.int64))
    d = nbrs.size
    if d < 2:
        return pd.DataFrame(
            {
                "u": pd.Series(dtype="int64"),
                "v": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
                "ra": pd.Series(dtype="int64"),
            }
        )
    iu, iv = np.triu_indices(d, k=1)
    ra_term = LP_SCALE // d
    return pd.DataFrame(
        {
            "u": nbrs[iu],
            "v": nbrs[iv],
            "cnt": np.ones(iu.size, dtype=np.int64),
            "ra": np.full(iu.size, ra_term, dtype=np.int64),
        }
    )


def lp_two_hop_group(g: pd.DataFrame) -> pd.DataFrame:
    """One CENTER node's adjacency rows -> all ORDERED neighbor pairs
    (u -> v, u != v): one length-2 path u-center-v per row."""
    nbrs = g["dst"].to_numpy().astype(np.int64)
    d = nbrs.size
    if d < 2:
        return pd.DataFrame(
            {
                "u": pd.Series(dtype="int64"),
                "v": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
    iu, iv = np.triu_indices(d, k=1)
    u = np.concatenate([nbrs[iu], nbrs[iv]])
    v = np.concatenate([nbrs[iv], nbrs[iu]])
    return pd.DataFrame(
        {"u": u, "v": v, "cnt": np.ones(u.size, dtype=np.int64)}
    )


def lp_deg_partial(batch: pa.Table) -> pa.Table:
    """Adjacency rows -> per-batch (node, one) degree partials."""
    return pa.table(
        {
            "node": batch["src"],
            "one": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
        }
    )


def _degrees(adj: rd.Dataset) -> rd.Dataset:
    return (
        adj.map_batches(
            remote_fn(_QL, "lp_deg_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("node")
        .aggregate(Sum("one", alias_name="deg"))
    )


def _deg_numpy(deg: rd.Dataset):
    """Materialized degree table -> (sorted nodes, deg) numpy pair for
    the broadcast attach branch. Bounded by |V| (<= LP_BROADCAST_MAX
    rows when this path is taken)."""
    df = deg.to_pandas()  # bounded: only called when count <= cap
    nodes = df["node"].to_numpy().astype(np.int64)
    vals = df["deg"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    return nodes[order], vals[order]


def lp_attach_degrees(batch: pa.Table, deg_ref) -> pa.Table:
    """Map-side deg(u)/deg(v) attach + Jaccard from the broadcast
    (sorted nodes, deg) pair; every u/v is an edge endpoint, so the
    searchsorted probe always hits."""
    import ray

    nodes, degs = (
        ray.get(deg_ref) if not isinstance(deg_ref, tuple) else deg_ref
    )
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = batch["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
    du = degs[np.searchsorted(nodes, u)]
    dv = degs[np.searchsorted(nodes, v)]
    return lp_jaccard_table(batch, cn, du, dv)


def lp_jaccard_table(batch: pa.Table, cn, du, dv) -> pa.Table:
    """Shared final projection of both attach branches: exact integer
    Jaccard = floor(2^20 * |CN| / (deg_u + deg_v - |CN|))."""
    union = du + dv - cn
    jac = (cn * LP_SCALE) // union
    return pa.table(
        {
            "u": batch["u"],
            "v": batch["v"],
            "cn": batch["cn"],
            "ra_fx": batch["ra_fx"],
            "jaccard_fx": pa.array(jac, pa.int64()),
        }
    )


def lp_join_project(batch: pa.Table) -> pa.Table:
    """Join-branch final projection (deg_u/deg_v arrived via joins)."""
    cn = batch["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
    du = batch["deg_u"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = batch["deg_v"].to_numpy(zero_copy_only=False).astype(np.int64)
    return lp_jaccard_table(batch, cn, du, dv)


def lp_two_hop_attach(batch: pa.Table, deg_ref) -> pa.Table:
    """(u, v, n_paths) + broadcast degrees -> per-batch partials of the
    per-u rollup: n_paths, distinct-v count (=1 per row here: (u, v) is
    unique after the reduce) and deg(v)."""
    import ray

    nodes, degs = (
        ray.get(deg_ref) if not isinstance(deg_ref, tuple) else deg_ref
    )
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = degs[np.searchsorted(nodes, v)]
    return pa.table(
        {
            "node": batch["u"],
            "n_paths": batch["n_paths"],
            "one": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            "deg_v": pa.array(dv, pa.int64()),
        }
    )


def lp_two_hop_join_partial(batch: pa.Table) -> pa.Table:
    """Join-branch twin of lp_two_hop_attach (deg arrived via join)."""
    return pa.table(
        {
            "node": batch["u"],
            "n_paths": batch["n_paths"],
            "one": pa.array(np.ones(len(batch), dtype=np.int64), pa.int64()),
            "deg_v": pc.cast(batch["deg_v"], pa.int64()),
        }
    )


def _edges(sf_dir: str) -> rd.Dataset:
    """Distinct skewed planted edges (queries_graph rule), materialized
    once: reused by the wedge stage, the anti-join and the degree feed;
    the free row count sizes every downstream join."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QG, "graph_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="c_"))
        .select_columns(["lo", "hi"])
        .materialize()
    )


def q_graph_common_neighbors(sf_dir: str) -> rd.Dataset:
    """(u, v, cn, ra_fx, jaccard_fx) for every NON-adjacent pair with at
    least one common neighbor. See module docstring."""
    import ray

    from ..joins import partitions_for_rows, safe_join

    edges = _edges(sf_dir)
    n_edges = edges.count()  # free from materialized metadata
    nparts = partitions_for_rows(n_edges)
    adj = edges.map_batches(
        remote_fn(_QL, "lp_adj_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scored = (
        adj.groupby("src")
        .map_groups(remote_fn(_QL, "lp_wedge_group"), batch_format="pandas")
        .groupby(["u", "v"])
        .aggregate(Sum("cnt", alias_name="cn"), Sum("ra", alias_name="ra_fx"))
    )
    nonadj = safe_join(
        scored,
        edges.rename_columns({"lo": "e_lo", "hi": "e_hi"}),
        on=("u", "v"),
        right_on=("e_lo", "e_hi"),
        join_type="left_anti",
        assume_non_empty=True,  # the planted graph always has open wedges
        num_partitions=nparts,
    )
    deg = _degrees(adj).materialize()  # |V| rows, reused/counted
    if deg.count() <= LP_BROADCAST_MAX:
        ref = ray.put(_deg_numpy(deg))
        return nonadj.map_batches(
            remote_fn(_QL, "lp_attach_degrees", deg_ref=ref),
            batch_format="pyarrow",
        )
    j1 = safe_join(
        nonadj,
        deg.rename_columns({"node": "n_u", "deg": "deg_u"}),
        on=("u",),
        right_on=("n_u",),
        assume_non_empty=True,  # every pair endpoint has a degree row
        num_partitions=nparts,
    )
    j2 = safe_join(
        j1,
        deg.rename_columns({"node": "n_v", "deg": "deg_v"}),
        on=("v",),
        right_on=("n_v",),
        assume_non_empty=True,
        num_partitions=nparts,
    )
    return j2.map_batches(
        remote_fn(_QL, "lp_join_project"), batch_format="pyarrow"
    )


def q_graph_two_hop(sf_dir: str) -> rd.Dataset:
    """(node, n_paths, n_nodes2, deg_sum2): length-2 path count,
    distinct 2-hop neighbor count and reachable degree mass per node.
    See module docstring."""
    import ray

    from ..joins import partitions_for_rows, safe_join

    edges = _edges(sf_dir)
    n_edges = edges.count()
    nparts = partitions_for_rows(n_edges)
    adj = edges.map_batches(
        remote_fn(_QL, "lp_adj_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    paths = (
        adj.groupby("src")
        .map_groups(remote_fn(_QL, "lp_two_hop_group"), batch_format="pandas")
        .groupby(["u", "v"])
        .aggregate(Sum("cnt", alias_name="n_paths"))
    )
    deg = _degrees(adj).materialize()
    if deg.count() <= LP_BROADCAST_MAX:
        ref = ray.put(_deg_numpy(deg))
        partials = paths.map_batches(
            remote_fn(_QL, "lp_two_hop_attach", deg_ref=ref),
            batch_format="pyarrow",
        )
    else:
        joined = safe_join(
            paths,
            deg.rename_columns({"node": "n_v", "deg": "deg_v"}),
            on=("v",),
            right_on=("n_v",),
            assume_non_empty=True,  # every 2-hop endpoint has a degree
            num_partitions=nparts,
        )
        partials = joined.map_batches(
            remote_fn(_QL, "lp_two_hop_join_partial"), batch_format="pyarrow"
        )
    out = partials.groupby("node").aggregate(
        Sum("n_paths", alias_name="n_paths"),
        Sum("one", alias_name="n_nodes2"),
        Sum("deg_v", alias_name="deg_sum2"),
    )
    return out


# --- SQL twins (DuckDB, driver views) ----------------------------------

from .queries_graph import CORE_NODES  # noqa: E402  (the ONE node rule)

_SQL_GRAPH_CTE = f"""
e AS (
  SELECT DISTINCT LEAST(u0, v0) AS lo, GREATEST(u0, v0) AS hi
  FROM (SELECT ((doc_id % {CORE_NODES}) * (doc_id % {CORE_NODES}))
                 // {CORE_NODES} AS u0,
               (((doc_id // 7) % {CORE_NODES})
                 * ((doc_id // 7) % {CORE_NODES})) // {CORE_NODES} AS v0
        FROM documents)
  WHERE u0 != v0),
adj AS (SELECT lo AS s, hi AS d FROM e
        UNION ALL SELECT hi, lo FROM e),
deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS deg
        FROM adj GROUP BY s)
"""

SQL_GRAPH_COMMON_NEIGHBORS = f"""
WITH {_SQL_GRAPH_CTE},
wedge AS (
  SELECT a.d AS u, b.d AS v, a.s AS w
  FROM adj a JOIN adj b ON a.s = b.s AND a.d < b.d),
cn AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum({LP_SCALE} // dw.deg) AS BIGINT) AS ra_fx
  FROM wedge JOIN deg dw ON wedge.w = dw.node
  GROUP BY u, v),
nonadj AS (
  SELECT cn.* FROM cn
  LEFT JOIN e ON e.lo = cn.u AND e.hi = cn.v
  WHERE e.lo IS NULL)
SELECT n.u, n.v, n.cn, n.ra_fx,
       CAST((n.cn * {LP_SCALE}) // (du.deg + dv.deg - n.cn) AS BIGINT)
         AS jaccard_fx
FROM nonadj n
JOIN deg du ON n.u = du.node
JOIN deg dv ON n.v = dv.node
"""

SQL_GRAPH_TWO_HOP = f"""
WITH {_SQL_GRAPH_CTE},
p AS (
  SELECT a.d AS u, b.d AS v
  FROM adj a JOIN adj b ON a.s = b.s AND a.d != b.d),
pc2 AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS np
  FROM p GROUP BY u, v)
SELECT pc2.u AS node,
       CAST(sum(pc2.np) AS BIGINT) AS n_paths,
       CAST(count(*) AS BIGINT) AS n_nodes2,
       CAST(sum(deg.deg) AS BIGINT) AS deg_sum2
FROM pc2 JOIN deg ON pc2.v = deg.node
GROUP BY pc2.u
"""

LINKPRED_QUERIES = {
    "graph_common_neighbors": q_graph_common_neighbors,
    "graph_two_hop": q_graph_two_hop,
}

LINKPRED_ORACLES = {
    "graph_common_neighbors": SQL_GRAPH_COMMON_NEIGHBORS,
    "graph_two_hop": SQL_GRAPH_TWO_HOP,
}
