"""Graph degeneracy: full coreness (k-core number) decomposition.

Web-graph analytics for crawl curation: a page's CORENESS (the largest
k such that it survives in the k-core) separates densely-linked hub
regions from peripheral leaves — a standard spam/quality and community
signal alongside PageRank (host_pagerank) and triangle counts
(doc_graph_triangles).

Graph: the planted doc graph convention, but through a SKEWED node map
— ``node = ((doc_id % 100)^2) // 100`` concentrates mass on low ids
(sqrt-law degrees) so the decomposition has real layers; the uniform
rule used by doc_graph_triangles is near-regular and its k-core is
all-or-nothing.

Algorithm (distributed): H-INDEX ITERATION (Lu, Zhou, Zhang, Stanley
2016, "The H-index of a network node and its relation to degree and
coreness"): start from v0 = degree and repeatedly set each node's value
to the H-index of its neighbors' values; the sequence is pointwise
monotone non-increasing and converges exactly to coreness. Each round
is ONE slim join (adjacency x current values, both sides structurally
non-empty -> streaming safe_join) and ONE coarse-sharded vectorized
H-index groupby (sort + cumcount + min/max, one C call per shard task
— never one Python call per node). Convergence is detected by the
value SUM (free from the per-round aggregate): pointwise monotonicity
makes sum-equality equivalent to a fixpoint. Rounds are capped and
non-convergence raises loudly (label_propagation convention); the
planted graph converges in 7-8.

The ORACLE is the classic Batagelj-Zaversnik peel — an INDEPENDENT
sequential algorithm (state/oracle_dump_train.py) whose agreement with
the H-index iteration is a much stronger check than re-running the
same kernels single-process.

100 TB story: adjacency and values stay distributed (2|E| and |V|
rows, payload-free); per-round cost is one keyed join + one sharded
groupby over ints; round count is the graph's H-index iteration depth
(small for web graphs); nothing node- or edge-sized ever lands on the
driver — the only driver state is one int64 sum per round.

Reference analogue: /root/reference/app.py has no graph surface; brief
scope (training-data / web-graph curation operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from ..remote import remote_fn

_QG = "khl_pdf_ocr_ray.pipelines.queries_graph"

CORE_NODES = 100       # planted node-id space (shared with the doc graph)
CORE_MAX_ROUNDS = 64   # loud-failure cap on H-index iterations
CORE_BROADCAST_MAX = 1 << 20  # value tables below this attach map-side
CORE_SHARDS = 32       # coarse node shards for the H-index pass
_MULT_U = 2654435761   # Knuth multiplicative constant (repo-wide)


def _mod(x, d: int):
    return pc.subtract(x, pc.multiply(pc.divide(x, d), d))


def graph_edge_partial(batch: pa.Table) -> pa.Table:
    """doc_id -> skewed planted edge (lo < hi), per-batch distinct."""
    d = batch["doc_id"]
    a = _mod(d, CORE_NODES)
    b = _mod(pc.divide(d, 7), CORE_NODES)
    u = pc.divide(pc.multiply(a, a), CORE_NODES)
    v = pc.divide(pc.multiply(b, b), CORE_NODES)
    t = pa.table(
        {
            "lo": pc.min_element_wise(u, v),
            "hi": pc.max_element_wise(u, v),
        }
    ).filter(pc.not_equal(u, v))
    g = t.group_by(["lo", "hi"]).aggregate([([], "count_all")])
    return g.select(["lo", "hi"])


def edge_undirect(batch: pa.Table) -> pa.Table:
    """Distinct (lo, hi) -> both directions + the src's H-index shard."""
    lo = pc.cast(batch["lo"], pa.int64()).combine_chunks()
    hi = pc.cast(batch["hi"], pa.int64()).combine_chunks()
    t = pa.table(
        {
            "src": pa.concat_arrays([lo, hi]),
            "dst": pa.concat_arrays([hi, lo]),
        }
    )
    return t.append_column("ushard", _mod(pc.multiply(t["src"], _MULT_U), CORE_SHARDS))


def edge_project(batch: pa.Table) -> pa.Table:
    return batch.select(["lo", "hi"])


def src_to_node(batch: pa.Table) -> pa.Table:
    return pa.table({"node": batch["src"], "val": batch["val"]})


def hindex_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One node shard of (src, neighbor val) rows -> (node, val=H-index),
    vectorized: sort desc, 1-based rank r, H = max(min(val, r))."""
    if g.empty:
        return pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "val": pd.Series(dtype="int64")}
        )
    g = g.sort_values(["src", "nval"], ascending=[True, False], kind="mergesort")
    r = g.groupby("src", sort=False).cumcount().to_numpy() + 1
    h = np.minimum(g["nval"].to_numpy(), r)
    out = (
        pd.DataFrame({"node": g["src"].to_numpy(), "val": h})
        .groupby("node", as_index=False)["val"]
        .max()
    )
    return out.astype({"node": "int64", "val": "int64"})


def nval_project(batch: pa.Table) -> pa.Table:
    return pa.table(
        {"src": batch["src"], "ushard": batch["ushard"], "nval": batch["val"]}
    )


def attach_vals_broadcast(batch: pa.Table, vals_ref) -> pa.Table:
    """Map-side value attach for SMALL value tables (the skew_join /
    BFS-frontier convention: broadcast the small side, skip the per-round
    Join operator). vals_ref -> (sorted nodes, vals) numpy pair; every
    dst is a positive-degree node, so the probe always hits."""
    import ray

    nodes, vals = (
        ray.get(vals_ref) if not isinstance(vals_ref, tuple) else vals_ref
    )
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(nodes, dst)
    assert (nodes[pos] == dst).all(), "dst outside the value table"
    return pa.table(
        {
            "src": batch["src"],
            "ushard": batch["ushard"],
            "nval": pa.array(vals[pos], pa.int64()),
        }
    )


def q_doc_graph_coreness(sf_dir: str) -> rd.Dataset:
    """(node, coreness) for every node of the planted skewed doc graph,
    by distributed H-index iteration. See module docstring."""
    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(remote_fn(_QG, "graph_edge_partial"), batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="m"))
        .map_batches(remote_fn(_QG, "edge_project"), batch_format="pyarrow")
    )
    adj = edges.map_batches(
        remote_fn(_QG, "edge_undirect"), batch_format="pyarrow"
    ).materialize()  # reused every round; 2|E| slim rows
    n_adj = adj.count()  # free from materialized metadata
    nparts = partitions_for_rows(n_adj)

    if n_adj <= CORE_BROADCAST_MAX:
        # the REDUCED adjacency (2|E| host-pair-class rows) fits the
        # broadcast cap: the distributed part of the operator is exactly
        # the corpus-sized edge reduction above; the H-index iteration
        # folds on the driver WITH THE SAME KERNELS (bit-identity by
        # construction; the independent peel oracle covers the result).
        # The join loop below is the web-scale (corpus-sized |V|) path.
        at = pa.concat_tables(
            [b for b in adj.iter_batches(batch_format="pyarrow") if len(b)]
        )
        deg = (
            at.select(["src"])
            .to_pandas()
            .groupby("src", as_index=False)
            .size()
            .rename(columns={"size": "val"})
        )
        nodes_np = deg["src"].to_numpy(dtype=np.int64)
        vals_np = deg["val"].to_numpy(dtype=np.int64)
        order = np.argsort(nodes_np)
        nodes_np, vals_np = nodes_np[order], vals_np[order]
        prev = int(vals_np.sum())
        for _ in range(CORE_MAX_ROUNDS):
            nv = attach_vals_broadcast(at, (nodes_np, vals_np))
            vdf = hindex_shard(nv.to_pandas()).sort_values("node")
            nodes_np = vdf["node"].to_numpy(dtype=np.int64)
            vals_np = vdf["val"].to_numpy(dtype=np.int64)
            cur = int(vals_np.sum())
            if cur == prev:
                return rd.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(nodes_np, pa.int64()),
                            "coreness": pa.array(vals_np, pa.int64()),
                        }
                    )
                )
            prev = cur
        raise RuntimeError(
            f"doc_graph_coreness: H-index iteration did not converge in "
            f"{CORE_MAX_ROUNDS} rounds (sum={prev}); the planted graph "
            "converges in <10 — investigate the input before raising the cap"
        )

    # v0 = degree: one adjacency row per (src, neighbor)
    values = (
        adj.groupby("src")
        .aggregate(Count(alias_name="val"))
        .map_batches(remote_fn(_QG, "src_to_node"), batch_format="pyarrow")
        .materialize()
    )
    prev_sum = int(values.sum("val") or 0)

    import ray

    for _ in range(CORE_MAX_ROUNDS):
        n_vals = values.count()  # free from materialized metadata
        if n_vals <= CORE_BROADCAST_MAX:
            # small value table: broadcast (sorted node, val) arrays and
            # attach map-side — no Join operator this round (the
            # BFS-frontier / skew_join convention). At web scale |V| is
            # corpus-sized and the keyed join below carries the rounds.
            nd, vl = [], []
            for b in values.iter_batches(batch_format="pyarrow"):
                nd.append(b["node"].to_numpy(zero_copy_only=False))
                vl.append(b["val"].to_numpy(zero_copy_only=False))
            nodes_np = np.concatenate(nd).astype(np.int64)
            vals_np = np.concatenate(vl).astype(np.int64)
            order = np.argsort(nodes_np)
            ref = ray.put((nodes_np[order], vals_np[order]))
            nvals = adj.map_batches(
                remote_fn(_QG, "attach_vals_broadcast", vals_ref=ref),
                batch_format="pyarrow",
            )
        else:
            joined = safe_join(
                adj,
                values,
                on=("dst",),
                right_on=("node",),
                assume_non_empty=True,
                num_partitions=nparts,
            )
            nvals = joined.map_batches(
                remote_fn(_QG, "nval_project"), batch_format="pyarrow"
            )
        values = (
            nvals.groupby("ushard")
            .map_groups(remote_fn(_QG, "hindex_shard"), batch_format="pandas")
            .materialize()  # |V| rows; consumed by the sum and next join
        )
        cur_sum = int(values.sum("val") or 0)
        if cur_sum == prev_sum:
            # pointwise monotone non-increasing -> equal sums == fixpoint
            return select_rename_ds(values)
        prev_sum = cur_sum
    raise RuntimeError(
        f"doc_graph_coreness: H-index iteration did not converge in "
        f"{CORE_MAX_ROUNDS} rounds (sum={prev_sum}); the planted graph "
        "converges in <10 — investigate the input before raising the cap"
    )


def coreness_rename(batch: pa.Table) -> pa.Table:
    return pa.table({"node": batch["node"], "coreness": batch["val"]})


def select_rename_ds(values: rd.Dataset) -> rd.Dataset:
    return values.map_batches(
        remote_fn(_QG, "coreness_rename"), batch_format="pyarrow"
    )


GRAPH_QUERIES = {
    "doc_graph_coreness": q_doc_graph_coreness,
}
