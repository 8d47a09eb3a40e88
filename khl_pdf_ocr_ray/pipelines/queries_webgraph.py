"""HITS hubs/authorities over the planted host link graph.

The second classic web-graph centrality next to PageRank (Kleinberg
1999): authority(v) = normalized sum of hub scores over in-edges,
hub(u) = normalized sum of authority scores over out-edges, iterated.
A crawl/curation pipeline uses the pair to separate link DIRECTORIES
(high hub) from link TARGETS (high authority) — PageRank alone conflates
them. Scores are int64 fixed point, max-normalized to HITS_SCALE each
half-round (functions/graph.py:hits_normalize — one shared floor
division), so any batching/partitioning is bit-identical to the
sequential twin.

Graph: the SAME deterministic planted host edges as host_pagerank
(functions/graph.py:host_edge over the synthesized pages corpus) — what
the gate certifies is the distributed iteration, not the topology.

Plan: corpus-sized work is exactly ONE pass (per-batch edge combiner ->
(src, dst) Sum); the reduced edge table is host-pair cardinality. Below
PR_BROADCAST_MAX edges the iteration folds driver-side via
hits_sequential — the same bounded-pull class as host_pagerank /
cluster_top_terms (the fold IS the shared kernel). Above the cap (web
scale, |hosts| ~ 10^7) each half-round is a slim edge<->score join ->
per-batch mass combiner -> keyed Sum -> scalar max pull -> map-only
normalize; every exchange is host- or edge-cardinality strings+ints.
100 TB headroom: raw mass <= total_pages * 2^20 stays under int64 for
< ~2^43 page-links (documented, same bound family as pagerank's).

Reference analogue: /root/reference/app.py has no graph surface; brief
scope (web-graph curation operators).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..remote import remote_fn

_QW = "khl_pdf_ocr_ray.pipelines.queries_webgraph"
_QX = "khl_pdf_ocr_ray.pipelines.queries_extract"


def hits_mass_partial(batch: pa.Table, key_out: str) -> pa.Table:
    """Joined (src, dst, w, r) rows -> per-batch integer mass sums keyed
    by ``key_out`` (dst for the authority half-round, src for the hub
    half-round). Edge-cardinality metadata rows, not corpus data."""
    sums: dict = {}
    for k, w, r in zip(
        batch[key_out].to_pylist(),
        batch["w"].to_pylist(),
        batch["r"].to_pylist(),
    ):
        sums[k] = sums.get(k, 0) + w * r
    ks = sorted(sums)
    return pa.table(
        {
            "node": pa.array(ks, pa.string()),
            "c": pa.array([sums[k] for k in ks], pa.int64()),
        }
    )


def hits_norm_coalesce(batch: pa.Table, mx: int) -> pa.Table:
    """(host LEFT JOIN raw mass) -> normalized score; nodes with no
    matching edges carry raw 0 (null -> 0), exactly like the twin."""
    from ..functions.graph import hits_normalize

    c = batch["c"].to_pylist()
    return pa.table(
        {
            "host": batch["host"],
            "r": pa.array(
                [hits_normalize(v or 0, mx) for v in c], pa.int64()
            ),
        }
    )


def hits_pack(batch: pa.Table) -> pa.Table:
    """(host, hub r, auth r2) -> final column layout."""
    return pa.table(
        {
            "host": batch["host"],
            "hub_fx": batch["r"].cast(pa.int64()),
            "auth_fx": batch["r2"].cast(pa.int64()),
        }
    )


def q_host_hits(sf_dir: str) -> rd.Dataset:
    """(host, hub_fx, auth_fx). See module docstring."""
    from ray.data.aggregate import Count, Sum as _Sum

    from ..functions.graph import HITS_ITERS, HITS_SCALE, hits_sequential
    from ..joins import _max_partitions
    from .queries_extract import _REPEAT, PR_BROADCAST_MAX, synthesize_pages

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    edges = (
        rd.read_parquet(pages_dir, columns=["url"])
        .map_batches(
            remote_fn(_QX, "pr_edges_partial"),
            batch_format="pyarrow",
        )
        .groupby(["src", "dst"])
        .aggregate(_Sum("w", alias_name="w"))
        .materialize()
    )
    n_edges = edges.count()  # free from materialized metadata
    if n_edges <= PR_BROADCAST_MAX:
        # host-pair edge table fits the broadcast cap: the distributed
        # part is exactly the corpus-sized reduction above; the
        # iteration folds driver-side with THE shared kernel (the fold
        # IS hits_sequential — bit-identity with the oracle twin by
        # construction; the forced-branch test pins the join path to it)
        parts = [
            b for b in edges.iter_batches(batch_format="pyarrow") if len(b)
        ]
        et = pa.concat_tables(parts)
        ed = {
            (s, d): w
            for s, d, w in zip(
                et["src"].to_pylist(),
                et["dst"].to_pylist(),
                et["w"].to_pylist(),
            )
        }
        nodes = sorted({k[0] for k in ed} | {k[1] for k in ed})
        ha = hits_sequential(ed, nodes)
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array(nodes, pa.string()),
                    "hub_fx": pa.array([ha[v][0] for v in nodes], pa.int64()),
                    "auth_fx": pa.array([ha[v][1] for v in nodes], pa.int64()),
                }
            )
        )
    # web-scale path: slim per-half-round joins (same single-derivation
    # sizing as host_pagerank — no per-call materialize barriers)
    nodes = (
        edges.map_batches(
            remote_fn(_QX, "pr_nodes_partial"),
            batch_format="pyarrow",
        )
        .groupby("host")
        .aggregate(Count(alias_name="n_"))
        .select_columns(["host"])
        .materialize()
    )
    n_parts = max(1, min(_max_partitions(), n_edges // 4096))

    def _half_round(edges_ds, score_ds, key_in: str, key_out: str):
        j = edges_ds.join(
            score_ds.rename_columns({"host": "rhost"}),
            join_type="inner",
            num_partitions=n_parts,
            on=(key_in,),
            right_on=("rhost",),
        )
        mass = (
            j.map_batches(
                remote_fn(_QW, "hits_mass_partial", key_out=key_out),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(_Sum("c", alias_name="c"))
            .materialize()  # consumed twice: scalar max + join
        )
        mx = int(mass.max("c") or 0)
        joined = nodes.join(
            mass,
            join_type="left_outer",
            num_partitions=n_parts,
            on=("host",),
            right_on=("node",),
        )
        return joined.map_batches(
            remote_fn(_QW, "hits_norm_coalesce", mx=mx),
            batch_format="pyarrow",
        ).materialize()  # the iterate working set (cache-the-iterate)

    hub = nodes.map_batches(
        remote_fn(_QW, "hits_init", scale=HITS_SCALE),
        batch_format="pyarrow",
    ).materialize()
    auth = hub
    for _ in range(HITS_ITERS):
        auth = _half_round(edges, hub, "src", "dst")
        hub = _half_round(edges, auth, "dst", "src")
    out = hub.join(
        auth.rename_columns({"host": "ahost", "r": "r2"}),
        join_type="inner",
        num_partitions=n_parts,
        on=("host",),
        right_on=("ahost",),
    )
    return out.map_batches(
        remote_fn(_QW, "hits_pack"), batch_format="pyarrow"
    )


def hits_init(batch: pa.Table, scale: int) -> pa.Table:
    return batch.select(["host"]).append_column(
        "r", pa.array([scale] * len(batch), pa.int64())
    )


WEBGRAPH_QUERIES = {"host_hits": q_host_hits}
# oracle: dump-backed (state/oracle_dump.py hits twin)
WEBGRAPH_ORACLES: dict = {}
