"""Graph additions: double-sweep diameter, label-propagation
communities, and a Borůvka minimum spanning forest.

- ``graph_diameter_sweep`` — the classic double-sweep diameter lower
  bound (Magnien, Latapy, Habib 2009): BFS from a pinned start, BFS
  again from the farthest node found (tie -> min id); the second
  eccentricity is the reported bound (exact on trees, near-exact on
  web-ish graphs). Composes the frontier-expansion BFS of
  queries_bfs (``bfs_depths_from``) twice over ONE materialized edge
  Dataset. Oracle: static SQL — two recursive CTE walks with the peak
  picked by the same (depth DESC, node) rule.
- ``graph_label_communities`` — SEEDED label propagation (the
  deterministic, semi-supervised variant of Raghavan et al. 2007 /
  Zhu-Ghahramani label spreading): anchor nodes (id % LPA_COMM == 0)
  start with their own id, everyone else unlabeled; each synchronous
  round, an unlabeled node with labeled neighbors adopts the label
  with "max labeled-neighbor count, tie -> min label", and labels
  FREEZE once assigned. Monotone -> converges in <= diameter rounds,
  order- and batching-independent. (Plain sync LPA with a min-label
  tie rule degenerates: from identity labels, round one is an
  all-ties cascade that floods small labels across bridges —
  seeding is what makes the deterministic variant actually find
  communities.) The tie rule is packed into one int64 so both the
  distributed and the driver-fold branch reduce with a plain Max:
  key = cnt * 2^20 + (2^20 - 1 - lbl) — max key == (max cnt, min lbl);
  labels must fit 20 bits (asserted; a web-scale deployment re-splits
  the pack at 40-bit label width and 23-bit counts). Unreached nodes
  report community -1.
  Graph: a planted 3-community structure (dense intra-community ring
  offsets + sparse mid-block bridges) so propagation has real
  competition at the bridge fringes. Oracle: an INDEPENDENT
  sequential twin (dict/Counter rounds, no shared kernels) dumped to
  parquet.
- ``graph_mst_boruvka`` — minimum spanning forest by Borůvka rounds
  under the total edge order (w, lo, hi). Tie-broken lexicographic
  order == strictly-distinct perturbed weights, so the MSF is UNIQUE
  and the oracle can be an INDEPENDENT ALGORITHM: Kruskal with
  union-find (dumped to parquet) must produce byte-identical edges.
  Plan per round: comp labels (|V|-bounded) broadcast via ray.put ->
  map-side cross-component filter + per-batch per-comp min-edge
  combiner over the DISTRIBUTED edge Dataset -> groupby(comp).Min(k)
  with k = w * 2^40 + lo * 2^20 + hi -> <=|comps| selected rows to the
  driver -> union-find contraction (new comp = min member, so labels
  stay deterministic). Edges never land on the driver; rounds <=
  log2(|V|). Driver comp state is vertex-bounded — the documented
  upgrade when |V| outgrows one machine is the pointer-doubling label
  machinery of redirect_resolve / embedding_clusters.

100 TB notes: all three derive edges with the corpus-sized distinct
reduction ONCE and then operate on vertex/edge-bounded state; BFS
rounds are diameter-bounded, LPA rounds fixed, Borůvka logarithmic.

Reference analogue: /root/reference/app.py has no graph surface; brief
scope (web-graph curation family).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..remote import remote_fn

_QGY = "khl_pdf_ocr_ray.pipelines.queries_graphy"

# --- label-propagation planted community graph ------------------------------
LPA_NODES = 90
LPA_COMM = 30  # 3 communities of 30
LPA_BRIDGE_EVERY = 13
LPA_BRIDGE_AT = 5  # bridges leave mid-block nodes (u % LPA_COMM == 5)
LPA_MAX_ROUNDS = 64
LPA_PACK = 1 << 20  # label width of the (count, -label) pack
LPA_FOLD_MAX = 1 << 20  # adjacency under this -> driver-fold rounds
LPA_BROADCAST_MAX = 1 << 20  # label table under this -> map-side attach

# --- Borůvka MSF ------------------------------------------------------------
MST_NODES = 100  # == queries_train.TRI_NODES edge arithmetic
MST_MAX_ROUNDS = 24


def lpa_edge_partial(batch: pa.Table) -> pa.Table:
    """doc_id -> planted community edges, canonical lo < hi, per-batch
    distinct. Intra-community: node -> same community at ring offset
    1 + (doc_id // LPA_NODES) % 7; bridges: every 13th doc whose node
    sits at the mid-block position links it to the next block."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = d % LPA_NODES
    base = (u // LPA_COMM) * LPA_COMM
    v = base + ((u % LPA_COMM) + 1 + (d // LPA_NODES) % 7) % LPA_COMM
    bm = (d % LPA_BRIDGE_EVERY == 0) & (u % LPA_COMM == LPA_BRIDGE_AT)
    bu = u[bm]
    bv = (bu + LPA_COMM) % LPA_NODES
    a = np.concatenate([u, bu])
    b = np.concatenate([v, bv])
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    return (
        pa.table({"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())})
        .group_by(["lo", "hi"])
        .aggregate([])
    )


def lpa_undirect(batch: pa.Table) -> pa.Table:
    """(lo, hi) -> both directions (src, dst)."""
    lo = batch["lo"].to_numpy(zero_copy_only=False)
    hi = batch["hi"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "src": pa.array(np.concatenate([lo, hi]), pa.int64()),
            "dst": pa.array(np.concatenate([hi, lo]), pa.int64()),
        }
    )


def lpa_pack_round(src: np.ndarray, nbr_lbl: np.ndarray):
    """THE shared per-round kernel: (edge src, neighbor's label) pairs
    -> per-src packed (count, -label) max key -> new label per src.
    Vectorized: sort by (src, lbl), run-length the (src, lbl) groups,
    pack, segment-max per src. Returns (nodes_sorted, new_labels)."""
    assert len(src), "lpa_pack_round on an edgeless graph"
    assert nbr_lbl.max(initial=0) < LPA_PACK, "label exceeds 20-bit pack"
    order = np.lexsort((nbr_lbl, src))
    s, l = src[order], nbr_lbl[order]
    new_grp = np.empty(len(s), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (s[1:] != s[:-1]) | (l[1:] != l[:-1])
    gidx = np.cumsum(new_grp) - 1
    cnt = np.bincount(gidx)
    gs = s[new_grp]
    gl = l[new_grp]
    key = cnt * LPA_PACK + (LPA_PACK - 1 - gl)
    # segment max of key per src
    sorder = np.lexsort((key, gs))
    gs2, key2 = gs[sorder], key[sorder]
    last = np.empty(len(gs2), dtype=bool)
    last[-1] = True
    last[:-1] = gs2[1:] != gs2[:-1]
    nodes = gs2[last]
    best = key2[last]
    lbl = (LPA_PACK - 1) - (best % LPA_PACK)
    return nodes, lbl


def lpa_count_partial(batch: pa.Table) -> pa.Table:
    """(src-unlabeled, dst-labeled) joined rows -> per-batch
    (src, lbl, cnt) partials: keep rows with slbl == -1 and dlbl != -1,
    count the dst label per src."""
    slbl = batch["slbl"].to_numpy(zero_copy_only=False).astype(np.int64)
    dlbl = batch["dlbl"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = (slbl == -1) & (dlbl != -1)
    t = batch.filter(pa.array(keep))
    g = (
        pa.table({"src": t["src"], "lbl": t["dlbl"]})
        .group_by(["src", "lbl"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {"src": g["src"], "lbl": g["lbl"], "cnt": g["count_all"]}
    )


def lpa_pack_batch(batch: pa.Table) -> pa.Table:
    """(src, lbl, cnt) -> (src, key) with the shared pack."""
    lbl = batch["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert lbl.max(initial=0) < LPA_PACK, "label exceeds 20-bit pack"
    key = cnt * LPA_PACK + (LPA_PACK - 1 - lbl)
    return pa.table({"src": batch["src"], "key": pa.array(key, pa.int64())})


def lpa_decode_batch(batch: pa.Table) -> pa.Table:
    """(src, max key) -> (node, lbl)."""
    key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    lbl = (LPA_PACK - 1) - (key % LPA_PACK)
    return pa.table(
        {"node": batch["src"], "lbl": pa.array(lbl, pa.int64())}
    )


def lpa_attach_broadcast(batch: pa.Table, lbl_ref) -> pa.Table:
    """Edge batch + broadcast (sorted nodes, labels) -> per-batch
    (src, lbl, cnt) partials over (src unlabeled, dst labeled) rows
    (map-side attach: no Join operator this round)."""
    import ray

    nodes, lbls = (
        ray.get(lbl_ref) if not isinstance(lbl_ref, tuple) else lbl_ref
    )
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    slbl = lbls[np.searchsorted(nodes, src)]
    dlbl = lbls[np.searchsorted(nodes, dst)]
    keep = (slbl == -1) & (dlbl != -1)
    g = (
        pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "lbl": pa.array(dlbl[keep], pa.int64()),
            }
        )
        .group_by(["src", "lbl"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {"src": g["src"], "lbl": g["lbl"], "cnt": g["count_all"]}
    )


def q_graph_label_communities(sf_dir: str) -> rd.Dataset:
    """(node, community) after seeded label propagation converges
    (community == -1 for nodes no anchor can reach)."""
    from ..joins import safe_join
    from .queries import _t

    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QGY, "lpa_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["lo", "hi"])
    )
    adj = edges.map_batches(
        remote_fn(_QGY, "lpa_undirect"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    n_adj = adj.count()

    if n_adj <= LPA_FOLD_MAX:
        # reduced adjacency fits: the distributed work is the corpus ->
        # distinct-edge reduction above; rounds fold driver-side with
        # the SAME pack kernel (forced-branch equality in tests).
        at = pa.concat_tables(
            [b for b in adj.iter_batches(batch_format="pyarrow") if len(b)]
        )
        src = at["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = at["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.unique(src)
        lbls = np.where(nodes % LPA_COMM == 0, nodes, -1)
        for _ in range(LPA_MAX_ROUNDS):
            slbl = lbls[np.searchsorted(nodes, src)]
            dlbl = lbls[np.searchsorted(nodes, dst)]
            m = (slbl == -1) & (dlbl != -1)
            if not m.any():
                break
            up_nodes, up_lbls = lpa_pack_round(src[m], dlbl[m])
            lbls[np.searchsorted(nodes, up_nodes)] = up_lbls
        else:
            raise RuntimeError(
                f"graph_label_communities: not converged in "
                f"{LPA_MAX_ROUNDS} rounds"
            )
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "community": pa.array(lbls, pa.int64()),
                }
            )
        )

    import ray

    labels = (
        adj.groupby("src")
        .aggregate(Min("src", alias_name="_s"))
        .map_batches(
            remote_fn(_QGY, "lpa_init_labels"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    for _ in range(LPA_MAX_ROUNDS):
        n_lbl = labels.count()
        if n_lbl <= LPA_BROADCAST_MAX:
            nd, lb = [], []
            for b in labels.iter_batches(batch_format="pyarrow"):
                nd.append(b["node"].to_numpy(zero_copy_only=False))
                lb.append(b["lbl"].to_numpy(zero_copy_only=False))
            nodes = np.concatenate(nd).astype(np.int64)
            lbls = np.concatenate(lb).astype(np.int64)
            order = np.argsort(nodes)
            ref = ray.put((nodes[order], lbls[order]))
            counts = adj.map_batches(
                remote_fn(_QGY, "lpa_attach_broadcast", lbl_ref=ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            lab_d = labels.map_batches(
                remote_fn(_QGY, "lpa_as_dst"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            lab_s = labels.map_batches(
                remote_fn(_QGY, "lpa_as_src"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            j1 = safe_join(
                adj,
                lab_d,
                on=("dst",),
                right_on=("dn",),
                assume_non_empty=True,
                num_partitions=8,
            )
            j2 = safe_join(
                j1,
                lab_s,
                on=("src",),
                right_on=("sn",),
                assume_non_empty=True,
                num_partitions=8,
            )
            counts = j2.map_batches(
                remote_fn(_QGY, "lpa_count_partial"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        new = (
            counts.groupby(["src", "lbl"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .map_batches(
                remote_fn(_QGY, "lpa_pack_batch"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("src")
            .aggregate(Max("key", alias_name="key"))
            .map_batches(
                remote_fn(_QGY, "lpa_decode_batch"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        if new.count() == 0:
            break
        labeled = labels.map_batches(
            remote_fn(_QGY, "lpa_filter_labeled"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        unlab = labels.map_batches(
            remote_fn(_QGY, "lpa_filter_unlabeled"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        new_r = new.map_batches(
            remote_fn(_QGY, "lpa_as_probe"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        still = safe_join(
            unlab,
            new_r,
            on=("node",),
            right_on=("pn",),
            join_type="left_anti",
            assume_non_empty=True,
            num_partitions=1,
        )
        labels = labeled.union(new).union(still).materialize()
    else:
        raise RuntimeError(
            f"graph_label_communities: not converged in {LPA_MAX_ROUNDS} "
            "rounds"
        )
    return labels.map_batches(
        remote_fn(_QGY, "lpa_rename_out"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lpa_init_labels(batch: pa.Table) -> pa.Table:
    node = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    lbl = np.where(node % LPA_COMM == 0, node, -1)
    return pa.table(
        {"node": pa.array(node, pa.int64()), "lbl": pa.array(lbl, pa.int64())}
    )


def lpa_as_dst(batch: pa.Table) -> pa.Table:
    return pa.table({"dn": batch["node"], "dlbl": batch["lbl"]})


def lpa_as_src(batch: pa.Table) -> pa.Table:
    return pa.table({"sn": batch["node"], "slbl": batch["lbl"]})


def lpa_as_probe(batch: pa.Table) -> pa.Table:
    return pa.table({"pn": batch["node"]})


def lpa_filter_labeled(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.not_equal(batch["lbl"], -1)).select(
        ["node", "lbl"]
    )


def lpa_filter_unlabeled(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch["lbl"], -1)).select(["node", "lbl"])


def lpa_rename_out(batch: pa.Table) -> pa.Table:
    return pa.table({"node": batch["node"], "community": batch["lbl"]})


def lpa_sequential(doc_ids) -> Dict[int, int]:
    """INDEPENDENT oracle twin: dict/Counter seeded rounds (no shared
    kernels, no packing) over the same planted edges."""
    from collections import Counter, defaultdict

    edges = set()
    for d in doc_ids:
        d = int(d)
        u = d % LPA_NODES
        base = (u // LPA_COMM) * LPA_COMM
        v = base + ((u % LPA_COMM) + 1 + (d // LPA_NODES) % 7) % LPA_COMM
        if u != v:
            edges.add((min(u, v), max(u, v)))
        if d % LPA_BRIDGE_EVERY == 0 and u % LPA_COMM == LPA_BRIDGE_AT:
            w = (u + LPA_COMM) % LPA_NODES
            if u != w:
                edges.add((min(u, w), max(u, w)))
    nbrs = defaultdict(list)
    for lo, hi in edges:
        nbrs[lo].append(hi)
        nbrs[hi].append(lo)
    lbl = {v: (v if v % LPA_COMM == 0 else -1) for v in nbrs}
    for _ in range(LPA_MAX_ROUNDS):
        nxt = dict(lbl)
        changed = False
        for v, ns in nbrs.items():
            if lbl[v] != -1:
                continue
            c = Counter(lbl[n] for n in ns if lbl[n] != -1)
            if not c:
                continue
            nxt[v] = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            changed = True
        lbl = nxt
        if not changed:
            break
    return lbl


# --- Borůvka minimum spanning forest ----------------------------------------
def mst_edge_partial(batch: pa.Table) -> pa.Table:
    """doc_id -> planted weighted edges (lo, hi, w), per-batch distinct
    (w is a pure function of (lo, hi), so distinct-(lo,hi) suffices)."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = d % MST_NODES
    v = (d // 7) % MST_NODES
    keep = u != v
    lo = np.minimum(u[keep], v[keep])
    hi = np.maximum(u[keep], v[keep])
    t = (
        pa.table({"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())})
        .group_by(["lo", "hi"])
        .aggregate([])
    )
    return t


def mst_weight(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """THE shared deterministic weight: w = 1 + (lo*31 + hi*17) % 97."""
    return 1 + (lo * 31 + hi * 17) % 97


def mst_key(lo: np.ndarray, hi: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Total-order pack: k = w * 2^40 + lo * 2^20 + hi (unique per
    edge; min k == lexicographic min (w, lo, hi))."""
    return w * (1 << 40) + lo * (1 << 20) + hi


def mst_min_edge_partial(batch: pa.Table, comp_ref) -> pa.Table:
    """Edge batch + broadcast comp labels -> per-batch per-component
    min-edge partials (comp, k): each CROSS-component edge contends for
    both endpoint components."""
    import ray

    nodes, comp = (
        ray.get(comp_ref) if not isinstance(comp_ref, tuple) else comp_ref
    )
    lo = batch["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = batch["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
    clo = comp[np.searchsorted(nodes, lo)]
    chi = comp[np.searchsorted(nodes, hi)]
    cross = clo != chi
    lo, hi, clo, chi = lo[cross], hi[cross], clo[cross], chi[cross]
    k = mst_key(lo, hi, mst_weight(lo, hi))
    t = pa.table(
        {
            "comp": pa.array(np.concatenate([clo, chi]), pa.int64()),
            "k": pa.array(np.concatenate([k, k]), pa.int64()),
        }
    )
    g = t.group_by(["comp"]).aggregate([("k", "min")])
    return pa.table({"comp": g["comp"], "k": g["k_min"]})


def q_graph_mst_boruvka(sf_dir: str) -> pd.DataFrame:
    """(lo, hi, w) minimum-spanning-forest edges. See module docstring."""
    import ray

    from .queries import _t

    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QGY, "mst_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["lo", "hi"])
        .materialize()
    )
    # vertex set (vertex-bounded driver state; see module docstring)
    lo_hi = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow") if len(b)]
    )
    nodes = np.unique(
        np.concatenate(
            [
                lo_hi["lo"].to_numpy(zero_copy_only=False),
                lo_hi["hi"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
    )
    comp = nodes.copy()
    chosen: set = set()
    for _ in range(MST_MAX_ROUNDS):
        ref = ray.put((nodes, comp))
        sel = (
            edges.map_batches(
                remote_fn(_QGY, "mst_min_edge_partial", comp_ref=ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("comp")
            .aggregate(Min("k", alias_name="k"))
            .to_pandas()
        )
        if len(sel) == 0:
            break
        ks = np.unique(sel["k"].to_numpy().astype(np.int64))
        w = ks >> 40
        lo = (ks >> 20) & ((1 << 20) - 1)
        hi = ks & ((1 << 20) - 1)
        # union-find contraction; new component label = min member
        parent = {int(c): int(c) for c in np.unique(comp)}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        merged = False
        pos = np.searchsorted(nodes, lo)
        pos_h = np.searchsorted(nodes, hi)
        for i in range(len(ks)):
            a, b = find(int(comp[pos[i]])), find(int(comp[pos_h[i]]))
            if a != b:
                merged = True
                chosen.add((int(lo[i]), int(hi[i]), int(w[i])))
                ra, rb = (a, b) if a < b else (b, a)
                parent[rb] = ra
        if not merged:
            break
        comp = np.array([find(int(c)) for c in comp], dtype=np.int64)
    else:
        raise RuntimeError(
            f"graph_mst_boruvka: not contracted after {MST_MAX_ROUNDS} "
            "rounds — investigate the edge derivation"
        )
    out = sorted(chosen)
    return pd.DataFrame(out, columns=["lo", "hi", "w"]).astype("int64")


def mst_kruskal_sequential(doc_ids):
    """INDEPENDENT oracle twin: Kruskal under the same (w, lo, hi)
    total order, classic union-find (different algorithm — agreement
    certifies the unique MSF of the perturbed weights)."""
    edges = set()
    for d in doc_ids:
        d = int(d)
        u, v = d % MST_NODES, (d // 7) % MST_NODES
        if u != v:
            edges.add((min(u, v), max(u, v)))
    ew = sorted(
        (1 + (lo * 31 + hi * 17) % 97, lo, hi) for lo, hi in edges
    )
    parent: Dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for w, lo, hi in ew:
        a, b = find(lo), find(hi)
        if a != b:
            parent[max(a, b)] = min(a, b)
            out.append((lo, hi, w))
    return sorted(out)


# --- double-sweep diameter --------------------------------------------------
def q_graph_diameter_sweep(sf_dir: str) -> pd.DataFrame:
    """One row: (start_node, start_ecc, peak_node, far_node,
    diameter_lb) — double-sweep over the BFS ring/chord graph."""
    from .queries_bfs import BFS_SEED, bfs_depths_from, bfs_edges_ds

    edges = bfs_edges_ds(sf_dir)

    def peak(depths: rd.Dataset):
        row = (
            depths.sort(["depth", "node"], descending=[True, False])
            .limit(1)
            .take_all()[0]
        )
        return int(row["node"]), int(row["depth"])

    a, ecc_start = peak(bfs_depths_from(edges, BFS_SEED))
    b, diameter_lb = peak(bfs_depths_from(edges, a))
    return pd.DataFrame(
        [(BFS_SEED, ecc_start, a, b, diameter_lb)],
        columns=[
            "start_node",
            "start_ecc",
            "peak_node",
            "far_node",
            "diameter_lb",
        ],
    ).astype("int64")


def _sweep_sql() -> str:
    from .queries_bfs import (
        BFS_CHORD,
        BFS_CHORD_EVERY,
        BFS_MAX_ROUNDS,
        BFS_NODES,
        BFS_SEED,
    )

    return f"""
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
), w1(node, depth) AS (
  SELECT CAST({BFS_SEED} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, w.depth + 1 FROM w1 w JOIN e ON e.src = w.node
  WHERE w.depth < {BFS_MAX_ROUNDS}
), d1 AS (SELECT node, min(depth) AS depth FROM w1 GROUP BY node),
a AS (SELECT node, depth FROM d1 ORDER BY depth DESC, node LIMIT 1),
w2(node, depth) AS (
  SELECT node, CAST(0 AS BIGINT) FROM a
  UNION
  SELECT e.dst, w.depth + 1 FROM w2 w JOIN e ON e.src = w.node
  WHERE w.depth < {BFS_MAX_ROUNDS}
), d2 AS (SELECT node, min(depth) AS depth FROM w2 GROUP BY node),
b AS (SELECT node, depth FROM d2 ORDER BY depth DESC, node LIMIT 1)
SELECT CAST({BFS_SEED} AS BIGINT) AS start_node,
       a.depth AS start_ecc, a.node AS peak_node,
       b.node AS far_node, b.depth AS diameter_lb
FROM a, b
"""


# --- dump-backed oracles ----------------------------------------------------
def _dumps_dir(sf_dir: str) -> str:
    from ..state.atomic import content_keyed_dir

    return content_keyed_dir(
        os.path.abspath(__file__),
        os.path.join(sf_dir, "documents.parquet"),
        "oracle_dumps_graphy",
    )


def ensure_graphy_dumps(sf_dir: str) -> str:
    """Build (once, content-keyed) the sequential-twin parquet dumps:
    lpa_seq.parquet (node, community), mst_kruskal.parquet (lo, hi, w)
    and ppr_seq.parquet (node, ppr_fx)."""
    from ..state.atomic import ensure_published

    out_dir = _dumps_dir(sf_dir)

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        doc_ids = (
            pq.read_table(
                os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
            )["doc_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lbl = lpa_sequential(doc_ids)
        ns = sorted(lbl)
        pq.write_table(
            pa.table(
                {
                    "node": pa.array(ns, pa.int64()),
                    "community": pa.array([lbl[n] for n in ns], pa.int64()),
                }
            ),
            os.path.join(tmp, "lpa_seq.parquet"),
        )
        mst = mst_kruskal_sequential(doc_ids)
        pq.write_table(
            pa.table(
                {
                    "lo": pa.array([e[0] for e in mst], pa.int64()),
                    "hi": pa.array([e[1] for e in mst], pa.int64()),
                    "w": pa.array([e[2] for e in mst], pa.int64()),
                }
            ),
            os.path.join(tmp, "mst_kruskal.parquet"),
        )
        ppr = ppr_sequential(doc_ids)
        ns2 = sorted(ppr)
        pq.write_table(
            pa.table(
                {
                    "node": pa.array(ns2, pa.int64()),
                    "ppr_fx": pa.array([ppr[n] for n in ns2], pa.int64()),
                }
            ),
            os.path.join(tmp, "ppr_seq.parquet"),
        )

    ensure_published(out_dir, build)
    return out_dir


def graphy_oracle_sqls(sf_dir: str) -> Dict[str, str]:
    d = ensure_graphy_dumps(sf_dir)
    return {
        "graph_label_communities": (
            "SELECT node, community FROM "
            f"read_parquet('{os.path.join(d, 'lpa_seq.parquet')}')"
        ),
        "graph_mst_boruvka": (
            "SELECT lo, hi, w FROM "
            f"read_parquet('{os.path.join(d, 'mst_kruskal.parquet')}')"
        ),
        "graph_ppr": (
            "SELECT node, ppr_fx FROM "
            f"read_parquet('{os.path.join(d, 'ppr_seq.parquet')}')"
        ),
    }




# --- personalized PageRank ---------------------------------------------------
# Seed-personalized PageRank (the "random surfer restarts at the SEED
# SET" variant — crawl-frontier prioritization / topic-conditioned host
# trust next to the global host_pagerank). Directed planted edges
# u = doc_id % MST_NODES -> v = (doc_id // 7) % MST_NODES (u != v,
# distinct); all-integer fixed point:
#   rank0(v)   = PPR_SCALE for seeds, 0 otherwise
#   contrib(e) = (r_src * 85) // (out_src * 100)
#   rank'(v)   = teleport(v) + sum of incoming contribs,
#   teleport(v) = PPR_SCALE * 15 // 100 for seeds, 0 otherwise.
# Dangling nodes leak damped mass (the host_pagerank simplification).
# Two regimes share the vectorized round kernel: a driver fold when the
# reduced edge table is under PPR_FOLD_MAX, else per-round [broadcast
# vertex-bounded ranks -> map-side contrib combiner -> dst-keyed Sum ->
# union with the teleport rows -> node-keyed Sum] — no join operator
# anywhere (the teleport union replaces the left join). The oracle is
# an INDEPENDENT dict/loop sequential implementation (no shared
# kernels) dumped to parquet.
PPR_SCALE = 1 << 20
PPR_SEEDS = (0, 7, 42)
PPR_ITERS = 3
PPR_TELEPORT = PPR_SCALE * 15 // 100
PPR_FOLD_MAX = 1 << 20


def ppr_edge_partial(batch: pa.Table) -> pa.Table:
    """doc_id -> directed planted edges (src, dst), per-batch distinct."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = d % MST_NODES
    v = (d // 7) % MST_NODES
    keep = u != v
    return (
        pa.table(
            {
                "src": pa.array(u[keep], pa.int64()),
                "dst": pa.array(v[keep], pa.int64()),
            }
        )
        .group_by(["src", "dst"])
        .aggregate([])
    )


PPR_DAMP_NUM, PPR_DAMP_DEN = 85, 100


def ppr_contrib_ints(r_src: np.ndarray, out_src: np.ndarray) -> np.ndarray:
    """THE per-edge damped contribution — the ONE place the damping
    formula lives (fold branch, broadcast partials and the sequential
    twin all pass identical operands through it)."""
    return (r_src * PPR_DAMP_NUM) // (out_src * PPR_DAMP_DEN)


def ppr_round_kernel(
    src_idx: np.ndarray,
    dst_idx: np.ndarray,
    out_src: np.ndarray,
    seed_mask: np.ndarray,
    rank: np.ndarray,
) -> np.ndarray:
    """THE shared round over PRE-RESOLVED edge-end indices: damped
    integer mass along every edge, summed per dst, plus seed teleport.
    Order-independent (integer sums after one floor division per
    edge); the loop-invariant searchsorted/isin work happens once at
    the caller."""
    contrib = ppr_contrib_ints(rank[src_idx], out_src)
    nxt = np.zeros(len(rank), dtype=np.int64)
    np.add.at(nxt, dst_idx, contrib)
    nxt[seed_mask] += PPR_TELEPORT
    return nxt


def ppr_contrib_broadcast(batch: pa.Table, rank_ref) -> pa.Table:
    """Edge batch (src, dst, out) + broadcast (sorted nodes, ranks) ->
    per-batch (dst, mass) partials (same ppr_contrib_ints formula as
    the fold branch)."""
    import ray

    nodes, rank = (
        ray.get(rank_ref) if not isinstance(rank_ref, tuple) else rank_ref
    )
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    out = batch["out"].to_numpy(zero_copy_only=False).astype(np.int64)
    contrib = ppr_contrib_ints(rank[np.searchsorted(nodes, src)], out)
    g = (
        pa.table({"node": batch["dst"], "val": pa.array(contrib, pa.int64())})
        .group_by(["node"])
        .aggregate([("val", "sum")])
    )
    return pa.table({"node": g["node"], "val": g["val_sum"]})


def ppr_attach_out_broadcast(batch: pa.Table, out_ref) -> pa.Table:
    """(src, dst) edges + broadcast (sorted srcs, outdeg) -> + out."""
    import ray

    srcs, outd = (
        ray.get(out_ref) if not isinstance(out_ref, tuple) else out_ref
    )
    s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column(
        "out", pa.array(outd[np.searchsorted(srcs, s)], pa.int64())
    )


def ppr_seed_rows(batch: pa.Table, value: int) -> pa.Table:
    """Node rows -> (node, value-for-seeds / 0) rows — the ONE
    seed-membership site for both the teleport table (value =
    PPR_TELEPORT) and the rank init (value = PPR_SCALE)."""
    nd = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = np.where(np.isin(nd, np.array(PPR_SEEDS)), value, 0)
    return pa.table(
        {"node": pa.array(nd, pa.int64()), "val": pa.array(val, pa.int64())}
    )


def ppr_rename_out(batch: pa.Table) -> pa.Table:
    return pa.table({"node": batch["node"], "ppr_fx": batch["val"]})


def q_graph_ppr(sf_dir: str) -> rd.Dataset:
    """(node, ppr_fx) after PPR_ITERS personalized-PageRank rounds."""
    import ray

    from .queries import _t

    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QGY, "ppr_edge_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["src", "dst"])
        .materialize()
    )
    n_edges = edges.count()

    if n_edges <= PPR_FOLD_MAX:
        at = pa.concat_tables(
            [b for b in edges.iter_batches(batch_format="pyarrow") if len(b)]
        )
        src = at["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = at["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        outdeg = np.bincount(
            np.searchsorted(nodes, src), minlength=len(nodes)
        )
        src_idx = np.searchsorted(nodes, src)
        dst_idx = np.searchsorted(nodes, dst)
        out_src = outdeg[src_idx].astype(np.int64)
        seed_mask = np.isin(nodes, np.array(PPR_SEEDS))
        rank = np.where(seed_mask, PPR_SCALE, 0).astype(np.int64)
        for _ in range(PPR_ITERS):
            rank = ppr_round_kernel(src_idx, dst_idx, out_src, seed_mask, rank)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "ppr_fx": pa.array(rank, pa.int64()),
                }
            )
        )

    # distributed rounds: vertex-bounded ranks broadcast each round;
    # the teleport union replaces a left join entirely
    nodes_ds = (
        edges.map_batches(
            remote_fn(_QGY, "ppr_both_ends"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
        .materialize()
    )
    outdeg = (
        edges.groupby("src").aggregate(Count(alias_name="out")).to_pandas()
    ).sort_values("src", ignore_index=True)
    out_ref = ray.put(
        (
            outdeg["src"].to_numpy().astype(np.int64),
            outdeg["out"].to_numpy().astype(np.int64),
        )
    )
    edges_w = edges.map_batches(
        remote_fn(_QGY, "ppr_attach_out_broadcast", out_ref=out_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    teleport = nodes_ds.map_batches(
        remote_fn(_QGY, "ppr_seed_rows", value=PPR_TELEPORT),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    ranks = nodes_ds.map_batches(
        remote_fn(_QGY, "ppr_seed_rows", value=PPR_SCALE),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    for _ in range(PPR_ITERS):
        nd, vl = [], []
        for b in ranks.iter_batches(batch_format="pyarrow"):
            nd.append(b["node"].to_numpy(zero_copy_only=False))
            vl.append(b["val"].to_numpy(zero_copy_only=False))
        nodes = np.concatenate(nd).astype(np.int64)
        vals = np.concatenate(vl).astype(np.int64)
        order = np.argsort(nodes)
        ref = ray.put((nodes[order], vals[order]))
        mass = edges_w.map_batches(
            remote_fn(_QGY, "ppr_contrib_broadcast", rank_ref=ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ranks = (
            mass.union(teleport)
            .groupby("node")
            .aggregate(Sum("val", alias_name="val"))
            .materialize()
        )
    return ranks.map_batches(
        remote_fn(_QGY, "ppr_rename_out"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def ppr_both_ends(batch: pa.Table) -> pa.Table:
    """(src, dst) edges -> (node) rows for both endpoints."""
    s = batch["src"].to_numpy(zero_copy_only=False)
    t = batch["dst"].to_numpy(zero_copy_only=False)
    return pa.table(
        {"node": pa.array(np.concatenate([s, t]), pa.int64())}
    )


def ppr_sequential(doc_ids) -> Dict[int, int]:
    """INDEPENDENT oracle twin: dict/loop personalized PageRank (no
    numpy kernels, no packing) over the same directed edges."""
    edges = set()
    for d in doc_ids:
        d = int(d)
        u, v = d % MST_NODES, (d // 7) % MST_NODES
        if u != v:
            edges.add((u, v))
    nodes = sorted({n for e in edges for n in e})
    out: Dict[int, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: (PPR_SCALE if v in PPR_SEEDS else 0) for v in nodes}
    for _ in range(PPR_ITERS):
        nxt = {
            v: (PPR_TELEPORT if v in PPR_SEEDS else 0) for v in nodes
        }
        for s, t in edges:
            nxt[t] += int(
                ppr_contrib_ints(
                    np.array([rank[s]], dtype=np.int64),
                    np.array([out[s]], dtype=np.int64),
                )[0]
            )
        rank = nxt
    return rank


GRAPHY_QUERIES = {
    "graph_diameter_sweep": q_graph_diameter_sweep,
    "graph_label_communities": q_graph_label_communities,
    "graph_mst_boruvka": q_graph_mst_boruvka,
    "graph_ppr": q_graph_ppr,
}
GRAPHY_ORACLES = {
    "graph_diameter_sweep": _sweep_sql(),
}
