"""Kernel-level checks for doc_graph_coreness beyond oracle parity:
the vectorized per-shard H-index against the textbook definition, and
in-process H-index iteration == classic peel on adversarial graphs
(chain, star, clique-with-tail) the planted corpus graph doesn't cover."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_graph import hindex_shard


def _h(vals):
    vals = sorted(vals, reverse=True)
    h = 0
    for i, v in enumerate(vals, 1):
        if v >= i:
            h = i
        else:
            break
    return h


def test_hindex_shard_matches_definition():
    rng = np.random.default_rng(2)
    rows = []
    expect = {}
    for node in range(40):
        vals = rng.integers(0, 12, rng.integers(1, 15)).tolist()
        expect[node] = _h(vals)
        rows += [(node, v) for v in vals]
    g = pd.DataFrame(rows, columns=["src", "nval"])
    g["ushard"] = 0
    out = hindex_shard(g).set_index("node")["val"].to_dict()
    assert out == expect


def _coreness_iterate(edges):
    """In-process H-index iteration over an adjacency dict."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    v = {u: len(s) for u, s in adj.items()}
    for _ in range(200):
        nv = {u: _h([v[w] for w in adj[u]]) for u in adj}
        if nv == v:
            return v
        v = nv
    raise AssertionError("did not converge")


def _coreness_peel(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {u: len(s) for u, s in adj.items()}
    alive = set(adj)
    core = {}
    while alive:
        k = min(deg[u] for u in alive)
        stack = [u for u in alive if deg[u] <= k]
        while stack:
            u = stack.pop()
            if u not in alive:
                continue
            core[u] = k
            alive.discard(u)
            for w in adj[u]:
                if w in alive:
                    deg[w] -= 1
                    if deg[w] <= k:
                        stack.append(w)
    return core


def test_hindex_iteration_equals_peel_on_adversarial_graphs():
    chain = [(i, i + 1) for i in range(30)]  # coreness 1 everywhere
    star = [(0, i) for i in range(1, 20)]    # hub and leaves both 1
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    tail = clique + [(4, 10), (10, 11), (11, 12)]  # 4-clique + pendant path
    for edges in (chain, star, tail):
        assert _coreness_iterate(edges) == _coreness_peel(edges)
    got = _coreness_iterate(tail)
    assert got[0] == 4 and got[12] == 1  # layered, not all-or-nothing


def test_coreness_join_path_matches_broadcast_path(ray_session, sf_smoke_dir, monkeypatch):
    """Force the large-|V| keyed-join branch (the 100 TB path) and check
    it produces the identical coreness table (branch picked driver-side)."""
    import khl_pdf_ocr_ray.pipelines.queries_graph as qg

    broadcast = qg.q_doc_graph_coreness(sf_smoke_dir).to_pandas()
    monkeypatch.setattr(qg, "CORE_BROADCAST_MAX", 0)
    joined = qg.q_doc_graph_coreness(sf_smoke_dir).to_pandas()
    a = broadcast.sort_values("node").reset_index(drop=True)
    b = joined.sort_values("node").reset_index(drop=True)
    assert a.equals(b)
