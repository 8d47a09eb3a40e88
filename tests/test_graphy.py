"""Kernel + forced-branch tests for queries_graphy (double-sweep
diameter, LPA communities, Borůvka MSF). Oracle parity runs in the
dump-twin gate (test_oracle_dumps / driver sim); here: the pack kernel
vs the Counter rule, Borůvka == Kruskal on random graphs, and the
distributed LPA branch == the driver-fold branch."""

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from khl_pdf_ocr_ray.pipelines import queries_graphy as g

RNG = np.random.default_rng(11)
SF = "/root/testdata/sf0.001"


def test_lpa_pack_round_matches_counter_rule():
    """The packed segment-max == 'max count, tie min label' per node."""
    src = RNG.integers(0, 25, size=400)
    lbl = RNG.integers(0, 12, size=400)
    nodes, new = g.lpa_pack_round(src.astype(np.int64), lbl.astype(np.int64))
    by_node = defaultdict(list)
    for s, l in zip(src, lbl):
        by_node[int(s)].append(int(l))
    for n, v in zip(nodes, new):
        c = Counter(by_node[int(n)])
        want = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        assert int(v) == want, (n, sorted(c.items()))
    assert sorted(map(int, nodes)) == sorted(by_node)


def test_lpa_sequential_recovers_planted_communities():
    """Seeded propagation on the full planted graph: labels come from
    the three anchors only, every node is reached, and the vast
    majority of nodes adopt their own block's anchor (bridges are
    sparse mid-block links, so a little fringe leakage is expected)."""
    lbl = g.lpa_sequential(range(2000))
    assert set(lbl) == set(range(g.LPA_NODES))
    anchors = {0, g.LPA_COMM, 2 * g.LPA_COMM}
    assert set(lbl.values()) <= anchors
    own = sum(
        1 for v, c in lbl.items() if v // g.LPA_COMM == c // g.LPA_COMM
    )
    assert own >= int(0.8 * g.LPA_NODES), (own, lbl)


def test_lpa_forced_branches_all_equal(ray_session, monkeypatch):
    """Three regimes, one answer: driver fold (default), distributed
    rounds with broadcast label attach (FOLD_MAX=0), and distributed
    rounds with the two-join attach (both caps 0)."""
    fold = (
        g.q_graph_label_communities(SF)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    monkeypatch.setattr(g, "LPA_FOLD_MAX", 0)
    bcast = (
        g.q_graph_label_communities(SF)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fold, bcast)
    monkeypatch.setattr(g, "LPA_BROADCAST_MAX", 0)
    joined = (
        g.q_graph_label_communities(SF)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fold, joined)


def _random_edge_docids(n_docs: int, seed: int):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 100000, size=n_docs)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_mst_kruskal_is_a_spanning_forest(seed):
    ids = _random_edge_docids(300, seed)
    mst = g.mst_kruskal_sequential(ids)
    # acyclic + spanning: |F| = |V| - #components (check via union-find)
    nodes = set()
    for d in ids:
        d = int(d)
        u, v = d % g.MST_NODES, (d // 7) % g.MST_NODES
        if u != v:
            nodes.update((u, v))
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for lo, hi, _ in mst:
        a, b = find(lo), find(hi)
        assert a != b, "cycle in MST output"
        parent[a] = b
    comps = len({find(v) for v in nodes})
    assert len(mst) == len(nodes) - comps


def test_mst_weight_key_total_order():
    lo = np.array([1, 1, 2], dtype=np.int64)
    hi = np.array([2, 3, 3], dtype=np.int64)
    w = g.mst_weight(lo, hi)
    k = g.mst_key(lo, hi, w)
    # decode roundtrip
    assert list(k >> 40) == list(w)
    assert list((k >> 20) & ((1 << 20) - 1)) == list(lo)
    assert list(k & ((1 << 20) - 1)) == list(hi)
    # distinct edges -> distinct keys
    assert len(set(k.tolist())) == 3


def test_mst_boruvka_matches_kruskal_on_corpus(ray_session):
    got = g.q_graph_mst_boruvka(SF)
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    want = pd.DataFrame(
        g.mst_kruskal_sequential(ids), columns=["lo", "hi", "w"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_diameter_sweep_monotone(ray_session):
    row = g.q_graph_diameter_sweep(SF).iloc[0]
    # the double-sweep guarantee: ecc(peak of sweep 1) >= ecc(start)
    assert row.diameter_lb >= row.start_ecc
    assert row.start_node == 0


def test_ppr_forced_distributed_equals_fold(ray_session, monkeypatch):
    """PPR_FOLD_MAX = 0 forces the broadcast-round branch; identical
    result to the driver fold."""
    fold = (
        g.q_graph_ppr(SF).to_pandas().sort_values("node", ignore_index=True)
    )
    monkeypatch.setattr(g, "PPR_FOLD_MAX", 0)
    dist = (
        g.q_graph_ppr(SF).to_pandas().sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fold, dist)


def test_ppr_sequential_mass_concentrates_on_seeds():
    """Seeds carry teleport mass, a node unreachable from every seed
    has rank exactly zero, and seeds rank above the median node."""
    from collections import deque

    doc_ids = range(3000)
    ppr = g.ppr_sequential(doc_ids)
    seeds = set(g.PPR_SEEDS)
    assert sum(ppr.values()) > 0
    assert sum(v for k, v in ppr.items() if k in seeds) > 0
    # BFS the directed planted edges from the seeds: any node outside
    # the reachable set must have rank exactly 0 (its only mass source
    # would be teleport, which non-seeds never receive)
    succ = defaultdict(set)
    for d in doc_ids:
        u, v = d % g.MST_NODES, (d // 7) % g.MST_NODES
        if u != v:
            succ[u].add(v)
    reach = set(s for s in seeds if s in ppr)
    q = deque(reach)
    while q:
        for nxt in succ[q.popleft()]:
            if nxt not in reach:
                reach.add(nxt)
                q.append(nxt)
    for node, val in ppr.items():
        if node not in reach:
            assert val == 0, (node, val)
    med = sorted(ppr.values())[len(ppr) // 2]
    for s in seeds:
        if s in ppr:
            assert ppr[s] >= med
