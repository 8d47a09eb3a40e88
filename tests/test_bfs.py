"""Kernel tests for the distributed BFS traversal (queries_bfs)."""

import numpy as np
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_bfs import (
    BFS_CHORD,
    BFS_CHORD_EVERY,
    BFS_NODES,
    bfs_edge_partial,
    bfs_expand_broadcast,
    bfs_stamp_depth,
)


def test_edge_rule_ring_and_chords():
    t = pa.table({"doc_id": pa.array([0, 1, 5, 63, 64], pa.int64())})
    out = bfs_edge_partial(t)
    edges = set(zip(out["src"].to_pylist(), out["dst"].to_pylist()))
    # ring edges, both directions
    assert (0, 1) in edges and (1, 0) in edges
    assert (63, 0) in edges and (0, 63) in edges  # wraparound (doc 63)
    assert (1, 2) in edges  # doc 1 -> u=1 ring edge
    # chords only from doc_id % 5 == 0 (docs 0, 5): (0, 8) and (5, 13)
    assert (0, BFS_CHORD) in edges and (BFS_CHORD, 0) in edges
    assert (5, 5 + BFS_CHORD) in edges
    # doc 1 is not a chord doc: no (1, 9)
    assert (1, 1 + BFS_CHORD) not in edges


def test_edge_rule_batch_distinct():
    # the same doc twice must not duplicate edges within the batch
    t = pa.table({"doc_id": pa.array([7, 7, 7], pa.int64())})
    out = bfs_edge_partial(t)
    rows = list(zip(out["src"].to_pylist(), out["dst"].to_pylist()))
    assert len(rows) == len(set(rows)) == 2  # (7,8) and (8,7)


def test_expand_broadcast_filters_and_dedups():
    edges = pa.table(
        {
            "src": pa.array([1, 1, 2, 3, 3], pa.int64()),
            "dst": pa.array([5, 5, 6, 7, 8], pa.int64()),
        }
    )
    out = bfs_expand_broadcast(edges, np.array([1, 3], dtype=np.int64))
    assert sorted(out["node"].to_pylist()) == [5, 7, 8]  # src 2 dropped, dst 5 deduped


def test_stamp_depth():
    t = pa.table({"node": pa.array([4, 9], pa.int64())})
    out = bfs_stamp_depth(t, depth=3)
    assert out["depth"].to_pylist() == [3, 3]


def test_bfs_matches_networkx_style_reference(ray_session, sf_smoke_dir):
    """End-to-end depths vs a pure-python BFS over the same planted rule."""
    from collections import deque

    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.queries_bfs import (
        BFS_SEED,
        q_graph_bfs_depths,
    )

    d = pq.read_table(f"{sf_smoke_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    adj: dict = {}

    def add(a, b):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))

    for x in d:
        u = int(x) % BFS_NODES
        add(u, (u + 1) % BFS_NODES)
        if int(x) % BFS_CHORD_EVERY == 0:
            add(u, (u + BFS_CHORD) % BFS_NODES)
    want = {BFS_SEED: 0}
    q = deque([BFS_SEED])
    while q:
        n = q.popleft()
        for m in adj.get(n, ()):
            if m not in want:
                want[m] = want[n] + 1
                q.append(m)
    got = q_graph_bfs_depths(sf_smoke_dir).to_pandas()
    assert dict(zip(got["node"], got["depth"])) == want


def test_bfs_shuffle_path_matches_broadcast_path(ray_session, sf_smoke_dir, monkeypatch):
    """Force the large-frontier keyed-join branch (the 100 TB path) and
    check it produces the identical depth table. The branch is selected
    driver-side, so a module monkeypatch reaches it."""
    import khl_pdf_ocr_ray.pipelines.queries_bfs as qb

    broadcast = qb.q_graph_bfs_depths(sf_smoke_dir).to_pandas()
    monkeypatch.setattr(qb, "BFS_BROADCAST_MAX", 0)
    shuffled = qb.q_graph_bfs_depths(sf_smoke_dir).to_pandas()
    a = broadcast.sort_values("node").reset_index(drop=True)
    b = shuffled.sort_values("node").reset_index(drop=True)
    assert a.equals(b)


def test_sssp_weights_symmetric_and_planted():
    from khl_pdf_ocr_ray.pipelines.queries_bfs import sssp_edge_partial

    t = pa.table({"doc_id": pa.array([0, 1, 5, 63], pa.int64())})
    out = sssp_edge_partial(t)
    w = {
        (s, d): wt
        for s, d, wt in zip(
            out["src"].to_pylist(), out["dst"].to_pylist(), out["w"].to_pylist()
        )
    }
    for (s, d), wt in w.items():
        assert wt == 1 + (s + d) % 5
        assert w[(d, s)] == wt  # symmetric


def test_sssp_matches_pure_python_dijkstra(ray_session, sf_smoke_dir):
    import heapq

    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.queries_bfs import (
        BFS_CHORD,
        BFS_CHORD_EVERY,
        BFS_NODES,
        BFS_SEED,
        q_graph_sssp,
    )

    ids = pq.read_table(
        f"{sf_smoke_dir}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_pylist()
    adj = {}

    def add(u, v):
        wt = 1 + (u + v) % 5
        adj.setdefault(u, {})[v] = wt
        adj.setdefault(v, {})[u] = wt

    for d in ids:
        u = d % BFS_NODES
        add(u, (u + 1) % BFS_NODES)
        if d % BFS_CHORD_EVERY == 0:
            add(u, (u + BFS_CHORD) % BFS_NODES)
    want = {BFS_SEED: 0}
    h = [(0, BFS_SEED)]
    while h:
        dist, n = heapq.heappop(h)
        if dist > want.get(n, 1 << 60):
            continue
        for m, wt in adj.get(n, {}).items():
            nd = dist + wt
            if nd < want.get(m, 1 << 60):
                want[m] = nd
                heapq.heappush(h, (nd, m))
    got = q_graph_sssp(sf_smoke_dir).to_pandas()
    assert dict(zip(got["node"], got["dist"])) == want


def test_sssp_join_path_matches_broadcast_path(ray_session, sf_smoke_dir, monkeypatch):
    import khl_pdf_ocr_ray.pipelines.queries_bfs as qb

    broadcast = qb.q_graph_sssp(sf_smoke_dir).to_pandas()
    monkeypatch.setattr(qb, "SSSP_BROADCAST_MAX", 0)
    joined = qb.q_graph_sssp(sf_smoke_dir).to_pandas()
    a = broadcast.sort_values("node").reset_index(drop=True)
    b = joined.sort_values("node").reset_index(drop=True)
    assert a.equals(b)
