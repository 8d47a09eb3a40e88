"""graph_random_walks: validity (every hop is an edge), determinism,
and hash-choice reproducibility."""

import numpy as np
import pandas as pd


def test_walk_step_kernel_picks_ranked_neighbor():
    import pyarrow as pa

    from khl_pdf_ocr_ray.pipelines.queries_walks import (
        walk_hash,
        walk_step_batch,
    )

    # node 5 -> neighbors [2, 9]; node 9 -> [5]
    nodes = np.array([2, 5, 9], dtype=np.int64)
    offsets = np.array([0, 1, 3, 4], dtype=np.int64)
    neighbors = np.array([5, 2, 9, 5], dtype=np.int64)
    batch = pa.table(
        {
            "walk_id": pa.array([7, 8], pa.int64()),
            "step": pa.array([0, 0], pa.int64()),
            "node": pa.array([5, 9], pa.int64()),
        }
    )
    out = walk_step_batch(batch, (nodes, offsets, neighbors), step=1).to_pandas()
    pick0 = int(walk_hash(np.array([7]), 1, np.array([5]))[0] % 2)
    assert out.loc[0, "node"] == [2, 9][pick0]
    assert out.loc[1, "node"] == 5  # degree-1: only choice
    assert (out["step"] == 1).all()


def test_walks_are_valid_paths(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_graph import graph_edge_partial
    from khl_pdf_ocr_ray.pipelines.queries_walks import (
        WALK_STEPS,
        WALKS_PER_NODE,
        q_graph_random_walks,
    )
    import pyarrow.parquet as pq

    out = q_graph_random_walks(sf_smoke_dir).to_pandas()
    # every walk has exactly STEPS+1 positions
    lens = out.groupby("walk_id").size()
    assert (lens == WALK_STEPS + 1).all()
    # every consecutive hop is a real undirected edge
    docs = pq.read_table(f"{sf_smoke_dir}/documents.parquet", columns=["doc_id"])
    e = graph_edge_partial(docs).to_pandas()
    edge_set = set(map(tuple, e[["lo", "hi"]].to_numpy()))
    tr = out.sort_values(["walk_id", "step"])
    for _, g in tr.groupby("walk_id"):
        ns = g["node"].to_numpy()
        for a, b in zip(ns[:-1], ns[1:]):
            assert (min(a, b), max(a, b)) in edge_set
    # deterministic across runs
    again = q_graph_random_walks(sf_smoke_dir).to_pandas()
    a = out.sort_values(["walk_id", "step"]).reset_index(drop=True)
    b = again.sort_values(["walk_id", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_walks_forced_branch_equivalence(ray_session, sf_smoke_dir):
    """Broadcast and shuffle regimes must emit identical traces — the
    BFS/SSSP forced-branch convention."""
    from khl_pdf_ocr_ray.pipelines.queries_walks import q_graph_random_walks

    a = (
        q_graph_random_walks(sf_smoke_dir, force="broadcast")
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    b = (
        q_graph_random_walks(sf_smoke_dir, force="shuffle")
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
