"""fd_discovery: key certification + planted-violation profiling."""

import pyarrow as pa


def test_fd_pair_distinct_kernel():
    from khl_pdf_ocr_ray.pipelines.queries_fd import FD_SHARDS, fd_pair_distinct

    batch = pa.table(
        {"a": pa.array([1, 1, 2, 1], pa.int64()), "b": ["x", "x", "y", "z"]}
    )
    out = fd_pair_distinct(batch, "a", "b").to_pandas()
    assert sorted(zip(out["lhs"], out["rhs"])) == [
        ("1", "x"), ("1", "z"), ("2", "y"),
    ]
    assert out["shard"].between(0, FD_SHARDS - 1).all()
    # same lhs -> same shard (the all-copies-meet invariant)
    assert out.groupby("lhs")["shard"].nunique().max() == 1


def test_fd_shard_kernel():
    import pandas as pd

    from khl_pdf_ocr_ray.pipelines.queries_fd import fd_shard_kernel

    g = pd.DataFrame(
        {
            "lhs": ["1", "1", "1", "2", "2"],
            "rhs": ["x", "x", "z", "y", "y"],  # cross-batch dups included
        }
    )
    out = fd_shard_kernel(g)
    assert out["n_lhs"].tolist() == [2]
    assert out["n_viol"].tolist() == [1]   # lhs 1 fans out to {x, z}
    assert out["max_fanout"].tolist() == [2]


def test_fd_discovery_certifies_keys(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_fd import q_fd_discovery

    df = q_fd_discovery(sf_smoke_dir).set_index("dependency")
    # primary keys hold with fanout exactly 1
    assert df.loc["nation.n_nationkey -> n_regionkey", "holds"]
    assert df.loc["nation.n_nationkey -> n_regionkey", "max_fanout"] == 1
    assert df.loc["customer.c_custkey -> c_mktsegment", "holds"]
    # behavioral columns genuinely violate
    assert not df.loc["events.user_id -> event_type", "holds"]
    assert df.loc["events.user_id -> event_type", "max_fanout"] > 1
    # violations never exceed lhs count
    assert (df["n_viol"] <= df["n_lhs"]).all()


def test_ind_shard_kernel_planted_violation():
    """Min/max side folding: child-only values are missing, parent-only
    values are ignored, both-sides values count as covered children —
    and duplicate per-batch rows per side must not change counts."""
    import pandas as pd

    from khl_pdf_ocr_ray.pipelines.queries_fd import ind_shard_kernel

    g = pd.DataFrame(
        {
            # "a": child-only (x2 batches), "b": both sides, "c": parent-only
            "val": ["a", "a", "b", "b", "c", "c"],
            "side": [1, 1, 1, 2, 2, 2],
        }
    )
    out = ind_shard_kernel(g)
    assert out["n_child"].tolist() == [2]
    assert out["n_missing"].tolist() == [1]


def test_ind_discovery_fk_certification(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_fd import q_ind_discovery

    df = q_ind_discovery(sf_smoke_dir).set_index("dependency")
    assert df.loc["orders.o_custkey IN customer.c_custkey", "holds"]
    assert df.loc["lineitem.l_orderkey IN orders.o_orderkey", "holds"]
    assert (df["n_missing"] <= df["n_child_distinct"]).all()
