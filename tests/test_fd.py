"""fd_discovery: key certification + planted-violation profiling."""

import pyarrow as pa


def test_fd_pair_distinct_kernel():
    from khl_pdf_ocr_ray.pipelines.queries_fd import fd_pair_distinct

    batch = pa.table(
        {"a": pa.array([1, 1, 2, 1], pa.int64()), "b": ["x", "x", "y", "z"]}
    )
    out = fd_pair_distinct(batch, "a", "b").to_pandas()
    assert sorted(zip(out["lhs"], out["rhs"])) == [
        ("1", "x"), ("1", "z"), ("2", "y"),
    ]


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


def test_ind_bits_kernel_planted_violation():
    """Min/max side folding: child-only values are missing, parent-only
    values are ignored, both-sides values count as covered children."""
    import pyarrow as pa

    from khl_pdf_ocr_ray.pipelines.queries_fd import ind_bits_partial

    batch = pa.table(
        {
            # child-only, both-sides, parent-only
            "mn": pa.array([1, 1, 2], pa.int64()),
            "mx": pa.array([1, 2, 2], pa.int64()),
        }
    )
    out = ind_bits_partial(batch).to_pandas()
    assert out["n_child"].tolist() == [2]
    assert out["n_missing"].tolist() == [1]


def test_ind_discovery_fk_certification(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_fd import q_ind_discovery

    df = q_ind_discovery(sf_smoke_dir).set_index("dependency")
    assert df.loc["orders.o_custkey IN customer.c_custkey", "holds"]
    assert df.loc["lineitem.l_orderkey IN orders.o_orderkey", "holds"]
    assert (df["n_missing"] <= df["n_child_distinct"]).all()
