"""salted_skew_join: forced-branch equivalence (salted vs plain emit
identical rows), kernel-level salt/replication invariants, and the
two-sided-skew registry query."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_sets(ray_session):
    """Planted two-sided skew: key 7 holds half the probe AND the biggest
    build slice."""
    import ray.data as rd

    rs = np.random.RandomState(3)
    n = 4000
    probe_keys = np.where(rs.rand(n) < 0.5, 7, rs.randint(0, 40, n)).astype(np.int64)
    probe = pa.table(
        {"pid": np.arange(n, dtype=np.int64), "k": probe_keys}
    )
    build_rows = []
    for k in range(40):
        reps = 6 if k == 7 else 1
        for j in range(reps):
            build_rows.append((k, 100 * k + j))
    bk, bv = zip(*build_rows)
    build = pa.table(
        {"bk": pa.array(bk, pa.int64()), "bv": pa.array(bv, pa.int64())}
    )
    return rd.from_arrow(probe).repartition(4), rd.from_arrow(build).repartition(2)


def _rows(ds):
    df = ds.to_pandas().sort_values(["pid", "k", "bv"]).reset_index(drop=True)
    return df


def test_forced_branch_equivalence(ray_session):
    """Salted and plain paths must emit the identical row multiset (the
    graph_bfs_depths forced-branch convention)."""
    from khl_pdf_ocr_ray.joins import salted_skew_join

    schema = pa.schema([("pid", pa.int64()), ("k", pa.int64()), ("bv", pa.int64())])
    probe, build = _mk_sets(ray_session)
    plain = salted_skew_join(
        probe, build, key="k", right_key="bk", out_schema=schema, force="plain"
    )
    probe2, build2 = _mk_sets(ray_session)
    salted = salted_skew_join(
        probe2, build2, key="k", right_key="bk", out_schema=schema, force="salted",
        n_salt=8,
    )
    a, b = _rows(plain), _rows(salted)
    pd.testing.assert_frame_equal(a, b)
    # the hot key's fan-out is present: key 7 rows appear 6x each
    hot = a[a["k"] == 7]
    assert len(hot) == 6 * hot["pid"].nunique()


def test_threshold_branch_picks_hot_key(ray_session):
    """Size-based branch: threshold below the hot key's count salts, a
    huge threshold goes plain — identical rows either way."""
    from khl_pdf_ocr_ray.joins import salted_skew_join

    schema = pa.schema([("pid", pa.int64()), ("k", pa.int64()), ("bv", pa.int64())])
    probe, build = _mk_sets(ray_session)
    low = salted_skew_join(
        probe, build, key="k", right_key="bk", out_schema=schema,
        hot_count_threshold=500, n_salt=4,
    )
    probe2, build2 = _mk_sets(ray_session)
    high = salted_skew_join(
        probe2, build2, key="k", right_key="bk", out_schema=schema,
        hot_count_threshold=10**9,
    )
    pd.testing.assert_frame_equal(_rows(low), _rows(high))


def test_replicate_build_batch_kernel():
    """Hot rows appear once per salt; cold rows once with salt 0."""
    from khl_pdf_ocr_ray.joins import _replicate_build_batch

    batch = pa.table(
        {"bk": pa.array([1, 2, 3], pa.int64()), "bv": pa.array([10, 20, 30], pa.int64())}
    )
    out = _replicate_build_batch(batch, right_key="bk", hot=[2], n_salt=3)
    df = out.to_pandas().sort_values(["bk", "_salt_r"]).reset_index(drop=True)
    assert df[df["bk"] == 2]["_salt_r"].tolist() == [0, 1, 2]
    assert df[df["bk"] == 1]["_salt_r"].tolist() == [0]
    assert df[df["bk"] == 3]["_salt_r"].tolist() == [0]
    assert (df[df["bk"] == 2]["bv"] == 20).all()


def test_salt_probe_batch_kernel():
    """Cold rows get salt 0; hot rows stay within [0, n_salt)."""
    from khl_pdf_ocr_ray.joins import _salt_probe_batch

    batch = pa.table({"k": pa.array([5, 9, 5, 5, 9], pa.int64())})
    out = _salt_probe_batch(batch, key="k", hot=[5], n_salt=2).to_pandas()
    assert (out.loc[out["k"] == 9, "_salt"] == 0).all()
    assert out.loc[out["k"] == 5, "_salt"].isin([0, 1]).all()


def test_skew_join_salted_query(ray_session, sf_smoke_dir):
    """Registry query: row set equals the plain-SQL twin semantics — every
    planted-hot-user event fans out to 3 tags, cold events to 1."""
    from khl_pdf_ocr_ray.pipelines.queries_rel import q_skew_join_salted

    out = q_skew_join_salted(sf_smoke_dir).to_pandas()
    hot = out[out["user_id"] == 0]
    cold = out[out["user_id"] != 0]
    # hot user: exactly tags {0,1,2} per event
    per_ev = hot.groupby("event_id")["tag"].apply(lambda s: sorted(s))
    assert (per_ev.map(tuple) == (0, 1, 2)).all()
    # cold users: one row per event, tag = user % 3
    assert cold.groupby("event_id").size().max() == 1
    assert (cold["tag"] == cold["user_id"] % 3).all()
