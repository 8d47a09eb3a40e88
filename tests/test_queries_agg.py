"""Kernel-level checks for the aggregation-family operators
(pipelines/queries_agg.py) beyond the oracle parity gate: sliding-frame
brute-force parity, DDSketch bucket geometry + error bound + merge
batching-invariance, histogram mass conservation, and ordered-concat
layout independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_agg import (
    DD_PS,
    DD_SUB,
    HIST_WIDTH,
    SLIDE_W,
    dd_bucket,
    dd_lower_bound,
    dd_partial,
    hist_bucket_project,
    nations_concat_group,
    sliding_per_user,
)


def _user_frame(rng, n):
    ts = pd.to_datetime(rng.integers(0, 10**6, n), unit="s")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": np.full(n, 5, dtype="int64"),
            "ts": ts,
            "value": rng.uniform(0, 50, n),
        }
    )


@pytest.mark.parametrize("n", [1, 2, 3, 4, 17])
def test_sliding_matches_bruteforce(n):
    rng = np.random.default_rng(n)
    g = _user_frame(rng, n)
    out = sliding_per_user(g)
    srt = g.sort_values(["ts", "event_id"])
    cents = np.floor(srt["value"].to_numpy() * 100 + 0.5).astype("int64")
    for i in range(n):
        lo = max(0, i - (SLIDE_W - 1))
        assert out["win_cents"].iloc[i] == cents[lo : i + 1].sum()
        assert out["win_n"].iloc[i] == i + 1 - lo


def test_sliding_is_row_order_invariant():
    rng = np.random.default_rng(3)
    g = _user_frame(rng, 20)
    shuffled = g.sample(frac=1.0, random_state=1).reset_index(drop=True)
    a = sliding_per_user(g).reset_index(drop=True)
    b = sliding_per_user(shuffled).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dd_bucket_geometry():
    """Lower bound of a value's bucket never exceeds the value, and the
    relative error of the bound is within 1/DD_SUB (+1 integer slack)."""
    x = np.unique(np.concatenate([
        np.arange(1, 200),
        np.int64(1) << np.arange(0, 50),
        (np.int64(1) << np.arange(3, 50)) - 1,
        np.random.default_rng(0).integers(1, 2**52, 500),
    ])).astype("int64")
    b = dd_bucket(x)
    lb = np.array([dd_lower_bound(v) for v in b], dtype="int64")
    assert (lb <= x).all()
    assert (x <= lb + lb // DD_SUB + 1).all()
    # bucket id is monotone in the value
    assert (np.diff(b[np.argsort(x)]) >= 0).all()


def test_dd_merge_is_batching_invariant():
    """Splitting the input across partial batches then summing per bucket
    equals the single-batch sketch — the mergeability contract."""
    rng = np.random.default_rng(1)
    vals = rng.integers(1, 10**6, 4000).astype("int64")
    whole = dd_partial(pa.table({"n_chars": vals}))
    parts = [
        dd_partial(pa.table({"n_chars": vals[i : i + 257]}))
        for i in range(0, len(vals), 257)
    ]
    merged = (
        pa.concat_tables(parts)
        .to_pandas()
        .groupby("bucket", as_index=False)["n"]
        .sum()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        whole.to_pandas().sort_values("bucket").reset_index(drop=True), merged
    )


def test_dd_quantile_error_bound_vs_exact():
    """Walking the merged sketch lands within the guaranteed relative
    error of the exact quantile for every target percentile."""
    rng = np.random.default_rng(2)
    vals = np.sort(rng.lognormal(8, 1, 5000).astype("int64") + 1)
    tbl = dd_partial(pa.table({"n_chars": vals}))
    hist = tbl.to_pandas().sort_values("bucket")
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])
    for p in DD_PS:
        rank = (p * total + 99) // 100
        b = int(hist["bucket"].to_numpy()[np.searchsorted(cum, rank)])
        est = dd_lower_bound(b)
        exact = int(vals[rank - 1])
        assert est <= exact <= est + est // DD_SUB + 1


def test_hist_mass_conservation():
    vals = np.array([0, 1, 499, 500, 501, 1250, 9999], dtype="int64")
    t = hist_bucket_project(pa.table({"n_chars": vals}))
    assert t["bucket"].to_pylist() == (vals // HIST_WIDTH).tolist()
    assert sum(t["n_chars"].to_pylist()) == vals.sum()


def test_nations_concat_sorted_and_layout_independent():
    g = pd.DataFrame(
        {
            "n_nationkey": [3, 1, 2],
            "n_name": ["CCC", "AAA", "BBB"],
            "n_regionkey": [7, 7, 7],
        }
    )
    out1 = nations_concat_group(g, {7: "EUROPE"})
    out2 = nations_concat_group(g.iloc[::-1].reset_index(drop=True), {7: "EUROPE"})
    assert out1["nations"].iloc[0] == "AAA,BBB,CCC"
    assert out1["n_nations"].iloc[0] == 3
    pd.testing.assert_frame_equal(out1, out2)


def test_props_k_project_extracts_and_drops_nonmatching():
    from khl_pdf_ocr_ray.pipelines.queries_agg import props_k_project

    batch = pa.table(
        {
            "event_type": ["a", "b", "c", "d", "e"],
            "props": ['{"k": 87}', '{"k":-3}', '{"j": 1}', "not json", '{"k": 0}'],
        }
    )
    out = props_k_project(batch)
    assert out["event_type"].to_pylist() == ["a", "b", "e"] or out[
        "event_type"
    ].to_pylist() == ["a", "b", "d", "e"]
    # "b" must parse the negative; rows without a "k" integer are dropped.
    d = dict(zip(out["event_type"].to_pylist(), out["k"].to_pylist()))
    assert d["a"] == 87 and d["b"] == -3 and d["e"] == 0 and "c" not in d


def test_spend_cents_half_up_rounding():
    from khl_pdf_ocr_ray.pipelines.queries_agg import spend_cents_project

    batch = pa.table({"user_id": [1, 2, 3], "value": [1.005, 2.004, 0.0]})
    out = spend_cents_project(batch)
    # floor(v*100 + 0.5): 1.005 -> 101 (or 100 under fp), matches the SQL twin
    # because BOTH sides use the identical floor(value*100 + 0.5) expression.
    import math

    expect = [int(math.floor(v * 100 + 0.5)) for v in [1.005, 2.004, 0.0]]
    assert out["cents"].to_pylist() == expect


def test_recent_users_boundary_inclusive():
    from khl_pdf_ocr_ray.pipelines.queries_agg import (
        RECENT_TS,
        recent_users_project,
    )

    edge = pd.Timestamp(RECENT_TS)
    batch = pa.table(
        {
            "user_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [edge - pd.Timedelta("1us"), edge, edge + pd.Timedelta("1us")],
                pa.timestamp("us"),
            ),
        }
    )
    out = recent_users_project(batch)
    assert out["user_id"].to_pylist() == [2, 3]


def test_time_window_matches_bruteforce_with_ties():
    from khl_pdf_ocr_ray.pipelines.queries_agg import (
        TIME_WIN_US,
        time_window_per_user,
    )

    rng = np.random.default_rng(9)
    n = 300
    # coarse second resolution + duplicates to exercise RANGE peer semantics
    secs = np.sort(rng.integers(0, 5000, n))
    g = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": np.full(n, 7, dtype="int64"),
            "ts": pd.to_datetime(secs, unit="s"),
            "value": rng.uniform(0.01, 99.0, n).round(2),
        }
    )
    out = time_window_per_user(g).set_index("event_id")["win_cents"]
    ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype("int64")
    for i in range(n):
        # RANGE frame: every row (incl. later peers) with ts in [ts_i-1h, ts_i]
        mask = (ts_us >= ts_us[i] - TIME_WIN_US) & (ts_us <= ts_us[i])
        assert out.loc[i] == cents[mask].sum()


def test_cube_partial_levels_and_mass():
    from khl_pdf_ocr_ray.pipelines.queries_agg import cube_partial

    batch = pa.table(
        {
            "lang": ["en", "en", "fr"],
            "source": ["s1", "s2", "s1"],
            "n_chars": pa.array([10, 20, 40], pa.int64()),
        }
    )
    out = cube_partial(batch).to_pandas()
    for lvl, want_rows in [(3, 3), (2, 2), (1, 2), (0, 1)]:
        lvl_df = out[out["level"] == lvl]
        assert len(lvl_df) == want_rows
        assert lvl_df["total_chars"].sum() == 70  # mass conserved per level
        assert lvl_df["n_docs"].sum() == 3
    src_only = out[(out["level"] == 1) & (out["source"] == "s1")]
    assert src_only["total_chars"].iloc[0] == 50 and src_only["lang"].iloc[0] == "ALL"


def test_first_last_combiner_is_mergeable():
    """Split -> partial -> concat -> finalize equals whole -> finalize:
    the combiner keeps exactly the rows the reduce needs."""
    from khl_pdf_ocr_ray.pipelines.queries_agg import (
        first_last_finalize,
        first_last_partial,
    )

    rng = np.random.default_rng(4)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 9, n),
            "event_type": rng.choice(list("abcde"), n),
            "ts": pd.to_datetime(rng.integers(0, 500, n), unit="s"),  # many ties
            "event_id": rng.permutation(n).astype("int64"),
        }
    )
    whole = pd.concat(
        [first_last_finalize(g) for _, g in df.groupby("user_id")],
        ignore_index=True,
    ).sort_values("user_id").reset_index(drop=True)
    parts = pd.concat(
        [
            first_last_partial(
                pa.Table.from_pandas(df.iloc[i : i + 37], preserve_index=False)
            ).to_pandas()
            for i in range(0, n, 37)
        ],
        ignore_index=True,
    )
    merged = pd.concat(
        [first_last_finalize(g) for _, g in parts.groupby("user_id")],
        ignore_index=True,
    ).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, merged)


def test_dow_hour_matches_pandas_calendar():
    from khl_pdf_ocr_ray.pipelines.queries_agg import dow_hour_partial

    rng = np.random.default_rng(6)
    ts = pd.to_datetime(rng.integers(0, 10**9, 500), unit="s")
    out = (
        dow_hour_partial(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))
        .to_pandas()
        .set_index(["dow", "hour"])["n"]
    )
    # pandas dayofweek: 0=Monday; DuckDB/our dow: 0=Sunday
    ref = (
        pd.DataFrame({"dow": (ts.dayofweek + 1) % 7, "hour": ts.hour})
        .value_counts()
        .sort_index()
    )
    assert out.sort_index().tolist() == ref.tolist()
    assert set(map(tuple, out.index)) == set(map(tuple, ref.index))


def test_lead_is_reverse_of_lag_semantics():
    from khl_pdf_ocr_ray.pipelines.queries_agg import lead_per_user

    g = pd.DataFrame(
        {
            "event_id": np.array([1, 2, 3], dtype="int64"),
            "user_id": np.array([5, 5, 5], dtype="int64"),
            "ts": pd.to_datetime([10, 20, 45], unit="s"),
            "event_type": ["a", "b", "c"],
        }
    )
    out = lead_per_user(g).set_index("event_id")
    assert out.loc[1, "next_type"] == "b" and out.loc[1, "gap_us"] == 10_000_000
    assert out.loc[2, "next_type"] == "c" and out.loc[2, "gap_us"] == 25_000_000
    assert out.loc[3, "next_type"] == "none" and out.loc[3, "gap_us"] == -1


def test_dow_hour_pre_epoch_floored_division():
    from khl_pdf_ocr_ray.pipelines.queries_agg import dow_hour_partial

    # 1969-12-31 23:30 was a Wednesday (dow 3 in 0=Sunday convention)
    ts = pd.to_datetime(["1969-12-31 23:30:00", "1970-01-01 00:30:00"])
    out = (
        dow_hour_partial(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))
        .to_pandas()
        .set_index(["dow", "hour"])["n"]
    )
    assert out.loc[(3, 23)] == 1  # pre-epoch row floored, not truncated
    assert out.loc[(4, 0)] == 1   # Thursday epoch day


def test_cube_partial_keeps_null_rows_in_every_level():
    from khl_pdf_ocr_ray.pipelines.queries_agg import CUBE_NULL, cube_partial

    batch = pa.table(
        {
            "lang": ["en", None],
            "source": ["s1", "s1"],
            "n_chars": pa.array([10, 20], pa.int64()),
        }
    )
    out = cube_partial(batch).to_pandas()
    for lvl in (0, 1, 2, 3):
        lvl_df = out[out["level"] == lvl]
        assert lvl_df["total_chars"].sum() == 30, f"mass lost at level {lvl}"
    null_row = out[(out["level"] == 2) & (out["lang"] == CUBE_NULL)]
    assert null_row["total_chars"].iloc[0] == 20


def test_union_side_combiners_emit_per_user_rows():
    from khl_pdf_ocr_ray.pipelines.queries_agg import (
        recent_users_project,
        spend_cents_project,
    )

    batch = pa.table(
        {
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    out = spend_cents_project(batch).to_pandas().set_index("user_id")["cents"]
    assert len(out) == 2 and out.loc[7] == 300 and out.loc[8] == 300
    rec = pa.table(
        {
            "user_id": pa.array([7, 7], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(["2024-01-31", "2024-01-31"]), pa.timestamp("us")
            ),
        }
    )
    assert recent_users_project(rec)["user_id"].to_pylist() == [7]


def test_dense_rank_apply_shares_rank_on_ties():
    from khl_pdf_ocr_ray.pipelines.queries_agg import dense_rank_apply

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "lang": ["en", "en", "en", "fr", "en"],
            "n_chars": pa.array([500, 300, 500, 300, 100], pa.int64()),
        }
    )
    maps = {
        "en": np.array([500, 300, 100], dtype="int64"),
        "fr": np.array([300], dtype="int64"),
    }
    out = dense_rank_apply(batch, maps).to_pandas().set_index("doc_id")["size_rank"]
    # ties share rank 1; next DISTINCT value gets rank 2 (dense, no gaps)
    assert out.loc[1] == 1 and out.loc[3] == 1
    assert out.loc[2] == 2 and out.loc[5] == 3
    assert out.loc[4] == 1  # fr partition ranks independently


def test_covisit_group_kernel_pairs_and_dedup():
    import pandas as pd

    from khl_pdf_ocr_ray.pipelines.queries_agg import covisit_pairs_group

    g = pd.DataFrame(
        {"user_id": [1] * 4, "event_type": ["b", "a", "c", "a"]}  # dup 'a'
    )
    out = covisit_pairs_group(g)
    assert list(zip(out.type_a, out.type_b)) == [("a", "b"), ("a", "c"), ("b", "c")]
    # single-type user contributes nothing
    assert covisit_pairs_group(
        pd.DataFrame({"user_id": [2], "event_type": ["a"]})
    ).empty
