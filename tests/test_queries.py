"""Driver-parity checks: every queries() entry vs its DuckDB oracle.

Mirrors what the driver does at sf0.01 (CORRECTNESS_r{N}.json): run the Ray
pipeline and the oracle SQL on the same parquet tables, compare row count,
column names, and order-insensitive values. Runs at sf0.001 for speed.
"""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_query_matches_oracle(name: str, sf_dir: str):
    from khl_pdf_ocr_ray.pipelines.queries import ORACLES, QUERIES

    got = normalize(to_pandas(QUERIES[name](sf_dir)))
    con = duck_con(sf_dir)
    want = normalize(con.execute(ORACLES[name]).df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        name,
        list(got.columns),
        list(want.columns),
    )
    assert len(got) == len(want), (name, len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def oracle_query_names():
    from khl_pdf_ocr_ray.pipelines.queries import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", oracle_query_names())
def test_query_matches_oracle(ray_session, sf_smoke_dir, name):
    assert_query_matches_oracle(name, sf_smoke_dir)


def test_left_outer_join_null_path(ray_session):
    """customer_order_counts' null-aware combiner: the driver corpus has no
    orderless customers, so exercise the unmatched-left branch directly."""
    import pyarrow as pa
    import ray.data as rd

    from khl_pdf_ocr_ray.joins import safe_join
    from khl_pdf_ocr_ray.pipelines.queries_corpus import outer_counts_partial

    cust = rd.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_mktsegment": pa.array(["A", "A", "B", "B"], pa.string()),
            }
        )
    )
    per_cust = rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([1, 3], pa.int64()),
                "n_orders": pa.array([5, 7], pa.int64()),
            }
        )
    )
    joined = safe_join(
        cust, per_cust, on=("c_custkey",), right_on=("o_custkey",),
        join_type="left_outer",
    )
    out = (
        joined.map_batches(outer_counts_partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .sum(["n_customers", "n_no_orders", "total_orders"])
        .to_pandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    assert out.loc["A"].tolist() == [2, 1, 5]
    assert out.loc["B"].tolist() == [2, 1, 7]


def test_lag_kernel_ties_and_first_row():
    """lag_per_user: (ts, event_id) ordering with tied timestamps; first
    row gets the ('none', -1) sentinels; gaps are exact microseconds."""
    import numpy as np
    import pandas as pd

    from khl_pdf_ocr_ray.pipelines.queries import lag_per_user

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00.000005",
            "2024-01-01 00:00:00.000005",  # tie -> event_id breaks it
            "2024-01-01 00:00:01.500000",
        ]
    )
    g = pd.DataFrame(
        {
            "event_id": [7, 3, 9],
            "user_id": [1, 1, 1],
            "ts": ts,
            "event_type": ["a", "b", "c"],
        }
    )
    out = lag_per_user(g).reset_index(drop=True)
    # sorted order: event 3 (tie, lower id), 7, 9
    assert out["event_id"].tolist() == [3, 7, 9]
    assert out["prev_type"].tolist() == ["none", "b", "a"]
    assert out["gap_us"].tolist() == [-1, 0, 1_499_995]


def test_outer_join_with_empty_side_raises_loudly(ray_session):
    """An empty-side outer join can't be synthesized here (the result
    needs the empty side's columns null-filled) — silently returning the
    other side would DROP columns/rows, so the wrapper must refuse."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from khl_pdf_ocr_ray.joins import safe_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([10, 20], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "w": pa.array([], pa.int64())})
    )
    for jt in ("full_outer", "left_outer"):
        with pytest.raises(NotImplementedError):
            safe_join(left, right, on=("k",), right_on=("rk",), join_type=jt)
    # anti join against nothing still keeps every left row
    anti = safe_join(left, right, on=("k",), right_on=("rk",), join_type="left_anti")
    assert sorted(r["k"] for r in anti.take_all()) == [1, 2]


def test_split_hash_is_overflow_safe_and_identity_below_2_31():
    """doc_id >= ~3.5e9 would wrap Arrow's unchecked int64 multiply where
    DuckDB raises; the mod-2^31-1 pre-reduction keeps both engines in
    range AND is the identity for every current id."""
    import duckdb
    import pyarrow as pa

    from khl_pdf_ocr_ray.pipelines.queries import (
        SPLIT_ID_MOD,
        SPLIT_MULT,
        SPLIT_TRAIN_PCT,
        split_partial,
    )

    ids = [0, 1, 12345, 2**31 - 2, 2**31, 2**40, 4_000_000_000]
    batch = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array([10] * len(ids), pa.int64()),
        }
    )
    out = split_partial(batch).to_pandas()
    n_train = int(out.set_index("split")["n_docs"].get("train", 0))
    sql = duckdb.sql(
        f"""SELECT sum(CASE WHEN ((i % {SPLIT_ID_MOD}) * {SPLIT_MULT}) % 100
                 < {SPLIT_TRAIN_PCT} THEN 1 ELSE 0 END)
            FROM (SELECT unnest({ids}) AS i)"""
    ).fetchone()[0]
    assert n_train == int(sql)


def test_gopher_rep_kernel_hand_computed():
    """'a b a b c' -> top 2-gram 'a b' covers 2*3=6 of 9 chars = 667
    permille; 5-gram dup fraction on a doc of two identical 5-gram
    positions is 1000."""
    import pyarrow as pa

    from khl_pdf_ocr_ray.pipelines.queries_corpus import gopher_rep_batch

    out = gopher_rep_batch(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a b a b c", "x y z x y z x y z x", ""], pa.string()),
            }
        )
    ).to_pandas().set_index("doc_id")
    assert int(out.loc[1, "top2_permille"]) == round(2 * 3 / 9 * 1000)
    assert int(out.loc[1, "dup5_permille"]) == 0  # 'a b a b c' has 1 distinct 5-gram... occurs once
    # doc 2: every 5-gram position ('x y z x y' etc.) repeats cyclically
    assert int(out.loc[2, "dup5_permille"]) == 1000
    # empty text: all metrics zero
    assert out.loc[3].tolist() == [0, 0, 0, 0]
