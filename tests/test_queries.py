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
