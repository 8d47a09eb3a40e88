"""Kernel tests for the crawl politeness scheduling bound."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_crawl import (
    CRAWL_DELAY,
    crawl_assign,
    crawl_finalize,
    crawl_host_partial,
    host_hash,
)


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


def test_host_hash_matches_duckdb_idiom():
    import duckdb

    con = duckdb.connect()
    for s in ["site21.example.org", "hot.example.com", "a", "zz.example"]:
        got = con.execute(
            """
            SELECT CAST(sum(ascii(c) * ((i * 2654435761) % 4294967296))
                        % 4294967296 AS BIGINT)
            FROM (SELECT unnest(string_split(?, '')) c,
                         generate_subscripts(string_split(?, ''), 1) i)
            """,
            [s, s],
        ).fetchone()[0]
        assert got == host_hash(s), s


def test_host_partial_drops_empty_hosts():
    batch = _t(pd.DataFrame({"host": ["a.com", "", "a.com", "b.com"]}))
    out = crawl_host_partial(batch).to_pandas().sort_values("host")
    assert out["host"].tolist() == ["a.com", "b.com"]
    assert out["n"].tolist() == [2, 1]


def test_serial_chain_dominates_makespan():
    # one hot host (100 pages) + many cold ones on the same worker:
    # politeness chain (99*5+1 = 496) exceeds work volume when volume
    # is smaller, and the bound picks the max side
    rows = _t(
        pd.DataFrame(
            {
                "crawler": np.int64([0, 0]),
                "n_hosts": np.int64([1, 3]),
                "n_pages": np.int64([100, 30]),
                "serial": np.int64([(100 - 1) * CRAWL_DELAY + 1, 11]),
            }
        )
    )
    g = (
        rows.group_by("crawler")
        .aggregate([("n_hosts", "sum"), ("n_pages", "sum"), ("serial", "max")])
    )
    fin = crawl_finalize(
        pa.table(
            {
                "crawler": g["crawler"],
                "n_hosts": g["n_hosts_sum"],
                "n_pages": g["n_pages_sum"],
                "max_serial": g["serial_max"],
            }
        )
    ).to_pandas()
    assert fin["makespan_lb"].tolist() == [496]  # chain side wins
    assert fin["n_pages"].tolist() == [130]


def test_assign_partial_aggregates_per_worker():
    batch = _t(
        pd.DataFrame({"host": ["a.com", "b.com", "c.com"], "n": np.int64([4, 2, 1])})
    )
    out = crawl_assign(batch).to_pandas()
    assert out["n_hosts"].sum() == 3
    assert out["n_pages"].sum() == 7
    # serial of the 4-page host = 3*DELAY+1
    assert out["serial"].max() == 3 * CRAWL_DELAY + 1
