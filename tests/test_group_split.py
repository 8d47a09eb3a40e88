"""Kernel-level checks for host_split_leakfree beyond oracle parity:
group integrity (the whole point), combiner mergeability, and hash/SQL
twin agreement on adversarial source names."""

import duckdb
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_split import (
    group_split_partial,
    source_hash,
    split_of_source,
)


def test_group_integrity_and_mergeability():
    t = pa.table(
        {
            "source": pa.array(
                [f"host{i % 7}.example" for i in range(200)], pa.string()
            ),
            "n_chars": pa.array(list(range(200)), pa.int64()),
        }
    )
    whole = group_split_partial(t).to_pandas()
    # every source maps to exactly one split
    assert (whole.groupby("source")["split"].nunique() == 1).all()
    parts = pd.concat(
        [group_split_partial(t.slice(i, 33)).to_pandas() for i in range(0, 200, 33)],
        ignore_index=True,
    )
    merged = (
        parts.groupby(["source", "split"], as_index=False)[["n_docs", "n_chars"]]
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        whole.sort_values("source").reset_index(drop=True), merged,
        check_dtype=False,
    )


def test_hash_matches_sql_twin_on_unicode_free_names():
    """The Python polynomial and the DuckDB expression must agree on
    every name shape the corpus can produce (ascii hosts)."""
    names = ["a", "z9", "src0", "news.example.co", "x" * 40, "0-._~"]
    con = duckdb.connect()
    for s in names:
        (hv,) = con.execute(
            "SELECT CAST(list_sum(list_transform(range(1, length(?)+1),"
            " i -> i * ascii(substr(?, i, 1)))) AS BIGINT)",
            [s, s],
        ).fetchone()
        assert hv == source_hash(s), s
    # and the rule lands in all three splits somewhere over a name sweep
    splits = {split_of_source(f"h{i}.net") for i in range(200)}
    assert splits == {"train", "val", "test"}
