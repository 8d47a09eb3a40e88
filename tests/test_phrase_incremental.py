"""Tests for the incremental two-generation phrase index."""

import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_substr import crawl_split_filter


def _docs(ids):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x"] * len(ids), pa.string()),
        }
    )


def test_crawl_split_partitions_exactly():
    batch = _docs(list(range(10)))
    hist = crawl_split_filter(batch, new_crawl=False)["doc_id"].to_pylist()
    new = crawl_split_filter(batch, new_crawl=True)["doc_id"].to_pylist()
    assert sorted(hist + new) == list(range(10))
    assert set(new) == {0, 4, 8}
    assert not set(hist) & set(new)


def test_incremental_index_appends_and_matches_scan(ray_session, sf_smoke_dir):
    import glob
    import os

    from khl_pdf_ocr_ray.pipelines.queries_substr import (
        ensure_phrase_index_incremental,
        q_phrase_hits,
        q_phrase_hits_incremental,
    )

    idx = ensure_phrase_index_incremental(sf_smoke_dir)
    # both generations exist on disk; gen=1 is a sibling, not a rewrite
    assert glob.glob(os.path.join(idx, "gen=0", "bucket=*", "*.parquet"))
    assert glob.glob(os.path.join(idx, "gen=1", "bucket=*", "*.parquet"))
    want = (
        q_phrase_hits(sf_smoke_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        q_phrase_hits_incremental(sf_smoke_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # second call is a cache hit: the published dir is reused untouched
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True)
    }
    assert ensure_phrase_index_incremental(sf_smoke_dir) == idx
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True)
    }
    assert after == before
