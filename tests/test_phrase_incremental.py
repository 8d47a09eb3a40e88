"""Tests for the incremental two-generation phrase index."""

import glob
import os

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


def test_phrase_incremental_corrupted_history_fails_loudly(ray_session, sf_smoke_dir):
    """Post-publish corruption of the persisted index (a truncated or
    re-written history file) must raise, never serve a stale generation
    (round-5 brief item 7). The dir is removed afterwards so later tests
    rebuild a clean index."""
    import shutil

    import pytest as _pytest

    from khl_pdf_ocr_ray.pipelines.queries_substr import (
        ensure_phrase_index_incremental,
    )

    shutil.rmtree(ensure_phrase_index_incremental(sf_smoke_dir), ignore_errors=True)
    idx = ensure_phrase_index_incremental(sf_smoke_dir)
    victims = sorted(
        glob.glob(os.path.join(idx, "gen=0", "**", "*.parquet"), recursive=True)
    )
    assert victims
    try:
        with open(victims[0], "ab") as f:
            f.write(b"CORRUPT")
        with _pytest.raises(RuntimeError, match="modified after publish"):
            ensure_phrase_index_incremental(sf_smoke_dir)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    # rebuild after deletion works and serves a fresh, verified index
    assert ensure_phrase_index_incremental(sf_smoke_dir) == idx


def test_phrase_incremental_touched_history_fails_loudly(ray_session, sf_smoke_dir):
    """Even an mtime-only touch (same bytes) trips the manifest — the
    cheap stat-level contract that nothing rewrote history in place."""
    import shutil

    import pytest as _pytest

    from khl_pdf_ocr_ray.pipelines.queries_substr import (
        ensure_phrase_index_incremental,
    )

    shutil.rmtree(ensure_phrase_index_incremental(sf_smoke_dir), ignore_errors=True)
    idx = ensure_phrase_index_incremental(sf_smoke_dir)
    victims = sorted(
        glob.glob(os.path.join(idx, "gen=1", "**", "*.parquet"), recursive=True)
    )
    assert victims
    try:
        os.utime(victims[0])
        with _pytest.raises(RuntimeError, match="modified after publish"):
            ensure_phrase_index_incremental(sf_smoke_dir)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
