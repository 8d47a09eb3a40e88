"""Giant-document skew: generation, isolation keys, byte-identity on giants."""

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def skewed_dir(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import synthesize_pages

    # ~5% giants: content repeated 100x (FIXTURES.md size-skew variant)
    return synthesize_pages(sf_smoke_dir, repeat=1, giants_per_mille=50)


def test_skew_corpus_has_giants(skewed_dir):
    import numpy as np

    t = pq.read_table(skewed_dir, columns=["html"])
    sizes = np.array([len(b) for b in t["html"].to_pylist() if b])
    p50, p99 = np.percentile(sizes, [50, 99])
    assert p99 > 20 * p50, (p50, p99)  # heavy tail present


def test_giant_isolation_keys(ray_session, skewed_dir):
    import ray.data as rd

    from khl_pdf_ocr_ray.remote import remote_fn
    from khl_pdf_ocr_ray.stages.skew import GIANT_KEY_BASE

    pages = rd.read_parquet(skewed_dir, columns=["url", "html"]).map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.extract", "meta_stage"),
        batch_format="pyarrow",
    )
    keyed = pages.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.skew",
            "add_partition_key",
            giant_threshold=20_000,  # giants in this corpus are ~30-60KB
        ),
        batch_format="pyarrow",
    ).to_pandas()
    giants = keyed[keyed["n_bytes"] > 20_000]
    assert len(giants) > 0
    # every giant landed in the dedicated key range, one key per document
    assert (giants["part_key"] >= GIANT_KEY_BASE).all()
    assert giants["part_key"].nunique() == len(giants)
    normal = keyed[keyed["n_bytes"] <= 20_000]
    assert (normal["part_key"] < GIANT_KEY_BASE).all()


def test_giants_extract_byte_identical(ray_session, skewed_dir):
    from khl_pdf_ocr_ray.functions.doc_extract import extract_document
    from khl_pdf_ocr_ray.pipelines.extract_pipeline import run_extract

    out = run_extract(skewed_dir).to_pandas()
    src = pq.read_table(skewed_dir).to_pandas()
    big = src[src["html"].map(lambda b: b is not None and len(b) > 20_000)]
    assert len(big) > 0
    texts = dict(zip(out["url"], out["text"]))
    for rec in big.itertuples():
        oracle = extract_document(rec.html, rec.text)
        assert texts[rec.url] == oracle["text"], rec.url


def test_detect_hot_hosts_sampled_feed(ray_session):
    """Forcing the sampled path (threshold 0): the deterministic 1-in-100
    url-residue sample still finds the planted hot host on a skewed
    corpus, and the estimate is reproducible run-to-run."""
    import pyarrow as pa
    import ray.data as rd

    from khl_pdf_ocr_ray.stages.skew import detect_hot_hosts

    hosts = ["hot.example.com"] * 6000 + [f"site{i}.example.org" for i in range(4000)]
    urls = [f"https://{h}/p/{i}" for i, h in enumerate(hosts)]
    pages = rd.from_arrow(
        pa.table({"host": pa.array(hosts), "url": pa.array(urls)})
    ).repartition(8)
    sampled = detect_hot_hosts(pages, sample_threshold=0)
    assert sampled == ["hot.example.com"]
    assert detect_hot_hosts(pages, sample_threshold=0) == sampled  # deterministic
    exact = detect_hot_hosts(pages)  # below the default threshold -> exact
    assert exact == ["hot.example.com"]


# --- skew_join (hot-key-aware join) --------------------------------------------
def test_skew_join_hot_and_cold_paths_agree(ray_session, sf_smoke_dir):
    """The hot-key split produces exactly the plain-join result: running
    skew_join with a threshold that fires (planted user 0 is hot) equals
    running it with a threshold no key reaches (pure shuffle fallback)."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Count

    from khl_pdf_ocr_ray.joins import skew_join
    from khl_pdf_ocr_ray.pipelines.queries_rel import (
        SKEW_HOT_THRESHOLD,
        q_skew_join_events,
    )
    from khl_pdf_ocr_ray.pipelines.queries import _t
    from khl_pdf_ocr_ray.remote import remote_fn

    split = q_skew_join_events(sf_smoke_dir).to_pandas()
    # the planted hot key accounts for about half the stream
    n0 = (split["user_id"] == 0).sum()
    assert n0 > len(split) * 0.4

    ev = _t(sf_smoke_dir, "events", ["event_id", "user_id"]).map_batches(
        remote_fn("khl_pdf_ocr_ray.pipelines.queries_rel", "skew_plant_batch"),
        batch_format="pyarrow",
    )
    dim = (
        ev.map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_rel", "skew_dim_partial"),
            batch_format="pyarrow",
        )
        .groupby("u_r")
        .aggregate(Count(alias_name="n_"))
        .select_columns(["u_r"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_rel", "skew_dim_seg"),
            batch_format="pyarrow",
        )
    )
    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("seg", pa.int64())]
    )
    fallback = skew_join(
        ev, dim, key="user_id", right_key="u_r", out_schema=schema,
        hot_count_threshold=10**9,  # nothing is hot: pure shuffle path
    ).to_pandas()

    def _norm(df):
        return df.sort_values(["event_id"]).reset_index(drop=True)[
            ["event_id", "user_id", "seg"]
        ]

    pd.testing.assert_frame_equal(_norm(split), _norm(fallback))
