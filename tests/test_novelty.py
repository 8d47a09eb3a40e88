"""ngram_novelty / source_novelty: planted-attribution and invariant
tests for the first-occurrence accounting operator."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_shard_kernel_attributes_to_min_doc():
    from khl_pdf_ocr_ray.pipelines.queries_novelty import novelty_shard_kernel

    g = pd.DataFrame(
        {
            "doc_id": [5, 2, 9, 2, 5],
            "gram": ["a b c", "a b c", "a b c", "x y z", "x y z"],
        }
    )
    out = novelty_shard_kernel(g).set_index("doc_id")
    # doc 2 owns both grams; 5 and 9 own nothing they share with 2
    assert out.loc[2, "n_novel"] == 2 and out.loc[2, "n_grams"] == 2
    assert out.loc[5, "n_novel"] == 0 and out.loc[5, "n_grams"] == 2
    assert out.loc[9, "n_novel"] == 0 and out.loc[9, "n_grams"] == 1


def test_shard_kernel_drops_cross_batch_dups():
    from khl_pdf_ocr_ray.pipelines.queries_novelty import novelty_shard_kernel

    g = pd.DataFrame(
        {"doc_id": [1, 1, 1], "gram": ["a b c", "a b c", "a b c"]}
    )
    out = novelty_shard_kernel(g)
    assert out["n_grams"].tolist() == [1] and out["n_novel"].tolist() == [1]


def test_pairs_partial_distinct_and_sharded():
    from khl_pdf_ocr_ray.pipelines.queries_novelty import (
        NOVELTY_SHARDS,
        novelty_pairs_partial,
    )

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c a b c", "a b"], pa.string()),
        }
    )
    out = novelty_pairs_partial(batch)
    df = out.to_pandas()
    # doc 1 has trigrams: "a b c","b c a","c a b","a b c" -> 3 distinct;
    # doc 2 (< 3 tokens) contributes none
    assert sorted(df["gram"]) == ["a b c", "b c a", "c a b"]
    assert (df["doc_id"] == 1).all()
    assert df["shard"].between(0, NOVELTY_SHARDS - 1).all()
    # same gram -> same shard across batches (determinism)
    again = novelty_pairs_partial(batch).to_pandas()
    assert (
        df.sort_values("gram")["shard"].tolist()
        == again.sort_values("gram")["shard"].tolist()
    )


def test_ngram_novelty_invariants(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries_novelty import (
        NOVELTY_SCALE,
        q_ngram_novelty,
        q_source_novelty,
    )

    doc = q_ngram_novelty(sf_smoke_dir).to_pandas()
    assert len(doc) > 0
    assert (doc["n_novel"] <= doc["n_grams"]).all()
    assert (doc["n_grams"] > 0).all()
    assert (doc["novelty_fx"] <= NOVELTY_SCALE).all()
    # every gram has exactly one owner -> the corpus-wide novel count
    # equals the number of distinct grams; the min doc_id with any grams
    # owns all of its grams (nothing earlier exists)
    first = doc.sort_values("doc_id").iloc[0]
    assert first["n_novel"] == first["n_grams"]
    src = q_source_novelty(sf_smoke_dir).to_pandas()
    assert src["n_docs"].sum() == len(doc)
    assert src["n_grams"].sum() == doc["n_grams"].sum()
    assert src["n_novel"].sum() == doc["n_novel"].sum()


def test_novelty_incremental_semantics(ray_session, sf_smoke_dir):
    """New-snapshot novelty vs the persisted base gram index: variant ids,
    bounded counts, and the appended-token tail producing novel grams for
    any doc long enough to form trigrams with it."""
    from khl_pdf_ocr_ray.pipelines.queries_novelty import (
        q_novelty_incremental,
    )
    from khl_pdf_ocr_ray.stages.dedup import VARIANT_OFFSET

    out = q_novelty_incremental(sf_smoke_dir).to_pandas()
    assert len(out) > 0
    assert (out["doc_id"] >= VARIANT_OFFSET).all()
    assert ((out["doc_id"] - VARIANT_OFFSET) % 3 == 0).all()
    assert (out["n_novel"] <= out["n_grams"]).all()
    # the appended " near duplicate variant" token forms trigrams absent
    # from the base corpus for most variants
    assert (out["n_novel"] > 0).mean() > 0.9


def test_gram_index_cached_and_manifest_protected(ray_session, sf_smoke_dir):
    import glob
    import os
    import shutil

    import pytest as _pytest

    from khl_pdf_ocr_ray.pipelines.queries_novelty import ensure_gram_index

    idx = ensure_gram_index(sf_smoke_dir)
    assert ensure_gram_index(sf_smoke_dir) == idx  # cache hit
    files = glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True)
    assert files
    try:
        with open(files[0], "ab") as f:
            f.write(b"X")
        with _pytest.raises(RuntimeError, match="modified after publish"):
            ensure_gram_index(sf_smoke_dir)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
