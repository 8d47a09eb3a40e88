"""Kernel tests for the shard source-mix entropy audit."""

import math

import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_shardmix import (
    MIX_SCALE,
    entropy_fold,
    shard_source_partial,
)


def test_single_source_entropy_zero():
    rollup = pd.DataFrame({"shard_id": [0], "source": ["a"], "n": [100]})
    out = entropy_fold(rollup)
    assert out["ent_fx"].tolist() == [0]
    assert out["n_sources"].tolist() == [1]


def test_uniform_two_sources_one_bit():
    rollup = pd.DataFrame(
        {"shard_id": [1, 1], "source": ["a", "b"], "n": [64, 64]}
    )
    out = entropy_fold(rollup)
    # H = 1 bit exactly: each term = 64 * log2(128/64) * SCALE = 64 * SCALE
    assert out["ent_fx"].tolist() == [128 * MIX_SCALE]
    assert out["n_docs"].tolist() == [128]


def test_per_term_floor_matches_definition():
    rollup = pd.DataFrame(
        {"shard_id": [2, 2], "source": ["a", "b"], "n": [3, 7]}
    )
    out = entropy_fold(rollup)
    want = sum(
        int(math.floor(v * (math.log2(10) - math.log2(v)) * MIX_SCALE + 0.5))
        for v in (3, 7)
    )
    assert out["ent_fx"].tolist() == [want]


def test_partial_counts_by_shard_and_source():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "source": pa.array(["a", "a", "b", "a"]),
        }
    )
    out = shard_source_partial(batch).to_pandas()
    assert out["n"].sum() == 4
    # deterministic assignment: same doc_id always lands in the same shard
    again = shard_source_partial(batch).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["shard_id", "source"]).reset_index(drop=True),
        again.sort_values(["shard_id", "source"]).reset_index(drop=True),
    )
