"""Kernel tests for the cross-source duplication matrix."""

import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_dupmatrix import (
    canonical_cell_batch,
    normalize_pair_batch,
)
from khl_pdf_ocr_ray.stages.dedup import VARIANT_OFFSET


def test_variant_ids_map_to_base():
    batch = pa.table(
        {
            "doc_a": pa.array([5, VARIANT_OFFSET + 5, 7], pa.int64()),
            "doc_b": pa.array([VARIANT_OFFSET + 9, 9, VARIANT_OFFSET + 7], pa.int64()),
        }
    )
    out = normalize_pair_batch(batch)
    assert out["a"].to_pylist() == [5, 5, 7]
    assert out["b"].to_pylist() == [9, 9, 7]


def test_cells_are_unordered():
    batch = pa.table(
        {
            "src_a": pa.array(["srcB", "srcA", "srcC"]),
            "src_b": pa.array(["srcA", "srcB", "srcC"]),
        }
    )
    out = canonical_cell_batch(batch)
    assert out["source_a"].to_pylist() == ["srcA", "srcA", "srcC"]
    assert out["source_b"].to_pylist() == ["srcB", "srcB", "srcC"]
