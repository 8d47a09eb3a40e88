"""Kernel tests for postings delta/γ compression accounting."""

import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_postings import (
    distinct_pairs_partial,
    posting_cost_group,
)


def test_distinct_pairs_dedup_within_doc():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b a  b", "b c"], pa.string()),
        }
    )
    out = distinct_pairs_partial(batch)
    got = set(zip(out["token"].to_pylist(), out["doc_id"].to_pylist()))
    assert got == {("a", 1), ("b", 1), ("b", 2), ("c", 2)}


def test_posting_cost_exact_bits():
    # ids [0, 1, 5]: gaps = [1, 1, 4] -> bit lengths [1, 1, 3]
    g = pd.DataFrame({"token": ["t"] * 3, "doc_id": [5, 0, 1]})
    out = posting_cost_group(g)
    assert out["df"].tolist() == [3]
    assert out["raw_bits"].tolist() == [192]
    assert out["delta_bits"].tolist() == [1 + 1 + 3]
    assert out["gamma_bits"].tolist() == [1 + 1 + 5]


def test_posting_cost_single_doc():
    # id [7]: first gap = 8 -> bit length 4; gamma = 2*4-1
    g = pd.DataFrame({"token": ["t"], "doc_id": [7]})
    out = posting_cost_group(g)
    assert out["delta_bits"].tolist() == [4]
    assert out["gamma_bits"].tolist() == [7]
