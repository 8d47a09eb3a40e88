"""Kernel + planted-violation tests for the DQ constraint suite.

The corpus is clean (all gate violations are 0), so these tests PLANT
violations to prove every counting path actually counts."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from khl_pdf_ocr_ray.pipelines.queries_dq import (
    _fk_violations,
    documents_dq_partial,
    embeddings_dq_partial,
    events_dq_partial,
    key_cells,
    lineitem_dq_partial,
    orders_dq_partial,
)


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


def test_planted_range_and_price_violations():
    li = lineitem_dq_partial(
        _t(pd.DataFrame({"l_quantity": [0.5, 1.0, 50.0, 51.0, 10.0]}))
    ).to_pandas()
    assert li["n"].tolist() == [5] and li["viol_qty"].tolist() == [2]
    o = orders_dq_partial(
        _t(pd.DataFrame({"o_totalprice": [-1.0, 0.0, 5.0]}))
    ).to_pandas()
    assert o["viol_price"].tolist() == [2]  # <= 0 violates


def test_planted_domain_text_dim_violations():
    ev = events_dq_partial(
        _t(pd.DataFrame({"event_type": ["click", "CLICK", "view", "bogus"]}))
    ).to_pandas()
    assert ev["viol_domain"].tolist() == [2]
    dc = documents_dq_partial(
        _t(pd.DataFrame({"text": ["ok", "", None, "x"]}))
    ).to_pandas()
    assert dc["viol_text"].tolist() == [2]
    em = embeddings_dq_partial(
        pa.table(
            {
                "embedding": pa.array(
                    [[0.0] * 64, [0.0] * 63, [0.0] * 65], pa.list_(pa.float32())
                )
            }
        )
    ).to_pandas()
    assert em["viol_dim"].tolist() == [2]


def test_key_cells_counts_duplicates():
    cells = key_cells(
        _t(pd.DataFrame({"o_orderkey": np.int64([1, 1, 2, 3, 3, 3])})),
        "o_orderkey",
    ).to_pandas()
    assert sorted(cells["n"].tolist()) == [1, 2, 3]


def test_fk_violations_planted(tmp_path, ray_session):
    """Fact rows pointing at missing ref keys are counted as ROWS."""
    d = str(tmp_path)
    pq.write_table(
        _t(
            pd.DataFrame(
                {"o_custkey": np.int64([1, 1, 2, 9, 9, 9]), "pad": range(6)}
            )
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        _t(pd.DataFrame({"c_custkey": np.int64([1, 2, 3])})),
        os.path.join(d, "customer.parquet"),
    )
    n, viol = _fk_violations(d, "orders", "o_custkey", "customer", "c_custkey")
    assert n == 6
    assert viol == 3  # the three key-9 ROWS, not 1 key
