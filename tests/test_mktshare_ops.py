"""Kernel tests for the Q8/Q14-flavored market-share wave."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


def test_member_mask_edges():
    from khl_pdf_ocr_ray.pipelines.queries_mktshare import _member_mask

    keys = pa.chunked_array([pa.array([1, 5, 9, 100], pa.int64())])
    assert _member_mask(keys, []).tolist() == [False] * 4
    # value above max of the member list must not index out of range
    assert _member_mask(keys, [1, 9]).tolist() == [True, False, True, False]


def test_share_cells_filters_and_flags_nation():
    from khl_pdf_ocr_ray.pipelines.queries_mktshare import share_cells

    batch = _t(
        pd.DataFrame(
            {
                "l_orderkey": np.int64([10, 10, 11, 12]),
                "l_partkey": np.int64([1, 2, 1, 3]),
                "l_suppkey": np.int64([100, 101, 100, 100]),
                "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
                "l_discount": [0.0, 0.5, 0.0, 0.0],
            }
        )
    )
    # part 3 is NOT a member; supplier 100 -> nation 7 (target), 101 -> 8
    out = (
        share_cells(batch, [1, 2], {100: 7, 101: 8}, 7)
        .to_pandas()
        .sort_values("l_orderkey")
    )
    assert out["l_orderkey"].tolist() == [10, 11]
    # order 10: 1000 cents (nation) + 1000 cents (non-nation, 50% disc)
    assert out["cents"].tolist() == [2000, 3000]
    assert out["nat_cents"].tolist() == [1000, 3000]


def test_share_cells_empty_after_filter():
    from khl_pdf_ocr_ray.pipelines.queries_mktshare import share_cells

    batch = _t(
        pd.DataFrame(
            {
                "l_orderkey": np.int64([1]),
                "l_partkey": np.int64([9]),
                "l_suppkey": np.int64([100]),
                "l_extendedprice": [10.0],
                "l_discount": [0.0],
            }
        )
    )
    out = share_cells(batch, [1, 2], {100: 7}, 7)
    assert out.num_rows == 0
    assert out.column_names == ["l_orderkey", "cents", "nat_cents"]


def test_promo_partial_and_finalize_permille_floor():
    from khl_pdf_ocr_ray.pipelines.queries_mktshare import (
        promo_finalize,
        promo_month_partial,
    )

    batch = _t(
        pd.DataFrame(
            {
                "l_partkey": np.int64([1, 2, 1]),
                "l_shipdate": pd.to_datetime(
                    ["1995-03-01", "1995-03-15", "1995-04-01"]
                ),
                "l_extendedprice": [10.0, 20.0, 5.0],
                "l_discount": [0.0, 0.0, 0.0],
            }
        )
    )
    part = promo_month_partial(batch, [1]).to_pandas().sort_values("ship_month")
    assert part["ship_month"].tolist() == [199503, 199504]
    assert part["cents"].tolist() == [3000, 500]
    assert part["promo_cents"].tolist() == [1000, 500]

    fin = promo_finalize(
        _t(
            pd.DataFrame(
                {
                    "ship_month": np.int64([199503]),
                    "promo_cents": np.int64([1000]),
                    "total_cents": np.int64([3000]),
                }
            )
        )
    ).to_pandas()
    # 1000*1000 // 3000 = 333 (floor, exact integer)
    assert fin["promo_permille"].tolist() == [333]
