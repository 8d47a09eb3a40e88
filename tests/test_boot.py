"""Poisson-bootstrap CI kernel tests: weight-ladder distribution,
partial mergeability, CI ordering and coverage behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_boot import (
    _POIS_CUM,
    _U_MOD,
    BOOT_B,
    boot_finalize,
    boot_partial,
    boot_uniform,
)


def test_poisson_thresholds_match_cdf():
    import math

    acc = 0.0
    for k, c in enumerate(_POIS_CUM):
        acc += math.exp(-1.0) / math.factorial(k)
        assert c == int(math.floor(acc * _U_MOD))
    # tail mass P(w > 6) ~ 8.3e-5 -> ~87 grid units uncovered
    assert _U_MOD - 100 < _POIS_CUM[-1] < _U_MOD


def test_weight_distribution_is_poisson_like():
    """Over many rows, the hash-derived weights follow Poisson(1):
    mean ~ 1 and P(w = 0) ~ 1/e."""
    eid = np.arange(200_000, dtype=np.int64)
    u = boot_uniform(eid, 0)
    w = np.searchsorted(np.array(_POIS_CUM), u, side="right")
    assert abs(w.mean() - 1.0) < 0.01
    assert abs((w == 0).mean() - np.exp(-1.0)) < 0.01
    assert w.max() <= 7


def test_boot_partial_merges_like_whole():
    rng = np.random.default_rng(6)
    eid = rng.integers(0, 10**6, size=500).astype(np.int64)
    val = rng.uniform(1, 50, size=500)
    whole = boot_partial(
        pa.table({"event_id": eid, "value": val})
    ).to_pandas()
    a = boot_partial(
        pa.table({"event_id": eid[:200], "value": val[:200]})
    ).to_pandas()
    b = boot_partial(
        pa.table({"event_id": eid[200:], "value": val[200:]})
    ).to_pandas()
    merged = (
        pd.concat([a, b]).groupby("r", as_index=False).sum()
    )
    pd.testing.assert_frame_equal(
        whole.sort_values("r", ignore_index=True),
        merged.sort_values("r", ignore_index=True),
    )


def test_boot_finalize_ci_brackets_mean():
    rng = np.random.default_rng(8)
    eid = rng.integers(0, 10**6, size=5000).astype(np.int64)
    val = rng.uniform(10, 30, size=5000)
    allrows = boot_partial(
        pa.table({"event_id": eid, "value": val})
    ).to_pandas()
    parts = allrows[allrows["r"] >= 0]
    tot = allrows[allrows["r"] == -1]
    cents = np.floor(val * 100 + 0.5).astype(np.int64)
    # the r = -1 totals row carries n and the plain cents sum
    assert int(tot["sw"].iloc[0]) == len(val)
    assert int(tot["swc"].iloc[0]) == int(cents.sum())
    mean, lo, hi = boot_finalize(parts, len(val), int(cents.sum()))
    assert lo < hi
    assert lo < mean < hi  # CI brackets the point estimate on iid data
    # and is reasonably tight for n = 5000 (std/sqrt(n) scale)
    assert (hi - lo) < 0.1 * mean
    assert len(parts) == BOOT_B
