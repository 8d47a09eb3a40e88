"""Kernel tests for the decile lift table."""

import pandas as pd

from khl_pdf_ocr_ray.pipelines.queries_lift import LIFT_K, lift_assign_shard


def _shard(ids, scores, langs):
    return pd.DataFrame({"doc_id": ids, "n_chars": scores, "lang": langs})


def test_desc_rank_with_offsets():
    # scores 30 > 20 > 10, cum_before built over DESC order
    g = _shard([1, 2, 3], [10, 30, 20], ["en", "en", "de"])
    cum_before = {30: 0, 20: 1, 10: 2}
    out = lift_assign_shard(g, cum_before, n_total=3)
    # NTILE(10) with n=3: ranks 0,1,2 -> tiles 1,2,3
    total = dict(zip(out["tile"], out["n"]))
    assert total == {1: 1, 2: 1, 3: 1}
    pos = dict(zip(out["tile"], out["n_pos"]))
    assert pos == {1: 1, 2: 0, 3: 1}  # score 30 is en, 20 de, 10 en


def test_tie_break_by_doc_id():
    # same score: lower doc_id gets the earlier (better) rank
    g = _shard([7, 3], [50, 50], ["de", "en"])
    out = lift_assign_shard(g, {50: 0}, n_total=2)
    pos = dict(zip(out["tile"], out["n_pos"]))
    assert pos[1] == 1  # doc 3 (en) ranks first
    assert pos[2] == 0


def test_partials_are_rollups_not_rows():
    n = 500
    g = _shard(list(range(n)), [9] * n, ["en" if i % 3 == 0 else "de" for i in range(n)])
    out = lift_assign_shard(g, {9: 0}, n_total=n)
    assert len(out) <= LIFT_K  # per-tile partials, never per-doc rows
    assert out["n"].sum() == n
    assert out["n_pos"].sum() == len([i for i in range(n) if i % 3 == 0])
