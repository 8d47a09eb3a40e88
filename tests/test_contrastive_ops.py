"""Kernel tests for contrastive pair mining."""

import pandas as pd

from khl_pdf_ocr_ray.pipelines.queries_contrastive import (
    NEG_PER_ANCHOR,
    cluster_pairs_group,
    neg_draws,
)


def _cluster(cid, members):
    return pd.DataFrame({"cluster_id": [cid] * len(members), "doc_id": members})


def test_anchor_star_positives():
    out = cluster_pairs_group(_cluster(7, [30, 10, 20]), n_base=1000)
    pos = out[out["label"] == 1]
    assert pos["anchor"].tolist() == [10, 10]
    assert sorted(pos["other"].tolist()) == [20, 30]


def test_negative_determinism_and_count():
    out1 = cluster_pairs_group(_cluster(1, [5, 6]), n_base=500)
    out2 = cluster_pairs_group(_cluster(1, [5, 6]), n_base=500)
    pd.testing.assert_frame_equal(out1, out2)
    neg = out1[out1["label"] == 0]
    assert len(neg) <= NEG_PER_ANCHOR
    assert neg["other"].tolist() == [
        d for d in neg_draws(5, 500) if d not in (5, 6)
    ]


def test_collision_with_member_dropped():
    anchor = 11
    draws = neg_draws(anchor, 100)
    members = [anchor, draws[0]]  # first draw collides with a member
    out = cluster_pairs_group(_cluster(2, members), n_base=100)
    neg = out[out["label"] == 0]["other"].tolist()
    assert draws[0] not in neg or draws[0] == draws[1]
    assert len(neg) == len([d for d in draws if d not in members])


def test_negatives_in_base_range():
    for anchor in (0, 1, 999, 123456):
        for d in neg_draws(anchor, 777):
            assert 0 <= d < 777
