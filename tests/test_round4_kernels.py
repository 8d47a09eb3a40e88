"""Kernel-level checks for the round-4 operators, beyond oracle parity:
combiner mergeability (quota, keep-best), containment directionality,
and the alignment margin rule."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


def test_quota_partial_is_mergeable():
    """Applying the bottom-K combiner to split batches then once more to
    the concatenated partials yields the same winners as one global pass
    (the property the shuffle relies on)."""
    from khl_pdf_ocr_ray.pipelines.queries_prep import QUOTA_K, quota_partial

    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype("int64"),
            "source": rng.choice([f"s{i}" for i in range(9)], n),
        }
    )
    whole = quota_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [quota_partial(_t(df.iloc[i : i + 37])).to_pandas() for i in range(0, n, 37)],
        ignore_index=True,
    )
    merged = quota_partial(_t(parts)).to_pandas()
    key = lambda d: sorted(map(tuple, d[["source", "doc_id"]].to_numpy().tolist()))
    assert key(whole) == key(merged)
    # and the rule really is bottom-K per source
    assert (whole.groupby("source")["doc_id"].count() <= QUOTA_K).all()
    for src, g in df.groupby("source"):
        expect = sorted(g["doc_id"])[:QUOTA_K]
        got = sorted(whole.loc[whole["source"] == src, "doc_id"])
        assert got == expect


def test_containment_finalize_is_directional():
    """A short doc fully inside a long one scores 100 one way and low the
    other — the asymmetry Jaccard misses."""
    from khl_pdf_ocr_ray.stages.dedup import containment_finalize

    t = _t(
        pd.DataFrame(
            {
                "doc_a": [1],
                "doc_b": [2],
                "common": [10],  # all of a's shingles
                "n_a": [10],
                "n_b": [100],
            }
        )
    )
    out = containment_finalize(t, 80).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["doc_sub"] == 1 and out.iloc[0]["doc_sup"] == 2
    assert out.iloc[0]["containment_x100"] == 100
    # lower threshold surfaces the reverse direction too
    both = containment_finalize(t, 10).to_pandas()
    assert len(both) == 2
    assert set(zip(both["doc_sub"], both["doc_sup"])) == {(1, 2), (2, 1)}


def test_align_merge_margin_rule():
    """A query whose best beats the runner-up by >= the margin matches;
    a near-tie does not; a single-candidate query never matches."""
    from khl_pdf_ocr_ray.stages.knn import align_merge

    partials = pd.DataFrame(
        {
            "query_id": [1, 1, 2, 2, 3],
            "neighbor_id": [10, 11, 20, 21, 30],
            "sim": [0.90, 0.60, 0.80, 0.79, 0.99],
        }
    )
    out = align_merge(partials, margin_e6=20_000)
    assert list(out["query_id"]) == [1]
    assert list(out["match_id"]) == [10]
    assert int(out["margin_e6"].iloc[0]) == 300_000


def test_keep_best_partial_is_mergeable():
    from khl_pdf_ocr_ray.stages.dedup import keep_best_partial

    rng = np.random.default_rng(11)
    n = 200
    df = pd.DataFrame(
        {
            "cluster_id": rng.integers(0, 12, n).astype("int64"),
            "doc_id": rng.permutation(n).astype("int64"),
            "len_chars": rng.integers(0, 50, n).astype("int64"),  # many ties
            "cluster_size": np.full(n, 7, dtype="int64"),
        }
    )
    whole = keep_best_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [
            keep_best_partial(_t(df.iloc[i : i + 23])).to_pandas()
            for i in range(0, n, 23)
        ],
        ignore_index=True,
    )
    merged = keep_best_partial(_t(parts)).to_pandas()
    key = lambda d: sorted(
        map(tuple, d[["cluster_id", "doc_id", "len_chars"]].to_numpy().tolist())
    )
    assert key(whole) == key(merged)
    # rule: per cluster the max length, ties to the lowest doc_id
    for cid, g in df.groupby("cluster_id"):
        g = g.sort_values(["len_chars", "doc_id"], ascending=[False, True])
        win = whole[whole["cluster_id"] == cid]
        assert int(win["doc_id"].iloc[0]) == int(g["doc_id"].iloc[0])
