"""Kernel-level checks for the positional-substring operators
(pipelines/queries_substr.py) beyond the parametrized oracle parity test:
span-merge interval geometry, phrase-scan edges (overlap, short docs,
nulls), and the snapshot-hash side split."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_substr import (
    PHRASE,
    SPAN_K,
    kgram_doc_distinct,
    kgram_pos_explode,
    merge_spans,
    phrase_scan,
    snapshot_hash,
)


def _docs_batch(rows):
    ids, texts = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _spans(positions):
    g = pd.DataFrame({"doc_id": [7] * len(positions), "pos": positions})
    out = merge_spans(g).sort_values("span_start").reset_index(drop=True)
    return list(zip(out.span_start, out.span_end, out.n_grams))


def test_merge_spans_geometry():
    # single mark -> one K-wide span
    assert _spans([4]) == [(4, 4 + SPAN_K, 1)]
    # overlapping windows merge
    assert _spans([0, 1, 2]) == [(0, 2 + SPAN_K, 3)]
    # exact adjacency (gap == K) merges into one contiguous span
    assert _spans([0, SPAN_K]) == [(0, 2 * SPAN_K, 2)]
    # gap == K+1 splits: [0,K) and [K+1, 2K+1) leave a 1-word hole
    assert _spans([0, SPAN_K + 1]) == [
        (0, SPAN_K, 1),
        (SPAN_K + 1, 2 * SPAN_K + 1, 1),
    ]
    # unsorted input is sorted before merging
    assert _spans([9, 0, 1]) == [(0, 1 + SPAN_K, 2), (9, 9 + SPAN_K, 1)]


def test_kgram_explodes_agree_and_handle_short_docs():
    words = " ".join(f"w{i}" for i in range(SPAN_K + 2))
    batch = _docs_batch(
        [(1, words), (2, "too short"), (3, None), (4, "")]
    )
    pos = kgram_pos_explode(batch).to_pandas()
    # only doc 1 is long enough; 3 start positions
    assert pos.doc_id.unique().tolist() == [1]
    assert pos.pos.tolist() == [0, 1, 2]
    # distinct view covers exactly the same grams
    dist = kgram_doc_distinct(batch).to_pandas()
    assert set(dist.ng) == set(pos.ng)


def test_kgram_distinct_dedupes_repeats():
    # one doc made of one repeated word: every K-gram is identical
    batch = _docs_batch([(1, " ".join(["x"] * (SPAN_K * 3)))])
    assert len(kgram_doc_distinct(batch)) == 1
    assert len(kgram_pos_explode(batch)) == SPAN_K * 3 - SPAN_K + 1


def test_phrase_scan_counts_and_first_pos():
    pad = "z " * 3
    batch = _docs_batch(
        [
            (1, f"{PHRASE}"),                    # exact doc == phrase
            (2, f"{pad}{PHRASE} {PHRASE}"),      # two disjoint hits
            (3, "nothing here at all"),
            (4, None),
            (5, "data row"),                     # shorter than the phrase
        ]
    )
    out = phrase_scan(batch).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [1, 0]
    assert out.loc[2].n_hits == 2 and out.loc[2].first_pos == 3
    assert set(out.index) == {1, 2}


def test_phrase_scan_overlapping_hits():
    # self-overlapping phrase pattern: "a a a a" contains "a a a" at 0 and 1
    import khl_pdf_ocr_ray.pipelines.queries_substr as m

    old = m.PHRASE
    try:
        m.PHRASE = "a a a"
        out = phrase_scan(_docs_batch([(1, "a a a a")])).to_pandas()
        assert out.n_hits.tolist() == [2] and out.first_pos.tolist() == [0]
    finally:
        m.PHRASE = old


def test_snapshot_hash_sides():
    batch = _docs_batch([(0, "even doc"), (1, "odd doc"), (2, "even doc"), (3, None)])
    old = snapshot_hash(batch, old_side=True).to_pandas()
    new = snapshot_hash(batch, old_side=False).to_pandas()
    # old side: distinct digests only (docs 0 and 2 share one)
    assert list(old.columns) == ["h_r"] and len(old) == 1
    assert sorted(new.doc_id) == [1, 3]
    # null text hashes like empty string (oracle's coalesce(text,''))
    import hashlib

    assert (
        new.set_index("doc_id").loc[3, "text_hash"]
        == hashlib.md5(b"").hexdigest()
    )


# --- property tests (hypothesis) ---------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


def _naive_merge(positions, k):
    """Brute-force interval union of [p, p+k) windows with touching merge."""
    spans = []
    for p in sorted(set(positions)):
        if spans and p <= spans[-1][1]:
            spans[-1][1] = max(spans[-1][1], p + k)
            spans[-1][2] += 1
        else:
            spans.append([p, p + k, 1])
    return [(a, b, c) for a, b, c in spans]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=40, unique=True))
def test_merge_spans_matches_naive_interval_union(positions):
    got = _spans(positions)
    assert got == _naive_merge(positions, SPAN_K)
    # spans never overlap and are sorted
    for (a1, b1, _), (a2, _b2, _) in zip(got, got[1:]):
        assert b1 < a2


_vocab = st.sampled_from(["a", "b", "data", "row", "column"])


@settings(max_examples=150, deadline=None)
@given(st.lists(_vocab, min_size=0, max_size=30))
def test_phrase_scan_matches_naive(tokens):
    text = " ".join(tokens)
    out = phrase_scan(_docs_batch([(1, text)])).to_pandas()
    phrase = PHRASE.split(" ")
    naive = [
        i
        for i in range(len(tokens) - len(phrase) + 1)
        if tokens[i : i + len(phrase)] == phrase
    ]
    if not naive:
        assert out.empty
    else:
        assert out.n_hits.tolist() == [len(naive)]
        assert out.first_pos.tolist() == [naive[0]]
