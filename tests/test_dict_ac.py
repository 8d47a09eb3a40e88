"""Aho-Corasick dictionary tagging: kernel parity with the vectorized
per-pattern scan, non-overlap semantics, and the Ray-level hash match
between ``dictionary_tag_ac`` and ``dictionary_tag``."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _ac_counts(patterns, texts):
    from khl_pdf_ocr_ray.pipelines.queries_dict import AhoCorasick

    ac = AhoCorasick(patterns)
    p = len(patterns)
    occ = np.zeros(p, np.int64)
    seen = np.zeros(p, bool)
    last = np.zeros(p, np.int64)
    nd = np.zeros(p, np.int64)
    for t in texts:
        touched = []
        ac.scan_into(t.encode("utf-8"), occ, seen, last, touched)
        for i in touched:
            nd[i] += 1
            seen[i] = False
            last[i] = 0
    return nd, occ


def _reference_counts(patterns, texts):
    arr = pa.array(texts)
    nd, occ = [], []
    for pat in patterns:
        c = pc.count_substring(arr, pat)
        occ.append(pc.sum(pc.cast(c, pa.int64())).as_py() or 0)
        nd.append(pc.sum(pc.cast(pc.greater(c, 0), pa.int64())).as_py() or 0)
    return np.asarray(nd), np.asarray(occ)


def test_ac_non_overlap_semantics():
    # the canonical overlap case: 'aa' in 'aaa' counts ONCE (left-to-right
    # non-overlapping), matching pc.count_substring and the SQL oracle
    nd, occ = _ac_counts(["aa"], ["aaa"])
    assert occ[0] == 1 and nd[0] == 1
    nd, occ = _ac_counts(["aa"], ["aaaa"])
    assert occ[0] == 2
    # suffix-nested patterns both fire at the same end position
    nd, occ = _ac_counts(["data row", "row", "w"], ["data row"])
    assert list(occ) == [1, 1, 1]


def test_ac_matches_count_substring_planted():
    pats = ["data", "row", "data row", "a r", "zz-absent-zz", "a", "aa", "ß"]
    texts = ["aaa", "aa aa", "data row data row", "a r", "", "dddata rowow", "ßßß"]
    nd_a, occ_a = _ac_counts(pats, texts)
    nd_r, occ_r = _reference_counts(pats, texts)
    assert list(nd_a) == list(nd_r)
    assert list(occ_a) == list(occ_r)


def test_ac_matches_count_substring_randomized():
    import random

    rnd = random.Random(1234)
    alpha = "abcd "
    texts = [
        "".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 300)))
        for _ in range(80)
    ]
    pats = sorted(
        {
            "".join(rnd.choice(alpha) for _ in range(rnd.randrange(1, 6)))
            for _ in range(60)
        }
    )
    nd_a, occ_a = _ac_counts(pats, texts)
    nd_r, occ_r = _reference_counts(pats, texts)
    assert list(nd_a) == list(nd_r)
    assert list(occ_a) == list(occ_r)


def test_ac_build_scales_with_pattern_bytes_not_alphabet():
    """Sparse goto: state count is bounded by total pattern bytes + 1."""
    from khl_pdf_ocr_ray.pipelines.queries_dict import AhoCorasick

    pats = ["abc", "abd", "bcd", "zzz"]
    ac = AhoCorasick(pats)
    assert len(ac._goto) <= sum(len(p) for p in pats) + 1


def test_dictionary_tag_ac_matches_scan_query(ray_session, sf_smoke_dir):
    """The actor-pool AC query must be row-for-row equal to the vectorized
    per-pattern scan on the same dictionary (the verdict's done-bar)."""
    from khl_pdf_ocr_ray.pipelines.queries_dict import (
        q_dictionary_tag,
        q_dictionary_tag_ac,
    )

    a = (
        q_dictionary_tag(sf_smoke_dir)
        .to_pandas()
        .sort_values("pattern")
        .reset_index(drop=True)
    )
    b = (
        q_dictionary_tag_ac(sf_smoke_dir)
        .to_pandas()
        .sort_values("pattern")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a[a["pattern"] == "zz-absent-zz"][["n_docs", "n_occ"]] == 0).all().all()
