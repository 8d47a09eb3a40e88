"""Property-based tests (SURVEY.md §5.3): line-reconstruction invariants."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from khl_pdf_ocr_ray.functions.textgeom import lines_from_words, split_columns

tokens = st.text(
    alphabet="abcdefgабвгдеХКС0123456789", min_size=1, max_size=8
).filter(lambda s: s.strip())

words_strategy = st.lists(
    st.tuples(
        st.floats(min_value=0, max_value=1000, allow_nan=False, width=32),
        st.floats(min_value=0, max_value=600, allow_nan=False, width=32),
        tokens,
    ),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(words_strategy)
def test_every_token_appears_exactly_once(words):
    lines = lines_from_words(words)
    out_tokens = [t for ln in lines for t in ln.split(" ")]
    exp_tokens = sorted(t for _y, _x, tok in words for t in re.split(r"\s+", tok) if t)
    assert sorted(out_tokens) == exp_tokens


@settings(max_examples=200, deadline=None)
@given(words_strategy)
def test_deterministic_under_same_order(words):
    assert lines_from_words(words) == lines_from_words(words)


@settings(max_examples=200, deadline=None)
@given(words_strategy)
def test_column_split_partitions_words(words):
    _lines, cols = split_columns(words)
    assert len(cols["left"]) + len(cols["right"]) == len(words)
    if words:
        assert len(cols["left"]) >= 1  # the median element itself ties left


@settings(max_examples=100, deadline=None)
@given(words_strategy)
def test_lines_sorted_by_cluster_key(words):
    # reconstructed lines follow ascending cluster-key order; keys are the
    # first member's y, so re-running on the same input is stable
    lines1 = lines_from_words(words)
    lines2 = lines_from_words(list(words))
    assert lines1 == lines2


def _cluster_rows_naive(words, tolerance=3.0):
    """The reference's literal greedy scan (app.py:97-109) — the equivalence
    oracle for the bisect-indexed implementation."""
    clusters = {}
    for y, x, tok in words:
        target = None
        for ky in clusters:
            if abs(ky - y) <= tolerance:
                target = ky
                break
        if target is None:
            target = y
            clusters[target] = []
        clusters[target].append((x, tok))
    return sorted(clusters.items())


@settings(max_examples=300, deadline=None)
@given(words_strategy)
def test_bisect_clustering_equals_naive_scan(words):
    from khl_pdf_ocr_ray.functions.textgeom import cluster_rows

    assert cluster_rows(words, 3.0) == _cluster_rows_naive(words, 3.0)


@settings(max_examples=100, deadline=None)
@given(words_strategy, st.floats(min_value=0.1, max_value=50, allow_nan=False))
def test_bisect_clustering_equals_naive_any_tolerance(words, tol):
    from khl_pdf_ocr_ray.functions.textgeom import cluster_rows

    assert cluster_rows(words, tol) == _cluster_rows_naive(words, tol)


# --- banded Levenshtein (stages/dedup.py) ------------------------------------
def _lev_ref(a, b):
    la, lb = len(a), len(b)
    D = list(range(lb + 1))
    for i in range(1, la + 1):
        prev_diag, D[0] = D[0], i
        for j in range(1, lb + 1):
            prev_diag, D[j] = D[j], min(
                D[j] + 1, D[j - 1] + 1, prev_diag + (a[i - 1] != b[j - 1])
            )
    return D[lb]


_str_strategy = st.text(alphabet="ab -", min_size=0, max_size=12)


@settings(max_examples=300, deadline=None)
@given(_str_strategy, _str_strategy, st.integers(min_value=0, max_value=6))
def test_banded_levenshtein_agrees_with_reference(a, b, k):
    import numpy as np

    from khl_pdf_ocr_ray.stages.dedup import _pad_codes, levenshtein_pairs

    ca, la = _pad_codes([a], 12)
    cb, lb = _pad_codes([b], 12)
    exp = _lev_ref(a[:12], b[:12])
    full = int(levenshtein_pairs(ca, la, cb, lb)[0])
    assert full == exp
    banded = int(levenshtein_pairs(ca, la, cb, lb, max_dist=k)[0])
    if exp <= k:
        assert banded == exp
    else:
        assert banded > k


# --- funnel reach (pipelines/queries_rel.py) ---------------------------------
def _funnel_ref(events):
    """Chained-min reference: t_i = min ts of stage i at-or-after t_{i-1}."""
    from khl_pdf_ocr_ray.pipelines.queries_rel import FUNNEL_STAGES

    reach, prev = 0, None
    for stage in FUNNEL_STAGES:
        cand = [t for t, e in events if e == stage and (prev is None or t >= prev)]
        if not cand:
            break
        prev = min(cand)
        reach += 1
    return reach


_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=300, deadline=None)
@given(_events_strategy)
def test_funnel_reach_agrees_with_chained_min_reference(events):
    import pandas as pd

    from khl_pdf_ocr_ray.pipelines.queries_rel import funnel_user_reach

    g = pd.DataFrame(
        {
            "event_type": [e for _, e in events],
            "ts": pd.to_datetime([t for t, _ in events], unit="s"),
        }
    )
    out = funnel_user_reach(g)
    got = 0 if out.empty else int(out["reach"].iloc[0])
    assert got == _funnel_ref(events)
