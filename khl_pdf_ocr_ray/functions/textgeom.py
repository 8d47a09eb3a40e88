"""Layout geometry kernels: reading order, line clustering, column split.

Pure functions over word boxes ``(y, x, token)`` — no Ray, no I/O. These
replicate, semantics-for-semantics, the reference's layout reconstruction
(reference: /root/reference/app.py:86-133) because the engine's output text
must be byte-identical per url to the reference extractor:

- reading-order sort key ``(round(y, 1), x)``     (app.py:93)
- greedy first-match y-clustering into lines, tolerance 3.0 — the cluster
  key is the FIRST member's y and candidate keys are scanned in insertion
  order, so the result is order-dependent by design (app.py:97-117)
- upper-median column split: ``mid_x = sorted(xs)[len(xs)//2]``, ties go
  left (app.py:120-133)

Everything here is per-document work: a document's words always live in one
row of a batch, so these run inside ``map_batches`` bodies, never as a
distributed sort/shuffle.
"""

from __future__ import annotations

import re
from operator import itemgetter
from typing import Dict, List, Sequence, Tuple

Word = Tuple[float, float, str]  # (y, x, token)

_X_KEY = itemgetter(0)  # C-level sort key for (x, token) members

_WS = re.compile(r"\s+")
# "needs normalizing" probe: a run of 2+ whitespace chars, or any whitespace
# that is not a plain space. A space-joined token line that fails this probe
# is already in normal form, so the (much costlier) per-match _WS.sub can be
# skipped — identical output either way.
_WS_BAD = re.compile(r"\s{2,}|[^\S ]")

DEFAULT_Y_TOL = 3.0


def reading_order(words: Sequence[Word]) -> List[Word]:
    """Sort words top-to-bottom, left-to-right.

    The y coordinate is rounded to one decimal *in the sort key only*; the
    stored y stays exact (app.py:93 semantics).
    """
    return sorted(words, key=lambda w: (round(w[0], 1), w[1]))


def cluster_rows(
    words: Sequence[Word], tolerance: float = DEFAULT_Y_TOL
) -> List[Tuple[float, List[Tuple[float, str]]]]:
    """Greedy first-match y-clustering.

    For each word (in input order) the existing cluster keys are scanned in
    insertion order; the first key within ``tolerance`` of the word's y wins
    and the word joins that cluster. Otherwise the word's own y becomes a
    new key. Returns ``[(key_y, [(x, token), ...]), ...]`` sorted by key.

    This is intentionally order-dependent (a drifting chain of y's collapses
    into the first member's cluster) to match app.py:97-109 exactly.

    The reference scans every key per word (O(n*k)); here a bisect index
    narrows to the candidate key range and the earliest-INSERTED key wins —
    identical output ("first in insertion-order scan" == "minimum insertion
    index"), O(n log k). The bisect bounds use the ROUNDED values
    fl(y±tolerance), which can disagree with the reference predicate
    ``abs(ky - y) <= tolerance`` exactly at the boundary, so the range is
    widened by one key on each side and re-filtered with the exact
    predicate — bit-identical to the naive scan even at the float boundary.
    Equivalence to the naive scan is property-tested.
    """
    from bisect import bisect_left, bisect_right, insort

    clusters: Dict[float, List[Tuple[float, str]]] = {}
    order: Dict[float, int] = {}
    sorted_keys: List[float] = []
    n_keys = 0
    for y, x, tok in words:
        # allocation-free candidate scan over the (tiny) bisect window,
        # tracking the minimum insertion index directly
        lo = bisect_left(sorted_keys, y - tolerance)
        if lo:
            lo -= 1
        hi = bisect_right(sorted_keys, y + tolerance, lo)
        if hi < n_keys:
            hi += 1
        target = None
        best_ord = -1
        while lo < hi:
            k = sorted_keys[lo]
            if -tolerance <= k - y <= tolerance:
                o = order[k]
                if target is None or o < best_ord:
                    target = k
                    best_ord = o
            lo += 1
        if target is None:
            target = y
            clusters[target] = []
            order[target] = n_keys
            insort(sorted_keys, target)
            n_keys += 1
        clusters[target].append((x, tok))
    return sorted(clusters.items())


def lines_from_words(words: Sequence[Word], tolerance: float = DEFAULT_Y_TOL) -> List[str]:
    """Reconstruct text lines from word boxes (app.py:97-117 semantics).

    Within each y-cluster the members are x-sorted, space-joined, stripped,
    then inner whitespace collapsed; empty lines are dropped.
    """
    lines: List[str] = []
    for _ky, members in cluster_rows(words, tolerance):
        members.sort(key=_X_KEY)  # in-place: cluster_rows owns the lists
        text = " ".join([m[1] for m in members]).strip()
        if _WS_BAD.search(text):
            text = _WS.sub(" ", text)
        if text:
            lines.append(text)
    return lines


def upper_median_x(words: Sequence[Word]) -> float:
    """The column divider: upper median of the x coordinates (app.py:129-130)."""
    xs = sorted(w[1] for w in words)
    if not xs:
        return 9999.0
    return xs[len(xs) // 2]


def split_columns(
    words: Sequence[Word], y_tol: float = DEFAULT_Y_TOL
) -> Tuple[List[str], Dict[str, List[Word]]]:
    """Median-x two-column split; ties (x == mid) go left (app.py:120-133).

    Returns ``(all_lines, {"left": [...], "right": [...]})``.
    """
    if not words:
        return [], {"left": [], "right": []}
    mid_x = upper_median_x(words)
    left = [w for w in words if w[1] <= mid_x]
    right = [w for w in words if w[1] > mid_x]
    return lines_from_words(words, tolerance=y_tol), {"left": left, "right": right}


def normalize_ws(s: str) -> str:
    """Whitespace normalizer used throughout the reference (app.py:82, 114)."""
    return _WS.sub(" ", s).strip()
