"""Kernel tests for MOSS winnowing fingerprint selection."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_winnow import (
    WIN_K,
    WIN_MULT,
    WIN_SPACE,
    WIN_W,
    _B1,
    _B2,
    _B3,
    winnow_doc,
    winnow_profile_batch,
)


def _brute(codes: np.ndarray):
    """Reference winnowing: per window, rightmost min, as plain Python."""
    n = len(codes)
    h = []
    for i in range(n - WIN_K + 1):
        poly = (
            int(codes[i]) * _B1
            + int(codes[i + 1]) * _B2
            + int(codes[i + 2]) * _B3
            + int(codes[i + 3])
        )
        h.append((poly * WIN_MULT) % WIN_SPACE)
    npos = len(h)
    sel = set()
    if npos <= WIN_W:
        m = min(h)
        sel.add(max(i for i, v in enumerate(h) if v == m))
    else:
        for s in range(npos - WIN_W + 1):
            win = h[s : s + WIN_W]
            m = min(win)
            sel.add(s + max(j for j, v in enumerate(win) if v == m))
    pos = sorted(sel)
    return npos, [p + 1 for p in pos], [h[p] for p in pos]


def test_winnow_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(WIN_K, 120))
        codes = rng.integers(97, 123, size=n).astype(np.uint8)
        npos, pos, hs = winnow_doc(codes)
        bn, bpos, bh = _brute(codes)
        assert npos == bn
        assert pos.tolist() == bpos
        assert hs.tolist() == bh


def test_whole_sequence_window_when_short():
    # npos = 5 <= w: single window over everything, rightmost min
    codes = np.frombuffer(b"aaaaaaaa", dtype=np.uint8)  # 8 chars -> npos 5
    npos, pos, hs = winnow_doc(codes)
    assert npos == 5
    # all hashes equal -> rightmost position wins
    assert pos.tolist() == [5]


def test_moss_shared_substring_guarantee():
    """Strings sharing a substring of length >= w + k - 1 must share a
    selected fingerprint hash (the winnowing theorem)."""
    rng = np.random.default_rng(11)
    shared = bytes(rng.integers(97, 123, size=WIN_W + WIN_K - 1).astype(np.uint8))
    a = b"xxxxyyyyzzzz" + shared + b"qqqqrrrr"
    b = b"mmmmnnnn" + shared + b"ttttuuuuvvvv"
    _, _, ha = winnow_doc(np.frombuffer(a, dtype=np.uint8))
    _, _, hb = winnow_doc(np.frombuffer(b, dtype=np.uint8))
    assert set(ha.tolist()) & set(hb.tolist())


def test_profile_batch_skips_short_and_checksums():
    t = pa.Table.from_pandas(
        pd.DataFrame(
            {"doc_id": np.int64([1, 2]), "text": ["abc", "abcdefghijklmnop"]}
        ),
        preserve_index=False,
    )
    out = winnow_profile_batch(t).to_pandas()
    assert out["doc_id"].tolist() == [2]  # len-3 doc has no 4-gram
    npos, pos, hs = winnow_doc(
        np.frombuffer(b"abcdefghijklmnop", dtype=np.uint8)
    )
    assert out["sel_checksum"].iloc[0] == int(np.sum(pos * hs))
    assert out["n_positions"].iloc[0] == npos
