"""Kernel-level tests for the set-similarity join (queries_simjoin) and
the link/metadata extractors (functions/links.py).

The driver-parity gates (test_queries / test_oracle_dumps) already check
the end-to-end results; these tests pin the pure-function math — the
prefix-filter completeness property in particular, on adversarial tiny
corpora where the end-to-end corpus would never exercise the edges."""

import math

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa

from khl_pdf_ocr_ray.functions.links import extract_links, extract_meta
from khl_pdf_ocr_ray.pipelines.queries_simjoin import (
    COS_T2_PPM,
    ap_select_batch,
    doc_shingles,
    pair_filter_batch,
    prefix_rows,
)

HTML = b"""<!doctype html>
<html><head><title> My  Page </title></head>
<body>
<nav><ul><li><a href="/s0">section 0</a></li><li><a href="/s1">section 1</a></li></ul></nav>
<article><h2>head</h2><p>one para</p><p>two para</p>
<a href="/r0">related thing</a></article>
<aside><a href="/promo">promo</a></aside>
<footer><p>copyright 2021 example press</p><a href="/about">about</a></footer>
</body></html>"""


def test_extract_links_rows():
    rows = extract_links(HTML)
    assert [(r[1], r[2], r[3]) for r in rows] == [
        ("/s0", "section 0", "nav"),
        ("/s1", "section 1", "nav"),
        ("/r0", "related thing", "article"),
        ("/promo", "promo", "aside"),
        ("/about", "about", "footer"),
    ]
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]


def test_extract_meta():
    title, n_paras, n_links, year = extract_meta(HTML)
    assert title == "My Page"
    assert n_paras == 3  # two article paras + the footer copyright line
    assert n_links == 5
    assert year == 2021


def test_extract_links_unclosed_and_empty():
    rows = extract_links(b"<html><body><a>no href</a><a href='/x'>x</body></html>")
    assert rows[0][1] == "" and rows[0][2] == "no href"
    assert rows[1][1] == "/x" and rows[1][2] == "x"  # unclosed <a> tolerated
    assert extract_meta(b"%PDF-1.4 not html")[2] == 0  # no <a> tags parsed


def test_doc_shingles_contract():
    # lower + split [^a-z]+ + drop empties + distinct 4-gram windows
    assert doc_shingles("A b, c d e") == ["a b c d", "b c d e"]
    assert doc_shingles("a b c") == []  # fewer than 4 words
    assert doc_shingles("x y z w x y z w x y z w") == [
        "w x y z",
        "x y z w",
        "y z w x",
        "z w x y",
    ]


def _naive_pairs(sets, t2_ppm):
    out = set()
    ks = sorted(sets)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            dot = len(sets[a] & sets[b])
            if dot * dot * 1_000_000 >= t2_ppm * len(sets[a]) * len(sets[b]):
                out.add((a, b))
    return out


def _filtered_pairs(sets, t2_ppm):
    """Drive the prefix/size-filter kernels exactly as the pipeline wires
    them (df order -> per-doc prefixes -> token self-join -> vectorized
    pair filter), then verify candidates exactly."""
    df = {}
    for s in sets.values():
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    thash = {t: i for i, t in enumerate(sorted(df))}  # any injective map
    prefixes = []
    for doc_id, s in sets.items():
        g = pd.DataFrame(
            {
                "doc_id": doc_id,
                "token": sorted(s),
                "thash": [thash[t] for t in sorted(s)],
                "df": [df[t] for t in sorted(s)],
                "n": len(s),
            }
        )
        prefixes.append(prefix_rows(g))
    pref = pd.concat(prefixes, ignore_index=True)
    joined = pref.merge(pref, on="thash", suffixes=("", "_r"))
    filt = pair_filter_batch(
        pa.table(
            {
                "doc_id": pa.array(joined["doc_id"], pa.int64()),
                "doc_id_r": pa.array(joined["doc_id_r"], pa.int64()),
                "n": pa.array(joined["n"], pa.int64()),
                "n_r": pa.array(joined["n_r"], pa.int64()),
            }
        )
    )
    cands = set(zip(filt["doc_a"].to_pylist(), filt["doc_b"].to_pylist()))
    verified = set()
    for a, b in cands:
        dot = len(sets[a] & sets[b])
        if dot * dot * 1_000_000 >= t2_ppm * len(sets[a]) * len(sets[b]):
            verified.add((a, b))
    return verified


@pytest.mark.parametrize("seed", range(8))
def test_prefix_filter_finds_every_matching_pair(seed):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(30)]
    sets = {}
    for d in range(40):
        n = int(rng.integers(1, 20))
        sets[d] = set(rng.choice(vocab, size=n, replace=False).tolist())
    # plant exact and near duplicates so matches exist
    sets[100] = set(sets[0])
    sets[101] = set(sets[1]) | {"t29"}
    naive = _naive_pairs(sets, COS_T2_PPM)
    assert naive, "planting failed — test would be vacuous"
    assert _filtered_pairs(sets, COS_T2_PPM) == naive


def test_prefix_length_edges():
    # n=1: prefix must still be non-empty
    g = pd.DataFrame(
        {"doc_id": 7, "token": ["x"], "thash": [3], "df": [1], "n": [1]}
    )
    out = prefix_rows(g)
    assert len(out) == 1 and int(out["n"].iloc[0]) == 1
    # prefix length formula: n - ceil(0.64 n) + 1
    for n in (1, 2, 3, 10, 25, 100):
        g = pd.DataFrame(
            {
                "doc_id": 1,
                "token": [f"t{i:03d}" for i in range(n)],
                "thash": list(range(n)),
                "df": [1] * n,
                "n": [n] * n,
            }
        )
        assert len(prefix_rows(g)) == n - math.ceil(0.64 * n) + 1


def test_pair_filter_size_gate():
    # 16*max <= 25*min: (10,20) 320>250 filtered; (10,15) 240<=250 kept;
    # (15,20) 320<=375 kept; id order (a<b) enforced
    t = pa.table(
        {
            "doc_id": pa.array([1, 1, 2, 3], pa.int64()),
            "doc_id_r": pa.array([2, 3, 3, 2], pa.int64()),
            "n": pa.array([10, 10, 20, 15], pa.int64()),
            "n_r": pa.array([20, 15, 15, 20], pa.int64()),
        }
    )
    got = pair_filter_batch(t)
    pairs = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    assert pairs == {(1, 3), (2, 3)}


def test_ap_select_batch_matches_exact_prefix_for_interior_docs():
    """The vectorized interior path must agree with the exact per-doc pick;
    batch-edge docs must be flagged raw."""
    rows = []
    for d in (1, 2, 3, 4):
        n = 5 + d
        toks = [f"t{d}{i:02d}" for i in range(n)]
        for i, tok in enumerate(toks):
            # df ascending == token order; thash = any injective stand-in
            rows.append((d, tok, i + 1, n, d * 100 + i))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "token": pa.array([r[1] for r in rows], pa.string()),
            "df": pa.array([r[2] for r in rows], pa.int64()),
            "n": pa.array([r[3] for r in rows], pa.int64()),
            "thash": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    out = ap_select_batch(t).to_pandas()
    # docs 1 and 4 are batch edges -> all their rows flagged
    edge = out[out["edge"]]
    assert set(edge["doc_id"]) == {1, 4}
    assert len(edge[edge["doc_id"] == 1]) == 6  # full doc passes through
    # interior docs carry exactly their prefix
    for d in (2, 3):
        n = 5 + d
        want = prefix_rows(
            pd.DataFrame(
                {
                    "doc_id": d,
                    "token": [f"t{d}{i:02d}" for i in range(n)],
                    "thash": [d * 100 + i for i in range(n)],
                    "df": list(range(1, n + 1)),
                    "n": [n] * n,
                }
            )
        )
        got = out[(out["doc_id"] == d) & (~out["edge"])]
        assert list(got["thash"]) == list(want["thash"])
