"""Kernel tests for sorted-neighborhood near-dup blocking (queries_snm)."""

import random
import string

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_snm import (
    SNM_MAX_DIST,
    SNM_WINDOW,
    levenshtein,
    snm_fanout_batch,
    snm_pairs_group,
    snm_tag_batch,
)


@pytest.mark.parametrize("seed", range(4))
def test_levenshtein_matches_duckdb(seed):
    # alphabet includes multi-byte codepoints: DuckDB's levenshtein is
    # BYTE-level (levenshtein('é','a') = 2) and the engine must agree
    alphabet = string.ascii_lowercase + " éшз"
    rng = random.Random(seed)
    con = duckdb.connect()
    for _ in range(100):
        a = "".join(rng.choices(alphabet, k=rng.randint(0, 24)))
        b = "".join(rng.choices(alphabet, k=rng.randint(0, 24)))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_levenshtein_bytes_not_codepoints():
    con = duckdb.connect()
    assert levenshtein("é", "a") == con.execute(
        "SELECT levenshtein('é', 'a')"
    ).fetchone()[0]
    assert levenshtein("é", "a") == 2  # 2-byte codepoint vs 1-byte


def test_pairs_group_matches_scalar_spec():
    """The banded vectorized batch path must agree with the scalar spec
    on every emitted distance (incl. unicode prefixes)."""
    rows = [
        (0, 10, "héllo wörld aaa", True),
        (1, 11, "hello world aaa", True),
        (2, 12, "hello world aab", True),
        (3, 13, "zzz yyy xxx www vvv uuu ttt sss", True),
    ]
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "rank": [r[1] for r in rows],
            "pfx": [r[2] for r in rows],
            "native": [r[3] for r in rows],
        }
    )
    out = snm_pairs_group(df)
    got = {(a, b): d for a, b, d in zip(out["doc_a"], out["doc_b"], out["dist"])}
    for (a, b), d in got.items():
        pa_ = rows[a][2]
        pb_ = rows[b][2]
        assert levenshtein(pa_, pb_) == d
    assert (0, 1) in got and got[(0, 1)] == 4  # é,ö are 2 bytes each
    assert (1, 2) in got and got[(1, 2)] == 1
    assert all(3 not in k for k in got)


def test_pairs_group_null_prefix_never_pairs():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "rank": [5, 6, 7],
            "pfx": ["same text", None, "same text"],
            "native": [True, True, True],
        }
    )
    out = snm_pairs_group(df)
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert pairs == {(0, 2)}


def test_levenshtein_edges():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abc", "abc") == 0


def _window_pairs_via_kernels(rows):
    """Drive tag -> fanout -> per-chunk pair kernels over a pre-sorted
    single batch, return the emitted (doc_a, doc_b) set."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            "pfx": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    tagged = snm_tag_batch(t)
    bkey = tagged["bkey"][0].as_py()
    fan = snm_fanout_batch(tagged, {bkey: 0}).to_pandas()
    got = set()
    for _, grp in fan.groupby("chunk"):
        out = snm_pairs_group(grp)
        got.update(zip(out["doc_a"], out["doc_b"]))
    return got


def test_chunk_fanout_enumerates_every_window_pair_once():
    # identical prefixes -> every window pair passes the distance gate,
    # so the emitted set must be EXACTLY the rank-window pairs
    n = 23
    rows = [(i, "en", 100 + i, "same text") for i in range(n)]
    got = _window_pairs_via_kernels(rows)
    want = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, min(a + SNM_WINDOW, n))
    }
    assert got == want


def test_distance_gate_filters():
    rows = [
        (0, "en", 10, "aaaa aaaa aaaa"),
        (1, "en", 11, "aaaa aaaa aaab"),  # dist 1 from row 0
        (2, "en", 12, "zzzz yyyy xxxx wwww vvvv"),  # far from both
    ]
    got = _window_pairs_via_kernels(rows)
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got
    assert levenshtein(rows[0][3], rows[2][3]) > SNM_MAX_DIST
