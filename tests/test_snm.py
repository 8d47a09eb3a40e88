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
    rng = random.Random(seed)
    con = duckdb.connect()
    for _ in range(100):
        a = "".join(
            rng.choices(string.ascii_lowercase + " ", k=rng.randint(0, 24))
        )
        b = "".join(
            rng.choices(string.ascii_lowercase + " ", k=rng.randint(0, 24))
        )
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


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
