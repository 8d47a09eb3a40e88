"""Kernel-level tests for the round-4 training-engine operators
(pipelines/queries_train.py, sources/recfile.py): BPE merge learning,
compression ratio, table profiling, MG heavy hitters, KREC source."""

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from khl_pdf_ocr_ray.pipelines.queries_train import (  # noqa: E402
    MG_K,
    bpe_apply_merge,
    bpe_best_pair,
    bpe_pair_partial,
    bpe_symbolize,
    bpe_word_partial,
    compress_ratio_batch,
    hh_mg_partial,
    profile_stats_partial,
)
from khl_pdf_ocr_ray.sources.recfile import (  # noqa: E402
    CRC_CORRUPT_MOD,
    CRC_CORRUPT_REM,
    HEADER,
    MAGIC,
    parse_krec_bytes,
)


def _syms_lists(t: pa.Table):
    return t["syms"].combine_chunks().to_pylist() if isinstance(
        t["syms"], pa.ChunkedArray
    ) else t["syms"].to_pylist()


# --- BPE ----------------------------------------------------------------
def test_bpe_word_partial_counts():
    t = bpe_word_partial(pa.table({"text": ["The cat: the CAT!", None, "dog"]}))
    d = dict(zip(t["word"].to_pylist(), t["n"].to_pylist()))
    assert d == {"the": 2, "cat": 2, "dog": 1}


def test_bpe_pair_counts_weighted():
    # vocab: "ab" x3 -> pairs (a,b) 3, (b,</w>) 3 ; "bb" x2 -> (b,b) 2, (b,</w>) 2
    syms = bpe_symbolize(pa.table({"word": ["ab", "bb"], "n": [3, 2]}))
    pairs = bpe_pair_partial(syms)
    d = {
        (l, r): n
        for l, r, n in zip(
            pairs["left"].to_pylist(),
            pairs["right"].to_pylist(),
            pairs["n"].to_pylist(),
        )
    }
    assert d == {("a", "b"): 3, ("b", "</w>"): 5, ("b", "b"): 2}


def test_bpe_best_pair_tiebreak():
    t = pa.table(
        {"left": ["b", "a", "a"], "right": ["z", "z", "a"], "n": [5, 5, 5]}
    )
    assert bpe_best_pair(t) == ("a", "a", 5)
    assert bpe_best_pair(t.slice(0, 0)) is None


def test_bpe_apply_merge_greedy_overlap():
    # "aaaa" + merge (a,a): greedy left-to-right -> [aa, aa, </w>];
    # "aaa" -> [aa, a, </w>] (the overlap case)
    syms = bpe_symbolize(pa.table({"word": ["aaaa", "aaa"], "n": [1, 1]}))
    out = bpe_apply_merge(syms, "a", "a")
    assert _syms_lists(out) == [["aa", "aa", "</w>"], ["aa", "a", "</w>"]]
    # merged symbol participates in later merges
    out2 = bpe_apply_merge(out, "aa", "aa")
    assert _syms_lists(out2) == [["aaaa", "</w>"], ["aa", "a", "</w>"]]


def test_bpe_apply_merge_word_boundary():
    # pair split across two words must NOT merge: "xa" + "ax"
    syms = bpe_symbolize(pa.table({"word": ["xa", "ax"], "n": [1, 1]}))
    out = bpe_apply_merge(syms, "a", "a")
    assert _syms_lists(out) == [["x", "a", "</w>"], ["a", "x", "</w>"]]


def test_bpe_batching_invariance_of_pair_counts():
    words = [f"w{i}abab" for i in range(20)]
    t = pa.table({"word": words, "n": list(range(1, 21))})
    whole = bpe_pair_partial(bpe_symbolize(t))

    def key(tab):
        return sorted(
            zip(
                tab["left"].to_pylist(),
                tab["right"].to_pylist(),
                tab["n"].to_pylist(),
            )
        )

    # split into 3 uneven batches and re-sum
    parts = [
        bpe_pair_partial(bpe_symbolize(t.slice(0, 7))),
        bpe_pair_partial(bpe_symbolize(t.slice(7, 5))),
        bpe_pair_partial(bpe_symbolize(t.slice(12, 8))),
    ]
    summed = (
        pa.concat_tables(parts)
        .group_by(["left", "right"])
        .aggregate([("n", "sum")])
        .rename_columns(["left", "right", "n"])
    )
    assert key(whole) == key(summed)


# --- compression ratio ---------------------------------------------------
def test_compress_ratio_repetitive_vs_random():
    rng = np.random.default_rng(7)
    rand = "".join(chr(97 + c) for c in rng.integers(0, 26, 4000))
    rep = "spam and eggs " * 300
    t = compress_ratio_batch(
        pa.table({"doc_id": [1, 2, 3], "text": [rep, rand, None]})
    )
    p = dict(zip(t["doc_id"].to_pylist(), t["comp_permille"].to_pylist()))
    nb = dict(zip(t["doc_id"].to_pylist(), t["n_bytes"].to_pylist()))
    assert p[1] < 100 < p[2]  # boilerplate compresses far better
    assert nb[3] == 0 and p[3] == len(zlib.compress(b"", 6)) * 1000  # null -> ""


# --- profile --------------------------------------------------------------
def test_profile_stats_partial_canonical_numbers():
    batch = pa.table(
        {
            "event_id": pa.array([3, 1, 2], pa.int64()),
            "ts": pa.array([1_000_000, 2_000_000, 3_000_000], pa.timestamp("us")),
            "user_id": pa.array([9, None, 7], pa.int64()),
            "event_type": pa.array(["b", "a", None], pa.string()),
            "value": pa.array([1.005, -2.5, 10.994], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"], pa.string()),
        }
    )
    t = profile_stats_partial(batch)
    rows = {
        r["col"]: r
        for r in [
            {c: t[c][i].as_py() for c in t.column_names}
            for i in range(t.num_rows)
        ]
    }
    assert rows["event_id"]["min_num"] == 1 and rows["event_id"]["max_num"] == 3
    assert rows["ts"]["min_num"] == 1_000_000  # epoch us, not lexicographic
    assert rows["user_id"]["nulls"] == 1
    # cents fixed point: floor(x*100+0.5) -> 101, -250, 1099 (engine-wide rule)
    assert rows["value"]["min_num"] == -250 and rows["value"]["max_num"] == 1099
    assert rows["event_type"]["min_str"] == "a" and rows["event_type"]["max_str"] == "b"


# --- heavy hitters ---------------------------------------------------------
def test_mg_partial_bound_and_sentinel():
    rng = np.random.default_rng(3)
    # 5000 events over 500 users + one hot user with 800
    uid = np.concatenate([rng.integers(10, 510, 5000), np.full(800, 3)])
    eid = np.arange(len(uid)) * 10 + 7  # % 10 == 7 -> plant keeps organic uid
    batch = pa.table(
        {"event_id": pa.array(eid, pa.int64()), "user_id": pa.array(uid, pa.int64())}
    )
    t = hh_mg_partial(batch)
    users = t["user_id"].to_pylist()
    w = dict(zip(users, t["w"].to_pylist()))
    n_block = len(uid)
    assert w[-1] == n_block  # sentinel carries block size
    # summary size bound: <= MG_K entries + sentinel
    assert len(users) <= MG_K + 1
    # per-key undercount bound: w >= true - n/(k+1)
    true_hot = int((uid == 3).sum())
    assert w.get(3, 0) >= true_hot - n_block // (MG_K + 1)


def test_mg_candidate_superset_property():
    # adversarial: all mass on 3 users -> every one must survive the summary
    uid = np.array([1] * 400 + [2] * 300 + [3] * 300)
    eid = np.arange(len(uid)) * 10 + 7
    t = hh_mg_partial(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
            }
        )
    )
    w = dict(zip(t["user_id"].to_pylist(), t["w"].to_pylist()))
    assert w[1] == 400 and w[2] == 300 and w[3] == 300  # d == 0 path


# --- KREC source -----------------------------------------------------------
def _rec(doc_id: int, lang: str, payload: bytes, corrupt: bool = False) -> bytes:
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    if corrupt:
        crc ^= 0xDEADBEEF
    return HEADER.pack(MAGIC, doc_id, lang.encode(), crc, len(payload)) + payload


def test_parse_krec_roundtrip_and_corruption():
    buf = (
        _rec(1, "en", b"hello")
        + _rec(CRC_CORRUPT_MOD + CRC_CORRUPT_REM, "zh", b"x" * 100, corrupt=True)
        + _rec(7, "fr", b"")
    )
    t = parse_krec_bytes(buf)
    assert t["doc_id"].to_pylist() == [1, CRC_CORRUPT_MOD + CRC_CORRUPT_REM, 7]
    assert t["crc_ok"].to_pylist() == [1, 0, 1]
    assert t["n_bytes"].to_pylist() == [5, 100, 0]
    assert t["lang"].to_pylist() == ["en", "zh", "fr"]


def test_parse_krec_framing_errors_raise():
    good = _rec(1, "en", b"hello")
    with pytest.raises(ValueError, match="truncated KREC payload"):
        parse_krec_bytes(good[:-2])
    with pytest.raises(ValueError, match="bad KREC magic"):
        parse_krec_bytes(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="truncated KREC header"):
        parse_krec_bytes(good + good[: HEADER.size - 3])


def test_krec_read_stream_chunk_boundaries(tmp_path, monkeypatch):
    """The streaming reader must cut records into CHUNK_RECORDS blocks and
    agree with the one-shot parser across every chunk boundary. Driven
    in-process (_read_stream directly) so the chunk-size patch applies."""
    import khl_pdf_ocr_ray.sources.recfile as rf

    monkeypatch.setattr(rf, "CHUNK_RECORDS", 3)
    buf = b"".join(
        _rec(i, "en", bytes([97 + i % 26]) * (i % 50), corrupt=(i % 5 == 0))
        for i in range(20)
    )
    p = tmp_path / "shard-000.krec"
    p.write_bytes(buf)
    src = rf.KrecDatasource(str(p))
    blocks = list(src._read_stream(pa.BufferReader(buf), str(p)))
    assert len(blocks) == 7  # ceil(20 / 3)
    got = pa.concat_tables(blocks)
    assert got.to_pydict() == parse_krec_bytes(buf).to_pydict()
    assert sum(1 for x in got["crc_ok"].to_pylist() if x == 0) == 4


def test_krec_datasource_end_to_end(ray_session, tmp_path):
    """Datasource planning + distributed read over two shard files."""
    import ray.data as rd

    import khl_pdf_ocr_ray.sources.recfile as rf

    bufs = [
        b"".join(_rec(i, "en", b"x" * i) for i in range(0, 10, 2)),
        b"".join(_rec(i, "de", b"y" * i, corrupt=True) for i in range(1, 10, 2)),
    ]
    for j, b in enumerate(bufs):
        (tmp_path / f"shard-{j:03d}.krec").write_bytes(b)
    (tmp_path / "_DONE").write_text("ok")  # must be ignored (extension filter)
    ds = rd.read_datasource(rf.KrecDatasource(str(tmp_path)))
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(10))
    assert got["crc_ok"].tolist() == [1, 0] * 5
    assert got["n_bytes"].tolist() == list(range(10))


# --- CDC chunking ------------------------------------------------------------
def test_cdc_cuts_cover_and_respect_bounds():
    from khl_pdf_ocr_ray.pipelines.queries_train import (
        CDC_MAX,
        CDC_MIN,
        cdc_cuts,
    )

    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))
    cuts = cdc_cuts(data)
    # full coverage, in order, no overlap
    pos = 0
    for s, ln in cuts:
        assert s == pos and ln > 0
        pos += ln
    assert pos == len(data)
    # every chunk except possibly the last respects [CDC_MIN, CDC_MAX]
    for s, ln in cuts[:-1]:
        assert ln <= CDC_MAX
    assert all(ln <= CDC_MAX for _, ln in cuts)
    assert cdc_cuts(b"") == []


def test_cdc_content_defined_shift_resistance():
    """Insertion near the start must not move distant chunk boundaries —
    the property that makes CDC dedup work (fixed-size blocks fail it)."""
    from khl_pdf_ocr_ray.pipelines.queries_train import cdc_cuts

    rng = np.random.default_rng(5)
    base = bytes(rng.integers(0, 256, 4000, dtype=np.uint8))
    shifted = b"INSERTED!" + base
    cuts_a = {base[s : s + ln] for s, ln in cdc_cuts(base)}
    cuts_b = {shifted[s : s + ln] for s, ln in cdc_cuts(shifted)}
    # the vast majority of chunk CONTENTS survive the insertion
    assert len(cuts_a & cuts_b) >= int(0.8 * len(cuts_a))


def test_cdc_duplicate_accounting_on_planted_copy():
    from khl_pdf_ocr_ray.pipelines.queries_train import (
        cdc_doc_partial,
        cdc_occurrence_partial,
    )

    rng = np.random.default_rng(9)
    text = "".join(chr(97 + c) for c in rng.integers(0, 26, 3000))
    occ = cdc_occurrence_partial(
        pa.table({"doc_id": [1, 2], "text": [text, text]})
    ).to_pandas()
    first = occ.groupby("chash", as_index=False)["pos"].min()
    j = occ.merge(first.rename(columns={"pos": "first_pos"}), on="chash")
    acc = cdc_doc_partial(pa.Table.from_pandas(j)).to_pandas().set_index("doc_id")
    # doc 1 owns every first occurrence; doc 2 is 100% duplicate bytes
    assert acc.loc[1, "dup_bytes"] == 0
    assert acc.loc[2, "dup_bytes"] == acc.loc[2, "n_bytes"]
    assert acc.loc[2, "dup_chunks"] == acc.loc[2, "n_chunks"]


# --- triangles ---------------------------------------------------------------
def test_triangle_kernels_vs_bruteforce():
    """Degree-oriented wedge closure == brute-force triangle enumeration
    on a hand graph with hubs and ties."""
    import itertools

    import pandas as pd

    from khl_pdf_ocr_ray.pipelines.queries_train import (
        tri_orient_partial,
        tri_wedges_group,
    )

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (0, 3), (4, 5)]
    nodes = sorted({n for e in edges for n in e})
    deg = {n: sum(1 for e in edges if n in e) for n in nodes}
    eset = {tuple(sorted(e)) for e in edges}
    batch = pa.table(
        {
            "lo": pa.array([e[0] for e in edges], pa.int64()),
            "hi": pa.array([e[1] for e in edges], pa.int64()),
            "deg_lo": pa.array([deg[e[0]] for e in edges], pa.int64()),
            "deg_hi": pa.array([deg[e[1]] for e in edges], pa.int64()),
        }
    )
    oriented = tri_orient_partial(batch).to_pandas()
    tris = set()
    for src, g in oriented.groupby("src"):
        w = tri_wedges_group(
            pd.DataFrame({"src": g["src"].tolist(), "dst": g["dst"].tolist()})
        )
        for _, r in w.iterrows():
            if (int(r["wlo"]), int(r["whi"])) in eset:
                tris.add(tuple(sorted((int(r["apex"]), int(r["wlo"]), int(r["whi"])))))
    brute = {
        t
        for t in itertools.combinations(nodes, 3)
        if all(tuple(sorted(p)) in eset for p in itertools.combinations(t, 2))
    }
    assert tris == brute and len(brute) == 4


# --- temperature sampling ------------------------------------------------------
def test_temperature_thresholds_flatten_the_mix():
    from khl_pdf_ocr_ray.pipelines.queries_train import (
        TEMP_SCALE,
        temperature_thresholds,
    )

    thr = temperature_thresholds({"en": 8000, "fr": 1000, "de": 1000})
    # rarest languages keep everything; the dominant one is downsampled
    assert thr["fr"] == TEMP_SCALE and thr["de"] == TEMP_SCALE
    assert 0 < thr["en"] < TEMP_SCALE
    # alpha=0.3: rate_en = (0.8/0.1)^(0.3-1) = 8^-0.7 ~ 0.233
    assert abs(thr["en"] / TEMP_SCALE - 8 ** -0.7) < 1e-6
    # uniform mix -> nothing dropped
    assert set(temperature_thresholds({"a": 5, "b": 5}).values()) == {TEMP_SCALE}


def test_temp_filter_partial_batching_invariance():
    from khl_pdf_ocr_ray.pipelines.queries_train import (
        temp_filter_partial,
        temperature_thresholds,
    )

    rng = np.random.default_rng(13)
    langs = np.array(["en"] * 800 + ["fr"] * 100 + ["de"] * 100)
    doc_id = rng.permutation(len(langs)).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array(np.full(len(langs), 10, dtype=np.int64)),
        }
    )
    thr = temperature_thresholds({"en": 800, "fr": 100, "de": 100})

    def agg(tabs):
        out = {}
        for tab in tabs:
            for lang, d, c in zip(
                tab["lang"].to_pylist(),
                tab["kept_docs"].to_pylist(),
                tab["kept_chars"].to_pylist(),
            ):
                a, b = out.get(lang, (0, 0))
                out[lang] = (a + d, b + c)
        return out

    whole = agg([temp_filter_partial(t, thr)])
    split = agg(
        [
            temp_filter_partial(t.slice(0, 333), thr),
            temp_filter_partial(t.slice(333, 333), thr),
            temp_filter_partial(t.slice(666), thr),
        ]
    )
    assert whole == split
    assert whole["fr"] == (100, 1000)  # rarest lang kept whole
    assert whole["en"][0] < 800  # dominant lang downsampled
