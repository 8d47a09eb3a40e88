"""Kernel-level checks for the round-4c operators (layout / readability /
CUSUM / clustering coefficient), beyond oracle parity: Morton locality,
FFD packing invariants, the planted-drift alarm path, punctuated
readability fixtures, and the graphx/train constant agreement."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


# --- Z-order layout ------------------------------------------------------


def test_morton16_matches_bitwise_reference():
    from khl_pdf_ocr_ray.pipelines.queries_layout import Z_DIM, _morton16

    rng = np.random.default_rng(11)
    u = rng.integers(0, Z_DIM, 500).astype(np.int64)
    d = rng.integers(0, Z_DIM, 500).astype(np.int64)
    z = _morton16(u, d)

    def ref(uu: int, dd: int) -> int:
        out = 0
        for i in range(8):
            out |= ((uu >> i) & 1) << (2 * i + 1)
            out |= ((dd >> i) & 1) << (2 * i)
        return out

    assert z.tolist() == [ref(a, b) for a, b in zip(u.tolist(), d.tolist())]
    # and it is a bijection over the 16-bit domain
    uu, dd = np.meshgrid(np.arange(Z_DIM), np.arange(Z_DIM))
    full = _morton16(uu.ravel().astype(np.int64), dd.ravel().astype(np.int64))
    assert len(np.unique(full)) == Z_DIM * Z_DIM


def test_zbucket_covers_small_rectangles():
    """The layout's whole point: within one Z-bucket both dimensions span
    a bounded range (low Z_BUCKET_SHIFT bits interleave 3 bits of each
    dim), so a 2-D range scan prunes to few buckets."""
    from khl_pdf_ocr_ray.pipelines.queries_layout import (
        Z_BUCKET_SHIFT,
        Z_DIM,
        _morton16,
    )

    rng = np.random.default_rng(12)
    u = rng.integers(0, Z_DIM, 20000).astype(np.int64)
    d = rng.integers(0, Z_DIM, 20000).astype(np.int64)
    zb = _morton16(u, d) >> Z_BUCKET_SHIFT
    df = pd.DataFrame({"zb": zb, "u": u, "d": d})
    side = 1 << (Z_BUCKET_SHIFT // 2)  # 3 bits of each dim vary -> span < 8
    g = df.groupby("zb").agg(us=("u", lambda s: s.max() - s.min()),
                             ds=("d", lambda s: s.max() - s.min()))
    assert (g["us"] < side).all()
    assert (g["ds"] < side).all()


def test_zorder_pair_partial_is_mergeable():
    """Partial applied to split batches, then the same min/max/sum merge,
    equals one global pass (the property the two-level groupby relies
    on)."""
    from khl_pdf_ocr_ray.pipelines.queries_layout import zorder_pair_partial

    rng = np.random.default_rng(13)
    n = 4000
    ts = rng.integers(0, 400, n).astype("int64") * 86_400_000_000 + rng.integers(
        0, 86_400_000_000, n
    )
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 900, n).astype("int64"),
            "ts": pd.to_datetime(ts, unit="us"),
        }
    )
    whole = zorder_pair_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [
            zorder_pair_partial(_t(df.iloc[i : i + 601])).to_pandas()
            for i in range(0, n, 601)
        ],
        ignore_index=True,
    )
    merged = parts.groupby(["zbucket", "user_id"], as_index=False).agg(
        n=("n", "sum"),
        umin=("umin", "min"),
        umax=("umax", "max"),
        dmin=("dmin", "min"),
        dmax=("dmax", "max"),
    )
    a = whole.sort_values(["zbucket", "user_id"]).reset_index(drop=True)
    b = merged.sort_values(["zbucket", "user_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


# --- compaction planning -------------------------------------------------


def test_ffd_pack_respects_capacity_and_is_first_fit_decreasing():
    from khl_pdf_ocr_ray.pipelines.queries_layout import ffd_pack

    fids = np.arange(8, dtype=np.int64)
    sizes = np.array([60, 50, 40, 30, 20, 10, 5, 5], dtype=np.int64)
    bins = ffd_pack(fids, sizes, 100)
    # capacity respected in every bin
    total = pd.Series(sizes).groupby(pd.Series(bins)).sum()
    assert (total <= 100).all()
    # hand-computed FFD placement: 60+40 | 50+30+20 | 10+5+5 -> appended
    # to first bin that fits: 60,50 open bins; 40->bin0(100), 30->bin1(80),
    # 20->bin1(100), 10 -> new bin2, 5,5 -> bin2
    assert bins.tolist() == [0, 1, 0, 1, 1, 2, 2, 2]


def test_ffd_pack_oversize_file_gets_own_bin():
    from khl_pdf_ocr_ray.pipelines.queries_layout import ffd_pack

    fids = np.array([0, 1, 2], dtype=np.int64)
    sizes = np.array([500, 60, 60], dtype=np.int64)
    bins = ffd_pack(fids, sizes, 100)
    # the oversize file sits alone (its bin marked full, nothing joins it)
    assert (bins[1:] != bins[0]).all()


def test_ffd_pack_ties_break_by_file_id():
    from khl_pdf_ocr_ray.pipelines.queries_layout import ffd_pack

    fids = np.array([3, 1, 2], dtype=np.int64)
    sizes = np.array([50, 50, 50], dtype=np.int64)
    bins = ffd_pack(fids, sizes, 100)
    # order of placement: fid 1, 2, 3 -> bins 0,0,1 regardless of input order
    assert bins.tolist() == [1, 0, 0]


# --- CUSUM drift ---------------------------------------------------------


def test_cusum_fold_planted_drift_alarms():
    """A sustained +50% volume shift must push the CUSUM over h and fire
    the alarm; the pre-shift days must stay quiet."""
    from khl_pdf_ocr_ray.pipelines.queries_monitor import cusum_fold

    days = np.arange(60, dtype=np.int64)
    counts = np.full(60, 1000, dtype=np.int64)
    counts[40:] = 1500  # crawler loop from day 40
    s, alarm = cusum_fold(days, counts)
    assert alarm[:40].sum() == 0
    assert alarm[-1] == 1  # sustained drift eventually alarms
    # monotone accumulation during the drift window until saturation
    assert (np.diff(s[41:]) > 0).all()


def test_cusum_fold_stable_series_never_alarms():
    from khl_pdf_ocr_ray.pipelines.queries_monitor import cusum_fold

    rng = np.random.default_rng(5)
    days = np.arange(120, dtype=np.int64)
    counts = rng.integers(950, 1051, 120).astype(np.int64)  # +-5% noise
    s, alarm = cusum_fold(days, counts)
    assert alarm.sum() == 0


def test_cusum_fold_is_input_order_invariant():
    from khl_pdf_ocr_ray.pipelines.queries_monitor import cusum_fold

    rng = np.random.default_rng(6)
    days = np.arange(50, dtype=np.int64)
    counts = rng.integers(500, 2000, 50).astype(np.int64)
    s0, a0 = cusum_fold(days, counts)
    perm = rng.permutation(50)
    s1, a1 = cusum_fold(days[perm], counts[perm])
    assert s1.tolist() == s0[perm].tolist()
    assert a1.tolist() == a0[perm].tolist()


# --- readability ---------------------------------------------------------


def test_readability_punctuated_fixture():
    """Hand-counted words / sentence runs / vowel groups on punctuated
    text (the synthetic gate corpus has no punctuation, so this path is
    held here)."""
    from khl_pdf_ocr_ray.pipelines.queries_textmetrics import readability_batch

    t = _t(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the cat sat. it sat!? done.",
                    "strength",  # one word, zero terminators, one vowel group
                    None,
                ],
            }
        )
    )
    out = readability_batch(t).to_pandas().set_index("doc_id")
    # doc 0: 6 space-split tokens? "the cat sat. it sat!? done." -> the,
    # cat, sat., it, sat!?, done. = 6; runs: ".", "!?", "." = 3; vowel
    # groups: e, a, a, i, a, o, e = 7
    assert out.loc[0, "n_words"] == 6
    assert out.loc[0, "n_sentences"] == 3
    assert out.loc[0, "n_syllables"] == 7
    assert (
        out.loc[0, "fre_milli"]
        == 206_835 - (1015 * 6) // 3 - (84_600 * 7) // 6
    )
    # doc 1: "strength" -> 1 word, min 1 sentence, 1 vowel group ("e")
    assert out.loc[1, "n_words"] == 1
    assert out.loc[1, "n_sentences"] == 1
    assert out.loc[1, "n_syllables"] == 1
    # doc 2: null -> '' -> split(' ') = [''] -> 1 word, 0 syllables
    assert out.loc[2, "n_words"] == 1
    assert out.loc[2, "n_syllables"] == 0


# --- clustering coefficient ----------------------------------------------


def test_graphx_sql_constant_agrees_with_train_tri_nodes():
    """The static SQL twin bakes TRI_NODES=100; the Ray plan reads
    queries_train.TRI_NODES — this pins them together so the twin can't
    drift."""
    from khl_pdf_ocr_ray.pipelines.queries_graphx import (
        SQL_GRAPH_CLUSTERING_COEFF,
        _sql,
    )
    from khl_pdf_ocr_ray.pipelines.queries_train import TRI_NODES

    assert SQL_GRAPH_CLUSTERING_COEFF == _sql(TRI_NODES)


def test_lcc_finalize_null_triangles_and_low_degree():
    from khl_pdf_ocr_ray.pipelines.queries_graphx import LCC_SCALE, lcc_finalize

    t = pa.table(
        {
            "node": pa.array([0, 1, 2, 3], pa.int64()),
            "deg": pa.array([1, 2, 4, 3], pa.int64()),
            "n_triangles": pa.array([None, 1, None, 3], pa.int64()),
        }
    )
    out = lcc_finalize(t).to_pandas().set_index("node")
    assert out.loc[0, "lcc_fx"] == 0  # deg < 2
    assert out.loc[1, "lcc_fx"] == (2 * 1 * LCC_SCALE) // (2 * 1)  # full closure
    assert out.loc[2, "n_triangles"] == 0 and out.loc[2, "lcc_fx"] == 0
    assert out.loc[3, "lcc_fx"] == (2 * 3 * LCC_SCALE) // (3 * 2)


# --- HITS hubs/authorities -------------------------------------------------


def test_hits_sequential_star_graph():
    """A star (hub u -> many leaves) must give u the max hub score and
    the leaves the max authority; reverse roles stay at zero."""
    from khl_pdf_ocr_ray.functions.graph import HITS_SCALE, hits_sequential

    edges = {("u", f"l{i}"): 1 for i in range(5)}
    ha = hits_sequential(edges, ["u"] + [f"l{i}" for i in range(5)])
    assert ha["u"] == (HITS_SCALE, 0)  # pure hub
    for i in range(5):
        assert ha[f"l{i}"] == (0, HITS_SCALE)  # pure authorities


def test_hits_sequential_weight_sensitivity():
    """A heavier edge must pull its target's authority above a lighter
    sibling's, proportionally (single normalize divide)."""
    from khl_pdf_ocr_ray.functions.graph import HITS_SCALE, hits_sequential

    edges = {("u", "a"): 3, ("u", "b"): 1}
    ha = hits_sequential(edges, ["u", "a", "b"])
    assert ha["a"][1] == HITS_SCALE
    assert ha["b"][1] == HITS_SCALE // 3


def test_hits_join_path_matches_broadcast_path(ray_session, sf_smoke_dir, monkeypatch):
    """Force the large-|hosts| keyed-join branch (the 100 TB path) and
    check bit-identical scores (integer fixed point, order-independent)."""
    import khl_pdf_ocr_ray.pipelines.queries_extract as qe
    from khl_pdf_ocr_ray.pipelines.queries_webgraph import q_host_hits

    broadcast = q_host_hits(sf_smoke_dir).to_pandas()
    monkeypatch.setattr(qe, "PR_BROADCAST_MAX", 0)
    joined = q_host_hits(sf_smoke_dir).to_pandas()
    a = broadcast.sort_values("host").reset_index(drop=True)
    b = joined.sort_values("host").reset_index(drop=True)[a.columns]
    assert a.equals(b)


# --- chi-square feature selection -----------------------------------------


def test_chi2_pairs_partial_is_mergeable():
    """Partial applied to split batches then a plain keyed sum equals one
    global pass (the property the Sum exchange relies on)."""
    from khl_pdf_ocr_ray.pipelines.queries_featsel import chi2_pairs_partial

    rng = np.random.default_rng(21)
    vocab = ["alpha", "beta", "gamma", "delta"]
    n = 240
    df = pd.DataFrame(
        {
            "lang": rng.choice(["en", "ru"], n),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(1, 9)))
                for _ in range(n)
            ],
        }
    )
    whole = chi2_pairs_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [
            chi2_pairs_partial(_t(df.iloc[i : i + 37])).to_pandas()
            for i in range(0, n, 37)
        ],
        ignore_index=True,
    )
    merged = parts.groupby(["lang", "term"], as_index=False)["n"].sum()
    a = whole.groupby(["lang", "term"], as_index=False)["n"].sum()
    a = a.sort_values(["lang", "term"]).reset_index(drop=True)
    b = merged.sort_values(["lang", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_chi2_finalize_hand_computed_cell():
    """2-class corpus with a perfectly class-separating term: n11=3,
    n10=0, n01=0, n00=3 -> chi2 = N = 6 exactly (in milli-units)."""
    from khl_pdf_ocr_ray.pipelines.queries_featsel import (
        _CLASS_SENTINEL,
        chi2_finalize,
    )

    cells = pd.DataFrame(
        {
            "lang": ["en", "ru", "en", "ru"],
            "term": ["cat", "dog", _CLASS_SENTINEL, _CLASS_SENTINEL],
            "n": [3, 3, 3, 3],
        }
    )
    out = chi2_finalize(cells).set_index(["lang", "term"])
    assert out.loc[("en", "cat"), "chi2_milli"] == 6000
    assert out.loc[("ru", "dog"), "chi2_milli"] == 6000


def test_chi2_finalize_universal_term_is_zero():
    """A term in EVERY doc (df = N) has a degenerate margin -> chi2 = 0
    on both engines (the CASE guard)."""
    from khl_pdf_ocr_ray.pipelines.queries_featsel import (
        _CLASS_SENTINEL,
        chi2_finalize,
    )

    cells = pd.DataFrame(
        {
            "lang": ["en", "ru", "en", "ru"],
            "term": ["the", "the", _CLASS_SENTINEL, _CLASS_SENTINEL],
            "n": [4, 2, 4, 2],
        }
    )
    out = chi2_finalize(cells)
    assert (out["chi2_milli"] == 0).all()


# --- cohort retention / inter-arrival dispersion ---------------------------


def test_user_week_partial_distinct_merge_idempotent():
    """Re-applying the distinct-(user, week) combiner to concatenated
    partials equals one global pass (what the Count exchange relies on)."""
    from khl_pdf_ocr_ray.pipelines.queries_behavior import user_week_partial

    rng = np.random.default_rng(31)
    n = 1500
    ts = rng.integers(0, 200, n).astype("int64") * 86_400_000_000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n).astype("int64"),
            "ts": pd.to_datetime(ts, unit="us"),
        }
    )
    whole = user_week_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [
            user_week_partial(_t(df.iloc[i : i + 211])).to_pandas()
            for i in range(0, n, 211)
        ],
        ignore_index=True,
    )
    merged = parts.drop_duplicates().sort_values(["user_id", "week"])
    a = whole.sort_values(["user_id", "week"]).reset_index(drop=True)
    b = merged.reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_dispersion_per_user_fixtures():
    from khl_pdf_ocr_ray.pipelines.queries_behavior import dispersion_per_user

    def mk(ts_list):
        return pd.DataFrame(
            {
                "user_id": np.int64(7),
                "event_id": np.arange(len(ts_list), dtype=np.int64),
                "ts": pd.to_datetime(np.array(ts_list, dtype="int64"), unit="us"),
            }
        )

    # perfectly regular stream -> zero variance -> D = 0
    out = dispersion_per_user(mk([0, 10, 20, 30]))
    assert out["n_gaps"].iloc[0] == 3 and out["dispersion_milli"].iloc[0] == 0
    # bursty stream: gaps 1,1,98 -> n=3, s1=100, s2=9606
    # D_milli = 1000*(3*9606 - 10000) // 300 = 1000*18818 // 300
    out = dispersion_per_user(mk([0, 1, 2, 100]))
    assert out["dispersion_milli"].iloc[0] == (1000 * (3 * 9606 - 100 * 100)) // 300
    # single event -> no gap rows at all
    out = dispersion_per_user(mk([5]))
    assert len(out) == 0


# --- degree assortativity --------------------------------------------------


def test_assort_finalize_matches_float_pearson():
    """Signed fixed-point r^2 against numpy's Pearson on a random degree
    sample: same sign, magnitude within one milli-unit of 1000*r^2."""
    from khl_pdf_ocr_ray.pipelines.queries_graphx import assort_finalize

    rng = np.random.default_rng(41)
    dx = rng.integers(1, 30, 400)
    dy = (dx * 2 + rng.integers(-8, 9, 400)).clip(1)  # positively correlated
    x = np.concatenate([dx, dy]).astype(float)
    y = np.concatenate([dy, dx]).astype(float)
    n = len(x)
    sx = int(x.sum()); sxy = int((x * y).sum()); sx2 = int((x * x).sum())
    got = assort_finalize(n, sx, sxy, sx2)
    r = np.corrcoef(x, y)[0, 1]
    want = 1000 * r * r * (1 if r >= 0 else -1)
    assert abs(got - want) <= 1
    assert got > 0


def test_assort_star_graph_is_perfectly_disassortative():
    """A star: every edge joins deg-k hub to deg-1 leaf -> r = -1 ->
    assort_r2_milli = -1000 exactly."""
    from khl_pdf_ocr_ray.pipelines.queries_graphx import assort_finalize

    k = 6
    dx = np.full(k, k, dtype=np.int64)  # hub endpoint
    dy = np.ones(k, dtype=np.int64)     # leaf endpoint
    x = np.concatenate([dx, dy]); y = np.concatenate([dy, dx])
    n = len(x)
    got = assort_finalize(n, int(x.sum()), int((x * y).sum()), int((x * x).sum()))
    assert got == -1000


def test_assort_regular_graph_is_zero():
    """Constant degree (a cycle) -> zero variance -> defined as 0."""
    from khl_pdf_ocr_ray.pipelines.queries_graphx import assort_finalize

    x = np.full(10, 2, dtype=np.int64)
    got = assort_finalize(10, int(x.sum()), int((x * x).sum()), int((x * x).sum()))
    assert got == 0


def test_assort_sql_constant_agrees_with_train_tri_nodes():
    from khl_pdf_ocr_ray.pipelines.queries_graphx import (
        SQL_GRAPH_ASSORTATIVITY,
        _assort_sql,
    )
    from khl_pdf_ocr_ray.pipelines.queries_train import TRI_NODES

    assert SQL_GRAPH_ASSORTATIVITY == _assort_sql(TRI_NODES)


# --- session lift / weekly growth / RRF -------------------------------------


def test_session_pairs_per_user_fixture():
    """Two sessions (gap > 30 min): s1 = {a, b}, s2 = {a, c} -> pairs
    (a,b)=1, (a,c)=1; singles a=2, b=1, c=1; total=2."""
    from khl_pdf_ocr_ray.pipelines.queries_behavior import (
        _LIFT_TOTAL,
        session_pairs_per_user,
    )

    us = 1_000_000
    g = pd.DataFrame(
        {
            "user_id": np.int64(1),
            "ts": pd.to_datetime(
                np.array([0, 60, 120, 7200, 7260], dtype="int64") * us,
                unit="us",
            ),
            "event_type": ["a", "b", "a", "a", "c"],
        }
    )
    out = session_pairs_per_user(g)
    cells = {
        (r.type_a, r.type_b): int(r.n) for r in out.itertuples()
    }
    assert cells[("a", "b")] == 1 and cells[("a", "c")] == 1
    assert cells[("a", _LIFT_TOTAL)] == 2
    assert cells[("b", _LIFT_TOTAL)] == 1
    assert cells[(_LIFT_TOTAL, _LIFT_TOTAL)] == 2
    assert ("b", "c") not in cells  # never co-session


def test_lift_finalize_hand_computed():
    """S=4, n_a=2, n_b=2, n_ab=2 (always together) -> lift = 2.0 =
    2000 milli; independents n_ab=1 -> lift = 1000."""
    from khl_pdf_ocr_ray.pipelines.queries_behavior import (
        _LIFT_TOTAL,
        lift_finalize,
    )

    cells = pd.DataFrame(
        {
            "type_a": ["a", "a", "b", _LIFT_TOTAL],
            "type_b": ["b", _LIFT_TOTAL, _LIFT_TOTAL, _LIFT_TOTAL],
            "n": [2, 2, 2, 4],
        }
    )
    out = lift_finalize(cells).set_index(["type_a", "type_b"])
    assert out.loc[("a", "b"), "lift_milli"] == 2000
    assert out.loc[("a", "b"), "n_a"] == 2 and out.loc[("a", "b"), "n_b"] == 2


def test_weekly_growth_fold_fixture():
    from khl_pdf_ocr_ray.pipelines.queries_behavior import weekly_growth_fold

    weeks = np.array([3, 1, 2], dtype=np.int64)  # unordered on purpose
    counts = np.array([300, 100, 200], dtype=np.int64)
    prev, growth = weekly_growth_fold(weeks, counts)
    # ordered: week1 n=100 (first -> 0), week2 n=200 prev=100 -> +1000,
    # week3 n=300 prev=200 -> 1500-1000 = +500
    assert prev.tolist() == [200, 0, 100]
    assert growth.tolist() == [500, 0, 1000]


def test_rrf_score_batch_formula():
    from khl_pdf_ocr_ray.pipelines.queries_fusion import (
        RRF_K,
        RRF_SCALE,
        rrf_score_batch,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "rank_len": pa.array([1, 1000], pa.int64()),
            "rank_tok": pa.array([1000, 1], pa.int64()),
        }
    )
    out = rrf_score_batch(t).to_pandas()
    want = RRF_SCALE // (RRF_K + 1) + RRF_SCALE // (RRF_K + 1000)
    assert (out["rrf_fx"] == want).all()  # symmetric ranks -> equal score
    assert (out["neg_fx"] + out["rrf_fx"] == 2 * RRF_SCALE).all()


# --- quality tiers ----------------------------------------------------------


def test_tier_batch_hand_fixture():
    """Three docs engineered into the three tiers."""
    from khl_pdf_ocr_ray.pipelines.queries_tiers import tier_batch

    hi = " ".join(f"w{i}" for i in range(50))          # wc=50, rep=20
    mid = " ".join(["a"] * 4 + [f"w{i}" for i in range(21)])  # wc=25, rep=160
    low = " ".join(["spam"] * 30)                       # rep=1000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [hi, mid, low],
            "n_chars": np.array([len(hi), len(mid), len(low)], dtype=np.int64),
        }
    )
    out = tier_batch(_t(df)).to_pandas().set_index("doc_id")
    assert out.loc[0, "tier"] == 2 and out.loc[0, "rep_milli"] == 20
    assert out.loc[1, "tier"] == 1 and out.loc[1, "rep_milli"] == 160
    assert out.loc[2, "tier"] == 0 and out.loc[2, "rep_milli"] == 1000


def test_tier_batch_is_batching_invariant():
    """Map-only assignment: any split of the batch yields the same rows
    (the per-doc top-term count must not leak across docs)."""
    from khl_pdf_ocr_ray.pipelines.queries_tiers import tier_batch

    rng = np.random.default_rng(51)
    vocab = [f"t{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 60)))
        for _ in range(120)
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "text": texts,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    whole = tier_batch(_t(df)).to_pandas()
    parts = pd.concat(
        [tier_batch(_t(df.iloc[i : i + 17])).to_pandas() for i in range(0, 120, 17)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(
        whole.sort_values("doc_id").reset_index(drop=True),
        parts.sort_values("doc_id").reset_index(drop=True),
    )


# --- encoding QC / Simpson diversity ----------------------------------------


def test_encqc_batch_planted_counts():
    """The plant appends doc_id%4 U+FFFD and doc_id%3 BEL chars; the
    RE2 counters must find exactly those on clean base text."""
    from khl_pdf_ocr_ray.pipelines.queries_encqc import encqc_batch

    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 5, 7, 11], dtype=np.int64),
            "text": ["abcd", "abcd", "abcd", None],
        }
    )
    out = encqc_batch(_t(df)).to_pandas().set_index("doc_id")
    for d in (0, 5, 7, 11):
        assert out.loc[d, "n_repl"] == d % 4
        assert out.loc[d, "n_ctrl"] == d % 3
        assert out.loc[d, "n_nonascii"] == d % 4  # only the U+FFFD are non-ascii
    # doc 11: null text -> base '' -> only the plant remains
    assert out.loc[11, "n_chars_v"] == 11 % 4 + 11 % 3
    # milli scores: doc 5 -> base 4 chars + 1 repl + 2 ctrl = 7 chars
    assert out.loc[5, "mojibake_milli"] == 1000 * 3 // 7


def test_encqc_base_nonascii_is_counted():
    """Non-ASCII in the BASE text (cyrillic) counts toward nonascii but
    not toward mojibake."""
    from khl_pdf_ocr_ray.pipelines.queries_encqc import encqc_batch

    df = pd.DataFrame(
        {"doc_id": np.array([0], dtype=np.int64), "text": ["привет ok"]}
    )
    out = encqc_batch(_t(df)).to_pandas()
    assert out["n_nonascii"].iloc[0] == 6  # 6 cyrillic letters
    assert out["n_repl"].iloc[0] == 0 and out["n_ctrl"].iloc[0] == 0


def test_simpson_per_user_fixtures():
    from khl_pdf_ocr_ray.pipelines.queries_diversity import simpson_per_user

    def mk(counts):
        return pd.DataFrame(
            {
                "user_id": np.int64(3),
                "event_type": [f"t{i}" for i in range(len(counts))],
                "n": np.array(counts, dtype=np.int64),
            }
        )

    # monomaniac -> 0
    assert simpson_per_user(mk([10]))["simpson_milli"].iloc[0] == 0
    # uniform over 4 types -> 1000 - 1000/4 = 750
    assert simpson_per_user(mk([5, 5, 5, 5]))["simpson_milli"].iloc[0] == 750
    # skewed 9+1: 1000 - 1000*82//100 = 180
    assert simpson_per_user(mk([9, 1]))["simpson_milli"].iloc[0] == 180


def test_user_type_partial_is_mergeable():
    from khl_pdf_ocr_ray.pipelines.queries_diversity import user_type_partial

    rng = np.random.default_rng(61)
    n = 900
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, n).astype("int64"),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    whole = user_type_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [
            user_type_partial(_t(df.iloc[i : i + 111])).to_pandas()
            for i in range(0, n, 111)
        ],
        ignore_index=True,
    )
    merged = parts.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
    a = whole.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    b = merged.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_session_lift_sql_gap_pinned_to_sessionize():
    """SQL_SESSION_LIFT bakes the 1800 s gap; pin it to the shared
    SESSION_GAP_S so the twin can't drift."""
    from khl_pdf_ocr_ray.pipelines.queries import SESSION_GAP_S
    from khl_pdf_ocr_ray.pipelines.queries_behavior import SQL_SESSION_LIFT

    assert SESSION_GAP_S == 1800
    assert "> 1800" in SQL_SESSION_LIFT


# --- A/B chi-square ----------------------------------------------------------


def test_ab_finalize_hand_computed():
    """Perfect separation: A all convert (10), B none (10) -> chi2 = N =
    20 -> 20000 milli; identical cohorts -> 0."""
    from khl_pdf_ocr_ray.pipelines.queries_abtest import ab_finalize

    cells = pd.DataFrame(
        {"cohort": [0, 1], "conv": [1, 0], "n": [10, 10]}
    )
    out = ab_finalize(cells)
    assert out["chi2_milli"].iloc[0] == 20000
    assert out["n_a"].iloc[0] == 10 and out["conv_b"].iloc[0] == 0
    cells = pd.DataFrame(
        {"cohort": [0, 0, 1, 1], "conv": [1, 0, 1, 0], "n": [5, 5, 5, 5]}
    )
    assert ab_finalize(cells)["chi2_milli"].iloc[0] == 0


def test_ab_user_partial_is_max_mergeable():
    from khl_pdf_ocr_ray.pipelines.queries_abtest import ab_user_partial

    rng = np.random.default_rng(71)
    n = 600
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, n).astype("int64"),
            "event_type": rng.choice(["view", "purchase", "click"], n),
        }
    )
    whole = ab_user_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [
            ab_user_partial(_t(df.iloc[i : i + 97])).to_pandas()
            for i in range(0, n, 97)
        ],
        ignore_index=True,
    )
    merged = parts.groupby("user_id", as_index=False)["conv"].max()
    a = whole.sort_values("user_id").reset_index(drop=True)
    b = merged.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
