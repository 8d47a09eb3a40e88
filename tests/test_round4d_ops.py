"""Kernel-level checks for the round-4d operators (Benford QC, Holt
forecast, largest-remainder apportionment, TV drift, NDCG@10,
Markov backtest), beyond oracle parity: hand fixtures, recurrence
references, merge/split invariances and tie-break rules."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


# --- Benford QC -----------------------------------------------------------


def test_benford_digit_kernel_and_probs():
    from khl_pdf_ocr_ray.pipelines.queries_benford import (
        BENFORD_P_MICRO,
        MICRO,
        benford_digit_partial,
    )

    t = _t(pd.DataFrame({"o_totalprice": [1320.51, 912.0, 19999.9, 1.0]}))
    got = benford_digit_partial(t).to_pandas()
    counts = dict(zip(got["digit"], got["n"]))
    assert counts == {1: 3, 9: 1}
    # the probability table sums to ~1 and is the canonical Benford law
    assert abs(sum(BENFORD_P_MICRO.values()) - MICRO) <= 5
    assert BENFORD_P_MICRO[1] == 301030 and BENFORD_P_MICRO[9] == 45757


def test_benford_rejects_sub_unit_amounts():
    import pytest

    from khl_pdf_ocr_ray.pipelines.queries_benford import (
        benford_digit_partial,
    )

    with pytest.raises(ValueError):
        benford_digit_partial(_t(pd.DataFrame({"o_totalprice": [0.5]})))


def test_benford_finalize_hand_cell():
    from khl_pdf_ocr_ray.pipelines.queries_benford import (
        BENFORD_P_MICRO,
        MICRO,
        benford_finalize,
    )

    cells = pd.DataFrame({"digit": [1, 2], "n": [6, 4]})
    out = benford_finalize(cells)
    assert out["digit"].tolist() == list(range(1, 10))
    assert int(out["n"].sum()) == 10
    # exact integer chi-square term for digit 1: N=10, e = 10*p1
    e = 10 * BENFORD_P_MICRO[1]
    dev = 6 * MICRO - e
    assert int(out.loc[0, "chi2_term_milli"]) == (1000 * dev * dev) // (
        e * MICRO
    )
    # digits with zero observations still contribute their expected mass
    assert (out["n"].to_numpy()[2:] == 0).all()
    assert (out["chi2_term_milli"].to_numpy()[2:] > 0).all()


# --- Holt forecast --------------------------------------------------------


def test_holt_fold_matches_sequential_reference():
    from khl_pdf_ocr_ray.pipelines.queries_forecast import holt_fold

    days = np.array([3, 1, 2, 4], dtype=np.int64)  # unordered on purpose
    counts = np.array([30, 10, 20, 25], dtype=np.int64)
    lv, tr, fc, er = holt_fold(days, counts)
    # manual recurrence in day order: y = 10000, 20000, 30000, 25000
    # t0: l=10000 b=0 f=10000 err=0
    # t1: f=10000 l=(20000+10000)//2=15000 b=(5000+0)//4=1250 err=10000
    # t2: f=16250 l=(30000+16250)//2=23125 b=(8125+3750)//4=2968 err=13750
    # t3: f=26093 l=(25000+26093)//2=25546 b=(2421+8904)//4=2831 err=1093
    order = np.argsort(days)
    assert lv[order].tolist() == [10000, 15000, 23125, 25546]
    assert tr[order].tolist() == [0, 1250, 2968, 2831]
    assert fc[order].tolist() == [10000, 10000, 16250, 26093]
    assert er[order].tolist() == [0, 10000, 13750, 1093]


def test_holt_fold_negative_trend_floors():
    from khl_pdf_ocr_ray.pipelines.queries_forecast import holt_fold

    days = np.arange(3, dtype=np.int64)
    counts = np.array([100, 50, 10], dtype=np.int64)
    lv, tr, fc, er = holt_fold(days, counts)
    # decreasing series drives the trend negative; floor division on
    # negatives must match Python // (the DuckDB semantics)
    assert tr[1] == ((lv[1] - lv[0]) + 0) // 4 and tr[1] < 0
    assert er[2] == abs(10_000 - (lv[1] + tr[1]))


# --- Largest-remainder apportionment --------------------------------------


def test_apportion_sums_exactly_and_breaks_ties_by_source():
    from khl_pdf_ocr_ray.pipelines.queries_apportion import apportion_fold

    out = apportion_fold(["a", "b", "c"], [1, 1, 1], budget=10)
    assert int(out["budget"].sum()) == 10
    # remainders all equal -> leftover goes to lexicographically first
    assert out.set_index("source")["budget"].to_dict() == {
        "a": 4,
        "b": 3,
        "c": 3,
    }


def test_apportion_proportionality():
    from khl_pdf_ocr_ray.pipelines.queries_apportion import apportion_fold

    out = apportion_fold(["x", "y"], [900, 100], budget=1000)
    assert out.set_index("source")["budget"].to_dict() == {
        "x": 900,
        "y": 100,
    }
    out2 = apportion_fold(["x", "y", "z"], [2, 3, 5], budget=7)
    assert int(out2["budget"].sum()) == 7
    # exact shares 1.4/2.1/3.5 -> floors 1/2/3, leftover 1 to max rem (x: .4
    # vs y: .1 vs z: .5 -> z)
    assert out2.set_index("source")["budget"].to_dict() == {
        "x": 1,
        "y": 2,
        "z": 4,
    }


# --- TV drift -------------------------------------------------------------


def test_tv_finalize_identical_and_disjoint():
    from khl_pdf_ocr_ray.pipelines.queries_drift import tv_finalize

    same = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b"],
            "word": ["w", "v", "w", "v"],
            "n": [2, 2, 2, 2],
        }
    )
    out = tv_finalize(same)
    assert out["tv_milli"].tolist() == [0, 0]
    disjoint = pd.DataFrame(
        {
            "source": ["a", "b"],
            "word": ["w", "v"],
            "n": [3, 3],
        }
    )
    out2 = tv_finalize(disjoint)
    # each source: own word p=1 vs q=1/2, other word 0 vs 1/2 -> TV = 1/2
    assert out2["tv_milli"].tolist() == [500, 500]


def test_tv_partial_counts_tokens_with_empties():
    from khl_pdf_ocr_ray.pipelines.queries_drift import source_word_partial

    t = _t(
        pd.DataFrame(
            {"source": ["s"], "text": ["a  b a"]}  # double space -> empty tok
        )
    )
    got = source_word_partial(t).to_pandas()
    counts = dict(zip(got["word"], got["n"]))
    assert counts == {"a": 2, "b": 1, "": 1}


# --- NDCG@10 --------------------------------------------------------------


def test_ndcg_weights_and_gain_tables():
    import math

    from khl_pdf_ocr_ray.pipelines.queries_rankeval import (
        FX,
        NDCG_K,
        NDCG_W,
        _GAIN,
    )

    assert NDCG_W[1] == FX and len(NDCG_W) == NDCG_K
    assert NDCG_W[3] == int(round(FX / math.log2(4)))
    assert _GAIN == {0: 0, 1: 1, 2: 3, 3: 7}


def test_ndcg_topk_superset_split_invariance():
    from khl_pdf_ocr_ray.pipelines.queries_rankeval import (
        ndcg_finalize,
        ndcg_topk_partial,
    )

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "source": rng.choice(["s1", "s2", "s3"], n),
            "doc_id": np.arange(n, dtype=np.int64),
            "score": rng.integers(0, 50, n).astype(np.int64),
            "rel": rng.integers(0, 4, n).astype(np.int64),
        }
    )
    n_docs = df.groupby("source").size().to_dict()
    whole = ndcg_topk_partial(_t(df)).to_pandas()
    parts = pd.concat(
        [
            ndcg_topk_partial(_t(df.iloc[:150])).to_pandas(),
            ndcg_topk_partial(_t(df.iloc[150:260])).to_pandas(),
            ndcg_topk_partial(_t(df.iloc[260:])).to_pandas(),
        ],
        ignore_index=True,
    )
    a = ndcg_finalize(whole, n_docs)
    b = ndcg_finalize(parts, n_docs)
    pd.testing.assert_frame_equal(a, b)


def test_ndcg_perfect_ranking_is_1000():
    from khl_pdf_ocr_ray.pipelines.queries_rankeval import (
        ndcg_finalize,
        ndcg_topk_partial,
    )

    # score strictly increasing WITH rel -> DCG ordering == ideal ordering
    df = pd.DataFrame(
        {
            "source": ["s"] * 8,
            "doc_id": np.arange(8, dtype=np.int64),
            "score": np.arange(8, dtype=np.int64),
            "rel": np.minimum(3, np.arange(8) // 2).astype(np.int64),
        }
    )
    cells = ndcg_topk_partial(_t(df)).to_pandas()
    out = ndcg_finalize(cells, {"s": 8})
    assert out["ndcg_milli"].tolist() == [1000]
    assert int(out["dcg_fx"].iloc[0]) == int(out["idcg_fx"].iloc[0]) > 0


# --- session paths / rolling actives ---------------------------------------


def test_session_paths_fold_breaks_and_truncates():
    from khl_pdf_ocr_ray.pipelines.queries_journeys import (
        session_paths_per_user,
    )

    # 5 events, gap of 2h between #3 and #4 -> two sessions; first path
    # truncated at 3, second has 2 events
    ts = pd.to_datetime([0, 10, 20, 30, 7300, 7310], unit="s")
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": [1] * 6,
            "event_type": ["a", "b", "c", "d", "e", "f"],
        }
    )
    g = session_paths_per_user(df)
    got = dict(zip(g["path"], g["n"]))
    assert got == {"a>b>c": 1, "e>f": 1}
    # exactly-1800s gap does NOT break (strict >, the sessionize rule)
    ts2 = pd.to_datetime([0, 1800], unit="s")
    df2 = pd.DataFrame(
        {
            "ts": ts2,
            "event_id": np.arange(2, dtype=np.int64),
            "user_id": [1, 1],
            "event_type": ["a", "b"],
        }
    )
    g2 = session_paths_per_user(df2)
    assert dict(zip(g2["path"], g2["n"])) == {"a>b": 1}


def test_cover_windows_dedups_overlaps():
    from khl_pdf_ocr_ray.pipelines.queries_journeys import (
        cover_windows_per_user,
    )

    g = cover_windows_per_user(pd.DataFrame({"day": [10, 12, 30]}))
    got = g["wday"].tolist()
    # [10..16] U [12..18] U [30..36] with no duplicates
    assert got == list(range(10, 19)) + list(range(30, 37))


def test_user_day_partial_distinct():
    from khl_pdf_ocr_ray.pipelines.queries_journeys import (
        DAY_US,
        user_day_partial,
    )

    ts = pd.to_datetime([5, 10, 86405, 7], unit="s")
    t = _t(
        pd.DataFrame(
            {"user_id": np.array([1, 1, 1, 2], dtype=np.int64), "ts": ts}
        )
    )
    got = user_day_partial(t).to_pandas()
    pairs = set(zip(got["user_id"], got["day"]))
    assert pairs == {(1, 0), (1, 1), (2, 0)}
    assert DAY_US == 86_400_000_000


# --- trimmed mean / split balance -------------------------------------------


def test_trim_filter_keeps_the_middle():
    from khl_pdf_ocr_ray.pipelines.queries_robust import trim_filter

    # 12 rows, one lang: cut = 1 -> keep ranks 2..11
    t = _t(
        pd.DataFrame(
            {
                "lang": ["en"] * 12,
                "rn": np.arange(1, 13, dtype=np.int64),
                "n_chars": np.arange(1, 13, dtype=np.int64) * 10,
            }
        )
    )
    got = trim_filter(t, counts={"en": 12}).to_pandas()
    assert int(got["kept_n"].iloc[0]) == 10
    assert int(got["kept_sum"].iloc[0]) == sum(range(2, 12)) * 10
    # tiny group (n < TRIM_DIV) keeps everything
    t2 = _t(
        pd.DataFrame(
            {
                "lang": ["fr"] * 3,
                "rn": np.array([1, 2, 3], dtype=np.int64),
                "n_chars": np.array([5, 6, 7], dtype=np.int64),
            }
        )
    )
    got2 = trim_filter(t2, counts={"fr": 3}).to_pandas()
    assert int(got2["kept_n"].iloc[0]) == 3


def test_split_chi2_finalize_hand_grid():
    from khl_pdf_ocr_ray.pipelines.queries_robust import (
        split_chi2_finalize,
    )

    cells = pd.DataFrame(
        {
            "split": ["train", "train", "test"],
            "lang": ["en", "fr", "en"],
            "n": [90, 90, 20],
        }
    )
    out = split_chi2_finalize(cells)
    # full 2x2 grid materializes the missing (test, fr) zero cell
    assert len(out) == 4
    z = out[(out["split"] == "test") & (out["lang"] == "fr")]
    assert int(z["n"].iloc[0]) == 0
    # hand term for (test, en): o=20, N=200, rt=20, ct=110
    dev = 20 * 200 - 20 * 110
    want = (1000 * dev * dev) // (200 * 20 * 110)
    te = out[(out["split"] == "test") & (out["lang"] == "en")]
    assert int(te["term_milli"].iloc[0]) == want


# --- shared-constant pins (circular-import workaround) ---------------------


def test_journeys_gap_matches_corpus_rule():
    from khl_pdf_ocr_ray.pipelines.queries import SESSION_GAP_S
    from khl_pdf_ocr_ray.pipelines.queries_journeys import (
        SESSION_GAP_S_LOCAL,
    )

    assert SESSION_GAP_S_LOCAL == SESSION_GAP_S


def test_split_constants_match_corpus_rule():
    from khl_pdf_ocr_ray.pipelines.queries import (
        SPLIT_ID_MOD,
        SPLIT_MULT,
        SPLIT_TRAIN_PCT,
    )
    from khl_pdf_ocr_ray.pipelines.queries_robust import (
        SPLIT_ID_MOD_LOCAL,
        SPLIT_MULT_LOCAL,
        SPLIT_TRAIN_PCT_LOCAL,
    )

    assert SPLIT_ID_MOD_LOCAL == SPLIT_ID_MOD
    assert SPLIT_MULT_LOCAL == SPLIT_MULT
    assert SPLIT_TRAIN_PCT_LOCAL == SPLIT_TRAIN_PCT


# --- tier drift -------------------------------------------------------------


def test_tierdrift_constants_match_scd2():
    from khl_pdf_ocr_ray.pipelines.queries_eval import (
        SCD_CHG_MOD,
        SCD_SNAPS,
    )
    from khl_pdf_ocr_ray.pipelines.queries_tierdrift import (
        DRIFT_CHG_MOD,
        DRIFT_SNAPS,
    )

    assert DRIFT_SNAPS == SCD_SNAPS
    assert DRIFT_CHG_MOD == SCD_CHG_MOD


def test_tier_drift_closed_form_equals_materialized_snapshots():
    """The signal-shift closed form must equal literally appending the
    filler tokens and re-running the certified tier kernel."""
    from khl_pdf_ocr_ray.pipelines.queries_tierdrift import (
        DRIFT_CHG_MOD,
        DRIFT_SNAPS,
        FILLER_K,
        FILLER_TOKEN,
        tier_drift_partial,
    )
    from khl_pdf_ocr_ray.pipelines.queries_tiers import tier_batch

    rng = np.random.default_rng(23)
    vocab = ["the", "cat", "sat", "on", "mat", "a"]
    ids = np.arange(37, dtype=np.int64)
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 90)))
        for _ in ids
    ]
    df = pd.DataFrame({"doc_id": ids, "text": texts, "n_chars": [
        len(t) for t in texts]})
    got = tier_drift_partial(_t(df[["doc_id", "text"]])).to_pandas()
    got_cells = {
        (int(r.tier_from), int(r.tier_to)): int(r.n)
        for r in got.itertuples()
    }
    # brute force: materialize each snapshot's text, tier it
    tiers = []
    for s in range(DRIFT_SNAPS):
        rows = []
        for d, t in zip(ids, texts):
            rev = sum(
                1
                for s2 in range(1, s + 1)
                if (int(d) + s2) % DRIFT_CHG_MOD == 0
            )
            rows.append(t + (" " + FILLER_TOKEN) * (rev * FILLER_K))
        snap_df = pd.DataFrame(
            {"doc_id": ids, "text": rows, "n_chars": [len(x) for x in rows]}
        )
        tiers.append(
            tier_batch(_t(snap_df)).to_pandas()["tier"].to_numpy()
        )
    want: dict = {}
    for s in range(DRIFT_SNAPS - 1):
        for a, b in zip(tiers[s], tiers[s + 1]):
            want[(int(a), int(b))] = want.get((int(a), int(b)), 0) + 1
    assert got_cells == want
    # and the fixture actually drifts (off-diagonal transitions exist)
    assert any(a != b for a, b in got_cells)


# --- dedup/ANN eval ----------------------------------------------------------


def test_pr_finalize_hand_numbers():
    from khl_pdf_ocr_ray.pipelines.queries_dedupeval import pr_finalize

    out = pr_finalize(n_pred=8, n_truth=10, n_both=6)
    assert int(out["precision_milli"].iloc[0]) == 750
    assert int(out["recall_milli"].iloc[0]) == 600
    assert int(out["f1_milli"].iloc[0]) == (2000 * 6) // 18
    z = pr_finalize(0, 0, 0)
    assert int(z["f1_milli"].iloc[0]) == 0


def test_pr_classify_partial_counts():
    from khl_pdf_ocr_ray.pipelines.queries_dedupeval import (
        pr_classify_partial,
    )

    t = _t(
        pd.DataFrame(
            {
                "doc_a": np.array([1, 2, 3], dtype=np.int64),
                "doc_b": np.array([9, 9, 9], dtype=np.int64),
                "p": np.array([1, 1, 0], dtype=np.int64),
                "t": np.array([1, 0, 1], dtype=np.int64),
            }
        )
    )
    got = pr_classify_partial(t).to_pandas()
    assert (
        int(got["n_pred"].iloc[0]),
        int(got["n_truth"].iloc[0]),
        int(got["n_both"].iloc[0]),
    ) == (2, 2, 1)


# --- trade matrix / RFM -----------------------------------------------------


def test_line_supp_cells_cents_and_broadcast_decode():
    from khl_pdf_ocr_ray.pipelines.queries_trade import line_supp_cells

    t = _t(
        pd.DataFrame(
            {
                "l_orderkey": np.array([1, 1, 2], dtype=np.int64),
                "l_suppkey": np.array([10, 11, 10], dtype=np.int64),
                "l_extendedprice": [100.0, 200.0, 0.015],
                "l_discount": [0.1, 0.0, 0.0],
            }
        )
    )
    got = line_supp_cells(t, supp_nation={10: 5, 11: 7}).to_pandas()
    cells = {
        (int(r.l_orderkey), int(r.supp_nation)): (int(r.cents), int(r.n))
        for r in got.itertuples()
    }
    # 100*(1-0.1)*100 = 9000 cents; 200*100 = 20000; floor(1.5+0.5) = 2
    assert cells == {(1, 5): (9000, 1), (1, 7): (20000, 1), (2, 5): (2, 1)}


def test_rfm_bucket_thresholds():
    from khl_pdf_ocr_ray.pipelines.queries_trade import (
        DAY_US,
        RFM_F_ORDERS,
        RFM_M_CENTS,
        RFM_R_DAYS,
        rfm_bucket,
    )

    max_us = 1000 * DAY_US
    t = _t(
        pd.DataFrame(
            {
                "o_custkey": np.array([1, 2, 3], dtype=np.int64),
                "last_us": np.array(
                    [
                        max_us - RFM_R_DAYS[0] * DAY_US,      # boundary -> r0
                        max_us - (RFM_R_DAYS[1] + 1) * DAY_US,  # -> r2
                        max_us,                                 # -> r0
                    ],
                    dtype=np.int64,
                ),
                "cents": np.array(
                    [RFM_M_CENTS[0], RFM_M_CENTS[1] - 1, 0], dtype=np.int64
                ),
                "n": np.array(
                    [RFM_F_ORDERS[0], RFM_F_ORDERS[1], 1], dtype=np.int64
                ),
            }
        )
    )
    got = rfm_bucket(t, max_us=max_us).to_pandas()
    cells = {
        (int(r.r_bucket), int(r.f_bucket), int(r.m_bucket)): int(
            r.n_customers
        )
        for r in got.itertuples()
    }
    assert cells == {(0, 0, 0): 1, (2, 1, 2): 1, (0, 2, 2): 1}


# --- context budget / k-anonymity -------------------------------------------


def test_bit_length_matches_python():
    from khl_pdf_ocr_ray.pipelines.queries_budget import bit_length_i64

    n = np.array(
        [1, 2, 3, 4, 7, 8, 1023, 1024, (1 << 62) - 1, 1 << 62],
        dtype=np.int64,
    )
    got = bit_length_i64(n)
    assert got.tolist() == [int(x).bit_length() for x in n.tolist()]


def test_len_bucket_partial_counts():
    from khl_pdf_ocr_ray.pipelines.queries_budget import len_bucket_partial

    t = _t(pd.DataFrame({"text": ["a b c", "x", None, "w x y z"]}))
    got = len_bucket_partial(t).to_pandas()
    cells = {
        int(r.bucket): (int(r.n_docs), int(r.total_tokens))
        for r in got.itertuples()
    }
    # token counts: 3, 1, 1 (null -> ['']), 4 -> buckets 2, 1, 1, 3
    assert cells == {1: (2, 2), 2: (1, 3), 3: (1, 4)}


# --- bot velocity ------------------------------------------------------------


def test_velocity_telescoping_identity():
    """(max-min)/(n-1) must equal the mean of consecutive sorted gaps."""
    from khl_pdf_ocr_ray.pipelines.queries_velocity import (
        velocity_finalize,
        velocity_partial,
    )

    rng = np.random.default_rng(3)
    ts_us = np.sort(rng.integers(0, 10**9, 61)).astype("datetime64[us]")
    df = pd.DataFrame({"user_id": np.int64(7), "ts": ts_us})
    part = velocity_partial(_t(df)).to_pandas()
    assert len(part) == 1
    span = int(part["max_us"].iloc[0] - part["min_us"].iloc[0])
    gaps = np.diff(np.sort(ts_us.astype(np.int64)))
    assert span // 60 == int(gaps.sum()) // 60  # telescoping
    out = velocity_finalize(
        _t(part.rename(columns={}))
    ).to_pandas()
    # n=61 >= 60 and tiny gaps -> flagged
    assert out["user_id"].tolist() == [7]
    assert int(out["mean_gap_s"].iloc[0]) == (span // 60) // 1_000_000


def test_velocity_thresholds_filter():
    from khl_pdf_ocr_ray.pipelines.queries_velocity import (
        BOT_MAX_GAP_S,
        BOT_MIN_EVENTS,
        velocity_finalize,
    )

    part = pd.DataFrame(
        {
            "user_id": np.array([1, 2, 3], dtype=np.int64),
            "min_us": np.array([0, 0, 0], dtype=np.int64),
            "max_us": np.array(
                [
                    (BOT_MIN_EVENTS - 1) * BOT_MAX_GAP_S * 10**6,  # slow
                    (BOT_MIN_EVENTS - 1) * BOT_MAX_GAP_S * 10**6,  # boundary
                    10**6,                                          # fast
                ],
                dtype=np.int64,
            ),
            "n": np.array(
                [BOT_MIN_EVENTS - 1, BOT_MIN_EVENTS, BOT_MIN_EVENTS],
                dtype=np.int64,
            ),
        }
    )
    out = velocity_finalize(_t(part)).to_pandas()
    # user 1: too few events; user 2: gap exactly at threshold -> flagged;
    # user 3: fast -> flagged
    assert out["user_id"].tolist() == [2, 3]


# --- Markov backtest ------------------------------------------------------


def test_markov_split_rule_and_counts():
    from khl_pdf_ocr_ray.pipelines.queries_markoveval import (
        markov_split_pairs_per_user,
    )

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(np.arange(5), unit="s"),
            "event_id": np.arange(5, dtype=np.int64),
            "user_id": [1] * 5,
            "event_type": ["a", "b", "a", "b", "a"],
        }
    )
    g = markov_split_pairs_per_user(df)
    # n=5 -> positions 2..5; train when pos <= 3: pairs (a,b),(b,a) train;
    # (a,b),(b,a) test
    cells = {
        (r.prev, r.nxt, int(r.is_test)): int(r.n) for r in g.itertuples()
    }
    assert cells == {
        ("a", "b", 0): 1,
        ("b", "a", 0): 1,
        ("a", "b", 1): 1,
        ("b", "a", 1): 1,
    }
    # singleton users emit nothing, with the right schema
    empty = markov_split_pairs_per_user(df.iloc[:1])
    assert list(empty.columns) == ["prev", "nxt", "is_test", "n"]
    assert len(empty) == 0


def test_markov_finalize_argmax_tiebreak_and_accuracy():
    from khl_pdf_ocr_ray.pipelines.queries_markoveval import (
        markov_eval_finalize,
    )

    cells = pd.DataFrame(
        {
            "prev": ["a", "a", "a", "a", "b"],
            "nxt": ["x", "y", "x", "y", "x"],
            "is_test": [0, 0, 1, 1, 0],
            "n": [3, 3, 5, 2, 1],
        }
    )
    out = markov_eval_finalize(cells).set_index("prev_type")
    # tie 3-3 on train counts -> lexicographically smaller 'x' wins
    assert out.loc["a", "predicted"] == "x"
    assert int(out.loc["a", "n_test"]) == 7
    assert int(out.loc["a", "n_correct"]) == 5
    assert int(out.loc["a", "acc_milli"]) == (1000 * 5) // 7
    # prev 'b' trained but never tested -> zero row, not a crash
    assert int(out.loc["b", "n_test"]) == 0
    assert int(out.loc["b", "acc_milli"]) == 0
