"""Kernel-level checks for the relational-completeness operators
(pipelines/queries_rel.py) beyond the oracle parity gate: funnel
ordering semantics, set-op membership-bit algebra, and correlation
sufficient-statistics exactness."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_rel import (
    SET_SIDE_A,
    SET_SIDE_B,
    corr_from_sums,
    corr_partial,
    except_filter,
    funnel_user_reach,
    intersect_filter,
    setop_partial,
)


def _user(events):
    ts = pd.to_datetime([t for t, _ in events], unit="s")
    return pd.DataFrame({"event_type": [e for _, e in events], "ts": ts})


def test_funnel_reach_requires_stage_order():
    # click BEFORE the first view must not count toward stage 2.
    g = _user([(10, "click"), (20, "view")])
    assert funnel_user_reach(g)["reach"].tolist() == [1]
    # proper order reaches 3
    g = _user([(10, "view"), (20, "click"), (30, "purchase")])
    assert funnel_user_reach(g)["reach"].tolist() == [3]
    # purchase before the qualifying click doesn't count
    g = _user([(10, "view"), (30, "click"), (20, "purchase")])
    assert funnel_user_reach(g)["reach"].tolist() == [2]


def test_funnel_reach_ties_count_and_no_view_is_empty():
    # simultaneous view+click at the same ts: ties allowed (ts >= prev)
    g = _user([(10, "view"), (10, "click")])
    assert funnel_user_reach(g)["reach"].tolist() == [2]
    g = _user([(10, "click"), (20, "purchase")])
    assert funnel_user_reach(g).empty


def test_funnel_reach_uses_earliest_qualifying_stage_time():
    # First view at t=10; the t=15 click qualifies even though a later
    # view (t=30) would disqualify it — min-ts per stage, not max.
    g = _user([(10, "view"), (15, "click"), (30, "view"), (16, "purchase")])
    assert funnel_user_reach(g)["reach"].tolist() == [3]


def _ev_batch(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def test_setop_bits_and_filters():
    ta, ca = SET_SIDE_A
    tb, cb = SET_SIDE_B
    batch = _ev_batch(
        [
            (1, ta, ca / 100.0),          # A at threshold -> a-side
            (1, tb, (cb - 1) / 100.0),    # B below threshold -> not b-side
            (2, ta, ca / 100.0),
            (2, tb, cb / 100.0),          # both sides
            (3, tb, cb / 100.0),          # b only
            (4, "view", 10_000.0),        # wrong type, huge value -> neither
        ]
    )
    g = setop_partial(batch)
    bits = {
        u: (a, b)
        for u, a, b in zip(
            g["user_id"].to_pylist(), g["a"].to_pylist(), g["b"].to_pylist()
        )
    }
    assert bits == {1: (1, 0), 2: (1, 1), 3: (0, 1)}
    assert intersect_filter(g)["user_id"].to_pylist() == [2]
    assert except_filter(g)["user_id"].to_pylist() == [1]


def test_corr_partial_sums_and_formula_match_numpy():
    rng = np.random.default_rng(7)
    n = 500
    val = rng.uniform(0.01, 400.0, n).round(2)
    k = rng.integers(-50, 150, n)
    batch = pa.table(
        {
            "event_type": pa.array(["t"] * n),
            "value": pa.array(val, pa.float64()),
            "props": pa.array([f'{{"k": {int(x)}}}' for x in k]),
        }
    )
    g = corr_partial(batch)
    assert g.num_rows == 1
    row = {c: g[c][0].as_py() for c in g.column_names}
    x = np.floor(val * 100 + 0.5).astype("int64")
    assert row["n"] == n and row["sx"] == x.sum() and row["sy"] == k.sum()
    assert row["sxy"] == (x * k).sum()
    r = corr_from_sums(row["n"], row["sx"], row["sy"], row["sxx"], row["syy"], row["sxy"])
    assert abs(r - np.corrcoef(x, k)[0, 1]) < 1e-12


def test_corr_partial_drops_missing_k():
    batch = pa.table(
        {
            "event_type": ["t", "t"],
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": ['{"j": 5}', '{"k": 3}'],
        }
    )
    g = corr_partial(batch)
    assert g["n"][0].as_py() == 1 and g["sy"][0].as_py() == 3


def _ref_lev(a, b):
    la, lb = len(a), len(b)
    D = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        D[i][0] = i
    for j in range(lb + 1):
        D[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i][j] = min(
                D[i - 1][j] + 1,
                D[i][j - 1] + 1,
                D[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return D[la][lb]


def test_levenshtein_pairs_matches_bruteforce():
    import itertools
    import random

    from khl_pdf_ocr_ray.stages.dedup import _pad_codes, levenshtein_pairs

    rng = random.Random(11)
    strs = [
        "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 15)))
        for _ in range(25)
    ]
    A, B = zip(*itertools.combinations(strs, 2))
    ca, la = _pad_codes(list(A), 15)
    cb, lb = _pad_codes(list(B), 15)
    got = levenshtein_pairs(ca, la, cb, lb)
    exp = np.array([_ref_lev(a, b) for a, b in zip(A, B)])
    assert (got == exp).all()


def test_fuzzy_block_pairs_finds_planted_near_dup():
    from khl_pdf_ocr_ray.stages.dedup import fuzzy_block_pairs

    base = "the quick brown fox jumps over the lazy dog once more"
    g = pd.DataFrame(
        {
            "doc_id": [30, 10, 20],
            "text": [
                "completely different text about other things entirely ok",
                base,
                # 1 sub + 1 insert, plus the insert shifts the 40-char
                # window so its trailing char differs too -> distance 3
                base.replace("quick", "quacks"),
            ],
        }
    )
    out = fuzzy_block_pairs(g)
    assert out[["doc_a", "doc_b"]].values.tolist() == [[10, 20]]
    assert int(out["dist"].iloc[0]) == 3
    # singleton group -> empty frame with stable int64 schema
    empty = fuzzy_block_pairs(g.iloc[:1])
    assert list(empty.columns) == ["doc_a", "doc_b", "dist"]
    assert empty.dtypes.astype(str).tolist() == ["int64", "int64", "int64"]


def test_levenshtein_banded_exact_below_threshold_clipped_above():
    import itertools
    import random

    from khl_pdf_ocr_ray.stages.dedup import _pad_codes, levenshtein_pairs

    rng = random.Random(5)
    strs = [
        "".join(rng.choice("abc ") for _ in range(rng.randint(0, 14)))
        for _ in range(30)
    ]
    A, B = zip(*itertools.combinations(strs, 2))
    ca, la = _pad_codes(list(A), 14)
    cb, lb = _pad_codes(list(B), 14)
    exp = np.array([_ref_lev(a, b) for a, b in zip(A, B)])
    for k in (0, 2, 5):
        got = levenshtein_pairs(ca, la, cb, lb, max_dist=k)
        assert (got[exp <= k] == exp[exp <= k]).all()
        assert (got[exp > k] > k).all()


def test_lang_confusion_partial_counts_and_diagonal():
    from khl_pdf_ocr_ray.stages.textqc import lang_confusion_partial

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "lang": ["en", "en", "fr", "de"],
            "text": [
                "the cat and the dog of to in",   # clearly en
                "le chat la nuit et les jours",   # en doc that reads fr
                "le la et les des",               # clearly fr
                "zzz qqq www",                    # no stopwords -> und
            ],
        }
    )
    import pyarrow as pa

    out = lang_confusion_partial(
        pa.Table.from_pandas(df, preserve_index=False)
    ).to_pandas()
    m = {(r.lang, r.pred_lang): r.n for r in out.itertuples()}
    assert m == {("en", "en"): 1, ("en", "fr"): 1, ("fr", "fr"): 1, ("de", "und"): 1}


def test_iqr_bounds_match_numpy_quartiles_and_filter_keeps_inliers():
    from khl_pdf_ocr_ray.pipelines.queries_rel import (
        iqr_bounds_group,
        iqr_filter_apply,
    )

    rng = np.random.default_rng(13)
    vals = np.sort(rng.integers(0, 1000, 200))
    hist = (
        pd.DataFrame({"cents": vals})
        .value_counts()
        .rename("n")
        .reset_index()
        .assign(event_type="t")
    )
    b = iqr_bounds_group(hist)
    import math

    q1 = int(vals[math.ceil(0.25 * len(vals)) - 1])
    q3 = int(vals[math.ceil(0.75 * len(vals)) - 1])
    m = (3 * (q3 - q1)) // 2
    assert int(b["lo"].iloc[0]) == q1 - m and int(b["hi"].iloc[0]) == q3 + m
    batch = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "event_type": ["t", "t", "t"],
            "cents": pa.array([q1, q3 + m, q3 + m + 1], pa.int64()),
        }
    )
    out = iqr_filter_apply(batch, {"t": (q1 - m, q3 + m)})
    assert out["event_id"].to_pylist() == [1, 2]


def test_relational_division_kernels():
    from khl_pdf_ocr_ray.pipelines.queries_rel import (
        div_finalize,
        supp_part_distinct,
    )

    batch = pa.table(
        {
            "l_suppkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "l_partkey": pa.array([10, 10, 20, 10, 99, 20], pa.int64()),
        }
    )
    # brand part set {10, 20}: supp 1 ships both (dup collapsed), supp 2
    # ships 10 only (99 excluded), supp 3 ships 20 only
    dist = supp_part_distinct(batch, [10, 20]).to_pandas()
    got = set(map(tuple, dist.values.tolist()))
    assert got == {(1, 10), (1, 20), (2, 10), (3, 20)}
    counts = pa.table(
        {
            "l_suppkey": pa.array([1, 2, 3], pa.int64()),
            "n_parts": pa.array([2, 1, 1], pa.int64()),
        }
    )
    out = div_finalize(counts, n_total=2).to_pandas().set_index("suppkey")
    assert bool(out.loc[1, "is_full"]) and not bool(out.loc[2, "is_full"])


def test_corr_zero_variance_yields_nan_like_sql_null():
    import math

    from khl_pdf_ocr_ray.pipelines.queries_rel import corr_from_sums

    # constant y column (vy == 0) and single-row group (vx == vy == 0)
    assert math.isnan(corr_from_sums(3, 6, 9, 14, 27, 18))
    assert math.isnan(corr_from_sums(1, 5, 7, 25, 49, 35))


def test_gini_partials_match_single_pass_formula():
    from khl_pdf_ocr_ray.pipelines.queries_rel import (
        gini_block_partial,
        gini_from_partials,
    )

    rng = np.random.default_rng(21)
    spend = np.sort(rng.integers(1, 10**6, 200))
    users = np.arange(200, dtype="int64")
    # split the sorted table into uneven "blocks" in shuffled arrival order
    cuts = [0, 37, 38, 120, 200]
    parts = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        parts.append(
            gini_block_partial(
                pa.table(
                    {
                        "user_id": pa.array(users[a:b], pa.int64()),
                        "spend": pa.array(spend[a:b], pa.int64()),
                    }
                )
            ).to_pandas()
        )
    arrival = pd.concat([parts[2], parts[0], parts[3], parts[1]], ignore_index=True)
    n, gini = gini_from_partials(arrival)
    i = np.arange(1, 201, dtype="int64")
    num = 2 * int((i * spend).sum()) - 201 * int(spend.sum())
    den = 200 * int(spend.sum())
    assert n == 200
    assert gini == float(num) / float(den)
    assert 0.0 <= gini <= 1.0


def test_mad_median_convention_and_deviation_hist():
    from khl_pdf_ocr_ray.pipelines.queries_rel import (
        mad_dev_hist_partial,
        median_from_hist,
    )

    # even count: quantile_disc takes v[ceil(n/2)-1] (lower of the middle pair)
    hist = pd.DataFrame({"cents": [10, 20, 30, 40], "n": [1, 1, 1, 1]})
    assert median_from_hist(hist, "cents") == 20
    hist2 = pd.DataFrame({"cents": [10, 20, 30], "n": [1, 5, 1]})
    assert median_from_hist(hist2, "cents") == 20
    batch = pa.table(
        {
            "event_type": ["t", "t", "t"],
            "value": pa.array([0.10, 0.20, 0.50], pa.float64()),
        }
    )
    out = mad_dev_hist_partial(batch, {"t": 20}).to_pandas()
    assert dict(zip(out["dev"], out["n"])) == {10: 1, 0: 1, 30: 1}
