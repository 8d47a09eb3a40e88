"""Kernel tests for the round-4f operator wave (Q17/Q15/Q19 rewrites)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _t(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


# --- small_qty_revenue (Q17) -------------------------------------------------


def test_small_qty_fold_strict_boundary():
    """qty * 5 * n == sum_qty is NOT below 20% of average — excluded."""
    from khl_pdf_ocr_ray.pipelines.queries_relx2 import small_qty_fold

    # part with lines qty [1, 1, 3, 5]: sum=10, n=4, avg=2.5, 0.2*avg=0.5
    # qty 1: 1*5*4=20 >= 10 -> excluded (boundary check: nothing qualifies)
    cells = _t(
        pd.DataFrame(
            {
                "l_partkey": np.int64([7, 7, 7]),
                "qty": np.int64([1, 3, 5]),
                "n_lines": np.int64([2, 1, 1]),
                "rev_cents": np.int64([100, 300, 500]),
            }
        )
    )
    out = small_qty_fold(cells)
    assert out.num_rows == 0

    # skew one giant line in: qty [1 x2, 100]: sum=102, n=3; qty 1:
    # 1*5*3=15 < 102 -> the two small lines qualify
    cells2 = _t(
        pd.DataFrame(
            {
                "l_partkey": np.int64([7, 7]),
                "qty": np.int64([1, 100]),
                "n_lines": np.int64([2, 1]),
                "rev_cents": np.int64([100, 900]),
            }
        )
    )
    out2 = small_qty_fold(cells2).to_pandas()
    assert out2["n_small"].tolist() == [2]
    assert out2["rev_small"].tolist() == [100]


def test_qty_cells_remerge_across_blocks():
    """Cells for the same (part, qty) arriving from two source blocks
    must re-aggregate inside the fold, not double-count."""
    from khl_pdf_ocr_ray.pipelines.queries_relx2 import (
        qty_cell_partial,
        small_qty_fold,
    )

    def block(n):
        return _t(
            pd.DataFrame(
                {
                    "l_partkey": np.int64([1] * n + [1]),
                    "l_quantity": np.float64([1.0] * n + [50.0]),
                    "l_extendedprice": np.float64([10.0] * (n + 1)),
                    "l_discount": np.float64([0.0] * (n + 1)),
                }
            )
        )

    cells = pa.concat_tables([qty_cell_partial(block(2)), qty_cell_partial(block(2))])
    out = small_qty_fold(cells).to_pandas()
    # merged: qty 1 x4 (rev 4000 cents), qty 50 x2; sum=104, n=6
    # qty 1: 1*5*6=30 < 104 -> 4 small lines
    assert out["n_small"].tolist() == [4]
    assert out["rev_small"].tolist() == [4000]


# --- top_window_suppliers (Q15) ----------------------------------------------


def test_window_rev_partial_boundaries_and_cents():
    """Window is [lo, hi): lo inclusive, hi exclusive; cents floor per
    row in the ext*(1-disc)*100 association order."""
    from khl_pdf_ocr_ray.pipelines.queries_relx2 import window_rev_partial

    ts = pd.to_datetime(
        ["2020-01-01", "2020-01-10", "2020-02-01"]
    )  # lo, inside, hi
    lo = int(ts[0].value // 1000)
    hi = int(ts[2].value // 1000)
    batch = pa.table(
        {
            "l_suppkey": pa.array([1, 1, 1], pa.int64()),
            # us precision — the parquet tables' timestamp unit
            "l_shipdate": pa.array(
                [int(t.value // 1000) for t in ts], pa.timestamp("us")
            ),
            "l_extendedprice": pa.array([100.004, 100.004, 100.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
        }
    )
    out = window_rev_partial(batch, lo_us=lo, hi_us=hi).to_pandas()
    # hi-boundary row excluded; two rows of floor(100.004*100+0.5)=10000
    assert out["rev"].tolist() == [10000 + 10000]

    # empty window -> typed empty table (schema survives)
    empty = window_rev_partial(batch, lo_us=hi, hi_us=hi)
    assert empty.num_rows == 0 and empty.column_names == ["l_suppkey", "rev"]


def test_top_window_tie_kept(ray_session, tmp_path):
    """Two suppliers tied at max revenue must BOTH survive the equality
    filter (the Q15 ties-kept contract), end-to-end through the query."""
    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.queries_relx2 import (
        DAY_US,
        WIN_LO_DAYS,
        q_top_window_suppliers,
    )

    base = pd.Timestamp("2019-01-01").value // 1000
    inside = base + (WIN_LO_DAYS + 10) * DAY_US
    li = pa.table(
        {
            "l_suppkey": pa.array([1, 2, 3], pa.int64()),
            "l_shipdate": pa.array([inside, inside, inside], pa.timestamp("us")),
            "l_extendedprice": pa.array([50.0, 50.0, 10.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
            # min(l_shipdate) anchor: give the table an early row too
            "l_partkey": pa.array([1, 1, 1], pa.int64()),
            "l_quantity": pa.array([1.0, 1.0, 1.0], pa.float64()),
        }
    )
    anchor = pa.table(
        {
            "l_suppkey": pa.array([3], pa.int64()),
            "l_shipdate": pa.array([base], pa.timestamp("us")),
            "l_extendedprice": pa.array([1.0], pa.float64()),
            "l_discount": pa.array([0.0], pa.float64()),
            "l_partkey": pa.array([1], pa.int64()),
            "l_quantity": pa.array([1.0], pa.float64()),
        }
    )
    pq.write_table(pa.concat_tables([li, anchor]), tmp_path / "lineitem.parquet")
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["a", "b", "c"], pa.string()),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    out = (
        q_top_window_suppliers(str(tmp_path))
        .to_pandas()
        .sort_values("s_suppkey")
    )
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["rev_cents"].tolist() == [5000, 5000]


# --- promo_revenue_disjunct (Q19) --------------------------------------------


def test_promo_arm_partial_matches_bruteforce(ray_session):
    """The vectorized OR-of-ANDs equals a per-row Python evaluation."""
    import ray

    from khl_pdf_ocr_ray.pipelines.queries_relx2 import (
        PROMO_ARMS,
        promo_arm_partial,
    )

    rs = np.random.RandomState(7)
    n_parts = 60
    brands = np.array(
        [arm[0] for arm in PROMO_ARMS] + ["Brand#99"], dtype=object
    )
    brand_arr = brands[rs.randint(0, len(brands), n_parts)]
    size_arr = rs.randint(1, 51, n_parts).astype(np.int64)
    dims_ref = ray.put((brand_arr, size_arr))

    n = 500
    pk = rs.randint(0, n_parts, n).astype(np.int64)
    qty = rs.randint(1, 51, n).astype(np.float64)
    ext = rs.uniform(1, 100, n)
    disc = rs.uniform(0, 0.1, n)
    batch = _t(
        pd.DataFrame(
            {
                "l_partkey": pk,
                "l_quantity": qty,
                "l_extendedprice": ext,
                "l_discount": disc,
            }
        )
    )
    out = (
        promo_arm_partial(batch, dims_ref)
        .to_pandas()
        .set_index("arm")["n_lines"]
        .to_dict()
    )
    want = {}
    for i in range(n):
        for arm_id, (brand, slo, shi, qlo, qhi) in enumerate(PROMO_ARMS):
            if (
                brand_arr[pk[i]] == brand
                and slo <= size_arr[pk[i]] <= shi
                and qlo <= qty[i] <= qhi
            ):
                want[arm_id] = want.get(arm_id, 0) + 1
    assert out == want


# --- lang_ess ----------------------------------------------------------------


def test_ess_uniform_weights_is_1000_and_skew_shrinks():
    from khl_pdf_ocr_ray.pipelines.queries_ess import ess_finalize, ess_partial

    uniform = _t(
        pd.DataFrame({"lang": ["en"] * 10, "n_chars": np.int64([7] * 10)})
    )
    p = ess_partial(uniform)
    out = ess_finalize(p).to_pandas()
    assert out["ess_permille"].tolist() == [1000]
    assert out["n_docs"].tolist() == [10]

    # one dominating weight: ESS collapses toward 1/n
    skew = _t(
        pd.DataFrame(
            {"lang": ["en"] * 10, "n_chars": np.int64([1] * 9 + [10000])}
        )
    )
    out2 = ess_finalize(ess_partial(skew)).to_pandas()
    assert out2["ess_permille"].iloc[0] < 150

    # w <= 0 rows are excluded from n and the sums
    zeros = _t(
        pd.DataFrame({"lang": ["en"] * 4, "n_chars": np.int64([5, 5, 0, 0])})
    )
    out3 = ess_finalize(ess_partial(zeros)).to_pandas()
    assert out3["n_docs"].tolist() == [2]
    assert out3["ess_permille"].tolist() == [1000]


def test_ess_finalize_square_is_arbitrary_precision():
    """(sum_w)^2 past int64 must not overflow in the finalize."""
    import pyarrow as pa_

    from khl_pdf_ocr_ray.pipelines.queries_ess import ess_finalize

    big = 4 * 10**9  # big^2 = 1.6e19 > 2^63
    t = pa_.table(
        {
            "lang": pa_.array(["en"], pa_.string()),
            "sum_w": pa_.array([big], pa_.int64()),
            "sum_w2": pa_.array([big], pa_.int64()),
            "n": pa_.array([big], pa_.int64()),
        }
    )
    out = ess_finalize(t).to_pandas()
    # all weights 1: ESS/n = 1
    assert out["ess_permille"].tolist() == [1000]


# --- user_modal_event --------------------------------------------------------


def test_modal_pack_tiebreak_smallest_type(ray_session):
    """Equal counts resolve to the lexicographically smallest type via
    Max over the rank-complement pack."""
    import ray

    from khl_pdf_ocr_ray.pipelines.queries_modal import (
        modal_decode,
        modal_pack,
    )

    types = ["click", "view"]
    types_ref = ray.put({t: i for i, t in enumerate(types)})
    names_ref = ray.put(types)
    cells = _t(
        pd.DataFrame(
            {
                "user_id": np.int64([1, 1]),
                "event_type": ["view", "click"],
                "n": np.int64([3, 3]),
            }
        )
    )
    packed = modal_pack(cells, types_ref).to_pandas()
    win = packed.loc[packed["packed"].idxmax()]
    out = modal_decode(
        _t(pd.DataFrame({"user_id": [1], "packed": [win["packed"]]})), names_ref
    ).to_pandas()
    assert out["modal_type"].tolist() == ["click"]
    assert out["n_events"].tolist() == [3]


def test_user_type_cells_merge_and_pack_bound(ray_session):
    import ray

    from khl_pdf_ocr_ray.pipelines.queries_modal import (
        modal_pack,
        user_type_cells,
    )

    b = _t(
        pd.DataFrame(
            {
                "user_id": np.int64([1, 1, 2]),
                "event_type": ["x", "x", "y"],
            }
        )
    )
    cells = user_type_cells(b).to_pandas()
    assert cells.set_index(["user_id", "event_type"])["n"].to_dict() == {
        (1, "x"): 2,
        (2, "y"): 1,
    }

    types_ref = ray.put({"x": 0})
    huge = _t(
        pd.DataFrame(
            {"user_id": np.int64([1]), "event_type": ["x"], "n": np.int64([1 << 39])}
        )
    )
    with pytest.raises(AssertionError, match="widen pack"):
        modal_pack(huge, types_ref)


# --- source_overlap_matrix ---------------------------------------------------


def test_source_overlap_exact_jaccard_and_zero_pairs(ray_session, tmp_path):
    """Inclusion-exclusion Jaccard matches brute force; zero-overlap
    pairs are absent from the output."""
    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.queries_srcoverlap import (
        q_source_overlap_matrix,
    )

    docs = {
        "a": ["w1 w2 w3 w4", "w2 w3 w4"],   # trigrams {123, 234}
        "b": ["w1 w2 w3"],                   # {123} -> a∩b = {123}
        "c": ["x1 x2 x3 x4"],                # disjoint from a and b
    }
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    i = 0
    for s, texts in docs.items():
        for t in texts:
            rows["doc_id"].append(i)
            rows["text"].append(t)
            rows["lang"].append("en")
            rows["source"].append(s)
            rows["n_chars"].append(len(t))
            i += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "text": pa.array(rows["text"], pa.string()),
                "lang": pa.array(rows["lang"], pa.string()),
                "source": pa.array(rows["source"], pa.string()),
                "n_chars": pa.array(rows["n_chars"], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = q_source_overlap_matrix(str(tmp_path)).to_pandas()
    assert len(out) == 1  # only (a, b) overlaps; c-pairs absent
    r = out.iloc[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    # a = {123, 234}, b = {123}: common 1, union 2 -> 500 permille
    assert (r["n_common"], r["n_a"], r["n_b"]) == (1, 2, 1)
    assert r["jaccard_permille"] == 500


# --- vocab_growth (Heaps) ----------------------------------------------------


def test_vocab_growth_first_occurrence_and_bands(ray_session, tmp_path):
    """The curve counts each trigram type ONCE, at its first doc_id's
    bit-length band; repeats later never re-count."""
    import pyarrow.parquet as pq

    from khl_pdf_ocr_ray.pipelines.queries_heaps import q_vocab_growth

    # doc 0 (band 1): type A; docs 1-2 (band 2): A again + type B;
    # docs 3-6 (band 3): B again + type C
    texts = {0: "a a a a", 1: "a a a", 2: "b b b", 3: "b b b", 6: "c c c"}
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts.values()], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = q_vocab_growth(str(tmp_path))
    assert out["bucket"].tolist() == [1, 2, 3]
    assert out["n_new_types"].tolist() == [1, 1, 1]  # a a a / b b b / c c c
    assert out["cum_types"].tolist() == [1, 2, 3]


def test_bit_length_bands_match_python():
    import numpy as np

    from khl_pdf_ocr_ray.pipelines.queries_budget import bit_length_i64

    vals = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 2**62], dtype=np.int64)
    assert bit_length_i64(vals).tolist() == [int(v).bit_length() for v in vals]


# --- shard_resize_moves (HRW) ------------------------------------------------


def test_hrw_moves_only_to_new_shard_and_bounded_fraction():
    """The rendezvous-hashing invariant: every moved key lands on the
    NEW shard; the moved fraction is near 1/(K_OLD+1)."""
    from khl_pdf_ocr_ray.pipelines.queries_hrw import (
        K_NEW,
        K_OLD,
        resize_cells,
    )

    n = 20000
    batch = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    cells = resize_cells(batch).to_pandas()
    moved = cells[cells["old_shard"] != cells["new_shard"]]
    assert (moved["new_shard"] == K_NEW - 1).all()  # only INTO the new shard
    frac = moved["n_docs"].sum() / n
    assert 0.7 / K_NEW < frac < 1.3 / K_NEW  # ~1/9 of keys move
    # balance: every old shard holds a reasonable share
    per_old = cells.groupby("old_shard")["n_docs"].sum()
    assert len(per_old) == K_OLD
    assert per_old.min() > 0.6 * n / K_OLD


def test_hrw_weights_match_sql_arithmetic():
    """numpy uint64-wraparound weights == DuckDB HUGEINT modular math."""
    import duckdb

    from khl_pdf_ocr_ray.pipelines.queries_hrw import (
        HRW_A,
        HRW_B,
        hrw_weights,
    )

    d = np.array([0, 1, 17, 2**31 - 1, 2**40 + 123], dtype=np.int64)
    for shard in (0, 3, 8):
        want = duckdb.sql(
            f"""
            WITH h1 AS (SELECT CAST((CAST(x AS HUGEINT) * {HRW_A}
                   + ({shard} + 1) * {HRW_B}) % 4294967296 AS BIGINT) AS h
              FROM (SELECT unnest({list(map(int, d))}) AS x)),
            h2 AS (SELECT xor(h, h // 65536) AS h FROM h1),
            h3 AS (SELECT CAST((CAST(h AS HUGEINT) * {HRW_A})
                   % 4294967296 AS BIGINT) AS h FROM h2)
            SELECT xor(h, h // 8192) AS w FROM h3
            """
        ).fetchnumpy()["w"]
        assert hrw_weights(d, shard).astype(np.int64).tolist() == want.tolist()


# --- user_longest_streak -----------------------------------------------------


def test_streak_fold_islands_and_tie_order():
    """Run lengths follow (ts, event_id) order; interleaving breaks runs."""
    from khl_pdf_ocr_ray.pipelines.queries_streak import user_streak_fold

    g = pd.DataFrame(
        {
            "user_id": np.int64([1] * 6),
            "event_id": np.int64([10, 11, 12, 13, 14, 15]),
            "ts": np.int64([1, 2, 3, 3, 4, 5]),  # tie at ts=3 -> event_id order
            "event_type": ["a", "a", "b", "a", "a", "a"],
        }
    )
    out = user_streak_fold(g)
    # order: a a b a a a -> best streak 3
    assert out["max_streak"].tolist() == [3]

    # single island
    g2 = g.assign(event_type=["x"] * 6)
    assert user_streak_fold(g2)["max_streak"].tolist() == [6]


# --- source_kl_drift ---------------------------------------------------------


def test_kl_zero_for_identical_and_positive_for_skewed():
    """KL(P||P) == 0 exactly in fixed point; a diverging source > 0."""
    from khl_pdf_ocr_ray.pipelines.queries_kl import kl_from_counts

    # one source == corpus: KL must be exactly zero
    r1 = kl_from_counts(
        pd.DataFrame(
            {"source": ["s"] * 2, "term": ["a", "b"], "n": np.int64([3, 1])}
        )
    )
    assert r1["kl_fx"].tolist() == [0] and r1["kl_micro"].tolist() == [0]

    # two sources with different mixes: both diverge from the blend
    r2 = kl_from_counts(
        pd.DataFrame(
            {
                "source": ["x", "x", "y"],
                "term": ["a", "b", "b"],
                "n": np.int64([9, 1, 10]),
            }
        )
    ).set_index("source")
    assert r2.loc["x", "kl_fx"] > 0 and r2.loc["y", "kl_fx"] > 0
    # y only emits 'b' (corpus p(b)=11/20): KL_y = log2(20/11) exactly
    import numpy as np_

    want = int(np_.floor(np_.log2(1.0) * (1 << 20) + 0.5)) - int(
        np_.floor(np_.log2(11 / 20) * (1 << 20) + 0.5)
    )
    assert int(r2.loc["y", "kl_fx"]) == 10 * want


# --- rolling_median5 ---------------------------------------------------------


def test_rollmed_fold_exact_and_outlier_robust():
    from khl_pdf_ocr_ray.pipelines.queries_rollmed import (
        WIN,
        user_rollmed_fold,
    )

    assert WIN % 2 == 1  # the exactness contract: odd window only
    v = [10, 20, 30, 40, 1000000, 50, 60]  # one spike
    g = pd.DataFrame(
        {
            "user_id": np.int64([1] * len(v)),
            "event_id": np.int64(range(len(v))),
            "ts": np.int64(range(len(v))),
            "v": np.int64(v),
        }
    )
    out = user_rollmed_fold(g)
    # windows: [10,20,30,40,1e6]->30, [20,30,40,1e6,50]->40,
    # [30,40,1e6,50,60]->50 — the spike never surfaces
    assert out["med_x1000"].tolist() == [30, 40, 50]
    assert out["event_id"].tolist() == [4, 5, 6]

    # fewer than WIN events -> no output rows
    assert len(user_rollmed_fold(g.head(4))) == 0


# --- doc_skyline -------------------------------------------------------------


def test_skyline_filter_matches_bruteforce_with_ties():
    from khl_pdf_ocr_ray.pipelines.queries_skyline import skyline_filter

    rs = np.random.RandomState(11)
    for trial in range(20):
        n = 200
        x = rs.randint(0, 30, n).astype(np.int64)  # small domain -> many ties
        y = rs.randint(0, 30, n).astype(np.int64)
        keep = set(skyline_filter(x, y).tolist())
        want = set()
        for i in range(n):
            dominated = any(
                x[j] >= x[i]
                and y[j] >= y[i]
                and (x[j] > x[i] or y[j] > y[i])
                for j in range(n)
            )
            if not dominated:
                want.add(i)
        assert keep == want


def test_skyline_merge_property():
    """skyline(union of local skylines) == skyline(all) — the property
    the distributed plan rests on."""
    from khl_pdf_ocr_ray.pipelines.queries_skyline import skyline_filter

    rs = np.random.RandomState(5)
    x = rs.randint(0, 1000, 500).astype(np.int64)
    y = (1000 - x + rs.randint(-50, 50, 500)).astype(np.int64)  # anti-corr
    full = set(skyline_filter(x, y).tolist())
    merged_ids = []
    for s in (slice(0, 200), slice(200, 350), slice(350, 500)):
        idx = skyline_filter(x[s], y[s])
        merged_ids.extend(np.arange(*s.indices(500))[idx].tolist())
    m = np.array(sorted(merged_ids), dtype=np.int64)
    final = {int(v) for v in m[skyline_filter(x[m], y[m])]}
    assert final == full


# --- sample_error_eval -------------------------------------------------------


def test_sample_estimator_residue_and_scaling():
    from khl_pdf_ocr_ray.pipelines.queries_sampleval import (
        KNUTH,
        SAMPLE_RATE,
        _THRESH,
        sample_count_partial,
        sample_eval_finalize,
    )

    n = 50000
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    p = sample_count_partial(batch).to_pandas()
    # the residue sample over a dense id range lands near 1/RATE
    frac = p["n_sampled"].iloc[0] / n
    assert 0.8 / SAMPLE_RATE < frac < 1.2 / SAMPLE_RATE
    # membership matches the scalar arithmetic exactly
    want7 = ((7 * KNUTH) % (1 << 32)) < _THRESH
    p7 = sample_count_partial(batch.slice(7, 1)).to_pandas()
    assert bool(p7["n_sampled"].iloc[0]) == want7

    out = sample_eval_finalize(
        pa.Table.from_pandas(p, preserve_index=False)
    ).to_pandas()
    assert out["n_est"].iloc[0] == out["n_sampled"].iloc[0] * SAMPLE_RATE
    assert out["err_permille"].iloc[0] < 200


# --- linear_attribution ------------------------------------------------------


def test_attrib_fold_largest_remainder_and_window():
    from khl_pdf_ocr_ray.pipelines.queries_attrib import (
        ATTRIB_WINDOW_US,
        user_attrib_fold,
    )

    H = ATTRIB_WINDOW_US
    # clicks at t=0,10,20; purchase at t=25: 3 clicks -> 333 each, the
    # remainder milli-credit goes to the MOST RECENT click (t=20)
    g = pd.DataFrame(
        {
            "user_id": np.int64([1] * 4),
            "event_id": np.int64([100, 101, 102, 200]),
            "ts": np.int64([0, 10, 20, 25]),
            "is_purchase": np.int64([0, 0, 0, 1]),
        }
    )
    out = user_attrib_fold(g).set_index("event_id")["credits_milli"]
    assert out.to_dict() == {100: 333, 101: 333, 102: 334}

    # window edges: click exactly at pts excluded; click exactly at
    # pts - WINDOW included
    g2 = pd.DataFrame(
        {
            "user_id": np.int64([1] * 3),
            "event_id": np.int64([100, 101, 200]),
            "ts": np.int64([0, H, H]),  # click@0 = pts-H, click@H = pts
            "is_purchase": np.int64([0, 0, 1]),
        }
    )
    out2 = user_attrib_fold(g2).set_index("event_id")["credits_milli"]
    assert out2.to_dict() == {100: 1000}

    # purchase with no preceding click emits nothing
    g3 = pd.DataFrame(
        {
            "user_id": np.int64([1]),
            "event_id": np.int64([200]),
            "ts": np.int64([5]),
            "is_purchase": np.int64([1]),
        }
    )
    assert len(user_attrib_fold(g3)) == 0


# --- seasonal_backtest -------------------------------------------------------


def test_backtest_fold_zero_fill_and_exact_mae():
    from khl_pdf_ocr_ray.pipelines.queries_backtest import backtest_fold

    # days 0..9 present except day 5 (zero-filled); volumes 10 except
    # day 3 spike 20
    counts = pd.DataFrame(
        {
            "day": np.int64([0, 1, 2, 3, 4, 6, 7, 8, 9]),
            "n": np.int64([10, 10, 10, 20, 10, 10, 10, 10, 10]),
        }
    )
    out = backtest_fold(counts, lags=(1, 7)).set_index("lag")
    # lag-1 errors over 9 transitions: |10-10|x2, |20-10|, |10-20|,
    # |0-10| (zero-filled day 5), |10-0|, then zeros: sae = 40
    assert out.loc[1, "sae"] == 40 and out.loc[1, "n_days"] == 9
    assert out.loc[1, "mae_milli"] == 1000 * 40 // 9
    assert out.loc[1, "n_exact"] == 5
    # lag-7: pairs (7,0),(8,1),(9,2): all 10 vs 10 -> perfect
    assert out.loc[7, "sae"] == 0 and out.loc[7, "n_exact"] == 3

    import pytest as _pt

    with _pt.raises(AssertionError, match="lag 7 >= series"):
        backtest_fold(counts.head(3), lags=(7,))
