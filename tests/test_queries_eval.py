"""Kernel tests for pipelines/queries_eval.py (no Ray needed): exact
AUC tie handling, shard hash packing, EWMA candidate superset +
weights, and batching-invariance of the generic global-rank tagging."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from khl_pdf_ocr_ray.pipelines.queries_eval import (
    AUC_SCALE,
    EWMA_WINDOW,
    SHARD_K,
    SHARD_MOD,
    SHARD_PACK,
    auc_partial,
    curr_assign_batch,
    curr_offsets,
    curr_part_partial,
    curr_tag_batch,
    ewma_candidates,
    ewma_per_user,
    shard_finalize,
    shard_partial,
)


def _brute_auc_x1e6(scores, labels):
    """All-pairs AUC: (wins + ties/2) / (n_pos*n_neg), floor-scaled the
    same way as the operator (2U * SCALE // (2 * np * nn))."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    two_u = 0
    for p in pos:
        for n in neg:
            two_u += 2 if p > n else (1 if p == n else 0)
    return two_u * AUC_SCALE // (2 * len(pos) * len(neg))


def _auc_from_partials(batches):
    """Driver-side closed form over merged (score, n, n_pos) partials —
    the same math as q_score_auc without Ray."""
    merged = {}
    for b in batches:
        t = auc_partial(b)
        for s, n, np_ in zip(
            t["score"].to_pylist(), t["n"].to_pylist(), t["n_pos"].to_pylist()
        ):
            cn, cp = merged.get(s, (0, 0))
            merged[s] = (cn + n, cp + np_)
    n_pos = sum(p for _, p in merged.values())
    n_neg = sum(n for n, _ in merged.values()) - n_pos
    two_ranksum, cum_less = 0, 0
    for s in sorted(merged):
        n, p = merged[s]
        two_ranksum += p * (2 * cum_less + n + 1)
        cum_less += n
    return (two_ranksum - n_pos * (n_pos + 1)) * AUC_SCALE // (2 * n_pos * n_neg)


def _doc_batch(langs, n_chars):
    return pa.table(
        {"lang": pa.array(langs, pa.string()),
         "n_chars": pa.array(n_chars, pa.int64())}
    )


class TestAuc:
    def test_ties_average_rank(self):
        # heavy ties: 3 pos and 3 neg all at score 5 -> AUC exactly 0.5
        b = _doc_batch(["en"] * 3 + ["de"] * 3, [5] * 6)
        assert _auc_from_partials([b]) == AUC_SCALE // 2

    def test_perfect_and_inverted(self):
        b = _doc_batch(["en", "en", "de", "de"], [10, 9, 2, 1])
        assert _auc_from_partials([b]) == AUC_SCALE
        b = _doc_batch(["en", "en", "de", "de"], [1, 2, 9, 10])
        assert _auc_from_partials([b]) == 0

    def test_matches_all_pairs_brute_force(self):
        rng = np.random.default_rng(7)
        scores = rng.integers(0, 12, size=60).tolist()
        labels = (rng.random(60) < 0.4).tolist()
        if not any(labels) or all(labels):
            labels[0], labels[1] = True, False
        langs = ["en" if y else "fr" for y in labels]
        want = _brute_auc_x1e6(scores, labels)
        # split into 3 ragged batches: partial merge must not matter
        bs = [
            _doc_batch(langs[:17], scores[:17]),
            _doc_batch(langs[17:40], scores[17:40]),
            _doc_batch(langs[40:], scores[40:]),
        ]
        assert _auc_from_partials(bs) == want


class TestShards:
    def test_partial_then_finalize_matches_brute_force(self):
        from khl_pdf_ocr_ray.pipelines.queries_window import RESAMPLE_MULT

        rng = np.random.default_rng(3)
        doc_id = rng.integers(0, 10_000, size=500).astype(np.int64)
        doc_id = np.unique(doc_id)
        n_chars = rng.integers(1, 999, size=len(doc_id)).astype(np.int64)
        b = pa.table({"doc_id": pa.array(doc_id), "n_chars": pa.array(n_chars)})
        got = shard_finalize(shard_partial(b)).to_pandas().set_index("shard_id")

        pos_h = ((doc_id % 2147483647) * RESAMPLE_MULT) % SHARD_MOD
        shard = pos_h % SHARD_K
        for s in np.unique(shard):
            m = shard == s
            assert got.loc[s, "n_docs"] == int(m.sum())
            assert got.loc[s, "n_chars"] == int(n_chars[m].sum())
            packed = pos_h[m] * SHARD_PACK + doc_id[m]
            assert got.loc[s, "first_doc_id"] == int(packed.min() % SHARD_PACK)

    def test_min_packed_breaks_hash_ties_by_doc_id(self):
        # two ids in the same shard with equal pos_h must pick smaller id
        b = pa.table(
            {"doc_id": pa.array([7, 7 + 0], pa.int64()),
             "n_chars": pa.array([1, 1], pa.int64())}
        )
        out = shard_finalize(shard_partial(b)).to_pandas()
        assert int(out["first_doc_id"].iloc[0]) == 7


def _event_batch(user, ts_us, eid, val):
    return pa.table(
        {
            "user_id": pa.array(user, pa.int64()),
            "ts": pa.array(np.array(ts_us, dtype="datetime64[us]")),
            "event_id": pa.array(eid, pa.int64()),
            "value": pa.array(val, pa.float64()),
        }
    )


class TestEwma:
    def test_candidates_keep_latest_16_per_user(self):
        n = 50
        b = _event_batch(
            [1] * n, list(range(n)), list(range(n)), [1.0] * n
        )
        out = ewma_candidates(b)
        assert len(out) == EWMA_WINDOW
        assert sorted(out["ts_us"].to_pylist()) == list(range(n - 16, n))

    def test_split_batches_superset_then_exact(self):
        # a user's stream split across batches: merging per-batch
        # candidates and re-reducing equals the single-batch answer
        rng = np.random.default_rng(11)
        n = 40
        ts = rng.permutation(n).tolist()
        b_all = _event_batch([5] * n, ts, list(range(n)), [float(i) for i in range(n)])
        whole = ewma_per_user(ewma_candidates(b_all).to_pandas())

        parts = [
            ewma_candidates(_event_batch([5] * 13, ts[:13], list(range(13)),
                                         [float(i) for i in range(13)])),
            ewma_candidates(_event_batch([5] * (n - 13), ts[13:],
                                         list(range(13, n)),
                                         [float(i) for i in range(13, n)])),
        ]
        merged = pd.concat([p.to_pandas() for p in parts])
        split = ewma_per_user(merged)
        pd.testing.assert_frame_equal(
            whole.reset_index(drop=True), split.reset_index(drop=True)
        )

    def test_weights_are_binary_decay(self):
        # 3 events -> weights 2^15, 2^14, 2^13 (latest heaviest)
        b = _event_batch([2, 2, 2], [10, 20, 30], [1, 2, 3],
                         [1.0, 2.0, 3.0])
        out = ewma_per_user(ewma_candidates(b).to_pandas())
        num = 300 * (1 << 15) + 200 * (1 << 14) + 100 * (1 << 13)
        den = (1 << 15) + (1 << 14) + (1 << 13)
        assert int(out["ewma_num"].iloc[0]) == num
        assert int(out["ewma_den"].iloc[0]) == den
        assert int(out["n_recent"].iloc[0]) == 3


class TestGlobalRank:
    @pytest.mark.parametrize("cuts", [[], [1], [7], [3, 9], [1, 2, 3, 4]])
    def test_rank_is_batching_invariant(self, cuts):
        # a globally sorted frame chopped at arbitrary block boundaries
        # must produce the same per-part ranks as pandas groupby.cumcount
        df = pd.DataFrame(
            {
                "source": ["a", "a", "a", "b", "b", "b", "b", "c", "c", "c",
                           "c", "c"],
                "neg_len": [1, 2, 2, 1, 1, 3, 9, 2, 4, 4, 4, 8],
                "doc_id": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
            }
        )  # already sorted by (source, neg_len, doc_id)
        bounds = [0] + cuts + [len(df)]
        tagged = []
        for lo, hi in zip(bounds, bounds[1:]):
            if hi > lo:
                tagged.append(
                    curr_tag_batch(
                        pa.Table.from_pandas(df.iloc[lo:hi]),
                        part_col="source",
                        key_cols=["source", "neg_len", "doc_id"],
                    )
                )
        partials = pd.concat(
            [curr_part_partial(t, "source").to_pandas() for t in tagged]
        ).sort_values("bkey")
        offsets = curr_offsets(partials)
        out = pd.concat(
            [
                curr_assign_batch(t, "source", offsets, "rnk").to_pandas()
                for t in tagged
            ]
        ).sort_values("doc_id")
        want = df.groupby("source").cumcount().to_numpy() + 1
        assert (out["rnk"].to_numpy() == want).all()

    def test_rerun_of_partials_with_rechunked_batches(self):
        # the part pass may re-batch the tagged output differently: the
        # setdefault offset fold must keep the run-START offset
        df = pd.DataFrame(
            {
                "source": ["a"] * 6,
                "neg_len": [1, 2, 3, 4, 5, 6],
                "doc_id": [0, 1, 2, 3, 4, 5],
            }
        )
        t = curr_tag_batch(
            pa.Table.from_pandas(df), "source",
            ["source", "neg_len", "doc_id"],
        )
        # one tag run, partials computed over two chunks of the SAME run
        p1 = curr_part_partial(t.slice(0, 2), "source").to_pandas()
        p2 = curr_part_partial(t.slice(2), "source").to_pandas()
        offsets = curr_offsets(pd.concat([p1, p2]).sort_values("bkey"))
        out = curr_assign_batch(t, "source", offsets, "rnk").to_pandas()
        assert out["rnk"].tolist() == [1, 2, 3, 4, 5, 6]


class TestTopKPerGroup:
    def test_candidates_are_superset_and_exact_after_merge(self):
        from khl_pdf_ocr_ray.pipelines.queries_eval import (
            topk_candidates,
            topk_per_type,
        )

        rng = np.random.default_rng(5)
        n = 80
        types = rng.choice(["a", "b", "c"], size=n).tolist()
        vals = (rng.integers(0, 50, size=n) / 7.0).tolist()
        b = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )
        whole = pd.concat(
            [
                topk_per_type(g)
                for _, g in topk_candidates(b).to_pandas().groupby("event_type")
            ]
        ).reset_index(drop=True)
        # split into two batches, merge candidates, re-reduce
        parts = pd.concat(
            [
                topk_candidates(b.slice(0, 31)).to_pandas(),
                topk_candidates(b.slice(31)).to_pandas(),
            ]
        )
        split = pd.concat(
            [topk_per_type(g) for _, g in parts.groupby("event_type")]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            whole.sort_values(["event_type", "rnk"]).reset_index(drop=True),
            split.sort_values(["event_type", "rnk"]).reset_index(drop=True),
        )


class TestSpanCorruption:
    def test_tokens_conserved_and_deterministic(self):
        from khl_pdf_ocr_ray.pipelines.queries_prep import span_corrupt_doc

        text = " ".join(f"w{i}" for i in range(200))
        inp, tgt, k = span_corrupt_doc(42, text)
        assert (inp, tgt, k) == span_corrupt_doc(42, text)
        assert k > 0  # 200 positions at ~6 permille-start -> spans exist
        # reconstruct: splice each sentinel's target span back in
        tgt_parts = tgt.split(" ")
        spans = {}
        cur = None
        for tok in tgt_parts:
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in inp.split(" "):
            rebuilt.extend(spans[tok] if tok.startswith("<extra_id_") else [tok])
        assert " ".join(rebuilt) == text
        assert len(spans) == k

    def test_empty_and_short_docs(self):
        from khl_pdf_ocr_ray.pipelines.queries_prep import span_corrupt_doc

        assert span_corrupt_doc(7, "") == ("", "", 0)
        inp, tgt, k = span_corrupt_doc(7, "one")
        assert inp == "one" and tgt == "" and k == 0


class TestScd2:
    def test_interval_collapse(self):
        from khl_pdf_ocr_ray.pipelines.queries_eval import (
            scd2_observe,
            scd2_per_doc,
        )

        # doc_id=2: changes at snap s where (2+s)%3==0 -> s=1 only
        b = pa.table(
            {"doc_id": pa.array([2], pa.int64()),
             "text": pa.array(["hello world"], pa.string())}
        )
        obs = scd2_observe(b).to_pandas()
        assert len(obs) == 4
        out = scd2_per_doc(obs).reset_index(drop=True)
        assert out["valid_from"].tolist() == [0, 1]
        assert out["valid_to"].tolist() == [1, -1]
        assert out["h"].nunique() == 2

    def test_never_changing_doc_is_one_open_interval(self):
        from khl_pdf_ocr_ray.pipelines.queries_eval import (
            scd2_observe,
            scd2_per_doc,
        )

        # doc_id=1: (1+s)%3==0 at s=2 -> changes once; doc_id=0 changes
        # at s=3; pick one with no change in 1..3: (d+s)%3 != 0 for all
        # s in 1..3 is impossible mod 3 — so verify the multi-change one
        b = pa.table(
            {"doc_id": pa.array([0], pa.int64()),
             "text": pa.array(["x"], pa.string())}
        )
        out = scd2_per_doc(scd2_observe(b).to_pandas()).reset_index(drop=True)
        # doc 0 changes at s=3 only -> intervals [0,3) and [3, current)
        assert out["valid_from"].tolist() == [0, 3]
        assert out["valid_to"].tolist() == [3, -1]


class TestQuantileNormalize:
    def test_single_source_is_identity_mapping(self):
        from khl_pdf_ocr_ray.pipelines.queries_eval import qn_target_rank

        n = 37
        b = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(range(n), pa.int64()),
                "rnk": pa.array(range(1, n + 1), pa.int64()),
            }
        )
        out = qn_target_rank(b, {"s": n}, n).to_pandas()
        # one source spanning the corpus: midpoint rule maps rank r -> r
        assert out["tr"].tolist() == list(range(1, n + 1))

    def test_target_ranks_stay_in_bounds_and_monotone(self):
        from khl_pdf_ocr_ray.pipelines.queries_eval import qn_target_rank

        n_total, m = 1000, 7
        b = pa.table(
            {
                "doc_id": pa.array(range(m), pa.int64()),
                "source": pa.array(["s"] * m, pa.string()),
                "n_chars": pa.array(range(m), pa.int64()),
                "rnk": pa.array(range(1, m + 1), pa.int64()),
            }
        )
        tr = qn_target_rank(b, {"s": m}, n_total).to_pandas()["tr"].tolist()
        assert all(1 <= t <= n_total for t in tr)
        assert tr == sorted(tr) and len(set(tr)) == m


class TestOlsSlope:
    def test_split_moments_match_whole_and_closed_form(self):
        from khl_pdf_ocr_ray.pipelines.queries_eval import (
            OLS_SCALE,
            ols_finalize,
            ols_moment_partial,
        )

        rng = np.random.default_rng(9)
        n = 60
        x = rng.integers(10, 500, size=n).astype(np.int64)
        words = [" ".join("w" * 1 for _ in range(max(1, xi // 10))) for xi in x]
        langs = ["en" if i % 2 == 0 else "de" for i in range(n)]
        b = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(words, pa.string()),
                "n_chars": pa.array(x, pa.int64()),
            }
        )
        whole = (
            ols_moment_partial(b)
            .to_pandas()
            .groupby("lang", as_index=False)
            .sum()
        )
        parts = pd.concat(
            [
                ols_moment_partial(b.slice(0, 23)).to_pandas(),
                ols_moment_partial(b.slice(23)).to_pandas(),
            ]
        ).groupby("lang", as_index=False).sum()
        pd.testing.assert_frame_equal(
            whole.sort_values("lang").reset_index(drop=True),
            parts.sort_values("lang").reset_index(drop=True),
        )
        out = ols_finalize(pa.Table.from_pandas(whole)).to_pandas()
        for _, row in out.iterrows():
            lg = row["lang"]
            xs = np.array([xi for xi, l in zip(x, langs) if l == lg], dtype=float)
            ys = np.array(
                [len(w.split(" ")) for w, l in zip(words, langs) if l == lg],
                dtype=float,
            )
            want = np.polyfit(xs, ys, 1)[0]
            assert abs(row["slope_x1e6"] / OLS_SCALE - want) < 1e-4
