"""Kernel checks for the unigram-LM quality scorer
(pipelines/queries_corpus.py): count split-invariance, model determinism,
scoring batching-invariance, and the OOV floor."""

import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_corpus import (
    LM_SCALE,
    lm_count_partial,
    lm_model_from_counts,
    lm_score_batch,
)


def _batch(rows):
    ids, texts = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


ROWS = [(1, "a b a"), (2, "b c"), (3, None), (4, "a a a a")]


def test_lm_counts_split_invariant():
    whole = lm_count_partial(_batch(ROWS)).to_pandas().set_index("term")["n"]
    parts = pd.concat(
        [lm_count_partial(_batch(ROWS[:2])).to_pandas(),
         lm_count_partial(_batch(ROWS[2:])).to_pandas()]
    )
    summed = parts.groupby("term")["n"].sum()
    pd.testing.assert_series_equal(
        whole.sort_index(), summed.sort_index(), check_names=False
    )
    # null text tokenizes like '' (one empty token) — matches str.split(' ')
    assert whole[""] == 1


def test_lm_model_probs_sum_and_order():
    counts = lm_count_partial(_batch(ROWS)).to_pandas()
    model = lm_model_from_counts(counts)
    # the most frequent term has the least-negative logp
    assert model["a"] == max(model.values())
    # logp of a p=1 vocabulary is 0
    one = lm_model_from_counts(pd.DataFrame({"term": ["x"], "n": [5]}))
    assert one["x"] == 0


def test_lm_score_batching_invariant_and_oov_floor():
    counts = lm_count_partial(_batch(ROWS)).to_pandas()
    model = lm_model_from_counts(counts)
    whole = lm_score_batch(_batch(ROWS), model).to_pandas()
    parts = pd.concat(
        [lm_score_batch(_batch(ROWS[:1]), model).to_pandas(),
         lm_score_batch(_batch(ROWS[1:]), model).to_pandas()]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, parts)
    # scoring unseen text applies the floor: min(logp) - 2^20 per token
    oov = lm_score_batch(_batch([(9, "zz")]), model).to_pandas()
    assert int(oov.neg_logprob_fx.iloc[0]) == -(min(model.values()) - LM_SCALE)
    # scores are negative log-likelihoods: positive for any p<1 corpus
    assert (whole.neg_logprob_fx >= 0).all()


# --- DSIR importance resampling ----------------------------------------------
def test_dsir_kernels_batching_invariant_and_enrichment():
    """Counts/scores split across batches equal the single-batch run, and
    documents written in the target domain's vocabulary outweigh others."""
    import pyarrow as pa

    from khl_pdf_ocr_ray.pipelines.queries_corpus import (
        DSIR_TARGET_LANG,
        dsir_count_partial,
        dsir_model_from_counts,
        dsir_score_batch,
    )

    rows = [
        (1, DSIR_TARGET_LANG, "alpha beta gamma alpha beta"),
        (2, DSIR_TARGET_LANG, "alpha beta delta"),
        (3, "de", "zeta eta theta zeta"),
        (4, "de", "eta theta iota"),
    ]

    def _b(rs):
        return pa.table(
            {
                "doc_id": pa.array([r[0] for r in rs], pa.int64()),
                "lang": pa.array([r[1] for r in rs], pa.string()),
                "text": pa.array([r[2] for r in rs], pa.string()),
            }
        )

    whole = dsir_count_partial(_b(rows)).to_pandas().set_index("bucket")
    import pandas as pd

    parts = (
        pd.concat(
            [
                dsir_count_partial(_b(rows[:2])).to_pandas(),
                dsir_count_partial(_b(rows[2:])).to_pandas(),
            ]
        )
        .groupby("bucket")
        .sum()
    )
    pd.testing.assert_frame_equal(whole.sort_index(), parts.sort_index())

    ratios = dsir_model_from_counts(whole.reset_index())
    scored = dsir_score_batch(_b(rows), ratios).to_pandas().set_index("doc_id")
    # target-vocabulary docs carry higher importance weights
    assert scored.loc[1, "logw_fx"] > scored.loc[3, "logw_fx"]
    assert scored.loc[2, "logw_fx"] > scored.loc[4, "logw_fx"]
    # n_feats = unigrams + bigrams
    assert int(scored.loc[1, "n_feats"]) == 5 + 4


# --- distributed-trained domain classifier ------------------------------------
def test_lr_gradient_batching_invariant():
    """Gradient combiner split across batches sums to the single-batch
    gradient exactly (contributions floor to int64 before summation)."""
    import pandas as pd
    import pyarrow as pa

    from khl_pdf_ocr_ray.pipelines.queries_corpus import (
        DSIR_B,
        lr_grad_partial,
        lr_train_input,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(9)), pa.int64()),
            "text": pa.array([f"w{i} common word soup here" for i in range(9)]),
        }
    )
    train = lr_train_input(docs)
    w = [7] * DSIR_B
    whole = (
        lr_grad_partial(train, w, 3).to_pandas().set_index("bucket").sort_index()
    )
    parts = (
        pd.concat(
            [
                lr_grad_partial(train.slice(0, 4), w, 3).to_pandas(),
                lr_grad_partial(train.slice(4), w, 3).to_pandas(),
            ]
        )
        .groupby("bucket")
        .sum()
        .sort_index()
    )
    # the gradient itself is exactly batching-invariant; n is only
    # meaningful on the bias row (a bucket's n counts just the batches
    # where it appeared — lr_update documents and relies on this)
    pd.testing.assert_series_equal(whole["g_fx"], parts["g_fx"])
    assert int(whole.loc[-1, "n"]) == int(parts.loc[-1, "n"]) == len(train)


def test_domain_classifier_learns_planted_signal(ray_session, sf_smoke_dir):
    """The distributed training loop converges: train accuracy 1.0 on the
    planted marker signal, and the bias row's n equals the corpus size."""
    from khl_pdf_ocr_ray.pipelines.queries_corpus import q_domain_classifier

    df = q_domain_classifier(sf_smoke_dir).to_pandas()
    assert (df["pred_target"].astype(int) == df["y"]).all()


def test_ccnet_offsets_split_run():
    """A tag run whose rows split across two part-batches emits two
    (bkey, lang) partial rows; the fold must keep the run-START offset
    (a plain assignment would shift every rank in the run)."""
    import pandas as pd

    from khl_pdf_ocr_ray.pipelines.queries_corpus import ccnet_offsets

    parts = pd.DataFrame(
        {
            "bkey": ["b1", "b1", "b1", "b2"],
            "lang": ["en", "en", "de", "en"],
            "n": [4, 3, 2, 5],
        }
    ).sort_values("bkey")
    offsets, totals = ccnet_offsets(parts)
    assert offsets["b1|en"] == 0          # run start, NOT 4
    assert offsets["b1|de"] == 0
    assert offsets["b2|en"] == 7          # 4 + 3 accumulated
    assert totals == {"en": 12, "de": 2}


# --- bigram LM ---------------------------------------------------------------

from khl_pdf_ocr_ray.pipelines.queries_corpus import (  # noqa: E402
    lm2_count_partial,
    lm2_model_from_counts,
    lm2_score_batch,
)


def test_lm2_counts_split_invariant():
    whole = (
        lm2_count_partial(_batch(ROWS))
        .to_pandas()
        .groupby(["w1", "w2"])["n"]
        .sum()
    )
    parts = pd.concat(
        [lm2_count_partial(_batch(ROWS[:2])).to_pandas(),
         lm2_count_partial(_batch(ROWS[2:])).to_pandas()]
    )
    summed = parts.groupby(["w1", "w2"])["n"].sum()
    pd.testing.assert_series_equal(
        whole.sort_index(), summed.sort_index(), check_names=False
    )
    # empty tokens are filtered (an LM has no empty token): None text
    # contributes nothing, unlike the unigram counter
    assert ("", "") not in whole.index


def test_lm2_model_addone_and_score():
    counts = lm2_count_partial(_batch(ROWS)).to_pandas()
    model, ctx_fx, oov_fx = lm2_model_from_counts(counts)
    # corpus: "a b a", "b c", None, "a a a a" -> vocab {a, b, c} (V=3)
    # contexts: a -> {b:1, a:3}, b -> {a:1, c:1}
    import math

    def fx(p):
        return int(math.floor(math.log2(p) * LM_SCALE + 0.5))

    assert model["a b"] == fx((1 + 1) / (4 + 3))
    assert model["a a"] == fx((3 + 1) / (4 + 3))
    assert model["b c"] == fx((1 + 1) / (2 + 3))
    assert ctx_fx["a"] == fx(1 / (4 + 3))
    assert oov_fx == fx(1 / 3)

    whole = lm2_score_batch(_batch(ROWS), (model, ctx_fx, oov_fx)).to_pandas()
    parts = pd.concat(
        [lm2_score_batch(_batch(ROWS[:1]), (model, ctx_fx, oov_fx)).to_pandas(),
         lm2_score_batch(_batch(ROWS[1:]), (model, ctx_fx, oov_fx)).to_pandas()]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, parts)
    by_id = whole.set_index("doc_id")
    assert by_id.loc[3, "n_bigrams"] == 0 and by_id.loc[3, "nll2_fx"] == 0
    assert by_id.loc[1, "nll2_fx"] == -(model["a b"] + model["b a"])
    # unseen pair with seen context falls to the context floor; unseen
    # context falls to 1/V
    probe = _batch([(9, "c a"), (10, "zzz q")])
    out = lm2_score_batch(probe, (model, ctx_fx, oov_fx)).to_pandas()
    got = out.set_index("doc_id")["nll2_fx"]
    assert got[9] == -oov_fx        # 'c' never a context
    assert got[10] == -oov_fx       # 'zzz' unseen entirely
