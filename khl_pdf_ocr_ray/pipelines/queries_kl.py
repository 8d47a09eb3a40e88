"""Per-source unigram KL divergence from the corpus distribution.

``source_kl_drift``: for every source, the Kullback-Leibler divergence
KL(P_source || P_corpus) over the whitespace-token unigram
distributions, in exact fixed-point integers — the drift report a
mixing plan reads to find sources whose language diverges from the
blend (high KL = niche/contaminated source; ~0 = redundant with the
corpus). Terms absent from a source contribute exactly 0 (0·log 0),
and P_corpus dominates P_source by construction, so no smoothing is
needed and the sum is finite.

Exactness: per-term log-probs are the repo's shared fixed-point form
``floor(log2(c / n) * 2^20 + 0.5)`` (the unigram_logprob / CCNet
convention, queries_corpus.py:955); the divergence is the INTEGER sum
``sum_w c_s(w) * (logp_s_fx(w) - logp_corpus_fx(w))`` — no float
accumulation, so the sequential dump twin reproduces it bit-for-bit.
``kl_micro`` = floor(1e6 * kl_fx / (n_s * 2^20)) is the per-token KL
in micro-bits (Python arbitrary-precision fold).

Plan / 100 TB notes: ONE map-side (source, term) count combiner + one
(|sources| x |vocab|)-bounded Sum exchange; the rollup then folds
driver-side (the tfidf_top_terms vocabulary-bounded class — for an
open vocab, hash-bucket the term axis and fold per bucket). Documents
leave the scan only as per-batch distinct (source, term, n) partials.

Oracle: sequential dump twin (state/oracle_dump_near.py) — an
independent Counter-based pass over the raw documents.

Reference analogue: /root/reference/app.py has no corpus surface;
brief scope (training-data mixing diagnostics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QK = "khl_pdf_ocr_ray.pipelines.queries_kl"

KL_SCALE = 1 << 20  # the shared fixed-point log2 radix (LM_SCALE twin)


def src_term_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (source, term, n) count partials."""
    counts: dict = {}
    for s, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
        for w in (t or "").split(" "):
            counts[(s, w)] = counts.get((s, w), 0) + 1
    if not counts:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    ks = sorted(counts)
    return pa.table(
        {
            "source": pa.array([k[0] for k in ks], pa.string()),
            "term": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64()),
        }
    )


def logp_fx(c: int, n: int) -> int:
    """floor(log2(c/n) * 2^20 + 0.5) — the shared fixed-point form."""
    return int(np.floor(np.log2(c / n) * KL_SCALE + 0.5))


def kl_from_counts(rollup: pd.DataFrame) -> pd.DataFrame:
    """(source, term, n) rollup -> (source, n_tokens, kl_fx, kl_micro).

    Pure integer fold over the vocabulary-bounded rollup; shared by the
    driver fold and unit tests (the dump twin recomputes independently
    from raw documents)."""
    corpus: dict = {}
    for term, n in zip(rollup["term"], rollup["n"]):
        corpus[term] = corpus.get(term, 0) + int(n)
    n_corpus = sum(corpus.values())
    out = {"source": [], "n_tokens": [], "kl_fx": [], "kl_micro": []}
    for src, grp in rollup.groupby("source", sort=True):
        n_s = int(grp["n"].sum())
        kl = 0
        for term, c in zip(grp["term"], grp["n"]):
            c = int(c)
            kl += c * (logp_fx(c, n_s) - logp_fx(corpus[term], n_corpus))
        out["source"].append(src)
        out["n_tokens"].append(n_s)
        out["kl_fx"].append(kl)
        out["kl_micro"].append(1_000_000 * kl // (n_s * KL_SCALE))
    return pd.DataFrame(
        {
            "source": out["source"],
            "n_tokens": np.int64(out["n_tokens"]),
            "kl_fx": np.int64(out["kl_fx"]),
            "kl_micro": np.int64(out["kl_micro"]),
        }
    )


def q_source_kl_drift(sf_dir: str) -> pd.DataFrame:
    """(source, n_tokens, kl_fx, kl_micro) per source."""
    from ray.data.aggregate import Sum

    from .queries import _t

    rollup = (
        _t(sf_dir, "documents", ["source", "text"])
        .map_batches(
            remote_fn(_QK, "src_term_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |sources| x |vocab| rows — vocabulary-bounded
    )
    return kl_from_counts(rollup)


KL_QUERIES = {"source_kl_drift": q_source_kl_drift}
# oracle: dump-backed (state/oracle_dump_near.py source_kl_seq dump),
# added by pipelines.queries.oracles()
