"""Interpolated Kneser-Ney bigram language model (exact integers).

``bigram_kn_logprob``: per observed bigram (w1, w2), the interpolated
Kneser-Ney probability with discount D = 3/4, in the repo's 2^20
fixed-point form — computed EXACTLY:

  P_KN(w2|w1) = max(c12 - D, 0)/c1 + (D * N1+(w1 .)/c1) * N1+(. w2)/T

with c1 = sum_w c(w1, w), N1+ the distinct-continuation counts and
T = total distinct bigram types (the standard continuation unigram).
Over common denominator 4*c1*T the numerator is the integer
``max(4*c12 - 3, 0)*T + 3*N1a(w1)*N1b(w2)``, and
``floor(P * 2^20 + 0.5)`` = ``(2*num*2^20 + den) // (2*den)`` — pure
integer arithmetic end to end, so the SQL twin is bit-exact with NO
float log/exp anywhere (stronger than the add-1 bigram_logprob, which
this complements as the smoothing a real LM pipeline ships).

Plan / 100 TB notes: ONE bigram-count exchange (per-batch Counter
combiner — only distinct-bigrams-per-block rows shuffle, the
bigram_topk plan); every KN statistic (c1, N1a, N1b, T) derives from
that one count table, folded driver-side over the vocabulary-bounded
rollup in arbitrary-precision Python ints (numpy int64 would overflow
2*num*2^20 at corpus scale; the tfidf class — open vocab hash-buckets
the bigram axis and folds per bucket).

Oracle: static SQL — the same counts via the positional-array idiom
and the same HUGEINT formula.

Reference analogue: none in /root/reference/app.py; brief scope (LM /
tokenizer-prep family: unigram_logprob, bigram_logprob, perplexity).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa

from ..remote import remote_fn

_QN = "khl_pdf_ocr_ray.pipelines.queries_knlm"

KN_SCALE = 1 << 20
# D = KN_D_NUM / KN_D_DEN = 3/4, the standard fixed discount
KN_D_NUM, KN_D_DEN = 3, 4


def bigram_pair_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (w1, w2, n) combiner rows (distinct per block)."""
    c: Counter = Counter()
    for t in batch["text"].to_pylist():
        ws = (t or "").split(" ")
        for i in range(len(ws) - 1):
            c[(ws[i], ws[i + 1])] += 1
    if c:
        pairs, ns = zip(*sorted(c.items()))
        w1, w2 = zip(*pairs)
    else:
        w1, w2, ns = (), (), ()
    return pa.table(
        {
            "w1": pa.array(list(w1), pa.string()),
            "w2": pa.array(list(w2), pa.string()),
            "n": pa.array(list(ns), pa.int64()),
        }
    )


def kn_fold(counts: pd.DataFrame) -> pd.DataFrame:
    """(w1, w2, n) rollup -> (w1, w2, c12, p_fx). Pure-Python ints: the
    scaled numerator overflows int64 at corpus scale."""
    c1: dict = {}
    n1a: dict = {}
    n1b: dict = {}
    for w1, w2, n in zip(counts["w1"], counts["w2"], counts["n"]):
        c1[w1] = c1.get(w1, 0) + int(n)
        n1a[w1] = n1a.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    total_types = int(len(counts))
    out = {"w1": [], "w2": [], "c12": [], "p_fx": []}
    for w1, w2, n in zip(counts["w1"], counts["w2"], counts["n"]):
        c12 = int(n)
        num = (
            max(KN_D_DEN * c12 - KN_D_NUM, 0) * total_types
            + KN_D_NUM * n1a[w1] * n1b[w2]
        )
        den = KN_D_DEN * c1[w1] * total_types
        out["w1"].append(w1)
        out["w2"].append(w2)
        out["c12"].append(c12)
        out["p_fx"].append((2 * num * KN_SCALE + den) // (2 * den))
    return pd.DataFrame(
        {
            "w1": out["w1"],
            "w2": out["w2"],
            "c12": pd.Series(out["c12"], dtype="int64"),
            "p_fx": pd.Series(out["p_fx"], dtype="int64"),
        }
    )


def q_bigram_kn_logprob(sf_dir: str) -> pd.DataFrame:
    """(w1, w2, c12, p_fx) for every observed bigram."""
    from ray.data.aggregate import Sum

    from .queries import _t

    counts = (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QN, "bigram_pair_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocabulary^2-bounded rollup (annotated above)
    )
    return kn_fold(counts)


SQL_BIGRAM_KN = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM w, UNNEST(range(1, len(ws))) AS t(i)),
c AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
h AS (SELECT w1, sum(c12) AS c1, count(*) AS n1a FROM c GROUP BY w1),
f AS (SELECT w2, count(*) AS n1b FROM c GROUP BY w2),
tt AS (SELECT count(*) AS t FROM c)
SELECT c.w1, c.w2, CAST(c.c12 AS BIGINT) AS c12,
       CAST((2 * (greatest({KN_D_DEN} * c.c12 - {KN_D_NUM}, 0)::HUGEINT
                    * tt.t
                  + {KN_D_NUM} * h.n1a::HUGEINT * f.n1b) * {KN_SCALE}
             + {KN_D_DEN} * h.c1::HUGEINT * tt.t)
            // (2 * {KN_D_DEN} * h.c1::HUGEINT * tt.t) AS BIGINT) AS p_fx
FROM c
JOIN h ON h.w1 = c.w1
JOIN f ON f.w2 = c.w2
CROSS JOIN tt
"""

KNLM_QUERIES = {"bigram_kn_logprob": q_bigram_kn_logprob}
KNLM_ORACLES = {"bigram_kn_logprob": SQL_BIGRAM_KN}
