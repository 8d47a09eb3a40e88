"""Per-source unigram distribution drift (total-variation distance).

The corpus-mixing diagnostic run before re-weighting sources: how far
each source's unigram word distribution sits from the whole-corpus
distribution, as total-variation distance — TV = (1/2) * sum_w |p_w -
q_w| — which (unlike KL) is exactly computable in integers by
cross-multiplying the count ratios:

  tv_milli_s = (1000 * sum_w |n_sw * N - n_w * n_s|) // (2 * n_s * N)

where n_sw = source-s count of word w, n_s = source token total, n_w =
corpus count of w, N = corpus token total. Tokenization is the corpus
convention: ``text.split(' ')`` with empties kept == DuckDB
``string_split(text, ' ')``.

Output: one row per source (source, n_tokens, tv_milli).

Plan / 100 TB notes: ONE corpus pass — a vectorized per-batch
(source, word) token-count combiner (Arrow split + packed-int64
np.unique, the term_chi2 kernel family) bounds the exchange at
|sources| x vocab rows per block; ONE keyed Sum; the driver folds
vocab x |sources| cells in exact Python ints (n_sw * N exceeds int64
at ~10^10 tokens; the oracle uses HUGEINT). Web-scale vocab wants the
top-M global-frequency cap the unigram_logprob operator documents —
TV over the capped vocab plus a single residual bucket.

Oracle: static SQL — the same cross-multiplied closed form over a
source x vocab grid (CROSS JOIN + LEFT JOIN fills the zero cells whose
|0 - n_w * n_s| terms TV still needs).

Reference analogue: /root/reference/app.py has no corpus-statistics
surface; brief scope (text-analysis operators over documents).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..remote import remote_fn

_QD = "khl_pdf_ocr_ray.pipelines.queries_drift"


def source_word_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (source, word, n) token-count partials."""
    text = pc.fill_null(batch["text"], "")
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks).combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    v = max(1, len(vocab))
    src = batch["source"]
    senc = pc.dictionary_encode(
        src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    )
    scodes = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sources = senc.dictionary.to_pylist()
    pair = scodes[parent] * v + codes
    up, cnt = np.unique(pair, return_counts=True)
    return pa.table(
        {
            "source": pa.array(
                [sources[int(x)] for x in up // v], pa.string()
            ),
            "word": pa.array([vocab[int(x)] for x in up % v], pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def tv_finalize(cells: pd.DataFrame) -> pd.DataFrame:
    """Aggregated (source, word, n) cells -> (source, n_tokens, tv_milli),
    exact Python ints over the vocab x |sources| grid."""
    n_sw: dict = {}
    n_s: dict = {}
    n_w: dict = {}
    for r in cells.itertuples():
        k = (r.source, r.word)
        n = int(r.n)
        n_sw[k] = n_sw.get(k, 0) + n
        n_s[r.source] = n_s.get(r.source, 0) + n
        n_w[r.word] = n_w.get(r.word, 0) + n
    big_n = sum(n_s.values())
    out_s, out_t, out_tv = [], [], []
    for s in sorted(n_s):
        ns = n_s[s]
        acc = 0
        for w, nw in n_w.items():
            nsw = n_sw.get((s, w), 0)
            acc += abs(nsw * big_n - nw * ns)
        tv = (1000 * acc) // (2 * ns * big_n) if ns and big_n else 0
        out_s.append(s)
        out_t.append(ns)
        out_tv.append(tv)
    return pd.DataFrame(
        {
            "source": out_s,
            "n_tokens": np.array(out_t, dtype=np.int64),
            "tv_milli": np.array(out_tv, dtype=np.int64),
        }
    )


def q_source_tv_drift(sf_dir: str) -> pd.DataFrame:
    """(source, n_tokens, tv_milli). See module docstring."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["source", "text"])
        .map_batches(
            remote_fn(_QD, "source_word_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source", "word"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocab x |sources| rows — vocabulary-bounded
    )
    return tv_finalize(cells)


SQL_SOURCE_TV_DRIFT = """
WITH w AS (
  SELECT source, unnest(string_split(coalesce(text, ''), ' ')) AS word
  FROM documents),
sw AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS n
  FROM w GROUP BY source, word),
s AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM sw GROUP BY source),
tw AS (SELECT word, CAST(sum(n) AS BIGINT) AS nw FROM sw GROUP BY word),
tot AS (SELECT CAST(sum(ns) AS HUGEINT) AS big_n FROM s)
SELECT s.source,
       CAST(s.ns AS BIGINT) AS n_tokens,
       CAST((1000 * sum(abs(CAST(coalesce(sw.n, 0) AS HUGEINT) * tot.big_n
                            - CAST(tw.nw AS HUGEINT) * s.ns)))
            // (2 * CAST(s.ns AS HUGEINT) * tot.big_n) AS BIGINT)
         AS tv_milli
FROM s CROSS JOIN tw CROSS JOIN tot
LEFT JOIN sw ON sw.source = s.source AND sw.word = tw.word
GROUP BY s.source, s.ns, tot.big_n
"""

DRIFT_QUERIES = {"source_tv_drift": q_source_tv_drift}
DRIFT_ORACLES = {"source_tv_drift": SQL_SOURCE_TV_DRIFT}
