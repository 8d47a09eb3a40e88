"""Heaps-law vocabulary-growth curve over trigram types.

``vocab_growth``: how many NEW word-trigram types appear in each
power-of-two document-id band (bucket = bit_length(first_doc + 1)),
with the cumulative type count — the Heaps'-law curve (Heaps 1978)
a tokenizer/vocab plan reads to decide whether the corpus' type
inventory has saturated or still grows with more data. Computed over
trigram types because the synthetic corpus' unigram vocab (31 words)
saturates in the first band — trigram space is ~31^3 and keeps
growing, so the curve is non-degenerate.

Plan / 100 TB notes: the ONLY data-sized exchange is trigram-keyed:
docs explode map-side to per-batch (ng, min doc_id) partials (distinct
+ Min inside the batch), one ``groupby(ng).Min`` finds each type's
global first occurrence, a map-side combiner folds first-docs into
<= 64 bit-length bands, and the driver cumsums <= 64 rows (the
context_length_budget class). The band is an integer SWAR bit_length —
no float log; DuckDB's ``length(bin(n))`` is the same integer.

Note the ordering semantics: "growth" is over doc_id order (the
corpus' stable ingest key), not an arbitrary shard order — that is
what makes the result deterministic and oracle-checkable.

Reference analogue: /root/reference/app.py has no corpus surface;
brief scope (tokenizer-prep diagnostics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn
from .queries_budget import bit_length_i64

_QH = "khl_pdf_ocr_ray.pipelines.queries_heaps"

NG_N = 3  # word trigrams (the decontamination family's unit)


def ng_first_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> per-batch (ng, first_doc) Min partials."""
    best = {}
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = (t or "").split(" ")
        for i in range(len(ws) - (NG_N - 1)):
            ng = " ".join(ws[i : i + NG_N])
            if ng not in best or d < best[ng]:
                best[ng] = d
    if not best:
        return pa.table(
            {
                "ng": pa.array([], pa.string()),
                "first_doc": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "ng": pa.array(list(best.keys()), pa.string()),
            "first_doc": pa.array(list(best.values()), pa.int64()),
        }
    )


def growth_band_partial(batch: pa.Table) -> pa.Table:
    """(ng, first_doc) -> (bucket, n_new_types) band partials."""
    fd = batch["first_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({"bucket": pa.array(bit_length_i64(fd + 1), pa.int64())})
    g = t.group_by("bucket").aggregate([([], "count_all")])
    g = select_rename(g, bucket="bucket", n_new_types="count_all")
    return g.set_column(1, "n_new_types", g["n_new_types"].cast(pa.int64()))


def q_vocab_growth(sf_dir: str) -> pd.DataFrame:
    """(bucket, n_new_types, cum_types) ascending by bucket."""
    from ray.data.aggregate import Min, Sum

    from .queries import _t

    bands = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            remote_fn(_QH, "ng_first_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("ng")
        .aggregate(Min("first_doc", alias_name="first_doc"))
        .map_batches(
            remote_fn(_QH, "growth_band_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bucket")
        .aggregate(Sum("n_new_types", alias_name="n_new_types"))
        .to_pandas()  # <= 64 bit-length bands
        .sort_values("bucket", ignore_index=True)
    )
    bands["cum_types"] = bands["n_new_types"].cumsum().astype(np.int64)
    for c in ("bucket", "n_new_types"):
        bands[c] = bands[c].astype(np.int64)
    return bands


SQL_VOCAB_GROWTH = """
WITH u AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), ' ')) AS w,
         generate_subscripts(string_split(coalesce(text, ''), ' '), 1) AS i
  FROM documents),
t AS (
  SELECT a.w || ' ' || b.w || ' ' || c.w AS ng,
         min(a.doc_id) AS first_doc
  FROM u a
  JOIN u b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN u c ON c.doc_id = a.doc_id AND c.i = a.i + 2
  GROUP BY 1),
bands AS (
  SELECT CAST(length(bin(first_doc + 1)) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_new_types
  FROM t GROUP BY 1)
SELECT bucket, n_new_types,
       CAST(sum(n_new_types) OVER (ORDER BY bucket) AS BIGINT) AS cum_types
FROM bands ORDER BY bucket
"""

HEAPS_QUERIES = {"vocab_growth": q_vocab_growth}
HEAPS_ORACLES = {"vocab_growth": SQL_VOCAB_GROWTH}
