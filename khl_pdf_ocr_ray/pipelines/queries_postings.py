"""Inverted-index postings compression accounting (delta + Elias-γ).

``postings_delta_stats``: per token, the exact storage cost of its
posting list under three encodings — raw fixed-width (64 bits/id),
delta-gap binary (``sum(bit_length(gap))`` over the sorted doc-id gaps,
first id stored as id+1 to stay positive), and Elias-γ
(``sum(2*bit_length(gap) - 1)``) — plus document frequency. This is the
sizing pass an index build runs BEFORE choosing a posting codec (the
phrase/keyword indexes in this repo persist postings as parquet; at
100 TB the gap histogram decides bit-packing vs varint vs γ).

Plan / 100 TB notes: documents reduce to DISTINCT (token, doc_id) pairs
map-side (per-batch dedup — a token repeated in a doc contributes one
posting), then ONE token-keyed exchange; gap math runs vectorized per
group. Group count = vocabulary. At web vocabulary (~10^7 groups) the
``map_groups`` exchange would become the measured group-count bottleneck
(BENCH round-4 notes) — the deployment path is the same kernel over a
(token, doc_id)-SORTED dataset with per-batch segment kernels and
boundary repair (allpairs_cosine's machinery); semantics identical, so
this gate-checked form is the oracle for that rewrite. Bit lengths are
integer SWAR (queries_budget.bit_length_i64) — no float log anywhere;
DuckDB twin uses length(bin(n)).

Oracle: static SQL — the same distinct pairs, lag() window for gaps,
length(bin(gap)) for bit lengths.

Reference analogue: none in /root/reference/app.py; brief scope
(similarity-search/index engineering family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..remote import remote_fn

_QP = "khl_pdf_ocr_ray.pipelines.queries_postings"


def distinct_pairs_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> distinct (token, doc_id) pairs (map-side dedup)."""
    toks: list = []
    dids: list = []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        seen = set()
        for t in (text or "").split(" "):
            if t and t not in seen:
                seen.add(t)
                toks.append(t)
                dids.append(did)
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "doc_id": pa.array(dids, pa.int64()),
        }
    )


def posting_cost_group(g: pd.DataFrame) -> pd.DataFrame:
    """One token's postings -> (token, df, raw_bits, delta_bits, gamma_bits)."""
    from .queries_budget import bit_length_i64

    ids = np.sort(g["doc_id"].to_numpy().astype(np.int64))
    gaps = np.empty(len(ids), dtype=np.int64)
    gaps[0] = ids[0] + 1  # first id stored as id+1 (strictly positive)
    gaps[1:] = ids[1:] - ids[:-1]  # distinct ids -> gaps >= 1
    bl = bit_length_i64(gaps)
    return pd.DataFrame(
        {
            "token": [g["token"].iloc[0]],
            "df": np.int64([len(ids)]),
            "raw_bits": np.int64([64 * len(ids)]),
            "delta_bits": np.int64([int(bl.sum())]),
            "gamma_bits": np.int64([int((2 * bl - 1).sum())]),
        }
    )


def q_postings_delta_stats(sf_dir: str) -> "object":
    """(token, df, raw_bits, delta_bits, gamma_bits)."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            remote_fn(_QP, "distinct_pairs_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("token")
        .map_groups(remote_fn(_QP, "posting_cost_group"), batch_format="pandas")
    )


SQL_POSTINGS_DELTA = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
pairs AS (SELECT DISTINCT doc_id, token FROM toks WHERE token <> ''),
gaps AS (
  SELECT token,
         coalesce(doc_id - lag(doc_id) OVER w, doc_id + 1) AS gap
  FROM pairs
  WINDOW w AS (PARTITION BY token ORDER BY doc_id))
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       CAST(64 * count(*) AS BIGINT) AS raw_bits,
       CAST(sum(length(bin(gap))) AS BIGINT) AS delta_bits,
       CAST(sum(2 * length(bin(gap)) - 1) AS BIGINT) AS gamma_bits
FROM gaps GROUP BY token
"""

POSTINGS_QUERIES = {"postings_delta_stats": q_postings_delta_stats}
POSTINGS_ORACLES = {"postings_delta_stats": SQL_POSTINGS_DELTA}
