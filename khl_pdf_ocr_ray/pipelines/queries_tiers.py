"""Quality-tier extraction over the documents corpus (FineWeb/DCLM-style
tier bucketing — the operator this graft is named for).

Every large-scale pretraining build splits its corpus into quality
TIERS before mixing (high tier upsampled, low tier dropped or reserved
for ablations). The tier rule here composes three exact integer
signals, all shared with the certified operators:

  n_words   = space-split token count (module-wide tokenization
              contract, empties included),
  rep_milli = 1000 * max term count // n_words (top-term repetition —
              the boilerplate/spam signal),
  tier      = 2  if n_words >= TIER2_MIN_WORDS and rep_milli <= TIER2_MAX_REP
              1  elif n_words >= TIER1_MIN_WORDS and rep_milli <= TIER1_MAX_REP
              0  otherwise.

Thresholds sit inside the synthetic corpus' live range (wc 10-99,
rep 51-300 measured at sf0.01) so every tier is populated at every
test scale; real deployments re-tune them per corpus.

- ``doc_tiers`` — per-doc (doc_id, n_words, rep_milli, tier): the
  assignment itself, map-only.
- ``tier_stats`` — per-tier (tier, n_docs, sum_chars): the mixing
  weights a recipe consumes, ONE 3-group aggregate after the same map.

Plan / 100 TB notes: assignment is map-only (one vectorized pass:
token counts via Arrow split, per-doc top-term count via ONE packed
int64 np.unique — no Python loop over rows, no exchange). tier_stats
adds a combiner-backed 3-key Sum/Count. Nothing shuffles the text.

Reference analogue: /root/reference/app.py has no corpus-tiering
surface; brief scope (tier extraction — the graft's headline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QT2 = "khl_pdf_ocr_ray.pipelines.queries_tiers"

TIER2_MIN_WORDS = 40
TIER2_MAX_REP = 120
TIER1_MIN_WORDS = 20
TIER1_MAX_REP = 200


def tier_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, n_chars, n_words, rep_milli, tier),
    all int64, fully vectorized."""
    text = pc.fill_null(batch["text"], "")
    toks = pc.split_pattern(text, " ")
    n_words = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    flat = pc.list_flatten(toks).combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = max(1, len(enc.dictionary))
    # per-(doc, term) counts via one packed unique, then per-doc max
    uk, cnt = np.unique(parent * v + codes, return_counts=True)
    doc_pos = uk // v
    max_cnt = np.zeros(len(batch), dtype=np.int64)
    np.maximum.at(max_cnt, doc_pos, cnt)
    rep = 1000 * max_cnt // np.maximum(n_words, 1)
    tier = np.zeros(len(batch), dtype=np.int64)
    tier[(n_words >= TIER1_MIN_WORDS) & (rep <= TIER1_MAX_REP)] = 1
    tier[(n_words >= TIER2_MIN_WORDS) & (rep <= TIER2_MAX_REP)] = 2
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_chars": batch["n_chars"].cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "rep_milli": pa.array(rep, pa.int64()),
            "tier": pa.array(tier, pa.int64()),
        }
    )


def tier_with_text_batch(batch: pa.Table) -> pa.Table:
    """tier_batch's columns + the payload (lang, text) — the export form
    scripts/run_tier_job.py writes hive-partitioned by tier."""
    out = tier_batch(batch)
    return out.append_column("lang", batch["lang"]).append_column(
        "text", batch["text"]
    )


def tier_project(batch: pa.Table) -> pa.Table:
    return batch.select(["doc_id", "n_words", "rep_milli", "tier"])


def tier_stats_partial(batch: pa.Table) -> pa.Table:
    """tiered batch -> per-batch (tier, n_docs, sum_chars) partials."""
    g = batch.select(["tier", "n_chars"]).group_by("tier").aggregate(
        [([], "count_all"), ("n_chars", "sum")]
    )
    g = select_rename(
        g, tier="tier", n_docs="count_all", sum_chars="n_chars_sum"
    )
    return g.set_column(1, "n_docs", g["n_docs"].cast(pa.int64()))


def _tiered(sf_dir: str) -> rd.Dataset:
    from .queries import _t

    return _t(sf_dir, "documents", ["doc_id", "text", "n_chars"]).map_batches(
        remote_fn(_QT2, "tier_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_doc_tiers(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_words, rep_milli, tier). See module docstring."""
    return _tiered(sf_dir).map_batches(
        remote_fn(_QT2, "tier_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_tier_stats(sf_dir: str) -> rd.Dataset:
    """(tier, n_docs, sum_chars). See module docstring."""
    from ray.data.aggregate import Sum

    return (
        _tiered(sf_dir)
        .map_batches(
            remote_fn(_QT2, "tier_stats_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("tier")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )


_TIER_CTE = f"""
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
           AS n_words
  FROM documents),
r AS (
  SELECT doc_id,
         CAST(1000 * max(c) // sum(c) AS BIGINT) AS rep_milli
  FROM (
    SELECT doc_id, term, count(*) AS c
    FROM (SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS term
          FROM documents)
    GROUP BY doc_id, term)
  GROUP BY doc_id),
tiered AS (
  SELECT t.doc_id, t.n_chars, t.n_words, r.rep_milli,
         CAST(CASE
           WHEN t.n_words >= {TIER2_MIN_WORDS}
                AND r.rep_milli <= {TIER2_MAX_REP} THEN 2
           WHEN t.n_words >= {TIER1_MIN_WORDS}
                AND r.rep_milli <= {TIER1_MAX_REP} THEN 1
           ELSE 0 END AS BIGINT) AS tier
  FROM t JOIN r USING (doc_id))
"""

SQL_DOC_TIERS = _TIER_CTE + """
SELECT doc_id, n_words, rep_milli, tier FROM tiered
"""

SQL_TIER_STATS = _TIER_CTE + """
SELECT tier, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM tiered GROUP BY tier
"""

TIERS_QUERIES = {"doc_tiers": q_doc_tiers, "tier_stats": q_tier_stats}
TIERS_ORACLES = {"doc_tiers": SQL_DOC_TIERS, "tier_stats": SQL_TIER_STATS}
