"""Leak-free (group-integrity) train/val/test split.

``train_test_split`` (pipelines/queries.py) assigns documents
independently by doc_id hash — correct for i.i.d. corpora, but a
near-duplicate-rich web corpus leaks: two mirrors of one page land in
different splits and the eval set overlaps training data. The standard
fix is a GROUP split: the unit of assignment is the SOURCE (host), so
every document of a host lands in the same split by construction —
within-host near-dups can never straddle the train/eval boundary
(group k-fold / GroupShuffleSplit semantics).

Determinism across engines needs an explicit string hash (DuckDB's
hash() and Python's hash() are engine-/process-specific): a positional
ascii polynomial ``sum(i * ascii(s[i]))`` folded through the repo's
Knuth multiplicative residue rule. The polynomial is deliberately
simple — it is the portable-arithmetic constraint, not a quality
choice; a production deployment with a single engine would use any
proper string hash, and the split rule is isolated in
``split_of_source`` (one function, both twins).

Plan: per-batch combiner hashes only the batch's DISTINCT sources
(|sources|-bounded Python, documented) and reduces to
(source, split, n_docs, n_chars) partial rows; one |sources|-row
exchange sums per-source partials; a second |splits|-row aggregate
counts sources and totals. The corpus itself never shuffles —
assignment is map-only, like train_test_split/resample_weighted.

Reference analogue: none in /root/reference/app.py; brief scope
(training-data pipeline operators — leakage-aware eval prep).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..remote import remote_fn

_QS = "khl_pdf_ocr_ray.pipelines.queries_split"

SPLIT_MULT = 2654435761    # Knuth multiplicative constant (repo-wide)
SPLIT_ID_MOD = 2147483647  # fold before multiply: product stays in int64
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90         # [80, 90) = val, [90, 100) = test


def source_hash(s: str) -> int:
    """Positional ascii polynomial — the ONE place the string hash is
    defined (the SQL twin inlines the same expression)."""
    return sum(i * ord(c) for i, c in enumerate(s, 1))


def split_of_source(s: str) -> str:
    r = ((source_hash(s) % SPLIT_ID_MOD) * SPLIT_MULT) % 100
    if r < SPLIT_TRAIN_PCT:
        return "train"
    if r < SPLIT_VAL_PCT:
        return "val"
    return "test"


def group_split_partial(batch: pa.Table) -> pa.Table:
    """Per-batch reduce to (source, split, n_docs, n_chars): the Python
    hash runs once per DISTINCT source in the batch (|sources|-bounded),
    never per row."""
    g = batch.group_by("source").aggregate([([], "count_all"), ("n_chars", "sum")])
    srcs = g["source"].to_pylist()
    return pa.table(
        {
            "source": g["source"],
            "split": pa.array([split_of_source(s) for s in srcs], pa.string()),
            "n_docs": pc.cast(g["count_all"], pa.int64()),
            "n_chars": pc.cast(g["n_chars_sum"], pa.int64()),
        }
    )


def q_host_split_leakfree(sf_dir: str) -> rd.Dataset:
    """Per-split totals of the group-integrity split: every source's
    documents share a split by construction (no near-dup leakage across
    the eval boundary). See module docstring for the plan."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["source", "n_chars"])
        .map_batches(remote_fn(_QS, "group_split_partial"), batch_format="pyarrow")
        .groupby(["source", "split"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
        )
        .groupby("split")
        .aggregate(
            Count(alias_name="n_sources"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )


SQL_HOST_SPLIT_LEAKFREE = f"""
WITH h AS (
  SELECT source,
         CAST(list_sum(list_transform(range(1, length(source) + 1),
              i -> i * ascii(substr(source, i, 1)))) AS BIGINT) AS hv
  FROM (SELECT DISTINCT source FROM documents)),
s AS (
  SELECT source,
         CASE WHEN ((hv % {SPLIT_ID_MOD}) * {SPLIT_MULT}) % 100
                   < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN ((hv % {SPLIT_ID_MOD}) * {SPLIT_MULT}) % 100
                   < {SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM h)
SELECT s.split,
       CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS n_chars
FROM documents d JOIN s ON d.source = s.source
GROUP BY s.split
"""


SPLIT_QUERIES = {
    "host_split_leakfree": q_host_split_leakfree,
}

SPLIT_ORACLES = {
    "host_split_leakfree": SQL_HOST_SPLIT_LEAKFREE,
}
