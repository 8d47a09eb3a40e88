"""Context-length budgeting and k-anonymity auditing.

``context_length_budget`` — the sequence-packing planning report: docs
bucketed by power-of-two token-length bands (bucket = bit_length of the
space-split token count), with per-bucket doc/token volume and the
cumulative token share in ascending bucket order — what a trainer reads
to pick max_seq_len before running pack_sequences.

``k_anonymity_audit`` — the governance check run before releasing an
event log: treating (event_type, day) as the quasi-identifier, how many
equivalence classes fall below k = K_ANON (and how many rows sit in
them). One row out.

Plan / 100 TB notes: both are ONE map-side combiner pass + ONE
vocabulary-bounded exchange (<= 64 length buckets; |types| x |days|
quasi-identifier cells), then a driver fold in exact Python ints. The
length bucket is an integer SWAR bit-length (no float log anywhere —
DuckDB's length(bin(n)) is the same integer on the oracle side).

Oracles: static SQL.

Reference analogue: /root/reference/app.py has no planning/governance
surface; brief scope (LLM-prep + data-governance operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QB = "khl_pdf_ocr_ray.pipelines.queries_budget"

K_ANON = 10
DAY_US = 86_400_000_000


def bit_length_i64(n: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for positive int64 (SWAR, no float log)."""
    n = n.astype(np.int64)
    out = np.zeros(len(n), dtype=np.int64)
    v = n.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.int64(1) << np.int64(shift))
        out[m] += shift
        v[m] >>= shift
    return out + (n > 0).astype(np.int64)


def len_bucket_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (bucket, n_docs, total_tokens) partials."""
    text = pc.fill_null(batch["text"], "")
    n_tok = (
        pc.list_value_length(pc.split_pattern(text, " "))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    bucket = bit_length_i64(n_tok)
    t = pa.table(
        {
            "bucket": pa.array(bucket, pa.int64()),
            "tok": pa.array(n_tok, pa.int64()),
        }
    )
    g = t.group_by("bucket").aggregate([([], "count_all"), ("tok", "sum")])
    g = select_rename(
        g, bucket="bucket", n_docs="count_all", total_tokens="tok_sum"
    )
    return g.set_column(1, "n_docs", g["n_docs"].cast(pa.int64()))


def q_context_length_budget(sf_dir: str) -> pd.DataFrame:
    """(bucket, n_docs, total_tokens, cum_tokens) ascending by bucket."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QB, "len_bucket_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bucket")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
        .to_pandas()  # <= 64 rows
        .sort_values("bucket", ignore_index=True)
    )
    cells["cum_tokens"] = cells["total_tokens"].cumsum().astype(np.int64)
    for c in ("bucket", "n_docs", "total_tokens"):
        cells[c] = cells[c].astype(np.int64)
    return cells


def qid_partial(batch: pa.Table) -> pa.Table:
    """events batch -> (event_type, day, n) quasi-identifier partials."""
    ts_us = (
        batch["ts"]
        .cast(pa.timestamp("us"))
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    t = pa.table(
        {
            "event_type": batch["event_type"],
            "day": pa.array(ts_us // DAY_US, pa.int64()),
        }
    )
    g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
    g = select_rename(g, event_type="event_type", day="day", n="count_all")
    return g.set_column(2, "n", g["n"].cast(pa.int64()))


def q_k_anonymity_audit(sf_dir: str) -> pd.DataFrame:
    """One row: (k, n_classes, n_small_classes, n_rows_at_risk)."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "events", ["event_type", "ts"])
        .map_batches(
            remote_fn(_QB, "qid_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |types| x |days| rows — vocabulary-bounded
    )
    n = cells["n"].to_numpy().astype(np.int64)
    small = n < K_ANON
    return pd.DataFrame(
        {
            "k": np.array([K_ANON], dtype=np.int64),
            "n_classes": np.array([len(n)], dtype=np.int64),
            "n_small_classes": np.array([int(small.sum())], dtype=np.int64),
            "n_rows_at_risk": np.array([int(n[small].sum())], dtype=np.int64),
        }
    )


SQL_CONTEXT_LENGTH_BUDGET = """
WITH d AS (
  SELECT CAST(length(bin(
           CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)))
         AS BIGINT) AS bucket,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS tok
  FROM documents),
c AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS total_tokens
  FROM d GROUP BY bucket)
SELECT bucket, n_docs, total_tokens,
       CAST(sum(total_tokens) OVER (ORDER BY bucket
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens
FROM c
"""

SQL_K_ANONYMITY_AUDIT = f"""
WITH cell AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT CAST({K_ANON} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(coalesce(sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END), 0)
            AS BIGINT) AS n_rows_at_risk
FROM cell
"""

BUDGET_QUERIES = {
    "context_length_budget": q_context_length_budget,
    "k_anonymity_audit": q_k_anonymity_audit,
}
BUDGET_ORACLES = {
    "context_length_budget": SQL_CONTEXT_LENGTH_BUDGET,
    "k_anonymity_audit": SQL_K_ANONYMITY_AUDIT,
}
