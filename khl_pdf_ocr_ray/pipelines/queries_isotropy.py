"""Embedding isotropy / norm diagnostics (representation QC).

``embedding_isotropy``: one exact summary row over the embedding table —
vector count, dimension, the mean squared norm, and the isotropy ratio
||mean vector||^2 / mean ||x||^2 (0 for a perfectly centered/isotropic
cloud, 1 when every vector points the same way). The anisotropy of an
embedding space is the standard representation-collapse diagnostic
(Ethayarajh 2019; the "all vectors share a dominant direction" failure)
checked before cosine-based dedup/ANN thresholds are trusted.

Exactness contract: embeddings are float32; each component is quantized
q = floor(x * 2^20) BEFORE any summation. Multiplying a float by 2^20
is an exponent shift (exact for every finite float), and floor of a
double is exact, so BOTH engines quantize to the identical int64 and
every downstream sum is integer — no float-summation-order drift, the
same fixed-point discipline as the corpus-statistics family.

Plan: ONE map-only pass — per-batch combiner emits (dim-indexed
component sums, scalar norm2 sum, count) as dim-bounded rows -> one
(dim_idx)-keyed Sum exchange (|dim| rows per batch) -> driver fold of
the |dim|-row result with arbitrary-precision Python ints for
||sum||^2 (int128-class, no overflow at any corpus size). The
embedding payload never shuffles.

Oracle: static SQL — UNNEST WITH ORDINALITY, identical quantization and
HUGEINT sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..remote import remote_fn

_QI = "khl_pdf_ocr_ray.pipelines.queries_isotropy"

ISO_Q = 1 << 20       # component quantization (exact exponent shift)
ISO_SCALE = 1_000_000  # fixed-point scale of the reported ratios


def iso_partial(batch: pa.Table) -> pa.Table:
    """One batch -> (dim_idx, comp_sum, norm2_sum, n) partials: dim-indexed
    component sums plus the batch's scalar norm2/count replicated on row
    0 (single exchange, dim-bounded rows)."""
    flat = batch["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "dim_idx": pa.array([], pa.int64()),
                "comp_sum": pa.array([], pa.int64()),
                "norm2_sum": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    dim = len(flat) // n
    q = np.floor(flat.astype(np.float64) * ISO_Q).astype(np.int64).reshape(n, dim)
    comp = q.sum(axis=0)
    norm2 = int((q.astype(object) ** 2).sum())  # exact (fits int64 here, but
    # object math keeps the kernel overflow-free for any dim/scale)
    out_norm2 = np.zeros(dim, dtype=np.int64)
    out_n = np.zeros(dim, dtype=np.int64)
    out_norm2[0] = norm2
    out_n[0] = n
    return pa.table(
        {
            "dim_idx": pa.array(np.arange(dim, dtype=np.int64)),
            "comp_sum": pa.array(comp),
            "norm2_sum": pa.array(out_norm2),
            "n": pa.array(out_n),
        }
    )


def q_embedding_isotropy(sf_dir: str) -> pd.DataFrame:
    """(n_vecs, dim, mean_norm2_fx, isotropy_fx) — see module docstring."""
    from .queries import _t

    folded = (
        _t(sf_dir, "embeddings", ["embedding"])
        .map_batches(
            remote_fn(_QI, "iso_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("dim_idx")
        .aggregate(
            Sum("comp_sum", alias_name="comp_sum"),
            Sum("norm2_sum", alias_name="norm2_sum"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()  # |dim| rows
        .sort_values("dim_idx")
    )
    n = int(folded["n"].sum())
    dim = len(folded)
    norm2_total = int(folded["norm2_sum"].sum())
    # ||sum vector||^2 in arbitrary-precision ints (int128-class)
    sum_sq = sum(int(v) ** 2 for v in folded["comp_sum"])
    mean_norm2_fx = norm2_total * ISO_SCALE // (n * ISO_Q * ISO_Q)
    # isotropy = ||mean||^2 / mean norm2 = sum_sq / (n * norm2_total)
    isotropy_fx = sum_sq * ISO_SCALE // (n * norm2_total)
    return pd.DataFrame(
        {
            "n_vecs": pd.array([n], dtype="int64"),
            "dim": pd.array([dim], dtype="int64"),
            "mean_norm2_fx": pd.array([mean_norm2_fx], dtype="int64"),
            "isotropy_fx": pd.array([isotropy_fx], dtype="int64"),
        }
    )


SQL_EMBEDDING_ISOTROPY = f"""
WITH comp AS (
  SELECT generate_subscripts(e.embedding, 1) - 1 AS dim_idx,
         CAST(floor(unnest(e.embedding) * {ISO_Q}) AS BIGINT) AS q
  FROM embeddings e),
per_dim AS (
  SELECT dim_idx,
         CAST(sum(q) AS HUGEINT) AS comp_sum,
         CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sq_sum
  FROM comp GROUP BY dim_idx),
tot AS (
  SELECT (SELECT CAST(count(*) AS HUGEINT) FROM embeddings) AS n,
         CAST(count(*) AS HUGEINT) AS dim,
         CAST(sum(sq_sum) AS HUGEINT) AS norm2_total,
         CAST(sum(comp_sum * comp_sum) AS HUGEINT) AS sum_sq
  FROM per_dim)
SELECT CAST(n AS BIGINT) AS n_vecs,
       CAST(dim AS BIGINT) AS dim,
       CAST(norm2_total * {ISO_SCALE} // (n * {ISO_Q} * {ISO_Q}) AS BIGINT)
         AS mean_norm2_fx,
       CAST(sum_sq * {ISO_SCALE} // (n * norm2_total) AS BIGINT)
         AS isotropy_fx
FROM tot
"""

ISOTROPY_QUERIES = {"embedding_isotropy": q_embedding_isotropy}
ISOTROPY_ORACLES = {"embedding_isotropy": SQL_EMBEDDING_ISOTROPY}
