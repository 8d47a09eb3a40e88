"""Skyline (Pareto frontier) over per-document metrics.

``doc_skyline``: the documents NOT dominated on (n_chars, n_tokens) —
a dominates b iff a >= b on both metrics and a > b on at least one;
ties on BOTH metrics keep both rows (neither dominates). The classic
skyline operator (Borzsony, Kossmann & Stocker, ICDE 2001) — "best
tradeoff" selection without a scoring function, here the
longest-per-token-budget frontier a curation step shortlists from.

Plan / 100 TB notes: the textbook distributed plan — each batch
computes its LOCAL skyline (sort by x desc + strictly-increasing-y
sweep, vectorized), and because skyline(union of local skylines) ==
skyline(all) (dominance is transitive and survives taking local
frontiers), only the tiny candidate union reaches the driver for the
identical final sweep. Candidate cardinality is the per-block skyline
sum — expected O(blocks * log batch) for non-degenerate metric pairs —
and a loud cap assert (the under-cap driver-fold convention) fires if
a pathological metric pair ever makes it data-sized; the documented
upgrade is one more distributed round (grid-partition by x-quantile,
per-cell skyline, merge).

Oracle: static SQL (NOT EXISTS dominance — the O(n^2) definitional
form; the engine never runs it).

Reference analogue: /root/reference/app.py has no relational surface;
brief scope (SURVEY.md §2 operator breadth: preference queries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..remote import remote_fn

_QSK = "khl_pdf_ocr_ray.pipelines.queries_skyline"

SKYLINE_CAP = 1 << 20  # driver-fold candidate bound (loud, documented)


def skyline_filter(x: np.ndarray, y: np.ndarray):
    """Indices of the (x, y) skyline under >=/>-dominance, ties kept.

    Per distinct x keep only its max-y rows (lower-y rows are dominated
    by an equal-x, greater-y row); then sweeping x descending, a
    distinct-x group survives iff its max-y strictly exceeds every
    higher-x group's max-y (equal y at higher x dominates)."""
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    keep = np.zeros(len(order), dtype=bool)
    best_y = None
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and xs[j] == xs[i]:
            j += 1
        maxy = ys[i]  # sorted y-desc within the x-group
        if best_y is None or maxy > best_y:
            k = i
            while k < j and ys[k] == maxy:
                keep[k] = True
                k += 1
            best_y = maxy
        i = j
    return order[keep]


def skyline_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> its LOCAL skyline candidates."""
    text = pc.fill_null(batch["text"], "")
    n_tok = (
        pc.list_value_length(pc.split_pattern(text, " "))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = skyline_filter(x, n_tok)
    return pa.table(
        {
            "doc_id": pa.array(ids[idx], pa.int64()),
            "n_chars": pa.array(x[idx], pa.int64()),
            "n_tokens": pa.array(n_tok[idx], pa.int64()),
        }
    )


def q_doc_skyline(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_chars, n_tokens) — the Pareto frontier."""
    from .queries import _t

    cand = (
        _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        .map_batches(
            remote_fn(_QSK, "skyline_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()  # local-skyline union — candidate-sized by the
        # merge property; cap asserted below
    )
    assert len(cand) < SKYLINE_CAP, (
        f"skyline candidate union {len(cand)} rows >= {SKYLINE_CAP} — "
        "degenerate metric pair; add a grid-partitioned distributed round"
    )
    idx = skyline_filter(
        cand["n_chars"].to_numpy(np.int64),
        cand["n_tokens"].to_numpy(np.int64),
    )
    out = cand.iloc[np.sort(idx)].reset_index(drop=True)
    return out.astype(
        {"doc_id": "int64", "n_chars": "int64", "n_tokens": "int64"}
    )


SQL_DOC_SKYLINE = """
WITH m AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
           AS n_tokens
  FROM documents)
SELECT doc_id, n_chars, n_tokens FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.n_chars >= a.n_chars AND b.n_tokens >= a.n_tokens
    AND (b.n_chars > a.n_chars OR b.n_tokens > a.n_tokens))
"""

SKYLINE_QUERIES = {"doc_skyline": q_doc_skyline}
SKYLINE_ORACLES = {"doc_skyline": SQL_DOC_SKYLINE}
