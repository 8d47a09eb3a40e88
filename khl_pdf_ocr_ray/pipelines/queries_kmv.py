"""KMV (k-minimum-values) distinct sketch with set-operation estimates.

``kmv_user_overlap``: per unordered pair of event types, KMV estimates
of each side's distinct-user count, the union's distinct count, and
the Jaccard similarity — the sketch family HLL cannot serve (HLL has
no set intersection; KMV supports union/Jaccard natively, Beyer et
al. 2007 "On Synopses for Distinct-Value Estimation"). All arithmetic
is exact integer: hashes are the repo-wide Knuth mix
``((user_id % 2^31-1) * 2654435761) % 2^32`` (the queries_eval
family), estimates are ``(K-1) * 2^32 // h_K`` floor divisions, and
Jaccard is permille of the union-sketch members present in both sides.

Membership correctness note: an element of the union's K smallest that
belongs to side A is necessarily among A's K smallest (elements of A
below it are a subset of union elements below it, of which there are
fewer than K) — so the pairwise fold needs only the per-type sketches,
never the full sets. That is the property that makes KMV mergeable at
100 TB: per-type sketches are K rows each, pairwise math is
|types choose 2| work on K-row inputs.

Plan / 100 TB notes: map-side per-batch distinct (type, h) partial,
ONE (type, h)-keyed exchange for global distinctness (the
decontaminate-family pattern), a per-block K-smallest combiner, one
|types|-group fold — the driver holds types x K rows (sketch-sized,
annotated). No join operator anywhere.

Oracle: static SQL — the same hash, row_number()-ranked K minima, and
floor-division estimators over the full distinct sets (equivalent by
the membership argument above).

Reference analogue: /root/reference/app.py has no sketch surface;
brief scope (training-data pipeline sketches alongside HLL/CMS).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QK = "khl_pdf_ocr_ray.pipelines.queries_kmv"

KMV_K = 32
KMV_MULT = 2654435761  # Knuth multiplicative constant (repo-wide)
KMV_MOD31 = 2147483647
KMV_SPACE = 1 << 32


def _kmv_hash(uid: np.ndarray) -> np.ndarray:
    """Injective-on-2^32 Knuth mix, numpy uint64 == DuckDB HUGEINT."""
    u = uid.astype(np.uint64) % np.uint64(KMV_MOD31)
    return ((u * np.uint64(KMV_MULT)) % np.uint64(KMV_SPACE)).astype(np.int64)


def kmv_slim(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch DISTINCT (event_type, h) rows."""
    t = pa.table(
        {
            "event_type": batch["event_type"],
            "h": pa.array(
                _kmv_hash(
                    batch["user_id"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                pa.int64(),
            ),
        }
    )
    g = t.group_by(["event_type", "h"]).aggregate([([], "count_all")])
    return g.select(["event_type", "h"])


def kmv_partial(batch: pa.Table) -> pa.Table:
    """globally-distinct (type, h) rows -> per-type K smallest in this
    block (mergeable sketch partial)."""
    df = pd.DataFrame(
        {
            "event_type": batch["event_type"].to_pylist(),
            "h": batch["h"].to_numpy(zero_copy_only=False).astype(np.int64),
        }
    )
    out = (
        df.sort_values(["event_type", "h"], kind="mergesort")
        .groupby("event_type", sort=True)
        .head(KMV_K)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "h": pa.array(out["h"].to_numpy(np.int64), pa.int64()),
        }
    )


def kmv_merge(group: pd.DataFrame) -> pd.DataFrame:
    """Merge block partials of one type -> its final K-smallest sketch.
    Under K distinct values the sketch IS the exact set (Beyer 2007
    semantics; the estimator then reports the exact count)."""
    hs = np.unique(group["h"].to_numpy(np.int64))
    top = hs[:KMV_K]
    return pd.DataFrame(
        {
            "event_type": [group["event_type"].iloc[0]] * len(top),
            "h": top.astype(np.int64),
        }
    )


def kmv_pair_fold(sketches: pd.DataFrame) -> pa.Table:
    """types x K sketch rows (driver-side, sketch-sized by definition)
    -> per-pair estimate table."""
    by_type = {
        t: np.sort(g["h"].to_numpy(np.int64))
        for t, g in sketches.groupby("event_type")
    }
    types = sorted(by_type)
    # under-K sketch = the exact set -> exact count (Beyer 2007)
    est = {
        t: (
            (KMV_K - 1) * KMV_SPACE // int(by_type[t][KMV_K - 1])
            if len(by_type[t]) >= KMV_K
            else len(by_type[t])
        )
        for t in types
    }
    rows = {
        "type_a": [],
        "type_b": [],
        "est_a": [],
        "est_b": [],
        "est_union": [],
        "jaccard_permille": [],
    }
    for i, a in enumerate(types):
        sa = set(by_type[a].tolist())
        for b in types[i + 1 :]:
            sb = set(by_type[b].tolist())
            merged = np.unique(
                np.concatenate([by_type[a], by_type[b]])
            )[:KMV_K]
            m = len(merged)
            n_inter = sum(1 for x in merged.tolist() if x in sa and x in sb)
            est_union = (
                (KMV_K - 1) * KMV_SPACE // int(merged[KMV_K - 1])
                if m >= KMV_K
                else m
            )
            rows["type_a"].append(a)
            rows["type_b"].append(b)
            rows["est_a"].append(est[a])
            rows["est_b"].append(est[b])
            rows["est_union"].append(est_union)
            rows["jaccard_permille"].append(1000 * n_inter // m)
    return pa.table(
        {
            "type_a": pa.array(rows["type_a"], pa.string()),
            "type_b": pa.array(rows["type_b"], pa.string()),
            "est_a": pa.array(rows["est_a"], pa.int64()),
            "est_b": pa.array(rows["est_b"], pa.int64()),
            "est_union": pa.array(rows["est_union"], pa.int64()),
            "jaccard_permille": pa.array(
                rows["jaccard_permille"], pa.int64()
            ),
        }
    )


def q_kmv_user_overlap(sf_dir: str) -> "object":
    """(type_a, type_b, est_a, est_b, est_union, jaccard_permille)."""
    from ray.data.aggregate import Count

    from .queries import _t

    sketches = (
        _t(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(
            remote_fn(_QK, "kmv_slim"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "h"])
        .aggregate(Count(alias_name="n"))  # global distinctness; n dropped
        .map_batches(
            remote_fn(_QK, "kmv_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("event_type")
        .map_groups(remote_fn(_QK, "kmv_merge"), batch_format="pandas")
        # driver holds |types| x K rows — sketch-sized by construction
        .to_pandas()
    )
    return kmv_pair_fold(sketches)


SQL_KMV_USER_OVERLAP = f"""
WITH u AS (
  SELECT DISTINCT event_type AS t,
         CAST(((user_id % {KMV_MOD31}) * {KMV_MULT}) % {KMV_SPACE}
              AS BIGINT) AS h
  FROM events),
r AS (
  SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rnk
  FROM u),
kth AS (SELECT t, max(h) AS hk, count(*) AS ns
        FROM r WHERE rnk <= {KMV_K} GROUP BY t),
est AS (
  -- under-K sketch = the exact set -> exact count (Beyer 2007)
  SELECT t, CASE WHEN ns < {KMV_K} THEN CAST(ns AS BIGINT)
               ELSE CAST(({KMV_K} - 1) * {KMV_SPACE}::HUGEINT // hk
                         AS BIGINT) END AS e
  FROM kth),
pairs AS (
  SELECT a.t AS ta, b.t AS tb FROM kth a JOIN kth b ON a.t < b.t),
un AS (
  SELECT p.ta, p.tb, uu.h,
         max(CASE WHEN uu.t = p.ta THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN uu.t = p.tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN u uu ON uu.t IN (p.ta, p.tb)
  GROUP BY p.ta, p.tb, uu.h),
unr AS (
  SELECT ta, tb, h, in_a, in_b,
         row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rnk
  FROM un),
agg AS (
  SELECT ta, tb, max(h) AS hu, count(*) AS m,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_inter
  FROM unr WHERE rnk <= {KMV_K} GROUP BY ta, tb)
SELECT agg.ta AS type_a, agg.tb AS type_b,
       ea.e AS est_a, eb.e AS est_b,
       CASE WHEN agg.m < {KMV_K} THEN CAST(agg.m AS BIGINT)
            ELSE CAST(({KMV_K} - 1) * {KMV_SPACE}::HUGEINT // agg.hu
                      AS BIGINT) END AS est_union,
       CAST(1000 * agg.n_inter // agg.m AS BIGINT) AS jaccard_permille
FROM agg
JOIN est ea ON ea.t = agg.ta
JOIN est eb ON eb.t = agg.tb
"""

KMV_QUERIES = {"kmv_user_overlap": q_kmv_user_overlap}
KMV_ORACLES = {"kmv_user_overlap": SQL_KMV_USER_OVERLAP}
