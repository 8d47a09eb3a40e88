"""Sorted-neighborhood near-duplicate detection (SNM blocking).

The classic record-linkage blocking method (Hernandez & Stolfo, SIGMOD
1995 — public idea, reimplemented): sort the corpus by a blocking key and
compare only rows within a fixed-size sliding WINDOW of the sort order —
O(n·w) comparisons instead of O(n²). Complements the set-based near-dup
family (minhash/simhash/allpairs_cosine): SNM catches short-edit
duplicates whose shingle sets already diverged, and its cost model is
fully deterministic (every row pays exactly w-1 comparisons).

Pipeline (the ccnet_buckets global-rank recipe, queries_corpus.py:1222):

    project (doc_id, lang, n_chars, 64-char prefix)   [text dropped here]
    -> distributed sort by (lang, n_chars, doc_id)    [the ONE exchange]
    -> run-tagging pass on the materialized sort      [map]
    -> driver offsets (O(#sorted-runs) rows)          [tiny]
    -> rank assign + window-chunk fan-out (each row   [map]
       lands in chunk rank//w, plus a ghost copy in
       chunk rank//w - 1 so cross-chunk pairs exist)
    -> per-chunk pair enumeration + edit distance     [chunk groupby]

Every pair (a, b) with 0 < rank_b - rank_a < w is enumerated EXACTLY once
(in the chunk where a is native). Edit distance is the plain unit-cost
Levenshtein over the 64-char prefixes — the same function DuckDB's
``levenshtein()`` computes, which makes the oracle a static SQL window
self-join (independent plan: ROW_NUMBER + rank-distance join, no
chunking).

100 TB notes: the sort moves only slim columns (text is cut to 64 chars
at the read); chunks hold 2w rows each, so the pair stage is
embarrassingly parallel with zero skew by construction (ranks are unique);
driver state is one offset per sorted run, never per row.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..remote import remote_fn

_QN = "khl_pdf_ocr_ray.pipelines.queries_snm"

SNM_WINDOW = 5
SNM_PREFIX = 64
SNM_MAX_DIST = 8


def levenshtein(a: str, b: str) -> int:
    """Plain unit-cost edit distance over UTF-8 BYTES — DuckDB's
    ``levenshtein`` is byte-level (levenshtein('é','a') = 2), so the
    engine must be too; identical on ASCII. Row-rolling DP, prefix-min
    insertion telescope. This scalar form is the SPEC (fuzz-matched to
    DuckDB in tests); the batch path below uses the shared banded
    vectorized kernel (stages.dedup.levenshtein_pairs) over byte codes."""
    av = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    bv = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    if len(av) == 0:
        return len(bv)
    if len(bv) == 0:
        return len(av)
    m = len(bv)
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    for ca in av:
        # c[j] = min(substitution, deletion) for j = 1..m; the insertion
        # recurrence cur[j] = min(c[j], cur[j-1]+1) telescopes to
        # cur[j] = j + min_{i<=j}(v[i]-i) with v = [cur[0], c[1..m]],
        # which one prefix-min computes without a sequential scan
        c = np.minimum(prev[:-1] + (bv != ca), prev[1:] + 1)
        v = np.concatenate(([prev[0] + 1], c - idx[1:]))
        prev = idx + np.minimum.accumulate(v)
    return int(prev[-1])


def snm_project(batch: pa.Table) -> pa.Table:
    """Cut text to the blocking prefix BEFORE the sort exchange."""
    import pyarrow.compute as pc

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "n_chars": batch["n_chars"],
            "pfx": pc.utf8_slice_codeunits(batch["text"], 0, SNM_PREFIX),
        }
    )


def snm_tag_batch(batch: pa.Table) -> pa.Table:
    """One contiguous run of the global sort -> rows tagged with the
    run's first key (bkey; lexicographic order must agree with the
    (lang, n_chars, doc_id) sort — '\\t' separator + fixed-width
    non-negative numerics, same contract as ccnet_tag_batch) and their
    within-run local rank."""
    if len(batch) == 0:
        return batch.append_column("bkey", pa.array([], pa.string())) \
                    .append_column("local_rank", pa.array([], pa.int64()))
    lang0 = batch["lang"][0].as_py()
    nc0 = batch["n_chars"][0].as_py()
    id0 = batch["doc_id"][0].as_py()
    assert nc0 >= 0 and id0 >= 0
    bkey = f"{lang0}\t{nc0:012d}\t{id0:012d}"
    n = len(batch)
    return batch.append_column("bkey", pa.array([bkey] * n, pa.string())) \
                .append_column("local_rank", pa.array(np.arange(n), pa.int64()))


def snm_runlen_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (bkey, row count) combiner so the driver's run-offset
    pass reads O(#batches) rows, never the corpus (a batch may span two
    tag runs after re-batching, so this groups rather than assuming one
    bkey per batch)."""
    from ..functions.arrowkit import select_rename

    g = batch.group_by("bkey").aggregate([([], "count_all")])
    return select_rename(g, bkey="bkey", n="count_all")


def snm_fanout_batch(batch: pa.Table, offsets: Dict[str, int]) -> pa.Table:
    """rank = run offset + local rank; emit the native chunk row plus a
    ghost copy into the previous chunk (rank // w - 1) so every window
    pair co-locates. `native` marks the copy that may START a pair."""
    bkeys = batch["bkey"].to_pylist()
    local = batch["local_rank"].to_numpy(zero_copy_only=False)
    rank = np.asarray([offsets[b] for b in bkeys], dtype=np.int64) + local
    chunk = rank // SNM_WINDOW
    base = pa.table(
        {
            "doc_id": batch["doc_id"],
            "pfx": batch["pfx"],
            "rank": pa.array(rank, pa.int64()),
            "chunk": pa.array(chunk, pa.int64()),
            "native": pa.array(np.ones(len(rank), bool)),
        }
    )
    ghost_mask = chunk > 0
    ghost = pa.table(
        {
            "doc_id": batch["doc_id"].filter(pa.array(ghost_mask)),
            "pfx": batch["pfx"].filter(pa.array(ghost_mask)),
            "rank": pa.array(rank[ghost_mask], pa.int64()),
            "chunk": pa.array(chunk[ghost_mask] - 1, pa.int64()),
            "native": pa.array(np.zeros(int(ghost_mask.sum()), bool)),
        }
    )
    return pa.concat_tables([base, ghost])


def snm_pairs_group(df: pd.DataFrame) -> pd.DataFrame:
    """One chunk (<= 2w rows) -> its window pairs. A pair is emitted iff
    its LOWER-rank row is native to this chunk, so each global pair
    appears exactly once. Distances run through the SHARED banded
    vectorized DP (stages.dedup.levenshtein_pairs) over UTF-8 byte codes
    — exact wherever dist <= SNM_MAX_DIST, byte-identical to DuckDB's
    byte-level levenshtein. NULL prefixes never pair (the SQL twin's
    levenshtein(NULL, x) predicate is NULL -> row dropped)."""
    from ..stages.dedup import levenshtein_pairs

    df = df.sort_values("rank", kind="mergesort")
    ranks = df["rank"].to_numpy(dtype=np.int64)
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    pfx = df["pfx"].to_numpy(dtype=object)
    native = df["native"].to_numpy(dtype=bool)
    valid = np.array([p is not None for p in pfx], dtype=bool)
    ii, jj = [], []
    for i in range(len(df)):
        if not native[i] or not valid[i]:
            continue
        for j in range(i + 1, len(df)):
            if ranks[j] - ranks[i] >= SNM_WINDOW:
                break
            if valid[j]:
                ii.append(i)
                jj.append(j)
    if not ii:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "dist": pd.Series(dtype="int64"),
            }
        )
    enc = [p.encode("utf-8") if p is not None else b"" for p in pfx]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    width = max(1, int(lens.max()))
    codes = np.zeros((len(enc), width), dtype=np.int32)
    for r, e in enumerate(enc):
        codes[r, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    ia = np.asarray(ii, dtype=np.int64)
    ja = np.asarray(jj, dtype=np.int64)
    d = levenshtein_pairs(
        codes[ia], lens[ia], codes[ja], lens[ja], max_dist=SNM_MAX_DIST
    )
    keep = d <= SNM_MAX_DIST
    return pd.DataFrame(
        {
            "doc_a": pd.Series(ids[ia][keep], dtype="int64"),
            "doc_b": pd.Series(ids[ja][keep], dtype="int64"),
            "dist": pd.Series(d[keep], dtype="int64"),
        }
    )


def q_snm_dups(sf_dir: str) -> rd.Dataset:
    """See module docstring."""
    from .queries import _t

    tagged = (
        _t(sf_dir, "documents", ["doc_id", "lang", "n_chars", "text"])
        .map_batches(
            remote_fn(_QN, "snm_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["lang", "n_chars", "doc_id"])
        .materialize()  # bkey/local_rank must match between both consumers
        .map_batches(
            remote_fn(_QN, "snm_tag_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    # driver state: one (bkey, run length) row per sorted run, delivered
    # by a per-batch combiner — O(#batches) rows, never per-row pulls
    run_lens: Dict[str, int] = {}
    for b in tagged.map_batches(
        remote_fn(_QN, "snm_runlen_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).iter_batches(batch_format="pyarrow"):
        for k, n in zip(b["bkey"].to_pylist(), b["n"].to_pylist()):
            run_lens[k] = run_lens.get(k, 0) + n
    offsets: Dict[str, int] = {}
    acc = 0
    for k in sorted(run_lens):
        offsets[k] = acc
        acc += run_lens[k]
    return (
        tagged.map_batches(
            remote_fn(_QN, "snm_fanout_batch", offsets=offsets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("chunk")
        .map_groups(remote_fn(_QN, "snm_pairs_group"), batch_format="pandas")
    )


SQL_SNM_DUPS = f"""
WITH r AS (
  SELECT doc_id, lang, n_chars, substr(text, 1, {SNM_PREFIX}) AS pfx,
         row_number() OVER (ORDER BY lang, n_chars, doc_id) AS rk
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM r a JOIN r b ON b.rk > a.rk AND b.rk < a.rk + {SNM_WINDOW}
WHERE levenshtein(a.pfx, b.pfx) <= {SNM_MAX_DIST}
"""

SNM_QUERIES = {"snm_dups": q_snm_dups}
SNM_ORACLES = {"snm_dups": SQL_SNM_DUPS}
