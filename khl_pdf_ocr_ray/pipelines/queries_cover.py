"""Greedy set-cover source selection (submodular data-mixture planning).

``source_set_cover``: pick sources in the order that maximizes marginal
NEW distinct-trigram coverage — the greedy facility-location/set-cover
selection used for training-data subset choice (greedy is (1 - 1/e)-
optimal for coverage; the submodular-selection recipe of the data-
pruning literature). Output one row per greedy step: (step, source,
marginal_grams, cumulative_grams), stopping when no remaining source
adds coverage.

Plan: distinct (gram, source-bit) pairs from the novelty tokenizer ->
gram-hash-sharded exchange (all copies of a gram in one shard group) ->
per-shard vectorized mask fold (OR of source bits per gram) -> per-shard
(mask, count) partials -> ONE mask-keyed Sum -> driver greedy over the
mask histogram. The driver pull is bounded by min(distinct masks,
2^|sources|) rows — a corpus PROPERTY (20 sources -> <= 2^20 ~ 1M rows,
16 MB), not corpus-sized; the greedy itself is |sources|^2 x |masks|
integer math. 100 TB notes: beyond ~24 sources the dense mask histogram
stops being bounded — the deployment path is lazy greedy over per-source
KMV/HLL gram sketches (stages/sketch.py), documented not built.

Oracle: sequential dump twin (oracle_dump_train) — one pandas pass
building per-source gram sets with the SAME tokenizer kernel, masks via
a dict fold, then the SAME shared ``greedy_cover`` kernel; the gate
certifies the sharded distributed fold reproduces it exactly.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..remote import remote_fn

_QC = "khl_pdf_ocr_ray.pipelines.queries_cover"

COVER_SHARDS = 256


def source_list(sf_dir: str) -> List[str]:
    """Sorted distinct sources — the deterministic source -> bit map
    (|sources|-bounded driver pull, the dimension-table class)."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["source"])
    return sorted(set(t["source"].to_pylist()))


def cover_pairs_partial(batch: pa.Table, sources: List[str]) -> pa.Table:
    """documents batch -> per-batch DISTINCT (gram, src_bit, shard)
    rows (novelty tokenizer, source bit instead of doc id)."""
    import zlib

    idx = {s: i for i, s in enumerate(sources)}
    toks = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
    la = toks.combine_chunks()
    off = la.offsets.to_numpy().astype("int64")
    row_id = np.repeat(np.arange(len(la), dtype="int64"), np.diff(off))
    values = la.values
    empty = pa.table(
        {
            "gram": pa.array([], pa.string()),
            "src_bit": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
        }
    )
    if len(values) < 3:
        return empty
    same = (row_id[:-2] == row_id[1:-1]) & (row_id[1:-1] == row_id[2:])
    pos = np.flatnonzero(same)
    if pos.size == 0:
        return empty
    w1 = values.take(pa.array(pos))
    w2 = values.take(pa.array(pos + 1))
    w3 = values.take(pa.array(pos + 2))
    tri = pc.binary_join_element_wise(w1, w2, w3, " ")
    src = pc.take(batch["source"].combine_chunks(), pa.array(row_id[pos], pa.int64()))
    bits = np.array([1 << idx[s] for s in src.to_pylist()], dtype=np.int64)
    pairs = (
        pa.table({"gram": tri, "src_bit": pa.array(bits)})
        .group_by(["gram", "src_bit"])
        .aggregate([])
    )
    grams = pairs["gram"].to_pylist()
    shard = np.fromiter(
        (zlib.crc32(g.encode("utf-8")) % COVER_SHARDS for g in grams),
        dtype=np.int64,
        count=len(grams),
    )
    return pa.table(
        {
            "gram": pairs["gram"],
            "src_bit": pc.cast(pairs["src_bit"], pa.int64()),
            "shard": pa.array(shard),
        }
    )


def cover_mask_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """One shard group -> (mask, n_grams) partials: OR-fold the source
    bits per gram (all of a gram's rows are in this group by shard
    construction), then histogram the masks."""
    masks = g.groupby("gram")["src_bit"].apply(
        lambda s: int(np.bitwise_or.reduce(s.to_numpy(dtype=np.int64)))
    )
    r = (
        pd.DataFrame({"mask": masks.to_numpy(dtype=np.int64)})
        .groupby("mask", as_index=False)
        .size()
        .rename(columns={"size": "n_grams"})
    )
    return r.astype({"mask": "int64", "n_grams": "int64"})


def greedy_cover(
    masks: np.ndarray, counts: np.ndarray, sources: List[str]
) -> pd.DataFrame:
    """Shared greedy kernel (distributed plan AND sequential twin):
    repeatedly take the source with the largest uncovered-gram mass;
    ties break to the lexicographically smallest source; stop when no
    source adds coverage."""
    masks = masks.astype(np.int64)
    counts = counts.astype(np.int64)
    chosen_mask = 0
    rows: List[Tuple[int, str, int, int]] = []
    cumulative = 0
    remaining = set(range(len(sources)))
    for step in range(1, len(sources) + 1):
        best_src = None
        best_gain = 0
        for i in sorted(remaining, key=lambda j: sources[j]):
            gain = int(
                counts[((masks & (1 << i)) != 0) & ((masks & chosen_mask) == 0)].sum()
            )
            if gain > best_gain:
                best_gain = gain
                best_src = i
        if best_src is None:
            break
        chosen_mask |= 1 << best_src
        remaining.discard(best_src)
        cumulative += best_gain
        rows.append((step, sources[best_src], best_gain, cumulative))
    return pd.DataFrame(
        rows, columns=["step", "source", "marginal_grams", "cumulative_grams"]
    ).astype(
        {
            "step": "int64",
            "source": "string",
            "marginal_grams": "int64",
            "cumulative_grams": "int64",
        }
    )


def q_source_set_cover(sf_dir: str) -> pd.DataFrame:
    """(step, source, marginal_grams, cumulative_grams) greedy order."""
    from .queries import _t

    sources = source_list(sf_dir)
    hist = (
        _t(sf_dir, "documents", ["source", "text"])
        .map_batches(
            remote_fn(_QC, "cover_pairs_partial", sources=sources),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(remote_fn(_QC, "cover_mask_kernel"), batch_format="pandas")
        .groupby("mask")
        .aggregate(Sum("n_grams", alias_name="n_grams"))
        .to_pandas()  # mask histogram: min(distinct masks, 2^|sources|) rows
    )
    return greedy_cover(
        hist["mask"].to_numpy(), hist["n_grams"].to_numpy(), sources
    )


COVER_QUERIES = {"source_set_cover": q_source_set_cover}
