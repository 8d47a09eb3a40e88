"""Training-data engine operators, round-4 widening: distributed BPE
merge learning, a compression-ratio quality signal, per-column table
profiling, Misra-Gries heavy hitters, and the KREC framed-record source
scan.

- ``bpe_merges`` — byte-pair-encoding merge learning (Sennrich et al.
  2016, the tokenizer-training step of an LLM data pipeline) run as a
  Ray Data iteration: ONE corpus-sized pass reduces text to a
  (word, freq) vocabulary (distinct-words-per-block combiner, the only
  exchange that scales with the corpus); every merge round then runs
  over the vocabulary Dataset only — a vectorized adjacent-pair count
  combiner (pairs-per-block rows shuffle), a per-block top-1 partial
  (<= 1 row per block to the driver), and a map-only greedy merge
  application. The working vocabulary is materialized per round (the
  cache-the-iterate pattern, same as kmeans_clusters). Checked against
  a sequential twin built from the SAME kernels (Dq) — integer counts
  and a deterministic (count desc, left asc, right asc) tie-break make
  the result batching/layout-invariant.
- ``compression_ratio`` — zlib compressibility permille per document:
  the classic repetition/boilerplate signal (highly compressible text is
  template/repeated content; used by RefinedWeb/Dolma-class quality
  filters). Map-only; the per-row zlib call is one C call per document
  (same cost class as the md5/crc paths). Sequential-twin checked (Dq;
  zlib is not expressible in SQL).
- ``table_profile`` — per-column data profiling (row count, null count,
  exact distinct count, min, max) over the events table in long form:
  the warehouse PROFILE/SUMMARIZE operator. One stats pass emits a
  6-row partial per block; the exact-distinct pass shuffles per-block
  DISTINCT canonical values (bounded by column cardinality — the exact
  path; the engine's HLL sketch is the constant-memory estimate for
  open-domain columns). Numeric min/max reduce in native int64
  (epoch-us for timestamps, x100 fixed-point cents for doubles) and are
  formatted only at the driver — never lexicographic on numbers.
- ``heavy_hitters_mg`` — frequent-item detection with a Misra-Gries
  candidate pass + exact verification: per-block MG(64) summaries
  (<= 65 rows per block: top counts with the (k+1)-th-largest
  subtracted — the deterministic batch form of the MG sketch) reduce to
  per-key lower bounds whose guarantee (error <= n/(k+1) < n/32) makes
  the candidate set a PROVABLE superset of every key above the n//32
  threshold, and <= ~62 keys total by a counting bound; a second exact
  pass counts only broadcast candidates. The final output (exact counts
  above an exact threshold) is order/batching-independent, so a static
  SQL GROUP BY/HAVING twin certifies it even though MG internals are
  stream-order-dependent. Runs over the planted-skew stream (five hot
  users at ~10% each — the same plant-the-signal convention as
  skew_join_events; the raw events table is near-uniform).
- ``recfile_scan`` — scan of the KREC framed-record shards
  (sources/recfile.py, the WARC/TFRecord-family source): streaming
  per-file datasource read -> per-batch (lang, crc_ok) combiner -> tiny
  groupby. The shards derive deterministically from documents.parquet,
  so a static SQL twin recomputes every aggregate (including the
  planted doc_id % 37 == 5 crc corruption) from the table alone.

Reference parity note: the reference service (/root/reference/app.py)
has no tokenizer/profile/sketch surface — these are brief-mandated
engine operators; the in-band crc_ok=0 rows in recfile_scan follow the
reference's error-row convention (app.py error dicts).
"""

from __future__ import annotations

import zlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.arrowkit import select_rename
from ..io import coalesce_for_input, coalesce_for_keys, table_nbytes, table_nrows
from ..remote import remote_fn

_QT = "khl_pdf_ocr_ray.pipelines.queries_train"

# --- BPE ---------------------------------------------------------------
BPE_MERGES = 8
EOW = "</w>"   # end-of-word marker (Sennrich et al. 2016 convention)

# --- compression ratio -------------------------------------------------
ZLEVEL = 6

# --- heavy hitters -----------------------------------------------------
MG_K = 64      # Misra-Gries capacity per block summary
HH_DEN = 32    # heavy = count > n_total // HH_DEN  (needs MG_K + 1 > HH_DEN)

# --- profile -----------------------------------------------------------
# (column, kind): int = native int64; ts = epoch microseconds;
# cents = x100 fixed-point double; str = binary-collated string
PROFILE_COLS: List[Tuple[str, str]] = [
    ("event_id", "int"),
    ("ts", "ts"),
    ("user_id", "int"),
    ("event_type", "str"),
    ("value", "cents"),
    ("props", "str"),
]


# ======================================================================
# BPE merge learning
# ======================================================================
def bpe_word_partial(batch: pa.Table) -> pa.Table:
    """text -> lowercase alpha words -> per-block (word, n) counts.
    Fully vectorized (utf8_lower / split_pattern_regex / list_flatten +
    one Arrow group_by); the downstream groupby then moves only the
    block's DISTINCT words — the single corpus-sized exchange of BPE."""
    low = pc.utf8_lower(batch["text"])
    flat = pc.list_flatten(pc.split_pattern_regex(low, "[^a-z]+"))
    flat = flat.filter(pc.not_equal(flat, ""))
    g = (
        pa.table({"word": flat})
        .group_by("word")
        .aggregate([("word", "count")])
    )
    return select_rename(g, word="word", n="word_count")


def bpe_symbolize(batch: pa.Table) -> pa.Table:
    """(word, n) -> (syms: list<string>, n): characters + EOW marker.
    The per-word Python loop runs over the VOCABULARY (distinct words),
    never the corpus — the standard BPE working set."""
    words = batch["word"].to_pylist()
    syms = [list(w) + [EOW] for w in words]
    return pa.table(
        {
            "syms": pa.array(syms, pa.list_(pa.string())),
            "n": batch["n"].combine_chunks()
            if isinstance(batch["n"], pa.ChunkedArray)
            else batch["n"],
        }
    )


def _syms_flat(batch: pa.Table):
    """Flatten a syms batch: (values np, word-id per position np,
    per-word lengths np, word freqs np)."""
    col = batch["syms"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    v = arr.values.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    wid = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    return v, wid, lens, n


def bpe_pair_partial(batch: pa.Table) -> pa.Table:
    """Per-block adjacent-pair counts weighted by word frequency:
    (left, right, n). Vectorized shift-compare over the flattened symbol
    array; the per-block Arrow group_by is the map-side combiner, so the
    shuffle moves the block's distinct pairs only."""
    v, wid, lens, n = _syms_flat(batch)
    if len(v) < 2:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    same = wid[:-1] == wid[1:]
    wt = n[wid[:-1][same]]
    g = (
        pa.table(
            {
                "left": pa.array(v[:-1][same], pa.string()),
                "right": pa.array(v[1:][same], pa.string()),
                "wt": pa.array(wt, pa.int64()),
            }
        )
        .group_by(["left", "right"])
        .aggregate([("wt", "sum")])
    )
    return select_rename(g, left="left", right="right", n="wt_sum")


def bpe_top1_partial(batch: pa.Table) -> pa.Table:
    """<= 1 row per block: the block's best (n desc, left asc, right asc)
    pair — so the driver sees one candidate per reduce block, never the
    pair vocabulary."""
    if batch.num_rows == 0:
        return batch
    n = batch["n"].to_numpy(zero_copy_only=False)
    left = batch["left"].to_numpy(zero_copy_only=False)
    right = batch["right"].to_numpy(zero_copy_only=False)
    i = int(np.lexsort((right, left, -n))[0])
    return batch.slice(i, 1)


def bpe_best_pair(t: pa.Table) -> Optional[Tuple[str, str, int]]:
    """Deterministic global winner over a (left, right, n) table — shared
    by the distributed driver pick and the sequential twin."""
    if t.num_rows == 0:
        return None
    n = t["n"].to_numpy(zero_copy_only=False)
    left = t["left"].to_numpy(zero_copy_only=False)
    right = t["right"].to_numpy(zero_copy_only=False)
    i = int(np.lexsort((right, left, -n))[0])
    return str(left[i]), str(right[i]), int(n[i])


def bpe_apply_merge(batch: pa.Table, left: str, right: str) -> pa.Table:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with the merged symbol, per word. The only
    sequential scan runs over MATCH POSITIONS (np.nonzero output), not
    symbols — overlap resolution ("aaa" + (a,a) -> (aa, a)) is inherently
    order-dependent within a run; everything else is vectorized."""
    v, wid, lens, n = _syms_flat(batch)
    merged = left + right
    if len(v) >= 2:
        same = wid[:-1] == wid[1:]
        match = same & (v[:-1] == left) & (v[1:] == right)
        idx = np.nonzero(match)[0]
    else:
        idx = np.array([], dtype=np.int64)
    accepted = []
    last = -2
    for i in idx:  # bounded by match count, not corpus size
        if i > last + 1:
            accepted.append(i)
            last = i
    acc = np.array(accepted, dtype=np.int64)
    if len(acc):
        v = v.copy()
        v[acc] = merged
        keep = np.ones(len(v), dtype=bool)
        keep[acc + 1] = False
        v = v[keep]
        lens = lens - np.bincount(wid[acc], minlength=len(lens))
    new_offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    syms = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), pa.array(v, pa.string())
    )
    return pa.table({"syms": syms, "n": pa.array(n, pa.int64())})


def bpe_train_table(vocab_syms: rd.Dataset, width: int) -> pa.Table:
    """Run BPE_MERGES rounds over a symbolized-vocabulary Dataset and
    return the merge table. Each round: pair-count combiner -> pair
    groupby -> per-block top-1 -> driver winner (<= num_blocks rows,
    bounded) -> map-only merge application, re-materialized (the
    cache-the-iterate pattern; at 100 TB the object store holds/spills
    the vocabulary blocks and every round is a pure map over them)."""
    ds = vocab_syms.materialize()
    out_rank, out_left, out_right, out_merged, out_n = [], [], [], [], []
    for r in range(1, BPE_MERGES + 1):
        agg = (
            ds.map_batches(
                remote_fn(_QT, "bpe_pair_partial"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .repartition(width)
            .groupby(["left", "right"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(
                remote_fn(_QT, "bpe_top1_partial"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        cands = pa.Table.from_pylist(
            agg.take_all(),  # <= 1 row per reduce block — driver-bounded
            schema=pa.schema(
                [("left", pa.string()), ("right", pa.string()), ("n", pa.int64())]
            ),
        )
        best = bpe_best_pair(cands)
        if best is None:
            break
        left, right, n = best
        out_rank.append(r)
        out_left.append(left)
        out_right.append(right)
        out_merged.append(left + right)
        out_n.append(n)
        ds = ds.map_batches(
            remote_fn(_QT, "bpe_apply_merge", left=left, right=right),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    return pa.table(
        {
            "merge_rank": pa.array(out_rank, pa.int64()),
            "lhs": pa.array(out_left, pa.string()),
            "rhs": pa.array(out_right, pa.string()),
            "merged": pa.array(out_merged, pa.string()),
            "n": pa.array(out_n, pa.int64()),
        }
    )


def q_bpe_merges(sf_dir: str) -> pa.Table:
    """First BPE_MERGES BPE merges learned from the documents corpus."""
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    vocab = (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QT, "bpe_word_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            remote_fn(_QT, "bpe_symbolize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return bpe_train_table(vocab, width)


BPE_ENCODE_TOP_K = 50


def bpe_encode_partial(batch: pa.Table, merges: list) -> pa.Table:
    """(word, n) vocabulary rows -> (token, n) partial counts after
    applying the learned merges in rank order. Reuses the training
    kernels (bpe_symbolize + bpe_apply_merge) so encode semantics are the
    merge semantics by construction; the per-word work runs over the
    VOCABULARY, never the corpus."""
    t = bpe_symbolize(batch)
    for lhs, rhs in merges:
        t = bpe_apply_merge(t, lhs, rhs)
    syms = t["syms"].combine_chunks()
    flat = pc.list_flatten(syms)
    reps = pc.list_value_length(syms).to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    g = (
        pa.table(
            {
                "token": flat,
                "n": pa.array(np.repeat(n, reps), pa.int64()),
            }
        )
        .group_by("token")
        .aggregate([("n", "sum")])
    )
    return select_rename(g, token="token", n="n_sum")


def q_bpe_encode(sf_dir: str) -> rd.Dataset:
    """Apply the learned BPE merge table to the whole corpus and report
    the top-50 subword tokens by total occurrence count (count DESC,
    token ASC) — the broadcast-small-model application pattern: the merge
    table (BPE_MERGES rows) ships once in the task closure; the only
    corpus-sized exchange is the word-count combiner the training pass
    needs anyway. Encoding touches each DISTINCT word once."""
    from .queries import _t

    merges_t = q_bpe_merges(sf_dir)  # small: BPE_MERGES rows
    merges = list(
        zip(merges_t["lhs"].to_pylist(), merges_t["rhs"].to_pylist())
    )
    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    return (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QT, "bpe_word_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            remote_fn(_QT, "bpe_encode_partial", merges=merges),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(BPE_ENCODE_TOP_K)
    )


def lang_word_partial(batch: pa.Table) -> pa.Table:
    """(lang, text) -> per-batch (lang, word, n) counts, vectorized
    (utf8_lower / split / flatten with the lang column repeated by each
    row's word count)."""
    low = pc.utf8_lower(batch["text"])
    lists = pc.split_pattern_regex(low, "[^a-z]+")
    flat = pc.list_flatten(lists)
    reps = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    langs = np.repeat(
        np.asarray(batch["lang"].to_pylist(), dtype=object), reps
    )
    t = pa.table({"lang": pa.array(langs, pa.string()), "word": flat})
    t = t.filter(pc.not_equal(t["word"], ""))
    g = t.group_by(["lang", "word"]).aggregate([([], "count_all")])
    return select_rename(g, lang="lang", word="word", n="count_all")


def bpe_word_tokens(batch: pa.Table, merges: list) -> pa.Table:
    """Distinct words -> (word, n_subwords) after the learned merges
    (training kernels reused; vocabulary-sized work)."""
    t = bpe_symbolize(
        pa.table(
            {
                "word": batch["word"],
                "n": pa.array(np.ones(len(batch), np.int64), pa.int64()),
            }
        )
    )
    for lhs, rhs in merges:
        t = bpe_apply_merge(t, lhs, rhs)
    n_sub = pc.list_value_length(t["syms"])
    return pa.table(
        {
            "word": batch["word"],
            "n_subwords": pc.cast(n_sub, pa.int64()),
        }
    )


def fertility_partial(batch: pa.Table) -> pa.Table:
    """(lang, n, n_subwords) joined rows -> per-batch (lang, words,
    subwords) sums — globally distinct (lang, word) rows, valid partials."""
    n = batch["n"].to_numpy(zero_copy_only=False)
    ns = batch["n_subwords"].to_numpy(zero_copy_only=False)
    t = pa.table(
        {
            "lang": batch["lang"],
            "words": pa.array(n, pa.int64()),
            "subwords": pa.array(n * ns, pa.int64()),
        }
    )
    g = t.group_by("lang").aggregate([("words", "sum"), ("subwords", "sum")])
    return select_rename(
        g, lang="lang", words="words_sum", subwords="subwords_sum"
    )


def fertility_finalize(batch: pa.Table) -> pa.Table:
    w = batch["words"].to_numpy(zero_copy_only=False)
    s = batch["subwords"].to_numpy(zero_copy_only=False)
    return batch.append_column(
        "fertility_x1000", pa.array(s * 1000 // np.maximum(w, 1), pa.int64())
    )


def q_bpe_fertility(sf_dir: str) -> rd.Dataset:
    """Tokenizer FERTILITY per language (mean subword tokens per word
    under the learned BPE merges) — the standard tokenizer-quality /
    language-equity metric for multilingual training corpora.

    Plan: per-batch (lang, word) combiner -> (lang, word) Sum (the one
    corpus-sized exchange, pre-collapsed map-side) -> distinct-word
    encode (vocabulary-sized, merges in the task closure) -> word-keyed
    join -> per-batch lang partial -> |langs|-row Sum -> integer
    fertility. Exact int math end-to-end."""
    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    merges_t = q_bpe_merges(sf_dir)
    merges = list(zip(merges_t["lhs"].to_pylist(), merges_t["rhs"].to_pylist()))
    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    lw = (
        _t(sf_dir, "documents", ["lang", "text"])
        .map_batches(
            remote_fn(_QT, "lang_word_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby(["lang", "word"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # reused: row count prices the join; join probe
    )
    wordtok = (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QT, "bpe_word_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            remote_fn(_QT, "bpe_word_tokens", merges=merges),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .rename_columns({"word": "word_r"})
    )
    joined = safe_join(
        lw,
        wordtok,
        on=("word",),
        right_on=("word_r",),
        assume_non_empty=True,  # both sides derive from the same corpus
        num_partitions=partitions_for_rows(lw.count()),
    )
    return (
        joined.map_batches(
            remote_fn(_QT, "fertility_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(
            Sum("words", alias_name="words"),
            Sum("subwords", alias_name="subwords"),
        )
        .map_batches(
            remote_fn(_QT, "fertility_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# ======================================================================
# Compression-ratio quality signal
# ======================================================================
def compress_ratio_batch(batch: pa.Table) -> pa.Table:
    """Per-doc zlib compressibility: (doc_id, n_bytes, comp_permille).
    The row loop's body is ONE C call (zlib.compress) per document — the
    same per-record cost class as the crc/md5 kernels; there is no
    vectorized zlib. comp_permille = compressed*1000 // raw (floor)."""
    ids = batch["doc_id"]
    texts = batch["text"].to_pylist()
    n_bytes = np.empty(len(texts), dtype=np.int64)
    permille = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        c = zlib.compress(b, ZLEVEL)
        n_bytes[i] = len(b)
        permille[i] = len(c) * 1000 // max(1, len(b))
    return pa.table(
        {
            "doc_id": ids.combine_chunks()
            if isinstance(ids, pa.ChunkedArray)
            else ids,
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "comp_permille": pa.array(permille, pa.int64()),
        }
    )


def q_compression_ratio(sf_dir: str) -> rd.Dataset:
    """Map-only per-document compressibility signal."""
    from .queries import _t

    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_QT, "compress_ratio_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ======================================================================
# Table profiling
# ======================================================================
def _canon_num(arr: pa.ChunkedArray, kind: str) -> pa.ChunkedArray:
    """Canonical int64 form whose order equals the source order: ints
    as-is, timestamps as epoch us, doubles as x100 fixed-point (the
    monotone floor(x*100+0.5) used engine-wide for cents)."""
    if kind == "int":
        return pc.cast(arr, pa.int64())
    if kind == "ts":
        return pc.cast(arr, pa.int64())  # timestamp[us] -> epoch us
    if kind == "cents":
        return pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(arr, pa.float64()), 100.0), 0.5)),
            pa.int64(),
        )
    raise ValueError(kind)


def profile_stats_partial(batch: pa.Table) -> pa.Table:
    """One row per profiled column per block: count, nulls, native-typed
    min/max partials (numeric in int64, strings binary-collated)."""
    cols, n, nulls, min_num, max_num, min_str, max_str = [], [], [], [], [], [], []
    for name, kind in PROFILE_COLS:
        arr = batch[name]
        cols.append(name)
        n.append(len(arr))
        nulls.append(arr.null_count)
        if kind == "str":
            min_num.append(None)
            max_num.append(None)
            min_str.append(pc.min(arr).as_py())
            max_str.append(pc.max(arr).as_py())
        else:
            num = _canon_num(arr, kind)
            min_num.append(pc.min(num).as_py())
            max_num.append(pc.max(num).as_py())
            min_str.append(None)
            max_str.append(None)
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "n": pa.array(n, pa.int64()),
            "nulls": pa.array(nulls, pa.int64()),
            "min_num": pa.array(min_num, pa.int64()),
            "max_num": pa.array(max_num, pa.int64()),
            "min_str": pa.array(min_str, pa.string()),
            "max_str": pa.array(max_str, pa.string()),
        }
    )


def profile_distinct_partial(batch: pa.Table) -> pa.Table:
    """Per-block DISTINCT canonical values, long form (col, val). The
    downstream dedup groupby's volume is bounded by true column
    cardinality — the exact-distinct path (HLL is the sketch path for
    open-domain columns; see hll_distinct_users)."""
    cols: List[str] = []
    vals: List[str] = []
    for name, kind in PROFILE_COLS:
        arr = batch[name].drop_null()
        if kind == "str":
            u = pc.unique(
                arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            ).to_pylist()
        else:
            u = [
                str(x)
                for x in pc.unique(
                    _canon_num(arr, kind).combine_chunks()
                    if isinstance(_canon_num(arr, kind), pa.ChunkedArray)
                    else _canon_num(arr, kind)
                ).to_pylist()
            ]
        cols.extend([name] * len(u))
        vals.extend(u)
    return pa.table(
        {"col": pa.array(cols, pa.string()), "val": pa.array(vals, pa.string())}
    )


def profile_distinct_one(batch: pa.Table) -> pa.Table:
    """(col, val) dedup output -> (col, one) for the per-column count."""
    return pa.table(
        {
            "col": batch["col"].combine_chunks()
            if isinstance(batch["col"], pa.ChunkedArray)
            else batch["col"],
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64), pa.int64()),
        }
    )


def q_table_profile(sf_dir: str) -> pa.Table:
    """Long-form profile of the events table: one row per column with
    (n_rows, n_nulls, n_distinct, min_v, max_v). Driver-held state is
    bounded by the COLUMN COUNT (two 6-row aggregates), never rows."""
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "events"))
    ev = _t(sf_dir, "events")
    stats = (
        ev.map_batches(
            remote_fn(_QT, "profile_stats_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Sum("nulls", alias_name="n_nulls"),
            Min("min_num", alias_name="min_num"),
            Max("max_num", alias_name="max_num"),
            Min("min_str", alias_name="min_str"),
            Max("max_str", alias_name="max_str"),
        )
        .to_pandas()  # one row per profiled column — bounded
    )
    distinct = (
        ev.map_batches(
            remote_fn(_QT, "profile_distinct_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby(["col", "val"])
        .aggregate(Count(alias_name="c_"))
        .map_batches(
            remote_fn(_QT, "profile_distinct_one"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("col")
        .aggregate(Sum("one", alias_name="n_distinct"))
        .to_pandas()  # one row per profiled column — bounded
    )
    kinds = dict(PROFILE_COLS)
    stats = stats.merge(distinct, on="col", how="left").sort_values("col")

    def _fmt(row, lo: bool) -> str:
        if kinds[row["col"]] == "str":
            return row["min_str"] if lo else row["max_str"]
        return str(int(row["min_num"] if lo else row["max_num"]))

    return pa.table(
        {
            "col": pa.array(stats["col"].tolist(), pa.string()),
            "n_rows": pa.array(stats["n_rows"].astype("int64").tolist(), pa.int64()),
            "n_nulls": pa.array(
                stats["n_nulls"].astype("int64").tolist(), pa.int64()
            ),
            "n_distinct": pa.array(
                stats["n_distinct"].astype("int64").tolist(), pa.int64()
            ),
            "min_v": pa.array(
                [_fmt(r, True) for _, r in stats.iterrows()], pa.string()
            ),
            "max_v": pa.array(
                [_fmt(r, False) for _, r in stats.iterrows()], pa.string()
            ),
        }
    )


def _profile_col_sql(name: str, kind: str) -> str:
    if kind == "str":
        mn, mx, dv = f"MIN({name})", f"MAX({name})", name
    elif kind == "ts":
        mn = f"CAST(epoch_us(MIN({name})) AS VARCHAR)"
        mx = f"CAST(epoch_us(MAX({name})) AS VARCHAR)"
        dv = name
    elif kind == "cents":
        mn = f"CAST(CAST(floor(MIN({name})*100+0.5) AS BIGINT) AS VARCHAR)"
        mx = f"CAST(CAST(floor(MAX({name})*100+0.5) AS BIGINT) AS VARCHAR)"
        dv = f"CAST(floor({name}*100+0.5) AS BIGINT)"
    else:
        mn, mx, dv = (
            f"CAST(MIN({name}) AS VARCHAR)",
            f"CAST(MAX({name}) AS VARCHAR)",
            name,
        )
    return (
        f"SELECT '{name}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls, "
        f"CAST(COUNT(DISTINCT {dv}) AS BIGINT) AS n_distinct, "
        f"{mn} AS min_v, {mx} AS max_v FROM events"
    )


SQL_TABLE_PROFILE = " UNION ALL ".join(
    _profile_col_sql(n, k) for n, k in PROFILE_COLS
)


# ======================================================================
# Misra-Gries heavy hitters
# ======================================================================
def _hh_plant(batch: pa.Table) -> np.ndarray:
    """Planted hot-key stream: events with event_id % 10 < 5 are assigned
    user_id = event_id % 5 (five hot users, ~10% of the stream each);
    the rest keep their organic near-uniform user — the engine-wide
    plant-the-signal convention (the synthetic events table has no
    natural heavy hitter; see skew_join_events)."""
    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return np.where(eid % 10 < 5, eid % 5, uid)


def hh_mg_partial(batch: pa.Table) -> pa.Table:
    """Deterministic batch Misra-Gries summary: exact block counts with
    the (MG_K+1)-th largest count subtracted, entries > 0 kept — <= MG_K
    rows with per-key undercount <= n_block/(MG_K+1), plus one sentinel
    row (user_id = -1, w = n_block) carrying the block size."""
    uid = _hh_plant(batch)
    users, counts = np.unique(uid, return_counts=True)
    if len(counts) > MG_K:
        d = np.partition(counts, -(MG_K + 1))[-(MG_K + 1)]
    else:
        d = 0
    keep = counts > d
    out_u = np.concatenate([users[keep], [-1]])
    out_w = np.concatenate([counts[keep] - d, [len(uid)]])
    return pa.table(
        {
            "user_id": pa.array(out_u, pa.int64()),
            "w": pa.array(out_w.astype(np.int64), pa.int64()),
        }
    )


def hh_filter_partial(batch: pa.Table, lo: int, sentinel: bool) -> pa.Table:
    """Arrow filter over the small MG aggregate: the sentinel row, or
    candidate rows with w > lo."""
    if sentinel:
        mask = pc.equal(batch["user_id"], -1)
    else:
        mask = pc.and_(pc.greater_equal(batch["user_id"], 0), pc.greater(batch["w"], lo))
    return batch.filter(mask)


def hh_exact_partial(batch: pa.Table, cands: List[int]) -> pa.Table:
    """Exact per-block counts for the broadcast candidate set only."""
    uid = _hh_plant(batch)
    uid = uid[np.isin(uid, np.asarray(cands, dtype=np.int64))]
    users, counts = np.unique(uid, return_counts=True)
    return pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def hh_threshold_partial(batch: pa.Table, thr: int) -> pa.Table:
    return batch.filter(pc.greater(batch["n"], thr))


def q_heavy_hitters_mg(sf_dir: str) -> rd.Dataset:
    """Users above n_total // HH_DEN of the planted stream, exact counts.

    Candidate math: summed MG weights satisfy w_sum(u) >= true(u) -
    n_total/(MG_K+1), so every true heavy key lands above lb = n//HH_DEN
    - n//(MG_K+1) - 1; and since block weights sum to <= n_total, at most
    ~n/lb (~62) candidates exist — the broadcast list is driver-bounded
    by construction, not by luck."""
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "events"))
    ev = _t(sf_dir, "events", ["event_id", "user_id"])
    agg = (
        ev.map_batches(
            remote_fn(_QT, "hh_mg_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby("user_id")
        .aggregate(Sum("w", alias_name="w"))
        .materialize()  # <= (MG_K+1) x blocks rows, reused twice
    )
    total_rows = agg.map_batches(
        remote_fn(_QT, "hh_filter_partial", lo=0, sentinel=True),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    n_total = int(total_rows[0]["w"])
    lb = n_total // HH_DEN - n_total // (MG_K + 1) - 1
    cand_rows = agg.map_batches(
        remote_fn(_QT, "hh_filter_partial", lo=lb, sentinel=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # <= ~n/lb rows — counting-bound small
    cands = sorted(int(r["user_id"]) for r in cand_rows)
    return (
        ev.map_batches(
            remote_fn(_QT, "hh_exact_partial", cands=cands),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            remote_fn(_QT, "hh_threshold_partial", thr=n_total // HH_DEN),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_HEAVY_HITTERS_MG = f"""
WITH ev AS (
  SELECT CASE WHEN event_id % 10 < 5 THEN event_id % 5 ELSE user_id END
           AS user_id
  FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM ev GROUP BY user_id
HAVING COUNT(*) > (SELECT COUNT(*) // {HH_DEN} FROM ev)
"""


# ======================================================================
# KREC source scan
# ======================================================================
def recfile_agg_partial(batch: pa.Table) -> pa.Table:
    """Per-block (lang, crc_ok) doc/byte counts — the scan combiner."""
    g = (
        batch.select(["lang", "crc_ok", "n_bytes"])
        .group_by(["lang", "crc_ok"])
        .aggregate([("n_bytes", "count"), ("n_bytes", "sum")])
    )
    return select_rename(
        g,
        lang="lang",
        crc_ok="crc_ok",
        n_docs="n_bytes_count",
        n_bytes="n_bytes_sum",
    )


def q_recfile_scan(sf_dir: str) -> rd.Dataset:
    """Scan the KREC shards (streaming per-file datasource read) into
    per-(lang, crc_ok) doc and payload-byte counts. crc failures are
    in-band rows, never raises (reference error-row convention)."""
    from ..sources.recfile import KrecDatasource, synthesize_recfiles

    shard_dir = synthesize_recfiles(sf_dir)
    ds = rd.read_datasource(KrecDatasource(shard_dir))
    return (
        ds.map_batches(
            remote_fn(_QT, "recfile_agg_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(coalesce_for_input(table_nbytes(sf_dir, "documents")))
        .groupby(["lang", "crc_ok"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_bytes", alias_name="n_bytes"),
        )
    )


SQL_RECFILE_SCAN = """
SELECT lang,
       CAST(doc_id % 37 != 5 AS BIGINT) AS crc_ok,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(encode(COALESCE(text, '')))) AS BIGINT)
         AS n_bytes
FROM documents
GROUP BY lang, crc_ok
"""


# ======================================================================
# Content-defined-chunking dedup (Gear/FastCDC-family rolling hash)
# ======================================================================
# CDC finds duplicate byte ranges across near-identical documents (crawl
# re-fetches, template pages) without any alignment assumption: chunk
# boundaries depend only on local content, so an insertion early in a doc
# shifts NO downstream boundaries — unlike fixed-size blocks. The rolling
# hash is the Gear recurrence h_i = (h_{i-1} << 1) + GEAR[b_i]; because a
# 64-bit shift forgets bytes > 63 positions back, the recurrence equals
# the 64-term convolution sum_{k<64} GEAR[b_{i-k}] << k, which is what
# the vectorized kernel computes (64 shifted adds over the batch, no
# per-byte Python). Runs over the planted-variant corpus
# (stages.dedup.docs_with_variants) so true duplicate chunks exist.
_M64 = (1 << 64) - 1
CDC_MASK = 0x3F          # 6 bits -> expected chunk ~64 bytes at toy doc sizes
CDC_MIN, CDC_MAX = 16, 256
CDC_POS_SCALE = 1 << 20  # pos = doc_id * SCALE + chunk_idx (global order key)


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


GEAR = np.array([_splitmix64(b) for b in range(256)], dtype=np.uint64)


def cdc_cuts(data: bytes) -> List[Tuple[int, int]]:
    """(start, length) chunks of one document under Gear CDC with
    min/max enforcement. The only Python walk runs over HASH HITS
    (expected n / 2^mask_bits positions), not bytes."""
    n = len(data)
    if n == 0:
        return []
    gb = GEAR[np.frombuffer(data, dtype=np.uint8)]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(64, n)):
        h[k:] += gb[: n - k] << np.uint64(k)
    hits = np.nonzero((h & np.uint64(CDC_MASK)) == 0)[0]
    out: List[Tuple[int, int]] = []
    s = 0
    for p in hits:
        ln = int(p) + 1 - s
        if ln < CDC_MIN:
            continue
        while ln > CDC_MAX:  # forced max-size cuts
            out.append((s, CDC_MAX))
            s += CDC_MAX
            ln = int(p) + 1 - s
        if ln >= CDC_MIN:
            out.append((s, ln))
            s = int(p) + 1
    ln = n - s
    while ln > CDC_MAX:
        out.append((s, CDC_MAX))
        s += CDC_MAX
        ln = n - s
    if ln > 0:
        out.append((s, ln))
    return out


def cdc_occurrence_partial(batch: pa.Table) -> pa.Table:
    """Per-doc CDC chunking -> occurrence rows (chash, doc_id, cidx,
    clen, pos). chash is the top-63 bits of blake2b-64 of the chunk
    bytes (int64-safe; a deployment would carry 128 bits — noted)."""
    import hashlib

    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    chash: List[int] = []
    doc_id: List[int] = []
    cidx: List[int] = []
    clen: List[int] = []
    for d, t in zip(ids, texts):
        data = (t or "").encode("utf-8")
        for i, (s, ln) in enumerate(cdc_cuts(data)):
            hsh = int.from_bytes(
                hashlib.blake2b(data[s : s + ln], digest_size=8).digest(), "big"
            ) >> 1
            chash.append(hsh)
            doc_id.append(int(d))
            cidx.append(i)
            clen.append(ln)
    pos = [d * CDC_POS_SCALE + i for d, i in zip(doc_id, cidx)]
    return pa.table(
        {
            "chash": pa.array(chash, pa.int64()),
            "doc_id": pa.array(doc_id, pa.int64()),
            "cidx": pa.array(cidx, pa.int64()),
            "clen": pa.array(clen, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        }
    )


def cdc_doc_partial(batch: pa.Table) -> pa.Table:
    """Joined occurrence rows -> per-(doc, block) dedup accounting
    combiner. A chunk is a duplicate iff it is not its hash's globally
    first occurrence (min pos)."""
    dup = pc.cast(pc.not_equal(batch["pos"], batch["first_pos"]), pa.int64())
    t = pa.table(
        {
            "doc_id": batch["doc_id"],
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64), pa.int64()),
            "clen": batch["clen"],
            "dup": dup,
            "dup_len": pc.multiply(dup, batch["clen"]),
        }
    )
    g = t.group_by("doc_id").aggregate(
        [("one", "sum"), ("clen", "sum"), ("dup", "sum"), ("dup_len", "sum")]
    )
    return select_rename(
        g,
        doc_id="doc_id",
        n_chunks="one_sum",
        n_bytes="clen_sum",
        dup_chunks="dup_sum",
        dup_bytes="dup_len_sum",
    )


def q_cdc_chunk_dedup(sf_dir: str) -> rd.Dataset:
    """Per-doc CDC dedup accounting over the planted-variant corpus:
    (doc_id, n_chunks, n_bytes, dup_chunks, dup_bytes). Variant docs
    share nearly every chunk with their base, so dup_bytes exposes the
    redundancy CDC is built to find. Scale plan: the occurrence stream is
    materialized ONCE (reused by the winner aggregate and the join
    probe — the reused-working-set rule; a 100 TB run would stage-
    checkpoint it instead), the winner exchange and the join move slim
    (chash, ints) rows only — chunk BYTES never shuffle."""
    from ..joins import partitions_for_rows, safe_join
    from ..stages.dedup import docs_with_variants

    occ = (
        docs_with_variants(sf_dir)
        .map_batches(
            remote_fn(_QT, "cdc_occurrence_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    winners = (
        occ.groupby("chash")
        .aggregate(Min("pos", alias_name="first_pos"))
        .rename_columns({"chash": "w_chash"})
    )
    joined = safe_join(
        occ.select_columns(["chash", "doc_id", "clen", "pos"]),
        winners,
        on=("chash",),
        right_on=("w_chash",),
        assume_non_empty=True,  # every occurrence's hash has a winner row
        num_partitions=partitions_for_rows(occ.count()),
    )
    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    return (
        joined.map_batches(
            remote_fn(_QT, "cdc_doc_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby("doc_id")
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_bytes", alias_name="n_bytes"),
            Sum("dup_chunks", alias_name="dup_chunks"),
            Sum("dup_bytes", alias_name="dup_bytes"),
        )
    )


# ======================================================================
# Triangle counting over a planted doc-derived graph
# ======================================================================
# The degree-oriented ("forward") algorithm: orient every undirected edge
# from its lower-(degree, id) endpoint to the higher one; generate wedge
# pairs only among a vertex's oriented OUT-neighbors (out-degree is
# O(sqrt(m)) after orientation — the hub-blowup guard); close each wedge
# against the canonical undirected edge set. Each triangle is found
# exactly once, at its lowest-(degree, id) vertex. Edges derive
# deterministically from doc_ids (synthesize-on-read convention, same as
# the pagerank planted outlinks) so a static SQL twin recomputes the
# whole computation relationally.
TRI_NODES = 100


def tri_edges_partial(batch: pa.Table) -> pa.Table:
    """doc_id -> canonical undirected edge (lo, hi), per-block distinct."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = d % TRI_NODES
    v = (d // 7) % TRI_NODES
    keep = u != v
    lo = np.minimum(u[keep], v[keep])
    hi = np.maximum(u[keep], v[keep])
    return (
        pa.table(
            {"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())}
        )
        .group_by(["lo", "hi"])
        .aggregate([])
    )


def tri_deg_partial(batch: pa.Table) -> pa.Table:
    """Edge rows -> (node, 1) both endpoints (degree combiner feed)."""
    lo = batch["lo"].to_numpy(zero_copy_only=False)
    hi = batch["hi"].to_numpy(zero_copy_only=False)
    node = np.concatenate([lo, hi]).astype(np.int64)
    return pa.table(
        {
            "node": pa.array(node, pa.int64()),
            "one": pa.array(np.ones(len(node), dtype=np.int64), pa.int64()),
        }
    )


def tri_orient_partial(batch: pa.Table) -> pa.Table:
    """Degree-joined edges -> oriented (src, dst): src is the endpoint
    with the smaller (degree, node) pair."""
    lo = batch["lo"].to_numpy(zero_copy_only=False)
    hi = batch["hi"].to_numpy(zero_copy_only=False)
    dlo = batch["deg_lo"].to_numpy(zero_copy_only=False)
    dhi = batch["deg_hi"].to_numpy(zero_copy_only=False)
    lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
    src = np.where(lo_first, lo, hi)
    dst = np.where(lo_first, hi, lo)
    return pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )


def tri_wedges_group(g) -> "object":
    """One oriented-adjacency group -> wedge pairs among out-neighbors,
    canonicalized (lo, hi) for closure against the undirected edge set.
    Out-degree is orientation-bounded, so C(outdeg, 2) stays task-sized."""
    import pandas as pd

    nbrs = np.sort(g["dst"].to_numpy())
    if len(nbrs) < 2:
        return pd.DataFrame({"apex": [], "wlo": [], "whi": []}).astype("int64")
    iu, ju = np.triu_indices(len(nbrs), k=1)
    return pd.DataFrame(
        {
            "apex": np.full(len(iu), int(g["src"].iloc[0]), dtype=np.int64),
            "wlo": nbrs[iu],
            "whi": nbrs[ju],
        }
    )


def tri_nodes_partial(batch: pa.Table) -> pa.Table:
    """Closed wedges (triangles) -> (node, 1) x3 combiner feed."""
    a = batch["apex"].to_numpy(zero_copy_only=False)
    lo = batch["wlo"].to_numpy(zero_copy_only=False)
    hi = batch["whi"].to_numpy(zero_copy_only=False)
    node = np.concatenate([a, lo, hi]).astype(np.int64)
    t = pa.table(
        {
            "node": pa.array(node, pa.int64()),
            "one": pa.array(np.ones(len(node), dtype=np.int64), pa.int64()),
        }
    )
    g = t.group_by("node").aggregate([("one", "sum")])
    return select_rename(g, node="node", n_triangles="one_sum")


def q_doc_graph_triangles(sf_dir: str) -> rd.Dataset:
    """Per-node triangle counts of the planted doc graph."""
    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    edges = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QT, "tri_edges_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(width)
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="c_"))
        .select_columns(["lo", "hi"])
        .materialize()  # reused: degree feed, orientation, wedge closure
    )
    n_edges = edges.count()
    deg = (
        edges.map_batches(
            remote_fn(_QT, "tri_deg_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("node")
        .aggregate(Sum("one", alias_name="deg"))
    )
    e1 = safe_join(
        edges,
        deg.rename_columns({"node": "n_lo", "deg": "deg_lo"}),
        on=("lo",),
        right_on=("n_lo",),
        assume_non_empty=True,  # every edge endpoint has a degree row
        num_partitions=partitions_for_rows(n_edges),
    )
    e2 = safe_join(
        e1,
        deg.rename_columns({"node": "n_hi", "deg": "deg_hi"}),
        on=("hi",),
        right_on=("n_hi",),
        assume_non_empty=True,
        num_partitions=partitions_for_rows(n_edges),
    )
    wedges = (
        e2.map_batches(
            remote_fn(_QT, "tri_orient_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("src")
        .map_groups(remote_fn(_QT, "tri_wedges_group"), batch_format="pandas")
    )
    closed = safe_join(
        wedges,
        edges.rename_columns({"lo": "e_lo", "hi": "e_hi"}),
        on=("wlo", "whi"),
        right_on=("e_lo", "e_hi"),
        assume_non_empty=True,  # the planted graph always closes wedges
        num_partitions=partitions_for_rows(n_edges),
    )
    return (
        closed.map_batches(
            remote_fn(_QT, "tri_nodes_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("node")
        .aggregate(Sum("n_triangles", alias_name="n_triangles"))
    )


SQL_DOC_GRAPH_TRIANGLES = f"""
WITH e AS (
  SELECT DISTINCT
         LEAST(doc_id % {TRI_NODES}, (doc_id // 7) % {TRI_NODES}) AS lo,
         GREATEST(doc_id % {TRI_NODES}, (doc_id // 7) % {TRI_NODES}) AS hi
  FROM documents
  WHERE doc_id % {TRI_NODES} != (doc_id // 7) % {TRI_NODES}),
t AS (
  SELECT a.lo AS x, a.hi AS y, b.hi AS z
  FROM e a
  JOIN e b ON b.lo = a.lo AND b.hi > a.hi
  JOIN e c ON c.lo = a.hi AND c.hi = b.hi)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT x AS node FROM t
      UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t)
GROUP BY node
"""


# ======================================================================
# Returned-items revenue rollup (TPC-H Q10 shape: 4-table join chain)
# ======================================================================
def q10_rev_partial(batch: pa.Table) -> pa.Table:
    """Returned lineitems -> per-(orderkey, block) revenue-cents combiner:
    the fact table reduces to slim (orderkey, cents) BEFORE any join."""
    flt = batch.filter(pc.equal(batch["l_returnflag"], "R"))
    rev = pc.cast(
        pc.floor(
            pc.add(
                pc.multiply(
                    pc.multiply(
                        flt["l_extendedprice"], pc.subtract(1.0, flt["l_discount"])
                    ),
                    100.0,
                ),
                0.5,
            )
        ),
        pa.int64(),
    )
    g = (
        pa.table({"l_orderkey": flt["l_orderkey"], "rev": rev})
        .group_by("l_orderkey")
        .aggregate([("rev", "sum")])
    )
    return select_rename(g, l_orderkey="l_orderkey", rev_cents="rev_sum")


def q10_cust_partial(batch: pa.Table) -> pa.Table:
    """Order-joined revenue rows -> per-(custkey, block) combiner."""
    g = (
        batch.select(["o_custkey", "rev_cents"])
        .group_by("o_custkey")
        .aggregate([("rev_cents", "sum")])
    )
    return select_rename(g, o_custkey="o_custkey", revenue_cents="rev_cents_sum")


def q10_recombine(batch: pa.Table) -> pa.Table:
    """Re-collapse already-partial (custkey, revenue) rows after the
    coalescing repartition — partials of partials sum exactly."""
    g = batch.group_by("o_custkey").aggregate([("revenue_cents", "sum")])
    return select_rename(
        g, o_custkey="o_custkey", revenue_cents="revenue_cents_sum"
    )


def q_returned_revenue_topk(sf_dir: str) -> rd.Dataset:
    """Top-20 customers by returned-item revenue with name and nation —
    the classic selective-filter -> fact-rollup -> dimension-chain query
    (TPC-H Q10 shape). Scale plan: the fact table collapses to
    (orderkey, cents) map-side before the first join; both fact joins are
    streaming (FK-backed, byte-sized); the dimension chain joins only the
    20 winners. TPC-H's returnflag domain guarantees 'R' rows exist, so
    the inner joins are structurally non-empty."""
    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    li_nb = table_nbytes(sf_dir, "lineitem")
    # custkey rollup is HIGH-CARDINALITY: Ray's aggregate pays per-key
    # cost in the reduce, so width follows key count (customer footer
    # rows, free), not just bytes (io.coalesce_for_keys)
    w_cust = coalesce_for_keys(li_nb, table_nrows(sf_dir, "customer"))
    # NO orderkey pre-rollup: Ray's aggregate cost scales with KEY COUNT
    # (orders-cardinality), so collapsing per-order before the join costs
    # more than it saves — the map-side combiner partials join directly
    # and the single custkey aggregate sums them exactly (integer cents,
    # order-independent). Measured 9.7 s -> see BENCH (round 4).
    rev = _t(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(
        remote_fn(_QT, "q10_rev_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = safe_join(
        rev,
        orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        assume_non_empty=True,  # returnflag domain guarantees 'R' rows
        left_nbytes=li_nb // 8,
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    top = (
        joined.map_batches(
            remote_fn(_QT, "q10_cust_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(w_cust)
        # second combiner pass over the coalesced blocks: Ray's aggregate
        # costs scale with INPUT ROWS, so shrinking per-block partials
        # from (#join blocks x keys) to (w_cust x keys) pays directly
        .map_batches(
            remote_fn(_QT, "q10_recombine"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("o_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(20)
        .materialize()  # 20 rows; reused as the dimension-join probe
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    w = partitions_for_rows(20)
    t1 = safe_join(
        top, cust, on=("o_custkey",), right_on=("c_custkey",),
        assume_non_empty=True, num_partitions=w,
    )
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    t2 = safe_join(
        t1, nation, on=("c_nationkey",), right_on=("n_nationkey",),
        assume_non_empty=True, num_partitions=w,
    )
    return t2.select_columns(
        ["o_custkey", "c_name", "n_name", "revenue_cents"]
    ).rename_columns({"o_custkey": "c_custkey"}).sort(
        ["revenue_cents", "c_custkey"], descending=[True, False]
    )


SQL_RETURNED_REVENUE_TOPK = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT 20
"""


# ======================================================================
# Temperature (alpha) language resampling — mC4 / XLM-R mix flattening
# ======================================================================
TEMP_ALPHA = 0.3
TEMP_SCALE = 1_000_000


def temperature_thresholds(counts: dict) -> dict:
    """lang -> integer acceptance threshold in [0, TEMP_SCALE] for
    alpha-temperature sampling: rate_l proportional to p_l^(alpha-1),
    normalized so the rarest language keeps everything. Computed ONCE
    from the |langs|-row count table (driver scalars, same doubles on
    both engines since the operation order is fixed); SHARED by the
    distributed plan and the sequential twin so every float is computed
    exactly once, identically."""
    total = sum(counts.values())
    rates = {
        lang: (n / total) ** (TEMP_ALPHA - 1.0) for lang, n in sorted(counts.items())
    }
    mx = max(rates.values())
    return {
        lang: min(TEMP_SCALE, int(r / mx * TEMP_SCALE)) for lang, r in rates.items()
    }


def temp_count_partial(batch: pa.Table) -> pa.Table:
    g = batch.select(["lang"]).group_by("lang").aggregate([("lang", "count")])
    return select_rename(g, lang="lang", n="lang_count")


def temp_filter_partial(batch: pa.Table, thresholds: dict) -> pa.Table:
    """Deterministic multiplicative-hash Bernoulli keep + re-aggregate
    combiner (same rule family as resample_weighted / train_test_split)."""
    from .queries_window import RESAMPLE_MULT

    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lang = batch["lang"].to_numpy(zero_copy_only=False)
    n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    thr = np.array([thresholds.get(str(x), 0) for x in lang], dtype=np.int64)
    keep = ((doc_id % 2147483647) * RESAMPLE_MULT) % TEMP_SCALE < thr
    t = pa.table(
        {
            "lang": pa.array(lang[keep], pa.string()),
            "kept_docs": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            "kept_chars": pa.array(n_chars[keep], pa.int64()),
        }
    )
    g = t.group_by("lang").aggregate(
        [("kept_docs", "sum"), ("kept_chars", "sum")]
    )
    return select_rename(
        g, lang="lang", kept_docs="kept_docs_sum", kept_chars="kept_chars_sum"
    )


def q_temperature_sample(sf_dir: str) -> rd.Dataset:
    """Per-lang kept docs/chars after alpha=0.3 temperature sampling.
    Pass 1 reduces to one count per language; pass 2 is map-only with
    the broadcast integer thresholds — the corpus never shuffles."""
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    counts = (
        _t(sf_dir, "documents", ["lang"])
        .map_batches(
            remote_fn(_QT, "temp_count_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # one row per language — bounded
    )
    thresholds = temperature_thresholds(
        dict(zip(counts["lang"].tolist(), counts["n"].astype(int).tolist()))
    )
    return (
        _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(
            remote_fn(_QT, "temp_filter_partial", thresholds=thresholds),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("lang")
        .aggregate(
            Sum("kept_docs", alias_name="kept_docs"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
    )


TRAIN_QUERIES = {
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "bpe_fertility": q_bpe_fertility,
    "compression_ratio": q_compression_ratio,
    "table_profile": q_table_profile,
    "heavy_hitters_mg": q_heavy_hitters_mg,
    "recfile_scan": q_recfile_scan,
    "cdc_chunk_dedup": q_cdc_chunk_dedup,
    "doc_graph_triangles": q_doc_graph_triangles,
    "returned_revenue_topk": q_returned_revenue_topk,
    "temperature_sample": q_temperature_sample,
}

# static-SQL oracles; bpe_merges / compression_ratio / cdc_chunk_dedup
# are dump-twin checked (state/oracle_dump_train.py)
TRAIN_ORACLES = {
    "table_profile": SQL_TABLE_PROFILE,
    "heavy_hitters_mg": SQL_HEAVY_HITTERS_MG,
    "recfile_scan": SQL_RECFILE_SCAN,
    "doc_graph_triangles": SQL_DOC_GRAPH_TRIANGLES,
    "returned_revenue_topk": SQL_RETURNED_REVENUE_TOPK,
}
