"""Evaluation / training-order operators over the synthetic corpus.

Round-4 widening of the training-data engine surface (the reference,
/root/reference/app.py, is a single-document extractor; these are the
corpus-level evaluation and data-ordering steps an LLM pipeline runs
after extraction):

- ``score_auc`` — distributed ROC-AUC of a per-document score as a
  binary-class predictor, computed exactly via the Mann-Whitney
  rank-sum with average-rank tie handling. The corpus never shuffles:
  a per-batch (score, n, n_pos) combiner reduces to one row per
  DISTINCT score value (bounded by the score domain, not the corpus),
  and the closed form runs on the driver in exact Python ints.
- ``shuffle_shards`` — deterministic training-shard assignment: every
  doc hashes to one of 32 shards with a multiplicative hash (the
  global-shuffle step before writing training data; at 100 TB the
  same map assigns shard files without a random_shuffle all-to-all).
  Per-shard stats reduce map-side; the first document of each shard
  (the shard's hash-order head) comes from a packed int64 argmin so
  the combiner stays a plain Min.
- ``events_ewma`` — per-user exponentially-decayed activity score over
  the 16 most recent events (weight 2^(16-d) for the d-th latest),
  exact int64 numerator/denominator — the streaming decayed-feature
  operator. A per-batch top-16-per-user combiner (a superset filter:
  the global top-16 is contained in the union of per-batch top-16s)
  keeps the exchange slim; groups at the final merge hold <= 16 rows
  per upstream block.
- ``curriculum_order`` — curriculum training order: rank docs within
  each source by quality (n_chars desc), then interleave sources
  round-robin into a global position. Both ranks are computed with the
  sort + run-tag + driver-offset pattern (same machinery class as
  ccnet_buckets): no per-source giant groups, driver state is
  O(sorted-runs), never per-doc.

All four carry static DuckDB oracles over the driver's views with
identical integer arithmetic.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..functions.arrowkit import select_rename
from ..io import coalesce_for_input, table_nbytes
from ..remote import remote_fn

_QE = "khl_pdf_ocr_ray.pipelines.queries_eval"

AUC_POS_LANG = "en"  # positive class for the AUC check
AUC_SCALE = 1_000_000

SHARD_K = 32
SHARD_MOD = 1_000_003  # prime; ((id % 2^31-1) * Knuth) % MOD, same family
SHARD_PACK = 4_294_967_296  # 2^32: packed argmin key = pos_h * 2^32 + doc_id

EWMA_WINDOW = 16  # d-th latest event weighs 2^(EWMA_WINDOW - d)

CURR_LEN_CAP = 1_000_000  # fixed-width descending-length sort key


# ======================================================================
# score_auc — exact Mann-Whitney AUC via a distinct-score reduction
# ======================================================================
def auc_partial(batch: pa.Table) -> pa.Table:
    """(score, n, n_pos) per distinct score value in the batch."""
    import pyarrow.compute as pc

    t = pa.table(
        {
            "score": batch["n_chars"],
            "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            "pos": pc.cast(
                pc.equal(batch["lang"], AUC_POS_LANG), pa.int64()
            ),
        }
    )
    g = t.group_by("score").aggregate([("one", "sum"), ("pos", "sum")])
    return select_rename(g, score="score", n="one_sum", n_pos="pos_sum")


def q_score_auc(sf_dir: str) -> pa.Table:
    """AUC of n_chars predicting lang == 'en', exact under ties.

    2*avg_rank of a value tied with n others above cum_less smaller
    values is 2*cum_less + n + 1; AUC = (2U) / (2 * n_pos * n_neg) with
    2U = sum_pos(2*avg_rank) - n_pos*(n_pos+1). Driver math in Python
    ints (no overflow at any corpus size); the only exchange is the
    distinct-score groupby."""
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    g = (
        _t(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(
            remote_fn(_QE, "auc_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("score")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
        .to_pandas()  # one row per distinct score value — bounded domain
        .sort_values("score")
    )
    n = [int(x) for x in g["n"]]
    npos = [int(x) for x in g["n_pos"]]
    n_pos, n_neg = sum(npos), sum(n) - sum(npos)
    two_ranksum, cum_less = 0, 0
    for ni, pi in zip(n, npos):
        two_ranksum += pi * (2 * cum_less + ni + 1)
        cum_less += ni
    auc = (two_ranksum - n_pos * (n_pos + 1)) * AUC_SCALE // (2 * n_pos * n_neg)
    return pa.table(
        {
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "auc_x1e6": pa.array([auc], pa.int64()),
        }
    )


SQL_SCORE_AUC = f"""
WITH s AS (
  SELECT n_chars AS score,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = '{AUC_POS_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM documents GROUP BY 1),
o AS (
  SELECT score, n, np,
         CAST(COALESCE(SUM(n) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_less
  FROM s),
t AS (
  SELECT CAST(SUM(np * (2 * cum_less + n + 1)) AS BIGINT) AS two_ranksum,
         CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(n - np) AS BIGINT) AS n_neg
  FROM o)
SELECT n_pos, n_neg,
       CAST((two_ranksum - n_pos * (n_pos + 1)) * {AUC_SCALE}
            // (2 * n_pos * n_neg) AS BIGINT) AS auc_x1e6
FROM t
"""


# ======================================================================
# shuffle_shards — deterministic hash shard assignment + per-shard stats
# ======================================================================
def shard_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-shard (n_docs, n_chars, min packed head key)."""
    from .queries_window import RESAMPLE_MULT

    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (doc_id >= 0).all() and (doc_id < SHARD_PACK).all()
    pos_h = ((doc_id % 2147483647) * RESAMPLE_MULT) % SHARD_MOD
    t = pa.table(
        {
            "shard_id": pa.array(pos_h % SHARD_K, pa.int64()),
            "n_docs": pa.array(np.ones(len(doc_id), dtype=np.int64)),
            "n_chars": pa.array(n_chars, pa.int64()),
            "packed": pa.array(pos_h * SHARD_PACK + doc_id, pa.int64()),
        }
    )
    g = t.group_by("shard_id").aggregate(
        [("n_docs", "sum"), ("n_chars", "sum"), ("packed", "min")]
    )
    return select_rename(
        g,
        shard_id="shard_id",
        n_docs="n_docs_sum",
        n_chars="n_chars_sum",
        packed="packed_min",
    )


def shard_finalize(batch: pa.Table) -> pa.Table:
    packed = batch["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "shard_id": batch["shard_id"],
            "n_docs": batch["n_docs"],
            "n_chars": batch["n_chars"],
            "first_doc_id": pa.array(packed % SHARD_PACK, pa.int64()),
        }
    )


def q_shuffle_shards(sf_dir: str) -> rd.Dataset:
    """32-shard deterministic training shuffle: map-side per-shard
    partials, one 32-group reduce, map-only decode. No row-level
    shuffle anywhere — the assignment IS the map."""
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    return (
        _t(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(
            remote_fn(_QE, "shard_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("shard_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
            Min("packed", alias_name="packed"),
        )
        .map_batches(
            remote_fn(_QE, "shard_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_SHUFFLE_SHARDS = f"""
WITH h AS (
  SELECT doc_id, n_chars,
         ((doc_id % 2147483647) * 2654435761) % {SHARD_MOD} AS pos_h
  FROM documents)
SELECT pos_h % {SHARD_K} AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(min(pos_h * {SHARD_PACK} + doc_id) % {SHARD_PACK}
            AS BIGINT) AS first_doc_id
FROM h GROUP BY 1
"""


# ======================================================================
# events_ewma — per-user decayed activity over the 16 latest events
# ======================================================================
def ewma_candidates(batch: pa.Table) -> pa.Table:
    """Top-EWMA_WINDOW most recent events per user within the batch —
    a superset combiner for the global per-user top-16."""
    user = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    ts_us = ts.astype(np.int64)
    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = batch["value"].to_numpy(zero_copy_only=False)
    cents = np.floor(val * 100 + 0.5).astype(np.int64)
    # sort (user asc, ts desc, eid desc); position-within-run <= W keeps
    order = np.lexsort((-eid, -ts_us, user))
    u = user[order]
    starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
    run_start = np.repeat(starts, np.diff(np.r_[starts, len(u)]))
    keep = (np.arange(len(u)) - run_start) < EWMA_WINDOW
    sel = order[keep]
    return pa.table(
        {
            "user_id": pa.array(user[sel], pa.int64()),
            "ts_us": pa.array(ts_us[sel], pa.int64()),
            "event_id": pa.array(eid[sel], pa.int64()),
            "cents": pa.array(cents[sel], pa.int64()),
        }
    )


def ewma_per_user(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts_us", "event_id"], ascending=False).head(EWMA_WINDOW)
    d = np.arange(1, len(g) + 1, dtype=np.int64)
    w = np.int64(1) << (EWMA_WINDOW - d)
    cents = g["cents"].to_numpy()
    return pd.DataFrame(
        {
            "user_id": np.array([int(g["user_id"].iloc[0])], dtype=np.int64),
            "ewma_num": np.array([int((cents * w).sum())], dtype=np.int64),
            "ewma_den": np.array([int(w.sum())], dtype=np.int64),
            "n_recent": np.array([len(g)], dtype=np.int64),
        }
    )


def q_events_ewma(sf_dir: str) -> rd.Dataset:
    """Per-user decayed activity score (exact integer EWMA numerator /
    denominator over the 16 latest events). The per-batch candidate
    filter bounds the shuffle at 16 rows per (user, block)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .map_batches(
            remote_fn(_QE, "ewma_candidates"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(remote_fn(_QE, "ewma_per_user"), batch_format="pandas")
    )


SQL_EVENTS_EWMA = f"""
WITH o AS (
  SELECT user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS d
  FROM events)
SELECT user_id,
       CAST(sum(cents * (CAST(1 AS BIGINT) << ({EWMA_WINDOW} - d)))
            AS BIGINT) AS ewma_num,
       CAST(sum(CAST(1 AS BIGINT) << ({EWMA_WINDOW} - d)) AS BIGINT)
            AS ewma_den,
       CAST(count(*) AS BIGINT) AS n_recent
FROM o WHERE d <= {EWMA_WINDOW} GROUP BY user_id
"""


# ======================================================================
# curriculum_order — per-source quality rank, round-robin global order
# ======================================================================
def curr_tag_batch(batch: pa.Table, part_col: str, key_cols: List[str]) -> pa.Table:
    """Run-tag one contiguous batch of a materialized global sort (same
    contract as ccnet_tag_batch, generalized): every row gets the
    batch's first sort key as ``bkey`` (fixed-width, so bkey string
    order == sort order) and its within-batch local rank counted per
    ``part_col`` value."""
    if len(batch) == 0:
        return batch.append_column("bkey", pa.array([], pa.string())) \
                    .append_column("local_rank", pa.array([], pa.int64()))
    parts = batch[part_col].to_pylist()
    keys = [batch[c].to_pylist() for c in key_cols]

    def fmt(v) -> str:
        if isinstance(v, str):
            return v
        assert int(v) >= 0
        return f"{int(v):012d}"

    # fixed-width numerics + '\t' separators keep bkey string order equal
    # to the sort order; key_cols must be the FULL sort key so two runs
    # can never share a bkey
    bkey = "\t".join(fmt(k[0]) for k in keys)
    seen: Dict[str, int] = {}
    local = []
    for p in parts:
        local.append(seen.get(p, 0))
        seen[p] = seen.get(p, 0) + 1
    n = len(parts)
    return batch.append_column("bkey", pa.array([bkey] * n, pa.string())) \
                .append_column("local_rank", pa.array(local, pa.int64()))


def curr_part_partial(batch: pa.Table, part_col: str) -> pa.Table:
    g = batch.select(["bkey", part_col]).group_by(["bkey", part_col]).aggregate(
        [(part_col, "count")]
    )
    return select_rename(g, bkey="bkey", part=part_col, n=f"{part_col}_count")


def curr_offsets(parts: pd.DataFrame):
    """bkey-sorted (bkey, part, n) partials -> run-start offsets (the
    setdefault guard is the ccnet_offsets chunk-split fix)."""
    offsets: Dict[str, int] = {}
    run: Dict[str, int] = {}
    for r in parts.itertuples():
        offsets.setdefault(f"{r.bkey}|{r.part}", run.get(r.part, 0))
        run[r.part] = run.get(r.part, 0) + int(r.n)
    return offsets


def curr_assign_batch(
    batch: pa.Table, part_col: str, offsets: Dict[str, int], out_col: str
) -> pa.Table:
    parts = batch[part_col].to_pylist()
    bkeys = batch["bkey"].to_pylist()
    local = batch["local_rank"].to_numpy()
    rank = np.asarray(
        [offsets[f"{b}|{p}"] for b, p in zip(bkeys, parts)], dtype=np.int64
    ) + local + 1  # 1-based, SQL ROW_NUMBER
    out = batch.drop_columns(["bkey", "local_rank"])
    return out.append_column(out_col, pa.array(rank, pa.int64()))


def _global_rank(
    ds: rd.Dataset, sort_cols: List[str], part_col: str,
    key_cols: List[str], out_col: str,
) -> rd.Dataset:
    """Global ROW_NUMBER() OVER (PARTITION BY part_col ORDER BY
    sort_cols) via ONE distributed sort, a run-tag pass on the
    materialized order, a (runs x parts)-row driver offset fold, and a
    broadcast assignment — never a per-part group."""
    tagged = (
        ds.sort(sort_cols)
        .map_batches(
            remote_fn(_QE, "curr_tag_batch", part_col=part_col, key_cols=key_cols),
            batch_format="pyarrow",
        )
        .materialize()  # bkey/local_rank must agree between both consumers
    )
    parts = (
        tagged.map_batches(
            remote_fn(_QE, "curr_part_partial", part_col=part_col),
            batch_format="pyarrow",
        )
        .to_pandas()  # one row per (run, part) x part-batch — bounded
        .sort_values("bkey")
    )
    offsets = curr_offsets(parts)
    return tagged.map_batches(
        remote_fn(
            _QE, "curr_assign_batch",
            part_col=part_col, offsets=offsets, out_col=out_col,
        ),
        batch_format="pyarrow",
    )


def curr_neg_len(batch: pa.Table) -> pa.Table:
    n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (n < CURR_LEN_CAP).all() and (n >= 0).all()
    return batch.append_column(
        "neg_len", pa.array(CURR_LEN_CAP - n, pa.int64())
    )


def curr_const(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "_const", pa.array(["x"] * len(batch), pa.string())
    )


def curr_project(batch: pa.Table) -> pa.Table:
    return batch.select(["doc_id", "source", "n_chars", "rnk", "pos"])


def q_curriculum_order(sf_dir: str) -> rd.Dataset:
    """Curriculum training order: quality rank within source (n_chars
    desc, doc_id tiebreak), sources interleaved round-robin into the
    global position. Two sorts, two O(runs) driver folds."""
    from .queries import _t

    ranked = _global_rank(
        _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .map_batches(
            remote_fn(_QE, "curr_neg_len"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        sort_cols=["source", "neg_len", "doc_id"],
        part_col="source",
        key_cols=["source", "neg_len", "doc_id"],
        out_col="rnk",
    )
    # global interleave position: (rnk, source) is unique, one part
    interleaved = _global_rank(
        ranked.map_batches(
            remote_fn(_QE, "curr_const"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        sort_cols=["rnk", "source"],
        part_col="_const",
        key_cols=["rnk", "source"],
        out_col="pos",
    )
    return interleaved.map_batches(
        remote_fn(_QE, "curr_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_CURRICULUM_ORDER = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
  FROM documents)
SELECT doc_id, source, n_chars, rnk,
       CAST(ROW_NUMBER() OVER (ORDER BY rnk, source) AS BIGINT) AS pos
FROM r
"""


# ======================================================================
# top_k_per_group — grouped top-k (k > 1; arg-min/max covers k = 1)
# ======================================================================
TOPK_K = 3


def topk_candidates(batch: pa.Table) -> pa.Table:
    """Per-batch per-type top-K superset (same vectorized run filter as
    ewma_candidates, keyed on (cents desc, event_id asc))."""
    etype = batch["event_type"].to_pylist()
    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = batch["value"].to_numpy(zero_copy_only=False)
    cents = np.floor(val * 100 + 0.5).astype(np.int64)
    codes, _ = pd.factorize(np.asarray(etype))
    order = np.lexsort((eid, -cents, codes))
    c = codes[order]
    starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
    run_start = np.repeat(starts, np.diff(np.r_[starts, len(c)]))
    keep = (np.arange(len(c)) - run_start) < TOPK_K
    sel = order[keep]
    return pa.table(
        {
            "event_type": pa.array([etype[i] for i in sel], pa.string()),
            "event_id": pa.array(eid[sel], pa.int64()),
            "cents": pa.array(cents[sel], pa.int64()),
        }
    )


def topk_per_type(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["cents", "event_id"], ascending=[False, True]).head(TOPK_K)
    return pd.DataFrame(
        {
            "event_type": g["event_type"].astype("string"),
            "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            "event_id": g["event_id"].astype("int64"),
            "cents": g["cents"].astype("int64"),
        }
    )


def q_top_k_per_group(sf_dir: str) -> rd.Dataset:
    """Top-3 events by value per event type (grouped top-k): the
    per-batch superset combiner bounds the shuffle at K rows per
    (type, block); the final groups hold <= K x blocks rows."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(
            remote_fn(_QE, "topk_candidates"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("event_type")
        .map_groups(remote_fn(_QE, "topk_per_type"), batch_format="pandas")
    )


SQL_TOP_K_PER_GROUP = f"""
WITH o AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC,
                       event_id) AS BIGINT) AS rnk
  FROM events)
SELECT event_type, rnk, event_id, cents
FROM o WHERE rnk <= {TOPK_K}
"""


# ======================================================================
# scd2_intervals — slowly-changing-dimension (type 2) build over crawls
# ======================================================================
SCD_SNAPS = 4  # synthetic crawl snapshots 0..3
SCD_CHG_MOD = 3  # doc changes at snapshot s >= 1 iff (doc_id + s) % 3 == 0


def scd2_observe(batch: pa.Table) -> pa.Table:
    """Explode each doc into its per-crawl observations (doc_id, snap,
    content digest). The digest is computed from the observation content
    (text + cumulative revision), exactly like a recrawl pipeline would
    hash each fetched page — downstream sees opaque digests only."""
    import hashlib

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_snap, out_h = [], [], []
    for d, t in zip(ids, texts):
        d = int(d)
        rev = 0
        for s in range(SCD_SNAPS):
            if s >= 1 and (d + s) % SCD_CHG_MOD == 0:
                rev += 1
            h = hashlib.md5(f"{t or ''}|{rev}".encode()).hexdigest()
            out_id.append(d)
            out_snap.append(s)
            out_h.append(h)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "snap": pa.array(out_snap, pa.int64()),
            "h": pa.array(out_h, pa.string()),
        }
    )


def scd2_per_doc(g: pd.DataFrame) -> pd.DataFrame:
    """Collapse one key's snapshot observations into validity intervals:
    a new version starts wherever the digest differs from the previous
    snapshot's; the open (current) interval gets valid_to = -1."""
    g = g.sort_values("snap")
    h = g["h"].to_numpy()
    snap = g["snap"].to_numpy().astype(np.int64)
    starts = np.r_[0, np.flatnonzero(h[1:] != h[:-1]) + 1]
    ends = np.r_[starts[1:], len(h)]
    valid_to = snap[ends - 1] + 1
    valid_to[-1] = -1  # newest version is current
    return pd.DataFrame(
        {
            "doc_id": g["doc_id"].to_numpy()[starts].astype(np.int64),
            "h": h[starts],
            "valid_from": snap[starts],
            "valid_to": valid_to,
        }
    )


def q_scd2_intervals(sf_dir: str) -> rd.Dataset:
    """SCD type-2 dimension build over crawl history: per url key, the
    content-version validity intervals [valid_from, valid_to) derived
    from per-crawl digests (valid_to = -1 marks the current version) —
    the warehouse operator a recrawl pipeline runs to answer "what did
    this page say at crawl t". Only (key, snap, digest) rows shuffle
    (never page content); groups hold |snapshots| rows per key."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            remote_fn(_QE, "scd2_observe"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("doc_id")
        .map_groups(remote_fn(_QE, "scd2_per_doc"), batch_format="pandas")
    )


SQL_SCD2_INTERVALS = f"""
WITH s AS (SELECT CAST(i AS BIGINT) AS snap FROM range({SCD_SNAPS}) t(i)),
c AS (
  SELECT d.doc_id, s.snap, d.text,
         CASE WHEN s.snap >= 1 AND (d.doc_id + s.snap) % {SCD_CHG_MOD} = 0
              THEN 1 ELSE 0 END AS chg
  FROM documents d CROSS JOIN s),
r AS (
  SELECT doc_id, snap,
         md5(coalesce(text, '') || '|' ||
             CAST(CAST(SUM(chg) OVER (PARTITION BY doc_id ORDER BY snap)
                       AS BIGINT) AS VARCHAR)) AS h
  FROM c)
SELECT doc_id, h,
       CAST(min(snap) AS BIGINT) AS valid_from,
       CAST(CASE WHEN max(snap) = {SCD_SNAPS - 1} THEN -1
                 ELSE max(snap) + 1 END AS BIGINT) AS valid_to
FROM r GROUP BY doc_id, h
"""


# ======================================================================
# quantile_normalize — map each source's score distribution onto the
# global distribution (cross-source calibration before mixing corpora)
# ======================================================================
def qn_rank_key(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "_const", pa.array(["x"] * len(batch), pa.string())
    )


def qn_target_rank(
    batch: pa.Table, m_by_source: Dict[str, int], n_total: int
) -> pa.Table:
    """Midpoint-rule target global rank: rank r of m maps to
    ((2r-1)*N) // (2m) + 1 — exact ints, same expression as the SQL."""
    r = batch["rnk"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = batch["source"].to_pylist()
    m = np.asarray([m_by_source[s] for s in src], dtype=np.int64)
    tr = ((2 * r - 1) * n_total) // (2 * m) + 1
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "n_chars": batch["n_chars"],
            "tr": pa.array(tr, pa.int64()),
        }
    )


def qn_gval_project(batch: pa.Table) -> pa.Table:
    return pa.table({"q": batch["pos"], "gval": batch["n_chars"]})


def qn_final_project(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "n_chars": batch["n_chars"],
            "norm_chars": batch["gval"],
        }
    )
    return t


def qn_count_partial(batch: pa.Table) -> pa.Table:
    g = batch.select(["source"]).group_by("source").aggregate(
        [("source", "count")]
    )
    return select_rename(g, source="source", m="source_count")


def q_quantile_normalize(sf_dir: str) -> rd.Dataset:
    """Quantile normalization across sources: each doc's score is
    replaced by the GLOBAL score found at its within-source rank's
    midpoint position — so every source's calibrated distribution is the
    corpus distribution (the cross-source calibration step before corpus
    mixing weights are applied).

    Plan: two global-rank passes (the sort + run-tag + offset machinery
    — per-source and corpus-wide, both ascending so tie order matches
    the SQL exactly), a |sources|-row driver count, and ONE slim
    (doc_id, target_rank) x (rank, value) integer join. Page text never
    moves; both exchanges carry 3-4 int columns."""
    from ..joins import partitions_for_rows, safe_join
    from .queries import _t

    docs = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    counts = (
        docs.map_batches(
            remote_fn(_QE, "qn_count_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("source")
        .aggregate(Sum("m", alias_name="m"))
        .to_pandas()  # one row per source — bounded
    )
    m_by_source = dict(zip(counts["source"], counts["m"].astype(int)))
    n_total = int(counts["m"].sum())

    ranked = _global_rank(
        docs,
        sort_cols=["source", "n_chars", "doc_id"],
        part_col="source",
        key_cols=["source", "n_chars", "doc_id"],
        out_col="rnk",
    )
    targets = ranked.map_batches(
        remote_fn(_QE, "qn_target_rank", m_by_source=m_by_source, n_total=n_total),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    gtable = _global_rank(
        docs.map_batches(
            remote_fn(_QE, "qn_rank_key"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        sort_cols=["n_chars", "doc_id"],
        part_col="_const",
        key_cols=["n_chars", "doc_id"],
        out_col="pos",
    ).map_batches(
        remote_fn(_QE, "qn_gval_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    width = partitions_for_rows(n_total)
    joined = safe_join(
        targets, gtable, on=("tr",), right_on=("q",),
        assume_non_empty=True, num_partitions=width,
    )
    return joined.map_batches(
        remote_fn(_QE, "qn_final_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_QUANTILE_NORMALIZE = """
WITH w AS (
  SELECT doc_id, source, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS m,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM documents),
g AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS q,
         n_chars AS gval
  FROM documents)
SELECT w.doc_id, w.source, w.n_chars, g.gval AS norm_chars
FROM w JOIN g ON ((2 * w.r - 1) * w.n) // (2 * w.m) + 1 = g.q
"""


# ======================================================================
# lang_ols_slope — grouped closed-form least squares (per-language OLS
# of token count on char count), exact integer moments
# ======================================================================
OLS_SCALE = 1_000_000


def ols_moment_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-lang integer moment sums (n, Sx, Sy, Sxx, Sxy) with
    x = n_chars, y = whitespace token count."""
    import pyarrow.compute as pc

    x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = pc.fill_null(batch["text"], "")
    y = pc.list_value_length(pc.split_pattern(texts, " ")).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    t = pa.table(
        {
            "lang": batch["lang"],
            "n": pa.array(np.ones(len(x), dtype=np.int64)),
            "sx": pa.array(x, pa.int64()),
            "sy": pa.array(y, pa.int64()),
            "sxx": pa.array(x * x, pa.int64()),
            "sxy": pa.array(x * y, pa.int64()),
        }
    )
    g = t.group_by("lang").aggregate(
        [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
         ("sxx", "sum"), ("sxy", "sum")]
    )
    return select_rename(
        g, lang="lang", n="n_sum", sx="sx_sum", sy="sy_sum",
        sxx="sxx_sum", sxy="sxy_sum",
    )


def ols_finalize(batch: pa.Table) -> pa.Table:
    """slope_x1e6 = floor((n*Sxy - Sx*Sy) * 1e6 / (n*Sxx - Sx^2)) —
    Python-int math (moment products overflow int64 at corpus scale)."""
    n = batch["n"].to_pylist()
    sx = batch["sx"].to_pylist()
    sy = batch["sy"].to_pylist()
    sxx = batch["sxx"].to_pylist()
    sxy = batch["sxy"].to_pylist()
    slopes = []
    for ni, xi, yi, xxi, xyi in zip(n, sx, sy, sxx, sxy):
        num = (int(ni) * int(xyi) - int(xi) * int(yi)) * OLS_SCALE
        den = int(ni) * int(xxi) - int(xi) * int(xi)
        slopes.append(num // den)
    return pa.table(
        {
            "lang": batch["lang"],
            "n_docs": pa.array([int(v) for v in n], pa.int64()),
            "slope_x1e6": pa.array(slopes, pa.int64()),
        }
    )


def q_lang_ols_slope(sf_dir: str) -> rd.Dataset:
    """Per-language closed-form OLS slope of token count on char count
    (grouped linear regression): one combiner pass reduces the corpus to
    |langs| x blocks moment rows; no second pass, no shuffle of docs."""
    from .queries import _t

    width = coalesce_for_input(table_nbytes(sf_dir, "documents"))
    return (
        _t(sf_dir, "documents", ["lang", "text", "n_chars"])
        .map_batches(
            remote_fn(_QE, "ols_moment_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(max(2, width // 4))
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
        .map_batches(
            remote_fn(_QE, "ols_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_LANG_OLS_SLOPE = f"""
WITH m AS (
  SELECT lang,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(n_chars) AS HUGEINT) AS sx,
         CAST(sum(len(string_split(coalesce(text, ''), ' '))) AS HUGEINT)
           AS sy,
         CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx,
         CAST(sum(CAST(n_chars AS HUGEINT)
                  * len(string_split(coalesce(text, ''), ' ')))
              AS HUGEINT) AS sxy
  FROM documents GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CAST((n * sxy - sx * sy) * {OLS_SCALE} // (n * sxx - sx * sx)
            AS BIGINT) AS slope_x1e6
FROM m
"""


EVAL_QUERIES = {
    "score_auc": q_score_auc,
    "shuffle_shards": q_shuffle_shards,
    "events_ewma": q_events_ewma,
    "curriculum_order": q_curriculum_order,
    "top_k_per_group": q_top_k_per_group,
    "scd2_intervals": q_scd2_intervals,
    "quantile_normalize": q_quantile_normalize,
    "lang_ols_slope": q_lang_ols_slope,
}

EVAL_ORACLES = {
    "top_k_per_group": SQL_TOP_K_PER_GROUP,
    "scd2_intervals": SQL_SCD2_INTERVALS,
    "quantile_normalize": SQL_QUANTILE_NORMALIZE,
    "lang_ols_slope": SQL_LANG_OLS_SLOPE,
    "score_auc": SQL_SCORE_AUC,
    "shuffle_shards": SQL_SHUFFLE_SHARDS,
    "events_ewma": SQL_EVENTS_EWMA,
    "curriculum_order": SQL_CURRICULUM_ORDER,
}
