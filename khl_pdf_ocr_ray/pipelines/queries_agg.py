"""Aggregation/window-family operators, all STATIC-SQL checked: a
BOUNDED sliding ROWS frame, a time-based RANGE frame
(``events_time_window``), ordered string aggregation, width-bucket
discretization, a mergeable DDSketch-style quantile sketch, full CUBE
grouping (``corpus_cube``), ARG_MIN/ARG_MAX (``user_first_last``),
LEAD (``events_lead``), DENSE_RANK with ties (``doc_size_dense_rank``),
calendar extraction (``events_dow_hour``),
semi-structured JSON stats (``props_json_stats``) and UNION DISTINCT
(``big_or_recent_users``). Original four in detail:

- ``events_sliding_window`` — per-user moving sum over the last
  ``SLIDE_W`` events (``ROWS BETWEEN 2 PRECEDING AND CURRENT ROW``):
  the bounded-frame windowed aggregate (``events_running`` in
  queries.py covers the unbounded cumulative frame, ``events_lag`` the
  previous-row access). Difference-of-cumsums inside each user group —
  one vectorized pass, no per-row Python.
- ``region_nation_list`` — ``string_agg(n_name, ',' ORDER BY n_name)``
  per region: the ORDER-SENSITIVE aggregation class (every other
  aggregate in the registry is commutative). Grouped shuffle moves the
  25-row nation dim; the 5-row region name map is broadcast as a static
  kwarg — the reference's master-lookup broadcast pattern
  (khl-pdf-ocr validates names against in-memory master lists the same
  way).
- ``doc_size_hist`` — fixed-width bucketing (SQL ``width_bucket`` /
  integer-division binning) with per-bucket count + char sum: the
  discretization operator. Pure combiner: the shuffle carries one row
  per (bucket, block).
- ``ddsketch_size_quantiles`` — (Masson, Rim & Lee 2019, "DDSketch: a
  fast and fully-mergeable quantile sketch") approximate quantiles from a MERGEABLE
  relative-error sketch (DDSketch/HDR-histogram family, integer-only):
  bucket = (msb octave of n_chars) x 8 linear sub-buckets, guaranteeing
  est <= q_true <= est*(1+1/8)+1. Per-batch bucket partials -> one
  bounded groupby (<= 64*8 = 512 live buckets for int64 inputs, vs
  unbounded distinct sizes for the exact histogram of
  ``doc_size_quantiles``) -> driver walks the tiny cumulative table.
  This is the sketch to reach for when distinct-value cardinality is
  too high for the exact-histogram plan.

Scale notes (100 TB):
- sliding window shuffles on user_id like the other per-user window
  operators (hot users: the salted user-day buckets of
  stages/temporal.py apply unchanged because the frame is row-bounded);
- string_agg groups are dimension-bounded here; for an unbounded
  grouped concat the per-group payload itself is the product — cap or
  spill per group, never concat unbounded strings into one row;
- the histogram and sketch shuffles are bounded by bucket cardinality
  (|sizes|/500 resp. 512 rows per block), not by row count — both are
  safe at any corpus size;
- the sketch's merge is a plain per-bucket integer SUM: commutative,
  associative, and batching-invariant, so the driver-side walk sees
  identical tables regardless of block layout (asserted in
  tests/test_queries_agg.py).

All integer arithmetic (cents, bucket ids, fixed rank formula
``(p*total+99)//100``) so the DuckDB twins hash-match bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.arrowkit import select_rename
from ..io import coalesce_for_input, table_nbytes
from ..remote import remote_fn

_QA = "khl_pdf_ocr_ray.pipelines.queries_agg"

SLIDE_W = 3  # current row + 2 preceding
HIST_WIDTH = 500  # doc-size histogram bucket width (chars)
DD_SUB = 8  # DDSketch linear sub-buckets per power-of-two octave
DD_PS = (50, 90, 99)


# --- events_sliding_window --------------------------------------------------
def sliding_per_user(g: pd.DataFrame) -> pd.DataFrame:
    """One user's (ts, event_id)-ordered stream: moving sum of exact
    cents over the trailing SLIDE_W-row frame, as cumsum differences."""
    g = g.sort_values(["ts", "event_id"])
    cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype("int64")
    cum = np.cumsum(cents)
    win = cum.copy()
    win[SLIDE_W:] = cum[SLIDE_W:] - cum[:-SLIDE_W]
    return pd.DataFrame(
        {
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "win_cents": win,
            "win_n": np.minimum(np.arange(1, len(g) + 1), SLIDE_W).astype("int64"),
        }
    )


def q_events_sliding_window(sf_dir: str) -> rd.Dataset:
    """Trailing 3-event moving sum per user (bounded window frame)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(remote_fn(_QA, "sliding_per_user"), batch_format="pandas")
    )


SQL_EVENTS_SLIDING = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN {SLIDE_W - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS win_cents,
       CAST(least(row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id), {SLIDE_W})
            AS BIGINT) AS win_n
FROM events
"""


# --- region_nation_list -----------------------------------------------------
def nations_concat_group(g: pd.DataFrame, r_name: dict) -> pd.DataFrame:
    """One region's nations: name-ordered comma concat (order-sensitive
    aggregate — sort THEN join, so the result is layout-independent)."""
    names = sorted(g["n_name"].astype(str).tolist())
    key = int(g["n_regionkey"].iloc[0])
    return pd.DataFrame(
        {
            "r_name": [str(r_name[key])],
            "nations": [",".join(names)],
            "n_nations": np.array([len(names)], dtype="int64"),
        }
    )


def q_region_nation_list(sf_dir: str) -> rd.Dataset:
    """Ordered string_agg: comma-joined sorted nation names per region."""
    import os

    import pyarrow.parquet as pq

    from .queries import _t

    # 5-row bounded dimension -> broadcast as plain-data kwargs, exactly
    # like region_revenue's nation->region map (queries_corpus.py).
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    ).to_pydict()
    r_name = {int(k): str(v) for k, v in zip(region["r_regionkey"], region["r_name"])}
    return (
        _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
        .groupby("n_regionkey")
        .map_groups(remote_fn(_QA, "nations_concat_group", r_name=r_name),
                    batch_format="pandas")
    )


SQL_REGION_NATION_LIST = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(count(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- doc_size_hist ----------------------------------------------------------
def hist_bucket_project(batch: pa.Table) -> pa.Table:
    """Integer-division width bucket; int64 // is exact (n_chars >= 0)."""
    b = pc.cast(pc.divide(batch["n_chars"], HIST_WIDTH), pa.int64())
    return pa.table({"bucket": b, "n_chars": pc.cast(batch["n_chars"], pa.int64())})


def q_doc_size_hist(sf_dir: str) -> rd.Dataset:
    """Fixed-width doc-size histogram: count + char mass per 500-char
    bucket. The shuffle moves one row per (bucket, block)."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["n_chars"])
        .map_batches(
            remote_fn(_QA, "hist_bucket_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bucket")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
        )
    )


SQL_DOC_SIZE_HIST = f"""
SELECT n_chars // {HIST_WIDTH} AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
"""


# --- ddsketch_size_quantiles ------------------------------------------------
def dd_bucket(x: np.ndarray) -> np.ndarray:
    """Integer DDSketch bucket id: msb octave x DD_SUB linear sub-buckets.

    np.frexp on integer-valued float64 is EXACT below 2^53 (x = m*2^e,
    msb = e-1), so the octave needs no float log2 — the id is a pure
    function of the integer value on every platform."""
    x = np.maximum(x.astype("int64"), 1)
    _, exp = np.frexp(x.astype("float64"))
    msb = (exp - 1).astype("int64")
    base = np.int64(1) << msb
    sub = (x - base) * DD_SUB // base
    return msb * DD_SUB + sub


def dd_lower_bound(bucket: int) -> int:
    """Inclusive lower bound of a bucket (the quantile estimate)."""
    msb, sub = divmod(int(bucket), DD_SUB)
    return ((1 << msb) * (DD_SUB + sub)) // DD_SUB


def dd_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (bucket -> count) partial — the mergeable sketch rows."""
    b = dd_bucket(batch["n_chars"].to_numpy(zero_copy_only=False))
    ids, counts = np.unique(b, return_counts=True)
    return pa.table(
        {"bucket": pa.array(ids, pa.int64()),
         "n": pa.array(counts.astype("int64"), pa.int64())}
    )


def q_ddsketch_size_quantiles(sf_dir: str) -> pa.Table:
    """Approximate doc-size quantiles from the merged DDSketch: bounded
    relative error (<= 1/DD_SUB), bounded shuffle (<= 512 bucket rows per
    block), driver walk over <= 512 merged rows."""
    import math  # noqa: F401  (rank formula is pure-integer, no ceil)

    from .queries import _t

    hist = (
        _t(sf_dir, "documents", ["n_chars"])
        .map_batches(
            remote_fn(_QA, "dd_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    buckets = hist["bucket"].to_numpy()
    ps, ests = [], []
    for p in DD_PS:
        rank = (p * total + 99) // 100  # integer ceil(p% * total)
        b = int(buckets[np.searchsorted(cum, rank)])
        ps.append(p)
        ests.append(dd_lower_bound(b))
    return pa.table(
        {"p": pa.array(ps, pa.int64()), "est_n_chars": pa.array(ests, pa.int64())}
    )


# DuckDB twin: msb via bin() string length (integer-exact, no float log2);
# same sub-bucket, rank and lower-bound integer formulas as the kernels.
SQL_DDSKETCH_QUANTILES = f"""
WITH x AS (
  SELECT GREATEST(n_chars, 1) AS v FROM documents
), b AS (
  SELECT (length(bin(v)) - 1) * {DD_SUB}
         + ((v - (1::BIGINT << (length(bin(v)) - 1))) * {DD_SUB})
             // (1::BIGINT << (length(bin(v)) - 1)) AS bucket
  FROM x
), bk AS (
  SELECT bucket, count(*) AS n FROM b GROUP BY bucket
), c AS (
  SELECT bucket, sum(n) OVER (ORDER BY bucket) AS cum,
         (SELECT sum(n) FROM bk) AS total
  FROM bk
), hit AS (
  SELECT p, min(bucket) AS bucket
  FROM c, (SELECT unnest([{", ".join(map(str, DD_PS))}]) AS p) ps
  WHERE cum >= (p * total + 99) // 100
  GROUP BY p
)
SELECT CAST(p AS BIGINT) AS p,
       CAST(((1::BIGINT << (bucket // {DD_SUB})) * ({DD_SUB} + bucket % {DD_SUB}))
            // {DD_SUB} AS BIGINT) AS est_n_chars
FROM hit
"""


# --- props_json_stats -------------------------------------------------------
# Semi-structured extraction: pull the integer "k" field out of the JSON
# props column with a VECTORIZED RE2 kernel (pc.extract_regex — zero
# Python rows), then aggregate per event type. The DuckDB twin parses the
# SAME column with its native JSON reader (json_extract_string), so the
# gate cross-checks the regex fast-path against a real JSON parser.
def props_k_project(batch: pa.Table) -> pa.Table:
    # Fast-path caveat: the regex is exact only for FLAT one-level props
    # objects (what this corpus carries — the gate cross-checks it against
    # DuckDB's real JSON parser). Nested objects or string values embedding
    # '"k":' would need a JSON-parsing kernel instead.
    ex = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)')
    k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
    return pa.table({"event_type": batch["event_type"], "k": k}).filter(
        pc.is_valid(k)
    )


def q_props_json_stats(sf_dir: str) -> rd.Dataset:
    """Per-event-type stats of the JSON props field ``k``."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_type", "props"])
        .map_batches(
            remote_fn(_QA, "props_k_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="sum_k"),
        )
    )


SQL_PROPS_JSON_STATS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


# --- big_or_recent_users (set operation: UNION DISTINCT) --------------------
BIG_SPEND_CENTS = 400_000
RECENT_TS = "2024-01-30 12:00:00"


def spend_cents_project(batch: pa.Table) -> pa.Table:
    """Per-batch per-user cents-sum combiner: one row per user per batch
    crosses the spend shuffle, never one row per event."""
    from .queries import _cents

    t = pa.table({"user_id": batch["user_id"], "cents": _cents(batch["value"])})
    g = t.group_by(["user_id"]).aggregate([("cents", "sum")])
    return select_rename(g, user_id="user_id", cents="cents_sum")


def recent_users_project(batch: pa.Table) -> pa.Table:
    """Per-batch DISTINCT recent users (combiner): the union side carries
    <= |users in batch| rows, not one per recent event."""
    keep = pc.greater_equal(
        batch["ts"], pa.scalar(pd.Timestamp(RECENT_TS), pa.timestamp("us"))
    )
    t = pa.table({"user_id": batch.filter(keep)["user_id"]})
    g = t.group_by(["user_id"]).aggregate([("user_id", "count")])
    return g.select(["user_id"])


def big_users_filter(batch: pa.Table) -> pa.Table:
    keep = pc.greater_equal(batch["spend"], BIG_SPEND_CENTS)
    return pa.table({"user_id": batch.filter(keep)["user_id"]})


def distinct_user_project(batch: pa.Table) -> pa.Table:
    return pa.table({"user_id": batch["user_id"]})


def q_big_or_recent_users(sf_dir: str) -> rd.Dataset:
    """Set operation: big-spender users UNION (distinct) recently-active
    users. Each side reduces to a slim user_id stream first (combiner /
    filter), then ``Dataset.union`` concatenates and ONE grouped count
    dedups — the UNION DISTINCT plan; the shuffle carries <= |users| rows
    per side, never events."""
    from .queries import _t

    big = (
        _t(sf_dir, "events", ["user_id", "value"])
        .map_batches(
            remote_fn(_QA, "spend_cents_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="spend"))
        .map_batches(
            remote_fn(_QA, "big_users_filter"),
            batch_format="pyarrow",
        )
    )
    recent = _t(sf_dir, "events", ["user_id", "ts"]).map_batches(
        remote_fn(_QA, "recent_users_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        big.union(recent)
        .groupby("user_id")
        .aggregate(Count(alias_name="_n"))
        .map_batches(remote_fn(_QA, "distinct_user_project"), batch_format="pyarrow")
    )


SQL_BIG_OR_RECENT_USERS = f"""
SELECT user_id FROM events
GROUP BY user_id
HAVING sum(CAST(floor(value*100 + 0.5) AS BIGINT)) >= {BIG_SPEND_CENTS}
UNION
SELECT user_id FROM events WHERE ts >= TIMESTAMP '{RECENT_TS}'
"""


# --- events_time_window (RANGE frame) ---------------------------------------
TIME_WIN_US = 3_600_000_000  # 1 hour, in microseconds


def time_window_per_user(g: pd.DataFrame) -> pd.DataFrame:
    """One user's ts-ordered stream: trailing-1-hour sum of exact cents.
    RANGE-frame semantics (the SQL twin's RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW): the frame is [ts_i - 1h, ts_i] by VALUE,
    so ts-duplicate peers are all included — hence the right-searchsorted
    upper bound, not the row index. Cumsum + two binary searches per
    group, no per-row Python."""
    g = g.sort_values("ts", kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype("int64")
    cum = np.concatenate([[0], np.cumsum(cents)])
    lo = np.searchsorted(ts, ts - TIME_WIN_US, side="left")
    hi = np.searchsorted(ts, ts, side="right")
    return pd.DataFrame(
        {
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "win_cents": cum[hi] - cum[lo],
        }
    )


def q_events_time_window(sf_dir: str) -> rd.Dataset:
    """Trailing 1-hour moving sum per user — the time-based RANGE window
    frame (events_sliding_window covers the row-count ROWS frame,
    events_running the unbounded cumulative one)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(remote_fn(_QA, "time_window_per_user"), batch_format="pandas")
    )


SQL_EVENTS_TIME_WINDOW = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS BIGINT) AS win_cents
FROM events
"""


# --- corpus_cube (full CUBE over lang x source) ------------------------------
CUBE_NULL = "NULL_"  # data-NULL sentinel in kept dimensions, distinct from
                     # the rolled-up 'ALL' marker (collides only if a real
                     # value equals either literal — not possible for the
                     # 2-letter lang / srcN source domains here)


def cube_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner emitting ALL FOUR cube grouping sets at once
    (level bitmask: bit1 = lang kept, bit0 = source kept), so one shuffle
    carries the whole cube — corpus_rollup's plan plus the (source) set
    a ROLLUP cannot express. dropna=False + the CUBE_NULL sentinel keep
    data-NULL rows in every level (mass conservation), mirroring the SQL
    twin's GROUPING()-aware coalesce."""
    t = batch.select(["lang", "source", "n_chars"]).to_pandas()
    t["lang"] = t["lang"].fillna(CUBE_NULL)
    t["source"] = t["source"].fillna(CUBE_NULL)
    levels = []
    g3 = t.groupby(["lang", "source"], as_index=False).agg(
        n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
    )
    levels.append(g3.assign(level=np.int64(3)))
    g2 = t.groupby(["lang"], as_index=False).agg(
        n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
    )
    levels.append(g2.assign(source="ALL", level=np.int64(2)))
    g1 = t.groupby(["source"], as_index=False).agg(
        n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
    )
    levels.append(g1.assign(lang="ALL", level=np.int64(1)))
    levels.append(
        pd.DataFrame(
            {
                "lang": ["ALL"],
                "source": ["ALL"],
                "n_docs": [len(t)],
                "total_chars": [t["n_chars"].sum()],
                "level": [0],
            }
        )
    )
    out = pd.concat(levels, ignore_index=True)[
        ["lang", "source", "level", "n_docs", "total_chars"]
    ]
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [
                ("lang", pa.string()),
                ("source", pa.string()),
                ("level", pa.int64()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
            ]
        )
    )


def q_corpus_cube(sf_dir: str) -> rd.Dataset:
    """CUBE(lang, source): all four grouping sets in one pass/one shuffle,
    rolled-up dimensions marked 'ALL' (see corpus_rollup for the ROLLUP
    subset of the same plan)."""
    from ray.data.aggregate import Sum as _Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["lang", "source", "n_chars"])
        .map_batches(remote_fn(_QA, "cube_partial"), batch_format="pyarrow")
        # blocks x (langs x SOURCES x levels) combiner rows — source
        # cardinality grows with the corpus, so the coalesce width must too
        .repartition(coalesce_for_input(table_nbytes(sf_dir, "documents")))
        .groupby(["lang", "source", "level"])
        .aggregate(
            _Sum("n_docs", alias_name="n_docs"),
            _Sum("total_chars", alias_name="total_chars"),
        )
    )


SQL_CORPUS_CUBE = f"""
SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL'
            ELSE coalesce(lang, '{CUBE_NULL}') END AS lang,
       CASE WHEN GROUPING(source) = 1 THEN 'ALL'
            ELSE coalesce(source, '{CUBE_NULL}') END AS source,
       CAST(3 - (GROUPING(lang)*2 + GROUPING(source)) AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (lang, source)
"""


# --- events_lead (LEAD window, symmetric to queries.py's events_lag) ---------
def lead_per_user(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    gap = np.empty(len(g), dtype="int64")
    gap[-1] = -1
    gap[:-1] = us[1:] - us[:-1]
    nxt = np.empty(len(g), dtype=object)
    nxt[-1] = "none"
    nxt[:-1] = g["event_type"].to_numpy()[1:]
    return pd.DataFrame(
        {
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "next_type": pd.Series(nxt, index=g.index, dtype="string"),
            "gap_us": gap,
        }
    )


def q_events_lead(sf_dir: str) -> rd.Dataset:
    """Next event type + exact microsecond gap per user stream (LEAD —
    the forward complement of events_lag)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(remote_fn(_QA, "lead_per_user"), batch_format="pandas")
    )


SQL_EVENTS_LEAD = """
SELECT event_id, user_id,
       COALESCE(LEAD(event_type) OVER w, 'none') AS next_type,
       COALESCE(date_diff('microsecond', ts, LEAD(ts) OVER w), -1) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- doc_size_dense_rank (DENSE_RANK window with real ties) -------------------
def dense_rank_apply(batch: pa.Table, rank_maps: dict) -> pa.Table:
    """Broadcast-rank apply: per (lang, n_chars) lookup into the dense-rank
    map — dictionary-encode lang once per batch, then one vectorized
    searchsorted per language slice; no per-row Python."""
    langs_enc = pc.dictionary_encode(batch["lang"].combine_chunks())
    lang_vals = langs_enc.dictionary.to_pylist()
    codes = langs_enc.indices.to_numpy()
    sizes = batch["n_chars"].to_numpy()
    rank = np.empty(len(sizes), dtype="int64")
    for ci, lang in enumerate(lang_vals):
        sel = codes == ci
        # distinct sizes sorted DESC -> dense rank = index + 1
        desc_sizes = rank_maps[lang]  # numpy array, descending
        rank[sel] = len(desc_sizes) - np.searchsorted(
            desc_sizes[::-1], sizes[sel], side="left"
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "n_chars": batch["n_chars"],
            "size_rank": pa.array(rank, pa.int64()),
        }
    )


def q_doc_size_dense_rank(sf_dir: str) -> rd.Dataset:
    """DENSE_RANK() OVER (PARTITION BY lang ORDER BY n_chars DESC) — the
    tie-sharing rank (orders_rank_window covers ROW_NUMBER, doc_ntile
    NTILE). NO per-partition sort of the docs: the distinct-size set per
    lang (bounded by the value domain, not the doc count) reduces through
    a grouped-histogram shuffle, the driver builds |langs| sorted arrays,
    and a map-only broadcast-searchsorted pass ranks every doc."""
    from .queries import _t

    hist = (
        _t(sf_dir, "documents", ["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()  # <= |langs| x |distinct sizes| rows
    )
    rank_maps = {
        str(lang): np.sort(g["n_chars"].unique())[::-1]
        for lang, g in hist.groupby("lang")
    }
    return _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        remote_fn(_QA, "dense_rank_apply", rank_maps=rank_maps),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_DOC_SIZE_DENSE_RANK = """
SELECT doc_id, lang, n_chars,
       CAST(dense_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC)
            AS BIGINT) AS size_rank
FROM documents
"""


# --- user_first_last (ARG_MIN / ARG_MAX aggregate) ---------------------------
def first_last_partial(batch: pa.Table) -> pa.Table:
    """Per-(user, batch-or-group) argmin/argmax rows under the total
    (ts, event_id) order. Emitting BOTH candidates per user makes this a
    mergeable combiner: applying it again to concatenated partials yields
    the same winners (idempotent under re-aggregation), so the shuffle
    carries <= 2 rows per user per block and the reduce reuses the same
    kernel."""
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    user = batch["user_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts))
    u_sorted = user[order]
    _, first_pos = np.unique(u_sorted, return_index=True)
    _, last_rev = np.unique(u_sorted[::-1], return_index=True)
    last_pos = len(u_sorted) - 1 - last_rev
    keep = np.unique(np.concatenate([order[first_pos], order[last_pos]]))
    return batch.take(keep)


def first_last_finalize(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    return pd.DataFrame(
        {
            "user_id": g["user_id"].iloc[[0]].astype("int64"),
            "first_type": [str(g["event_type"].iloc[0])],
            "last_type": [str(g["event_type"].iloc[-1])],
        }
    )


def q_user_first_last(sf_dir: str) -> rd.Dataset:
    """First and last event type per user (the ARG_MIN/ARG_MAX aggregate
    under the total (ts, event_id) order — source_top_docs covers grouped
    top-K, this is the K=1 both-ends form with a 2-rows-per-user-per-block
    combiner)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
        .map_batches(remote_fn(_QA, "first_last_partial"), batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(remote_fn(_QA, "first_last_finalize"), batch_format="pandas")
    )


SQL_USER_FIRST_LAST = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnd
  FROM events)
SELECT a.user_id, a.event_type AS first_type, b.event_type AS last_type
FROM o a JOIN o b ON a.user_id = b.user_id
WHERE a.rn = 1 AND b.rnd = 1
"""


# --- events_dow_hour (calendar-function aggregation) -------------------------
def _floordiv(x, d: int):
    """Euclidean (floored) integer division — pc.divide truncates toward
    zero, which mis-buckets pre-1970 (negative-us) timestamps."""
    q = pc.divide(x, d)
    r = pc.subtract(x, pc.multiply(q, d))
    return pc.if_else(pc.less(r, 0), pc.subtract(q, 1), q)


def dow_hour_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (day-of-week, hour) count combiner. dow matches DuckDB's
    dayofweek(): 0 = Sunday; epoch day 0 (1970-01-01) was a Thursday, so
    dow = (epoch_days + 4) mod 7 with FLOORED division throughout, so
    pre-epoch timestamps bucket correctly too. Pure integer arithmetic on
    the raw microsecond timestamps — no datetime objects in the hot path."""
    us = pc.cast(batch["ts"], pa.int64())
    days = _floordiv(us, 86_400_000_000)
    shifted = pc.add(days, 4)
    dow = pc.subtract(shifted, pc.multiply(_floordiv(shifted, 7), 7))
    rem = pc.subtract(us, pc.multiply(days, 86_400_000_000))  # >= 0 by floor
    hour = pc.divide(rem, 3_600_000_000)
    t = pa.table({"dow": dow, "hour": hour})
    g = t.group_by(["dow", "hour"]).aggregate([("hour", "count")])
    return select_rename(g, dow="dow", hour="hour", n="hour_count")


def q_events_dow_hour(sf_dir: str) -> rd.Dataset:
    """Day-of-week x hour-of-day activity heatmap — the calendar-extraction
    function class (dayofweek/hour) over the event stream; <=168-row
    combiner output per block, one tiny shuffle."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["ts"])
        .map_batches(
            remote_fn(_QA, "dow_hour_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby(["dow", "hour"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_EVENTS_DOW_HOUR = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
"""


# --- covisit_pairs (co-occurrence / market-basket pair counts) ---------------
def covisit_distinct_partial(batch: pa.Table) -> pa.Table:
    """Per-batch distinct (user_id, event_type) — the combiner that caps
    what a hot user contributes per block at |types| rows."""
    return batch.group_by(["user_id", "event_type"]).aggregate([])


def covisit_pairs_group(g: pd.DataFrame) -> pd.DataFrame:
    """One user's distinct types -> all unordered pairs (a < b). The group
    is <= |type vocabulary| rows after the distinct combiner, never one
    row per event."""
    import itertools

    ts = sorted(set(g["event_type"]))
    pairs = list(itertools.combinations(ts, 2))
    return pd.DataFrame(
        {
            "type_a": pd.Series([a for a, _ in pairs], dtype="string"),
            "type_b": pd.Series([b for _, b in pairs], dtype="string"),
        }
    )


def q_covisit_pairs(sf_dir: str) -> rd.Dataset:
    """Event-type co-occurrence: for every unordered pair of event types,
    the number of users that performed both — the market-basket /
    co-visitation support count behind recommendation candidate
    generation. Plan: per-batch distinct combiner -> user-keyed groupby
    emitting each user's type pairs -> pair-keyed Count. Shuffles carry
    (user, type) and (type, type) rows only. 100 TB: with an unbounded
    item vocabulary the per-user pair fan-out is |items|^2/2 — the
    standard mitigation (cap each user at their top-F frequent items
    before pairing) slots into covisit_pairs_group; the type vocabulary
    here is small and fixed."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(
            remote_fn(_QA, "covisit_distinct_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(remote_fn(_QA, "covisit_pairs_group"), batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Count(alias_name="n_users"))
    )


SQL_COVISIT_PAIRS = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


AGG_QUERIES = {
    "covisit_pairs": q_covisit_pairs,
    "events_dow_hour": q_events_dow_hour,
    "events_time_window": q_events_time_window,
    "corpus_cube": q_corpus_cube,
    "user_first_last": q_user_first_last,
    "events_lead": q_events_lead,
    "doc_size_dense_rank": q_doc_size_dense_rank,
    "events_sliding_window": q_events_sliding_window,
    "region_nation_list": q_region_nation_list,
    "doc_size_hist": q_doc_size_hist,
    "ddsketch_size_quantiles": q_ddsketch_size_quantiles,
    "props_json_stats": q_props_json_stats,
    "big_or_recent_users": q_big_or_recent_users,
}

AGG_ORACLES = {
    "covisit_pairs": SQL_COVISIT_PAIRS,
    "events_dow_hour": SQL_EVENTS_DOW_HOUR,
    "events_time_window": SQL_EVENTS_TIME_WINDOW,
    "corpus_cube": SQL_CORPUS_CUBE,
    "user_first_last": SQL_USER_FIRST_LAST,
    "events_lead": SQL_EVENTS_LEAD,
    "doc_size_dense_rank": SQL_DOC_SIZE_DENSE_RANK,
    "events_sliding_window": SQL_EVENTS_SLIDING,
    "region_nation_list": SQL_REGION_NATION_LIST,
    "doc_size_hist": SQL_DOC_SIZE_HIST,
    "ddsketch_size_quantiles": SQL_DDSKETCH_QUANTILES,
    "props_json_stats": SQL_PROPS_JSON_STATS,
    "big_or_recent_users": SQL_BIG_OR_RECENT_USERS,
}
