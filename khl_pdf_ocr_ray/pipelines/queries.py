"""The operator/pipeline registry: ``queries()`` + ``oracle_sql()``.

Each public query is a callable ``fn(sf_dir) -> Dataset | DataFrame | Table``
with (where SQL-expressible) a matching DuckDB oracle over the driver's
pre-registered views (region nation customer supplier part orders lineitem
events documents embeddings). Column names match the SQL exactly; money and
float aggregates are computed as integer cents via ``floor(x*100 + 0.5)`` on
BOTH sides so value hashes cannot drift on float formatting.

Scale notes are attached per query: which ones shuffle, what is broadcast,
and what the 100 TB variant changes.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_Q = "khl_pdf_ocr_ray.pipelines.queries"


# driver tables shipped as ONE parquet file with ONE row group: a plain read
# yields a single block and the whole pipeline serializes. Fan the big ones
# out after the read (cheap at these sizes; real 100 TB inputs arrive as
# many fragments and never need this).
_BIG_TABLES = {
    "lineitem": 32,
    "orders": 16,
    "events": 16,
    "customer": 4,
    "documents": 8,   # per-doc kernels (shingling, minhash) are the heavy maps
    "embeddings": 4,
}


def _t(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    """Pruned, metadata-clean parquet read of one driver table, fanned out
    for parallelism (see io.read_parquet_clean: an explicit schema keeps
    every downstream shuffle's block schemas hashable)."""
    from ..io import read_parquet_clean

    ds = read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
    n = _BIG_TABLES.get(name)
    if n:
        ds = ds.repartition(n)
    return ds


def _floordiv_us(x, d: int):
    """FLOORED integer division (oracles use floor(epoch/d); Arrow's
    pc.divide truncates toward zero, diverging on pre-epoch timestamps)."""
    q = pc.divide(x, d)
    r = pc.subtract(x, pc.multiply(q, d))
    return pc.if_else(pc.less(r, 0), pc.subtract(q, 1), q)


def _cents(x):
    """floor(x*100 + 0.5) as int64 — the fixed-point money convention used by
    every oracle (duckdb ROUND is half-away-from-zero, numpy is banker's;
    floor(+0.5) agrees everywhere for the positive values in these tables)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(x, 100.0), 0.5)), pa.int64())


# --- worker-side batch bodies (top-level so remote_fn can import them) ------
def md5_text_hash(batch: pa.Table) -> pa.Table:
    return _md5_col(batch, "text", "text_hash").drop_columns(["text"])


def pricing_project(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL aggregate (combiner): ~6 group rows leave each
    batch instead of every lineitem row — the shuffle then moves
    O(groups x blocks), not O(rows)."""
    disc_price = pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
    t = pa.table(
        {
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": pc.cast(batch["l_quantity"], pa.int64()),
            "base_cents": _cents(batch["l_extendedprice"]),
            "disc_cents": _cents(disc_price),
        }
    )
    g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("qty", "sum"), ("base_cents", "sum"), ("disc_cents", "sum"), ("qty", "count")]
    )
    return select_rename(
        g,
        l_returnflag="l_returnflag",
        l_linestatus="l_linestatus",
        qty="qty_sum",
        base_cents="base_cents_sum",
        disc_cents="disc_cents_sum",
        n="qty_count",
    )


def events_project(batch: pa.Table) -> pa.Table:
    """Window-id projection + per-batch partial aggregate (combiner)."""
    us = pc.cast(batch["ts"], pa.int64())  # microseconds since epoch
    t = pa.table(
        {
            "event_type": batch["event_type"],
            "hour_bucket": pc.cast(_floordiv_us(us, 3_600_000_000), pa.int64()),
            "value_cents": _cents(batch["value"]),
        }
    )
    g = t.group_by(["event_type", "hour_bucket"]).aggregate(
        [("value_cents", "count"), ("value_cents", "sum")]
    )
    return select_rename(
        g,
        event_type="event_type",
        hour_bucket="hour_bucket",
        n="value_cents_count",
        value_cents="value_cents_sum",
    )


def sessions_per_user(g: pd.DataFrame) -> pd.DataFrame:
    ts = g["ts"].sort_values()
    brk = (ts.diff().dt.total_seconds() > SESSION_GAP_S) | ts.diff().isna()
    return pd.DataFrame(
        {
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": [int(brk.sum())],
            "n_events": [len(g)],
        }
    )


def customer_geo_enrich(batch: pa.Table, nat: dict) -> pa.Table:
    keys = batch["c_nationkey"].to_numpy()
    return pa.table(
        {
            "r_name": pa.array([nat[int(k)][1] for k in keys], pa.string()),
            "n_name": pa.array([nat[int(k)][0] for k in keys], pa.string()),
            "acctbal_cents": _cents(batch["c_acctbal"]),
        }
    )


def orders_cents_project(batch: pa.Table) -> pa.Table:
    return pa.table(
        {"o_custkey": batch["o_custkey"], "price_cents": _cents(batch["o_totalprice"])}
    )


def supplier_enrich(batch: pa.Table, lookup: dict) -> pa.Table:
    names = pa.array(
        [lookup[int(k)] for k in batch["s_nationkey"].to_numpy()], pa.string()
    )
    return pa.table({"n_name": names, "acctbal_cents": _cents(batch["s_acctbal"])})


def lineitem_qty_project(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "l_partkey": batch["l_partkey"],
            "qty": pc.cast(batch["l_quantity"], pa.int64()),
        }
    )



# ---------------------------------------------------------------------------
# A2: corpus stats — groupby aggregate with partial per-block combine
# ---------------------------------------------------------------------------
def q_corpus_stats(sf_dir: str) -> rd.Dataset:
    """Docs + chars per (lang, source). Shuffle: hash on 2 keys; partials
    are combined per block by Ray's aggregate so only (groups x blocks)
    rows move (SURVEY.md §2.5 A2)."""
    return (
        _t(sf_dir, "documents", ["lang", "source", "n_chars"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
    )


SQL_CORPUS_STATS = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# A3: exact dedup — content-hash groupby (SURVEY.md §2.5 A3, §2.7)
# ---------------------------------------------------------------------------
def _md5_col(batch: pa.Table, src: str, dst: str) -> pa.Table:
    import hashlib

    vals = [
        hashlib.md5((s or "").encode("utf-8")).hexdigest()
        for s in batch[src].to_pylist()
    ]
    return batch.append_column(dst, pa.array(vals, pa.string()))


def q_dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup by content hash: hash added vectorized per batch, then a
    single hash-shuffle groupby keeps min(doc_id) as the representative.
    100 TB: identical plan — the shuffle key is the 16-byte digest, not the
    document text, so only (hash, id) pairs move."""
    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_Q, "md5_text_hash"), batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="dup_count"))
    )


SQL_DEDUP_EXACT = """
SELECT md5(coalesce(text, '')) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS dup_count
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# top-k: sort + limit (SURVEY.md §2.6)
# ---------------------------------------------------------------------------
def q_top_docs(sf_dir: str) -> rd.Dataset:
    """10 largest documents; deterministic tie-break on doc_id."""
    return (
        _t(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(10)
    )


SQL_TOP_DOCS = """
SELECT doc_id, n_chars, lang FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: filter pushdown + wide aggregate
# ---------------------------------------------------------------------------
def q_pricing_summary(sf_dir: str) -> rd.Dataset:
    """Row-group filter pushdown at the read, vectorized cents projection,
    then a tiny groupby (4-6 groups)."""
    import datetime

    from ..io import read_parquet_clean

    cutoff = datetime.datetime(1998, 9, 2)
    ds = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        filter=(pc.field("l_shipdate") <= cutoff),
    )

    return (
        ds.map_batches(remote_fn(_Q, "pricing_project"), batch_format="pyarrow", zero_copy_batch=True)
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Sum("n", alias_name="count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# events: tumbling window aggregate (streaming-shaped, SURVEY.md §2.9)
# ---------------------------------------------------------------------------
def q_events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h windows per event_type. Event time is data; the window id
    is a vectorized integer projection, so this is a plain groupby — the
    Ray-Data-native form of a batch tumbling window."""

    return (
        _t(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(remote_fn(_Q, "events_project"), batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("value_cents", alias_name="value_cents_sum"))
    )


SQL_EVENTS_HOURLY = """
SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents_sum
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# sessionization: per-key ordered state (groupby.map_groups)
# ---------------------------------------------------------------------------
SESSION_GAP_S = 1800


def q_sessionize(sf_dir: str) -> rd.Dataset:
    """Session windows (gap > 30 min splits) per user — the (user, day)
    BUCKETED plan (stages/temporal.py): shuffle on (user_id, day) so a
    task holds at most one day of one user (a bot account with billions
    of events no longer fits one task's memory), then cross-midnight
    sessions are merged over the per-day summary table (rows ~ active
    user-days, never events). ``sessions_per_user`` below remains the
    single-group-per-user twin the planted hot-user test compares
    against."""
    from ..stages.temporal import sessionize_bucketed

    return sessionize_bucketed(
        _t(sf_dir, "events", ["user_id", "ts"]), num_shards=_event_shards(sf_dir)
    )


def _event_shards(sf_dir: str) -> int:
    """Shard count for the (user, day)-bucketed temporal ops: byte-derived
    (32 MB of events per shard task), floored for toy-scale parallelism."""
    from ..io import blocks_for_bytes, input_nbytes

    return blocks_for_bytes(
        input_nbytes(os.path.join(sf_dir, "events.parquet")),
        target_block_bytes=32 << 20,
        lo=64,
    )


SQL_SESSIONIZE = f"""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > {SESSION_GAP_S} THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# broadcast join: customer x nation x region (SURVEY.md §2.4 J1 pattern)
# ---------------------------------------------------------------------------
def q_customer_geo(sf_dir: str) -> rd.Dataset:
    """Dimension tables are read driver-side (tiny), joined into one lookup
    dict, and applied map-side — no shuffle for the join; only the final
    2-key aggregate shuffles. This is the broadcast pattern that replaces a
    shuffle join for small sides at 100 TB (ray.put would ship it once per
    node for bigger lookups; a closure capture suffices at this size)."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pydict()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pydict()
    r_name = dict(zip(region["r_regionkey"], region["r_name"]))
    nat = {
        k: (n, r_name[r])
        for k, n, r in zip(
            nation["n_nationkey"], nation["n_name"], nation["n_regionkey"]
        )
    }

    return (
        _t(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(
            remote_fn(_Q, "customer_geo_enrich", nat=nat),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["r_name", "n_name"])
        .aggregate(Count(alias_name="n_customers"), Sum("acctbal_cents", alias_name="acctbal_cents_sum"))
    )


SQL_CUSTOMER_GEO = """
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents_sum
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# partitioned hash join: orders x customer (Dataset.join path)
# ---------------------------------------------------------------------------
def q_orders_by_segment(sf_dir: str) -> rd.Dataset:
    """Exercises Ray Data's hash-partitioned ``Dataset.join`` (both sides
    shuffled on the key). At 100 TB the num_partitions scales with input;
    a skewed key would be salted before the join (stages/skew.py)."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        remote_fn(_Q, "orders_cents_project"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    from ..io import input_nbytes
    from ..joins import join_partitions

    joined = orders.join(
        customer,
        join_type="inner",
        # sized from the dominant (orders) input's bytes, not a constant:
        # at 100 TB a fixed 8 would funnel the join into 8 giant partitions
        num_partitions=join_partitions(
            input_nbytes(os.path.join(sf_dir, "orders.parquet"))
        ),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    # combiner after the join: one row per (segment, block) enters the final
    # shuffle, and the coalesce keeps every reduce partition non-empty (an
    # empty partition emits a schema-less block -> executor schema warnings)
    return (
        joined.map_batches(remote_fn(_Q, "segment_partial"), batch_format="pyarrow")
        .repartition(2)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


def segment_partial(batch: pa.Table) -> pa.Table:
    g = batch.group_by("c_mktsegment").aggregate(
        [("price_cents", "count"), ("price_cents", "sum")]
    )
    return select_rename(
        g,
        c_mktsegment="c_mktsegment",
        n_orders="price_cents_count",
        revenue_cents="price_cents_sum",
    )


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# top-k with join-back: biggest customers by order revenue
# ---------------------------------------------------------------------------
def q_top_customers(sf_dir: str) -> pd.DataFrame:
    """Aggregate -> top-k (sort+limit) -> broadcast name lookup on the tiny
    winner set (never a shuffle join for a 10-row side)."""
    top = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            remote_fn(_Q, "orders_cents_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("o_custkey")
        .aggregate(Sum("price_cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
        .sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")[
        ["o_custkey", "c_name", "revenue_cents", "n_orders"]
    ]
    return out


SQL_TOP_CUSTOMERS = """
SELECT o_custkey, c_name,
       CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue_cents DESC, o_custkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# distinct: unique values (SURVEY.md §2.7)
# ---------------------------------------------------------------------------
def q_distinct_event_types(sf_dir: str) -> pa.Table:
    vals = sorted(_t(sf_dir, "events", ["event_type"]).unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


SQL_DISTINCT_EVENT_TYPES = "SELECT DISTINCT event_type FROM events"


def distinct_pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch distinct (event_type, user_id) pairs — the map-side
    dedup combiner that keeps the exact-distinct shuffle at O(distinct
    pairs per block), not O(events)."""
    g = batch.select(["event_type", "user_id"]).group_by(
        ["event_type", "user_id"]
    ).aggregate([])
    return g


def q_distinct_users_by_type(sf_dir: str) -> rd.Dataset:
    """EXACT count-distinct users per event type — the shuffle-heavy
    ground truth the HLL sketch (hll_users_by_type) approximates: batch
    combiner -> pair-keyed dedup groupby -> per-type Count. 100 TB: the
    exchange carries one row per distinct (type, user) pair; when that is
    still too wide, the HLL operator is the documented estimate path."""
    return (
        _t(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(remote_fn(_Q, "distinct_pair_partial"), batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="n_"))
        .select_columns(["event_type", "user_id"])
        .groupby("event_type")
        .aggregate(Count(alias_name="distinct_users"))
    )


SQL_DISTINCT_USERS_BY_TYPE = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# supplier balances per nation (second broadcast-join aggregate)
# ---------------------------------------------------------------------------
def q_supplier_by_nation(sf_dir: str) -> rd.Dataset:
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pydict()
    lookup = dict(zip(nation["n_nationkey"], nation["n_name"]))

    return (
        _t(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(
            remote_fn(_Q, "supplier_enrich", lookup=lookup),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("acctbal_cents", alias_name="acctbal_cents_sum"))
    )


SQL_SUPPLIER_BY_NATION = """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(floor(s_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents_sum
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# part shipment stats: hash join + aggregate (semi-join-flavored)
# ---------------------------------------------------------------------------
def q_part_ship_stats(sf_dir: str) -> rd.Dataset:
    """Per-brand shipment stats. Pre-aggregates lineitem per partkey FIRST
    (big side shrinks to one row per key) and only then joins the part
    dimension — the shuffle moves |parts| rows, not |lineitem| rows."""
    per_part = (
        _t(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(
            remote_fn(_Q, "lineitem_qty_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_partkey")
        .aggregate(Sum("qty", alias_name="qty"), Count(alias_name="n_ship"))
    )
    part = _t(sf_dir, "part", ["p_partkey", "p_brand"])
    from ..io import input_nbytes
    from ..joins import join_partitions

    joined = per_part.join(
        part,
        join_type="inner",
        # both sides are ~|parts| rows (lineitem pre-aggregated per key);
        # size from the part table's bytes instead of a constant
        num_partitions=join_partitions(
            input_nbytes(os.path.join(sf_dir, "part.parquet"))
        ),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    return joined.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Sum("n_ship", alias_name="n_lineitems"),
        Sum("qty", alias_name="total_qty"),
    )


SQL_PART_SHIP_STATS = """
WITH per_part AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(count(*) AS BIGINT) AS n_ship
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(n_ship) AS BIGINT) AS n_lineitems,
       CAST(sum(qty) AS BIGINT) AS total_qty
FROM per_part JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""




# ---------------------------------------------------------------------------
# text analysis: language-ID / quality / token stats / fingerprints
# (stages/textqc.py — vectorized pandas kernels, integer outputs)
# ---------------------------------------------------------------------------
_TQC = "khl_pdf_ocr_ray.stages.textqc"


def q_lang_id(sf_dir: str) -> rd.Dataset:
    """Stopword-count language ID per doc (argmax, alphabetical tie-break,
    'und' when no stopword hits). Embarrassingly parallel map."""
    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_TQC, "lang_id_batch"), batch_format="pyarrow"
    )


def q_text_quality(sf_dir: str) -> rd.Dataset:
    """Per-doc quality metrics (token/type/char counts, fixed-point mean
    token length) — the filter features of a training-data pipeline."""
    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        remote_fn(_TQC, "quality_batch"), batch_format="pyarrow"
    )


def q_token_stats(sf_dir: str) -> rd.Dataset:
    """Corpus token totals per lang. Partial aggregation inside each batch
    (one row per lang per batch crosses the shuffle), then a tiny groupby —
    the combiner pattern that keeps the all-to-all small at 100 TB."""
    return (
        _t(sf_dir, "documents", ["doc_id", "text", "lang"])
        .map_batches(remote_fn(_TQC, "token_stats_batch"), batch_format="pyarrow")
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("ws_tokens", alias_name="ws_tokens"),
            Sum("bpe_tokens", alias_name="bpe_tokens"),
        )
    )


def q_fingerprint(sf_dir: str) -> rd.Dataset:
    """md5 document fingerprint over normalized text (SQL-checkable)."""
    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_TQC, "fingerprint_batch"), batch_format="pyarrow")
        .select_columns(["doc_id", "fp_md5"])
    )


def q_fingerprint_rolling(sf_dir: str) -> rd.Dataset:
    """Rabin-Karp rolling-hash fingerprint (mod 2^61-1) — the incremental
    hash used for shingling; not SQL-expressible, rows-only check."""
    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_TQC, "fingerprint_batch"), batch_format="pyarrow")
        .select_columns(["doc_id", "fp_roll"])
    )






# ---------------------------------------------------------------------------
# A4: doc-size quantiles — exact, via a distributed value histogram
# ---------------------------------------------------------------------------
QUANTILE_PS = (50, 90, 99)


def q_doc_size_quantiles(sf_dir: str) -> pa.Table:
    """Discrete quantiles of document size (the skew-detection feed,
    SURVEY.md §2.5 A4). Exact and scalable: the shuffle moves a value
    HISTOGRAM (one row per distinct size per block), not the rows; the
    driver walks the tiny cumulative histogram. Convention matches duckdb
    quantile_disc: v[ceil(p*n)-1] of the sorted values."""
    import math

    hist = (
        _t(sf_dir, "documents", ["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("n_chars")
    )
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum()
    out = {"p": [], "n_chars_q": []}
    for p in QUANTILE_PS:
        rank = math.ceil(p / 100 * total)  # 1-based rank of the quantile
        val = int(hist.loc[cum >= rank, "n_chars"].iloc[0])
        out["p"].append(p)
        out["n_chars_q"].append(val)
    return pa.table({"p": pa.array(out["p"], pa.int64()),
                     "n_chars_q": pa.array(out["n_chars_q"], pa.int64())})


SQL_DOC_SIZE_QUANTILES = """
SELECT p, CAST(CASE p WHEN 50 THEN quantile_disc(n_chars, 0.50)
                      WHEN 90 THEN quantile_disc(n_chars, 0.90)
                      ELSE quantile_disc(n_chars, 0.99) END AS BIGINT) AS n_chars_q
FROM documents, (SELECT unnest([50, 90, 99]) AS p) ps
GROUP BY p
"""


# ---------------------------------------------------------------------------
# deterministic filter-sample (SURVEY.md §2.6 debug sampling, made exact)
# ---------------------------------------------------------------------------
def q_events_sample(sf_dir: str) -> rd.Dataset:
    """1-in-10 deterministic sample by key residue (a seeded random_sample
    is block-layout-dependent; the residue filter is reproducible AND
    SQL-expressible)."""
    return _t(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        remote_fn(_Q, "sample_project"), batch_format="pyarrow", zero_copy_batch=True
    )


def sample_project(batch: pa.Table) -> pa.Table:
    keep = pc.equal(
        pc.subtract(batch["event_id"], pc.multiply(pc.divide(batch["event_id"], 10), 10)),
        3,
    )
    t = batch.filter(keep)
    return pa.table(
        {"event_id": t["event_id"], "event_type": t["event_type"], "value_cents": _cents(t["value"])}
    )


SQL_EVENTS_SAMPLE = """
SELECT event_id, event_type,
       CAST(floor(value*100 + 0.5) AS BIGINT) AS value_cents
FROM events WHERE event_id % 10 = 3
"""




# ---------------------------------------------------------------------------
# sliding window + semi/anti joins (SURVEY.md §2.4 J1 variants, §2.9)
# ---------------------------------------------------------------------------
def q_events_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding windows (2h long, advancing hourly) as a batch operator:
    each event is EXPLODED into the two windows that contain it, then one
    groupby — the Ray-Data-native sliding window (no event-time engine
    needed; the window multiplicity is the projection)."""
    return (
        _t(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(remote_fn(_Q, "sliding_project"), batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "win_start"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("value_cents", alias_name="value_cents_sum"))
    )


def sliding_project(batch: pa.Table) -> pa.Table:
    us = pc.cast(batch["ts"], pa.int64())
    hour = pc.cast(_floordiv_us(us, 3_600_000_000), pa.int64())
    cents = _cents(batch["value"])
    parts = []
    for off in (0, 1):
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "win_start": pc.subtract(hour, off),
                "value_cents": cents,
            }
        )
        parts.append(t)
    both = pa.concat_tables(parts)
    g = both.group_by(["event_type", "win_start"]).aggregate(
        [("value_cents", "count"), ("value_cents", "sum")]
    )
    return select_rename(
        g,
        event_type="event_type",
        win_start="win_start",
        n="value_cents_count",
        value_cents="value_cents_sum",
    )


SQL_EVENTS_SLIDING = """
SELECT event_type,
       CAST(floor(epoch(ts)/3600) - off AS BIGINT) AS win_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents_sum
FROM events, (SELECT unnest([0, 1]) AS off) offs
GROUP BY 1, 2
"""


def q_customers_semi(sf_dir: str) -> rd.Dataset:
    """Semi join — customers WITH orders, counted per segment — via Ray's
    native hash-partitioned ``left_semi`` join: both sides shuffle only
    their key/segment columns, nothing is collected driver-side (the
    round-1 design broadcast the distinct-key set, which grows with the
    big side at 100 TB; a Bloom-filter prefilter would be the next
    refinement, not a replacement)."""
    from ..io import table_nbytes
    from ..joins import safe_join

    customer = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders_keys = _t(sf_dir, "orders", ["o_custkey"])
    # base tables: structurally non-empty -> streaming (barrier-free) join
    semi = safe_join(
        customer, orders_keys, on=("c_custkey",), right_on=("o_custkey",),
        join_type="left_semi", assume_non_empty=True,
        left_nbytes=table_nbytes(sf_dir, "customer"),
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    if semi is None:  # either side empty -> no customer has an order
        return _empty_segment_counts()
    return (
        semi.repartition(2)  # few groups; non-empty reduce partitions
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_customers"))
    )


def _empty_segment_counts() -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array([], pa.string()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
    )


def q_customers_anti(sf_dir: str) -> pd.DataFrame:
    """Anti join — customers with NO orders, per segment — via the native
    ``left_anti`` join. Materialized to a schema-stable DataFrame because
    a fully-empty Ray aggregate loses its column schema (every customer
    has orders at small scale factors)."""
    from ..io import table_nbytes
    from ..joins import safe_join

    customer = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders_keys = _t(sf_dir, "orders", ["o_custkey"])
    # safe_join returns the LEFT side unchanged when orders is empty (an
    # anti join against nothing keeps every customer), and None only when
    # customer itself is empty
    anti = safe_join(
        customer, orders_keys, on=("c_custkey",), right_on=("o_custkey",),
        join_type="left_anti", assume_non_empty=True,
        left_nbytes=table_nbytes(sf_dir, "customer"),
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    if anti is None:
        return pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                             "n_customers": pd.Series(dtype="int64")})
    ds = (
        anti.repartition(2)
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_customers"))
    )
    df = ds.to_pandas()
    if df.empty:
        df = pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                           "n_customers": pd.Series(dtype="int64")})
    return df


def q_customers_semi_bloom(sf_dir: str) -> rd.Dataset:
    """Semi join with a BLOOM PREFILTER — the 100 TB refinement of
    ``customers_semi``: a fixed-size Bloom bitmap over the probe side's
    keys (distributed partial bitmaps, O(m_bits) driver merge) is
    broadcast once and prunes non-matching rows map-side BEFORE the exact
    left_semi join, so the join shuffle carries ~matches + fp_rate *
    non-matches. Bloom false positives are removed by the exact join
    (never false negatives), so the result is identical — same oracle."""
    import ray as _ray

    from ..functions.bloom import DEFAULT_K, DEFAULT_M_BITS, build_bloom
    from ..io import table_nbytes
    from ..joins import safe_join

    orders_keys = _t(sf_dir, "orders", ["o_custkey"]).materialize()
    bloom = build_bloom(orders_keys, "o_custkey")
    bloom_ref = _ray.put(bloom)
    prefiltered = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.functions.bloom",
            "bloom_probe_batch",
            col="c_custkey",
            bloom_ref=bloom_ref,
            m_bits=DEFAULT_M_BITS,
            k=DEFAULT_K,
        ),
        batch_format="pyarrow",
    )
    # prefiltered keeps every true match (Bloom has no false negatives) and
    # orders' FK always lands, so both sides are structurally non-empty
    semi = safe_join(
        prefiltered, orders_keys, on=("c_custkey",), right_on=("o_custkey",),
        join_type="left_semi", assume_non_empty=True,
        left_nbytes=table_nbytes(sf_dir, "customer"),
        right_nbytes=table_nbytes(sf_dir, "orders"),
    )
    if semi is None:
        return _empty_segment_counts()
    return (
        semi.repartition(2)
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_customers"))
    )


SQL_CUSTOMERS_SEMI = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
GROUP BY c_mktsegment
"""

SQL_CUSTOMERS_ANTI = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders)
GROUP BY c_mktsegment
"""




# ---------------------------------------------------------------------------
# as-of join + running window (temporal operators the brief names)
# ---------------------------------------------------------------------------
def q_events_asof(sf_dir: str) -> rd.Dataset:
    """As-of join: every purchase matched to the user's most recent view at
    or before it (ties on ts take the latest view, unmatched -> -1) — the
    (user, day) BUCKETED plan (stages/temporal.py): same-day matches via
    pd.merge_asof per bucket; cross-day matches resolved by a per-user
    prefix scan over per-day last-view summaries joined back on
    (user, day). ``asof_per_user`` below remains the per-user twin for
    the planted hot-user test."""
    from ..stages.temporal import events_asof_bucketed

    return events_asof_bucketed(
        _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
        num_shards=_event_shards(sf_dir),
    )


def asof_per_user(g: pd.DataFrame) -> pd.DataFrame:
    left = g[g["event_type"] == "purchase"][["event_id", "ts"]].sort_values(
        ["ts", "event_id"]
    )
    right = g[g["event_type"] == "view"][["event_id", "ts"]].sort_values(
        ["ts", "event_id"]
    )
    if left.empty:
        return pd.DataFrame(
            {
                "purchase_id": pd.Series(dtype="int64"),
                "view_id": pd.Series(dtype="int64"),
            }
        )
    if right.empty:
        return pd.DataFrame(
            {
                "purchase_id": left["event_id"].astype("int64"),
                "view_id": pd.Series([-1] * len(left), dtype="int64"),
            }
        )
    # among equal-ts views keep the max event_id so backward-asof picks the
    # deterministic "latest" row (mirrors the SQL tie-break below)
    right = right.groupby("ts", as_index=False).agg(event_id=("event_id", "max"))
    m = pd.merge_asof(
        left,
        right.rename(columns={"event_id": "view_id"}),
        on="ts",
        direction="backward",
    )
    return pd.DataFrame(
        {
            "purchase_id": m["event_id"].astype("int64"),
            "view_id": m["view_id"].fillna(-1).astype("int64"),
        }
    )


SQL_EVENTS_ASOF = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     v AS (SELECT max(event_id) AS event_id, user_id, ts
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT p.event_id AS purchase_id,
       CAST(coalesce(v.event_id, -1) AS BIGINT) AS view_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


SPLIT_MULT = 2654435761  # Knuth multiplicative hash constant
SPLIT_ID_MOD = 2147483647  # doc_id reduced mod 2^31-1 BEFORE the multiply:
                           # (2^31)(2.66e9) < 2^63, so the product can never
                           # overflow int64 — Arrow would silently WRAP where
                           # DuckDB raises, diverging at doc_id >= ~3.5e9.
                           # Identity for every doc_id < 2^31-1.
SPLIT_TRAIN_PCT = 90


def q_train_test_split(sf_dir: str) -> rd.Dataset:
    """Deterministic hash-based train/test split of the document corpus —
    the assignment every training-data pipeline needs. Vectorized residue
    of a multiplicative hash (stable across runs, engines, and partition
    layouts — unlike seeded random_sample, which is block-layout
    dependent); reported as per-split doc/char totals via per-batch
    combiners."""
    return (
        _t(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(remote_fn(_Q, "split_partial"), batch_format="pyarrow", zero_copy_batch=True)
        .repartition(2)  # two groups; non-empty reduce partitions
        .groupby("split")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )


def hash_residue(col, scale: int):
    """((col % SPLIT_ID_MOD) * SPLIT_MULT) % scale — THE multiplicative
    split/sample hash, one implementation for every twin (the SQL side
    spells the identical expression). The pre-reduction keeps the product
    < 2^63 so Arrow cannot wrap where DuckDB raises."""
    rid = pc.subtract(col, pc.multiply(pc.divide(col, SPLIT_ID_MOD), SPLIT_ID_MOD))
    prod = pc.multiply(rid, SPLIT_MULT)
    return pc.subtract(prod, pc.multiply(pc.divide(prod, scale), scale))


def split_partial(batch: pa.Table) -> pa.Table:
    residue = hash_residue(batch["doc_id"], 100)
    split = pc.if_else(
        pc.less(residue, SPLIT_TRAIN_PCT), pa.scalar("train"), pa.scalar("test")
    )
    t = pa.table({"split": split, "n_chars": batch["n_chars"]})
    g = t.group_by(["split"]).aggregate([("n_chars", "count"), ("n_chars", "sum")])
    return select_rename(
        g, split="split", n_docs="n_chars_count", total_chars="n_chars_sum"
    )


SQL_TRAIN_TEST_SPLIT = f"""
SELECT CASE WHEN ((doc_id % {SPLIT_ID_MOD}) * {SPLIT_MULT}) % 100 < {SPLIT_TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


RANGE_WINDOW_S = 3600


def q_events_range_join(sf_dir: str) -> rd.Dataset:
    """Range (interval) join: for every purchase, the number of the SAME
    user's views with ts in [purchase_ts - 1h, purchase_ts] — the
    (user, day) BUCKETED plan (stages/temporal.py): views in the last 1h
    of a day are replicated into the next day's bucket (boundary-overlap
    replication), then a sorted two-pointer sweep per bucket; exact, and
    one user's history never exceeds a task. ``range_join_per_user``
    below remains the per-user twin for the planted hot-user test."""
    from ..stages.temporal import range_join_bucketed

    return range_join_bucketed(
        _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
        num_shards=_event_shards(sf_dir),
    )


def range_join_per_user(g: pd.DataFrame) -> pd.DataFrame:
    import numpy as np_

    p = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
    v = g[g["event_type"] == "view"].sort_values("ts")
    if p.empty:
        return pd.DataFrame(
            {"purchase_id": pd.Series(dtype="int64"), "n_views_1h": pd.Series(dtype="int64")}
        )
    vts = v["ts"].to_numpy()
    pts = p["ts"].to_numpy()
    lo = np_.searchsorted(vts, pts - np_.timedelta64(RANGE_WINDOW_S, "s"), side="left")
    hi = np_.searchsorted(vts, pts, side="right")
    return pd.DataFrame(
        {
            "purchase_id": p["event_id"].astype("int64"),
            "n_views_1h": (hi - lo).astype("int64"),
        }
    )


SQL_EVENTS_RANGE_JOIN = f"""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT p.event_id AS purchase_id,
       CAST(count(v.ts) AS BIGINT) AS n_views_1h
FROM p LEFT JOIN v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL {RANGE_WINDOW_S} SECOND
 AND v.ts <= p.ts
GROUP BY p.event_id
"""


def q_events_running(sf_dir: str) -> rd.Dataset:
    """Running (cumulative) per-user aggregate ordered by event time — the
    windowed-aggregate operator: shuffle on user_id, sorted cumsum per
    group. Deterministic tie-break on event_id within equal timestamps."""
    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(remote_fn(_Q, "running_per_user"), batch_format="pandas")
    )


def running_per_user(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype("int64")
    return pd.DataFrame(
        {
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "running_cents": np.cumsum(cents),
            "running_n": np.arange(1, len(g) + 1, dtype="int64"),
        }
    )


SQL_EVENTS_RUNNING = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS running_n
FROM events
"""


def q_events_lag(sf_dir: str) -> rd.Dataset:
    """LAG window: each event's previous event type and exact microsecond
    gap within its user's (ts, event_id)-ordered stream — the
    previous-row-access window operator (events_running covers the
    cumulative-frame one). First event per user: ('none', -1)."""
    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(remote_fn(_Q, "lag_per_user"), batch_format="pandas")
    )


def lag_per_user(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    # exact integer microseconds — float total_seconds() would round
    us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    gap = np.empty(len(g), dtype="int64")
    gap[0] = -1
    gap[1:] = us[1:] - us[:-1]
    prev = np.empty(len(g), dtype=object)
    prev[0] = "none"
    prev[1:] = g["event_type"].to_numpy()[:-1]
    return pd.DataFrame(
        {
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "prev_type": pd.Series(prev, index=g.index, dtype="string"),
            "gap_us": gap,
        }
    )


SQL_EVENTS_LAG = """
SELECT event_id, user_id,
       COALESCE(LAG(event_type) OVER w, 'none') AS prev_type,
       COALESCE(date_diff('microsecond', LAG(ts) OVER w, ts), -1) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# near-dup dedup family (stages/dedup.py) + similarity search (stages/knn.py)
# ---------------------------------------------------------------------------
def q_minhash_dups(sf_dir: str) -> rd.Dataset:
    """MinHash(128)+LSH(16x8) near-dup pairs over documents + planted
    variants. Deterministic (seeded permutations) but not SQL-expressible
    -> rows-only driver check; pytest asserts planted-pair recovery."""
    from ..stages.dedup import docs_with_variants, minhash_dedup

    return minhash_dedup(docs_with_variants(sf_dir), threshold_x100=70)


def q_simhash_dups(sf_dir: str) -> rd.Dataset:
    """SimHash-64 pairs with Hamming <= 3 via 16-bit band bucketing."""
    from ..stages.dedup import docs_with_variants, simhash_dedup

    return simhash_dedup(docs_with_variants(sf_dir))


def q_ngram_jaccard_dups(sf_dir: str) -> rd.Dataset:
    """Exact 3-gram Jaccard >= 0.7 pairs via a frequency-capped inverted
    shingle index (coalesce block counts derived from the corpus bytes)."""
    from ..io import input_nbytes
    from ..stages.dedup import docs_with_variants, ngram_jaccard_dedup

    return ngram_jaccard_dedup(
        docs_with_variants(sf_dir),
        threshold_x100=70,
        size_hint_bytes=input_nbytes(os.path.join(sf_dir, "documents.parquet")),
    )


def q_minhash_keep_best(sf_dir: str) -> rd.Dataset:
    """Per-near-dup-cluster survivor selection by QUALITY (longest member,
    ties to lowest id) — the keep-best dedup decision over the MinHash
    clusters. Dump-twin oracle."""
    from ..stages.dedup import (
        cluster_keep_best,
        docs_with_variants,
        label_propagation_clusters,
        minhash_dedup,
    )

    docs = docs_with_variants(sf_dir)
    clusters = label_propagation_clusters(minhash_dedup(docs, threshold_x100=70))
    return cluster_keep_best(clusters, docs)


def q_minhash_incremental(sf_dir: str) -> rd.Dataset:
    """Incremental MinHash dedup against a PERSISTED signature/band index:
    the planted variant snapshot joins the base corpus' one-time index —
    history is never re-signatured (the per-crawl dedup cost is O(new),
    not O(corpus)). Dump-twin oracle."""
    from ..stages.dedup import minhash_dedup_incremental

    return minhash_dedup_incremental(sf_dir, threshold_x100=70)


def q_embedding_align(sf_dir: str) -> pd.DataFrame:
    """Margin-based embedding alignment (bitext-mining shape): odd-id
    queries matched to even-id candidates only when the best cosine beats
    the runner-up by >= 0.02. Dump-twin oracle (same kernels run
    single-process over the full candidate half)."""
    from ..stages.knn import embedding_align

    return embedding_align(sf_dir)


def q_ngram_containment(sf_dir: str) -> rd.Dataset:
    """Asymmetric n-gram containment dedup (Broder 1997): ordered pairs
    where >= 80% of the contained doc's shingles occur in the container —
    catches quote/wrapper duplication that symmetric Jaccard underscores.
    Dump-twin oracle (hashed shingles are not SQL-expressible)."""
    from ..io import input_nbytes
    from ..stages.dedup import docs_with_variants, ngram_containment

    return ngram_containment(
        docs_with_variants(sf_dir),
        threshold_x100=80,
        size_hint_bytes=input_nbytes(os.path.join(sf_dir, "documents.parquet")),
    )


def q_knn_bruteforce(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-5 for the 8 lowest vec_ids: broadcast query matrix,
    per-batch partial top-k, driver merge of the tiny candidate set.

    The similarity value itself is dropped from the exported columns: duckdb
    accumulates list_cosine_similarity differently from numpy float64, so a
    fixed-point sim column can differ by 1 ulp at the rounding boundary —
    the (query, neighbor, rank) set is the deterministic comparison."""
    from ..stages.knn import knn_bruteforce

    return knn_bruteforce(sf_dir, n_queries=8, k=5)[
        ["query_id", "neighbor_id", "rank"]
    ]


def q_ann_lsh(sf_dir: str) -> pd.DataFrame:
    """Approximate top-5 via random-hyperplane LSH bucket probing (the
    100 TB path; recall vs brute force asserted in tests). The raw sim
    column is dropped from the exported surface for the same 1-ulp
    robustness reason as ``knn_bruteforce``: (query, neighbor, rank) is
    the deterministic comparison."""
    from ..stages.knn import ann_lsh

    return ann_lsh(sf_dir, n_queries=8, k=5)[["query_id", "neighbor_id", "rank"]]


def q_ann_lsh_incremental(sf_dir: str) -> pd.DataFrame:
    """Index MAINTENANCE: the same ANN probe over an index built as a base
    snapshot (even vec_ids) plus an APPENDED second snapshot (odd ids) —
    new parquet files dropped into the existing bucket partitions, no
    rewrite (stages/knn.py:ensure_lsh_index_snapshots). Bucket content
    equals the single-shot build's, so this must reproduce ann_lsh's
    results bit-for-bit — the oracle IS ann_lsh's sequential twin."""
    from ..stages.knn import ann_lsh, ensure_lsh_index_snapshots

    idx = ensure_lsh_index_snapshots(sf_dir)
    return ann_lsh(sf_dir, n_queries=8, k=5, index_dir=idx)[
        ["query_id", "neighbor_id", "rank"]
    ]


def q_ann_ivf_incremental(sf_dir: str) -> pd.DataFrame:
    """Index MAINTENANCE, IVF flavor: assignment of an appended snapshot
    with the quantizer FROZEN from the original build (retraining would
    reshuffle existing lists). Must reproduce ann_ivf bit-for-bit — the
    oracle IS ann_ivf's sequential twin."""
    from ..stages.knn import ann_ivf, ensure_ivf_index_snapshots

    idx = ensure_ivf_index_snapshots(sf_dir)
    return ann_ivf(sf_dir, n_queries=8, k=5, index_dir=idx)[
        ["query_id", "neighbor_id", "rank"]
    ]


def q_ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF (k-means inverted lists, nprobe=4) approximate top-5 — the
    second ANN scale path beside LSH; recall vs brute force asserted in
    tests. Exported columns mirror ``ann_lsh`` (rank, not raw sims)."""
    from ..stages.knn import ann_ivf

    return ann_ivf(sf_dir, n_queries=8, k=5)[["query_id", "neighbor_id", "rank"]]


def q_ann_ivfpq(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ approximate top-5 — the compressed-index ANN path (Jegou et
    al. 2011): candidates rank by ADC lookup-table sums over 8-byte PQ
    codes, never raw vectors; the probed index partitions are 32x smaller
    than the flat IVF lists. Recall vs brute force asserted in tests."""
    from ..stages.knn import ann_ivfpq

    return ann_ivfpq(sf_dir, n_queries=8, k=5)[["query_id", "neighbor_id", "rank"]]


def q_embedding_dups(sf_dir: str) -> rd.Dataset:
    """Exact embedding near-dup pairs (cosine >= 0.35)."""
    from ..stages.knn import embedding_dups

    return embedding_dups(sf_dir, tau_e6=350_000)


def q_embedding_clusters(sf_dir: str) -> rd.Dataset:
    """SemDeDup-adjacent whole-graph view: connected components over the
    EXACT embedding near-dup pairs — the same distributed min-label
    propagation that clusters the MinHash graph, composed over a second
    pair source. Returns (doc_id, cluster_id, cluster_size, keep) for
    every vector in >= 1 pair; keep marks the lowest-id survivor. The
    dump twin runs the INDEPENDENT sequential algorithm (union-find) over
    pairs derived by DuckDB's own list_cosine_similarity."""
    from ..stages.dedup import label_propagation_clusters

    pairs = q_embedding_dups(sf_dir).rename_columns(
        {"vec_a": "doc_a", "vec_b": "doc_b"}
    )
    return label_propagation_clusters(pairs).sort("doc_id")


def q_embedding_dups_lsh(sf_dir: str) -> rd.Dataset:
    """Approximate (sub-quadratic) embedding near-dup pairs over the
    persisted LSH bucket index — the 100 TB path; recall vs the exact
    operator asserted in tests."""
    from ..stages.knn import embedding_dups_lsh

    return embedding_dups_lsh(sf_dir, tau_e6=350_000)




def q_minhash_clusters(sf_dir: str) -> rd.Dataset:
    """Dedup cluster assignment: near-dup pairs -> connected components ->
    (doc_id, cluster_id, cluster_size, keep). The keep=true rows are the
    corpus after near-dup removal."""
    from ..stages.dedup import docs_with_variants, minhash_clusters

    return minhash_clusters(docs_with_variants(sf_dir), threshold_x100=70)


SQL_KNN_BRUTEFORCE = """
WITH q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id,
         CAST(floor(sim*1000000 + 0.5) AS BIGINT) AS sim_e6,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""

SQL_EMBEDDING_DUPS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
"""


# ---------------------------------------------------------------------------
# registry (extended by other modules)
# ---------------------------------------------------------------------------
QUERIES: Dict[str, Callable[[str], object]] = {
    "corpus_stats": q_corpus_stats,
    "dedup_exact": q_dedup_exact,
    "top_docs": q_top_docs,
    "pricing_summary": q_pricing_summary,
    "events_hourly": q_events_hourly,
    "sessionize": q_sessionize,
    "customer_geo": q_customer_geo,
    "orders_by_segment": q_orders_by_segment,
    "top_customers": q_top_customers,
    "distinct_event_types": q_distinct_event_types,
    "distinct_users_by_type": q_distinct_users_by_type,
    "supplier_by_nation": q_supplier_by_nation,
    "part_ship_stats": q_part_ship_stats,
    "lang_id": q_lang_id,
    "text_quality": q_text_quality,
    "token_stats": q_token_stats,
    "fingerprint": q_fingerprint,
    "fingerprint_rolling": q_fingerprint_rolling,
    "doc_size_quantiles": q_doc_size_quantiles,
    "events_sample": q_events_sample,
    "events_sliding": q_events_sliding,
    "customers_semi": q_customers_semi,
    "customers_semi_bloom": q_customers_semi_bloom,
    "customers_anti": q_customers_anti,
    "events_asof": q_events_asof,
    "events_range_join": q_events_range_join,
    "train_test_split": q_train_test_split,
    "events_running": q_events_running,
    "events_lag": q_events_lag,
    "minhash_dups": q_minhash_dups,
    "minhash_clusters": q_minhash_clusters,
    "simhash_dups": q_simhash_dups,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "ngram_containment": q_ngram_containment,
    "embedding_align": q_embedding_align,
    "minhash_incremental": q_minhash_incremental,
    "minhash_keep_best": q_minhash_keep_best,
    "knn_bruteforce": q_knn_bruteforce,
    "ann_lsh": q_ann_lsh,
    "ann_lsh_incremental": q_ann_lsh_incremental,  # oracle: ann_lsh's twin
    "ann_ivf": q_ann_ivf,
    "ann_ivf_incremental": q_ann_ivf_incremental,  # oracle: ann_ivf's twin
    "ann_ivfpq": q_ann_ivfpq,  # dump-backed oracle
    "embedding_dups": q_embedding_dups,
    "embedding_dups_lsh": q_embedding_dups_lsh,
    "embedding_clusters": q_embedding_clusters,  # dump-backed oracle
}

ORACLES: Dict[str, str] = {
    "corpus_stats": SQL_CORPUS_STATS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "top_docs": SQL_TOP_DOCS,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "events_hourly": SQL_EVENTS_HOURLY,
    "sessionize": SQL_SESSIONIZE,
    "customer_geo": SQL_CUSTOMER_GEO,
    "orders_by_segment": SQL_ORDERS_BY_SEGMENT,
    "top_customers": SQL_TOP_CUSTOMERS,
    "distinct_event_types": SQL_DISTINCT_EVENT_TYPES,
    "distinct_users_by_type": SQL_DISTINCT_USERS_BY_TYPE,
    "supplier_by_nation": SQL_SUPPLIER_BY_NATION,
    "part_ship_stats": SQL_PART_SHIP_STATS,
}

# text-analysis oracles live beside their kernels
from ..stages.textqc import (  # noqa: E402
    SQL_FINGERPRINT,
    SQL_TEXT_QUALITY,
    SQL_TOKEN_STATS,
    sql_lang_id,
)

ORACLES.update(
    {
        "lang_id": sql_lang_id(),
        "text_quality": SQL_TEXT_QUALITY,
        "token_stats": SQL_TOKEN_STATS,
        "fingerprint": SQL_FINGERPRINT,
        # fingerprint_rolling: dump-backed oracle (state/oracle_dump.py)
        "knn_bruteforce": SQL_KNN_BRUTEFORCE,
        "doc_size_quantiles": SQL_DOC_SIZE_QUANTILES,
        "events_sample": SQL_EVENTS_SAMPLE,
        "events_sliding": SQL_EVENTS_SLIDING,
        "customers_semi": SQL_CUSTOMERS_SEMI,
        "customers_semi_bloom": SQL_CUSTOMERS_SEMI,
        "customers_anti": SQL_CUSTOMERS_ANTI,
        "events_asof": SQL_EVENTS_ASOF,
        "events_range_join": SQL_EVENTS_RANGE_JOIN,
        "train_test_split": SQL_TRAIN_TEST_SPLIT,
        "events_running": SQL_EVENTS_RUNNING,
        "events_lag": SQL_EVENTS_LAG,
        "embedding_dups": SQL_EMBEDDING_DUPS,
        # minhash/simhash/ngram-jaccard/ann_lsh/ann_ivf/embedding_dups_lsh:
        # dump-backed oracles (state/oracle_dump_near.py), added by oracles()
    }
)

# extraction-surface queries (pages corpus; byte-identity held by
# tests/test_pipeline_e2e.py, driver-checked via sequential-oracle dumps)
from .queries_extract import EXTRACT_QUERIES  # noqa: E402

QUERIES.update(EXTRACT_QUERIES)

# word-level corpus operators (repetition quality, bigram top-k, group
# top-k window rank, tf-idf-style top terms, HLL sketch, composite prep)
# — all DuckDB-oracle-checked (HLL via its sequential-twin dump)
from .queries_corpus import (  # noqa: E402
    CORPUS_ORACLES,
    CORPUS_QUERIES,
    PREP_SPLIT_MULT,
    PREP_SPLIT_TRAIN_PCT,
)

# the composite prep pipeline reuses split_partial; its duplicated SQL
# constants must track the originals
assert PREP_SPLIT_MULT == SPLIT_MULT and PREP_SPLIT_TRAIN_PCT == SPLIT_TRAIN_PCT

QUERIES.update(CORPUS_QUERIES)
ORACLES.update(CORPUS_ORACLES)

# training-data prep operators (decontamination, chunking, stratified
# sampling, PII scrubbing, canonical-doc selection) — all static-SQL checked
from .queries_prep import PREP_ORACLES, PREP_QUERIES  # noqa: E402

QUERIES.update(PREP_QUERIES)
ORACLES.update(PREP_ORACLES)

# keyword search + BM25 ranking (keyword_search static-SQL checked;
# bm25_topk via the sequential dump twin in state/oracle_dump_near.py)
from .queries_search import SEARCH_ORACLES, SEARCH_QUERIES  # noqa: E402

QUERIES.update(SEARCH_QUERIES)
ORACLES.update(SEARCH_ORACLES)

# window / positional operators: grouped rank, global NTILE, sequence
# packing (distributed prefix sum), target-mix resampling — all static-SQL
from .queries_window import WINDOW_ORACLES, WINDOW_QUERIES  # noqa: E402

QUERIES.update(WINDOW_QUERIES)
ORACLES.update(WINDOW_ORACLES)

# embedding-column operators: grouped fixed-point centroids (static SQL)
# and full-corpus distributed k-means (sequential dump twin)
from .queries_embed import EMBED_ORACLES, EMBED_QUERIES  # noqa: E402

QUERIES.update(EMBED_QUERIES)
ORACLES.update(EMBED_ORACLES)

# aggregation family: bounded sliding window, ordered string_agg,
# width-bucket histogram, DDSketch quantiles (all static SQL)
from .queries_agg import AGG_ORACLES, AGG_QUERIES  # noqa: E402

QUERIES.update(AGG_QUERIES)
ORACLES.update(AGG_ORACLES)

# relational completeness: ordered funnel, INTERSECT/EXCEPT set ops,
# grouped Pearson correlation (all static SQL)
from .queries_rel import REL_ORACLES, REL_QUERIES  # noqa: E402

QUERIES.update(REL_QUERIES)
ORACLES.update(REL_ORACLES)

# positional-substring family: duplicate-span detection (Lee et al.-style
# exact substring dedup), positional phrase search, cross-snapshot
# incremental dedup (all static SQL)
from .queries_substr import SUBSTR_ORACLES, SUBSTR_QUERIES  # noqa: E402

QUERIES.update(SUBSTR_QUERIES)
ORACLES.update(SUBSTR_ORACLES)

# the composed LLM training-data recipe (quality filter -> dedup ->
# decontaminate -> chunk -> accounting) — sequential-twin dump oracle
from .queries_recipe import RECIPE_QUERIES  # noqa: E402

QUERIES.update(RECIPE_QUERIES)

# training-engine widening: BPE merge learning, compression-ratio
# signal, table profiling, MG heavy hitters, KREC source scan
from .queries_train import TRAIN_ORACLES, TRAIN_QUERIES  # noqa: E402

QUERIES.update(TRAIN_QUERIES)
ORACLES.update(TRAIN_ORACLES)

# out-of-order / late-data streaming: watermark accounting over the
# arrival-ordered events stream (two-level distributed prefix max)
from .queries_stream import STREAM_ORACLES, STREAM_QUERIES  # noqa: E402

QUERIES.update(STREAM_QUERIES)
ORACLES.update(STREAM_ORACLES)

# ingestion-side exactly-once accounting: TTL'd duplicate suppression
# over planted at-least-once arrivals
from .queries_ingest import INGEST_ORACLES, INGEST_QUERIES  # noqa: E402

QUERIES.update(INGEST_QUERIES)
ORACLES.update(INGEST_ORACLES)

# collocation mining: exact-integer PMI bigram scoring (tokenizer prep)
from .queries_colloc import COLLOC_ORACLES, COLLOC_QUERIES  # noqa: E402

QUERIES.update(COLLOC_QUERIES)
ORACLES.update(COLLOC_ORACLES)

# graph degeneracy: coreness by distributed H-index iteration (dump
# twin: independent Batagelj-Zaversnik peel in oracle_dump_train)
from .queries_graph import GRAPH_QUERIES  # noqa: E402

QUERIES.update(GRAPH_QUERIES)

# leak-free group split: source-integrity train/val/test assignment
from .queries_split import SPLIT_ORACLES, SPLIT_QUERIES  # noqa: E402

QUERIES.update(SPLIT_QUERIES)
ORACLES.update(SPLIT_ORACLES)

# prefix-filtered all-pairs cosine set-similarity self-join (independent
# naive-exact DuckDB oracle — checks the AllPairs/PPJoin filter math)
from .queries_simjoin import SIMJOIN_ORACLES, SIMJOIN_QUERIES  # noqa: E402

QUERIES.update(SIMJOIN_QUERIES)
ORACLES.update(SIMJOIN_ORACLES)

# link-graph + page-metadata extraction over the pages corpus
# (dump-twin oracles: state/oracle_dump_links.py, added by oracles())
from .queries_links import LINKS_QUERIES  # noqa: E402

QUERIES.update(LINKS_QUERIES)

# sorted-neighborhood near-dup blocking (window self-join oracle)
from .queries_snm import SNM_ORACLES, SNM_QUERIES  # noqa: E402

QUERIES.update(SNM_QUERIES)
ORACLES.update(SNM_ORACLES)

# distributed BFS frontier traversal (recursive-CTE oracle)
from .queries_bfs import BFS_ORACLES, BFS_QUERIES  # noqa: E402

QUERIES.update(BFS_QUERIES)
ORACLES.update(BFS_ORACLES)

# evaluation / training-order operators (AUC, shard shuffle, decayed
# per-user state, curriculum interleave)
from .queries_eval import EVAL_ORACLES, EVAL_QUERIES  # noqa: E402

QUERIES.update(EVAL_QUERIES)
ORACLES.update(EVAL_ORACLES)

# Link prediction + 2-hop aggregation on the planted doc graph
from .queries_linkpred import LINKPRED_ORACLES, LINKPRED_QUERIES  # noqa: E402

QUERIES.update(LINKPRED_QUERIES)
ORACLES.update(LINKPRED_ORACLES)

# Lexical diversity: type-token ratio, distinct-n trigram diversity
from .queries_lexstats import LEXSTATS_ORACLES, LEXSTATS_QUERIES  # noqa: E402

QUERIES.update(LEXSTATS_QUERIES)
ORACLES.update(LEXSTATS_ORACLES)

# Data layout: Z-order clustering stats + compaction (FFD) planning
from .queries_layout import LAYOUT_ORACLES, LAYOUT_QUERIES  # noqa: E402

QUERIES.update(LAYOUT_QUERIES)
ORACLES.update(LAYOUT_ORACLES)

# Readability scoring (Flesch reading ease, integer milli-units)
from .queries_textmetrics import (  # noqa: E402
    TEXTMETRICS_ORACLES,
    TEXTMETRICS_QUERIES,
)

QUERIES.update(TEXTMETRICS_QUERIES)
ORACLES.update(TEXTMETRICS_ORACLES)

# Pipeline-health monitoring: CUSUM drift over daily volume
from .queries_monitor import MONITOR_ORACLES, MONITOR_QUERIES  # noqa: E402

QUERIES.update(MONITOR_QUERIES)
ORACLES.update(MONITOR_ORACLES)

# Local clustering coefficient (triangle-machinery reuse)
from .queries_graphx import GRAPHX_ORACLES, GRAPHX_QUERIES  # noqa: E402

QUERIES.update(GRAPHX_QUERIES)
ORACLES.update(GRAPHX_ORACLES)

# HITS hubs/authorities over the planted host graph (dump-backed oracle)
from .queries_webgraph import WEBGRAPH_ORACLES, WEBGRAPH_QUERIES  # noqa: E402

QUERIES.update(WEBGRAPH_QUERIES)
ORACLES.update(WEBGRAPH_ORACLES)

# Chi-square term/class feature selection
from .queries_featsel import FEATSEL_ORACLES, FEATSEL_QUERIES  # noqa: E402

QUERIES.update(FEATSEL_QUERIES)
ORACLES.update(FEATSEL_ORACLES)

# Behavioral analytics: cohort retention + inter-arrival dispersion
from .queries_behavior import BEHAVIOR_ORACLES, BEHAVIOR_QUERIES  # noqa: E402

QUERIES.update(BEHAVIOR_QUERIES)
ORACLES.update(BEHAVIOR_ORACLES)

# Reciprocal-rank fusion (two-ranker retrieval fusion)
from .queries_fusion import FUSION_ORACLES, FUSION_QUERIES  # noqa: E402

QUERIES.update(FUSION_QUERIES)
ORACLES.update(FUSION_ORACLES)

# Quality-tier extraction (the graft's headline bucketing)
from .queries_tiers import TIERS_ORACLES, TIERS_QUERIES  # noqa: E402

QUERIES.update(TIERS_QUERIES)
ORACLES.update(TIERS_ORACLES)

# Encoding-anomaly QC (planted-variant mojibake profiling)
from .queries_encqc import ENCQC_ORACLES, ENCQC_QUERIES  # noqa: E402

QUERIES.update(ENCQC_QUERIES)
ORACLES.update(ENCQC_ORACLES)

# Per-user Gini-Simpson behavioral diversity
from .queries_diversity import DIVERSITY_ORACLES, DIVERSITY_QUERIES  # noqa: E402

QUERIES.update(DIVERSITY_QUERIES)
ORACLES.update(DIVERSITY_ORACLES)

# A/B conversion chi-square (experimentation primitive)
from .queries_abtest import ABTEST_ORACLES, ABTEST_QUERIES  # noqa: E402

QUERIES.update(ABTEST_QUERIES)
ORACLES.update(ABTEST_ORACLES)

from .queries_benford import BENFORD_ORACLES, BENFORD_QUERIES  # noqa: E402

QUERIES.update(BENFORD_QUERIES)
ORACLES.update(BENFORD_ORACLES)

from .queries_forecast import (  # noqa: E402
    FORECAST_ORACLES,
    FORECAST_QUERIES,
)

QUERIES.update(FORECAST_QUERIES)
ORACLES.update(FORECAST_ORACLES)

from .queries_apportion import (  # noqa: E402
    APPORTION_ORACLES,
    APPORTION_QUERIES,
)

QUERIES.update(APPORTION_QUERIES)
ORACLES.update(APPORTION_ORACLES)

from .queries_drift import DRIFT_ORACLES, DRIFT_QUERIES  # noqa: E402

QUERIES.update(DRIFT_QUERIES)
ORACLES.update(DRIFT_ORACLES)

from .queries_rankeval import (  # noqa: E402
    RANKEVAL_ORACLES,
    RANKEVAL_QUERIES,
)

QUERIES.update(RANKEVAL_QUERIES)
ORACLES.update(RANKEVAL_ORACLES)

from .queries_markoveval import (  # noqa: E402
    MARKOVEVAL_ORACLES,
    MARKOVEVAL_QUERIES,
)

QUERIES.update(MARKOVEVAL_QUERIES)
ORACLES.update(MARKOVEVAL_ORACLES)

from .queries_journeys import (  # noqa: E402
    JOURNEYS_ORACLES,
    JOURNEYS_QUERIES,
)

QUERIES.update(JOURNEYS_QUERIES)
ORACLES.update(JOURNEYS_ORACLES)

from .queries_robust import ROBUST_ORACLES, ROBUST_QUERIES  # noqa: E402

QUERIES.update(ROBUST_QUERIES)
ORACLES.update(ROBUST_ORACLES)

from .queries_tierdrift import (  # noqa: E402
    TIERDRIFT_ORACLES,
    TIERDRIFT_QUERIES,
)

QUERIES.update(TIERDRIFT_QUERIES)
ORACLES.update(TIERDRIFT_ORACLES)

from .queries_dedupeval import DEDUPEVAL_QUERIES  # noqa: E402

QUERIES.update(DEDUPEVAL_QUERIES)
# dedupeval oracles are dump-path-dependent: added by oracles()

from .queries_trade import TRADE_ORACLES, TRADE_QUERIES  # noqa: E402

QUERIES.update(TRADE_QUERIES)
ORACLES.update(TRADE_ORACLES)

from .queries_budget import BUDGET_ORACLES, BUDGET_QUERIES  # noqa: E402

QUERIES.update(BUDGET_QUERIES)
ORACLES.update(BUDGET_ORACLES)

# Correlated-subquery rewrites: argmin-per-group (Q2), multi-EXISTS (Q21),
# scalar-broadcast + anti join (Q22)
from .queries_relx import RELX_ORACLES, RELX_QUERIES  # noqa: E402

QUERIES.update(RELX_QUERIES)
ORACLES.update(RELX_ORACLES)

# Exact-integer two-sample KS drift (cross-multiplied CDFs)
from .queries_kstest import KSTEST_ORACLES, KSTEST_QUERIES  # noqa: E402

QUERIES.update(KSTEST_QUERIES)
ORACLES.update(KSTEST_ORACLES)

# Lag-k autocorrelation of daily event volume (exact integer ACF)
from .queries_acf import ACF_ORACLES, ACF_QUERIES  # noqa: E402

QUERIES.update(ACF_QUERIES)
ORACLES.update(ACF_ORACLES)

# Classifier-calibration reliability bins (lang-ID evidence vs label)
from .queries_calib import CALIB_ORACLES, CALIB_QUERIES  # noqa: E402

QUERIES.update(CALIB_QUERIES)
ORACLES.update(CALIB_ORACLES)

# Bot/velocity abuse flagging over the events stream (telescoped mean gap)
from .queries_velocity import (  # noqa: E402
    VELOCITY_ORACLES,
    VELOCITY_QUERIES,
)

QUERIES.update(VELOCITY_QUERIES)
ORACLES.update(VELOCITY_ORACLES)

# Perceptual-hash image near-dup (banded LSH; brute-force dump twin in
# state/oracle_dump.py, added by oracles())
from .queries_phash import PHASH_QUERIES  # noqa: E402

QUERIES.update(PHASH_QUERIES)

# Scalar-subquery rewrites II: per-part-average compare (Q17), global
# argmax window (Q15), disjunctive pushdown (Q19)
from .queries_relx2 import RELX2_ORACLES, RELX2_QUERIES  # noqa: E402

QUERIES.update(RELX2_QUERIES)
ORACLES.update(RELX2_ORACLES)

# Importance-weight ESS diagnostic (Kish) per language
from .queries_ess import ESS_ORACLES, ESS_QUERIES  # noqa: E402

QUERIES.update(ESS_QUERIES)
ORACLES.update(ESS_ORACLES)

# Exact grouped mode with pinned tie-break (packed argmax)
from .queries_modal import MODAL_ORACLES, MODAL_QUERIES  # noqa: E402

QUERIES.update(MODAL_QUERIES)
ORACLES.update(MODAL_ORACLES)

# Cross-source trigram-overlap matrix (mixing diagnostic)
from .queries_srcoverlap import (  # noqa: E402
    SRCOVERLAP_ORACLES,
    SRCOVERLAP_QUERIES,
)

QUERIES.update(SRCOVERLAP_QUERIES)
ORACLES.update(SRCOVERLAP_ORACLES)

# Heaps-law vocabulary-growth curve (first-occurrence + bit-length bands)
from .queries_heaps import HEAPS_ORACLES, HEAPS_QUERIES  # noqa: E402

QUERIES.update(HEAPS_QUERIES)
ORACLES.update(HEAPS_ORACLES)

# Rendezvous-hashing resize-movement matrix (layout evidence)
from .queries_hrw import HRW_ORACLES, HRW_QUERIES  # noqa: E402

QUERIES.update(HRW_QUERIES)
ORACLES.update(HRW_ORACLES)

# Gaps-and-islands longest streak (window-island rewrite)
from .queries_streak import STREAK_ORACLES, STREAK_QUERIES  # noqa: E402

QUERIES.update(STREAK_QUERIES)
ORACLES.update(STREAK_ORACLES)

# Per-source unigram KL drift (dump-backed fixed-point twin)
from .queries_kl import KL_QUERIES  # noqa: E402

QUERIES.update(KL_QUERIES)

# Rolling order-statistic window (odd-window exact running median)
from .queries_rollmed import ROLLMED_ORACLES, ROLLMED_QUERIES  # noqa: E402

QUERIES.update(ROLLMED_QUERIES)
ORACLES.update(ROLLMED_ORACLES)

# Skyline / Pareto frontier (local-skyline-then-merge)
from .queries_skyline import SKYLINE_ORACLES, SKYLINE_QUERIES  # noqa: E402

QUERIES.update(SKYLINE_QUERIES)
ORACLES.update(SKYLINE_ORACLES)

# Sampling-estimator error audit (probe-calibration evidence)
from .queries_sampleval import (  # noqa: E402
    SAMPLEVAL_ORACLES,
    SAMPLEVAL_QUERIES,
)

QUERIES.update(SAMPLEVAL_QUERIES)
ORACLES.update(SAMPLEVAL_ORACLES)

# Multi-touch linear attribution (largest-remainder exact credit)
from .queries_attrib import ATTRIB_ORACLES, ATTRIB_QUERIES  # noqa: E402

QUERIES.update(ATTRIB_QUERIES)
ORACLES.update(ATTRIB_ORACLES)

# Seasonal-naive forecast backtest (exact integer MAE per lag)
from .queries_backtest import (  # noqa: E402
    BACKTEST_ORACLES,
    BACKTEST_QUERIES,
)

QUERIES.update(BACKTEST_QUERIES)
ORACLES.update(BACKTEST_ORACLES)

# Market-share / promo-ratio rollups (TPC-H Q8/Q14 flavored)
from .queries_mktshare import (  # noqa: E402
    MKTSHARE_ORACLES,
    MKTSHARE_QUERIES,
)

QUERIES.update(MKTSHARE_QUERIES)
ORACLES.update(MKTSHARE_ORACLES)

# KMV distinct sketch with union/Jaccard set-operation estimates
from .queries_kmv import KMV_ORACLES, KMV_QUERIES  # noqa: E402

QUERIES.update(KMV_QUERIES)
ORACLES.update(KMV_ORACLES)

# MOSS winnowing fingerprint selection (Schleimer 2003)
from .queries_winnow import WINNOW_ORACLES, WINNOW_QUERIES  # noqa: E402

QUERIES.update(WINNOW_QUERIES)
ORACLES.update(WINNOW_ORACLES)

# Crawl politeness scheduling bound (dump-twin oracle)
from .queries_crawl import CRAWL_QUERIES  # noqa: E402

QUERIES.update(CRAWL_QUERIES)

# Declarative data-quality constraint suite (Deequ-style)
from .queries_dq import DQ_ORACLES, DQ_QUERIES  # noqa: E402

QUERIES.update(DQ_QUERIES)
ORACLES.update(DQ_ORACLES)

# Duffield priority sampling with exact fixed-point estimator
from .queries_priority import (  # noqa: E402
    PRIORITY_ORACLES,
    PRIORITY_QUERIES,
)

QUERIES.update(PRIORITY_QUERIES)
ORACLES.update(PRIORITY_ORACLES)

# Parquet footer audit (independent duckdb parquet_metadata oracle,
# sf-dir-parameterized — added inside oracles())
from .queries_meta import META_QUERIES  # noqa: E402

QUERIES.update(META_QUERIES)

# Grid-bucketed interval-overlap join (owner-cell uniqueness, no dedup)
from .queries_interval import (  # noqa: E402
    INTERVAL_ORACLES,
    INTERVAL_QUERIES,
)

QUERIES.update(INTERVAL_QUERIES)
ORACLES.update(INTERVAL_ORACLES)

# Fuzzy master-name canonicalization (broadcast hamming-1 join; dump twin)
from .queries_fuzzy import FUZZY_QUERIES  # noqa: E402

QUERIES.update(FUZZY_QUERIES)

# Cross-source duplication matrix over the minhash pair set (dump twin)
from .queries_dupmatrix import DUPMATRIX_QUERIES  # noqa: E402

QUERIES.update(DUPMATRIX_QUERIES)

# Inverted-index postings compression accounting (delta/Elias-γ bits)
from .queries_postings import (  # noqa: E402
    POSTINGS_ORACLES,
    POSTINGS_QUERIES,
)

QUERIES.update(POSTINGS_QUERIES)
ORACLES.update(POSTINGS_ORACLES)

# Training-shard source-mix entropy (shuffle-quality audit)
from .queries_shardmix import (  # noqa: E402
    SHARDMIX_ORACLES,
    SHARDMIX_QUERIES,
)

QUERIES.update(SHARDMIX_QUERIES)
ORACLES.update(SHARDMIX_ORACLES)

# Measured Bloom false-positive rate (independent HUGEINT splitmix twin)
from .queries_bloomeval import (  # noqa: E402
    BLOOMEVAL_ORACLES,
    BLOOMEVAL_QUERIES,
)

QUERIES.update(BLOOMEVAL_QUERIES)
ORACLES.update(BLOOMEVAL_ORACLES)

# Contrastive training pairs from near-dup clusters (dump-derived twin)
from .queries_contrastive import CONTRASTIVE_QUERIES  # noqa: E402

QUERIES.update(CONTRASTIVE_QUERIES)

# Footer-stats scan-pruning evaluation (sf-parameterized static SQL)
from .queries_prune import PRUNE_QUERIES  # noqa: E402

QUERIES.update(PRUNE_QUERIES)

# Windowed token co-occurrence counts (skip-gram statistics)
from .queries_cooccur import (  # noqa: E402
    COOCCUR_ORACLES,
    COOCCUR_QUERIES,
)

QUERIES.update(COOCCUR_QUERIES)
ORACLES.update(COOCCUR_ORACLES)

# Interpolated Kneser-Ney bigram LM in exact integer arithmetic
from .queries_knlm import KNLM_ORACLES, KNLM_QUERIES  # noqa: E402

QUERIES.update(KNLM_QUERIES)
ORACLES.update(KNLM_ORACLES)

# Multi-pattern dictionary tagging (vectorized substring scan)
from .queries_dict import DICT_ORACLES, DICT_QUERIES  # noqa: E402

QUERIES.update(DICT_QUERIES)
ORACLES.update(DICT_ORACLES)

# Decile lift / cumulative-gain ranking eval (doc_ntile machinery)
from .queries_lift import LIFT_ORACLES, LIFT_QUERIES  # noqa: E402

QUERIES.update(LIFT_QUERIES)
ORACLES.update(LIFT_ORACLES)

# N-gram novelty: first-occurrence attribution (dedup accounting)
from .queries_novelty import NOVELTY_ORACLES, NOVELTY_QUERIES  # noqa: E402

QUERIES.update(NOVELTY_QUERIES)
ORACLES.update(NOVELTY_ORACLES)

# Functional-dependency discovery (data-profiling / key certification)
from .queries_fd import FD_ORACLES, FD_QUERIES  # noqa: E402

QUERIES.update(FD_QUERIES)
ORACLES.update(FD_ORACLES)

# Sequential-pattern support mining (ordered pair, gap allowed)
from .queries_seqpat import SEQPAT_ORACLES, SEQPAT_QUERIES  # noqa: E402

QUERIES.update(SEQPAT_QUERIES)
ORACLES.update(SEQPAT_ORACLES)

# Greedy set-cover source selection (dump-twin oracle via train dumps)
from .queries_cover import COVER_QUERIES  # noqa: E402

QUERIES.update(COVER_QUERIES)

# Deterministic random-walk generation (node2vec/DeepWalk sampling)
from .queries_walks import WALKS_ORACLES, WALKS_QUERIES  # noqa: E402

QUERIES.update(WALKS_QUERIES)
ORACLES.update(WALKS_ORACLES)

# Redirect-chain resolution (pointer-doubling functional closure)
from .queries_redirect import REDIRECT_ORACLES, REDIRECT_QUERIES  # noqa: E402

QUERIES.update(REDIRECT_QUERIES)
ORACLES.update(REDIRECT_ORACLES)

# Join-explosion profiling (skew advisor for the join family)
from .queries_joinprof import JOINPROF_ORACLES, JOINPROF_QUERIES  # noqa: E402

QUERIES.update(JOINPROF_QUERIES)
ORACLES.update(JOINPROF_ORACLES)

# Embedding isotropy diagnostics (representation-collapse QC)
from .queries_isotropy import ISOTROPY_ORACLES, ISOTROPY_QUERIES  # noqa: E402

QUERIES.update(ISOTROPY_QUERIES)
ORACLES.update(ISOTROPY_ORACLES)

# Grouped hypothesis tests (skew/kurtosis, Welch t, Spearman, Kendall, MWU)
from .queries_stats2 import STATS2_ORACLES, STATS2_QUERIES  # noqa: E402

QUERIES.update(STATS2_QUERIES)
ORACLES.update(STATS2_ORACLES)

# Graph additions: double-sweep diameter, LPA communities, Borůvka MSF
# (LPA/MSF oracles are dump-twins added by oracles())
from .queries_graphy import GRAPHY_ORACLES, GRAPHY_QUERIES  # noqa: E402

QUERIES.update(GRAPHY_QUERIES)
ORACLES.update(GRAPHY_ORACLES)

# Zipf fit, percent_rank/cume_dist, correlated-subquery decorrelation
from .queries_rank2 import RANK2_ORACLES, RANK2_QUERIES  # noqa: E402

QUERIES.update(RANK2_QUERIES)
ORACLES.update(RANK2_ORACLES)

# Incremental materialized-view maintenance (counting algebra)
from .queries_mv import MV_ORACLES, MV_QUERIES  # noqa: E402

QUERIES.update(MV_QUERIES)
ORACLES.update(MV_ORACLES)

# AMS F2 self-join-size sketch + l-diversity governance audit
from .queries_estim import ESTIM_ORACLES, ESTIM_QUERIES  # noqa: E402

QUERIES.update(ESTIM_QUERIES)
ORACLES.update(ESTIM_ORACLES)

# MMR-diversified rerank (dump-twin oracle added by oracles())
from .queries_mmr import MMR_QUERIES_REG  # noqa: E402

QUERIES.update(MMR_QUERIES_REG)

# Kaplan-Meier survival + Theil-Sen robust trend
from .queries_surv import SURV_ORACLES, SURV_QUERIES  # noqa: E402

QUERIES.update(SURV_QUERIES)
ORACLES.update(SURV_ORACLES)

# Wald SPRT sequential test over the ordered event stream
from .queries_sprt import SPRT_ORACLES, SPRT_QUERIES  # noqa: E402

QUERIES.update(SPRT_QUERIES)
ORACLES.update(SPRT_ORACLES)

# Isotonic (PAV) calibration — GCM dump-twin oracle added by oracles()
from .queries_iso import ISO_QUERIES  # noqa: E402

QUERIES.update(ISO_QUERIES)

# Deterministic Poisson bootstrap CI (one-pass resampling)
from .queries_boot import BOOT_ORACLES, BOOT_QUERIES  # noqa: E402

QUERIES.update(BOOT_QUERIES)
ORACLES.update(BOOT_ORACLES)

# Chao1/Good-Turing vocabulary richness + weighted median
from .queries_rich import RICH_ORACLES, RICH_QUERIES  # noqa: E402

QUERIES.update(RICH_QUERIES)
ORACLES.update(RICH_ORACLES)

# PR-AUC step curve + expected calibration error
from .queries_prcurve import PRCURVE_ORACLES, PRCURVE_QUERIES  # noqa: E402

QUERIES.update(PRCURVE_QUERIES)
ORACLES.update(PRCURVE_ORACLES)

# XML sitemap source (synthesize -> ElementTree parse -> summary)
from .queries_sitemap import SITEMAP_ORACLES, SITEMAP_QUERIES  # noqa: E402

QUERIES.update(SITEMAP_QUERIES)
ORACLES.update(SITEMAP_ORACLES)


def oracles(sf_dir: Optional[str] = None) -> Dict[str, str]:
    """The full oracle dict: static SQL over the driver's views plus the
    dump-backed oracles (sequential-oracle parquet dumps generated on
    demand — see state/oracle_dump.py for the extraction/media/lineage
    surfaces and state/oracle_dump_near.py for the near-dup/ANN family).
    The driver runs its gate at sf=0.01, so that is the default dump
    target."""
    from ..state.oracle_dump import ORACLE_SF, extract_oracle_sqls
    from ..state.oracle_dump_links import links_oracle_sqls
    from ..state.oracle_dump_near import near_oracle_sqls
    from ..state.oracle_dump_train import train_oracle_sqls

    from .queries_dedupeval import dedupeval_oracle_sqls
    from .queries_graphy import graphy_oracle_sqls
    from .queries_meta import meta_oracle_sqls
    from .queries_prune import prune_oracle_sqls

    out = dict(ORACLES)
    out.update(extract_oracle_sqls(sf_dir or ORACLE_SF))
    out.update(near_oracle_sqls(sf_dir or ORACLE_SF))
    out.update(train_oracle_sqls(sf_dir or ORACLE_SF))
    out.update(links_oracle_sqls(sf_dir or ORACLE_SF))
    out.update(dedupeval_oracle_sqls(sf_dir or ORACLE_SF))
    out.update(meta_oracle_sqls(sf_dir or ORACLE_SF))
    out.update(prune_oracle_sqls(sf_dir or ORACLE_SF))
    out.update(graphy_oracle_sqls(sf_dir or ORACLE_SF))
    from .queries_mmr import mmr_oracle_sqls

    out.update(mmr_oracle_sqls(sf_dir or ORACLE_SF))
    from .queries_iso import iso_oracle_sqls

    out.update(iso_oracle_sqls(sf_dir or ORACLE_SF))
    return out
