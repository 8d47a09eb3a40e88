"""Distributed interval-overlap join (grid-cell bucketing).

``interval_overlap_join``: join two interval tables on OVERLAP — here
per-(user, day) activity spans [min ts, max ts] against per-(event_type,
day) activity windows, emitting one row per overlapping (span, window)
pair with its exact overlap in microseconds. This is the general
two-big-sides interval join Ray Data lacks natively (events_range_join
covers the point-in-interval case; this one is interval x interval).

Plan / 100 TB notes — the classic grid recipe:
  1. both sides reduce to slim span tables via per-batch (key, min, max)
     combiners + one Min/Max groupby each (rows ~ active user-days /
     type-days, never events);
  2. each span fans out to the 6-hour GRID CELLS it covers (vectorized
     repeat; span length bounds the fan-out — a day-contained span covers
     <= 5 cells);
  3. an equi-join on cell meets every overlapping pair at least once;
  4. the OWNER-CELL filter (cell == floor(max(a_start, b_start) / CELL))
     keeps exactly ONE copy per pair — no distinct/dedup exchange. The
     owner cell lies inside both intervals' cell ranges whenever they
     overlap, so no pair is lost.
Cell width trades fan-out (small cells -> more copies) against join-key
cardinality (big cells -> fewer, hotter keys); at deployment pick CELL
~= the median interval span, and salt a pathological cell (one global
interval covering everything belongs on the broadcast path instead —
events_range_join's pattern). The join's num_partitions is passed
explicitly because cell is a LOW-cardinality key (joins.py:40 contract).

Oracle: static SQL — the same span CTEs joined on the overlap predicate
``a_start <= b_end AND b_start <= a_end`` directly (DuckDB does the
quadratic-within-day work; the engine never does).

Reference analogue: /root/reference/app.py has no temporal surface;
brief scope (§2.9 streaming-shaped + temporal ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..remote import remote_fn

_QI = "khl_pdf_ocr_ray.pipelines.queries_interval"

CELL_US = 6 * 3600 * 1_000_000  # 6-hour grid
DAY_US = 86_400 * 1_000_000


def _span_partial(batch: pa.Table, key: str) -> pa.Table:
    """Per-batch (key, day, min ts, max ts) combiner (events never shuffle)."""
    import pyarrow.compute as pc

    us = pc.cast(batch["ts"], pa.int64())
    t = pa.table(
        {
            key: batch[key],
            "day": pc.divide(us, DAY_US),  # positive epoch: trunc == floor
            "lo": us,
            "hi": us,
        }
    )
    g = t.group_by([key, "day"]).aggregate([("lo", "min"), ("hi", "max")])
    from ..functions.arrowkit import select_rename

    return select_rename(g, **{key: key, "day": "day", "lo": "lo_min", "hi": "hi_max"})


def span_table(events, key: str, lo_name: str, hi_name: str):
    """events -> (key, <lo>, <hi>) day-bounded span table (slim)."""
    from ray.data.aggregate import Max, Min

    spans = (
        events.map_batches(
            remote_fn(_QI, "_span_partial", key=key),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby([key, "day"])
        .aggregate(Min("lo", alias_name=lo_name), Max("hi", alias_name=hi_name))
    )
    return spans.drop_columns(["day"])


def expand_cells_batch(batch: pa.Table, lo: str, hi: str) -> pa.Table:
    """Span rows -> one row per covered grid cell (vectorized repeat)."""
    los = batch[lo].to_numpy(zero_copy_only=False).astype(np.int64)
    his = batch[hi].to_numpy(zero_copy_only=False).astype(np.int64)
    c0 = los // CELL_US
    c1 = his // CELL_US
    counts = (c1 - c0 + 1).astype(np.int64)
    total = int(counts.sum())
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    offsets = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    cell = np.repeat(c0, counts) + (np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts))
    out = {name: batch[name].take(pa.array(idx)) for name in batch.column_names}
    out["cell"] = pa.array(cell, pa.int64())
    return pa.table(out)


def overlap_filter_batch(batch: pa.Table) -> pa.Table:
    """Joined cell rows -> exact-overlap pairs owned by THIS cell."""
    import pyarrow.compute as pc

    a0 = batch["a_start"].to_numpy(zero_copy_only=False)
    a1 = batch["a_end"].to_numpy(zero_copy_only=False)
    b0 = batch["b_start"].to_numpy(zero_copy_only=False)
    b1 = batch["b_end"].to_numpy(zero_copy_only=False)
    cell = batch["cell"].to_numpy(zero_copy_only=False)
    starts = np.maximum(a0, b0)
    keep = (a0 <= b1) & (b0 <= a1) & (starts // CELL_US == cell)
    kept = batch.filter(pa.array(keep))
    overlap = np.minimum(a1[keep], b1[keep]) - starts[keep]
    return pa.table(
        {
            "user_id": kept["user_id"],
            "event_type": kept["event_type"],
            "a_start": kept["a_start"],
            "b_start": kept["b_start"],
            "overlap_us": pa.array(overlap, pa.int64()),
        }
    )


def q_interval_overlap_join(sf_dir: str) -> "object":
    """(user_id, event_type, a_start, b_start, overlap_us)."""
    import os

    from ..io import input_nbytes
    from ..joins import join_partitions
    from .queries import _t

    nbytes = input_nbytes(os.path.join(sf_dir, "events.parquet"))
    a = span_table(
        _t(sf_dir, "events", ["user_id", "ts"]), "user_id", "a_start", "a_end"
    ).map_batches(
        remote_fn(_QI, "expand_cells_batch", lo="a_start", hi="a_end"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    b = span_table(
        _t(sf_dir, "events", ["event_type", "ts"]), "event_type", "b_start", "b_end"
    ).map_batches(
        remote_fn(_QI, "expand_cells_batch", lo="b_start", hi="b_end"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # span tables are FK-backed aggregates of a non-empty base table
    # (structurally non-empty); cell is low-cardinality -> explicit sizing
    # from the dominant input's bytes (no materialize barrier)
    joined = a.join(
        b,
        join_type="inner",
        num_partitions=join_partitions(nbytes, lo=4),
        on=("cell",),
        right_on=("cell",),
    )
    return joined.map_batches(
        remote_fn(_QI, "overlap_filter_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_INTERVAL_OVERLAP = f"""
WITH a AS (
  SELECT user_id,
         CAST(min(epoch_us(ts)) AS BIGINT) AS a_start,
         CAST(max(epoch_us(ts)) AS BIGINT) AS a_end
  FROM events GROUP BY user_id, epoch_us(ts) // {DAY_US}),
b AS (
  SELECT event_type,
         CAST(min(epoch_us(ts)) AS BIGINT) AS b_start,
         CAST(max(epoch_us(ts)) AS BIGINT) AS b_end
  FROM events GROUP BY event_type, epoch_us(ts) // {DAY_US})
SELECT a.user_id, b.event_type, a.a_start, b.b_start,
       CAST(least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start)
            AS BIGINT) AS overlap_us
FROM a JOIN b ON a.a_start <= b.b_end AND b.b_start <= a.a_end
"""

INTERVAL_QUERIES = {"interval_overlap_join": q_interval_overlap_join}
INTERVAL_ORACLES = {"interval_overlap_join": SQL_INTERVAL_OVERLAP}
