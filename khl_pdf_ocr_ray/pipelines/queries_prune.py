"""Scan-pruning evaluation over the multi-file pages corpus.

``scan_prune_eval``: for a deterministic time-range predicate (the
middle third of the corpus's warc_ts span), report per parquet FILE
whether its footer min/max statistics alone would let a planner SKIP
the file (prunable = stats range disjoint from the predicate), next to
the ground truth (rows actually selected inside). This quantifies the
prune-at-the-read story: at 100 TB the fraction of files a predicate
skips from footers — without touching a data page — is the difference
between a metadata operation and a full scan. A file with
``prunable = false`` and ``n_sel = 0`` measures stats slack (row-group
clustering the writer left on the table).

Plan / 100 TB notes: the bounds pass is one Min/Max aggregate over the
pruned ts column; the stats pass maps over the FILE LIST reading only
footers (queries_meta pattern — KB per file, embarrassingly parallel);
the ground-truth pass scans (path, ts) and collapses to per-file counts
map-side. At deployment only the first two run — the truth pass exists
because this is an EVAL of the pruning decision, not the decision.

Oracle: static SQL over the same files — per-file min/max/count from
the data itself (pyarrow writes exact timestamp stats, so footer
min/max == data min/max; fixed-width type, no string truncation),
filename stripped to its basename on both sides.

Reference analogue: none in /root/reference/app.py; brief scope
(prune-at-the-read engineering).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..remote import remote_fn

_QP = "khl_pdf_ocr_ray.pipelines.queries_prune"


def file_stats_batch(batch: pa.Table) -> pa.Table:
    """(path) rows -> per-file footer stats (min/max warc_ts, n_rows)."""
    import pyarrow.parquet as pq

    files, los, his, rows = [], [], [], []
    for path in batch["path"].to_pylist():
        md = pq.ParquetFile(path).metadata
        idx = md.schema.names.index("warc_ts")
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max, "ts stats required"
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        files.append(os.path.basename(path))
        # exact epoch-us ints (datetime -> us; timestamps are tz-naive)
        los.append(int(np.datetime64(lo, "us").astype(np.int64)))
        his.append(int(np.datetime64(hi, "us").astype(np.int64)))
        rows.append(md.num_rows)
    return pa.table(
        {
            "file": pa.array(files, pa.string()),
            "ts_min": pa.array(los, pa.int64()),
            "ts_max": pa.array(his, pa.int64()),
            "n_rows": pa.array(rows, pa.int64()),
        }
    )


def select_count_partial(batch: pa.Table, t_lo: int, t_hi: int) -> pa.Table:
    """(path, warc_ts) rows -> per-file selected-row count partials."""
    import pyarrow.compute as pc

    us = pc.cast(batch["warc_ts"], pa.int64())
    sel = pc.and_(pc.greater_equal(us, t_lo), pc.less(us, t_hi))
    t = pa.table(
        {
            "file": pc.replace_substring_regex(batch["path"], r".*/", ""),
            "n_sel": pc.cast(sel, pa.int64()),
        }
    )
    g = t.group_by(["file"]).aggregate([("n_sel", "sum")])
    from ..functions.arrowkit import select_rename

    return select_rename(g, file="file", n_sel="n_sel_sum")


def prune_finalize(batch: pa.Table, t_lo: int, t_hi: int) -> pa.Table:
    """Joined stats+truth rows -> the eval row per file."""
    import pyarrow.compute as pc

    lo = batch["ts_min"].to_numpy(zero_copy_only=False)
    hi = batch["ts_max"].to_numpy(zero_copy_only=False)
    prunable = (hi < t_lo) | (lo >= t_hi)
    n_sel = batch["n_sel"].to_numpy(zero_copy_only=False)
    assert not (prunable & (n_sel > 0)).any(), "pruning would drop rows"
    return pa.table(
        {
            "file": batch["file"],
            "n_rows": batch["n_rows"],
            "n_sel": pc.cast(batch["n_sel"], pa.int64()),
            "prunable": pa.array(prunable),
        }
    )


def _bounds(pages_dir: str) -> tuple:
    """Corpus ts span -> the middle-third predicate (exact int us)."""
    lo = hi = None
    for frag_path in sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    ):
        import pyarrow.parquet as pq

        md = pq.ParquetFile(frag_path).metadata
        idx = md.schema.names.index("warc_ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            # same loud contract as file_stats_batch: a stats-less column
            # would give np.datetime64(None) -> NaT -> int64 min and
            # silently corrupt the predicate bounds
            assert st is not None and st.has_min_max, "ts stats required"
            l = int(np.datetime64(st.min, "us").astype(np.int64))
            h = int(np.datetime64(st.max, "us").astype(np.int64))
            lo = l if lo is None else min(lo, l)
            hi = h if hi is None else max(hi, h)
    span = hi - lo
    return lo + span // 3, lo + 2 * (span // 3)


def q_scan_prune_eval(sf_dir: str) -> "object":
    """(file, n_rows, n_sel, prunable) per parquet file."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..joins import partitions_for_rows
    from .extract_pipeline import synthesize_pages
    from .queries_extract import _REPEAT

    pages_dir = synthesize_pages(sf_dir, repeat=_REPEAT)
    t_lo, t_hi = _bounds(pages_dir)
    paths = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )
    stats = rd.from_arrow(
        pa.table({"path": pa.array(paths, pa.string())})
    ).map_batches(
        remote_fn(_QP, "file_stats_batch"), batch_format="pyarrow", batch_size=4
    )
    truth = (
        rd.read_parquet(pages_dir, columns=["warc_ts"], include_paths=True)
        .map_batches(
            remote_fn(_QP, "select_count_partial", t_lo=t_lo, t_hi=t_hi),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("file")
        .aggregate(Sum("n_sel", alias_name="n_sel"))
    )
    joined = stats.join(
        truth,
        join_type="inner",  # every file has exactly one truth row
        num_partitions=partitions_for_rows(len(paths)),
        on=("file",),
        right_on=("file",),
    )
    return joined.map_batches(
        remote_fn(_QP, "prune_finalize", t_lo=t_lo, t_hi=t_hi),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def prune_oracle_sql(pages_dir: str) -> str:
    glob = os.path.join(pages_dir, "*.parquet")
    return f"""
WITH bounds AS (
  SELECT min(epoch_us(warc_ts)) AS lo, max(epoch_us(warc_ts)) AS hi
  FROM read_parquet('{glob}')),
pred AS (
  SELECT lo + (hi - lo) // 3 AS t_lo,
         lo + 2 * ((hi - lo) // 3) AS t_hi
  FROM bounds),
perfile AS (
  SELECT regexp_replace(filename, '.*/', '') AS file,
         min(epoch_us(warc_ts)) AS ts_min,
         max(epoch_us(warc_ts)) AS ts_max,
         count(*) AS n_rows,
         sum(CASE WHEN epoch_us(warc_ts) >= (SELECT t_lo FROM pred)
                   AND epoch_us(warc_ts) <  (SELECT t_hi FROM pred)
                  THEN 1 ELSE 0 END) AS n_sel
  FROM read_parquet('{glob}', filename = true)
  GROUP BY 1)
SELECT file, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_sel AS BIGINT) AS n_sel,
       (ts_max < (SELECT t_lo FROM pred)
        OR ts_min >= (SELECT t_hi FROM pred)) AS prunable
FROM perfile
"""


def prune_oracle_sqls(sf_dir: str) -> dict:
    """sf-parameterized oracle (the pages corpus is generated/cached)."""
    from .extract_pipeline import synthesize_pages
    from .queries_extract import _REPEAT

    return {"scan_prune_eval": prune_oracle_sql(synthesize_pages(sf_dir, repeat=_REPEAT))}


PRUNE_QUERIES = {"scan_prune_eval": q_scan_prune_eval}
