"""Crawl politeness scheduling bound over the pages corpus.

``crawl_schedule``: assign every host to one of ``CRAWL_WORKERS``
crawler workers by a deterministic string hash, and report per worker
the classic two-sided makespan LOWER BOUND for politeness-constrained
fetching: a worker that owns hosts with page counts ``n_h`` and must
space same-host fetches ``CRAWL_DELAY`` time units apart (fetch itself
1 unit) cannot finish before
``max( sum_h n_h , max_h ((n_h - 1) * CRAWL_DELAY + 1) )`` — work
volume vs the longest serial host chain. This is the capacity report a
crawl operator reads before sizing a fetch fleet (the reference's
fetch loop is single-host serial: /root/reference/app.py session
usage; this is its fleet-level generalization).

Host hash: the order-sensitive char mix
``sum_i ascii(c_i) * ((i * 2654435761) % 2^32) mod 2^32`` — numpy
int64 == DuckDB BIGINT exactly (terms < 2^46, no wraparound needed),
verified bit-for-bit in tests.

Plan / 100 TB notes: map-side (host, n) combiner, ONE host-cardinality
exchange, a vocabulary-sized hash/assign pass (per DISTINCT host, not
per page), a |workers|-cardinality final aggregate. Unparseable pages
(empty host) are excluded on both sides — a scheduler only schedules
resolvable hosts; their count is covered by extract_error_rates.

Oracle: dump twin — independent SQL over the certified sequential
pages dump (extracted_seq.parquet): DuckDB re-derives host counts, the
char-level hash (unnest + generate_subscripts idiom), the worker
assignment and the greatest()-bound from scratch.

Reference analogue: /root/reference/app.py:44 (one requests.Session,
serial per-document fetch); brief scope (S2/D1 fleet-level planning).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QC = "khl_pdf_ocr_ray.pipelines.queries_crawl"

CRAWL_WORKERS = 8
CRAWL_DELAY = 5  # politeness gap between same-host fetches (time units)
_MULT = 2654435761  # Knuth multiplicative constant (repo-wide)
_SPACE = 1 << 32


def host_hash(s: str) -> int:
    """Order-sensitive char mix; == the DuckDB unnest/subscripts twin."""
    h = 0
    for i, ch in enumerate(s, start=1):
        h = (h + ord(ch) * ((i * _MULT) % _SPACE)) % _SPACE
    return h


def crawl_host_partial(batch: pa.Table) -> pa.Table:
    """extracted batch -> (host, n) page-count partials, empty hosts out."""
    t = batch.select(["host"])
    g = t.group_by("host").aggregate([([], "count_all")])
    g = select_rename(g, host="host", n="count_all")
    hosts = g["host"].to_pylist()
    keep = pa.array([bool(h) for h in hosts])
    g = g.set_column(1, "n", g["n"].cast(pa.int64()))
    return g.filter(keep)


def crawl_assign(batch: pa.Table) -> pa.Table:
    """summed (host, n) rows -> per-worker partials (host-cardinality
    input; the hash loop runs per DISTINCT host)."""
    hosts = batch["host"].to_pylist()
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = np.array([host_hash(h) % CRAWL_WORKERS for h in hosts], np.int64)
    serial = (n - 1) * CRAWL_DELAY + 1
    t = pa.table(
        {
            "crawler": pa.array(w, pa.int64()),
            "n_hosts": pa.array(np.ones(len(n), np.int64), pa.int64()),
            "n_pages": pa.array(n, pa.int64()),
            "serial": pa.array(serial, pa.int64()),
        }
    )
    g = t.group_by("crawler").aggregate(
        [("n_hosts", "sum"), ("n_pages", "sum"), ("serial", "max")]
    )
    return select_rename(
        g,
        crawler="crawler",
        n_hosts="n_hosts_sum",
        n_pages="n_pages_sum",
        serial="serial_max",
    )


def crawl_finalize(batch: pa.Table) -> pa.Table:
    pages = batch["n_pages"].to_numpy(zero_copy_only=False).astype(np.int64)
    serial = batch["max_serial"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "crawler": batch["crawler"].cast(pa.int64()),
            "n_hosts": batch["n_hosts"].cast(pa.int64()),
            "n_pages": pa.array(pages, pa.int64()),
            "makespan_lb": pa.array(np.maximum(pages, serial), pa.int64()),
        }
    )


def q_crawl_schedule(sf_dir: str) -> "object":
    """(crawler, n_hosts, n_pages, makespan_lb)."""
    from ray.data.aggregate import Max, Sum

    from .queries_extract import _extracted

    return (
        _extracted(sf_dir)
        .map_batches(
            remote_fn(_QC, "crawl_host_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("host")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            remote_fn(_QC, "crawl_assign"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("crawler")
        .aggregate(
            Sum("n_hosts", alias_name="n_hosts"),
            Sum("n_pages", alias_name="n_pages"),
            Max("serial", alias_name="max_serial"),
        )
        .map_batches(
            remote_fn(_QC, "crawl_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def crawl_schedule_dump_sql(dump_path: str) -> str:
    """Independent DuckDB derivation over the sequential pages dump."""
    return f"""
WITH h0 AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n
  FROM read_parquet('{dump_path}')
  WHERE host IS NOT NULL AND host <> ''
  GROUP BY host),
hx AS (
  SELECT host, n,
         CAST(sum(ascii(c) * ((i * {_MULT}) % {_SPACE})) % {_SPACE}
              AS BIGINT) AS hs
  FROM (SELECT host, n,
               unnest(string_split(host, '')) AS c,
               generate_subscripts(string_split(host, ''), 1) AS i
        FROM h0)
  GROUP BY host, n),
a AS (
  SELECT hs % {CRAWL_WORKERS} AS crawler, n,
         (n - 1) * {CRAWL_DELAY} + 1 AS serial
  FROM hx)
SELECT crawler,
       CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(n) AS BIGINT) AS n_pages,
       CAST(greatest(sum(n), max(serial)) AS BIGINT) AS makespan_lb
FROM a GROUP BY crawler
"""


CRAWL_QUERIES = {"crawl_schedule": q_crawl_schedule}
