"""Incremental materialized-view maintenance with retractions
(counting algebra).

``mv_incremental_stats`` maintains a per-lang corpus view
(n_docs, total_chars, n_sources) under a planted insert/delete delta
WITHOUT recomputing the base:

- logical corpus: base = docs with doc_id % 17 != 0; the delta then
  INSERTS every doc_id % 17 == 0 and DELETES base docs with
  doc_id % 23 == 0 (so the final membership is
  (17 | id) OR (23 ∤ id) — what the full-recompute oracle queries).
- maintained state: the (lang, source, cnt, chars) support table — the
  classic counting-algebra trick that makes COUNT(DISTINCT source)
  maintainable under deletes: a source leaves the view exactly when
  its support count reaches zero (view maintenance with multiset
  semantics; Gupta-Mumick's counting algorithm).
- the BASE state is built distributed ONCE and persisted as parquet
  (content+code keyed, atomically published — the stage-checkpoint
  convention); every call after that processes ONLY delta rows: one
  filtered scan emitting signed (lang, source, ±cnt, ±chars) partials,
  ONE (lang, source)-keyed Sum merge against the base parquet read,
  a cnt > 0 support filter, and a |langs|-row finalize.

100 TB notes: deltas at web scale arrive as separate crawl snapshots;
here both base and delta derive from the one driver table by doc_id
predicate (column-pruned reads). Every exchange is bounded by
|langs| x |sources| support cells, never corpus rows; the base build is
the only corpus-sized pass and is amortized across calls.

Oracle: static SQL full recompute over the final membership predicate —
certifying that incremental merge == recompute, the MV-maintenance
correctness statement.

Reference analogue: none in /root/reference/app.py; brief scope
(lineage/checkpoint + aggregation families).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QMV = "khl_pdf_ocr_ray.pipelines.queries_mv"

MV_INS_MOD = 17
MV_DEL_MOD = 23


def mv_base_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> base-membership (lang, source, cnt, chars)
    support partials (doc_id % 17 != 0)."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = batch.filter(pa.array(d % MV_INS_MOD != 0))
    g = (
        pa.table(
            {
                "lang": t["lang"],
                "source": t["source"],
                "chars": t["n_chars"],
            }
        )
        .group_by(["lang", "source"])
        .aggregate([("chars", "count"), ("chars", "sum")])
    )
    return select_rename(
        g, lang="lang", source="source", cnt="chars_count", chars="chars_sum"
    )


def mv_delta_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> SIGNED delta support partials: inserts
    (17 | id) count +1, deletes (17 ∤ id and 23 | id) count -1."""
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ins = d % MV_INS_MOD == 0
    dele = (~ins) & (d % MV_DEL_MOD == 0)
    sign = np.where(ins, 1, np.where(dele, -1, 0))
    t = batch.filter(pa.array(sign != 0))
    s = sign[sign != 0]
    chars = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    g = (
        pa.table(
            {
                "lang": t["lang"],
                "source": t["source"],
                "cnt": pa.array(s, pa.int64()),
                "chars": pa.array(s * chars, pa.int64()),
            }
        )
        .group_by(["lang", "source"])
        .aggregate([("cnt", "sum"), ("chars", "sum")])
    )
    return select_rename(
        g, lang="lang", source="source", cnt="cnt_sum", chars="chars_sum"
    )


def mv_support_filter(batch: pa.Table) -> pa.Table:
    """Merged support rows -> keep cells with positive support (a
    source whose count reached zero leaves the view)."""
    return batch.filter(pc.greater(batch["cnt"], 0))


def mv_base_dir(sf_dir: str) -> str:
    from ..state.atomic import content_keyed_dir

    return content_keyed_dir(
        os.path.abspath(__file__),
        os.path.join(sf_dir, "documents.parquet"),
        "mv_base",
    )


def ensure_mv_base(sf_dir: str) -> str:
    """Build (distributed, once) and persist the base support table."""
    from ..state.atomic import ensure_published
    from .queries import _t

    out_dir = mv_base_dir(sf_dir)

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        (
            _t(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
            .map_batches(
                remote_fn(_QMV, "mv_base_partial"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby(["lang", "source"])
            .aggregate(
                Sum("cnt", alias_name="cnt"), Sum("chars", alias_name="chars")
            )
            .write_parquet(os.path.join(tmp, "base_support"))
        )

    ensure_published(out_dir, build)
    return out_dir


def mv_view_from(base: rd.Dataset, delta: rd.Dataset) -> rd.Dataset:
    """THE maintenance merge: base support ∪ signed delta partials ->
    (lang, source)-keyed Sum -> positive-support filter -> per-lang
    finalize. Exposed separately so tests can feed synthetic states
    (retraction-to-zero path)."""
    return (
        base.union(delta)
        .groupby(["lang", "source"])
        .aggregate(
            Sum("cnt", alias_name="cnt"), Sum("chars", alias_name="chars")
        )
        .map_batches(
            remote_fn(_QMV, "mv_support_filter"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(
            Sum("cnt", alias_name="n_docs"),
            Sum("chars", alias_name="total_chars"),
            Count(alias_name="n_sources"),
        )
    )


def q_mv_incremental_stats(sf_dir: str) -> rd.Dataset:
    """(lang, n_docs, total_chars, n_sources) of the post-delta corpus,
    computed by MERGING the persisted base aggregate with the signed
    delta partials — never recomputing the base."""
    from ..io import read_parquet_clean
    from .queries import _t

    base_dir = ensure_mv_base(sf_dir)
    base = read_parquet_clean(
        os.path.join(base_dir, "base_support"),
        columns=["lang", "source", "cnt", "chars"],
    )
    delta = _t(
        sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]
    ).map_batches(
        remote_fn(_QMV, "mv_delta_partial"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return mv_view_from(base, delta)


SQL_MV_INCREMENTAL_STATS = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
WHERE doc_id % {MV_INS_MOD} = 0 OR doc_id % {MV_DEL_MOD} != 0
GROUP BY lang
"""


MV_QUERIES = {"mv_incremental_stats": q_mv_incremental_stats}
MV_ORACLES = {"mv_incremental_stats": SQL_MV_INCREMENTAL_STATS}
