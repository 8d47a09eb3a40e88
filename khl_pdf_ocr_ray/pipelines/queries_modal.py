"""Exact grouped mode with a deterministic tie-break.

``user_modal_event``: each user's most frequent event type; ties
resolve to the lexicographically SMALLEST type (SQL ``mode()`` leaves
tie order unspecified — this operator pins it). The per-group argmax
rides ONE ``Max`` over a packed int64 ``count * 2^24 + (2^24 - 1 -
type_rank)`` where ``type_rank`` is the type's index in the sorted
distinct-type list: max count wins, then the smallest rank (= smallest
string). No per-group sort, no join-back.

Plan / 100 TB notes: events collapse map-side to (user, type) count
cells; the cell rollup (|users| x |types|, both bounded well below the
event count) is materialized ONCE and reused twice — a tiny
type-cardinality aggregate derives the sorted type list for the pack
(driver holds |types| strings), then the packed per-user Max runs over
the same cells. Pack bounds asserted loudly (count < 2^39,
|types| < 2^24).

Reference analogue: /root/reference/app.py has no grouped-mode
surface; brief scope (SURVEY.md §2 aggregate coverage at depth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QM = "khl_pdf_ocr_ray.pipelines.queries_modal"

RANK_PACK = 1 << 24  # type-rank packing radix


def user_type_cells(batch: pa.Table) -> pa.Table:
    """events batch -> (user_id, event_type, n) count cells."""
    t = batch.select(["user_id", "event_type"])
    g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
    g = select_rename(g, user_id="user_id", event_type="event_type", n="count_all")
    return pa.table(
        {
            "user_id": g["user_id"].cast(pa.int64()),
            "event_type": g["event_type"],
            "n": g["n"].cast(pa.int64()),
        }
    )


def modal_pack(batch: pa.Table, types_ref) -> pa.Table:
    """(user, type, n) cells -> (user_id, packed) for the argmax Max."""
    import ray as _ray

    rank = _ray.get(types_ref)
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (n < (1 << 39)).all(), "per-(user,type) count >= 2^39 — widen pack"
    codes = np.array(
        [rank[t] for t in batch["event_type"].to_pylist()], dtype=np.int64
    )
    return pa.table(
        {
            "user_id": batch["user_id"],
            "packed": pa.array(n * RANK_PACK + (RANK_PACK - 1 - codes), pa.int64()),
        }
    )


def modal_decode(batch: pa.Table, names_ref) -> pa.Table:
    import ray as _ray

    names = _ray.get(names_ref)
    packed = batch["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
    codes = (RANK_PACK - 1) - (packed % RANK_PACK)
    return pa.table(
        {
            "user_id": batch["user_id"].cast(pa.int64()),
            "modal_type": pa.array([names[int(c)] for c in codes], pa.string()),
            "n_events": pa.array(packed // RANK_PACK, pa.int64()),
        }
    )


def q_user_modal_event(sf_dir: str) -> "object":
    """(user_id, modal_type, n_events)."""
    import ray
    from ray.data.aggregate import Max, Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(
            remote_fn(_QM, "user_type_cells"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # |users| x |types| rollup; reused: type list + argmax
    )
    types = sorted(
        r["event_type"]
        for r in cells.groupby("event_type").count().take_all()
    )
    assert len(types) < RANK_PACK, "type cardinality >= 2^24 — widen pack"
    types_ref = ray.put({t: i for i, t in enumerate(types)})
    names_ref = ray.put(types)
    return (
        cells.map_batches(
            remote_fn(_QM, "modal_pack", types_ref=types_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(Max("packed", alias_name="packed"))
        .map_batches(
            remote_fn(_QM, "modal_decode", names_ref=names_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_USER_MODAL_EVENT = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
m AS (SELECT user_id, max(n) AS mx FROM c GROUP BY 1)
SELECT c.user_id, min(c.event_type) AS modal_type,
       CAST(max(c.n) AS BIGINT) AS n_events
FROM c JOIN m ON m.user_id = c.user_id
WHERE c.n = m.mx
GROUP BY c.user_id
"""

MODAL_QUERIES = {"user_modal_event": q_user_modal_event}
MODAL_ORACLES = {"user_modal_event": SQL_USER_MODAL_EVENT}
