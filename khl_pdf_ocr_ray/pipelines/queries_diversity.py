"""Per-user behavioral diversity: Gini-Simpson index over event types.

The log-free diversity measure (Simpson 1949): with n_i = the user's
count of event type i and n = their total,

    simpson_milli = 1000 - (1000 * sum(n_i^2)) // n^2

(0 = monomaniac, -> 1000*(1 - 1/k) for a uniform k-type user). Pure
integer arithmetic — entropy needs logs, Simpson doesn't, so both
engines hash identically. n^2 and 1000*sum(n_i^2) exceed int64 for
power users (~10^9 events -> 10^21), so the per-user fold runs in
exact Python ints / HUGEINT.

Plan / 100 TB notes: the corpus reduces map-side by a combiner-backed
(user, type) Count (<= |types| rows per user per block — the events
payload never shuffles); the fold is groupby(user).map_groups over
groups of <= |types| rows. ONE row out per user.

Reference analogue: /root/reference/app.py has no behavioral surface;
brief scope (streaming-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QD = "khl_pdf_ocr_ray.pipelines.queries_diversity"


def user_type_partial(batch: pa.Table) -> pa.Table:
    """events batch -> (user_id, event_type, n) partial counts."""
    g = (
        batch.select(["user_id", "event_type"])
        .group_by(["user_id", "event_type"])
        .aggregate([([], "count_all")])
    )
    g = select_rename(
        g, user_id="user_id", event_type="event_type", n="count_all"
    )
    return g.set_column(2, "n", g["n"].cast(pa.int64()))


def simpson_per_user(g: pd.DataFrame) -> pd.DataFrame:
    """One user's (type, n) rows (<= |types|) -> Simpson index, exact
    Python ints."""
    counts = [int(x) for x in g["n"].to_numpy()]
    n = sum(counts)
    s2 = sum(c * c for c in counts)
    simpson = 1000 - (1000 * s2) // (n * n) if n else 0
    return pd.DataFrame(
        {
            "user_id": np.array([int(g["user_id"].iloc[0])], dtype=np.int64),
            "n_events": np.array([n], dtype=np.int64),
            "n_types": np.array([len(counts)], dtype=np.int64),
            "simpson_milli": np.array([simpson], dtype=np.int64),
        }
    )


def q_user_type_simpson(sf_dir: str) -> rd.Dataset:
    """(user_id, n_events, n_types, simpson_milli). See module
    docstring."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(
            remote_fn(_QD, "user_type_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("user_id")
        .map_groups(
            remote_fn(_QD, "simpson_per_user"), batch_format="pandas"
        )
    )


SQL_USER_TYPE_SIMPSON = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT user_id,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(1000 - (1000 * sum(CAST(n AS HUGEINT) * n))
                   // (CAST(sum(n) AS HUGEINT) * sum(n)) AS BIGINT)
         AS simpson_milli
FROM c GROUP BY user_id
"""

DIVERSITY_QUERIES = {"user_type_simpson": q_user_type_simpson}
DIVERSITY_ORACLES = {"user_type_simpson": SQL_USER_TYPE_SIMPSON}
