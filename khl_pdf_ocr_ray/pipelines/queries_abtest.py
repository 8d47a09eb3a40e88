"""A/B conversion chi-square over the events stream.

The experimentation primitive every event warehouse runs: split users
into two cohorts (deterministic assignment — here ``user_id % 2``, the
hash-bucket convention), define conversion = the user emitted at least
one ``purchase`` event, and test independence with the 2x2 chi-square
statistic in exact integer milli-units (the same closed form as
term_chi2, N = users):

    chi2_milli = (1000 * N * (n11*n00 - n10*n01)^2)
                 // ((n11+n01) * (n10+n00) * (n11+n10) * (n01+n00))

Output ONE row: (n_users, n_a, n_b, conv_a, conv_b, chi2_milli).

Plan / 100 TB notes: the corpus reduces map-side twice — a per-batch
(user, converted-partial) Max combiner (<= 1 row per user per block,
the events payload never shuffles), ONE user-keyed Max exchange, then
a per-batch 4-cell contingency combiner; the driver folds 4-cell rows
in exact Python ints (products exceed int64 at 10^9 users; the oracle
uses HUGEINT for the same reason).

Reference analogue: /root/reference/app.py has no experimentation
surface; brief scope (streaming-shaped operators over events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QA = "khl_pdf_ocr_ray.pipelines.queries_abtest"

AB_CONVERT_TYPE = "purchase"


def ab_user_partial(batch: pa.Table) -> pa.Table:
    """events batch -> (user_id, conv) partials (conv = batch-local max
    of the purchase indicator; Max-mergeable)."""
    conv = pc.equal(batch["event_type"], AB_CONVERT_TYPE)
    t = pa.table(
        {
            "user_id": batch["user_id"].cast(pa.int64()),
            "conv": conv.cast(pa.int64()),
        }
    )
    g = t.group_by("user_id").aggregate([("conv", "max")])
    return select_rename(g, user_id="user_id", conv="conv_max")


def ab_cell_partial(batch: pa.Table) -> pa.Table:
    """(user_id, conv) rows -> (cohort, conv, n) contingency partials."""
    user = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    conv = batch["conv"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table(
        {
            "cohort": pa.array(user % 2, pa.int64()),
            "conv": pa.array(conv, pa.int64()),
        }
    )
    g = t.group_by(["cohort", "conv"]).aggregate([([], "count_all")])
    g = select_rename(g, cohort="cohort", conv="conv", n="count_all")
    return g.set_column(2, "n", g["n"].cast(pa.int64()))


def ab_finalize(cells: pd.DataFrame) -> pd.DataFrame:
    """Aggregated (cohort, conv, n) cells -> the one-row test table,
    exact Python ints."""
    c = {(int(r.cohort), int(r.conv)): int(r.n) for r in cells.itertuples()}
    n11 = c.get((0, 1), 0)  # cohort A converted
    n01 = c.get((0, 0), 0)  # cohort A not
    n10 = c.get((1, 1), 0)  # cohort B converted
    n00 = c.get((1, 0), 0)  # cohort B not
    n_a, n_b = n11 + n01, n10 + n00
    big_n = n_a + n_b
    denom = (n11 + n01) * (n10 + n00) * (n11 + n10) * (n01 + n00)
    if denom == 0:
        chi2 = 0
    else:
        num = n11 * n00 - n10 * n01
        chi2 = (1000 * big_n * num * num) // denom
    return pd.DataFrame(
        {
            "n_users": np.array([big_n], dtype=np.int64),
            "n_a": np.array([n_a], dtype=np.int64),
            "n_b": np.array([n_b], dtype=np.int64),
            "conv_a": np.array([n11], dtype=np.int64),
            "conv_b": np.array([n10], dtype=np.int64),
            "chi2_milli": np.array([chi2], dtype=np.int64),
        }
    )


def q_ab_test_chi2(sf_dir: str) -> pd.DataFrame:
    """One row: (n_users, n_a, n_b, conv_a, conv_b, chi2_milli)."""
    from ray.data.aggregate import Max

    from .queries import _t

    cells = (
        _t(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(
            remote_fn(_QA, "ab_user_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(Max("conv", alias_name="conv"))
        .map_batches(
            remote_fn(_QA, "ab_cell_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()  # <= 4 rows per block pre-reduced; tiny driver fold
    )
    agg = cells.groupby(["cohort", "conv"], as_index=False)["n"].sum()
    return ab_finalize(agg)


SQL_AB_TEST_CHI2 = f"""
WITH u AS (
  SELECT user_id % 2 AS cohort,
         CAST(max(CASE WHEN event_type = '{AB_CONVERT_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS conv
  FROM events GROUP BY user_id),
c AS (
  SELECT
    CAST(sum(CASE WHEN cohort = 0 AND conv = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n11,
    CAST(sum(CASE WHEN cohort = 0 AND conv = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n01,
    CAST(sum(CASE WHEN cohort = 1 AND conv = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n10,
    CAST(sum(CASE WHEN cohort = 1 AND conv = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n00
  FROM u)
SELECT CAST(n11 + n01 + n10 + n00 AS BIGINT) AS n_users,
       CAST(n11 + n01 AS BIGINT) AS n_a,
       CAST(n10 + n00 AS BIGINT) AS n_b,
       CAST(n11 AS BIGINT) AS conv_a,
       CAST(n10 AS BIGINT) AS conv_b,
       CAST(CASE WHEN (n11 + n01) * (n10 + n00) * (n11 + n10) * (n01 + n00) = 0
            THEN 0
            ELSE (1000 * (n11 + n01 + n10 + n00)
                  * (n11 * n00 - n10 * n01) * (n11 * n00 - n10 * n01))
                 // ((n11 + n01) * (n10 + n00) * (n11 + n10) * (n01 + n00))
            END AS BIGINT) AS chi2_milli
FROM c
"""

ABTEST_QUERIES = {"ab_test_chi2": q_ab_test_chi2}
ABTEST_ORACLES = {"ab_test_chi2": SQL_AB_TEST_CHI2}
