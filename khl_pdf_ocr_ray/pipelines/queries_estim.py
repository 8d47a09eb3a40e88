"""AMS F2 (self-join size) sketch and an l-diversity audit.

- ``ams_f2_events`` — the Alon-Matias-Szegedy tug-of-war sketch for the
  second frequency moment F2 = sum over users of count^2 (== the
  self-join size of events on user_id, the quantity a join planner
  estimates before picking a strategy — join_explosion_profile's exact
  companion). AMS_R = 16 sign estimators in AMS_G = 4 groups:
  Z_r = sum over users of sign_r(u) * c_u; est = median over groups of
  sum of Z_r^2 within the group. EVERYTHING stays integer: the group
  sum carries the x4 scale, the even-count median is the sum of the two
  middle group values (x8 total), and the reported error is
  err_ppm = |est_x8 - 8*F2| * 1e6 // (8*F2). The sign hash is plain
  integer arithmetic, sign_r(u) = +1 iff (((u + r + 1) * 2654435761)
  % 2^32 // 8) % 2 == 0, so the oracle recomputes the sketch itself in
  SQL — the estimate is gate-checked, not just the exact value.
  Plan: per-batch per-user counts -> AMS_R-row signed partials per
  block -> one 16-row Sum exchange; the exact F2 runs its own
  user-keyed count exchange then a squared-sum combiner.
- ``l_diversity_audit`` — the governance companion of
  k_anonymity_audit: with quasi-identifier (event_type, day), the
  DIVERSITY of a cell is its distinct sensitive values (user_id), and
  cells below L_DIV are the re-identification risk. One row out:
  (n_cells, n_cells_below, min_l, rows_in_low_cells).
  Plan: per-batch distinct (type, day, user, cnt) combiner -> ONE
  (type, day, user)-keyed exchange (bounded by cell x user
  cardinality) -> per-cell Count+Sum -> driver fold over the
  cell-bounded table.

Oracles: static SQL (the AMS twin shares the integer sign hash by
construction, not by import).

Reference analogue: none in /root/reference/app.py; brief scope
(sketch family: hll/cms/mg/ddsketch/kmv + this)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QE = "khl_pdf_ocr_ray.pipelines.queries_estim"

AMS_R = 16
AMS_G = 4  # groups of AMS_R // AMS_G estimators
_MULT = 2654435761  # Knuth multiplicative constant (repo-wide)
L_DIV = 5
DAY_US = 86_400_000_000


def ams_signs(users: np.ndarray, r: int) -> np.ndarray:
    """THE shared sign hash: +1 / -1 per user for estimator r (plain
    integer arithmetic so the SQL twin recomputes it verbatim). The id
    mix is reduced mod 2^31 BEFORE the Knuth multiply (boot_uniform /
    score_calibration convention) — numpy would wrap silently past
    2^63 / MULT where DuckDB raises."""
    mix = ((users % (1 << 31)) + r + 1) % (1 << 31)
    h = (mix * _MULT) % (1 << 32)
    return np.where((h // 8) % 2 == 0, 1, -1).astype(np.int64)


def ams_partial(batch: pa.Table) -> pa.Table:
    """events batch -> AMS_R rows (r, z partial)."""
    u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uu, cc = np.unique(u, return_counts=True)
    rows_r = np.arange(AMS_R, dtype=np.int64)
    z = np.array(
        [int(np.sum(ams_signs(uu, int(r)) * cc)) for r in rows_r],
        dtype=np.int64,
    )
    return pa.table({"r": pa.array(rows_r), "z": pa.array(z)})


def f2_count_partial(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch (user_id, cnt) partials."""
    u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uu, cc = np.unique(u, return_counts=True)
    return pa.table(
        {
            "user_id": pa.array(uu, pa.int64()),
            "cnt": pa.array(cc.astype(np.int64), pa.int64()),
        }
    )


def f2_square_partial(batch: pa.Table) -> pa.Table:
    """Global (user, cnt) rows -> one squared-sum partial per batch."""
    c = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"f2": pa.array([int(np.sum(c * c))], pa.int64())})


def ams_finalize(zs: np.ndarray, exact_f2: int) -> pd.DataFrame:
    """THE shared finalize: 16 Z values + exact F2 -> one row."""
    z2 = zs.astype(object) ** 2
    groups = [int(sum(z2[g * 4 : (g + 1) * 4])) for g in range(AMS_G)]
    mid = sorted(groups)
    est_x8 = mid[1] + mid[2]
    err_ppm = abs(est_x8 - 8 * exact_f2) * 1_000_000 // (8 * exact_f2)
    return pd.DataFrame(
        [(exact_f2, est_x8, err_ppm)],
        columns=["exact_f2", "ams_est_x8", "err_ppm"],
    ).astype("int64")


def q_ams_f2_events(sf_dir: str) -> pd.DataFrame:
    """One row: (exact_f2, ams_est_x8, err_ppm)."""
    from .queries import _t

    zs = (
        _t(sf_dir, "events", ["user_id"])
        .map_batches(
            remote_fn(_QE, "ams_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("r")
        .aggregate(Sum("z", alias_name="z"))
        .to_pandas()
        .sort_values("r", ignore_index=True)
    )
    exact = int(
        _t(sf_dir, "events", ["user_id"])
        .map_batches(
            remote_fn(_QE, "f2_count_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            remote_fn(_QE, "f2_square_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sum("f2")
    )
    return ams_finalize(zs["z"].to_numpy().astype(np.int64), exact)


SQL_AMS_F2_EVENTS = f"""
WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
r AS (SELECT unnest(generate_series(0, {AMS_R - 1})) AS r),
z AS (
  SELECT r.r,
         sum(CASE WHEN (((((c.user_id % 2147483648) + r.r + 1)
                          % 2147483648) * {_MULT})
                        % 4294967296 // 8) % 2 = 0
             THEN CAST(c.c AS HUGEINT) ELSE -CAST(c.c AS HUGEINT) END) AS z
  FROM c CROSS JOIN r GROUP BY r.r),
g AS (SELECT r // 4 AS g, sum(z * z) AS m FROM z GROUP BY r // 4),
med AS (SELECT sum(m) AS est_x8
        FROM (SELECT m FROM g ORDER BY m LIMIT 2 OFFSET 1)),
ex AS (SELECT sum(CAST(c AS HUGEINT) * c) AS f2 FROM c)
SELECT CAST(ex.f2 AS BIGINT) AS exact_f2,
       CAST(med.est_x8 AS BIGINT) AS ams_est_x8,
       CAST(abs(med.est_x8 - 8 * ex.f2) * 1000000 // (8 * ex.f2)
            AS BIGINT) AS err_ppm
FROM ex, med
"""


# --- l_diversity_audit ------------------------------------------------------
def ldiv_cell_partial(batch: pa.Table) -> pa.Table:
    """events batch -> per-batch (event_type, day, user_id, cnt)."""
    import pyarrow.compute as pc

    from .queries import _floordiv_us

    day = _floordiv_us(pc.cast(batch["ts"], pa.int64()), DAY_US)
    g = (
        pa.table(
            {
                "event_type": batch["event_type"],
                "day": day,
                "user_id": batch["user_id"],
            }
        )
        .group_by(["event_type", "day", "user_id"])
        .aggregate([([], "count_all")])
    )
    return select_rename(
        g,
        event_type="event_type",
        day="day",
        user_id="user_id",
        cnt="count_all",
    )


def q_l_diversity_audit(sf_dir: str) -> pd.DataFrame:
    """One row: (n_cells, n_cells_below, min_l, rows_in_low_cells)."""
    from .queries import _t

    cells = (
        _t(sf_dir, "events", ["event_type", "ts", "user_id"])
        .map_batches(
            remote_fn(_QE, "ldiv_cell_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "day", "user_id"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="l"), Sum("cnt", alias_name="rows"))
        .to_pandas()
    )
    low = cells[cells["l"] < L_DIV]
    return pd.DataFrame(
        [
            (
                len(cells),
                len(low),
                int(cells["l"].min()),
                int(low["rows"].sum()),
            )
        ],
        columns=["n_cells", "n_cells_below", "min_l", "rows_in_low_cells"],
    ).astype("int64")


SQL_L_DIVERSITY_AUDIT = f"""
WITH cells AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
         count(DISTINCT user_id) AS l, count(*) AS rows_
  FROM events GROUP BY event_type, day)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(count(*) FILTER (WHERE l < {L_DIV}) AS BIGINT)
         AS n_cells_below,
       CAST(min(l) AS BIGINT) AS min_l,
       CAST(coalesce(sum(rows_) FILTER (WHERE l < {L_DIV}), 0) AS BIGINT)
         AS rows_in_low_cells
FROM cells
"""


ESTIM_QUERIES = {
    "ams_f2_events": q_ams_f2_events,
    "l_diversity_audit": q_l_diversity_audit,
}
ESTIM_ORACLES = {
    "ams_f2_events": SQL_AMS_F2_EVENTS,
    "l_diversity_audit": SQL_L_DIVERSITY_AUDIT,
}
