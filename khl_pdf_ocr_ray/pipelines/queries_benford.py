"""Benford's-law first-digit QC over order totals.

A fraud/corruption screen every financial-ish ingest runs: the first
significant digit of naturally-occurring amounts follows Benford's law
P(d) = log10(1 + 1/d); a chi-square deviation flags synthetic, trimmed
or duplicated value columns. Expected probabilities are module-level
micro-unit constants (ONE source of truth — the SQL oracle interpolates
the same integers), so the statistic is exact integer arithmetic:

  e_scaled_d   = N * P_MICRO[d]                       (expected * 10^6)
  chi2_term_d  = (1000 * (n_d*10^6 - e_scaled_d)^2)
                 // (e_scaled_d * 10^6)               (milli-units)

Output: 9 rows (digit, n, expected_micro, chi2_term_milli) — every
digit 1..9 present even at zero observations.

Plan / 100 TB notes: map-only digit extraction (Arrow cast-to-string +
slice, no Python per row) feeding a per-batch 9-cell combiner; ONE
9-group exchange; the driver folds 9 rows in exact Python ints
(products exceed int64 at ~10^4 rows since (n*10^6)^2 ~ 10^26 — the
oracle uses HUGEINT for the same reason).

Reference analogue: /root/reference/app.py has no numeric-QC surface;
brief scope (data-quality operators over the relational tables).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QB = "khl_pdf_ocr_ray.pipelines.queries_benford"

MICRO = 1_000_000
# P(d) = log10(1 + 1/d) in micro-units; round() on a float literal is
# deterministic (same 9 constants everywhere, incl. the SQL oracle)
BENFORD_P_MICRO = {
    d: int(round(math.log10(1.0 + 1.0 / d) * MICRO)) for d in range(1, 10)
}


def benford_digit_partial(batch: pa.Table) -> pa.Table:
    """orders batch -> (digit, n) partial counts of the first significant
    digit of floor(o_totalprice). Vectorized: int cast -> string -> first
    code unit (prices are >= 1 by schema contract, asserted)."""
    v = pc.floor(batch["o_totalprice"]).cast(pa.int64())
    if len(v) and pc.min(v).as_py() < 1:
        raise ValueError("benford_qc expects amounts >= 1")
    first = pc.utf8_slice_codeunits(v.cast(pa.string()), 0, 1)
    t = pa.table({"digit": first.cast(pa.int64())})
    g = t.group_by("digit").aggregate([([], "count_all")])
    g = select_rename(g, digit="digit", n="count_all")
    return g.set_column(1, "n", g["n"].cast(pa.int64()))


def benford_finalize(cells: pd.DataFrame) -> pd.DataFrame:
    """Aggregated (digit, n) -> the 9-row QC table, exact Python ints."""
    counts = {int(r.digit): int(r.n) for r in cells.itertuples()}
    big_n = sum(counts.values())
    digits = list(range(1, 10))
    ns, exps, terms = [], [], []
    for d in digits:
        n_d = counts.get(d, 0)
        p = BENFORD_P_MICRO[d]
        e_scaled = big_n * p  # expected count * 10^6
        if e_scaled == 0:
            term = 0
        else:
            dev = n_d * MICRO - e_scaled
            term = (1000 * dev * dev) // (e_scaled * MICRO)
        ns.append(n_d)
        exps.append(p)
        terms.append(term)
    return pd.DataFrame(
        {
            "digit": np.array(digits, dtype=np.int64),
            "n": np.array(ns, dtype=np.int64),
            "expected_micro": np.array(exps, dtype=np.int64),
            "chi2_term_milli": np.array(terms, dtype=np.int64),
        }
    )


def q_benford_qc(sf_dir: str) -> pd.DataFrame:
    """(digit, n, expected_micro, chi2_term_milli). See module docstring."""
    from ray.data.aggregate import Sum

    from .queries import _t

    cells = (
        _t(sf_dir, "orders", ["o_totalprice"])
        .map_batches(
            remote_fn(_QB, "benford_digit_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 9 rows
    )
    return benford_finalize(cells)


_P_CASE = " ".join(
    f"WHEN {d} THEN {BENFORD_P_MICRO[d]}" for d in range(1, 10)
)

SQL_BENFORD_QC = f"""
WITH obs AS (
  SELECT CAST(SUBSTR(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM obs GROUP BY digit),
tot AS (SELECT CAST(coalesce(sum(n), 0) AS HUGEINT) AS big_n FROM c),
grid AS (
  SELECT d AS digit, CASE d {_P_CASE} END AS p_micro
  FROM generate_series(1, 9) AS t(d))
SELECT grid.digit,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       CAST(grid.p_micro AS BIGINT) AS expected_micro,
       CAST(CASE WHEN tot.big_n * grid.p_micro = 0 THEN 0
            ELSE (1000 * (CAST(coalesce(c.n, 0) AS HUGEINT) * {MICRO}
                          - tot.big_n * grid.p_micro)
                       * (CAST(coalesce(c.n, 0) AS HUGEINT) * {MICRO}
                          - tot.big_n * grid.p_micro))
                 // (tot.big_n * grid.p_micro * {MICRO})
            END AS BIGINT) AS chi2_term_milli
FROM grid LEFT JOIN c USING (digit) CROSS JOIN tot
"""

BENFORD_QUERIES = {"benford_qc": q_benford_qc}
BENFORD_ORACLES = {"benford_qc": SQL_BENFORD_QC}
