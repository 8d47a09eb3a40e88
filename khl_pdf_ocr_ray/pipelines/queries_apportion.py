"""Largest-remainder crawl-budget apportionment across sources.

The politeness/planning primitive a crawler scheduler runs before every
fetch wave: split a fixed global budget B across sources proportionally
to their document counts, with the Hamilton largest-remainder method so
the integer allocations sum EXACTLY to B:

  quota_s = (B * n_s) // N           (floor share)
  rem_s   = (B * n_s) mod N          (fractional remainder, scaled by N)
  the L = B - sum(quota) leftover units go to the L largest remainders
  (ties broken by source ASC)

Output: one row per source
(source, n_docs, quota, extra, budget = quota + extra).

Plan / 100 TB notes: ONE combiner-backed per-source Count (the document
payload never shuffles); the apportionment folds driver-side over
|sources| rows — the bounded-pull class (hosts/sources are vocabulary-
sized next to the corpus; the pagerank/HITS operators already establish
the under-cap contract for this family). Exact Python ints (B * n_s
overflows int64 only past 10^15 docs; the oracle uses HUGEINT).

Oracle: static SQL — counts + a ROW_NUMBER window over
(remainder DESC, source ASC).

Reference analogue: /root/reference/app.py fetches one url per request
(app.py:62); budgeted multi-host scheduling is brief scope (web-crawl
planning over the corpus tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..remote import remote_fn  # noqa: F401  (registry convention)

APPORTION_BUDGET = 10_000


def apportion_fold(sources, counts, budget: int = APPORTION_BUDGET):
    """Hamilton largest-remainder over (source, n) rows; returns a
    DataFrame. |sources|-sized, shared verbatim by tests."""
    rows = sorted(zip(sources, (int(c) for c in counts)))
    big_n = sum(n for _, n in rows)
    quotas = [(budget * n) // big_n for _, n in rows]
    rems = [(budget * n) % big_n for _, n in rows]
    leftover = budget - sum(quotas)
    order = sorted(
        range(len(rows)), key=lambda i: (-rems[i], rows[i][0])
    )
    extra = [0] * len(rows)
    for i in order[:leftover]:
        extra[i] = 1
    return pd.DataFrame(
        {
            "source": [s for s, _ in rows],
            "n_docs": np.array([n for _, n in rows], dtype=np.int64),
            "quota": np.array(quotas, dtype=np.int64),
            "extra": np.array(extra, dtype=np.int64),
            "budget": np.array(
                [q + e for q, e in zip(quotas, extra)], dtype=np.int64
            ),
        }
    )


def q_source_budget_apportion(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, quota, extra, budget). See module docstring."""
    from ray.data.aggregate import Count

    from .queries import _t

    per_source = (
        _t(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()  # |sources| rows — vocabulary-bounded
    )
    return apportion_fold(
        per_source["source"].tolist(),
        per_source["n_docs"].to_numpy().astype(np.int64),
    )


SQL_SOURCE_BUDGET_APPORTION = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_docs) AS HUGEINT) AS big_n FROM c),
q AS (
  SELECT source, n_docs,
         CAST(({APPORTION_BUDGET} * CAST(n_docs AS HUGEINT)) // big_n
              AS BIGINT) AS quota,
         CAST(({APPORTION_BUDGET} * CAST(n_docs AS HUGEINT)) % big_n
              AS BIGINT) AS rem
  FROM c CROSS JOIN tot),
l AS (SELECT {APPORTION_BUDGET} - sum(quota) AS leftover FROM q),
r AS (
  SELECT source, n_docs, quota,
         CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
              AS BIGINT) AS rk
  FROM q)
SELECT source, n_docs, quota,
       CAST(CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(quota + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS budget
FROM r CROSS JOIN l
"""

APPORTION_QUERIES = {"source_budget_apportion": q_source_budget_apportion}
APPORTION_ORACLES = {
    "source_budget_apportion": SQL_SOURCE_BUDGET_APPORTION
}
