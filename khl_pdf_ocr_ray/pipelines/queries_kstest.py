"""Two-sample Kolmogorov–Smirnov drift statistic, exact in integers.

``ks_drift`` — the distribution-drift primitive a corpus pipeline runs
between two slices before mixing them (here: English vs non-English
document lengths; in deployment: snapshot N vs N+1, source A vs B).
The KS statistic D = max_v |CDF_A(v) - CDF_B(v)| is computed EXACTLY:
cross-multiplying the two empirical CDFs (|n_b * cum_a - n_a * cum_b|)
keeps every intermediate an int64 — no float CDFs, no libm, so the
static-SQL oracle agrees bit-for-bit. Output is one row:
(n_a, n_b, ks_num, ks_milli) with ks_milli = floor(1000 * ks_num /
(n_a * n_b)).

Plan / 100 TB notes: ONE map-side (value, n_a, n_b) combiner pass over
documents (text never read — only the n_chars column leaves the
scan), ONE value-keyed Sum exchange, then a driver-side sorted-cumsum
fold over the DISTINCT-VALUE table. That fold is bounded by the
number of distinct document lengths — <= max doc length, ~10^6 rows
at web scale, a few MB on the driver — the same bounded-fold class as
context_length_budget. The overflow bound is checked loudly:
n_a * n_b and n_b * cum_a must stay under 2^63 (holds through
~3 * 10^9 docs per slice; beyond that, bucket lengths first).

Oracle: static SQL — the same cross-multiplied window cumsum.

Reference analogue: /root/reference/app.py has no drift surface;
brief scope (drift/QC family next to source_tv_drift — TV needs
binning, KS is binning-free on the ordered support).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QK = "khl_pdf_ocr_ray.pipelines.queries_kstest"

KS_LANG_A = "en"


def ks_count_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (v, n_a, n_b) per-length count partials."""
    import pyarrow.compute as pc

    is_a = pc.cast(pc.equal(batch["lang"], KS_LANG_A), pa.int64())
    t = pa.table(
        {
            "v": batch["n_chars"].cast(pa.int64()),
            "n_a": is_a,
            "n_b": pc.subtract(1, is_a),
        }
    )
    g = t.group_by("v").aggregate([("n_a", "sum"), ("n_b", "sum")])
    return select_rename(g, v="v", n_a="n_a_sum", n_b="n_b_sum")


def ks_fold(counts: "np.ndarray | object") -> dict:
    """Sorted (v, n_a, n_b) rows -> the exact KS row. Shared by the
    distributed plan's driver fold and the tests."""
    import pandas as pd

    df: pd.DataFrame = counts.sort_values("v").reset_index(drop=True)
    na = int(df["n_a"].sum())
    nb = int(df["n_b"].sum())
    assert na > 0 and nb > 0, "ks_drift: a slice is empty"
    assert na < (1 << 31) and nb < (1 << 31), (
        "ks_drift: cross-multiplication would overflow int64 — bucket "
        "lengths before the CDF fold at this scale"
    )
    ca = df["n_a"].to_numpy(dtype=np.int64).cumsum()
    cb = df["n_b"].to_numpy(dtype=np.int64).cumsum()
    ks_num = int(np.abs(nb * ca - na * cb).max())
    return {
        "n_a": na,
        "n_b": nb,
        "ks_num": ks_num,
        "ks_milli": (1000 * ks_num) // (na * nb),
    }


def q_ks_drift(sf_dir: str) -> "object":
    """Single row (n_a, n_b, ks_num, ks_milli)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .queries import _t

    counts = (
        _t(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(
            remote_fn(_QK, "ks_count_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("v")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
        .to_pandas()  # bounded: one row per DISTINCT doc length
    )
    row = ks_fold(counts)
    return pd.DataFrame([row])


SQL_KS_DRIFT = f"""
WITH ab AS (
  SELECT n_chars AS v,
         sum(CASE WHEN lang = '{KS_LANG_A}' THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN lang = '{KS_LANG_A}' THEN 0 ELSE 1 END) AS n_b
  FROM documents GROUP BY n_chars),
t AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS na, CAST(sum(n_b) AS BIGINT) AS nb
  FROM ab),
c AS (
  SELECT sum(n_a) OVER (ORDER BY v) AS ca,
         sum(n_b) OVER (ORDER BY v) AS cb
  FROM ab)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(max(abs(t.nb * c.ca - t.na * c.cb)) AS BIGINT) AS ks_num,
       CAST((1000 * max(abs(t.nb * c.ca - t.na * c.cb)))
            // (t.na * t.nb) AS BIGINT) AS ks_milli
FROM c CROSS JOIN t
GROUP BY t.na, t.nb
"""

KSTEST_QUERIES = {"ks_drift": q_ks_drift}
KSTEST_ORACLES = {"ks_drift": SQL_KS_DRIFT}
