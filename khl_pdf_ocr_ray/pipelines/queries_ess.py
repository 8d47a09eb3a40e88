"""Importance-weight effective-sample-size (ESS) diagnostic per language.

``lang_ess``: for each language, Kish's effective sample size of the
per-document importance weights, normalized to per-mille of the group
size: ``ess_permille = floor(1000 * (sum w)^2 / (n * sum w^2))``.
1000 means the weights are uniform (resampling keeps the full group);
small values mean a few documents dominate the resample — THE health
check run after any DSIR-style weighted resampling step (the
``dsir_topk`` / ``resample_weighted`` family) before committing to a
training mix. Weights here are ``n_chars`` (positive, corpus-provided,
scale-varying — non-degenerate on the synthetic corpus).

Exactness / overflow: the map-side combiner ships only int64-safe
per-lang partials (sum_w, sum_w2, n) — with w <= 2^15 per doc,
sum_w2 stays under 2^63 up to ~2^33 docs per lang per partition-tree,
asserted loudly. The SQUARE of sum_w (overflows int64 at ~3e9 docs x
300 chars) happens ONLY in the finalize, driver-side over <= n_langs
rows, in Python arbitrary-precision integers; the DuckDB twin squares
in HUGEINT. Rows with w <= 0 are excluded from n and the sums on both
sides (ESS is defined over positive weights).

Plan / 100 TB notes: ONE map-side combiner pass + a lang-cardinality
Sum exchange; nothing else moves. The finalize batch is <= n_langs
rows.

Reference analogue: /root/reference/app.py has no weighting surface;
brief scope (training-data pipeline diagnostics).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QE = "khl_pdf_ocr_ray.pipelines.queries_ess"

W_BOUND = 1 << 15  # per-doc weight bound backing the sum_w2 int64 argument


def ess_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> (lang, sum_w, sum_w2, n) partials, w > 0 only."""
    b = batch.filter(pc.greater(batch["n_chars"], 0))
    w = b["n_chars"].cast(pa.int64())
    assert pc.max(w).as_py() is None or pc.max(w).as_py() < W_BOUND, (
        "per-doc weight >= 2^15 — revisit the sum_w2 overflow bound"
    )
    t = pa.table(
        {
            "lang": b["lang"],
            "w": w,
            "w2": pc.multiply(w, w),
        }
    )
    g = t.group_by("lang").aggregate(
        [("w", "sum"), ("w2", "sum"), ([], "count_all")]
    )
    g = select_rename(g, lang="lang", sum_w="w_sum", sum_w2="w2_sum", n="count_all")
    return pa.table(
        {
            "lang": g["lang"],
            "sum_w": g["sum_w"].cast(pa.int64()),
            "sum_w2": g["sum_w2"].cast(pa.int64()),
            "n": g["n"].cast(pa.int64()),
        }
    )


def ess_finalize(batch: pa.Table) -> pa.Table:
    """(lang, sums) -> ess_permille in arbitrary-precision ints."""
    out = {"lang": [], "n_docs": [], "sum_w": [], "ess_permille": []}
    for row in batch.to_pylist():
        sw, sw2, n = int(row["sum_w"]), int(row["sum_w2"]), int(row["n"])
        out["lang"].append(row["lang"])
        out["n_docs"].append(n)
        out["sum_w"].append(sw)
        out["ess_permille"].append((1000 * sw * sw) // (n * sw2))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            "sum_w": pa.array(out["sum_w"], pa.int64()),
            "ess_permille": pa.array(out["ess_permille"], pa.int64()),
        }
    )


def q_lang_ess(sf_dir: str) -> "object":
    """(lang, n_docs, sum_w, ess_permille)."""
    from ray.data.aggregate import Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(
            remote_fn(_QE, "ess_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(
            Sum("sum_w", alias_name="sum_w"),
            Sum("sum_w2", alias_name="sum_w2"),
            Sum("n", alias_name="n"),
        )
        .map_batches(
            remote_fn(_QE, "ess_finalize"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SQL_LANG_ESS = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_w,
       CAST((1000 * CAST(sum(n_chars) AS HUGEINT)
                  * CAST(sum(n_chars) AS HUGEINT))
            // (CAST(count(*) AS HUGEINT)
                * CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT))
            AS BIGINT) AS ess_permille
FROM documents WHERE n_chars > 0 GROUP BY lang
"""

ESS_QUERIES = {"lang_ess": q_lang_ess}
ESS_ORACLES = {"lang_ess": SQL_LANG_ESS}
