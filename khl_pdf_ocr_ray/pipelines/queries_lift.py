"""Decile lift / cumulative-gain table (classifier ranking eval).

``decile_lift``: rank documents by the score (n_chars, the score_auc
signal) DESCENDING with doc_id tie-break, split into NTILE(10) deciles,
and report per decile the exact document count, positive count
(lang == 'en', the AUC positive class), positive rate, lift vs the base
rate, and cumulative gain — the third classic ranking-eval artifact
next to score_auc (threshold-free ordering quality) and
score_calibration (probability quality): lift tables are what a
targeting/filtering decision actually reads ("the top decile holds
2.3x the base rate").

All integer permille arithmetic: rate = 1000*n_pos//n,
lift = 1000*n_pos*n_total // (n*p_total),
cum_gain = 1000*cum_pos // p_total.

Plan / 100 TB notes: the doc_ntile machinery (queries_window) — one
distinct-score histogram exchange gives exact global rank offsets
(rows ~ score domain, not corpus); the assignment pass shards by
score-hash and emits per-shard (tile, n, n_pos) PARTIALS (never per-doc
rows), folded by a 10-group Sum; the final permille math runs on 10
driver rows. No global sort, no per-doc shuffle.

Oracle: static SQL — NTILE(10) window + the same integer permille
expressions.

Reference analogue: none in /root/reference/app.py; brief scope
(quality-classifier evaluation family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..remote import remote_fn

_QL = "khl_pdf_ocr_ray.pipelines.queries_lift"

LIFT_K = 10  # deciles


def lift_assign_shard(g: pd.DataFrame, cum_before: dict, n_total: int) -> pd.DataFrame:
    """One score shard -> per-(tile) count partials. Global rank =
    cum_before[score] + within-score cumcount in doc_id order (the
    ORDER BY n_chars DESC, doc_id contract — cum_before is built over
    the DESC-sorted histogram)."""
    from .queries_eval import AUC_POS_LANG
    from .queries_window import ntile_of_rank

    g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
    within = g.groupby("n_chars", sort=False).cumcount().to_numpy()
    base = g["n_chars"].map(cum_before).to_numpy(dtype="int64")
    tile = ntile_of_rank(base + within, n_total, LIFT_K)
    pos = (g["lang"] == AUC_POS_LANG).to_numpy().astype(np.int64)
    out = (
        pd.DataFrame({"tile": tile, "n": 1, "n_pos": pos})
        .groupby("tile", as_index=False)
        .sum()
    )
    return out.astype({"tile": "int64", "n": "int64", "n_pos": "int64"})


def q_decile_lift(sf_dir: str) -> pd.DataFrame:
    """(tile, n, n_pos, rate_permille, lift_permille, cum_gain_permille)."""
    from ray.data.aggregate import Sum

    from .queries import _t
    from .queries_window import coalesce_for_input, table_nbytes

    hist = (
        _t(sf_dir, "documents", ["n_chars"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_window", "size_hist_partial"),
            batch_format="pyarrow",
        )
        .repartition(coalesce_for_input(table_nbytes(sf_dir, "documents")))
        .groupby("n_chars")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per DISTINCT score value
        .sort_values("n_chars", ascending=False)  # rank by score DESC
    )
    counts = hist["n"].to_numpy(dtype="int64")
    n_total = int(counts.sum())
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    cum_before = dict(zip(hist["n_chars"].astype(int).tolist(), cum.tolist()))
    tiles = (
        _t(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_window", "ntile_shard_key"),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(
            remote_fn(_QL, "lift_assign_shard", cum_before=cum_before, n_total=n_total),
            batch_format="pandas",
        )
        .groupby("tile")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
        .to_pandas()  # LIFT_K rows
        .sort_values("tile", ignore_index=True)
    )
    p_total = int(tiles["n_pos"].sum())
    n = tiles["n"].astype(int)
    n_pos = tiles["n_pos"].astype(int)
    cum_pos = n_pos.cumsum()
    return pd.DataFrame(
        {
            "tile": tiles["tile"].astype("int64"),
            "n": n.astype("int64"),
            "n_pos": n_pos.astype("int64"),
            "rate_permille": (1000 * n_pos // n).astype("int64"),
            "lift_permille": (1000 * n_pos * n_total // (n * p_total)).astype(
                "int64"
            ),
            "cum_gain_permille": (1000 * cum_pos // p_total).astype("int64"),
        }
    )


def _sql() -> str:
    from .queries_eval import AUC_POS_LANG

    return f"""
WITH r AS (
  SELECT lang,
         ntile({LIFT_K}) OVER (ORDER BY n_chars DESC, doc_id) AS tile
  FROM documents),
tot AS (
  SELECT count(*) AS n_total,
         sum(CASE WHEN lang = '{AUC_POS_LANG}' THEN 1 ELSE 0 END) AS p_total
  FROM documents),
d AS (
  SELECT tile, count(*) AS n,
         sum(CASE WHEN lang = '{AUC_POS_LANG}' THEN 1 ELSE 0 END) AS n_pos
  FROM r GROUP BY tile)
SELECT CAST(tile AS BIGINT) AS tile,
       CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(1000 * n_pos // n AS BIGINT) AS rate_permille,
       CAST(1000 * n_pos * tot.n_total // (n * tot.p_total) AS BIGINT)
         AS lift_permille,
       CAST(1000 * (sum(n_pos) OVER (ORDER BY tile)) // tot.p_total
            AS BIGINT) AS cum_gain_permille
FROM d, tot
"""


LIFT_QUERIES = {"decile_lift": q_decile_lift}
LIFT_ORACLES = {"decile_lift": _sql()}
