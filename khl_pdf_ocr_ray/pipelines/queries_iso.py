"""Isotonic regression calibration (pool-adjacent-violators).

``isotonic_calibration``: fit the least-squares NON-DECREASING mapping
from predicted score to positive rate over the planted classifier
signal of ``score_calibration`` (same Knuth score/label hashes), at
per-score granularity (1000 cells, not 10 bins). This is the isotonic
calibration step (Zadrozny & Elkan 2002) an ML pipeline fits before
thresholding classifier scores — the non-parametric companion of the
binned reliability diagram.

Exactness: PAV pooling only ever compares and merges (pos_sum, n)
pairs, so every pooled rate is an exact rational; comparisons are
integer cross-multiplies and the exported rate is
iso_rate_ppm = 1e6 * pool_pos // pool_n. No floats anywhere.

Plan: ONE map-side (score, n, n_pos) combiner pass (<= 1000 cells per
batch) -> one score-keyed Sum exchange -> the driver runs the O(cells)
PAV stack over the 1000-row table. Only doc_id leaves the scan.

Oracle: an INDEPENDENT ALGORITHM — isotonic regression as the left
derivative of the greatest convex minorant of the cumulative sum
diagram (Barlow et al. 1972): a convex-hull construction with integer
cross-product turn tests, no pooling stack — dumped to parquet.
Agreement between the two derivations is the isotonic-regression
correctness statement, much stronger than re-running the same PAV
sequentially.

Reference analogue: none in /root/reference/app.py; brief scope
(evaluation family next to score_calibration / score_auc).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data.aggregate import Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn
from .queries_calib import _M31, _M32, CALIB_MULT, CALIB_SALT

_QI = "khl_pdf_ocr_ray.pipelines.queries_iso"


def iso_cell_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> per-batch (score, n, n_pos) cells (the
    score_calibration plant at per-score granularity)."""
    did = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    score = ((did % _M31) * CALIB_MULT) % _M32 % 1000
    h2 = (((did + CALIB_SALT) % _M31) * CALIB_MULT) % _M32 % 1_000_000
    is_pos = (h2 < score * score).astype(np.int64)
    t = pa.table(
        {
            "score": pa.array(score, pa.int64()),
            "n_pos": pa.array(is_pos, pa.int64()),
        }
    )
    g = t.group_by("score").aggregate([([], "count_all"), ("n_pos", "sum")])
    g = select_rename(g, score="score", n="count_all", n_pos="n_pos_sum")
    return g.set_column(1, "n", g["n"].cast(pa.int64()))


def pav_pool(scores: np.ndarray, n: np.ndarray, n_pos: np.ndarray):
    """THE PAV stack: (sorted score, n, n_pos) cells -> per-cell pooled
    (pool_pos, pool_n). Violator check is the integer cross-multiply
    p1 * n2 > p2 * n1 (rate1 > rate2 -> merge)."""
    # stack of [pos_sum, n_sum, n_cells]
    st: list = []
    for p, w in zip(n_pos.tolist(), n.tolist()):
        cur = [int(p), int(w), 1]
        while st and st[-1][0] * cur[1] > cur[0] * st[-1][1]:
            top = st.pop()
            cur = [top[0] + cur[0], top[1] + cur[1], top[2] + cur[2]]
        st.append(cur)
    pool_pos = np.empty(len(scores), dtype=np.int64)
    pool_n = np.empty(len(scores), dtype=np.int64)
    i = 0
    for p, w, c in st:
        pool_pos[i : i + c] = p
        pool_n[i : i + c] = w
        i += c
    return pool_pos, pool_n


def q_isotonic_calibration(sf_dir: str) -> pd.DataFrame:
    """(score, n, n_pos, iso_rate_ppm) per populated score cell."""
    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["doc_id"])
        .map_batches(
            remote_fn(_QI, "iso_cell_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("score")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
        .to_pandas()
        .sort_values("score", ignore_index=True)
    )
    s = cells["score"].to_numpy().astype(np.int64)
    n = cells["n"].to_numpy().astype(np.int64)
    p = cells["n_pos"].to_numpy().astype(np.int64)
    pool_pos, pool_n = pav_pool(s, n, p)
    return pd.DataFrame(
        {
            "score": s,
            "n": n,
            "n_pos": p,
            "iso_rate_ppm": 1_000_000 * pool_pos // pool_n,
        }
    ).astype("int64")


def isotonic_gcm_sequential(sf_dir: str) -> pd.DataFrame:
    """INDEPENDENT oracle: isotonic regression as the left derivative
    of the GREATEST CONVEX MINORANT of the cumulative sum diagram
    (Barlow et al. 1972) — a convex-hull computation with integer
    cross-product turn tests, no pooling stack, no rate comparisons."""
    did = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    score = ((did % _M31) * CALIB_MULT) % _M32 % 1000
    h2 = (((did + CALIB_SALT) % _M31) * CALIB_MULT) % _M32 % 1_000_000
    is_pos = (h2 < score * score).astype(np.int64)
    df = (
        pd.DataFrame({"score": score, "pos": is_pos})
        .groupby("score")
        .agg(n=("pos", "size"), n_pos=("pos", "sum"))
        .reset_index()
        .sort_values("score", ignore_index=True)
    )
    n = df["n"].to_numpy().astype(np.int64)
    p = df["n_pos"].to_numpy().astype(np.int64)
    cn = np.concatenate(([0], np.cumsum(n))).astype(object)
    cp = np.concatenate(([0], np.cumsum(p))).astype(object)
    m = len(df)
    # lower convex hull of the CSD points (cn[k], cp[k]), k = 0..m:
    # P2 survives iff slope(P1,P2) < slope(P2,P3) (strictly increasing
    # slopes == convex), i.e. cross(P2-P1, P3-P2) > 0; pop on <= 0
    # (a straight turn merges equal-slope segments, same per-cell fit).
    hull = []
    for k in range(m + 1):
        pt = (int(cn[k]), int(cp[k]))
        while len(hull) >= 2:
            (x1, y1), (x2, y2) = hull[-2], hull[-1]
            if (x2 - x1) * (pt[1] - y2) - (y2 - y1) * (pt[0] - x2) <= 0:
                hull.pop()
            else:
                break
        hull.append(pt)
    # segment slopes (exact rationals) assigned to the cells they span
    iso = np.empty(m, dtype=np.int64)
    cn_flat = np.concatenate(([0], np.cumsum(n)))
    for (x1, y1), (x2, y2) in zip(hull, hull[1:]):
        lo = int(np.searchsorted(cn_flat, x1))
        hi = int(np.searchsorted(cn_flat, x2))
        iso[lo:hi] = 1_000_000 * (y2 - y1) // (x2 - x1)
    return pd.DataFrame(
        {
            "score": df["score"].astype("int64"),
            "n": df["n"].astype("int64"),
            "n_pos": df["n_pos"].astype("int64"),
            "iso_rate_ppm": pd.Series(iso, dtype="int64"),
        }
    )


def _dumps_dir(sf_dir: str) -> str:
    from ..state.atomic import content_keyed_dir

    return content_keyed_dir(
        os.path.abspath(__file__),
        os.path.join(sf_dir, "documents.parquet"),
        "oracle_dumps_iso",
    )


def iso_oracle_sqls(sf_dir: str) -> Dict[str, str]:
    from ..state.atomic import ensure_published

    out_dir = _dumps_dir(sf_dir)

    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(
                isotonic_gcm_sequential(sf_dir), preserve_index=False
            ),
            os.path.join(tmp, "iso_gcm.parquet"),
        )

    ensure_published(out_dir, build)
    return {
        "isotonic_calibration": (
            "SELECT score, n, n_pos, iso_rate_ppm FROM "
            f"read_parquet('{os.path.join(out_dir, 'iso_gcm.parquet')}')"
        )
    }


ISO_QUERIES = {"isotonic_calibration": q_isotonic_calibration}
