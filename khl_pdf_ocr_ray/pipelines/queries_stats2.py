"""Grouped higher-moment / rank-statistic hypothesis tests.

Five operators in the exact-integer-sufficient-statistics family that
``corr_value_props`` / ``lang_ols_slope`` established (integer sums ->
one agreed double formula, bit-identical on both engines):

- ``lang_skew_kurtosis`` — per-lang skewness g1 and excess kurtosis g2
  of doc size from raw power sums s1..s4. s3/s4 partials ship as
  (hi, lo) base-2^40 column pairs so the int64 ``Sum`` exchange stays
  exact at any document-size magnitude (DuckDB's HUGEINT sums are the
  oracle-side equivalent); the driver recombines in arbitrary-precision
  Python. Raw (uncentered) moments are fine for the GATE because both
  engines run the identical double op sequence; the 100 TB deployment
  note is to shift by a first-pass pivot before the power sums to tame
  cancellation — the plan gains one |langs|-row broadcast, nothing else.
- ``welch_t_value`` — Welch's unequal-variance t between purchase and
  view event values (cents fixed point): one 2-row combiner exchange,
  then t and the Welch–Satterthwaite df from the 6 exact integers.
- ``spearman_size_tokens`` — per-lang Spearman rho between n_chars and
  whitespace token count. Fractional average ranks stay integer by the
  x2 trick (2*avgrank = 2*cum_before + tiecount + 1); rho is Pearson
  over the integer 2r values, weighted by (x, y) cell counts.
- ``mannwhitney_value`` — Mann-Whitney U (purchase vs view values)
  with the tie-corrected normal z. Rank sums come from the cents value
  histogram, U scaled x2 to stay integer, tie term sum(t^3 - t) exact.
- ``kendall_tau_buckets`` — per-lang Kendall tau-b over bucketed
  (n_chars // 16, tokens // 4): concordant/discordant pair counts from
  the 2D cell grid via reversed double cumsum (dominance counting) —
  never a per-row pair loop. Bucketing is what bounds the grid; the
  oracle recomputes C/D with an explicit cell-pair self-join (a
  different formulation of the same counts).

Plan shape shared by the rank statistics: corpus -> per-batch cell
combiner (group cardinality = distinct value/bucket cells, not rows)
-> ONE cell-keyed Sum exchange -> a driver walk over the domain-bounded
histogram (the events_mad / events_iqr_filter convention, loud-capped
here at CELL_CAP). The corpus itself never shuffles in any of the five.

Oracles: static SQL, same integer sums (HUGEINT), same double op order.

Reference analogue: /root/reference/app.py has no statistics surface;
brief scope (corpus QC / drift-testing family alongside ks_drift,
ab_test_chi2, corr_value_props).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QS2 = "khl_pdf_ocr_ray.pipelines.queries_stats2"

_SPLIT = 1 << 40  # hi/lo base for s3/s4 partials
CELL_CAP = 5_000_000  # loud bound on driver-side histogram walks
KT_XDIV, KT_YDIV = 16, 4  # kendall bucket widths (chars, tokens)
_RE_TOKEN = r"\S+"  # == stages/textqc ws-token convention


# --- lang_skew_kurtosis -----------------------------------------------------
def skewkurt_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> per-(lang, batch) exact raw power sums.

    Exactness at any size magnitude: the per-batch sum runs over the
    batch's DISTINCT (lang, size) cells in arbitrary-precision Python
    (loop bounded by cell cardinality, not rows), then s2/s3/s4 split
    into (hi, lo) base-2^40 halves so downstream int64 Sums cannot
    wrap (s1 <= n * max_size stays under 2^63 through 10^12 docs of
    10^6 chars; lo-sums stay exact below ~8e6 blocks per lang; the
    hi/lo recombine at the driver is arbitrary-precision)."""
    cells = (
        pa.table({"lang": batch["lang"], "x": batch["n_chars"]})
        .group_by(["lang", "x"])
        .aggregate([("x", "count")])
    )
    langs = cells["lang"].to_pylist()
    xs = cells["x"].to_pylist()
    cnts = cells["x_count"].to_pylist()
    acc: dict = {}
    for lang, x, c in zip(langs, xs, cnts):
        a = acc.setdefault(lang, [0, 0, 0, 0, 0])
        x = int(x)
        a[0] += c
        a[1] += c * x
        a[2] += c * x * x
        a[3] += c * x * x * x
        a[4] += c * x * x * x * x
    cols = (
        "n",
        "s1",
        "s2_hi",
        "s2_lo",
        "s3_hi",
        "s3_lo",
        "s4_hi",
        "s4_lo",
    )
    rows: dict = {"lang": [], **{k: [] for k in cols}}
    for lang, (n, s1, s2, s3, s4) in sorted(acc.items()):
        rows["lang"].append(lang)
        rows["n"].append(n)
        rows["s1"].append(s1)
        for name, v in (("s2", s2), ("s3", s3), ("s4", s4)):
            rows[f"{name}_hi"].append(v >> 40)
            rows[f"{name}_lo"].append(v & (_SPLIT - 1))
    return pa.table(
        {
            "lang": pa.array(rows["lang"], pa.string()),
            **{k: pa.array(rows[k], pa.int64()) for k in cols},
        }
    )


def skewkurt_finalize(n: int, s1: int, s2: int, s3: int, s4: int):
    """THE shared double formula (mirrored verbatim in the SQL twin):
    raw power sums -> central moments -> (g1, g2). Every operand enters
    as an exact integer; op order is fixed."""
    mean = float(s1) / n
    t2 = float(s2) / n
    t3 = float(s3) / n
    t4 = float(s4) / n
    m2 = t2 - mean * mean
    m3 = t3 - 3.0 * mean * t2 + 2.0 * mean * mean * mean
    m4 = (
        t4
        - 4.0 * mean * t3
        + 6.0 * mean * mean * t2
        - 3.0 * mean * mean * mean * mean
    )
    skew = m3 / (m2 * math.sqrt(m2))
    kurt = m4 / (m2 * m2) - 3.0
    return skew, kurt


def q_lang_skew_kurtosis(sf_dir: str) -> pd.DataFrame:
    """(lang, n_docs, skewness, kurtosis_excess) per language."""
    from .queries import _t

    parts = (
        _t(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(
            remote_fn(_QS2, "skewkurt_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(
            *[
                Sum(c, alias_name=c)
                for c in (
                    "n",
                    "s1",
                    "s2_hi",
                    "s2_lo",
                    "s3_hi",
                    "s3_lo",
                    "s4_hi",
                    "s4_lo",
                )
            ]
        )
        .to_pandas()
    )
    out = []
    for r in parts.itertuples(index=False):
        s2 = int(r.s2_hi) * _SPLIT + int(r.s2_lo)
        s3 = int(r.s3_hi) * _SPLIT + int(r.s3_lo)
        s4 = int(r.s4_hi) * _SPLIT + int(r.s4_lo)
        skew, kurt = skewkurt_finalize(int(r.n), int(r.s1), s2, s3, s4)
        out.append((r.lang, int(r.n), skew, kurt))
    return pd.DataFrame(
        out, columns=["lang", "n_docs", "skewness", "kurtosis_excess"]
    ).sort_values("lang", ignore_index=True)


SQL_LANG_SKEW_KURTOSIS = """
WITH s AS (
  SELECT lang, count(*) AS n,
         sum(CAST(n_chars AS HUGEINT)) AS s1,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2,
         sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars) AS s3,
         sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars * n_chars) AS s4
  FROM documents GROUP BY lang),
d AS (
  SELECT lang, n,
         CAST(s1 AS DOUBLE) / n AS mean,
         CAST(s2 AS DOUBLE) / n AS t2,
         CAST(s3 AS DOUBLE) / n AS t3,
         CAST(s4 AS DOUBLE) / n AS t4
  FROM s),
m AS (
  SELECT lang, n, mean,
         t2 - mean * mean AS m2,
         t3 - 3.0 * mean * t2 + 2.0 * mean * mean * mean AS m3,
         t4 - 4.0 * mean * t3 + 6.0 * mean * mean * t2
            - 3.0 * mean * mean * mean * mean AS m4
  FROM d)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) - 3.0 AS kurtosis_excess
FROM m
"""


# --- welch_t_value ----------------------------------------------------------
def welch_partial(batch: pa.Table) -> pa.Table:
    """purchase/view events batch -> per-(side, batch) (n, s, ss) cents
    partials. ss headroom: cents^2 * rows per block stays under 2^63 for
    values < ~$2.9e5 at 10^9-row blocks; beyond that the skewkurt hi/lo
    split applies unchanged."""
    from .queries import _cents

    mask = pc.is_in(
        batch["event_type"], value_set=pa.array(["purchase", "view"])
    )
    t = batch.filter(mask)
    cents = _cents(t["value"])
    tt = pa.table(
        {
            "side": t["event_type"],
            "c": cents,
            "cc": pc.multiply(cents, cents),
        }
    )
    g = tt.group_by(["side"]).aggregate(
        [("c", "count"), ("c", "sum"), ("cc", "sum")]
    )
    return select_rename(g, side="side", n="c_count", s="c_sum", ss="cc_sum")


def welch_finalize(n1, s1, ss1, n2, s2, ss2):
    """THE shared double formula: (mean_diff, t_stat, welch_df) from the
    six exact integers (sample variances via the n*ss - s^2 rational)."""
    v1 = float(n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))
    v2 = float(n2 * ss2 - s2 * s2) / (n2 * (n2 - 1))
    md = float(s1) / n1 - float(s2) / n2
    se1 = v1 / n1
    se2 = v2 / n2
    sed = se1 + se2
    t = md / math.sqrt(sed)
    df = sed * sed / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    return md, t, df


def q_welch_t_value(sf_dir: str) -> pd.DataFrame:
    """One row: (n_purchase, n_view, mean_diff, t_stat, welch_df)."""
    from .queries import _t

    parts = (
        _t(sf_dir, "events", ["event_type", "value"])
        .map_batches(
            remote_fn(_QS2, "welch_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("side")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
        .to_pandas()
        .set_index("side")
    )
    p, v = parts.loc["purchase"], parts.loc["view"]
    md, t, df = welch_finalize(
        int(p.n), int(p.s), int(p.ss), int(v.n), int(v.s), int(v.ss)
    )
    return pd.DataFrame(
        [(int(p.n), int(v.n), md, t, df)],
        columns=["n_purchase", "n_view", "mean_diff", "t_stat", "welch_df"],
    )


SQL_WELCH_T_VALUE = """
WITH c AS (
  SELECT event_type AS side,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'view')),
s AS (
  SELECT side, count(*) AS n, sum(CAST(cents AS HUGEINT)) AS s,
         sum(CAST(cents AS HUGEINT) * cents) AS ss
  FROM c GROUP BY side),
pv AS (
  SELECT p.n AS n1, p.s AS s1, p.ss AS ss1,
         v.n AS n2, v.s AS s2, v.ss AS ss2
  FROM (SELECT * FROM s WHERE side = 'purchase') p
  CROSS JOIN (SELECT * FROM s WHERE side = 'view') v),
d AS (
  SELECT n1, n2,
         CAST(n1 * ss1 - s1 * s1 AS DOUBLE) / (n1 * (n1 - 1)) / n1 AS se1,
         CAST(n2 * ss2 - s2 * s2 AS DOUBLE) / (n2 * (n2 - 1)) / n2 AS se2,
         CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md
  FROM pv)
SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_view,
       md AS mean_diff,
       md / sqrt(se1 + se2) AS t_stat,
       (se1 + se2) * (se1 + se2)
         / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)) AS welch_df
FROM d
"""


# --- spearman_size_tokens / kendall_tau_buckets -----------------------------
def xy_cells_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> per-batch (lang, x, y, cnt) cells with
    x = n_chars and y = whitespace token count (textqc convention)."""
    text = pc.fill_null(batch["text"], "")
    y = pc.cast(pc.count_substring_regex(text, _RE_TOKEN), pa.int64())
    t = pa.table({"lang": batch["lang"], "x": batch["n_chars"], "y": y})
    g = t.group_by(["lang", "x", "y"]).aggregate([("x", "count")])
    return select_rename(g, lang="lang", x="x", y="y", cnt="x_count")


def _lang_cells(sf_dir: str) -> pd.DataFrame:
    """Distributed corpus -> (lang, x, y, cnt) cell table, pulled to the
    driver (bounded by distinct-value cells; CELL_CAP guards the pull)."""
    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["lang", "n_chars", "text"])
        .map_batches(
            remote_fn(_QS2, "xy_cells_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lang", "x", "y"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    assert len(cells) <= CELL_CAP, (
        f"xy cell cardinality {len(cells)} exceeds CELL_CAP={CELL_CAP}: "
        "bucket the values (kendall_tau_buckets' dividers) before ranking"
    )
    return cells


def rank2_map(cnts: np.ndarray) -> np.ndarray:
    """Tie counts of the ASCENDING-sorted distinct values -> 2*average
    rank per value (integer: 2*cum_before + cnt + 1). Only the counts
    matter; the caller owns the value ordering."""
    cum = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    return 2 * cum + cnts + 1


def spearman_from_cells(g: pd.DataFrame):
    """One lang's cells -> (n, rho) via exact integer rank sums."""
    hx = g.groupby("x", as_index=False)["cnt"].sum().sort_values("x")
    hy = g.groupby("y", as_index=False)["cnt"].sum().sort_values("y")
    r2x = dict(zip(hx["x"], rank2_map(hx["cnt"].to_numpy())))
    r2y = dict(zip(hy["y"], rank2_map(hy["cnt"].to_numpy())))
    n = sx = sy = sxx = syy = sxy = 0
    for x, y, c in zip(g["x"], g["y"], g["cnt"]):
        a, b, c = int(r2x[x]), int(r2y[y]), int(c)
        n += c
        sx += c * a
        sy += c * b
        sxx += c * a * a
        syy += c * b * b
        sxy += c * a * b
    num = n * sxy - sx * sy
    da = n * sxx - sx * sx
    db = n * syy - sy * sy
    rho = float(num) / (math.sqrt(float(da)) * math.sqrt(float(db)))
    return n, rho


def q_spearman_size_tokens(sf_dir: str) -> pd.DataFrame:
    """(lang, n_docs, rho_spearman) per language."""
    cells = _lang_cells(sf_dir)
    out = [
        (lang, *spearman_from_cells(g))
        for lang, g in cells.groupby("lang", sort=True)
    ]
    return pd.DataFrame(out, columns=["lang", "n_docs", "rho_spearman"])


SQL_SPEARMAN_SIZE_TOKENS = r"""
WITH t AS (
  SELECT lang, n_chars AS x,
         CAST(len(regexp_extract_all(coalesce(text, ''), '\S+')) AS BIGINT) AS y
  FROM documents),
hx AS (SELECT lang, x, count(*) AS c FROM t GROUP BY lang, x),
rx AS (
  SELECT lang, x,
         2 * (sum(c) OVER (PARTITION BY lang ORDER BY x) - c) + c + 1 AS r2
  FROM hx),
hy AS (SELECT lang, y, count(*) AS c FROM t GROUP BY lang, y),
ry AS (
  SELECT lang, y,
         2 * (sum(c) OVER (PARTITION BY lang ORDER BY y) - c) + c + 1 AS r2
  FROM hy),
j AS (
  SELECT t.lang, CAST(rx.r2 AS HUGEINT) AS a, CAST(ry.r2 AS HUGEINT) AS b
  FROM t
  JOIN rx ON rx.lang = t.lang AND rx.x = t.x
  JOIN ry ON ry.lang = t.lang AND ry.y = t.y),
s AS (
  SELECT lang, count(*) AS n, sum(a) AS sx, sum(b) AS sy,
         sum(a * a) AS sxx, sum(b * b) AS syy, sum(a * b) AS sxy
  FROM j GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho_spearman
FROM s
"""


def kendall_from_cells(g: pd.DataFrame):
    """One lang's bucketed cells -> (n, C, D, tau_b) via dominance
    counting on the dense (xb, yb) grid (reversed 2D cumsum)."""
    xs = np.sort(g["xb"].unique())
    ys = np.sort(g["yb"].unique())
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    assert len(xs) * len(ys) <= CELL_CAP, "kendall grid exceeds CELL_CAP"
    grid = np.zeros((len(xs), len(ys)), dtype=object)
    for x, y, c in zip(g["xb"], g["yb"], g["cnt"]):
        grid[xi[x], yi[y]] += int(c)
    # strictly-greater-in-both suffix sums: S[i,j] = sum grid[i+1:, j+1:]
    suf = np.cumsum(np.cumsum(grid[::-1, ::-1], axis=0), axis=1)[::-1, ::-1]
    gt_both = np.zeros_like(grid)
    gt_both[:-1, :-1] = suf[1:, 1:]
    # x greater, y smaller: T[i,j] = sum grid[i+1:, :j]
    suf_x = np.cumsum(grid[::-1, :], axis=0)[::-1, :]
    gt_lt = np.zeros_like(grid)
    gt_lt[:-1, 1:] = np.cumsum(suf_x[1:, :], axis=1)[:, :-1]
    C = int(np.sum(grid * gt_both))
    D = int(np.sum(grid * gt_lt))
    n = int(np.sum(grid))
    cx = np.sum(grid, axis=1)
    cy = np.sum(grid, axis=0)
    n0 = n * (n - 1) // 2
    n1 = int(sum(int(c) * (int(c) - 1) // 2 for c in cx))
    n2 = int(sum(int(c) * (int(c) - 1) // 2 for c in cy))
    if n0 == n1 or n0 == n2:
        # a variable with ALL pairs tied has no rank order — tau is
        # undefined (never the case for the driver corpus; the SQL twin
        # would emit inf/nan from the same zero denominator)
        return n, C, D, float("nan")
    tau = float(C - D) / (
        math.sqrt(float(n0 - n1)) * math.sqrt(float(n0 - n2))
    )
    return n, C, D, tau


def kt_cells_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> bucketed (lang, xb, yb, cnt) cells."""
    text = pc.fill_null(batch["text"], "")
    y = pc.cast(pc.count_substring_regex(text, _RE_TOKEN), pa.int64())
    t = pa.table(
        {
            "lang": batch["lang"],
            "xb": pc.divide(batch["n_chars"], KT_XDIV),
            "yb": pc.divide(y, KT_YDIV),
        }
    )
    g = t.group_by(["lang", "xb", "yb"]).aggregate([("xb", "count")])
    return select_rename(g, lang="lang", xb="xb", yb="yb", cnt="xb_count")


def q_kendall_tau_buckets(sf_dir: str) -> pd.DataFrame:
    """(lang, n_docs, n_concordant, n_discordant, tau_b) per language."""
    from .queries import _t

    cells = (
        _t(sf_dir, "documents", ["lang", "n_chars", "text"])
        .map_batches(
            remote_fn(_QS2, "kt_cells_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lang", "xb", "yb"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out = [
        (lang, *kendall_from_cells(g))
        for lang, g in cells.groupby("lang", sort=True)
    ]
    return pd.DataFrame(
        out,
        columns=["lang", "n_docs", "n_concordant", "n_discordant", "tau_b"],
    )


SQL_KENDALL_TAU_BUCKETS = rf"""
WITH t AS (
  SELECT lang, n_chars // {KT_XDIV} AS xb,
         CAST(len(regexp_extract_all(coalesce(text, ''), '\S+'))
              AS BIGINT) // {KT_YDIV} AS yb
  FROM documents),
cells AS (SELECT lang, xb, yb, count(*) AS cnt FROM t GROUP BY lang, xb, yb),
cd AS (
  SELECT a.lang,
         sum(CASE WHEN a.xb < b.xb AND a.yb < b.yb
             THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS c,
         sum(CASE WHEN a.xb < b.xb AND a.yb > b.yb
             THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS d
  FROM cells a JOIN cells b ON a.lang = b.lang
  GROUP BY a.lang),
nx AS (
  SELECT lang, sum(CAST(c AS HUGEINT) * (c - 1) // 2) AS n1
  FROM (SELECT lang, xb, sum(cnt) AS c FROM cells GROUP BY lang, xb)
  GROUP BY lang),
ny AS (
  SELECT lang, sum(CAST(c AS HUGEINT) * (c - 1) // 2) AS n2
  FROM (SELECT lang, yb, sum(cnt) AS c FROM cells GROUP BY lang, yb)
  GROUP BY lang),
nn AS (SELECT lang, count(*) AS n FROM t GROUP BY lang)
SELECT nn.lang, CAST(nn.n AS BIGINT) AS n_docs,
       CAST(cd.c AS BIGINT) AS n_concordant,
       CAST(cd.d AS BIGINT) AS n_discordant,
       CAST(cd.c - cd.d AS DOUBLE)
         / (sqrt(CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) // 2 - nx.n1
                      AS DOUBLE))
            * sqrt(CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) // 2 - ny.n2
                        AS DOUBLE))) AS tau_b
FROM nn
JOIN cd ON cd.lang = nn.lang
JOIN nx ON nx.lang = nn.lang
JOIN ny ON ny.lang = nn.lang
"""


# --- mannwhitney_value ------------------------------------------------------
def mw_hist_partial(batch: pa.Table) -> pa.Table:
    """purchase/view events batch -> (cents, cp, cv) histogram partial."""
    from .queries import _cents

    mask = pc.is_in(
        batch["event_type"], value_set=pa.array(["purchase", "view"])
    )
    t = batch.filter(mask)
    cents = _cents(t["value"])
    isp = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
    tt = pa.table(
        {"cents": cents, "cp": isp, "cv": pc.subtract(1, isp)}
    )
    g = tt.group_by(["cents"]).aggregate([("cp", "sum"), ("cv", "sum")])
    return select_rename(g, cents="cents", cp="cp_sum", cv="cv_sum")


def mw_finalize(hist: pd.DataFrame):
    """cents histogram (cp, cv per value, sorted) -> the shared exact
    integers (n1, n2, U1_x2, tie term) and the tie-corrected z."""
    h = hist.sort_values("cents", ignore_index=True)
    cp = h["cp"].to_numpy().astype(object)
    cv = h["cv"].to_numpy().astype(object)
    t = cp + cv
    cum = np.concatenate(([0], np.cumsum(t)[:-1]))
    r2 = 2 * cum + t + 1  # 2 * average rank per value
    r1_x2 = int(np.sum(cp * r2))
    n1 = int(np.sum(cp))
    n2 = int(np.sum(cv))
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    tie = int(sum(int(x) ** 3 - int(x) for x in t))
    nn = n1 + n2
    var_u = (float(n1) * n2 / 12.0) * (
        (nn + 1) - float(tie) / (nn * (nn - 1))
    )
    z = (float(u1_x2 - n1 * n2) / 2.0) / math.sqrt(var_u)
    return n1, n2, u1_x2, z


def q_mannwhitney_value(sf_dir: str) -> pd.DataFrame:
    """One row: (n_purchase, n_view, u_x2, z_stat)."""
    from .queries import _t

    hist = (
        _t(sf_dir, "events", ["event_type", "value"])
        .map_batches(
            remote_fn(_QS2, "mw_hist_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("cents")
        .aggregate(Sum("cp", alias_name="cp"), Sum("cv", alias_name="cv"))
        .to_pandas()
    )
    assert len(hist) <= CELL_CAP, "cents domain exceeds CELL_CAP"
    n1, n2, u_x2, z = mw_finalize(hist)
    return pd.DataFrame(
        [(n1, n2, u_x2, z)],
        columns=["n_purchase", "n_view", "u_x2", "z_stat"],
    )


SQL_MANNWHITNEY_VALUE = """
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'view')),
h AS (
  SELECT cents,
         count(*) FILTER (WHERE event_type = 'purchase') AS cp,
         count(*) FILTER (WHERE event_type = 'view') AS cv
  FROM c GROUP BY cents),
w AS (
  SELECT cents, cp, cv, cp + cv AS t,
         2 * sum(cp + cv) OVER (ORDER BY cents) - (cp + cv) + 1 AS r2
  FROM h),
s AS (
  SELECT sum(CAST(cp AS HUGEINT)) AS n1, sum(CAST(cv AS HUGEINT)) AS n2,
         sum(CAST(cp AS HUGEINT) * r2) AS r1_x2,
         sum(CAST(t AS HUGEINT) * t * t - t) AS tie
  FROM w),
f AS (
  SELECT n1, n2, r1_x2 - n1 * (n1 + 1) AS u1_x2, tie, n1 + n2 AS nn
  FROM s)
SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_view,
       CAST(u1_x2 AS BIGINT) AS u_x2,
       (CAST(u1_x2 - n1 * n2 AS DOUBLE) / 2.0)
         / sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                * ((nn + 1) - CAST(tie AS DOUBLE) / (nn * (nn - 1))))
         AS z_stat
FROM f
"""


STATS2_QUERIES = {
    "lang_skew_kurtosis": q_lang_skew_kurtosis,
    "welch_t_value": q_welch_t_value,
    "spearman_size_tokens": q_spearman_size_tokens,
    "kendall_tau_buckets": q_kendall_tau_buckets,
    "mannwhitney_value": q_mannwhitney_value,
}
STATS2_ORACLES = {
    "lang_skew_kurtosis": SQL_LANG_SKEW_KURTOSIS,
    "welch_t_value": SQL_WELCH_T_VALUE,
    "spearman_size_tokens": SQL_SPEARMAN_SIZE_TOKENS,
    "kendall_tau_buckets": SQL_KENDALL_TAU_BUCKETS,
    "mannwhitney_value": SQL_MANNWHITNEY_VALUE,
}
