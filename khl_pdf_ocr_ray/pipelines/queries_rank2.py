"""Zipf rank-frequency fit, global percent_rank/cume_dist, and the
correlated-subquery decorrelation shape.

- ``zipf_fit`` — fit ln(freq) = slope * ln(rank) + intercept over the
  top ZIPF_TOPN whitespace tokens (corpus-wide counts, rank by
  (count DESC, term)). The regression runs on QUANTIZED inputs
  (floor(ln * 2^20), the embedding_isotropy convention — libm ln is
  identical across both engines here) so the OLS closed form is pure
  integer: slope_x1e6 = trunc((n*Sab - Sa*Sb) * 1e6 / (n*Saa - Sa^2)),
  with TRUNCATING division on both sides (DuckDB ``//`` truncates
  toward zero; the Python helper mirrors that, NOT floor-div).
  Plan: term-count combiner -> ONE term-keyed Sum exchange -> per-block
  partial top-N -> driver merge of <= N x blocks candidate rows.
- ``doc_percent_rank`` — percent_rank and cume_dist of every doc by
  n_chars, in exact ppm integers: pct_rank_ppm = (rank_min - 1) * 1e6
  // (n - 1), cume_ppm = cum_le * 1e6 // n (all operands non-negative,
  so floor == trunc). NO global sort: the doc_size_dense_rank plan —
  distinct-size histogram (one bounded exchange), driver walk over the
  domain-bounded histogram, broadcast searchsorted annotate.
- ``orders_above_avg`` — the classic correlated aggregate subquery
  (orders priced above their customer's average), decorrelated: the
  per-customer (count, cents sum) combiner runs first, broadcast as
  sorted arrays, and the comparison is the INTEGER cross-multiply
  cents * cnt > sum (no float average anywhere); rolled up per market
  segment (segment map broadcast from the customer dimension).

Oracles: static SQL (same integer arithmetic; the Zipf twin quantizes
with the same floor(ln * 2^20)).

Reference analogue: none in /root/reference/app.py; brief scope
(corpus statistics / relational-coverage families).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QR2 = "khl_pdf_ocr_ray.pipelines.queries_rank2"

ZIPF_TOPN = 200
_LN_SCALE = 1 << 20
_RE_TOKEN = r"\S+"


def trunc_div(a: int, b: int) -> int:
    """Truncating integer division (DuckDB ``//`` semantics; Python
    ``//`` floors, which differs on negative quotients)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# --- zipf_fit ---------------------------------------------------------------
def zipf_term_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> per-batch (term, cnt) whitespace-token counts."""
    toks = pc.split_pattern_regex(
        pc.fill_null(batch["text"], ""), pattern=r"\s+"
    )
    # \S+ tokens == split on whitespace with empties dropped; Arrow has
    # no direct extract_all-to-flat, so explode the split lists and
    # drop empty strings (leading/trailing whitespace artifacts).
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.not_equal(flat, ""))
    g = pa.table({"term": flat}).group_by(["term"]).aggregate(
        [([], "count_all")]
    )
    return pa.table({"term": g["term"], "cnt": g["count_all"]})


def zipf_topn_partial(batch: pa.Table) -> pa.Table:
    """(term, cnt) rows -> per-block top-N candidates by
    (cnt DESC, term ASC) (merge-safe partial: the global top-N is a
    subset of the union of per-block top-Ns)."""
    df = batch.to_pandas()
    df = df.sort_values(
        ["cnt", "term"], ascending=[False, True], ignore_index=True
    ).head(ZIPF_TOPN)
    return pa.Table.from_pandas(df, preserve_index=False)


def zipf_fit_from_top(top: pd.DataFrame) -> pd.DataFrame:
    """THE shared finalize: top-N (term, cnt) rows (already globally
    merged) -> one (n_terms, slope_x1e6, intercept_x1e6) row via the
    integer OLS closed form over quantized ln values."""
    top = top.sort_values(
        ["cnt", "term"], ascending=[False, True], ignore_index=True
    ).head(ZIPF_TOPN)
    rank = np.arange(1, len(top) + 1)
    a = np.floor(np.log(rank.astype(np.float64)) * _LN_SCALE).astype(np.int64)
    b = np.floor(
        np.log(top["cnt"].to_numpy().astype(np.float64)) * _LN_SCALE
    ).astype(np.int64)
    n = len(top)
    sa, sb = int(a.sum()), int(b.sum())
    saa = int((a.astype(object) * a).sum())
    sab = int((a.astype(object) * b).sum())
    num = n * sab - sa * sb
    den = n * saa - sa * sa
    slope = trunc_div(num * 1_000_000, den)
    # slope is a ratio of quantized values (the 2^20 cancels); the
    # intercept lives in quantized-ln units, so divide the scale out
    intercept = trunc_div(
        (sb * den - num * sa) * 1_000_000, n * den * _LN_SCALE
    )
    return pd.DataFrame(
        [(n, slope, intercept)],
        columns=["n_terms", "slope_x1e6", "intercept_x1e6"],
    ).astype("int64")


def q_zipf_fit(sf_dir: str) -> pd.DataFrame:
    """One row: (n_terms, slope_x1e6, intercept_x1e6)."""
    from .queries import _t

    top = (
        _t(sf_dir, "documents", ["text"])
        .map_batches(
            remote_fn(_QR2, "zipf_term_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            remote_fn(_QR2, "zipf_topn_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    return zipf_fit_from_top(top)


SQL_ZIPF_FIT = rf"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS term
  FROM documents),
cnt AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
top AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank
  FROM cnt ORDER BY cnt DESC, term LIMIT {ZIPF_TOPN}),
q AS (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * {_LN_SCALE}) AS HUGEINT) AS a,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * {_LN_SCALE}) AS HUGEINT) AS b
  FROM top),
s AS (
  SELECT count(*) AS n, sum(a) AS sa, sum(b) AS sb,
         sum(a * a) AS saa, sum(a * b) AS sab
  FROM q),
f AS (
  SELECT n, n * sab - sa * sb AS num, n * saa - sa * sa AS den, sa, sb
  FROM s)
SELECT CAST(n AS BIGINT) AS n_terms,
       CAST(num * 1000000 // den AS BIGINT) AS slope_x1e6,
       CAST((sb * den - num * sa) * 1000000 // (n * den * {_LN_SCALE})
            AS BIGINT) AS intercept_x1e6
FROM f
"""


# --- doc_percent_rank -------------------------------------------------------
def size_hist_partial(batch: pa.Table) -> pa.Table:
    g = (
        pa.table({"size": batch["n_chars"]})
        .group_by(["size"])
        .aggregate([([], "count_all")])
    )
    return pa.table({"size": g["size"], "cnt": g["count_all"]})


def pct_rank_annotate(batch: pa.Table, hist_ref) -> pa.Table:
    """documents batch + broadcast (sorted sizes, rank_min, cum_le,
    n_total) -> (doc_id, n_chars, pct_rank_ppm, cume_ppm)."""
    import ray

    sizes, rank_min, cum_le, n = (
        ray.get(hist_ref) if not isinstance(hist_ref, tuple) else hist_ref
    )
    x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(sizes, x)
    pr = (rank_min[pos] - 1) * 1_000_000 // max(n - 1, 1)
    cd = cum_le[pos] * 1_000_000 // n
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
            "pct_rank_ppm": pa.array(pr, pa.int64()),
            "cume_ppm": pa.array(cd, pa.int64()),
        }
    )


def q_doc_percent_rank(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars, pct_rank_ppm, cume_ppm) for every doc."""
    import ray

    from .queries import _t

    hist = (
        _t(sf_dir, "documents", ["n_chars"])
        .map_batches(
            remote_fn(_QR2, "size_hist_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("size")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("size", ignore_index=True)
    )
    sizes = hist["size"].to_numpy().astype(np.int64)
    cnts = hist["cnt"].to_numpy().astype(np.int64)
    cum = np.cumsum(cnts)
    rank_min = np.concatenate(([0], cum[:-1])) + 1
    n = int(cum[-1])
    ref = ray.put((sizes, rank_min, cum, n))
    return _t(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        remote_fn(_QR2, "pct_rank_annotate", hist_ref=ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_DOC_PERCENT_RANK = """
WITH n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, n_chars,
       CAST((rank() OVER (ORDER BY n_chars) - 1) * 1000000
            // greatest(n.n - 1, 1) AS BIGINT) AS pct_rank_ppm,
       CAST(count(*) OVER (ORDER BY n_chars RANGE UNBOUNDED PRECEDING)
            * 1000000 // n.n AS BIGINT) AS cume_ppm
FROM documents, n
"""


# --- orders_above_avg -------------------------------------------------------
def cust_sum_partial(batch: pa.Table) -> pa.Table:
    """orders batch -> per-batch (custkey, cnt, cents sum)."""
    from .queries import _cents

    cents = _cents(batch["o_totalprice"])
    t = pa.table({"custkey": batch["o_custkey"], "cents": cents})
    g = t.group_by(["custkey"]).aggregate(
        [("cents", "count"), ("cents", "sum")]
    )
    return select_rename(g, custkey="custkey", cnt="cents_count", s="cents_sum")


def above_avg_partial(batch: pa.Table, stats_ref, seg_ref) -> pa.Table:
    """orders batch + broadcast per-customer (cnt, sum) and segment map
    -> per-(segment, batch) (n_orders, n_above) partials."""
    import ray

    from .queries import _cents

    keys, cnt, s = (
        ray.get(stats_ref) if not isinstance(stats_ref, tuple) else stats_ref
    )
    ckeys, segs = (
        ray.get(seg_ref) if not isinstance(seg_ref, tuple) else seg_ref
    )
    ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
    pos = np.searchsorted(keys, ck)
    above = (cents * cnt[pos] > s[pos]).astype(np.int64)
    spos = np.searchsorted(ckeys, ck)
    t = pa.table(
        {
            "segment": pa.array(segs[spos]),
            "one": pa.array(np.ones(len(ck), np.int64)),
            "above": pa.array(above, pa.int64()),
        }
    )
    g = t.group_by(["segment"]).aggregate([("one", "sum"), ("above", "sum")])
    return select_rename(
        g, segment="segment", n_orders="one_sum", n_above="above_sum"
    )


def q_orders_above_avg(sf_dir: str) -> rd.Dataset:
    """(segment, n_orders, n_above): orders strictly above their own
    customer's average order value, per market segment."""
    import ray

    from .queries import _t

    stats = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            remote_fn(_QR2, "cust_sum_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("custkey")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("s", alias_name="s"))
        .to_pandas()
        .sort_values("custkey", ignore_index=True)
    )
    cust = (
        _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    stats_ref = ray.put(
        (
            stats["custkey"].to_numpy().astype(np.int64),
            stats["cnt"].to_numpy().astype(np.int64),
            stats["s"].to_numpy().astype(np.int64),
        )
    )
    seg_ref = ray.put(
        (
            cust["c_custkey"].to_numpy().astype(np.int64),
            cust["c_mktsegment"].to_numpy(),
        )
    )
    return (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            remote_fn(
                _QR2,
                "above_avg_partial",
                stats_ref=stats_ref,
                seg_ref=seg_ref,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("segment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_above", alias_name="n_above"),
        )
    )


SQL_ORDERS_ABOVE_AVG = """
WITH o AS (
  SELECT o_custkey AS custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
cs AS (SELECT custkey, count(*) AS cnt, sum(cents) AS s
       FROM o GROUP BY custkey)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN o.cents * cs.cnt > cs.s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above
FROM o
JOIN cs ON cs.custkey = o.custkey
JOIN customer c ON c.c_custkey = o.custkey
GROUP BY c.c_mktsegment
"""


# --- hill_tail_index --------------------------------------------------------
HILL_K = 100


def hill_top_partial(batch: pa.Table) -> pa.Table:
    """documents batch -> per-block top-(K+1) sizes (merge-safe: the
    global top-(K+1) VALUE MULTISET is a subset of the union)."""
    x = np.sort(
        batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    )[::-1][: HILL_K + 1]
    return pa.table({"x": pa.array(x, pa.int64())})


def hill_from_top(top: np.ndarray):
    """THE shared finalize: the K+1 largest sizes -> the Hill estimate
    alpha_x1e6 = K * 2^20 * 1e6 // sum(q_i - q_threshold) over the K
    exceedances, with q = floor(ln(x) * 2^20)."""
    x = np.sort(top)[::-1][: HILL_K + 1]
    q = np.floor(np.log(x.astype(np.float64)) * _LN_SCALE).astype(np.int64)
    qk = int(q[HILL_K])
    s = int(q[:HILL_K].astype(object).sum()) - HILL_K * qk
    assert s > 0, "degenerate tail: top sizes all equal"
    return int(x[HILL_K]), (HILL_K * _LN_SCALE * 1_000_000) // s


def q_hill_tail_index(sf_dir: str) -> pd.DataFrame:
    """One row: (k, threshold, alpha_x1e6) — the Hill heavy-tail index
    of the doc-size distribution over the K largest exceedances (the
    skew diagnostic behind byte-size-aware repartitioning budgets)."""
    from .queries import _t

    top = (
        _t(sf_dir, "documents", ["n_chars"])
        .map_batches(
            remote_fn(_QR2, "hill_top_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()["x"]
        .to_numpy()
        .astype(np.int64)
    )
    thr, alpha = hill_from_top(top)
    return pd.DataFrame(
        [(HILL_K, thr, alpha)],
        columns=["k", "threshold", "alpha_x1e6"],
    ).astype("int64")


SQL_HILL_TAIL_INDEX = f"""
WITH top AS (
  SELECT n_chars AS x,
         row_number() OVER (ORDER BY n_chars DESC) AS rn
  FROM documents ORDER BY n_chars DESC LIMIT {HILL_K + 1}),
q AS (
  SELECT rn, x,
         CAST(floor(ln(CAST(x AS DOUBLE)) * {_LN_SCALE}) AS HUGEINT) AS q
  FROM top),
base AS (SELECT x AS xk, q AS qk FROM q WHERE rn = {HILL_K + 1}),
s AS (SELECT sum(q.q - base.qk) AS s FROM q, base WHERE q.rn <= {HILL_K})
SELECT CAST({HILL_K} AS BIGINT) AS k,
       CAST(base.xk AS BIGINT) AS threshold,
       CAST(CAST({HILL_K} AS HUGEINT) * {_LN_SCALE} * 1000000 // s.s
            AS BIGINT) AS alpha_x1e6
FROM base, s
"""


RANK2_QUERIES = {
    "zipf_fit": q_zipf_fit,
    "doc_percent_rank": q_doc_percent_rank,
    "orders_above_avg": q_orders_above_avg,
    "hill_tail_index": q_hill_tail_index,
}
RANK2_ORACLES = {
    "zipf_fit": SQL_ZIPF_FIT,
    "doc_percent_rank": SQL_DOC_PERCENT_RANK,
    "orders_above_avg": SQL_ORDERS_ABOVE_AVG,
    "hill_tail_index": SQL_HILL_TAIL_INDEX,
}
