"""Relational-completeness operators — families the registry otherwise
lacked, all static-SQL checked: ordered funnel analysis, INTERSECT /
EXCEPT set operations, grouped Pearson correlation, edit-distance fuzzy
dedup (``fuzzy_prefix_dups``), relational division
(``suppliers_full_brand``: the 'for all' coverage class), a model-eval
confusion matrix (``lang_confusion``), Tukey-fence IQR outlier removal
(``events_iqr_filter``), median absolute deviation (``events_mad``), and
the Gini concentration rank statistic (``spend_gini``: distributed sort +
two-level per-block rank sums). Highlights:

- ``funnel_conversion`` — the ORDERED multi-stage funnel (view ->
  click -> purchase, each stage's first hit must not precede the
  previous stage's): the sequence-pattern class of per-key analysis,
  one step beyond ``sessionize``'s gap-split. One shuffle on user_id
  carries only funnel-type events; per-user work is a vectorized
  three-min pass; stage counts reduce through a <=3-row combiner.
- ``users_intersect`` / ``users_except`` — INTERSECT and EXCEPT
  DISTINCT, completing the set-op family next to
  ``big_or_recent_users``'s UNION DISTINCT (queries_agg.py). Both
  sides come from ONE scan: a per-batch distinct combiner tags each
  user with side-membership bits, one grouped max merges the bits,
  and a filter picks (a AND b) resp. (a AND NOT b) — the shuffle
  carries <= |distinct users| rows per batch, never events.
- ``corr_value_props`` — per-group Pearson correlation (the CORR /
  COVAR aggregate class) between the cents-fixed-point value column
  and the JSON ``k`` property, from EXACT integer sufficient
  statistics (n, sx, sy, sxx, syy, sxy). The merge is plain integer
  sums (commutative + batching-invariant, like
  ``events_value_moments``); the final r is computed driver-side from
  Python arbitrary-precision ints with the SAME int->double->mul->
  sqrt->div step sequence the SQL twin uses, so the float output is
  bit-identical, not merely close.

Scale notes (100 TB):
- the funnel shuffles only the three funnel event types and holds one
  user's events at a time (same hot-user caveat + salting remedy as
  every per-user window operator, see stages/temporal.py);
- the set ops move one row per (batch, distinct user, side) after the
  combiner — bounded by user cardinality, not event count;
- corr's integer second moments need int128 headroom beyond ~10^9
  rows x (10^5 cents)^2 per group; the Arrow partials here are int64
  (exact to ~9.2e18) and the driver-side merge is arbitrary-precision,
  so the overflow boundary is per-BATCH, not per-group — noted, same
  caveat as moments_partial (queries_corpus.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QR = "khl_pdf_ocr_ray.pipelines.queries_rel"

FUNNEL_STAGES = ("view", "click", "purchase")
# Set-op sides: A = users with a big purchase, B = users with a big click.
# Thresholds chosen so INTERSECT and EXCEPT are both non-degenerate at the
# driver's gate scales (sf0.001 and sf0.01).
SET_SIDE_A = ("purchase", 20_000)
SET_SIDE_B = ("click", 15_000)


# --- funnel_conversion ------------------------------------------------------
def funnel_project(batch: pa.Table) -> pa.Table:
    """Keep only funnel-stage events, slimmed to (user_id, event_type, ts)."""
    keep = pc.is_in(batch["event_type"], value_set=pa.array(FUNNEL_STAGES))
    return batch.select(["user_id", "event_type", "ts"]).filter(keep)


def funnel_user_reach(g: pd.DataFrame) -> pd.DataFrame:
    """One user's funnel depth: stage i counts only if its earliest
    occurrence at-or-after stage i-1's chosen time exists (ties allowed,
    matching the SQL twin's ``ts >= prev``)."""
    et = g["event_type"].to_numpy()
    ts = g["ts"].to_numpy()
    reach = 0
    prev = None
    for stage in FUNNEL_STAGES:
        m = et == stage
        if prev is not None:
            m &= ts >= prev
        if not m.any():
            break
        prev = ts[m].min()
        reach += 1
    if reach == 0:
        return pd.DataFrame({"reach": pd.Series([], dtype="int64")})
    return pd.DataFrame({"reach": np.array([reach], dtype="int64")})


def reach_count_partial(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["reach"]).aggregate([("reach", "count")])
    return select_rename(g, reach="reach", n="reach_count")


def q_funnel_conversion(sf_dir: str) -> pd.DataFrame:
    """Users reaching at least each funnel stage, in order."""
    from .queries import _t

    levels = (
        _t(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(
            remote_fn(_QR, "funnel_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .map_groups(remote_fn(_QR, "funnel_user_reach"), batch_format="pandas")
        .map_batches(remote_fn(_QR, "reach_count_partial"), batch_format="pyarrow")
        .groupby("reach")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 3 rows
    )
    by_level = dict(zip(levels["reach"].astype(int), levels["n"].astype(int)))
    n_users = [
        sum(v for k, v in by_level.items() if k >= i)
        for i in range(1, len(FUNNEL_STAGES) + 1)
    ]
    return pd.DataFrame(
        {
            "stage": list(FUNNEL_STAGES),
            "n_users": np.array(n_users, dtype="int64"),
        }
    )


SQL_FUNNEL_CONVERSION = f"""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts >= v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts >= c.t2
  GROUP BY e.user_id
)
SELECT '{FUNNEL_STAGES[0]}' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT '{FUNNEL_STAGES[1]}', CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT '{FUNNEL_STAGES[2]}', CAST(count(*) AS BIGINT) FROM p
"""


# --- users_intersect / users_except -----------------------------------------
def setop_partial(batch: pa.Table) -> pa.Table:
    """Per-batch distinct combiner: one row per user seen in this batch,
    with side-membership bits (a = hit SET_SIDE_A's type+threshold,
    b = hit SET_SIDE_B's)."""
    from .queries import _cents

    et = batch["event_type"]
    cents = _cents(batch["value"])
    in_a = pc.and_(
        pc.equal(et, SET_SIDE_A[0]), pc.greater_equal(cents, SET_SIDE_A[1])
    )
    in_b = pc.and_(
        pc.equal(et, SET_SIDE_B[0]), pc.greater_equal(cents, SET_SIDE_B[1])
    )
    keep = pc.or_(in_a, in_b)
    tagged = pa.table(
        {
            "user_id": batch["user_id"],
            "a": pc.cast(in_a, pa.int64()),
            "b": pc.cast(in_b, pa.int64()),
        }
    ).filter(keep)
    g = tagged.group_by(["user_id"]).aggregate([("a", "max"), ("b", "max")])
    return select_rename(g, user_id="user_id", a="a_max", b="b_max")


def intersect_filter(batch: pa.Table) -> pa.Table:
    keep = pc.and_(pc.equal(batch["a"], 1), pc.equal(batch["b"], 1))
    return pa.table({"user_id": batch.filter(keep)["user_id"]})


def except_filter(batch: pa.Table) -> pa.Table:
    keep = pc.and_(pc.equal(batch["a"], 1), pc.equal(batch["b"], 0))
    return pa.table({"user_id": batch.filter(keep)["user_id"]})


def _setop(sf_dir: str, final: str) -> rd.Dataset:
    from .queries import _t

    return (
        _t(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(
            remote_fn(_QR, "setop_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(Max("a", alias_name="a"), Max("b", alias_name="b"))
        .map_batches(remote_fn(_QR, final), batch_format="pyarrow")
    )


def q_users_intersect(sf_dir: str) -> rd.Dataset:
    """INTERSECT DISTINCT: users who did both sides."""
    return _setop(sf_dir, "intersect_filter")


def q_users_except(sf_dir: str) -> rd.Dataset:
    """EXCEPT DISTINCT: side-A users who never did side B."""
    return _setop(sf_dir, "except_filter")


_SQL_SIDE = (
    "SELECT DISTINCT user_id FROM events WHERE event_type = '{t}' "
    "AND CAST(floor(value*100 + 0.5) AS BIGINT) >= {c}"
)
_SIDE_A_SQL = _SQL_SIDE.format(t=SET_SIDE_A[0], c=SET_SIDE_A[1])
_SIDE_B_SQL = _SQL_SIDE.format(t=SET_SIDE_B[0], c=SET_SIDE_B[1])

SQL_USERS_INTERSECT = f"{_SIDE_A_SQL}\nINTERSECT\n{_SIDE_B_SQL}"

SQL_USERS_EXCEPT = f"{_SIDE_A_SQL}\nEXCEPT\n{_SIDE_B_SQL}"


# --- corr_value_props -------------------------------------------------------
def corr_partial(batch: pa.Table) -> pa.Table:
    """Per-(type, batch) exact integer sufficient statistics for Pearson
    r between cents(value) and the JSON props field k. Same regex
    fast-path caveat as props_k_project (queries_agg.py): exact only for
    flat one-level props objects, which is what the corpus carries."""
    from .queries import _cents

    ex = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)')
    y = pc.cast(pc.struct_field(ex, "k"), pa.int64())
    x = _cents(batch["value"])
    t = pa.table(
        {
            "event_type": batch["event_type"],
            "x": x,
            "y": y,
            "xx": pc.multiply(x, x),
            "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        }
    ).filter(pc.is_valid(y))
    g = t.group_by(["event_type"]).aggregate(
        [
            ("x", "count"),
            ("x", "sum"),
            ("y", "sum"),
            ("xx", "sum"),
            ("yy", "sum"),
            ("xy", "sum"),
        ]
    )
    return select_rename(
        g,
        event_type="event_type",
        n="x_count",
        sx="x_sum",
        sy="y_sum",
        sxx="xx_sum",
        syy="yy_sum",
        sxy="xy_sum",
    )


def corr_from_sums(n: int, sx: int, sy: int, sxx: int, syy: int, sxy: int) -> float:
    """The SQL twin's exact step sequence: int128-exact numerator /
    variance terms, each cast int->double ONCE, then mul, sqrt, div —
    IEEE-deterministic, so both engines emit the same bits. A
    zero-variance group (constant column, or n=1) divides by 0.0, which
    DuckDB defines as NULL -> pandas NaN; mirror that instead of raising."""
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    den = math.sqrt(float(vx) * float(vy))
    if den == 0.0:
        return float("nan")
    return float(num) / den


def q_corr_value_props(sf_dir: str) -> pd.DataFrame:
    """Per-event-type Pearson correlation between value (cents) and the
    JSON props k field."""
    from .queries import _t

    sums = (
        _t(sf_dir, "events", ["event_type", "value", "props"])
        .map_batches(
            remote_fn(_QR, "corr_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()  # <= |event types| rows
    )
    corr = [
        corr_from_sums(
            int(r.n), int(r.sx), int(r.sy), int(r.sxx), int(r.syy), int(r.sxy)
        )
        for r in sums.itertuples()
    ]
    return pd.DataFrame(
        {
            "event_type": sums["event_type"],
            "n": sums["n"].astype("int64"),
            "corr_vk": np.array(corr, dtype="float64"),
        }
    )


SQL_CORR_VALUE_PROPS = """
WITH b AS (
  SELECT event_type,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS x,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
), s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
         CAST(sum(x*y) AS BIGINT) AS sxy
  FROM b GROUP BY event_type
)
SELECT event_type, n,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
         AS corr_vk
FROM s
"""


# --- fuzzy_prefix_dups ------------------------------------------------------
def fuzzy_project(batch: pa.Table) -> pa.Table:
    """Slim blocking projection: (doc_id, lang, length bucket, prefix)."""
    from ..stages.dedup import FUZZY_LEN_BUCKET, FUZZY_PREFIX

    lb = pc.cast(
        pc.floor(pc.divide(pc.cast(batch["n_chars"], pa.float64()), float(FUZZY_LEN_BUCKET))),
        pa.int64(),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "lb": lb,
            "text": pc.utf8_slice_codeunits(batch["text"], 0, FUZZY_PREFIX),
        }
    )


def q_fuzzy_prefix_dups(sf_dir: str) -> rd.Dataset:
    """Edit-distance near-dup pairs: docs in the same (lang, n_chars
    bucket) block whose first-FUZZY_PREFIX-chars Levenshtein distance is
    within FUZZY_MAXDIST — the fuzzy-string-match dedup family (exact,
    MinHash, SimHash, n-gram-Jaccard and embedding cosine live in
    stages/dedup.py + stages/knn.py). One shuffle on the blocking key;
    the quadratic pair DP is vectorized across pairs inside each block
    (stages/dedup.py::levenshtein_pairs)."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
        .map_batches(
            remote_fn(_QR, "fuzzy_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lang", "lb"])
        .map_groups(
            remote_fn("khl_pdf_ocr_ray.stages.dedup", "fuzzy_block_pairs"),
            batch_format="pandas",
        )
    )


def _sql_fuzzy() -> str:
    from ..stages.dedup import FUZZY_LEN_BUCKET, FUZZY_MAXDIST, FUZZY_PREFIX

    lev = (
        f"levenshtein(substr(a.text, 1, {FUZZY_PREFIX}), "
        f"substr(b.text, 1, {FUZZY_PREFIX}))"
    )
    return f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST({lev} AS BIGINT) AS dist
FROM documents a JOIN documents b
  ON a.lang = b.lang
 AND CAST(floor(a.n_chars / {FUZZY_LEN_BUCKET}) AS BIGINT)
     = CAST(floor(b.n_chars / {FUZZY_LEN_BUCKET}) AS BIGINT)
 AND a.doc_id < b.doc_id
WHERE {lev} <= {FUZZY_MAXDIST}
"""


SQL_FUZZY_PREFIX_DUPS = _sql_fuzzy()


# --- events_iqr_filter (outlier removal) ------------------------------------
def cents_project(batch: pa.Table) -> pa.Table:
    from .queries import _cents

    return pa.table(
        {
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "cents": _cents(batch["value"]),
        }
    )


def iqr_hist_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (type, cents) count combiner for the quartile pass —
    the shuffle then carries histogram rows (bounded by the value
    domain x types per block), never raw events."""
    from .queries import _cents

    t = pa.table({"event_type": batch["event_type"], "cents": _cents(batch["value"])})
    g = t.group_by(["event_type", "cents"]).aggregate([("cents", "count")])
    return select_rename(g, event_type="event_type", cents="cents", n="cents_count")


def iqr_bounds_group(g: pd.DataFrame) -> pd.DataFrame:
    """One type's (cents -> count) histogram -> Tukey fence bounds from
    the discrete quartiles (v[ceil(p*n)-1], duckdb quantile_disc), with
    the 1.5*IQR margin kept integer as (3*IQR)//2."""
    import math

    g = g.sort_values("cents")
    total = int(g["n"].sum())
    cum = g["n"].cumsum()
    qs = []
    for p in (25, 75):
        rank = math.ceil(p / 100 * total)
        qs.append(int(g.loc[cum >= rank, "cents"].iloc[0]))
    q1, q3 = qs
    margin = (3 * (q3 - q1)) // 2
    return pd.DataFrame(
        {
            "event_type": [str(g["event_type"].iloc[0])],
            "lo": np.array([q1 - margin], dtype="int64"),
            "hi": np.array([q3 + margin], dtype="int64"),
        }
    )


def iqr_filter_apply(batch: pa.Table, bounds: dict) -> pa.Table:
    """Vectorized apply: dictionary-encode the type column once per batch
    (O(|types|) Python), then one fancy-index per bound — no per-row
    Python in the full-table pass."""
    enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
    types = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy()
    lo = np.array([bounds[t][0] for t in types], dtype="int64")[codes]
    hi = np.array([bounds[t][1] for t in types], dtype="int64")[codes]
    cents = batch["cents"].to_numpy()
    keep = (cents >= lo) & (cents <= hi)
    return batch.filter(pa.array(keep))


def q_events_iqr_filter(sf_dir: str) -> rd.Dataset:
    """Tukey-fence (1.5*IQR) outlier removal per event type — the
    data-cleaning filter of a training pipeline. Distributed quartiles via
    the (type, cents) histogram (shuffle bounded by the value DOMAIN, not
    the row count), |types|-row bounds table broadcast as plain kwargs,
    then a map-only filter pass — the fact table never shuffles."""

    from .queries import _t

    from ray.data.aggregate import Sum as _Sum

    bounds_df = (
        _t(sf_dir, "events", ["event_type", "value"])
        .map_batches(
            remote_fn(_QR, "iqr_hist_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "cents"])
        .aggregate(_Sum("n", alias_name="n"))
        .repartition(2)  # histogram table; non-empty reduce partitions
        .groupby("event_type")
        .map_groups(remote_fn(_QR, "iqr_bounds_group"), batch_format="pandas")
        .to_pandas()  # <= |event types| rows
    )
    bounds = {
        str(r.event_type): (int(r.lo), int(r.hi)) for r in bounds_df.itertuples()
    }
    return (
        _t(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(
            remote_fn(_QR, "cents_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(
            remote_fn(_QR, "iqr_filter_apply", bounds=bounds),
            batch_format="pyarrow",
        )
    )


SQL_EVENTS_IQR_FILTER = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
), q AS (
  SELECT event_type,
         quantile_disc(cents, 0.25) AS q1,
         quantile_disc(cents, 0.75) AS q3
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type, c.cents
FROM c JOIN q USING (event_type)
WHERE c.cents >= q.q1 - (3*(q.q3 - q.q1))//2
  AND c.cents <= q.q3 + (3*(q.q3 - q.q1))//2
"""


# --- suppliers_full_brand (relational division) ------------------------------
DIV_BRAND = "Brand#6"


def supp_part_distinct(batch: pa.Table, part_keys: list) -> pa.Table:
    """Per-batch distinct (suppkey, partkey) pairs restricted to the
    brand's part set (dimension-bounded, shipped as a plain kwarg list —
    at an unbounded dividend use a hash join instead)."""
    keep = pc.is_in(batch["l_partkey"], value_set=pa.array(part_keys, pa.int64()))
    t = batch.filter(keep).select(["l_suppkey", "l_partkey"])
    g = t.group_by(["l_suppkey", "l_partkey"]).aggregate([("l_partkey", "count")])
    return g.select(["l_suppkey", "l_partkey"])


def part_project(batch: pa.Table) -> pa.Table:
    return pa.table({"l_partkey": batch["l_partkey"]})


def div_finalize(batch: pa.Table, n_total: int) -> pa.Table:
    return pa.table(
        {
            "suppkey": batch["l_suppkey"],
            "n_parts": batch["n_parts"],
            "is_full": pc.equal(batch["n_parts"], n_total),
        }
    )


def q_suppliers_full_brand(sf_dir: str) -> rd.Dataset:
    """Relational division (the 'for all' query class): per supplier, how
    many of DIV_BRAND's shipped part varieties they have shipped, and
    whether they cover ALL of them. Plan: brand part list broadcast ->
    per-batch distinct (supp, part) combiner -> one grouped dedup ->
    per-supplier count; the divisor cardinality is a tiny second aggregate
    over the same deduped table. Shuffles bounded by |supps| x |brand
    parts|, never lineitem rows."""
    import os as _os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Count as _Count

    from .queries import _t

    part_keys = (
        pq.read_table(
            _os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
        )
        .filter(pc.equal(pc.field("p_brand"), DIV_BRAND))["p_partkey"]
        .to_pylist()
    )
    dist = (
        _t(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
        .map_batches(
            remote_fn(_QR, "supp_part_distinct", part_keys=part_keys),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(_Count(alias_name="_c"))
        # materialized: BOTH consumers (divisor count + per-supplier count)
        # read this <= |supps| x |brand parts|-row table, so the lineitem
        # scan + dedup shuffle run once, not twice
        .materialize()
    )
    n_total = (
        dist.map_batches(remote_fn(_QR, "part_project"), batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(_Count(alias_name="_c"))
        .count()
    )
    return (
        dist.groupby("l_suppkey")
        .aggregate(_Count(alias_name="n_parts"))
        .map_batches(
            remote_fn(_QR, "div_finalize", n_total=int(n_total)),
            batch_format="pyarrow",
        )
    )


SQL_SUPPLIERS_FULL_BRAND = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{DIV_BRAND}'),
shipped AS (
  SELECT DISTINCT l_suppkey, l_partkey
  FROM lineitem JOIN bp ON l_partkey = p_partkey
),
tot AS (SELECT count(DISTINCT l_partkey) AS n FROM shipped)
SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n_parts,
       count(*) = (SELECT n FROM tot) AS is_full
FROM shipped GROUP BY l_suppkey
"""


# --- events_mad (median absolute deviation, robust scale) --------------------
def median_from_hist(g: pd.DataFrame, val_col: str) -> int:
    """quantile_disc(x, 0.5) from a (value -> count) histogram:
    v[ceil(n/2) - 1] of the sorted values (the repo-wide convention)."""
    import math

    g = g.sort_values(val_col)
    total = int(g["n"].sum())
    rank = math.ceil(total / 2)
    cum = g["n"].cumsum()
    return int(g.loc[cum >= rank, val_col].iloc[0])


def mad_dev_hist_partial(batch: pa.Table, medians: dict) -> pa.Table:
    """Pass-2 combiner: per-batch histogram of |cents - median(type)|,
    medians broadcast as plain kwargs."""
    from .queries import _cents

    enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
    types = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy()
    med = np.array([medians[t] for t in types], dtype="int64")[codes]
    dev = np.abs(_cents(batch["value"]).to_numpy() - med)
    t = pa.table({"event_type": batch["event_type"], "dev": pa.array(dev, pa.int64())})
    g = t.group_by(["event_type", "dev"]).aggregate([("dev", "count")])
    return select_rename(g, event_type="event_type", dev="dev", n="dev_count")


def q_events_mad(sf_dir: str) -> pd.DataFrame:
    """Median absolute deviation of value per event type — the robust
    scale statistic next to events_iqr_filter's robust range. Two
    histogram passes (value domain-bounded shuffles, same plan as the IQR
    quartiles), medians broadcast between them; the fact table never
    shuffles."""
    from ray.data.aggregate import Sum as _Sum

    from .queries import _t

    def _hist(kernel: str, **kw) -> pd.DataFrame:
        val = "cents" if kernel == "iqr_hist_partial" else "dev"
        return (
            _t(sf_dir, "events", ["event_type", "value"])
            .map_batches(
                remote_fn(_QR, kernel, **kw),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby(["event_type", val])
            .aggregate(_Sum("n", alias_name="n"))
            .to_pandas()  # <= |types| x |distinct values| rows
        )

    h1 = _hist("iqr_hist_partial")
    medians = {
        str(t): median_from_hist(g, "cents") for t, g in h1.groupby("event_type")
    }
    h2 = _hist("mad_dev_hist_partial", medians=medians)
    rows = sorted(
        (t, medians[str(t)], median_from_hist(g, "dev"))
        for t, g in h2.groupby("event_type")
    )
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "median_cents": np.array([r[1] for r in rows], dtype="int64"),
            "mad_cents": np.array([r[2] for r in rows], dtype="int64"),
        }
    )


SQL_EVENTS_MAD = """
WITH c AS (
  SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
), m AS (
  SELECT event_type, quantile_disc(cents, 0.5) AS med
  FROM c GROUP BY event_type
)
SELECT c.event_type,
       CAST(any_value(m.med) AS BIGINT) AS median_cents,
       CAST(quantile_disc(abs(c.cents - m.med), 0.5) AS BIGINT) AS mad_cents
FROM c JOIN m USING (event_type)
GROUP BY c.event_type
"""


# --- spend_gini (rank statistic over a distributed sort) ---------------------
def spend_sum_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-user cents-sum combiner (same as queries_agg's spend
    side: one row per user per batch, never per event)."""
    from .queries import _cents

    t = pa.table({"user_id": batch["user_id"], "cents": _cents(batch["value"])})
    g = t.group_by(["user_id"]).aggregate([("cents", "sum")])
    return select_rename(g, user_id="user_id", spend="cents_sum")


def gini_block_partial(batch: pa.Table) -> pa.Table:
    """One SORTED block -> (count, sum s, sum local_rank*s, block-order
    key). Local ranks are 1..len; the driver shifts each block's rank-sum
    by its global offset: sum((off+i)*s) = rs_local + off*tot — the same
    two-level prefix-sum trick pack_sequences uses, so no single task ever
    enumerates the whole sorted table."""
    s = batch["spend"].to_numpy()
    i = np.arange(1, len(s) + 1, dtype="int64")
    return pa.table(
        {
            "cnt": pa.array([len(s)], pa.int64()),
            "tot": pa.array([int(s.sum())], pa.int64()),
            "rs_local": pa.array([int((i * s).sum())], pa.int64()),
            "min_spend": pa.array([int(s[0])], pa.int64()),
            "min_user": pa.array([int(batch["user_id"][0].as_py())], pa.int64()),
        }
    )


def gini_from_partials(parts: pd.DataFrame) -> tuple:
    """Combine block partials (any arrival order; blocks reorder by their
    range-partition minimum) into (n_users, gini). Python ints keep the
    numerator exact; ONE int->double cast per operand then one division —
    the SQL twin's exact expression shape, so the float hashes identical.
    Ties in spend cannot change sum(rank*s) (equal values swap freely)."""
    parts = parts.sort_values(["min_spend", "min_user"]).reset_index(drop=True)
    n = int(parts["cnt"].sum())
    tot = int(parts["tot"].sum())
    off = 0
    rs = 0
    for r in parts.itertuples():
        rs += int(r.rs_local) + off * int(r.tot)
        off += int(r.cnt)
    num = 2 * rs - (n + 1) * tot
    den = n * tot
    return n, float(num) / float(den)


def q_spend_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-user spend — the inequality/concentration
    rank statistic (data-curation diagnostics: how skewed is the
    contribution distribution). Combiner -> per-user sum -> DISTRIBUTED
    sort by (spend, user) -> per-block local rank-sums -> tiny driver
    combine; no task holds more than one sorted block."""
    from ray.data.aggregate import Sum as _Sum

    from .queries import _t

    parts = (
        _t(sf_dir, "events", ["user_id", "value"])
        .map_batches(
            remote_fn(_QR, "spend_sum_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("user_id")
        .aggregate(_Sum("spend", alias_name="spend"))
        .sort(["spend", "user_id"])
        .map_batches(remote_fn(_QR, "gini_block_partial"), batch_format="pyarrow")
        .to_pandas()  # one row per sorted block
    )
    n, gini = gini_from_partials(parts)
    return pd.DataFrame({"n_users": np.array([n], dtype="int64"), "gini": [gini]})


SQL_SPEND_GINI = """
WITH c AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents FROM events
), sp AS (
  SELECT user_id, CAST(sum(cents) AS BIGINT) AS s FROM c GROUP BY user_id
), r AS (
  SELECT s, CAST(row_number() OVER (ORDER BY s, user_id) AS BIGINT) AS rk
  FROM sp
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS tot,
         CAST(sum(rk * s) AS BIGINT) AS rs
  FROM r
)
SELECT n AS n_users,
       CAST(2*rs - (n + 1)*tot AS DOUBLE) / CAST(n*tot AS DOUBLE) AS gini
FROM agg
"""


# --- lang_confusion (model-eval aggregation) --------------------------------
def q_lang_confusion(sf_dir: str) -> rd.Dataset:
    """Confusion matrix of the declared ``lang`` column vs the stopword
    lang-ID predictor (stages/textqc.py) — the model-evaluation aggregate
    of a training-data pipeline (precision/recall per class are driver-
    side ratios of these counts). Map-side combiner bounds the shuffle at
    (|langs|+1)^2 rows per block."""
    from ray.data.aggregate import Sum as _Sum

    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "text", "lang"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.stages.textqc", "lang_confusion_partial"),
            batch_format="pyarrow",
        )
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby(["lang", "pred_lang"])
        .aggregate(_Sum("n", alias_name="n"))
    )


def _sql_lang_confusion() -> str:
    from ..stages.textqc import sql_lang_id

    return f"""
SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN ({sql_lang_id()}) p USING (doc_id)
GROUP BY 1, 2
"""


# --- skew_join_events (hot-key-aware join) ------------------------------------
SKEW_HOT_THRESHOLD = 1000  # events per user above which the key is "hot"


def skew_plant_batch(batch: pa.Table) -> pa.Table:
    """Plant key skew (synthesize-on-read convention): every even
    event_id re-attributes to user 0, making it hold ~half the stream."""
    import pyarrow.compute as pc

    even = pc.equal(pc.bit_wise_and(batch["event_id"], 1), 0)
    return pa.table(
        {
            "event_id": batch["event_id"],
            "user_id": pc.if_else(even, pa.scalar(0, pa.int64()), batch["user_id"]),
        }
    )


def skew_dim_partial(batch: pa.Table) -> pa.Table:
    """Per-batch distinct users of the planted stream (dim combiner)."""
    g = batch.select(["user_id"]).group_by(["user_id"]).aggregate([])
    return g.rename_columns(["u_r"])


def skew_dim_seg(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return pa.table(
        {
            "u_r": batch["u_r"],
            "seg": pc.cast(
                pc.subtract(
                    batch["u_r"], pc.multiply(pc.divide(batch["u_r"], 5), 5)
                ),
                pa.int64(),
            ),
        }
    )


def q_skew_join_events(sf_dir: str) -> rd.Dataset:
    """Hot-key-aware dimension join: the planted-skew event stream (user 0
    holds ~50% of rows) joins a per-user dimension through joins.skew_join
    — the hot key's rows NEVER enter the shuffle (its dimension slice
    broadcasts into a map-only stage); only the cold remainder hash-joins.
    Without the split, one shuffle partition would hold half the corpus —
    the straggler the brief's "salt hot keys" guards against."""
    import pyarrow as _pa

    from ..joins import skew_join
    from .queries import _t

    ev = _t(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        remote_fn(_QR, "skew_plant_batch"), batch_format="pyarrow"
    )
    dim = (
        ev.map_batches(remote_fn(_QR, "skew_dim_partial"), batch_format="pyarrow")
        .groupby("u_r")
        .aggregate(Count(alias_name="n_"))
        .select_columns(["u_r"])
        .map_batches(remote_fn(_QR, "skew_dim_seg"), batch_format="pyarrow")
    )
    out_schema = _pa.schema(
        [("event_id", _pa.int64()), ("user_id", _pa.int64()), ("seg", _pa.int64())]
    )
    joined = skew_join(
        ev,
        dim,
        key="user_id",
        right_key="u_r",
        out_schema=out_schema,
        hot_count_threshold=SKEW_HOT_THRESHOLD,
    )
    assert joined is not None  # events is never empty
    return joined


SQL_SKEW_JOIN_EVENTS = """
WITH ev AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS user_id
  FROM events),
dim AS (SELECT DISTINCT user_id AS u_r, user_id % 5 AS seg FROM ev)
SELECT ev.event_id, ev.user_id, CAST(dim.seg AS BIGINT) AS seg
FROM ev JOIN dim ON ev.user_id = dim.u_r
"""


def skew_tag_dim_batch(batch: pa.Table) -> pa.Table:
    """Distinct users -> the TWO-SIDED-skew build side: the hot user
    (user 0, ~half the probe stream) carries THREE build rows (tags
    0,1,2) where every cold user carries one (tag = u % 3) — the
    build-side slice of the hot key is itself the largest, the regime
    skew_join's broadcast path documents as out of scope."""
    import numpy as np
    import pyarrow.compute as pc

    u = batch["u_r"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_rep = np.where(u == 0, 3, 1)
    idx = np.repeat(np.arange(len(u), dtype=np.int64), n_rep)
    rep_u = u[idx]
    # per-copy tag: cumulative position within each key's run
    starts = np.repeat(np.cumsum(n_rep) - n_rep, n_rep)
    copy_i = np.arange(len(idx), dtype=np.int64) - starts
    tag = np.where(rep_u == 0, copy_i, rep_u % 3)
    return pa.table(
        {
            "u_r": pa.array(rep_u),
            "tag": pa.array(tag.astype(np.int64)),
        }
    )


def q_skew_join_salted(sf_dir: str) -> rd.Dataset:
    """Two-sided-skew join through joins.salted_skew_join: the planted
    stream's hot user (~50% of probe rows) ALSO holds the largest build
    slice, so its probe rows are salted over sub-keys and its build rows
    replicated once per salt — one (key, salt) hash join, no broadcast;
    no shuffle partition holds the hot key's full probe row set."""
    import pyarrow as _pa

    from ..joins import salted_skew_join
    from .queries import _t

    ev = _t(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        remote_fn(_QR, "skew_plant_batch"), batch_format="pyarrow"
    )
    dim = (
        ev.map_batches(remote_fn(_QR, "skew_dim_partial"), batch_format="pyarrow")
        .groupby("u_r")
        .aggregate(Count(alias_name="n_"))
        .select_columns(["u_r"])
        .map_batches(remote_fn(_QR, "skew_tag_dim_batch"), batch_format="pyarrow")
    )
    out_schema = _pa.schema(
        [("event_id", _pa.int64()), ("user_id", _pa.int64()), ("tag", _pa.int64())]
    )
    joined = salted_skew_join(
        ev,
        dim,
        key="user_id",
        right_key="u_r",
        out_schema=out_schema,
        hot_count_threshold=SKEW_HOT_THRESHOLD,
        n_salt=8,
    )
    assert joined is not None  # events is never empty
    return joined


SQL_SKEW_JOIN_SALTED = """
WITH ev AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS user_id
  FROM events),
u AS (SELECT DISTINCT user_id AS u_r FROM ev),
dim AS (
  SELECT u_r, CAST(t.t AS BIGINT) AS tag
  FROM u, unnest([0, 1, 2]) AS t(t) WHERE u_r = 0
  UNION ALL
  SELECT u_r, CAST(u_r % 3 AS BIGINT) AS tag FROM u WHERE u_r <> 0)
SELECT ev.event_id, ev.user_id, dim.tag
FROM ev JOIN dim ON ev.user_id = dim.u_r
"""


REL_QUERIES = {
    "skew_join_events": q_skew_join_events,
    "skew_join_salted": q_skew_join_salted,
    "fuzzy_prefix_dups": q_fuzzy_prefix_dups,
    "lang_confusion": q_lang_confusion,
    "events_iqr_filter": q_events_iqr_filter,
    "suppliers_full_brand": q_suppliers_full_brand,
    "spend_gini": q_spend_gini,
    "events_mad": q_events_mad,
    "funnel_conversion": q_funnel_conversion,
    "users_intersect": q_users_intersect,
    "users_except": q_users_except,
    "corr_value_props": q_corr_value_props,
}

REL_ORACLES = {
    "skew_join_events": SQL_SKEW_JOIN_EVENTS,
    "skew_join_salted": SQL_SKEW_JOIN_SALTED,
    "fuzzy_prefix_dups": SQL_FUZZY_PREFIX_DUPS,
    "lang_confusion": _sql_lang_confusion(),
    "events_iqr_filter": SQL_EVENTS_IQR_FILTER,
    "suppliers_full_brand": SQL_SUPPLIERS_FULL_BRAND,
    "spend_gini": SQL_SPEND_GINI,
    "events_mad": SQL_EVENTS_MAD,
    "funnel_conversion": SQL_FUNNEL_CONVERSION,
    "users_intersect": SQL_USERS_INTERSECT,
    "users_except": SQL_USERS_EXCEPT,
    "corr_value_props": SQL_CORR_VALUE_PROPS,
}
