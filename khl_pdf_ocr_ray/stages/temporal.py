"""(user, day)-bucketed temporal operators: sessionize, as-of join,
range (interval) join.

The naive plans shuffle on ``user_id`` alone and hold ONE USER'S ENTIRE
HISTORY in one task — a memory/straggler wall when a bot account has
billions of events. These implementations key every shuffle on a coarse
SHARD of ``(user_id, day)``: a task receives many complete user-day
buckets (never a partial one, and never more than one day of one user
per bucket), and processes them with fully VECTORIZED pandas kernels —
``merge_asof(by=[user, day])``, groupby-agg, cumcount — one C call per
task instead of one Python call per bucket (the per-bucket ``map_groups``
formulation costs a Python roundtrip per user-day: ~450k calls at sf0.1).

Cross-day semantics are stitched back over per-day SUMMARY rows (one row
per active (user, day) — bounded by days, not events):

- range join (bounded 1h window): views within 1h of a day's end are
  REPLICATED into the next day's bucket (boundary-overlap replication),
  making every per-bucket sweep self-contained — results are exact.
- as-of join (unbounded lookback): purchases matched within their own
  day; unmatched ones fall back to a per-user backward ``merge_asof``
  over per-day last-view summaries (tiny), joined back by (user, day).
- sessionize: per-day event/break counts + first/last timestamps; a
  per-user pass over the day summaries merges sessions that span
  midnight.

All outputs are row-identical to the single-group-per-user formulations
(the pandas twins in pipelines/queries.py remain as the oracle the
planted hot-user tests compare against).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US_PER_DAY = 86_400_000_000
SESSION_GAP_S = 1800          # matches pipelines.queries.SESSION_GAP_S
RANGE_WINDOW_S = 3600         # matches pipelines.queries.RANGE_WINDOW_S
DEFAULT_SHARDS = 64           # (user, day) buckets per shard task; queries
                              # derive the real count from input bytes
_T = "khl_pdf_ocr_ray.stages.temporal"

_MULT_U = 2654435761          # Knuth multiplicative constants for the
_MULT_D = 40503               # (user, day) -> shard hash


def _rfn(attr: str, **kw):
    from ..remote import remote_fn

    return remote_fn(_T, attr, **kw)


def _shard_key(user_id, day, num_shards: int):
    """(user, day) -> shard in [0, num_shards), with the negative branch
    normalized: pc.multiply WRAPS on int64 overflow (user_id >= ~3.5e9 x
    the Knuth constant), so mix can go negative — base and carried rows
    must use THIS same normalization or the two halves of one bucket land
    in different groupby keys."""
    mix = pc.add(pc.multiply(user_id, _MULT_U), pc.multiply(day, _MULT_D))
    shard = pc.subtract(mix, pc.multiply(pc.divide(mix, num_shards), num_shards))
    return pc.cast(
        pc.if_else(pc.less(shard, 0), pc.add(shard, num_shards), shard), pa.int64()
    )


def day_shard_project(batch: pa.Table, num_shards: int) -> pa.Table:
    """Vectorized projection: day id + coarse (user, day) shard key."""
    us = pc.cast(batch["ts"], pa.int64())
    day = pc.cast(pc.divide(us, US_PER_DAY), pa.int64())
    return batch.append_column("day", day).append_column(
        "shard", _shard_key(batch["user_id"], day, num_shards)
    )


def _ts_us(s: pd.Series) -> pd.Series:
    return s.astype("datetime64[ns]").astype("int64") // 1000


# --- sessionize -------------------------------------------------------------
def session_shard_partial(g: pd.DataFrame, num_shards: int = DEFAULT_SHARDS) -> pd.DataFrame:
    """One shard (many complete user-day buckets) -> per-(user, day)
    summary rows, fully vectorized: sort once, detect breaks with shifted
    comparisons, aggregate with groupby-agg."""
    if g.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "day": pd.Series(dtype="int64"),
                "ushard": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "n_breaks": pd.Series(dtype="int64"),
                "first_ts_us": pd.Series(dtype="int64"),
                "last_ts_us": pd.Series(dtype="int64"),
            }
        )
    g = g.sort_values(["user_id", "day", "ts"], kind="mergesort")
    new_bucket = g["user_id"].ne(g["user_id"].shift()) | g["day"].ne(g["day"].shift())
    gap_s = g["ts"].diff().dt.total_seconds()
    brk = new_bucket | (gap_s > SESSION_GAP_S)
    ts_us = _ts_us(g["ts"])
    s = (
        g.assign(brk=brk.astype("int64"), ts_us=ts_us)
        .groupby(["user_id", "day"], as_index=False, sort=False)
        .agg(
            n_events=("ts_us", "size"),
            n_breaks=("brk", "sum"),
            first_ts_us=("ts_us", "min"),
            last_ts_us=("ts_us", "max"),
        )
    )
    s["ushard"] = (s["user_id"] * _MULT_U) % num_shards
    return s.astype(
        {"user_id": "int64", "day": "int64", "ushard": "int64", "n_events": "int64",
         "n_breaks": "int64", "first_ts_us": "int64", "last_ts_us": "int64"}
    )


def session_merge_shard(g: pd.DataFrame) -> pd.DataFrame:
    """Day summaries (complete users per shard) -> final per-user rows:
    a cross-midnight gap within the session gap merges the two days'
    sessions (one subtraction per qualifying day pair)."""
    if g.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "n_sessions": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
            }
        )
    g = g.sort_values(["user_id", "day"], kind="mergesort")
    same_user = g["user_id"].eq(g["user_id"].shift())
    gap_s = (g["first_ts_us"] - g["last_ts_us"].shift()) / 1e6
    merged = (same_user & (gap_s <= SESSION_GAP_S)).astype("int64")
    out = (
        g.assign(adj=merged)
        .groupby("user_id", as_index=False, sort=False)
        .agg(n_breaks=("n_breaks", "sum"), n_events=("n_events", "sum"), adj=("adj", "sum"))
    )
    out["n_sessions"] = out["n_breaks"] - out["adj"]
    return out[["user_id", "n_sessions", "n_events"]].astype(
        {"user_id": "int64", "n_sessions": "int64", "n_events": "int64"}
    )


def sessionize_bucketed(events, num_shards: int = DEFAULT_SHARDS):
    """events Dataset(user_id, ts) -> (user_id, n_sessions, n_events) with
    user-day bucket granularity; cross-midnight sessions merged over the
    tiny per-day summary table."""
    return (
        events.map_batches(
            _rfn("day_shard_project", num_shards=num_shards), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(_rfn("session_shard_partial", num_shards=num_shards),
                    batch_format="pandas")
        .groupby("ushard")
        .map_groups(_rfn("session_merge_shard"), batch_format="pandas")
    )


# --- as-of join -------------------------------------------------------------
def asof_shard_partial(g: pd.DataFrame, num_shards: int = DEFAULT_SHARDS) -> pd.DataFrame:
    """One shard -> mixed partial rows, vectorized via merge_asof(by=):

    kind=0: purchase matched to a same-day view  (purchase_id, view_id)
    kind=1: purchase with NO same-day earlier view (needs cross-day carry)
    kind=2: per-(user, day) last-view summary (view_id, ts_us)
    """
    empty = pd.DataFrame(
        {
            "kind": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "day": pd.Series(dtype="int64"),
            "ushard": pd.Series(dtype="int64"),
            "purchase_id": pd.Series(dtype="int64"),
            "view_id": pd.Series(dtype="int64"),
            "ts_us": pd.Series(dtype="int64"),
        }
    )
    if g.empty:
        return empty
    p = g[g["event_type"] == "purchase"][["user_id", "day", "event_id", "ts"]]
    v = g[g["event_type"] == "view"][["user_id", "day", "event_id", "ts"]]
    parts = []
    if not v.empty:
        # among equal-ts views keep the max event_id (same tie-break as the
        # per-user oracle and the SQL)
        v = (
            v.groupby(["user_id", "day", "ts"], as_index=False, sort=False)
            .agg(event_id=("event_id", "max"))
            .sort_values("ts", kind="mergesort")
        )
        last_idx = v.groupby(["user_id", "day"], sort=False)["ts"].idxmax()
        summ = v.loc[last_idx]
        parts.append(
            pd.DataFrame(
                {
                    "kind": 2,
                    "user_id": summ["user_id"],
                    "day": summ["day"],
                    "purchase_id": -1,
                    "view_id": summ["event_id"],
                    "ts_us": _ts_us(summ["ts"]),
                }
            )
        )
    if not p.empty:
        p = p.sort_values("ts", kind="mergesort")
        if v.empty:
            matched_view = pd.Series(np.nan, index=p.index)
        else:
            m = pd.merge_asof(
                p,
                v.rename(columns={"event_id": "view_id"}),
                on="ts",
                by=["user_id", "day"],
                direction="backward",
            )
            matched_view = m["view_id"].to_numpy()
        ok = ~pd.isna(matched_view)
        parts.append(
            pd.DataFrame(
                {
                    "kind": np.where(ok, 0, 1),
                    "user_id": p["user_id"].to_numpy(),
                    "day": p["day"].to_numpy(),
                    "purchase_id": p["event_id"].to_numpy(),
                    "view_id": np.where(ok, np.nan_to_num(matched_view, nan=-1), -1),
                    "ts_us": 0,
                }
            )
        )
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    out["ushard"] = (out["user_id"] * _MULT_U) % num_shards
    return out[list(empty.columns)].astype({c: "int64" for c in empty.columns})


def asof_carry_input(batch: pa.Table) -> pa.Table:
    """Pre-shuffle filter: only the carry-relevant kinds (last-view /
    unmatched day summaries) enter the ushard exchange."""
    import pyarrow.compute as pc

    return batch.filter(pc.not_equal(batch["kind"], 0))


def asof_carry_shard(g: pd.DataFrame) -> pd.DataFrame:
    """Summaries (kind=2) + carry markers (kind=1) for complete users:
    carry for marker day d = the user's last view over days < d — one
    backward merge_asof on day, exact matches excluded."""
    empty = pd.DataFrame(
        {
            "c_user": pd.Series(dtype="int64"),
            "c_day": pd.Series(dtype="int64"),
            "carry_view_id": pd.Series(dtype="int64"),
        }
    )
    markers = (
        g[g["kind"] == 1][["user_id", "day"]]
        .drop_duplicates()
        .sort_values("day", kind="mergesort")
    )
    if markers.empty:
        return empty
    summ = g[g["kind"] == 2][["user_id", "day", "view_id"]].sort_values(
        "day", kind="mergesort"
    )
    if summ.empty:
        out = markers.assign(carry_view_id=-1)
    else:
        out = pd.merge_asof(
            markers,
            summ.rename(columns={"view_id": "carry_view_id"}),
            on="day",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        out["carry_view_id"] = out["carry_view_id"].fillna(-1)
    out = out.rename(columns={"user_id": "c_user", "day": "c_day"})
    return out[["c_user", "c_day", "carry_view_id"]].astype(
        {"c_user": "int64", "c_day": "int64", "carry_view_id": "int64"}
    )


def asof_matched_project(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    m = batch.filter(pc.equal(batch["kind"], 0))
    return m.select(["purchase_id", "view_id"])


def asof_unmatched_project(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    u = batch.filter(pc.equal(batch["kind"], 1))
    return u.select(["user_id", "day", "purchase_id"])


def asof_resolved_project(batch: pa.Table) -> pa.Table:
    return pa.table(
        {"purchase_id": batch["purchase_id"], "view_id": batch["carry_view_id"]}
    )


def events_asof_bucketed(events, num_shards: int = DEFAULT_SHARDS):
    """events Dataset -> (purchase_id, view_id): every purchase matched to
    the user's most recent view at or before it, unbounded lookback, with
    user-day bucket granularity. Three stages: vectorized per-shard
    partials, a per-user backward merge_asof over DAY SUMMARIES (rows ~
    active days, never events), and a (user, day) join resolving
    cross-day matches."""
    from ..joins import safe_join
    from ..remote import remote_fn

    partials = (
        events.map_batches(
            _rfn("day_shard_project", num_shards=num_shards), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(_rfn("asof_shard_partial", num_shards=num_shards),
                    batch_format="pandas")
        .materialize()  # consumed by three branches below: compute once
    )
    matched = partials.map_batches(_rfn("asof_matched_project"), batch_format="pyarrow")
    carries = (
        # kind=0 matched-purchase rows dominate partials and the carry
        # merge discards them — drop them BEFORE the ushard shuffle so the
        # exchange moves day summaries, not one row per matched purchase
        partials.map_batches(_rfn("asof_carry_input"), batch_format="pyarrow")
        .groupby("ushard")
        .map_groups(_rfn("asof_carry_shard"), batch_format="pandas")
    )
    unmatched = partials.map_batches(
        _rfn("asof_unmatched_project"), batch_format="pyarrow"
    )
    joined = safe_join(
        unmatched, carries, on=("user_id", "day"), right_on=("c_user", "c_day")
    )
    if joined is None:  # no unmatched purchases anywhere
        return matched
    resolved = joined.map_batches(_rfn("asof_resolved_project"), batch_format="pyarrow")
    # normalize both branches to Arrow blocks before the union
    ident = remote_fn("khl_pdf_ocr_ray.remote", "identity_batch")
    return matched.map_batches(ident, batch_format="pyarrow").union(
        resolved.map_batches(ident, batch_format="pyarrow")
    )


# --- range join -------------------------------------------------------------
def range_day_project(batch: pa.Table, num_shards: int) -> pa.Table:
    """Events -> day/shard-keyed rows, with views in the last
    RANGE_WINDOW_S of a day REPLICATED into the next day's bucket (flagged
    carried=true: window context only, never that day's own rows)."""
    base = day_shard_project(batch, num_shards)
    base = base.append_column(
        "carried", pa.array([False] * batch.num_rows, pa.bool_())
    )
    us = pc.cast(batch["ts"], pa.int64())
    day = pc.cast(pc.divide(us, US_PER_DAY), pa.int64())
    is_view = pc.equal(batch["event_type"], "view")
    day_end_us = pc.multiply(pc.add(day, 1), US_PER_DAY)
    near_end = pc.greater_equal(us, pc.subtract(day_end_us, RANGE_WINDOW_S * 1_000_000))
    rep = batch.filter(pc.and_(is_view, near_end))
    if rep.num_rows:
        rep_us = pc.cast(rep["ts"], pa.int64())
        rep_day = pc.add(pc.cast(pc.divide(rep_us, US_PER_DAY), pa.int64()), 1)
        carried = rep.append_column("day", rep_day).append_column(
            "shard", _shard_key(rep["user_id"], rep_day, num_shards)
        ).append_column("carried", pa.array([True] * rep.num_rows, pa.bool_()))
        base = pa.concat_tables([base, carried.select(base.column_names)])
    return base


def range_shard_partial(g: pd.DataFrame) -> pd.DataFrame:
    """One shard -> (purchase_id, n_views_1h), vectorized: per-bucket view
    cumcounts + two backward merge_asofs give the [ts-1h, ts] window count
    as a difference of cumulative ranks."""
    empty = pd.DataFrame(
        {"purchase_id": pd.Series(dtype="int64"), "n_views_1h": pd.Series(dtype="int64")}
    )
    p = g[(g["event_type"] == "purchase") & ~g["carried"]][
        ["user_id", "day", "event_id", "ts"]
    ]
    if p.empty:
        return empty
    v = g[g["event_type"] == "view"].drop_duplicates(["user_id", "day", "event_id"])[
        ["user_id", "day", "ts"]
    ]
    if v.empty:
        return pd.DataFrame(
            {"purchase_id": p["event_id"].astype("int64"), "n_views_1h": 0}
        ).astype({"purchase_id": "int64", "n_views_1h": "int64"})
    v = v.sort_values(["user_id", "day", "ts"], kind="mergesort")
    v["cum"] = v.groupby(["user_id", "day"], sort=False).cumcount() + 1
    v = v.sort_values("ts", kind="mergesort")
    p = p.sort_values("ts", kind="mergesort")
    hi = pd.merge_asof(
        p, v[["user_id", "day", "ts", "cum"]], on="ts", by=["user_id", "day"],
        direction="backward",
    )["cum"].fillna(0)
    ts0 = (p["ts"] - pd.Timedelta(seconds=RANGE_WINDOW_S)).astype(p["ts"].dtype)
    p2 = p.assign(ts0=ts0).sort_values("ts0", kind="mergesort")
    lo = pd.merge_asof(
        p2,
        v[["user_id", "day", "ts", "cum"]],
        left_on="ts0",
        right_on="ts",
        by=["user_id", "day"],
        direction="backward",
        allow_exact_matches=False,  # lower bound is inclusive: exclude ==ts0
    )
    lo = lo.set_index("event_id")["cum"].fillna(0)
    out = pd.DataFrame(
        {
            "purchase_id": p["event_id"].astype("int64"),
            "n_views_1h": (
                hi.to_numpy() - lo.loc[p["event_id"]].to_numpy()
            ).astype("int64"),
        }
    )
    return out.reset_index(drop=True)


def range_join_bucketed(events, num_shards: int = DEFAULT_SHARDS):
    """events Dataset(event_id, user_id, event_type, ts) ->
    (purchase_id, n_views_1h), exact, with user-day bucket granularity."""
    return (
        events.map_batches(
            _rfn("range_day_project", num_shards=num_shards), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(_rfn("range_shard_partial"), batch_format="pandas")
    )
