"""(user, day)-bucketed temporal operators: sessionize, as-of join,
range (interval) join.

The naive plans shuffle on ``user_id`` alone and hold ONE USER'S ENTIRE
HISTORY in one task — a memory/straggler wall when a bot account has
billions of events. These implementations bucket by ``(user_id, day)``
so a task holds at most one day of one user, and stitch the cross-day
semantics back together over per-day SUMMARY rows (one row per active
(user, day) — bounded by days, not events):

- range join (bounded 1h window): views within 1h of a day's end are
  REPLICATED into the next day's bucket (boundary-overlap replication),
  making every per-bucket sweep self-contained — results are exact.
- as-of join (unbounded lookback): purchases matched within their own
  day; unmatched ones fall back to a per-user prefix scan over per-day
  last-view summaries (tiny), joined back by (user, day).
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
_T = "khl_pdf_ocr_ray.stages.temporal"


def _rfn(attr: str, **kw):
    from ..remote import remote_fn

    return remote_fn(_T, attr, **kw)


def _day_col(batch: pa.Table) -> pa.Array:
    us = pc.cast(batch["ts"], pa.int64())
    return pc.cast(pc.divide(us, US_PER_DAY), pa.int64())


# --- range join -------------------------------------------------------------
def range_day_project(batch: pa.Table) -> pa.Table:
    """Events -> (user_id, day, event_id, event_type, ts) rows, with views
    in the last RANGE_WINDOW_S of a day replicated into the next day's
    bucket (flagged carried=true so they never double-count as that day's
    own rows — they only serve as window context)."""
    us = pc.cast(batch["ts"], pa.int64())
    day = pc.cast(pc.divide(us, US_PER_DAY), pa.int64())
    base = pa.table(
        {
            "user_id": batch["user_id"],
            "day": day,
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "ts": batch["ts"],
            "carried": pa.array([False] * batch.num_rows, pa.bool_()),
        }
    )
    # boundary overlap: views with ts >= day_end - window serve next day
    is_view = pc.equal(batch["event_type"], "view")
    day_end_us = pc.multiply(pc.add(day, 1), US_PER_DAY)
    near_end = pc.greater_equal(us, pc.subtract(day_end_us, RANGE_WINDOW_S * 1_000_000))
    rep = batch.filter(pc.and_(is_view, near_end))
    if rep.num_rows:
        rep_day = pc.add(
            pc.cast(pc.divide(pc.cast(rep["ts"], pa.int64()), US_PER_DAY), pa.int64()),
            1,
        )
        carried = pa.table(
            {
                "user_id": rep["user_id"],
                "day": rep_day,
                "event_id": rep["event_id"],
                "event_type": rep["event_type"],
                "ts": rep["ts"],
                "carried": pa.array([True] * rep.num_rows, pa.bool_()),
            }
        )
        base = pa.concat_tables([base, carried])
    return base


def range_join_per_user_day(g: pd.DataFrame) -> pd.DataFrame:
    """One (user, day) bucket: two-pointer sweep of the day's purchases
    against the day's views plus the previous day's carried-in tail."""
    p = g[(g["event_type"] == "purchase") & ~g["carried"]].sort_values(
        ["ts", "event_id"]
    )
    if p.empty:
        return pd.DataFrame(
            {"purchase_id": pd.Series(dtype="int64"), "n_views_1h": pd.Series(dtype="int64")}
        )
    v = g[g["event_type"] == "view"].drop_duplicates("event_id").sort_values("ts")
    vts = v["ts"].to_numpy()
    pts = p["ts"].to_numpy()
    lo = np.searchsorted(vts, pts - np.timedelta64(RANGE_WINDOW_S, "s"), side="left")
    hi = np.searchsorted(vts, pts, side="right")
    return pd.DataFrame(
        {
            "purchase_id": p["event_id"].astype("int64"),
            "n_views_1h": (hi - lo).astype("int64"),
        }
    )


def range_join_bucketed(events):
    """events Dataset(event_id, user_id, event_type, ts) ->
    (purchase_id, n_views_1h), exact, with (user, day) task granularity."""
    return (
        events.map_batches(_rfn("range_day_project"), batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .map_groups(_rfn("range_join_per_user_day"), batch_format="pandas")
    )


# --- as-of join -------------------------------------------------------------
def asof_day_partial(g: pd.DataFrame) -> pd.DataFrame:
    """One (user, day) bucket -> mixed partial rows:

    kind=0: purchase matched to a same-day view  (purchase_id, view_id)
    kind=1: purchase with NO same-day earlier view (needs cross-day carry)
    kind=2: the day's last-view summary (view_id = latest view's event_id,
            ts_us = its timestamp) — the only state that crosses days
    """
    user = np.int64(g["user_id"].iloc[0])
    day = np.int64(g["day"].iloc[0])
    out = {"kind": [], "user_id": [], "day": [], "purchase_id": [], "view_id": [], "ts_us": []}
    p = g[g["event_type"] == "purchase"][["event_id", "ts"]].sort_values(["ts", "event_id"])
    v = g[g["event_type"] == "view"][["event_id", "ts"]].sort_values(["ts", "event_id"])
    if not v.empty:
        # among equal-ts views keep the max event_id (same tie-break as the
        # per-user oracle and the SQL)
        v = v.groupby("ts", as_index=False).agg(event_id=("event_id", "max"))
        last = v.iloc[-1]
        out["kind"].append(2)
        out["user_id"].append(user)
        out["day"].append(day)
        out["purchase_id"].append(-1)
        out["view_id"].append(np.int64(last["event_id"]))
        out["ts_us"].append(np.int64(pd.Timestamp(last["ts"]).value // 1000))
    if not p.empty:
        if v.empty:
            m_view = pd.Series([np.nan] * len(p))
        else:
            m = pd.merge_asof(
                p, v.rename(columns={"event_id": "view_id"}), on="ts", direction="backward"
            )
            m_view = m["view_id"]
        for pid, mv in zip(p["event_id"], m_view):
            matched = not pd.isna(mv)
            out["kind"].append(0 if matched else 1)
            out["user_id"].append(user)
            out["day"].append(day)
            out["purchase_id"].append(np.int64(pid))
            out["view_id"].append(np.int64(mv) if matched else -1)
            out["ts_us"].append(0)
    return pd.DataFrame(out).astype(
        {"kind": "int64", "user_id": "int64", "day": "int64",
         "purchase_id": "int64", "view_id": "int64", "ts_us": "int64"}
    )


def asof_carry_scan(g: pd.DataFrame) -> pd.DataFrame:
    """One user's day summaries (kind=2) + carry-marker days (kind=1):
    for each marker day d, the latest view over all days < d (prefix scan
    over the tiny per-day rows)."""
    summaries = g[g["kind"] == 2].sort_values("day")
    marker_days = np.sort(g[g["kind"] == 1]["day"].unique())
    user = np.int64(g["user_id"].iloc[0])
    days = summaries["day"].to_numpy()
    vids = summaries["view_id"].to_numpy()
    out = {"c_user": [], "c_day": [], "carry_view_id": []}
    for d in marker_days:
        i = np.searchsorted(days, d, side="left")  # summaries strictly before d
        out["c_user"].append(user)
        out["c_day"].append(np.int64(d))
        # summaries are per-day LAST views; the latest prior day wins (its
        # last view is later than every view of earlier days)
        out["carry_view_id"].append(np.int64(vids[i - 1]) if i > 0 else -1)
    return pd.DataFrame(out).astype(
        {"c_user": "int64", "c_day": "int64", "carry_view_id": "int64"}
    )


def asof_matched_project(df: pd.DataFrame) -> pd.DataFrame:
    m = df[df["kind"] == 0]
    return pd.DataFrame(
        {"purchase_id": m["purchase_id"], "view_id": m["view_id"]}
    ).astype({"purchase_id": "int64", "view_id": "int64"})


def asof_carry_input_filter(df: pd.DataFrame) -> pd.DataFrame:
    return df[df["kind"].isin([1, 2])]


def asof_unmatched_project(df: pd.DataFrame) -> pd.DataFrame:
    u = df[df["kind"] == 1]
    return pd.DataFrame(
        {"user_id": u["user_id"], "day": u["day"], "purchase_id": u["purchase_id"]}
    ).astype({"user_id": "int64", "day": "int64", "purchase_id": "int64"})


def asof_resolved_project(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {"purchase_id": df["purchase_id"], "view_id": df["carry_view_id"]}
    ).astype({"purchase_id": "int64", "view_id": "int64"})


def asof_day_project(batch: pa.Table) -> pa.Table:
    return batch.append_column("day", _day_col(batch))


def events_asof_bucketed(events):
    """events Dataset -> (purchase_id, view_id): every purchase matched to
    the user's most recent view at or before it, unbounded lookback, with
    (user, day) task granularity. Three stages: per-day partials, a
    per-user prefix scan over DAY SUMMARIES (rows ~ active days, never
    events), and a (user, day) join resolving cross-day matches."""
    from ..joins import safe_join
    from ..remote import remote_fn

    partials = (
        events.map_batches(_rfn("asof_day_project"), batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .map_groups(_rfn("asof_day_partial"), batch_format="pandas")
        .materialize()  # consumed by three branches below: compute once
    )
    matched = partials.map_batches(_rfn("asof_matched_project"), batch_format="pandas")
    carries = (
        partials.map_batches(_rfn("asof_carry_input_filter"), batch_format="pandas")
        .groupby("user_id")
        .map_groups(_rfn("asof_carry_scan"), batch_format="pandas")
    )
    unmatched = partials.map_batches(
        _rfn("asof_unmatched_project"), batch_format="pandas"
    )
    joined = safe_join(
        unmatched, carries, on=("user_id", "day"), right_on=("c_user", "c_day")
    )
    if joined is None:  # no unmatched purchases anywhere
        return matched
    resolved = joined.map_batches(_rfn("asof_resolved_project"), batch_format="pandas")
    # normalize both branches to Arrow blocks before the union
    ident = remote_fn("khl_pdf_ocr_ray.remote", "identity_batch")
    return matched.map_batches(ident, batch_format="pyarrow").union(
        resolved.map_batches(ident, batch_format="pyarrow")
    )


# --- sessionize -------------------------------------------------------------
def session_day_partial(g: pd.DataFrame) -> pd.DataFrame:
    """One (user, day) bucket -> a single summary row: event count,
    within-day session breaks (the day's first event counted as a break),
    first/last timestamps."""
    ts = g["ts"].sort_values()
    brk = (ts.diff().dt.total_seconds() > SESSION_GAP_S) | ts.diff().isna()
    return pd.DataFrame(
        {
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "day": [np.int64(g["day"].iloc[0])],
            "n_events": [len(g)],
            "n_breaks": [int(brk.sum())],
            "first_ts_us": [np.int64(pd.Timestamp(ts.iloc[0]).value // 1000)],
            "last_ts_us": [np.int64(pd.Timestamp(ts.iloc[-1]).value // 1000)],
        }
    ).astype({"user_id": "int64", "day": "int64", "n_events": "int64", "n_breaks": "int64"})


def session_merge_days(g: pd.DataFrame) -> pd.DataFrame:
    """One user's day summaries -> final (user_id, n_sessions, n_events):
    subtract one break for each pair of consecutive ACTIVE days whose
    midnight-spanning gap is within the session gap."""
    g = g.sort_values("day")
    n_events = int(g["n_events"].sum())
    n_sessions = int(g["n_breaks"].sum())
    first_us = g["first_ts_us"].to_numpy()
    last_us = g["last_ts_us"].to_numpy()
    gaps_s = (first_us[1:] - last_us[:-1]) / 1e6
    n_sessions -= int((gaps_s <= SESSION_GAP_S).sum())
    return pd.DataFrame(
        {
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    ).astype({"user_id": "int64", "n_sessions": "int64", "n_events": "int64"})


def sessionize_bucketed(events):
    """events Dataset(user_id, ts) -> (user_id, n_sessions, n_events) with
    (user, day) task granularity; cross-midnight sessions merged over the
    tiny per-day summary table."""
    return (
        events.map_batches(_rfn("asof_day_project"), batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .map_groups(_rfn("session_day_partial"), batch_format="pandas")
        .groupby("user_id")
        .map_groups(_rfn("session_merge_days"), batch_format="pandas")
    )
