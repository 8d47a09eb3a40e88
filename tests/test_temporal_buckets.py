"""(user, day)-bucketed temporal operators vs the per-user twins.

Plants a HOT user whose events span several days — including sessions and
join windows that cross midnight — and asserts the bucketed plans
(stages/temporal.py, task granularity = one user-day) reproduce the
single-group-per-user formulations row for row. The bucketing guarantee
itself is structural: the shuffle key is (user_id, day), so no task ever
receives more than one day of one user's history.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

BASE = pd.Timestamp("2024-03-01 00:00:00")


def _mk_events() -> pd.DataFrame:
    rows = []
    eid = 0

    def add(user, dt_minutes, kind):
        nonlocal eid
        eid += 1
        rows.append(
            {
                "event_id": eid,
                "user_id": user,
                "event_type": kind,
                "ts": BASE + pd.Timedelta(minutes=dt_minutes),
            }
        )

    day = 24 * 60
    # hot user 1: three active days, one session spanning midnight
    add(1, 10, "view")                 # e1: d0 00:10
    add(1, 20, "purchase")             # e2: d0 00:20 -> view e1
    add(1, day - 15, "view")           # e3: d0 23:45 (within 1h of midnight)
    add(1, day + 5, "purchase")        # e4: d1 00:05, BEFORE any d1 view ->
    #                                    cross-day carry must find e3
    add(1, day + 15, "view")           # e5: d1 00:15
    add(1, day + 15, "purchase")       # e6: d1 00:15, equal-ts tie -> e5
    add(1, 2 * day + 600, "purchase")  # e7: d2 10:00 -> carry from d1 (e5)
    add(1, 2 * day + 610, "click")     # e8: session filler
    # sessions for user 1: {00:10, 00:20}, {23:45 .. 00:15 (cross-midnight,
    # gaps <= 30 min)}, {d2 10:00, 10:10} -> 3 sessions
    # user 2: purchase with no view ever -> -1
    add(2, 50, "purchase")             # e9
    add(2, 40 + day, "view")           # e10: later view (next day) must NOT match
    # user 3: equal-gap boundary (exactly 30 min is NOT a break)
    add(3, 0, "view")
    add(3, 30, "view")
    add(3, 90, "view")                 # 60 min gap -> break
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def _events_ds(df: pd.DataFrame) -> rd.Dataset:
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def events_df():
    return _mk_events()


def test_sessionize_bucketed_matches_per_user(ray_session, events_df):
    from khl_pdf_ocr_ray.pipelines.queries import sessions_per_user
    from khl_pdf_ocr_ray.stages.temporal import sessionize_bucketed

    got = sessionize_bucketed(_events_ds(events_df[["user_id", "ts"]])).to_pandas()
    want = pd.concat(
        [sessions_per_user(g) for _, g in events_df.groupby("user_id")],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    # the planted cross-midnight session really merged: user 1 has 3 sessions
    assert int(got[got["user_id"] == 1]["n_sessions"].iloc[0]) == 3


def test_asof_bucketed_matches_per_user(ray_session, events_df):
    from khl_pdf_ocr_ray.pipelines.queries import asof_per_user
    from khl_pdf_ocr_ray.stages.temporal import events_asof_bucketed

    cols = ["event_id", "user_id", "event_type", "ts"]
    got = events_asof_bucketed(_events_ds(events_df[cols])).to_pandas()
    want = pd.concat(
        [asof_per_user(g) for _, g in events_df.groupby("user_id")],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    m = dict(zip(got["purchase_id"], got["view_id"]))
    # cross-day case resolved through the carry path: the d1 00:05 purchase
    # has no same-day earlier view and must reach back to e3 (d0 23:45)
    assert m[4] == 3
    # equal-ts tie within the day keeps the view (backward asof, latest id)
    assert m[6] == 5
    # carry across a view-less day boundary: d2 purchase -> d1 last view
    assert m[7] == 5
    # purchase before any view -> -1 even though a later view exists
    assert m[9] == -1


def test_range_join_bucketed_matches_per_user(ray_session, events_df):
    from khl_pdf_ocr_ray.pipelines.queries import range_join_per_user
    from khl_pdf_ocr_ray.stages.temporal import range_join_bucketed

    cols = ["event_id", "user_id", "event_type", "ts"]
    got = range_join_bucketed(_events_ds(events_df[cols])).to_pandas()
    want = pd.concat(
        [range_join_per_user(g) for _, g in events_df.groupby("user_id")],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    m = dict(zip(got["purchase_id"], got["n_views_1h"]))
    # cross-midnight window served by the replicated boundary view: the
    # d1 00:05 purchase sees only e3 (d0 23:45); the 00:15 purchase sees
    # e3 plus the equal-ts view e5
    assert m[4] == 1 and m[6] == 2


def test_bucketed_ops_match_oracle_sql_at_sf(ray_session, sf_smoke_dir):
    """The swapped-in bucketed plans still satisfy the static DuckDB
    oracles on the driver-shaped events table."""
    import duckdb

    from khl_pdf_ocr_ray.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_smoke_dir}/events.parquet')"
    )
    for qname in ("sessionize", "events_asof", "events_range_join"):
        got = _norm(QUERIES[qname](sf_smoke_dir).to_pandas())
        want = _norm(con.execute(ORACLES[qname]).df())
        assert len(got) == len(want), qname
        for c in got.columns:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), (qname, c)


def test_shard_key_nonnegative_and_symmetric_for_huge_user_ids():
    """pc.multiply wraps on int64 overflow; base and carried rows must
    normalize the negative branch identically or one (user, day) bucket
    splits across two groupby keys."""
    import pyarrow as pa

    from khl_pdf_ocr_ray.stages.temporal import _shard_key

    uid = pa.array([2**33 + 12345, 5], pa.int64())
    day = pa.array([19845, 19845], pa.int64())
    for shards in (64, 7):
        s = _shard_key(uid, day, shards).to_pylist()
        assert all(0 <= v < shards for v in s)
        # carried rows for the SAME (user, day) recompute the key — must match
        assert _shard_key(uid, day, shards).to_pylist() == s
