"""Kernel-level checks for events_watermark beyond oracle parity: the
sharded two-level prefix max must equal the sequential single-pass
definition, and the boundary semantics (first row, exact-threshold
lateness) must match the SQL's strict comparisons."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_stream import (
    ALLOWED_LATENESS_S,
    STREAM_SHARD,
    _NO_PREV,
    wm_project,
    wm_shard_classify,
    wm_shard_max_partial,
)


def _events(n: int, seed: int = 11) -> pa.Table:
    """Arrival-ordered synthetic stream whose event times jitter out of
    order (includes the planted-late path via wm_project's own plant)."""
    rng = np.random.default_rng(seed)
    base = np.int64(1_700_000_000_000_000)  # ~2023 epoch us
    ts = base + np.cumsum(rng.integers(0, 90_000_000, n))  # 0..90 s steps
    return pa.table(
        {
            "event_id": pa.array(np.arange(1, n + 1, dtype="int64")),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase"], n)
            ),
        }
    )


def _sequential(proj: pd.DataFrame) -> pd.DataFrame:
    """Single-pass definition: strictly-preceding running max in
    event_id order, strict < comparisons."""
    p = proj.sort_values("event_id", kind="mergesort")
    prev = p["ets_us"].cummax().shift(1)
    has_prev = prev.notna()
    late = has_prev & (p["ets_us"] < prev)
    dropped = has_prev & (p["ets_us"] < prev - ALLOWED_LATENESS_S * 1_000_000)
    return (
        pd.DataFrame(
            {
                "event_type": p["event_type"],
                "hour": p["ets_us"] // 3_600_000_000,
                "n_events": 1,
                "n_late": late.astype("int64"),
                "n_dropped": dropped.astype("int64"),
            }
        )
        .groupby(["event_type", "hour"], as_index=False)
        .sum()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )


def _sharded(proj: pd.DataFrame) -> pd.DataFrame:
    """The distributed plan, run in-process: per-shard maxima from
    arbitrary batch splits, driver exclusive prefix, per-shard classify."""
    t = pa.Table.from_pandas(proj, preserve_index=False)
    partials = [
        wm_shard_max_partial(
            pa.table(
                {
                    "event_id": t["event_id"].slice(i, 333),
                    "ts": t["ts_us"].slice(i, 333).cast(pa.timestamp("us")),
                    "event_type": t["event_type"].slice(i, 333),
                }
            )
        ).to_pandas()
        for i in range(0, t.num_rows, 333)
    ]
    summ = (
        pd.concat(partials, ignore_index=True)
        .groupby("shard", as_index=False)["max_ets"]
        .max()
        .sort_values("shard")
    )
    prefix, run = {}, _NO_PREV
    for shard, mx in zip(summ["shard"].astype(int), summ["max_ets"].astype(int)):
        prefix[shard] = run
        run = max(run, mx)
    outs = [
        wm_shard_classify(g, prefix)
        for _, g in proj.groupby(proj["event_id"] // STREAM_SHARD)
    ]
    return (
        pd.concat(outs, ignore_index=True)
        .groupby(["event_type", "hour"], as_index=False)
        .sum()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )


def test_two_level_prefix_max_equals_sequential():
    ev = _events(5000)
    proj = wm_project(ev).to_pandas()
    # the max-partial path plants from raw ts itself, so feed it the
    # ORIGINAL timestamps (ets_us is already planted; re-planting would
    # double-shift the late rows)
    proj["ts_us"] = ev["ts"].cast(pa.int64()).to_pandas().to_numpy()
    seq = _sequential(proj)
    shd = _sharded(proj)
    pd.testing.assert_frame_equal(seq, shd, check_dtype=False)
    # non-degenerate: the plant produced late AND dropped rows
    assert seq["n_late"].sum() > 0
    assert seq["n_dropped"].sum() > 0


def test_boundary_semantics():
    """First row is never late; lateness/drop comparisons are strict, so
    ets == prev is on-time and ets == prev - L is late-but-kept."""
    L_us = ALLOWED_LATENESS_S * 1_000_000
    base = 1_700_000_000_000_000
    g = pd.DataFrame(
        {
            "shard": [0, 0, 0, 0],
            "event_id": [1, 2, 3, 4],
            # row2 equals prev (on-time), row3 exactly at the drop
            # threshold (late, kept), row4 one past it (dropped)
            "ets_us": [base, base, base - L_us, base - L_us - 1],
            "event_type": ["view"] * 4,
        }
    )
    out = wm_shard_classify(g, {0: _NO_PREV})
    assert out["n_events"].sum() == 4
    assert out["n_late"].sum() == 2
    assert out["n_dropped"].sum() == 1
