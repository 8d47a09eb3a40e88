"""Kernel-level checks for events_ingest_dedup beyond oracle parity:
the refresh-on-sighting TTL chain, shard completeness (sharded ==
single-pass), and batching invariance of the arrival synthesis."""

import numpy as np
import pandas as pd
import pyarrow as pa

from khl_pdf_ocr_ray.pipelines.queries_ingest import (
    INGEST_TTL,
    ingest_arrivals,
    ingest_dedup_shard,
)


def _events(n: int, seed: int = 5) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = np.int64(1_700_000_000_000_000)
    return pa.table(
        {
            "event_id": pa.array(np.arange(1, n + 1, dtype="int64")),
            "user_id": pa.array(rng.integers(1, 40, n).astype("int64")),
            "event_type": pa.array(rng.choice(["view", "click"], n)),
            "ts": pa.array(
                base + rng.integers(0, 10_000, n) * 1_000_000
            ).cast(pa.timestamp("us")),
        }
    )


def test_arrival_synthesis_is_batching_invariant():
    ev = _events(1000)
    whole = ingest_arrivals(ev).to_pandas()
    parts = pd.concat(
        [
            ingest_arrivals(ev.slice(i, 77)).to_pandas()
            for i in range(0, ev.num_rows, 77)
        ],
        ignore_index=True,
    )
    key = lambda d: sorted(map(tuple, d[["seq", "user_id", "event_type"]].to_numpy().tolist()))
    assert key(whole) == key(parts)
    # planted arrivals are odd-seq, originals even-seq: never collide
    assert (whole["seq"] % 2 == 0).sum() == 1000
    assert (whole["seq"] % 2 == 1).sum() == len(whole) - 1000


def test_sharded_equals_single_pass():
    arr = ingest_arrivals(_events(3000)).to_pandas()
    single = (
        ingest_dedup_shard(arr)
        .groupby("event_type", as_index=False)
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    sharded = (
        pd.concat(
            [ingest_dedup_shard(g) for _, g in arr.groupby("shard")],
            ignore_index=True,
        )
        .groupby("event_type", as_index=False)
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(single, sharded, check_dtype=False)
    assert single["n_suppressed"].sum() > 0
    assert (single["n_admitted"] + 0).sum() > 3000  # some dups re-admitted


def test_ttl_chain_refreshes_on_sighting():
    """Three arrivals of one key at seq 0, TTL, 2*TTL: each gap equals
    TTL exactly, so the chain suppresses BOTH later arrivals even though
    the third is 2*TTL from the first (distance-to-first would re-admit
    it). A fourth at 3*TTL + 1 breaks the chain and is re-admitted."""
    base = 1_700_000_000_000_000
    g = pd.DataFrame(
        {
            "shard": [0] * 4,
            "seq": [0, INGEST_TTL, 2 * INGEST_TTL, 3 * INGEST_TTL + 1],
            "user_id": [7] * 4,
            "event_type": ["view"] * 4,
            "ts_us": [base] * 4,
        }
    )
    out = ingest_dedup_shard(g)
    assert int(out["n_arrivals"].sum()) == 4
    assert int(out["n_suppressed"].sum()) == 2
    assert int(out["n_admitted"].sum()) == 2
