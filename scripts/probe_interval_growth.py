"""Growth probe for the grid-cell interval-overlap join
(pipelines/queries_interval.py): run interval_overlap_join over the
sf0.1 events table and over a 10x replica corpus (user/type ids offset
per copy, timestamps SHIFTED by a disjoint day range per copy so the
cell-key cardinality grows with the data instead of hot-stacking on the
same cells), and report wall time and output pairs at both sizes.

The plan's scale claim: both sides reduce map-side to span tables (rows
~ active user-days), cells fan out boundedly, and the single equi-join
carries slim rows — so 10x events should cost well under 10x wall at
this toy scale where fixed exchange floors dominate, with output pairs
scaling exactly 10x (each replica's days are disjoint, so no
cross-replica pairs: planted ground truth for the join's correctness
under growth).

Usage: python scripts/probe_interval_growth.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(os.environ.get("INTERVAL_GROWTH_REPLICAS", "10"))
ID_STRIDE = 10_000_000
DAY_US = 86_400 * 1_000_000


def build_10x(sf_dir: str) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    out_dir = os.path.join(
        "/tmp/khlray_cache",
        f"interval_growth_{REPLICAS}x_{st.st_size}_{int(st.st_mtime)}",
    )
    out = os.path.join(out_dir, "events.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(src, columns=["user_id", "event_type", "ts"])
    us = pc.cast(t["ts"], pa.int64())
    lo = pc.min(us).as_py()
    hi = pc.max(us).as_py()
    span_days = (hi - lo) // DAY_US + 2  # disjoint day windows per copy
    copies = []
    for r in range(REPLICAS):
        shifted = pc.add(us, r * span_days * DAY_US)
        copies.append(
            pa.table(
                {
                    "user_id": pc.add(t["user_id"], r * ID_STRIDE),
                    "event_type": pc.binary_join_element_wise(
                        t["event_type"], pa.scalar(f"r{r}"), "_"
                    ),
                    "ts": pc.cast(shifted, pa.timestamp("us")),
                }
            )
        )
    pq.write_table(pa.concat_tables(copies), out)
    return out_dir


def run_once(sf_dir: str, label: str) -> dict:
    from khl_pdf_ocr_ray.pipelines.queries_interval import (
        q_interval_overlap_join,
    )

    t0 = time.time()
    n = q_interval_overlap_join(sf_dir).count()
    wall = time.time() - t0
    return {"label": label, "pairs": n, "sec": round(wall, 2)}


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    big_dir = build_10x(sf_dir)
    base = run_once(sf_dir, "1x")
    base2 = run_once(sf_dir, "1x-warm")
    big = run_once(big_dir, f"{REPLICAS}x")
    assert big["pairs"] == REPLICAS * base["pairs"], (
        "disjoint-replica pair count must scale exactly"
    )
    print(json.dumps({"runs": [base, base2, big],
                      "wall_ratio": round(big["sec"] / base2["sec"], 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
