"""Growth probe for the sort + run-tag + offset global-rank machinery
(pipelines/queries_eval.py): run curriculum_order over the sf0.1
documents table and over a 10x replica corpus (distinct ids/sources per
copy so per-source group sizes stay constant while the SORT grows 10x),
and report wall time at both sizes.

The machinery's scale claim is that cost is dominated by the two
distributed sorts (linear-ish with data at fixed cluster size) while
driver state stays O(runs x sources) — so 10x data should cost well
under 10x wall at this toy scale where fixed all-to-all floors dominate.

Usage: python scripts/probe_rank_growth.py [sf_dir]
Writes the 10x corpus under /tmp/khlray_cache/rank_growth_<fp>/.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(os.environ.get("RANK_GROWTH_REPLICAS", "10"))
ID_STRIDE = 10_000_000


def build_10x(sf_dir: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    out_dir = os.path.join(
        "/tmp/khlray_cache",
        f"rank_growth_{REPLICAS}x_{st.st_size}_{int(st.st_mtime)}",
    )
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(src, columns=["doc_id", "source", "n_chars"])
    # text column is unused by curriculum_order but _t prunes columns, so
    # a slim table is representative
    copies = []
    for r in range(REPLICAS):
        ids = pa.compute.add(t["doc_id"], r * ID_STRIDE)
        srcs = pa.compute.binary_join_element_wise(
            t["source"], pa.scalar(f"r{r}"), "_"
        )
        copies.append(
            pa.table(
                {"doc_id": ids, "source": srcs, "n_chars": t["n_chars"]}
            )
        )
    pq.write_table(pa.concat_tables(copies), out + ".tmp.parquet")
    os.rename(out + ".tmp.parquet", out)
    return out_dir


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from khl_pdf_ocr_ray.pipelines.queries_eval import q_curriculum_order

    big_dir = build_10x(sf_dir)

    # warm up the Ray worker pool + fixed Data costs so the first timed
    # leg isn't charged the session cold-start
    q_curriculum_order(sf_dir).count()

    results = {}
    for label, d in (("1x", sf_dir), (f"{REPLICAS}x", big_dir)):
        t0 = time.perf_counter()
        ds = q_curriculum_order(d)
        n = ds.count()
        wall = time.perf_counter() - t0
        results[label] = (n, wall)
        print(f"{label}: rows={n} wall={wall:.2f}s", flush=True)

    r1, rn = results["1x"][1], results[f"{REPLICAS}x"][1]
    print(
        f'{{"probe": "rank_growth", "replicas": {REPLICAS}, '
        f'"rows_1x": {results["1x"][0]}, '
        f'"rows_big": {results[f"{REPLICAS}x"][0]}, "sec_1x": {r1:.2f}, '
        f'"sec_big": {rn:.2f}, "growth_ratio": {rn / r1:.2f}}}'
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
