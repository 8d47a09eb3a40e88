"""Benchmark harness: headline extract pipeline + representative operators.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_s": ..., "mb_per_s": ...}

Env knobs:
  GRAFT_SF_DIR    input scale dir  (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS  ray.init num_cpus (default 32)
  GRAFT_REPEAT    pages-per-document fan-out (default 10; bench corpus size
                  = documents x repeat, cached in /tmp across runs)

``python bench.py --scaling`` runs the headline pipeline in two fresh
subprocesses (8 vs 32 CPUs) on the same cached corpus and reports both
throughputs plus scaling efficiency (the sandbox evidence for the
north_rule's N vs 4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_REPEAT", "10"))

BENCH_QUERIES = [
    "pricing_summary",
    "events_hourly",
    "sessionize",
    "token_stats",
    "minhash_dups",
    "knn_bruteforce",
    "dedup_exact",
    "orders_by_segment",
    "corpus_prep",   # composite filter->dedup->split (round 3)
    "bm25_topk",     # text-retrieval ranking (round 3)
    "pack_sequences",   # distributed prefix sum (round 3)
    "kmeans_clusters",  # iterative fixed-point k-means (round 3)
    "funnel_conversion",  # ordered sequence-pattern funnel (round 3)
    "fuzzy_prefix_dups",  # edit-distance dedup, vectorized pair DP (round 3)
    "substring_dup_spans",  # positional-shingle duplicate spans (round 3)
    "pca_project",          # one-pass covariance + projection (round 3)
    "llm_corpus_recipe",    # composed filter->dedup->decon->chunk (round 3)
    "line_dedup",           # C4-style corpus-wide line dedup (round 3)
    "semdedup",             # within-cluster semantic dedup (round 3)
    "dsir_topk",            # hashed-ngram importance resampling (round 3)
    "host_pagerank",        # iterative integer PageRank (round 3)
    "domain_classifier",    # distributed LR training (round 3)
    "ccnet_buckets",        # per-lang perplexity terciles (round 3)
    "gopher_repetition",    # per-doc repetition signals (round 3)
    "skew_join_events",     # hot-key-aware join (round 3)
    "bpe_merges",           # iterative BPE merge learning (round 4)
    "compression_ratio",    # zlib repetition signal, map-only (round 4)
    "heavy_hitters_mg",     # MG candidates + exact verify (round 4)
    "recfile_scan",         # framed-record source scan (round 4)
    "cdc_chunk_dedup",      # content-defined-chunking dedup (round 4)
    "doc_graph_triangles",  # degree-oriented triangle counting (round 4)
    "returned_revenue_topk",  # 4-table selective join rollup (round 4)
    "temperature_sample",     # alpha language resampling (round 4)
    "events_watermark",       # two-level prefix-max late-data accounting (round 4)
    "events_ingest_dedup",    # TTL'd exactly-once ingestion dedup (round 4)
    "collocations_pmi",       # gram-count exchange + bigint PMI (round 4)
    "doc_graph_coreness",     # iterative H-index coreness (round 4)
    "allpairs_cosine",        # prefix-filtered set-similarity join (round 4)
    "html_link_degree",       # link-graph extraction + degree rollup (round 4)
    "bloom_line_dedup",       # dup-Bloom prefiltered exact line dedup (round 4)
    "snm_dups",               # sorted-neighborhood window dedup (round 4)
    "graph_bfs_depths",       # iterative frontier traversal (round 4)
    "curriculum_order",       # two-sort run-tagged global rank (round 4)
    "events_ewma",            # top-16-per-user decayed-state combiner (round 4)
    "graph_sssp",             # weighted Bellman-Ford relaxation (round 4)
    "graph_common_neighbors",  # wedge link-prediction scores (round 4)
    "trigram_diversity",       # distinct-n lexical diversity (round 4)
    "zorder_layout",           # Morton-key locality stats (round 4)
    "readability_score",       # map-only Flesch scoring (round 4)
    "doc_tiers",               # quality-tier extraction headline (round 4)
    "tier_transitions",        # closed-form tier drift over snapshots (round 4)
    "ndcg_eval",               # top-k superset combiner ranking eval (round 4)
    "rolling_7d_active_users",  # sliding COUNT DISTINCT via window cover (round 4)
    "session_paths_topk",       # per-user journey fold + path rollup (round 4)
    "media_phash_dups",         # binary-payload fingerprint dedup family (round 4)
    "interval_overlap_join",    # grid-cell interval join, owner-cell dedup (round 4)
    "html_table_cells",         # markup table-grid extraction surface (round 4)
    "master_fuzzy_match",       # broadcast hamming-1 name canonicalization (round 4)
    "dictionary_tag_ac",        # actor-held Aho-Corasick blocklist scan (round 5)
    "skew_join_salted",         # build-replicated two-sided skew join (round 5)
    "ngram_novelty",            # first-occurrence attribution (round 5)
    "novelty_incremental",      # snapshot novelty vs persisted gram index (round 5)
    "source_set_cover",         # greedy submodular source selection (round 5)
    "fd_discovery",             # functional-dependency profiling (round 5)
    "ind_discovery",            # inclusion-dependency / FK certification (round 5)
    "seq_pair_support",         # ordered-pair sequence-pattern support (round 5)
    "graph_random_walks",       # deterministic node2vec-style walks (round 5)
    "redirect_resolve",         # pointer-doubling chain resolution (round 5)
    "join_explosion_profile",   # pre-join skew advisor (round 5)
    "embedding_isotropy",       # representation-collapse QC (round 5)
    "lang_skew_kurtosis",       # hi/lo-split power-sum moments (round 5)
    "spearman_size_tokens",     # histogram-rank correlation (round 5)
    "mannwhitney_value",        # tie-corrected rank-sum test (round 5)
    "graph_label_communities",  # seeded label propagation (round 5)
    "graph_mst_boruvka",        # Borůvka spanning forest (round 5)
    "graph_diameter_sweep",     # double-sweep BFS eccentricity (round 5)
    "mv_incremental_stats",     # counting-algebra MV maintenance (round 5)
    "ams_f2_events",            # tug-of-war self-join-size sketch (round 5)
    "zipf_fit",                 # rank-frequency OLS on quantized ln (round 5)
    "mmr_rerank",               # diversity-aware rerank (round 5)
    "km_retention",             # censored survival estimator (round 5)
    "sprt_purchase_rate",       # sequential test, day-sharded scan (round 5)
    "isotonic_calibration",     # PAV vs GCM-hull dual derivation (round 5)
    "hill_tail_index",          # heavy-tail skew diagnostic (round 5)
    "bootstrap_mean_ci",        # one-pass Poisson bootstrap (round 5)
    "vocab_richness",           # Chao1 / Good-Turing unseen mass (round 5)
    "weighted_median_price",    # weighted-quantile histogram walk (round 5)
    "graph_ppr",                # seed-personalized PageRank (round 5)
]


def consume(result) -> int:
    """Drive a lazy result to completion; returns row count."""
    import pyarrow as pa

    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.count()
    if isinstance(result, pa.Table):
        return result.num_rows
    return len(result)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import (
        run_extract,
        synthesize_pages,
    )
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    # corpus generation is cached and NOT part of the measurement
    pages_dir = synthesize_pages(SF_DIR, repeat=REPEAT)

    # warm the OS page cache so the headline measures compute+pipeline
    import pyarrow.parquet as pq

    # read the payload column too: parquet is columnar, so warming only
    # url would leave the html bytes (the bulk of the corpus) cold
    meta = pq.read_table(pages_dir, columns=["url", "html"])
    n_docs = meta.num_rows
    corpus_bytes = sum(
        os.path.getsize(os.path.join(pages_dir, f))
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )

    # headline: full extract pipeline, consumed by a parquet sink
    out_dir = f"/tmp/khlray_bench_out_{NUM_CPUS}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    run_extract(pages_dir).write_parquet(out_dir)
    headline = time.perf_counter() - t0

    queries = {}
    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        result = {
            "metric": "extract_pipeline_wall",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "repeat": REPEAT,
            "n_docs": n_docs,
            "docs_per_s": round(n_docs / headline, 1),
            "mb_per_s": round(corpus_bytes / headline / 1e6, 1),
        }
        ray.shutdown()
        return result
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        consume(QUERIES[name](SF_DIR))
        queries[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "extract_pipeline_wall",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "repeat": REPEAT,
        "n_docs": n_docs,
        "docs_per_s": round(n_docs / headline, 1),
        "mb_per_s": round(corpus_bytes / headline / 1e6, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        """Best of 2 fresh-process runs: the sandbox shares CPUs with
        outside load and single runs swing ~2x; min is the honest
        capability number at each level."""
        scaling_repeat = os.environ.get("GRAFT_SCALING_REPEAT", "80")
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_HEADLINE_ONLY="1",
            # the scaling criterion measures throughput, so the corpus must
            # be large enough that per-session fixed costs (~3 s: actor-pool
            # start, read ramp) do not dominate the 32-CPU run
            GRAFT_REPEAT=scaling_repeat,
        )
        results = []
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            results.append(json.loads(out.strip().splitlines()[-1]))
        return min(results, key=lambda r: r["value"])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_s_8": r_lo["docs_per_s"],
        "docs_per_s_32": r_hi["docs_per_s"],
        "mb_per_s_8": r_lo["mb_per_s"],
        "mb_per_s_32": r_hi["mb_per_s"],
        "n_docs": r_hi["n_docs"],
        "sf": SF_DIR,
    }
    # standing spill gate (round-5 brief item 5): the undersized-object-
    # store leg runs with every scaling measurement so object-store
    # regressions surface in the same record as the 8/32-CPU pair
    env = dict(
        os.environ,
        GRAFT_REPEAT=os.environ.get("GRAFT_SPILL_REPEAT", "320"),
    )
    spill_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--spill"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    out["spill"] = json.loads(spill_out.strip().splitlines()[-1])
    return out


def run_spill() -> dict:
    """Memory-pressure evidence (round-3 brief item 8): run the corpus
    through a deliberately UNDERSIZED object store and show throughput
    survives spilling — the single-node stand-in for the 128 GiB-node /
    100 TB-corpus story. Two legs under the same cap:

    1. streaming headline (read -> extract -> parquet sink): streaming
       execution + backpressure keeps the working set near the cap;
    2. pinned leg: ``materialize()`` of the raw pages corpus — pinning
       MORE than the store holds forces Ray's disk spill, and the
       subsequent full consume (count via metadata + a column scan)
       proves spilled blocks restore correctly.

    Spill counters come from Ray's memory summary (authoritative: the
    object-store's own spilled-bytes accounting).

    Env: GRAFT_STORE_GB (default 2), GRAFT_REPEAT sizes the corpus
    (320 -> 1.6M pages at sf0.1, ~2x the default cap in Arrow bytes)."""
    import ray

    store_gb = float(os.environ.get("GRAFT_STORE_GB", "2"))
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        object_store_memory=int(store_gb * (1 << 30)),
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from khl_pdf_ocr_ray.pipelines.extract_pipeline import (
        run_extract,
        synthesize_pages,
    )

    pages_dir = synthesize_pages(SF_DIR, repeat=REPEAT)
    corpus_bytes = sum(
        os.path.getsize(os.path.join(pages_dir, f))
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )

    import shutil

    out_dir = f"/tmp/khlray_bench_spill_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    run_extract(pages_dir).write_parquet(out_dir)
    stream_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    pinned = rd.read_parquet(pages_dir, columns=["url", "html"]).materialize()
    n_docs = pinned.count()
    # consume THROUGH the spilled blocks: a full column scan restores
    # every block from disk
    total_bytes = pinned.map_batches(
        lambda b: {"n": [sum(len(x) for x in b["html"].to_pylist())]},
        batch_format="pyarrow",
    ).sum("n")
    pinned_s = time.perf_counter() - t0

    # this container lacks grpc (so ray's memory_summary API is out);
    # the raylet logs its own authoritative spill accounting:
    # "Spilled 3319 MiB, 848 objects, write throughput ..."
    # The raylet emits the cumulative line asynchronously (throttled) —
    # give it a beat or the final total is missed (measured: the
    # 3,164 MiB line landed ~0.2 s after the consume returned).
    time.sleep(3)
    import glob

    try:  # the live session's own dir (RAY_TMPDIR nests sessions)
        import ray._private.worker as _w

        session_logs = [os.path.join(_w._global_node.get_session_dir_path(), "logs")]
    except Exception:
        session_logs = glob.glob("/tmp/ray/**/session_latest/logs", recursive=True)
    spilled_mb = 0.0
    for log in (
        p for d in session_logs for p in glob.glob(os.path.join(d, "raylet*.out"))
    ):
        try:
            for line in open(log, errors="ignore"):
                if "Spilled " in line:
                    try:
                        spilled_mb = max(
                            spilled_mb,
                            float(line.split("Spilled ", 1)[1].split()[0]),
                        )
                    except (IndexError, ValueError):
                        pass
        except OSError:
            pass
    result = {
        "metric": "spill_stability",
        "value": round(stream_s, 3),
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "repeat": REPEAT,
        "n_docs": n_docs,
        "corpus_mb": round(corpus_bytes / 1e6, 1),
        "object_store_gb": store_gb,
        "stream_docs_per_s": round(n_docs / stream_s, 1),
        "pinned_consume_s": round(pinned_s, 3),
        "pinned_payload_mb": round(total_bytes / 1e6, 1),
        "spilled_mb": spilled_mb,
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--spill" in sys.argv:
        print(json.dumps(run_spill()))
    else:
        print(json.dumps(run_bench()))
