"""Word-level corpus + relational operators beyond the original registry.

Every query here is DuckDB-oracle-checked (value-hash green in the
driver's gate, not rows-only):

- ``word_repetition``   — per-doc repeated-word quality metric (the
  Gopher-style repetition filter, at word granularity since the synthetic
  corpus has no newlines);
- ``bigram_topk``       — corpus-wide top-20 word bigrams: the classic
  heavy n-gram count (per-batch combiner -> one slim shuffle -> top-k);
- ``source_top_docs``   — per-(lang, source) top-3 docs by size: the
  group-top-k / window-rank operator, computed with a per-batch partial
  top-k so the shuffle moves at most 3 x groups rows per block;
- ``tfidf_top_terms``   — per-doc most-distinctive term via a corpus
  document-frequency join. The ordering is deliberately float-free
  (tf DESC, df ASC, term ASC — "most frequent, then rarest, then
  lexicographic") so the Ray and SQL sides can never drift on log()
  rounding;
- ``hll_distinct_users`` / ``hll_users_by_type`` — HyperLogLog distinct
  counts, global and grouped (stages/sketch.py; dump-twin oracles);
- ``bigram_topk_cms``   — count-min-sketch heavy hitters (dump-twin);
- ``region_revenue``    — three-level star-join tree (combiner -> hash
  join -> broadcast join -> rollup);
- ``customer_order_counts`` — LEFT OUTER join with a null-aware rollup;
- ``events_pivot``      — map-side pivot into typed per-type columns;
- ``corpus_prep``       — the composite filter -> dedup -> split pipeline.

All splitting is on a single literal space on BOTH sides (Python
``str.split(' ')`` == DuckDB ``string_split(text, ' ')``, including the
[''] result for an empty string), so token streams are identical.

Scale notes (100 TB):
- word_repetition is embarrassingly parallel (no shuffle);
- bigram_topk shuffles only the per-batch combiner output — O(distinct
  bigrams per block), not O(words); the final top-k sorts the combined
  group table (distinct-bigram cardinality), standard for n-gram counts;
- source_top_docs shuffles <= 3 rows per group per block;
- tfidf_top_terms is the one true wide op: the (doc_id, term, tf) table
  shuffles twice (term-keyed DF aggregate, then the term join). The DF
  side is NOT broadcast by design — term cardinality is unbounded at
  corpus scale; ``safe_join`` sizes partitions from the smaller side.
"""

from __future__ import annotations

import math
import os
from collections import Counter
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..io import table_nbytes
from ..joins import safe_join
from ..functions.arrowkit import select_rename
from ..remote import remote_fn

_QC = "khl_pdf_ocr_ray.pipelines.queries_corpus"


# --- batch bodies (top-level so remote_fn can import them) ------------------
def _rep_permille(ws) -> int:
    """Repetition metric, fixed-point permille — the SAME double-precision
    expression as the SQL oracles: floor((1.0 - nd/nw) * 1000 + 0.5).
    Shared by word_stats_batch and corpus_prep_partial so the quality
    gate cannot drift between the metric query and the prep filter."""
    nw = len(ws)
    nd = len(set(ws))
    return int(math.floor((1.0 - nd / nw) * 1000 + 0.5))


def word_stats_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"]
    n_words, n_distinct, rep = [], [], []
    for t in batch["text"].to_pylist():
        ws = (t or "").split(" ")
        n_words.append(len(ws))
        n_distinct.append(len(set(ws)))
        rep.append(_rep_permille(ws))
    return pa.table(
        {
            "doc_id": ids,
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "rep_permille": pa.array(rep, pa.int64()),
        }
    )


def bigram_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: bigram -> count. Only distinct bigrams leave
    the batch, so the downstream groupby shuffles combiner rows, not
    one row per word."""
    c: Counter = Counter()
    for t in batch["text"].to_pylist():
        ws = (t or "").split(" ")
        for i in range(len(ws) - 1):
            c[ws[i] + " " + ws[i + 1]] += 1
    return pa.table(
        {
            "bigram": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def source_topk_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial top-3 per (lang, source): at most 3 x groups rows
    survive each batch, so the final shuffle is tiny even when one group
    dominates the corpus."""
    df = batch.select(["lang", "source", "doc_id", "n_chars"]).to_pandas()
    df = df.sort_values(
        ["lang", "source", "n_chars", "doc_id"], ascending=[True, True, False, True]
    )
    top = df.groupby(["lang", "source"], sort=False).head(3)
    # explicit schema: an empty block would otherwise infer null-typed
    # string columns through pandas and break the shuffle's schema union
    return pa.Table.from_pandas(top, preserve_index=False).cast(
        pa.schema(
            [
                ("lang", pa.string()),
                ("source", pa.string()),
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
            ]
        )
    )


def source_topk_final(g: pd.DataFrame) -> pd.DataFrame:
    g = (
        g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .head(3)
        .reset_index(drop=True)
    )
    g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
    return g[["lang", "source", "doc_id", "n_chars", "rank"]]


def tf_partial(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows — each document lives wholly in one input
    row, so per-doc term counts are exact within the batch."""
    ids, terms, tfs = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        for w, n in Counter((t or "").split(" ")).items():
            ids.append(d)
            terms.append(w)
            tfs.append(n)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        }
    )


def top_term_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial argmax: keep the best (tf DESC, df ASC, term ASC)
    row per doc_id within the batch. The selection is commutative and
    associative, so the final per-doc pick over partials equals the global
    pick — and the groupby shuffle moves one row per (doc, block) instead
    of one row per term."""
    df = batch.select(["doc_id", "term", "tf", "df"]).to_pandas()
    best = (
        df.sort_values(["tf", "df", "term"], ascending=[False, True, True])
        .groupby("doc_id", sort=False)
        .head(1)
    )
    return pa.Table.from_pandas(best, preserve_index=False).cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("term", pa.string()),
                ("tf", pa.int64()),
                ("df", pa.int64()),
            ]
        )
    )


def top_term_per_doc(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["tf", "df", "term"], ascending=[False, True, True]).head(1)
    return g[["doc_id", "term", "tf", "df"]]


# --- queries ----------------------------------------------------------------
def _docs(sf_dir: str, columns) -> rd.Dataset:
    from .queries import _t

    return _t(sf_dir, "documents", columns)


def _docs_coalesce(sf_dir: str) -> int:
    """Block-count-derived coalesce width for per-block combiner outputs
    over the documents table (blocks x vocab rows grow with input size —
    a literal repartition(2) would become two giant blocks at scale)."""
    from ..io import coalesce_for_input, input_nbytes

    return coalesce_for_input(input_nbytes(os.path.join(sf_dir, "documents.parquet")))


def q_word_repetition(sf_dir: str) -> rd.Dataset:
    """Per-doc repeated-word ratio (quality filter input). No shuffle."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QC, "word_stats_batch"), batch_format="pyarrow"
    )


def q_bigram_topk(sf_dir: str) -> rd.Dataset:
    """Corpus-wide top-20 bigrams; deterministic (count DESC, bigram ASC)."""
    return (
        _docs(sf_dir, ["text"])
        .map_batches(remote_fn(_QC, "bigram_partial"), batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(20)
    )


def q_source_top_docs(sf_dir: str) -> rd.Dataset:
    """Window-rank / group-top-k: top-3 docs per (lang, source)."""
    return (
        _docs(sf_dir, ["doc_id", "lang", "source", "n_chars"])
        .map_batches(remote_fn(_QC, "source_topk_partial"), batch_format="pyarrow")
        .groupby(["lang", "source"])
        .map_groups(remote_fn(_QC, "source_topk_final"), batch_format="pandas")
    )


def q_tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    """Per-doc top term by (tf DESC, df ASC, term ASC) over a corpus-wide
    document-frequency join (df computed from the same tf table: each
    (doc_id, term) appears exactly once, so Count == document frequency).

    The term join is HOT-KEY skewed by nature — stopword-ish terms appear
    in nearly every document, so a plain hash join puts a constant
    fraction of the whole positional table in a few partitions. It runs
    through joins.skew_join: terms in >= half the docs broadcast their
    one-row df slice; only the long tail shuffles. The fraction-based
    threshold keeps the broadcast slice tiny at ANY corpus size (a fixed
    count would make most of the vocabulary 'hot' at 100 TB)."""
    tf = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QC, "tf_partial"), batch_format="pyarrow"
    ).materialize()  # df below derives from tf's plan; without this the
    # full-corpus tokenization would execute twice (once per join side)
    df = (
        tf.groupby("term")
        .aggregate(Count(alias_name="df"))
        .rename_columns({"term": "term_r"})  # distinct key name for the join
    )
    from ..joins import skew_join

    n_docs = _docs(sf_dir, ["doc_id"]).count()  # parquet metadata, no scan
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
        ]
    )
    joined = skew_join(
        tf,
        df,
        key="term",
        right_key="term_r",
        out_schema=out_schema,
        hot_count_threshold=max(2, n_docs // 2),
    )
    assert joined is not None  # documents is never empty
    return (
        joined.map_batches(remote_fn(_QC, "top_term_partial"), batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(remote_fn(_QC, "top_term_per_doc"), batch_format="pandas")
    )


# --- HLL distinct-count sketch ---------------------------------------------
def hll_users_partial(batch: pa.Table) -> pa.Table:
    from ..stages.sketch import hll_partial_batch

    return hll_partial_batch(batch, "user_id")


def q_hll_distinct_users(sf_dir: str) -> pa.Table:
    """HyperLogLog distinct user_id estimate over events (stages/sketch.py).

    Per-batch sparse register partials (<= 4096 rows per batch) -> one
    register-keyed Max groupby -> a 4096-row driver merge. The register
    merge is order-independent, so the result is bit-identical to the
    sequential twin the dump oracle holds — the driver hash-checks an
    APPROXIMATE algorithm exactly."""
    from ..stages.sketch import hll_estimate

    regs = (
        _t_events(sf_dir)
        .map_batches(remote_fn(_QC, "hll_users_partial"), batch_format="pyarrow")
        .groupby("register")
        .aggregate(Max("rank", alias_name="rank"))
    )
    df = regs.to_pandas()  # bounded merge: at most 4096 rows
    est = hll_estimate(df)
    return pa.table({"distinct_users_est": pa.array([est], pa.int64())})


def _t_events(sf_dir: str) -> rd.Dataset:
    from .queries import _t

    return _t(sf_dir, "events", ["user_id"])


def hll_by_type_partial(batch: pa.Table) -> pa.Table:
    """Per-batch GROUPED register partials: (event_type, register, rank)."""
    from ..stages.sketch import hll_partial

    df = batch.select(["event_type", "user_id"]).to_pandas()
    out = []
    for etype, g in df.groupby("event_type", sort=False):
        part = hll_partial(g["user_id"].to_numpy().astype(np.int64))
        part.insert(0, "event_type", etype)
        out.append(part)
    merged = (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame({"event_type": [], "register": [], "rank": []})
    )
    return pa.Table.from_pandas(merged, preserve_index=False).cast(
        pa.schema(
            [("event_type", pa.string()), ("register", pa.int64()), ("rank", pa.int64())]
        )
    )


def hll_finalize_group(g: pd.DataFrame) -> pd.DataFrame:
    from ..stages.sketch import hll_estimate

    est = hll_estimate(g[["register", "rank"]])
    return pd.DataFrame(
        {
            "event_type": [g["event_type"].iloc[0]],
            "distinct_users_est": pd.array([est], dtype="int64"),
        }
    )


def q_hll_users_by_type(sf_dir: str) -> rd.Dataset:
    """GROUPED HyperLogLog: distinct users per event_type — the sketch
    composed with a groupby. Per-batch grouped register partials (at most
    types x 4096 rows per batch), one (type, register)-keyed Max shuffle,
    then a per-type finalize whose group never exceeds 4096 rows. Same
    order-independence argument as hll_distinct_users -> dump-twin
    hash-checkable."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(remote_fn(_QC, "hll_by_type_partial"), batch_format="pyarrow")
        .groupby(["event_type", "register"])
        .aggregate(Max("rank", alias_name="rank"))
        .groupby("event_type")
        .map_groups(remote_fn(_QC, "hll_finalize_group"), batch_format="pandas")
    )


# --- count-min-sketch heavy hitters ------------------------------------------
def cms_cells_partial(batch: pa.Table) -> pa.Table:
    from ..stages.sketch import cms_partial

    df = cms_partial(
        batch["bigram"].to_pylist(),
        batch["n"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def cms_estimate_batch(batch: pa.Table, cells_ref) -> pa.Table:
    import ray as _ray

    from ..stages.sketch import cms_query

    cells = _ray.get(cells_ref)
    keys = batch["bigram"].to_pylist()
    est = cms_query(cells, keys)
    return pa.table(
        {"bigram": pa.array(keys, pa.string()), "n_est": pa.array(est, pa.int64())}
    )


def q_bigram_topk_cms(sf_dir: str) -> rd.Dataset:
    """Top-20 bigrams by count-min-sketch ESTIMATE (stages/sketch.py).

    Plan: the bigram combiner partials are materialized once; (a) their
    hashed cell increments merge through one bounded groupby (at most
    d x w = 65k cells, like HLL's 4096 registers) into a sketch that is
    broadcast back with ray.put; (b) the distinct-bigram key set probes
    the sketch map-side and a sort+limit takes the top 20 by
    (estimate DESC, bigram ASC). Cell-wise sum is order-independent, so
    the estimates — and hence the driver's dump-oracle hash — are
    bit-identical to a sequential pass regardless of block layout.

    Scale honesty: enumerating candidates as the distinct key set keeps
    the plan deterministic but shuffles each distinct key once; a
    production deployment over unbounded keys would instead take
    per-batch local top-k candidate unions (layout-dependent output) or
    a threshold pass — the sketch's memory bound (d x w counters
    regardless of key cardinality) is what this operator demonstrates."""
    import ray as _ray

    partials = (
        _docs(sf_dir, ["text"])
        .map_batches(remote_fn(_QC, "bigram_partial"), batch_format="pyarrow")
        .materialize()
    )
    cells = (
        partials.map_batches(remote_fn(_QC, "cms_cells_partial"), batch_format="pyarrow")
        .groupby(["row", "col"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded merge: <= CMS_D * CMS_W rows
    )
    cells_ref = _ray.put(cells)
    distinct = (
        partials.groupby("bigram")
        .aggregate(Count(alias_name="_nb"))
        .select_columns(["bigram"])
    )
    return (
        distinct.map_batches(
            remote_fn(_QC, "cms_estimate_batch", cells_ref=cells_ref),
            batch_format="pyarrow",
        )
        .sort(["n_est", "bigram"], descending=[True, False])
        .limit(20)
    )


# --- multi-stage join tree ---------------------------------------------------
def region_enrich(batch: pa.Table, nat_to_region: dict) -> pa.Table:
    keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "r_name": pa.array([nat_to_region[int(k)] for k in keys], pa.string()),
            "cust_cents": batch["cust_cents"],
            "n_orders": batch["n_orders"],
        }
    )


def q_region_revenue(sf_dir: str) -> rd.Dataset:
    """Three-level join tree mixing both join strategies: orders are
    pre-aggregated per customer (combiner -> the shuffle moves |customers|
    rows, not |orders|), hash-joined to the customer dimension
    (mid-size: too big to broadcast at corpus scale), then the tiny
    nation->region map is broadcast map-side, finishing in a 5-group
    rollup. The plan a 100 TB star query uses verbatim."""
    from .queries import _t

    per_cust = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries", "orders_cents_project"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("o_custkey")
        .aggregate(
            Sum("price_cents", alias_name="cust_cents"),
            Count(alias_name="n_orders"),
        )
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = safe_join(
        per_cust, cust, on=("o_custkey",), right_on=("c_custkey",),
        assume_non_empty=True,  # orders/customer never empty
        left_nbytes=table_nbytes(sf_dir, "customer"),  # per-cust aggregate
        right_nbytes=table_nbytes(sf_dir, "customer"),
    )

    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    ).to_pydict()
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    ).to_pydict()
    r_name = dict(zip(region["r_regionkey"], region["r_name"]))
    nat_to_region = {
        int(k): r_name[r]
        for k, r in zip(nation["n_nationkey"], nation["n_regionkey"])
    }
    return (
        joined.map_batches(
            remote_fn(_QC, "region_enrich", nat_to_region=nat_to_region),
            batch_format="pyarrow",
        )
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("n_orders", alias_name="n_orders"),
            Sum("cust_cents", alias_name="revenue_cents"),
        )
    )


# --- rollup (GROUPING SETS: (lang, source), (lang), ()) ----------------------
def rollup_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner emitting ALL THREE grouping levels at once (the
    'ALL' sentinel marks rolled-up dimensions), so one shuffle carries the
    whole rollup instead of three passes over the input."""
    t = batch.select(["lang", "source", "n_chars"]).to_pandas()
    levels = []
    g2 = t.groupby(["lang", "source"], as_index=False).agg(
        n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
    )
    levels.append(g2.assign(level=np.int64(2)))
    g1 = t.groupby(["lang"], as_index=False).agg(
        n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
    )
    levels.append(g1.assign(source="ALL", level=np.int64(1)))
    g0 = pd.DataFrame(
        {
            "lang": ["ALL"],
            "source": ["ALL"],
            "n_docs": [len(t)],
            "total_chars": [t["n_chars"].sum()],
            "level": [0],
        }
    )
    levels.append(g0)
    out = pd.concat(levels, ignore_index=True)[
        ["lang", "source", "level", "n_docs", "total_chars"]
    ]
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [
                ("lang", pa.string()),
                ("source", pa.string()),
                ("level", pa.int64()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
            ]
        )
    )


def q_corpus_rollup(sf_dir: str) -> rd.Dataset:
    """GROUPING SETS rollup over documents: (lang, source), (lang), ()
    totals in ONE result, rolled-up dimensions marked 'ALL'. The combiner
    emits every level map-side, so the single shuffle moves at most
    (groups + langs + 1) rows per block — one pass over the input for a
    three-level aggregate."""
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["lang", "source", "n_chars"])
        .map_batches(remote_fn(_QC, "rollup_partial"), batch_format="pyarrow")
        .repartition(2)  # few groups; non-empty reduce partitions
        .groupby(["lang", "source", "level"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )


# --- pivot (rows -> typed count columns) -------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_partial(batch: pa.Table) -> pa.Table:
    """Per-batch pivot combiner: one row per day with per-type counts —
    the pivot happens map-side, so the shuffle moves |days| x |types-wide|
    rows per block instead of one row per event."""
    import pyarrow.compute as pc

    from .queries_agg import _floordiv

    us = pc.cast(batch["ts"], pa.int64())
    day = pc.cast(_floordiv(us, 86_400_000_000), pa.int64())  # floored like
    # the oracle's // (pre-epoch timestamps bucket to day -1, not day 0)
    t = pa.table({"day": day, "event_type": batch["event_type"]})
    g = select_rename(
        t.group_by(["day", "event_type"]).aggregate([("event_type", "count")]),
        day="day",
        event_type="event_type",
        n="event_type_count",
    ).to_pandas()
    wide = (
        g.pivot_table(index="day", columns="event_type", values="n",
                      aggfunc="sum", fill_value=0)
        .reindex(columns=list(EVENT_TYPES), fill_value=0)
        .reset_index()
    )
    wide.columns = ["day"] + [f"n_{t}" for t in EVENT_TYPES]
    return pa.Table.from_pandas(wide, preserve_index=False).cast(
        pa.schema([("day", pa.int64())] + [(f"n_{t}", pa.int64()) for t in EVENT_TYPES])
    )


def q_events_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot: per-day event counts spread into one column per event type
    (rows -> typed columns, the reshape §2 otherwise lacks). Map-side
    pivot combiner, then a |days|-row Sum groupby."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["ts", "event_type"])
        .map_batches(remote_fn(_QC, "pivot_partial"), batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES]
        )
    )


def melt_batch(batch: pa.Table) -> pa.Table:
    """Wide per-day counts -> long (day, event_type, n) rows, zero rows
    dropped (the long form only has observed combinations)."""
    import pyarrow.compute as pc

    day = pc.cast(batch["day"], pa.int64())
    parts = []
    for name in batch.column_names:
        if not name.startswith("n_"):
            continue
        n = pc.cast(batch[name], pa.int64())
        t = pa.table(
            {
                "day": day,
                "event_type": pa.array([name[2:]] * len(batch), pa.string()),
                "n": n,
            }
        )
        parts.append(t.filter(pc.greater(n, 0)))
    return pa.concat_tables(parts)


def q_events_unpivot(sf_dir: str) -> rd.Dataset:
    """Unpivot/melt: the inverse reshape — pivot the events to typed
    columns, then melt back to long form. Oracle is the direct long-form
    groupby, so the gate certifies pivot->unpivot == identity. The melt
    is map-only over the (already |days|-sized) pivot output."""
    return q_events_pivot(sf_dir).map_batches(
        remote_fn(_QC, "melt_batch"), batch_format="pyarrow"
    )


def moments_partial(batch: pa.Table) -> pa.Table:
    """Per-(type, batch) exact integer moments: n, sum cents, sum cents^2.
    Integer sums are order-independent, so the hash cannot drift; mean and
    variance are cheap driver-side derivations ((s2 - s^2/n)/n) left to
    the caller to keep the hashed result float-free. cents^2 sums need
    int128/HUGEINT headroom beyond ~10^9 rows per group — noted."""
    import pyarrow.compute as pc

    cents = pc.cast(
        pc.floor(pc.add(pc.multiply(batch["value"], 100.0), 0.5)), pa.int64()
    )
    t = pa.table(
        {
            "event_type": batch["event_type"],
            "cents": cents,
            "cents_sq": pc.multiply(cents, cents),
        }
    )
    g = t.group_by(["event_type"]).aggregate(
        [("cents", "count"), ("cents", "sum"), ("cents_sq", "sum")]
    )
    return select_rename(
        g,
        event_type="event_type",
        n="cents_count",
        sum_cents="cents_sum",
        sum_sq_cents="cents_sq_sum",
    )


def q_events_value_moments(sf_dir: str) -> rd.Dataset:
    """Grouped mean/variance feed: exact integer first and second moments
    of the value column per event type (the std/var aggregate)."""
    from .queries import _t

    return (
        _t(sf_dir, "events", ["event_type", "value"])
        .map_batches(remote_fn(_QC, "moments_partial"), batch_format="pyarrow")
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("sum_sq_cents", alias_name="sum_sq_cents"),
        )
    )


def seg_prio_partial(batch: pa.Table) -> pa.Table:
    g = (
        batch.select(["c_mktsegment", "o_orderpriority"])
        .group_by(["c_mktsegment", "o_orderpriority"])
        .aggregate([("o_orderpriority", "count")])
    )
    return select_rename(
        g,
        c_mktsegment="c_mktsegment",
        o_orderpriority="o_orderpriority",
        n_orders="o_orderpriority_count",
    )


def q_segment_priority_matrix(sf_dir: str) -> pd.DataFrame:
    """CROSS JOIN: the full segment x priority matrix with zero-filled
    counts (the one join type the registry otherwise lacks). The fact
    table flows through a distributed hash join + combiner; the cross
    product itself is over the two DISTINCT dimension sets — bounded by
    dimension cardinality (|segments| x |priorities|), so the matrix
    assembly is driver-side by design, like every dimension table."""
    from .queries import _t

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = safe_join(
        orders, cust, on=("o_custkey",), right_on=("c_custkey",),
        assume_non_empty=True,  # both driver tables are non-empty
        left_nbytes=table_nbytes(sf_dir, "orders"),
        right_nbytes=table_nbytes(sf_dir, "customer"),
    )
    obs = (
        joined.map_batches(remote_fn(_QC, "seg_prio_partial"), batch_format="pyarrow")
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .to_pandas()  # <= |segments| x |priorities| rows
    )
    segs = sorted(obs["c_mktsegment"].unique())
    prios = sorted(obs["o_orderpriority"].unique())
    full = pd.MultiIndex.from_product(
        [segs, prios], names=["c_mktsegment", "o_orderpriority"]
    ).to_frame(index=False)
    out = full.merge(obs, how="left", on=["c_mktsegment", "o_orderpriority"])
    out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
    return out


# --- left-outer join (customers with zero orders kept) -----------------------
def outer_counts_partial(batch: pa.Table) -> pa.Table:
    """Null-aware combiner after the outer join: unmatched customers carry
    a null n_orders — count them separately and coalesce to 0 for sums."""
    import pyarrow.compute as pc

    n_orders = batch["n_orders"]
    is_null = pc.is_null(n_orders)
    t = pa.table(
        {
            "c_mktsegment": batch["c_mktsegment"],
            "no_orders": pc.cast(is_null, pa.int64()),
            "n_orders": pc.fill_null(n_orders, 0),
        }
    )
    g = t.group_by(["c_mktsegment"]).aggregate(
        [("no_orders", "count"), ("no_orders", "sum"), ("n_orders", "sum")]
    )
    return select_rename(
        g,
        c_mktsegment="c_mktsegment",
        n_customers="no_orders_count",
        n_no_orders="no_orders_sum",
        total_orders="n_orders_sum",
    )


def null_orders_append(batch: pa.Table) -> pa.Table:
    """Empty-orders fallback: every customer with a null n_orders (what a
    left outer join against an empty right side yields)."""
    return batch.append_column(
        "n_orders", pa.array([None] * batch.num_rows, pa.int64())
    )


def q_customer_order_counts(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER join: every customer keeps a row even with zero orders
    (the join type §2.4 otherwise lacks; semi/anti/inner/broadcast are
    covered elsewhere). Orders pre-aggregate per customer first, so the
    outer join moves one row per customer per side; the null-aware
    combiner then rolls up per market segment."""
    from .queries import _t

    per_cust = (
        _t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    try:
        joined = safe_join(
            cust, per_cust, on=("c_custkey",), right_on=("o_custkey",),
            join_type="left_outer",
        )
    except NotImplementedError:
        # orders empty: a left outer join keeps every customer with a null
        # n_orders — synthesize that directly (safe_join cannot)
        joined = cust.map_batches(
            remote_fn(_QC, "null_orders_append"), batch_format="pyarrow"
        )
    assert joined is not None  # customer is never empty
    return (
        joined.map_batches(remote_fn(_QC, "outer_counts_partial"), batch_format="pyarrow")
        .repartition(2)  # few segment groups; non-empty reduce partitions
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("n_no_orders", alias_name="n_no_orders"),
            Sum("total_orders", alias_name="total_orders"),
        )
    )


# --- composite training-data prep pipeline ----------------------------------
# duplicated from queries.py to avoid a circular import at module load;
# queries.py asserts equality at registration time.
PREP_SPLIT_MULT = 2654435761
PREP_SPLIT_TRAIN_PCT = 90
PREP_REP_MAX_PERMILLE = 600  # drop highly repetitive docs (quality gate)


def corpus_prep_partial(batch: pa.Table) -> pa.Table:
    """Quality filter + content hash in one pass: keep docs whose
    repeated-word ratio is <= PREP_REP_MAX_PERMILLE, emit
    (text_hash, doc_id, n_chars)."""
    import hashlib

    ids, chars, hashes = [], [], []
    for d, t, nc in zip(
        batch["doc_id"].to_pylist(),
        batch["text"].to_pylist(),
        batch["n_chars"].to_pylist(),
    ):
        ws = (t or "").split(" ")
        if _rep_permille(ws) <= PREP_REP_MAX_PERMILLE:
            ids.append(d)
            chars.append(nc)
            hashes.append(hashlib.md5((t or "").encode("utf-8")).hexdigest())
    return pa.table(
        {
            "text_hash": pa.array(hashes, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(chars, pa.int64()),
        }
    )


def q_corpus_prep(sf_dir: str) -> rd.Dataset:
    """The composite flagship a training-data pipeline runs end-to-end:
    quality filter (word repetition) -> exact dedup (min doc_id survives
    per content hash) -> deterministic train/test assignment -> per-split
    totals. Every stage is the already-checked operator; this query checks
    their COMPOSITION against one SQL statement.

    Scale: filter+hash are embarrassingly parallel; the dedup groupby
    shuffles (16-byte digest, id, chars) triples only; the split summary
    is a per-batch combiner into a 2-group aggregate."""
    surv = (
        _docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(remote_fn(_QC, "corpus_prep_partial"), batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(
            Min("doc_id", alias_name="doc_id"), Min("n_chars", alias_name="n_chars")
        )
    )
    # queries.split_partial applies the same residue rule as
    # train_test_split (constants asserted equal at registration)
    return (
        surv.map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries", "split_partial"),
            batch_format="pyarrow",
        )
        .repartition(2)  # two groups; non-empty reduce partitions
        .groupby("split")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("total_chars", alias_name="total_chars"))
    )


WATCHLIST = (("en", 1), ("ru", 2), ("xx", 3))  # 'ru'/'xx' absent from the corpus


def watchlist_coalesce(batch: pa.Table) -> pa.Table:
    """Post-full-outer projection: Ray's join already unifies the key
    into one ``lang`` column; replace the null sides with concrete
    sentinels (0) so the output is null-free on both engines."""
    import pyarrow.compute as pc

    zero = pa.scalar(0, pa.int64())
    return pa.table(
        {
            "lang": pc.cast(batch["lang"], pa.string()),
            "n_docs": pc.fill_null(pc.cast(batch["n_docs"], pa.int64()), zero),
            "priority": pc.fill_null(pc.cast(batch["priority"], pa.int64()), zero),
        }
    )


def q_lang_watchlist_full(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join: per-lang doc counts x a fixed language watchlist.
    Exercises both unmatched sides (corpus langs off the watchlist AND
    watchlist langs absent from the corpus). The aggregate side shrinks to
    |langs| rows before the join, so the exchange is tiny regardless of
    corpus size; the watchlist is a literal constant table."""
    counts = (
        _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n_docs"))
    )
    watch = rd.from_arrow(
        pa.table(
            {
                "wlang": pa.array([w for w, _ in WATCHLIST], pa.string()),
                "priority": pa.array([p for _, p in WATCHLIST], pa.int64()),
            }
        )
    )
    joined = safe_join(
        counts, watch, on=("lang",), right_on=("wlang",), join_type="full_outer"
    )
    assert joined is not None  # neither side is ever empty
    return joined.map_batches(
        remote_fn(_QC, "watchlist_coalesce"), batch_format="pyarrow"
    )


# --- unigram-LM perplexity scoring (CCNet-style quality signal) --------------
LM_SCALE = 1 << 20


def lm_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch unigram counts (the LM-training combiner)."""
    from collections import Counter

    c = Counter()
    for t in batch["text"].to_pylist():
        c.update((t or "").split(" "))
    terms = sorted(c)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "n": pa.array([c[w] for w in terms], pa.int64()),
        }
    )


def lm_model_from_counts(counts: pd.DataFrame) -> Dict[str, int]:
    """(term, n) -> fixed-point log2 probabilities: logp_fx[term] =
    floor(log2(n/total) * 2^20 + 0.5). Shared by the distributed plan and
    the sequential dump twin so both compute the identical doubles
    (per-term independent ops — no accumulation order involved)."""
    total = float(int(counts["n"].sum()))
    terms = counts["term"].to_numpy()
    p = counts["n"].to_numpy(dtype=np.float64) / total
    fx = np.floor(np.log2(p) * LM_SCALE + 0.5).astype(np.int64)
    return {str(t): int(v) for t, v in zip(terms, fx)}


def lm_score_batch(batch: pa.Table, model: Dict[str, int]) -> pa.Table:
    """Per-doc negative log-likelihood under the broadcast unigram model:
    integer sum of per-token fixed-point log-probs (order-independent, so
    any batching gives identical bits). The corpus-trained model covers
    every token; unseen tokens (scoring fresh data) take the floor
    penalty min(logp)-2^20 (one bit worse than the rarest seen term)."""
    floor_fx = min(model.values()) - LM_SCALE
    ids, nts, lps = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = (t or "").split(" ")
        ids.append(d)
        nts.append(len(ws))
        lps.append(sum(model.get(w, floor_fx) for w in ws))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nts, pa.int64()),
            "neg_logprob_fx": pa.array([-v for v in lps], pa.int64()),
        }
    )


def q_unigram_logprob(sf_dir: str) -> rd.Dataset:
    """CCNet-style LM quality scoring: train a unigram LM on the corpus
    (distributed count combiner -> term-keyed Sum), broadcast the
    fixed-point log-prob table, score every document map-only. The score
    is the exact integer sum of per-token logp_fx, so the dump twin
    (state/oracle_dump_near.py) reproduces it bit-for-bit. 100 TB: the
    count shuffle carries (term, n) combiner rows; the model table is a
    one-time ray.put broadcast when the vocabulary outgrows task kwargs
    (the real CCNet model is a KenLM binary loaded once per actor — the
    same broadcast-once pattern as stages/extract.py's OCR engine)."""
    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(remote_fn(_QC, "lm_count_partial"), batch_format="pyarrow")
        .repartition(_docs_coalesce(sf_dir))  # blocks x vocab combiner rows
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocabulary-sized
    )
    model = lm_model_from_counts(counts)
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QC, "lm_score_batch", model=model), batch_format="pyarrow"
    )


# --- bigram LM (add-one smoothed) --------------------------------------------
def lm2_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch LM-training combiner for the BIGRAM model: unigram rows
    tagged w2='' (vocabulary + context feed) and adjacent-pair rows.
    Tokens are the non-empty space-split words (an LM has no empty
    token); pairs never span documents."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in batch["text"].to_pylist():
        ws = [w for w in (t or "").split(" ") if w]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    w1s = sorted(uni) + [a for a, _ in sorted(bi)]
    w2s = [""] * len(uni) + [b for _, b in sorted(bi)]
    ns = [uni[w] for w in sorted(uni)] + [bi[k] for k in sorted(bi)]
    return pa.table(
        {
            "w1": pa.array(w1s, pa.string()),
            "w2": pa.array(w2s, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def lm2_model_from_counts(counts: pd.DataFrame):
    """Reduced (w1, w2, n) rows -> the add-one-smoothed bigram model:
    p(w2|w1) = (n12 + 1) / (ctx1 + V), V = unigram vocabulary size,
    ctx1 = successor occurrences of w1. Fixed-point per-pair doubles
    floor(log2(p) * 2^20 + 0.5) — independent per pair, no accumulation
    order, so the distributed plan and the sequential twin compute
    identical bits. Returns (pair logp table, per-context unseen
    penalty, OOV-context penalty)."""
    uni = counts[counts["w2"] == ""]
    vocab = int(uni.shape[0])
    bi = counts[counts["w2"] != ""]
    ctx = bi.groupby("w1")["n"].sum()
    model: Dict[str, int] = {}
    ctx_arr = ctx.reindex(bi["w1"]).to_numpy(dtype=np.float64)
    p = (bi["n"].to_numpy(dtype=np.float64) + 1.0) / (ctx_arr + vocab)
    fx = np.floor(np.log2(p) * LM_SCALE + 0.5).astype(np.int64)
    for w1, w2, v in zip(bi["w1"].to_numpy(), bi["w2"].to_numpy(), fx):
        model[f"{w1} {w2}"] = int(v)
    ctx_fx: Dict[str, int] = {
        str(w): int(np.floor(np.log2(1.0 / (c + vocab)) * LM_SCALE + 0.5))
        for w, c in ctx.items()
    }
    oov_fx = int(np.floor(np.log2(1.0 / max(vocab, 1)) * LM_SCALE + 0.5))
    return model, ctx_fx, oov_fx


def lm2_score_batch(batch: pa.Table, model_ref) -> pa.Table:
    """Per-doc bigram NLL under the broadcast model: integer sum of
    per-pair fixed-point log-probs (order-independent — any batching
    gives identical bits). Unseen pairs with a seen context take the
    context's add-one floor 1/(ctx+V); unseen contexts take 1/V."""
    import ray

    model, ctx_fx, oov_fx = (
        ray.get(model_ref)
        if not isinstance(model_ref, tuple)
        else model_ref
    )
    ids, nbs, lps = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = [w for w in (t or "").split(" ") if w]
        nll = 0
        for a, b in zip(ws, ws[1:]):
            v = model.get(f"{a} {b}")
            if v is None:
                v = ctx_fx.get(a, oov_fx)
            nll -= v
        ids.append(d)
        nbs.append(max(len(ws) - 1, 0))
        lps.append(nll)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(nbs, pa.int64()),
            "nll2_fx": pa.array(lps, pa.int64()),
        }
    )


def q_bigram_logprob(sf_dir: str) -> rd.Dataset:
    """KenLM-style bigram quality scoring (one smoothing order up from
    unigram_logprob): train add-one-smoothed bigram probabilities on the
    corpus (distributed gram combiner -> ONE (w1, w2)-keyed Sum),
    broadcast the fixed-point model once via ray.put, score every
    document map-only. 100 TB: the gram exchange carries per-batch
    distinct-gram partials (the n-gram-count bound); the model table is
    distinct-bigram-sized — the deployment path prunes it (min-count /
    quantized KenLM binary) and hosts it in an actor pool exactly like
    stages/extract.py's OCR engine, which changes nothing upstream."""
    import ray

    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(remote_fn(_QC, "lm2_count_partial"), batch_format="pyarrow")
        .repartition(_docs_coalesce(sf_dir))  # blocks x grams combiner rows
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # distinct-gram-sized (model working set)
    )
    ref = ray.put(lm2_model_from_counts(counts))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QC, "lm2_score_batch", model_ref=ref),
        batch_format="pyarrow",
    )


# --- per-doc character entropy (gibberish / encoding-noise signal) ------------
def char_entropy_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Shannon entropy of the character distribution, fixed-point:
    ent_fx = sum over chars of floor(cnt*(log2 n - log2 cnt)*2^20 + 0.5)
    — each per-char double floors to int64 BEFORE the order-independent
    sum, so the value is batching- and engine-invariant (a naive float
    entropy sum would hash differently per summation order). The true
    entropy in bits is ent_fx / (n * 2^20). Map-only."""
    from collections import Counter

    ids, nch, ents = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        t = t or ""
        n = len(t)
        c = Counter(t)
        e = sum(
            int(math.floor(v * (math.log2(n) - math.log2(v)) * LM_SCALE + 0.5))
            for v in c.values()
        ) if n else 0
        ids.append(d)
        nch.append(n)
        ents.append(e)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars_t": pa.array(nch, pa.int64()),
            "ent_fx": pa.array(ents, pa.int64()),
        }
    )


def q_char_entropy(sf_dir: str) -> rd.Dataset:
    """Character-distribution entropy per document — the cheap
    gibberish / encoding-noise / compressed-blob detector of web-text
    quality filtering. Embarrassingly parallel."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QC, "char_entropy_batch"), batch_format="pyarrow"
    )


SQL_CHAR_ENTROPY = f"""
WITH ch AS (
  SELECT doc_id, len(coalesce(text, '')) AS n,
         unnest(string_split(coalesce(text, ''), '')) AS c
  FROM documents
  WHERE len(coalesce(text, '')) > 0),  -- '' splits to [''] and log2(0) poisons
cnt AS (SELECT doc_id, any_value(n) AS n, c, count(*) AS v
        FROM ch GROUP BY doc_id, c),
e AS (SELECT doc_id, any_value(n) AS n,
             CAST(sum(CAST(floor(v * (log2(n) - log2(v)) * {LM_SCALE} + 0.5)
                           AS BIGINT)) AS BIGINT) AS ent_fx
      FROM cnt GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(e.n, 0) AS BIGINT) AS n_chars_t,
       coalesce(e.ent_fx, 0) AS ent_fx
FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
"""


# --- distributed-trained domain classifier (fastText-style LR) ----------------
LR_SCALE = 1 << 20
LR_ITERS = 5
LR_RATE_NUM, LR_RATE_DEN = 10, 1  # lr = 10.0 (binary presence features)
LR_ZCLIP = 50.0  # sigmoid argument clip (exp overflow guard; same both engines)
LR_MARKER = " quality marker alpha"  # planted positive-class signal
LR_LABEL_MOD = 3  # doc_id % 3 == 0 -> positive class


def lr_train_input(batch: pa.Table) -> pa.Table:
    """Planted training table: every doc_id % LR_LABEL_MOD == 0 doc gets
    the marker tokens appended and label 1 — the same plant-a-signal
    convention as stages.dedup.docs_with_variants (the corpus vocabulary
    carries no natural linearly-separable label: its words are seeded
    independently of lang/source). What the operator certifies is the
    DISTRIBUTED training loop converging on the signal."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(
                [
                    (t or "") + LR_MARKER if d % LR_LABEL_MOD == 0 else (t or "")
                    for d, t in zip(ids, texts)
                ],
                pa.string(),
            ),
            "y": pa.array(
                [1 if d % LR_LABEL_MOD == 0 else 0 for d in ids], pa.int64()
            ),
        }
    )


def lr_doc_features(text: str) -> "np.ndarray":
    """Dense (DSIR_B,) float64 BINARY presence vector of the shared
    hashed-n-gram featurization — bag of distinct hashed n-grams, the
    fastText-style linear-classifier feature map (raw counts are
    ill-conditioned for full-batch GD: common-word magnitudes drown the
    class signal; measured on this corpus)."""
    b = dsir_feature_buckets(text)
    return (np.bincount(b, minlength=DSIR_B) > 0).astype(np.float64)


def lr_grad_partial(
    batch: pa.Table, w: List[int], b_fx: int
) -> pa.Table:
    """Per-batch fixed-point logistic-loss gradient combiner. Per doc:
    p = sigmoid(w.x + b) in float64 (identical operands on both engines —
    w is the broadcast fixed-point model), then each nonzero feature's
    contribution floors to int64: g_fx[j] = floor((p - y) * x_j * 2^20 +
    0.5). Integer sums are order-independent, so any batching matches the
    sequential twin bit-for-bit. Bias gradient rides along as bucket -1."""
    wv = np.asarray(w, dtype=np.int64).astype(np.float64) / LR_SCALE
    bias = float(b_fx) / LR_SCALE
    g = np.zeros(DSIR_B, dtype=np.int64)
    gb = 0
    for yv, text in zip(batch["y"].to_pylist(), batch["text"].to_pylist()):
        x = lr_doc_features(text)
        y = float(yv)
        z = min(max(float(x @ wv) + bias, -LR_ZCLIP), LR_ZCLIP)
        p = 1.0 / (1.0 + np.exp(-z))
        g += np.floor((p - y) * x * LR_SCALE + 0.5).astype(np.int64)
        gb += int(np.floor((p - y) * LR_SCALE + 0.5))
    nz = np.nonzero(g)[0]
    return pa.table(
        {
            "bucket": pa.array(np.concatenate([nz, [-1]]), pa.int64()),
            "g_fx": pa.array(np.concatenate([g[nz], [gb]]), pa.int64()),
            "n": pa.array([len(batch)] * (len(nz) + 1), pa.int64()),
        }
    )


def lr_update(w: List[int], b_fx: int, agg: pd.DataFrame) -> tuple:
    """Driver step: w_fx -= lr * G_fx / n (integer floor division —
    deterministic; shared with the sequential twin)."""
    # total doc count comes from the bias row: bucket -1 is emitted by
    # EVERY combiner batch, so its summed n is the full corpus count (a
    # feature bucket's n only sums the batches where it was nonzero)
    n = int(agg.loc[agg["bucket"] == -1, "n"].iloc[0])
    wv = np.asarray(w, dtype=np.int64)
    feats = agg[agg["bucket"] >= 0]
    idx = feats["bucket"].to_numpy(dtype=np.int64)
    gfx = feats["g_fx"].to_numpy(dtype=np.int64)
    wv[idx] = wv[idx] - (LR_RATE_NUM * gfx) // (LR_RATE_DEN * n)
    gb = int(agg.loc[agg["bucket"] == -1, "g_fx"].sum())
    b_new = b_fx - (LR_RATE_NUM * gb) // (LR_RATE_DEN * n)
    return wv.tolist(), b_new


def lr_score_batch(batch: pa.Table, w: List[int], b_fx: int) -> pa.Table:
    """Map-only scoring under the broadcast model: per-doc probability as
    fixed-point int plus the >= 0.5 prediction."""
    wv = np.asarray(w, dtype=np.int64).astype(np.float64) / LR_SCALE
    bias = float(b_fx) / LR_SCALE
    ids, ps, preds = [], [], []
    for d, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        x = lr_doc_features(text)
        z = min(max(float(x @ wv) + bias, -LR_ZCLIP), LR_ZCLIP)
        p = 1.0 / (1.0 + np.exp(-z))
        ids.append(d)
        ps.append(int(np.floor(p * LR_SCALE + 0.5)))
        preds.append(bool(p >= 0.5))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "y": batch["y"],
            "prob_fx": pa.array(ps, pa.int64()),
            "pred_target": pa.array(preds, pa.bool_()),
        }
    )


def q_domain_classifier(sf_dir: str) -> rd.Dataset:
    """fastText-style text classifier, trained DISTRIBUTED: logistic
    regression over the shared hashed-n-gram presence features — the
    quality/domain scorer modern corpus pipelines train and apply at
    scale (the Llama-era web filters). Labels and their signal are
    planted (lr_train_input) because the synthetic vocabulary carries no
    natural linearly-separable label; the certified artifact is the
    training loop itself, and the output carries y so the fit
    (train accuracy 1.0 on the planted signal) is self-evident.

    LR_ITERS full-batch gradient steps: each is one streaming pass
    emitting <= DSIR_B+1 fixed-point gradient rows per block (the
    vectors never shuffle), a bucket-keyed Sum, and an integer driver
    update; scoring is map-only under the broadcast model. Bit-identical
    to the sequential twin: per-doc doubles use identical operands (the
    model is fixed-point), per-bucket contributions floor to int64
    BEFORE the order-independent sum. 100 TB: gradient traffic is
    O(DSIR_B x blocks) per pass, independent of corpus size; the
    training working set is materialized once and re-streamed per pass
    (cache-the-iterate, as kmeans does)."""
    train = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(remote_fn(_QC, "lr_train_input"), batch_format="pyarrow")
        .materialize()  # re-streamed LR_ITERS + 1 times
    )
    w = [0] * DSIR_B
    b_fx = 0
    for _ in range(LR_ITERS):
        agg = (
            train.map_batches(
                remote_fn(_QC, "lr_grad_partial", w=w, b_fx=b_fx),
                batch_format="pyarrow",
            )
            .repartition(_docs_coalesce(sf_dir))  # blocks x DSIR_B rows
            .groupby("bucket")
            .aggregate(Sum("g_fx", alias_name="g_fx"), Sum("n", alias_name="n"))
            .to_pandas()  # <= DSIR_B + 1 rows
        )
        w, b_fx = lr_update(w, b_fx, agg)
    return train.map_batches(
        remote_fn(_QC, "lr_score_batch", w=w, b_fx=b_fx), batch_format="pyarrow"
    )


# --- CCNet head/middle/tail perplexity buckets --------------------------------
CCNET_K = 3  # head / middle / tail


def ccnet_score_batch(batch: pa.Table, model: Dict[str, int]) -> pa.Table:
    """lm_score_batch carrying the lang column (same row order)."""
    scored = lm_score_batch(batch, model)
    return scored.append_column("lang", batch["lang"])


def ccnet_tag_batch(batch: pa.Table) -> pa.Table:
    """One contiguous run of the (lang, nlp, doc) global sort -> rows
    tagged with their run's FIRST key (bkey, the block-order handle the
    driver groups offsets by) and their within-run per-lang local rank.
    Tagging happens ONCE on the materialized sort, so bkey is consistent
    between the offset aggregation and the final assignment no matter how
    Ray forms batches. The driver re-sorts runs BY bkey string, so bkey's
    lexicographic order must agree with the (lang, nlp, doc) sort: the
    separator is '\\t' (below every printable lang character, so a lang
    that is a strict prefix of another still orders first) and the
    numeric fields are fixed-width non-negative (nlp >= 0 for a unigram
    LM: every per-token logp is <= 0)."""
    if len(batch) == 0:  # empty sort-range partitions are legitimate
        return batch.append_column("bkey", pa.array([], pa.string())) \
                    .append_column("local_rank", pa.array([], pa.int64()))
    langs = batch["lang"].to_pylist()
    nlp = batch["neg_logprob_fx"].to_pylist()
    ids = batch["doc_id"].to_pylist()
    assert nlp[0] >= 0 and ids[0] >= 0
    bkey = f"{langs[0]}\t{nlp[0]:020d}\t{ids[0]:012d}"
    seen: Dict[str, int] = {}
    local = []
    for lg in langs:
        local.append(seen.get(lg, 0))
        seen[lg] = seen.get(lg, 0) + 1
    return batch.append_column("bkey", pa.array([bkey] * len(ids), pa.string())) \
                .append_column("local_rank", pa.array(local, pa.int64()))


def ccnet_assign_batch(
    batch: pa.Table, offsets: Dict[str, int], totals: Dict[str, int]
) -> pa.Table:
    """Broadcast (bkey|lang -> global offset) + per-lang totals -> the
    exact SQL NTILE(CCNET_K) bucket per row."""
    from .queries_window import ntile_of_rank

    langs = batch["lang"].to_pylist()
    bkeys = batch["bkey"].to_pylist()
    local = batch["local_rank"].to_numpy()
    rank = np.asarray(
        [offsets[f"{b}|{lg}"] for b, lg in zip(bkeys, langs)], dtype=np.int64
    ) + local
    buckets = np.empty(len(langs), dtype=np.int64)
    for lg in set(langs):
        m = np.asarray([x == lg for x in langs])
        buckets[m] = ntile_of_rank(rank[m], totals[lg], CCNET_K)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "neg_logprob_fx": batch["neg_logprob_fx"],
            "bucket": pa.array(buckets, pa.int64()),
        }
    )


def q_ccnet_buckets(sf_dir: str) -> rd.Dataset:
    """CCNet-style corpus partitioning (Wenzek et al. 2020): per language,
    documents split into head/middle/tail terciles of LM score (exact
    NTILE(3) over (neg_logprob ASC, doc_id)) — the standard quality
    stratification before sampling training data.

    Plan: unigram-LM scores (the certified unigram_logprob pass, carrying
    lang) -> distributed sort by (lang, score, id) -> ONE tagging pass on
    the materialized sort (batch-first-key + within-batch local ranks) ->
    a (runs x langs)-row offset aggregate on the driver -> broadcast
    assignment. No task or driver structure ever holds per-doc state:
    driver memory is O(sorted-runs x languages)."""
    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(remote_fn(_QC, "lm_count_partial"), batch_format="pyarrow")
        .repartition(_docs_coalesce(sf_dir))  # blocks x vocab combiner rows
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocabulary-sized
    )
    model = lm_model_from_counts(counts)
    tagged = (
        _docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(
            remote_fn(_QC, "ccnet_score_batch", model=model), batch_format="pyarrow"
        )
        .sort(["lang", "neg_logprob_fx", "doc_id"])
        .map_batches(remote_fn(_QC, "ccnet_tag_batch"), batch_format="pyarrow")
        .materialize()  # bkey/local_rank must be identical in both consumers
    )
    parts = (
        tagged.map_batches(remote_fn(_QC, "ccnet_part_partial"), batch_format="pyarrow")
        .to_pandas()  # one row per (run, lang) x part-batch
        .sort_values("bkey")
    )
    offsets, totals = ccnet_offsets(parts)
    return tagged.map_batches(
        remote_fn(_QC, "ccnet_assign_batch", offsets=offsets, totals=totals),
        batch_format="pyarrow",
    )


def ccnet_part_partial(batch: pa.Table) -> pa.Table:
    """(bkey, lang, n) combiner rows for the offset aggregation."""
    g = batch.select(["bkey", "lang"]).group_by(["bkey", "lang"]).aggregate(
        [("lang", "count")]
    )
    return select_rename(g, bkey="bkey", lang="lang", n="lang_count")


def ccnet_offsets(parts: pd.DataFrame):
    """bkey-sorted (bkey, lang, n) partials -> ((bkey|lang -> run-start
    per-lang offset), per-lang totals). The part pass re-batches the
    materialized tag output independently of the tag pass, so ONE tag run
    can emit SEVERAL partial rows for the same (bkey, lang) — setdefault
    keeps the run-START offset while the counts still accumulate (a plain
    assignment would shift every rank in the run by the first chunk's
    size and silently corrupt the NTILE buckets)."""
    offsets: Dict[str, int] = {}
    run: Dict[str, int] = {}
    for r in parts.itertuples():
        offsets.setdefault(f"{r.bkey}|{r.lang}", run.get(r.lang, 0))
        run[r.lang] = run.get(r.lang, 0) + int(r.n)
    return offsets, {lg: int(v) for lg, v in run.items()}


# --- Gopher repetition signals ------------------------------------------------
def gopher_rep_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher-style repetition metrics (Rae et al. 2021, Gopher
    quality rules): for n in {2,3,4}, the permille of document characters
    covered by the single most frequent word n-gram (ties to the
    lexicographically smallest), and the permille of 5-gram POSITIONS
    whose 5-gram occurs more than once. All doubles are one shared
    floor(x*1000+0.5) expression per metric, identical to the SQL oracle.
    Map-only — no shuffle."""
    from collections import Counter

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    cols = {"doc_id": ids, "top2": [], "top3": [], "top4": [], "dup5": []}
    for t in texts:
        t = t or ""
        ws = t.split(" ")
        n_chars = len(t)
        for n, key in ((2, "top2"), (3, "top3"), (4, "top4")):
            grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
            if not grams or n_chars == 0:
                cols[key].append(0)
                continue
            c = Counter(grams)
            # max count, ties to the smallest gram string (max hoisted:
            # inside the generator it re-evaluates per distinct gram —
            # O(distinct^2) on a long document)
            mx = max(c.values())
            best = min(g for g, v in c.items() if v == mx)
            cols[key].append(
                int(math.floor(c[best] * len(best) * 1000.0 / n_chars + 0.5))
            )
        g5 = [" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)]
        if not g5:
            cols["dup5"].append(0)
        else:
            c5 = Counter(g5)
            dup_pos = sum(v for v in c5.values() if v > 1)
            cols["dup5"].append(int(math.floor(dup_pos * 1000.0 / len(g5) + 0.5)))
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "top2_permille": pa.array(cols["top2"], pa.int64()),
            "top3_permille": pa.array(cols["top3"], pa.int64()),
            "top4_permille": pa.array(cols["top4"], pa.int64()),
            "dup5_permille": pa.array(cols["dup5"], pa.int64()),
        }
    )


def q_gopher_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher repetition quality filter inputs, one row per document.
    Embarrassingly parallel (the n-gram tables are per-doc and die inside
    the task); at 100 TB this is a pure streaming map like lang_id."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QC, "gopher_rep_batch"), batch_format="pyarrow"
    )


def _sql_top_ngram(n: int) -> str:
    """SQL fragment: per-doc permille of chars covered by the top word
    n-gram (count DESC, gram ASC tie rule — identical to the kernel)."""
    leads = [f"w"] + [
        f"lead(w, {k}) OVER (PARTITION BY doc_id ORDER BY i)" for k in range(1, n)
    ]
    ng = " || ' ' || ".join(leads)
    return f"""
  (WITH u AS (SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS w,
                     generate_subscripts(string_split(d.text, ' '), 1) AS i
              FROM documents d),
   g AS (SELECT doc_id, {ng} AS ng FROM u QUALIFY ng IS NOT NULL),
   c AS (SELECT doc_id, ng, count(*) AS c FROM g GROUP BY doc_id, ng),
   r AS (SELECT doc_id, ng, c,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, ng) AS rk FROM c)
   SELECT r.doc_id,
          CAST(floor(r.c * len(r.ng) * 1000.0 / len(d2.text) + 0.5) AS BIGINT)
            AS v
   FROM r JOIN documents d2 ON r.doc_id = d2.doc_id
   WHERE rk = 1 AND len(d2.text) > 0)
"""


SQL_GOPHER_REPETITION = f"""
WITH t2 AS {_sql_top_ngram(2)},
t3 AS {_sql_top_ngram(3)},
t4 AS {_sql_top_ngram(4)},
g5 AS (
  SELECT doc_id,
         w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w, 3) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w, 4) OVER (PARTITION BY doc_id ORDER BY i) AS ng
  FROM (SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS w,
               generate_subscripts(string_split(d.text, ' '), 1) AS i
        FROM documents d)
  QUALIFY ng IS NOT NULL),
d5 AS (
  SELECT doc_id,
         CAST(floor(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000.0
                    / sum(c) + 0.5) AS BIGINT) AS v
  FROM (SELECT doc_id, ng, count(*) AS c FROM g5 GROUP BY doc_id, ng)
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(t2.v, 0) AS top2_permille,
       coalesce(t3.v, 0) AS top3_permille,
       coalesce(t4.v, 0) AS top4_permille,
       coalesce(d5.v, 0) AS dup5_permille
FROM documents d
LEFT JOIN t2 ON d.doc_id = t2.doc_id
LEFT JOIN t3 ON d.doc_id = t3.doc_id
LEFT JOIN t4 ON d.doc_id = t4.doc_id
LEFT JOIN d5 ON d.doc_id = d5.doc_id
"""


# --- DSIR importance resampling (hashed n-gram domain selection) -------------
DSIR_B = 4096          # hashed feature buckets
DSIR_TARGET_LANG = "en"  # the target domain (DSIR trains on a target subset)
DSIR_KEEP = 100        # resample size


def dsir_feature_buckets(text: str) -> "np.ndarray":
    """Hashed n-gram features of one document: word unigrams + adjacent
    bigrams, crc32 % DSIR_B (the DSIR paper's hashed n-gram featurization,
    Xie et al. 2023, arXiv:2302.03169). Shared by count and score passes
    on both engines."""
    import zlib

    ws = (text or "").split(" ")
    feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return np.asarray(
        [zlib.crc32(f.encode("utf-8")) % DSIR_B for f in feats], dtype=np.int64
    )


def dsir_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (bucket, n_tgt, n_src) combiner: every doc feeds the
    source (raw) counts; target-language docs also feed the target counts.
    One pass trains both models."""
    tgt = np.zeros(DSIR_B, dtype=np.int64)
    src = np.zeros(DSIR_B, dtype=np.int64)
    for lang, text in zip(batch["lang"].to_pylist(), batch["text"].to_pylist()):
        b = dsir_feature_buckets(text)
        cnt = np.bincount(b, minlength=DSIR_B)
        src += cnt
        if lang == DSIR_TARGET_LANG:
            tgt += cnt
    nz = np.nonzero(src + tgt)[0]
    return pa.table(
        {
            "bucket": pa.array(nz, pa.int64()),
            "n_tgt": pa.array(tgt[nz], pa.int64()),
            "n_src": pa.array(src[nz], pa.int64()),
        }
    )


def dsir_model_from_counts(counts: pd.DataFrame) -> List[int]:
    """(bucket, n_tgt, n_src) -> dense per-bucket fixed-point importance
    log-ratios: floor((log2 p_tgt - log2 p_src) * 2^20 + 0.5) with add-1
    smoothing over DSIR_B buckets. Per-bucket independent doubles — shared
    by the distributed plan and the sequential dump twin."""
    tgt = np.zeros(DSIR_B, dtype=np.int64)
    src = np.zeros(DSIR_B, dtype=np.int64)
    bk = counts["bucket"].to_numpy(dtype=np.int64)
    tgt[bk] = counts["n_tgt"].to_numpy(dtype=np.int64)
    src[bk] = counts["n_src"].to_numpy(dtype=np.int64)
    lt = np.log2((tgt + 1).astype(np.float64) / float(tgt.sum() + DSIR_B))
    ls = np.log2((src + 1).astype(np.float64) / float(src.sum() + DSIR_B))
    return np.floor((lt - ls) * LM_SCALE + 0.5).astype(np.int64).tolist()


def dsir_score_batch(batch: pa.Table, ratios: List[int]) -> pa.Table:
    """Per-doc integer importance log-weight: sum of per-feature ratio_fx
    (order-independent under any batching)."""
    r = np.asarray(ratios, dtype=np.int64)
    ids, nfs, lws = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        b = dsir_feature_buckets(t)
        ids.append(d)
        nfs.append(len(b))
        lws.append(int(r[b].sum()) if len(b) else 0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_feats": pa.array(nfs, pa.int64()),
            "logw_fx": pa.array(lws, pa.int64()),
        }
    )


def q_dsir_topk(sf_dir: str) -> rd.Dataset:
    """DSIR-style data selection: hashed-n-gram importance weights toward
    a target domain (lang == DSIR_TARGET_LANG), then the deterministic resample —
    the DSIR_KEEP highest-weight documents (ties to the lowest doc_id).

    Plan: ONE counting pass trains both bucket models (a <= DSIR_B-row
    combiner shuffle), the dense fixed-point ratio table broadcasts into
    the scoring pass (map-only), and the selection is a distributed
    sort + limit over slim (doc_id, n_feats, logw_fx) rows. 100 TB: counts
    reduce to DSIR_B rows regardless of corpus size; the ratio table is
    ~32 KB (ray.put once at real scale); top-k never moves text."""
    counts = (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(remote_fn(_QC, "dsir_count_partial"), batch_format="pyarrow")
        .repartition(_docs_coalesce(sf_dir))  # blocks x DSIR_B rows
        .groupby("bucket")
        .aggregate(Sum("n_tgt", alias_name="n_tgt"), Sum("n_src", alias_name="n_src"))
        .to_pandas()  # <= DSIR_B rows
    )
    ratios = dsir_model_from_counts(counts)
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            remote_fn(_QC, "dsir_score_batch", ratios=ratios),
            batch_format="pyarrow",
        )
        .sort(["logw_fx", "doc_id"], descending=[True, False])
        .limit(DSIR_KEEP)
    )


CORPUS_QUERIES: Dict[str, object] = {
    "char_entropy": q_char_entropy,
    "dsir_topk": q_dsir_topk,  # dump-backed oracle
    "ccnet_buckets": q_ccnet_buckets,  # dump-backed oracle (unigram dump)
    "domain_classifier": q_domain_classifier,  # dump-backed oracle
    "unigram_logprob": q_unigram_logprob,  # dump-backed oracle
    "bigram_logprob": q_bigram_logprob,    # dump-backed oracle
    "lang_watchlist_full": q_lang_watchlist_full,
    "word_repetition": q_word_repetition,
    "gopher_repetition": q_gopher_repetition,
    "bigram_topk": q_bigram_topk,
    "source_top_docs": q_source_top_docs,
    "tfidf_top_terms": q_tfidf_top_terms,
    "hll_distinct_users": q_hll_distinct_users,  # dump-backed oracle
    "hll_users_by_type": q_hll_users_by_type,    # dump-backed oracle
    "bigram_topk_cms": q_bigram_topk_cms,        # dump-backed oracle
    "region_revenue": q_region_revenue,
    "customer_order_counts": q_customer_order_counts,
    "events_pivot": q_events_pivot,
    "events_unpivot": q_events_unpivot,
    "events_value_moments": q_events_value_moments,
    "segment_priority_matrix": q_segment_priority_matrix,
    "corpus_rollup": q_corpus_rollup,
    "corpus_prep": q_corpus_prep,
}


_WATCHLIST_SQL = ", ".join(f"('{w}', {p})" for w, p in WATCHLIST)

CORPUS_ORACLES: Dict[str, str] = {
    "lang_watchlist_full": f"""
WITH l AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
     w(wlang, priority) AS (VALUES {_WATCHLIST_SQL})
SELECT COALESCE(l.lang, w.wlang) AS lang,
       CAST(COALESCE(l.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(w.priority, 0) AS BIGINT) AS priority
FROM l FULL OUTER JOIN w ON l.lang = w.wlang
""",
    "char_entropy": SQL_CHAR_ENTROPY,
    "gopher_repetition": SQL_GOPHER_REPETITION,
    "word_repetition": """
SELECT doc_id,
  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
  CAST(floor((1.0 - len(list_distinct(string_split(text,' ')))*1.0
              / len(string_split(text,' ')))*1000 + 0.5) AS BIGINT) AS rep_permille
FROM documents
""",
    "bigram_topk": """
WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
b AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
      FROM w, UNNEST(range(1, len(ws))) AS t(i))
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
""",
    "source_top_docs": """
SELECT lang, source, doc_id, n_chars, CAST(rk AS BIGINT) AS rank FROM (
  SELECT lang, source, doc_id, n_chars,
    row_number() OVER (PARTITION BY lang, source
                       ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents) t WHERE rk <= 3
""",
    "tfidf_top_terms": """
WITH tf AS (
  SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
  GROUP BY doc_id, w
), df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
    row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
  FROM tf JOIN df USING(term)) t WHERE rk = 1
""",
    "region_revenue": """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cust_cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       CAST(sum(cust_cents) AS BIGINT) AS revenue_cents
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "corpus_rollup": """
SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
       CAST(CASE WHEN lang IS NULL THEN 0
                 WHEN source IS NULL THEN 1 ELSE 2 END AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), ())
""",
    "events_pivot": """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1
""",
    "segment_priority_matrix": """
WITH j AS (
  SELECT c_mktsegment, o_orderpriority
  FROM orders JOIN customer ON o_custkey = c_custkey),
obs AS (
  SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM j GROUP BY 1, 2),
segs AS (SELECT DISTINCT c_mktsegment FROM j),
prios AS (SELECT DISTINCT o_orderpriority FROM j)
SELECT s.c_mktsegment, p.o_orderpriority,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
FROM segs s CROSS JOIN prios p
LEFT JOIN obs o USING (c_mktsegment, o_orderpriority)
""",
    "events_unpivot": """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""",
    "events_value_moments": """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_sq_cents
FROM events GROUP BY event_type
""",
    "customer_order_counts": """
WITH per_cust AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_orders,
       CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS total_orders
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
    "corpus_prep": f"""
WITH kept AS (
  SELECT doc_id, n_chars, text FROM documents
  WHERE CAST(floor((1.0 - len(list_distinct(string_split(text,' ')))*1.0
        / len(string_split(text,' ')))*1000 + 0.5) AS BIGINT)
        <= {PREP_REP_MAX_PERMILLE}
), surv AS (
  SELECT min(doc_id) AS doc_id, min(n_chars) AS n_chars
  FROM kept GROUP BY md5(coalesce(text, ''))
)
SELECT CASE WHEN ((doc_id % 2147483647) * {PREP_SPLIT_MULT}) % 100 < {PREP_SPLIT_TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM surv GROUP BY 1
""",
}
