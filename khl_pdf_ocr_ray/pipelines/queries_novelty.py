"""N-gram novelty: first-occurrence attribution of text to its earliest
copy — the accounting primitive behind snapshot-level dedup decisions
(how much of a crawl/source is NEW text vs text already seen elsewhere;
the "novel tokens per snapshot" measurements of the RefinedWeb/C4
dedup analyses).

- ``ngram_novelty``  — per document: distinct word-trigram count, the
  number of those trigrams whose earliest owner (minimum doc_id over the
  corpus) is this document, and the fixed-point novelty ratio
  floor(2^20 * n_novel / n_grams). Documents with no trigram (< 3
  tokens) are absent on both engines.
- ``source_novelty`` — the per-source rollup of the same attribution
  (sum of per-doc novel/total counts plus doc count), the
  which-source-brings-new-text signal for mixture decisions.

Tokenization/trigram contract shared with queries_lexstats: literal
single-space split on both engines, empty tokens included, trigram =
three consecutive tokens of the SAME document joined by one space.
"Earliest" is by doc_id — a total order both engines share — so the
attribution is deterministic and batching-invariant.

Plan: per-batch DISTINCT (doc_id, gram) combiner, sharded by a
gram-hash (crc32 % NOVELTY_SHARDS) so ALL copies of a gram land in one
shard group -> ONE shard-keyed exchange carrying the distinct pair
table once -> per-shard vectorized kernel (drop cross-batch dups,
owner = per-gram min doc, per-doc partial sums) -> a doc_id-keyed Sum
exchange over |docs|-bounded partials -> map-only fixed-point ratio.
The corpus text never shuffles; the big exchange is bounded by the
distinct (gram, doc) pair count — the inverted-index bound shared by
every n-gram operator here. 256 shards keep map_groups at O(shards)
vectorized calls, not O(grams) tiny ones (the stages/dedup.py
BUCKET_SHARDS convention).

100 TB notes: per-shard work is |pairs|/shards with no per-gram Python;
hot grams (boilerplate present in millions of docs) inflate a single
gram's run inside one shard — the groupby-min transform stays
vectorized over the run, so the cost is the run's length, not its
square. The doc-keyed rollup is combiner-backed (per-shard partials
pre-sum per doc before the exchange).

Reference analogue: /root/reference/app.py has no corpus surface; brief
scope (dedup-accounting operators over the documents table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..remote import remote_fn

_QN = "khl_pdf_ocr_ray.pipelines.queries_novelty"

NOVELTY_SHARDS = 256
NOVELTY_SCALE = 1 << 20  # fixed-point scale shared with the SQL twins


def novelty_pairs_partial(batch: pa.Table) -> pa.Table:
    """One batch -> per-batch DISTINCT (doc_id, gram, shard) trigram
    pairs (the lexstats trigram construction, keyed by doc instead of
    lang)."""
    import zlib

    toks = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
    la = toks.combine_chunks()
    off = la.offsets.to_numpy().astype("int64")
    row_id = np.repeat(np.arange(len(la), dtype="int64"), np.diff(off))
    values = la.values
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "gram": pa.array([], pa.string()),
            "shard": pa.array([], pa.int64()),
        }
    )
    if len(values) < 3:
        return empty
    same = (row_id[:-2] == row_id[1:-1]) & (row_id[1:-1] == row_id[2:])
    pos = np.flatnonzero(same)
    if pos.size == 0:
        return empty
    w1 = values.take(pa.array(pos))
    w2 = values.take(pa.array(pos + 1))
    w3 = values.take(pa.array(pos + 2))
    tri = pc.binary_join_element_wise(w1, w2, w3, " ")
    doc = pc.take(
        batch["doc_id"].combine_chunks(), pa.array(row_id[pos], pa.int64())
    )
    pairs = (
        pa.table({"doc_id": doc, "gram": tri})
        .group_by(["doc_id", "gram"])
        .aggregate([])  # per-batch DISTINCT: the combiner that slims the shuffle
    )
    # shard by gram hash over the batch's DISTINCT grams only (bounded by
    # per-batch gram cardinality, not token count)
    grams = pairs["gram"].to_pylist()
    shard = np.fromiter(
        (zlib.crc32(g.encode("utf-8")) % NOVELTY_SHARDS for g in grams),
        dtype=np.int64,
        count=len(grams),
    )
    return pa.table(
        {
            "doc_id": pc.cast(pairs["doc_id"], pa.int64()),
            "gram": pairs["gram"],
            "shard": pa.array(shard),
        }
    )


def novelty_shard_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """One shard group -> per-doc (n_novel, n_grams) partials. All copies
    of a gram are in this group by shard construction, so the per-gram
    min is the GLOBAL owner."""
    g = g.drop_duplicates(["doc_id", "gram"])  # cross-batch dups
    owner = g.groupby("gram")["doc_id"].transform("min")
    novel = (g["doc_id"].to_numpy() == owner.to_numpy()).astype(np.int64)
    out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64), "novel": novel})
    r = out.groupby("doc_id", as_index=False).agg(
        n_novel=("novel", "sum"), n_grams=("novel", "size")
    )
    return r.astype({"doc_id": "int64", "n_novel": "int64", "n_grams": "int64"})


def novelty_ratio_batch(batch: pa.Table) -> pa.Table:
    """Map-only exact fixed-point floor(2^20 * novel / grams)."""
    novel = batch["n_novel"].to_numpy(zero_copy_only=False).astype(np.int64)
    grams = batch["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_grams": pa.array(grams),
            "n_novel": pa.array(novel),
            "novelty_fx": pa.array((novel * NOVELTY_SCALE) // grams),
        }
    )


def _per_doc_novelty(sf_dir: str) -> rd.Dataset:
    from .queries import _t

    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            remote_fn(_QN, "novelty_pairs_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(remote_fn(_QN, "novelty_shard_kernel"), batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("n_novel", alias_name="n_novel"),
            Sum("n_grams", alias_name="n_grams"),
        )
    )


def q_ngram_novelty(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_grams, n_novel, novelty_fx) — see module docstring."""
    return _per_doc_novelty(sf_dir).map_batches(
        remote_fn(_QN, "novelty_ratio_batch"), batch_format="pyarrow"
    )


def source_rollup_batch(batch: pa.Table) -> pa.Table:
    """Joined (source, n_novel, n_grams) rows -> per-batch per-source
    partials (docs counted per row: one row per doc survives the join)."""
    g = (
        pa.table(
            {
                "source": batch["source"],
                "n_novel": pc.cast(batch["n_novel"], pa.int64()),
                "n_grams": pc.cast(batch["n_grams"], pa.int64()),
            }
        )
        .group_by("source")
        .aggregate([([], "count_all"), ("n_novel", "sum"), ("n_grams", "sum")])
    )
    from ..functions.arrowkit import select_rename

    return select_rename(
        g,
        source="source",
        n_docs="count_all",
        n_novel="n_novel_sum",
        n_grams="n_grams_sum",
    )


def source_ratio_batch(batch: pa.Table) -> pa.Table:
    novel = batch["n_novel"].to_numpy(zero_copy_only=False).astype(np.int64)
    grams = batch["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "source": batch["source"],
            "n_docs": pc.cast(batch["n_docs"], pa.int64()),
            "n_grams": pa.array(grams),
            "n_novel": pa.array(novel),
            "novelty_fx": pa.array((novel * NOVELTY_SCALE) // grams),
        }
    )


def q_source_novelty(sf_dir: str) -> rd.Dataset:
    """(source, n_docs, n_grams, n_novel, novelty_fx) — the per-source
    rollup: per-doc novelty (|docs|-sized) joins the slim (doc_id,
    source) projection, then a |sources|-row Sum."""
    from ..io import table_nbytes
    from ..joins import safe_join
    from .queries import _t

    per_doc = _per_doc_novelty(sf_dir)
    src = _t(sf_dir, "documents", ["doc_id", "source"])
    joined = safe_join(
        per_doc,
        src,
        on=("doc_id",),
        right_on=("doc_id",),
        assume_non_empty=True,  # documents is a driver base table
        left_nbytes=table_nbytes(sf_dir, "documents"),
        right_nbytes=table_nbytes(sf_dir, "documents"),
    )
    return (
        joined.map_batches(
            remote_fn(_QN, "source_rollup_batch"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_novel", alias_name="n_novel"),
            Sum("n_grams", alias_name="n_grams"),
        )
        .map_batches(remote_fn(_QN, "source_ratio_batch"), batch_format="pyarrow")
    )


_SQL_PAIRS = """
u AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents),
g AS (
  SELECT doc_id,
         w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i)
           AS tri
  FROM u QUALIFY tri IS NOT NULL),
p AS (SELECT DISTINCT doc_id, tri FROM g),
o AS (SELECT tri, min(doc_id) AS owner FROM p GROUP BY tri)
"""

SQL_NGRAM_NOVELTY = f"""
WITH {_SQL_PAIRS}
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE p.doc_id = o.owner) AS BIGINT) AS n_novel,
       CAST((count(*) FILTER (WHERE p.doc_id = o.owner)) * {NOVELTY_SCALE}
            // count(*) AS BIGINT) AS novelty_fx
FROM p JOIN o ON p.tri = o.tri
GROUP BY p.doc_id
"""

SQL_SOURCE_NOVELTY = f"""
WITH {_SQL_PAIRS},
per_doc AS (
  SELECT p.doc_id,
         count(*) AS n_grams,
         count(*) FILTER (WHERE p.doc_id = o.owner) AS n_novel
  FROM p JOIN o ON p.tri = o.tri
  GROUP BY p.doc_id)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pd.n_grams) AS BIGINT) AS n_grams,
       CAST(sum(pd.n_novel) AS BIGINT) AS n_novel,
       CAST(sum(pd.n_novel) * {NOVELTY_SCALE} // sum(pd.n_grams) AS BIGINT)
         AS novelty_fx
FROM per_doc pd JOIN documents d ON d.doc_id = pd.doc_id
GROUP BY d.source
"""

# --- incremental novelty: new snapshot vs a PERSISTED gram index -------------
# The per-crawl form of the accounting: history's distinct-trigram index
# is built ONCE (hive-partitioned by gram-hash bucket, manifest-protected
# like every published artifact); each new snapshot tokenizes only ITS OWN
# documents and probes the index — history text is never re-read, so the
# per-snapshot cost is O(new), the property that makes snapshot-over-
# snapshot dedup accounting affordable at crawl scale. "Novel" here means
# absent from HISTORY (within-snapshot duplicates count novel for every
# new doc carrying them — no within-snapshot attribution; the full
# attribution is ngram_novelty's job). The new snapshot is the planted
# variant convention shared with the minhash/snapshot operators: every
# 3rd document, doc_id + VARIANT_OFFSET, one appended token.

GRAM_INDEX_BUCKETS = 64


def gram_distinct_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, gram, shard) pairs -> per-batch DISTINCT grams (the
    combiner that slims the index-build exchange)."""
    return batch.select(["gram"]).group_by(["gram"]).aggregate([])


def ensure_gram_index(sf_dir: str) -> str:
    """Build (once, cached, manifest-verified) the distinct-trigram index
    of the BASE corpus, parquet hive-partitioned by gram-hash bucket."""
    import hashlib
    import os

    from ray.data.aggregate import Count as _Count

    from ..state.atomic import ensure_published
    from .queries import _t

    path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(path)
    key = hashlib.sha256(
        f"{path}:{st.st_size}:{st.st_mtime_ns}:b{GRAM_INDEX_BUCKETS}:gramidx:v1".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join("/tmp/khlray_cache", f"gramidx_{key}")

    def _build(tmp_dir: str) -> None:
        (
            _t(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(
                remote_fn(_QN, "novelty_pairs_partial"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .map_batches(
                remote_fn(_QN, "gram_distinct_batch"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            # cross-batch dedup: one (gram)-keyed exchange, then the
            # count column is dropped and g_one re-emitted as the probe
            # marker
            .groupby("gram")
            .aggregate(_Count(alias_name="_n"))
            .map_batches(
                remote_fn(_QN, "gram_index_finalize"), batch_format="pyarrow"
            )
            .write_parquet(tmp_dir, partition_cols=["bucket"])
        )

    return ensure_published(out_dir, _build)


def gram_index_finalize(batch: pa.Table) -> pa.Table:
    import zlib

    grams = batch["gram"].to_pylist()
    bucket = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % GRAM_INDEX_BUCKETS for s in grams),
        dtype=np.int64,
        count=len(grams),
    )
    return pa.table(
        {
            "gram": batch["gram"],
            "bucket": pa.array(bucket),
            "g_one": pa.array(np.ones(len(grams), dtype=np.int64)),
        }
    )


def novelty_incr_partial(batch: pa.Table) -> pa.Table:
    """Joined (doc_id, g_one-or-null) pair rows -> per-doc partials."""
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    hit = pc.fill_null(batch["g_one"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
    df = pd.DataFrame({"doc_id": doc, "novel": (1 - hit)})
    r = df.groupby("doc_id", as_index=False).agg(
        n_novel=("novel", "sum"), n_grams=("novel", "size")
    )
    return pa.Table.from_pandas(
        r.astype({"doc_id": "int64", "n_novel": "int64", "n_grams": "int64"}),
        preserve_index=False,
    )


def q_novelty_incremental(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_grams, n_novel, novelty_fx) for the NEW snapshot's
    documents, probed against the persisted base gram index — history
    text is never re-tokenized."""
    from ray.data.aggregate import Sum as _Sum

    import ray.data as _rd

    from ..io import table_nbytes
    from ..joins import safe_join

    _DD = "khl_pdf_ocr_ray.stages.dedup"
    index_dir = ensure_gram_index(sf_dir)
    from .queries import _t

    new_pairs = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_DD, "mod3_filter"), batch_format="pyarrow")
        .map_batches(remote_fn(_DD, "make_variant_batch"), batch_format="pyarrow")
        .map_batches(
            remote_fn(_QN, "novelty_pairs_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(remote_fn(_QN, "drop_shard"), batch_format="pyarrow")
    )
    index = _rd.read_parquet(index_dir, columns=["gram", "g_one"])
    joined = safe_join(
        new_pairs,
        index,
        on=("gram",),
        right_on=("gram",),
        join_type="left_outer",
        assume_non_empty=True,  # variants + base index both structurally non-empty
        left_nbytes=table_nbytes(sf_dir, "documents"),
        right_nbytes=table_nbytes(sf_dir, "documents"),
    )
    return (
        joined.map_batches(
            remote_fn(_QN, "novelty_incr_partial"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("doc_id")
        .aggregate(
            _Sum("n_novel", alias_name="n_novel"),
            _Sum("n_grams", alias_name="n_grams"),
        )
        .map_batches(remote_fn(_QN, "novelty_ratio_batch"), batch_format="pyarrow")
    )


def drop_shard(batch: pa.Table) -> pa.Table:
    return batch.drop_columns(["shard"])


from ..stages.dedup import VARIANT_OFFSET  # noqa: E402

SQL_NOVELTY_INCREMENTAL = f"""
WITH newdocs AS (
  SELECT doc_id + {VARIANT_OFFSET} AS doc_id,
         coalesce(text, '') || ' near duplicate variant' AS text
  FROM documents WHERE doc_id % 3 = 0),
nu AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM newdocs),
ng AS (
  SELECT doc_id,
         w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i)
           AS tri
  FROM nu QUALIFY tri IS NOT NULL),
np AS (SELECT DISTINCT doc_id, tri FROM ng),
bu AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents),
bg AS (
  SELECT DISTINCT
         w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i)
           AS tri
  FROM bu QUALIFY tri IS NOT NULL)
SELECT np.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE bg.tri IS NULL) AS BIGINT) AS n_novel,
       CAST((count(*) FILTER (WHERE bg.tri IS NULL)) * {NOVELTY_SCALE}
            // count(*) AS BIGINT) AS novelty_fx
FROM np LEFT JOIN bg ON np.tri = bg.tri
GROUP BY np.doc_id
"""

NOVELTY_QUERIES = {
    "ngram_novelty": q_ngram_novelty,
    "source_novelty": q_source_novelty,
    "novelty_incremental": q_novelty_incremental,
}

NOVELTY_ORACLES = {
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "source_novelty": SQL_SOURCE_NOVELTY,
    "novelty_incremental": SQL_NOVELTY_INCREMENTAL,
}
