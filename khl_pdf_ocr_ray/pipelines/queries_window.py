"""Window / positional operators: grouped rank, global NTILE, sequence
packing, and target-mix resampling. All four are STATIC-SQL checked
(value-hash green in the driver's gate).

- ``orders_rank_window`` — top-3 orders per customer by price with an
  explicit rank column: the PARTITION BY ... ROW_NUMBER window operator.
  A commutative per-batch partial keeps <= 3 rows per (customer, block),
  so the shuffle moves winners only; the final per-customer rank runs
  vectorized inside coarse customer shards (one pandas groupby-head per
  shard task, never one Python call per customer).
- ``doc_ntile`` — NTILE(4) over the documents corpus ordered by
  (n_chars, doc_id): the global positional-bucketing operator. Two
  passes: a per-size histogram (distinct sizes are bounded — ~10^3 for
  web docs — so the cum-before table is driver-small) and a
  size-sharded rank+tile assignment. No global sort: a doc's global
  rank = cum_before[its size] + its rank within equal-size peers, and
  the within-size rank is a vectorized cumcount inside the size shard.
- ``pack_sequences`` — concat-then-chunk sequence packing (the GPT-style
  tokenizer-feed layout): documents concatenated in doc_id order and cut
  into fixed 512-token windows; each doc reports its global token offset
  and the first/last bin it lands in. The global prefix sum is
  two-level: contiguous doc_id shards reduce to one token-count row
  each, the driver prefix-sums that (one row per 1024 docs), and a
  second sharded pass adds the in-shard cumsum. At 10^12 docs the shard
  summary itself would be tree-reduced once more — noted, not needed
  here.
- ``resample_weighted`` — domain-mix resampling: downsample each
  language toward a target share of the corpus with a deterministic
  multiplicative-hash Bernoulli (layout/engine independent, same rule
  family as train_test_split). Pass 1 reduces to one count per language;
  the driver turns (target share, actual count) into an integer
  acceptance threshold; pass 2 filters and re-aggregates in one
  combiner. Over-represented languages are cut to the target ratio,
  under-represented ones keep everything (rate caps at 1).

Scale notes (100 TB):
- every shuffle here is keyed (custkey shard / n_chars shard / doc_id
  shard / lang) and carries either winners (rank), ids+sizes (ntile,
  pack), or nothing at all (resample pass 2 is map-only + a |langs|-row
  aggregate);
- driver-held state is one row per customer-shard winner set (<= 3
  rows each), per distinct doc size, per 1024-doc shard, and per
  language respectively — all documented, all bounded;
- integer thresholds avoid float-rate drift between engines; at true
  10^12-doc scale the threshold arithmetic needs 128-bit intermediates
  (pct * N * SCALE), which Python has natively and DuckDB reaches via
  HUGEINT.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.arrowkit import select_rename
from ..io import coalesce_for_input, table_nbytes
from ..remote import remote_fn

_QW = "khl_pdf_ocr_ray.pipelines.queries_window"

RANK_K = 3          # orders kept per customer
RANK_SHARDS = 64    # coarse customer shards for the final rank pass

NTILE_K = 4         # quartiles
NTILE_SHARDS = 32   # coarse n_chars shards for the assignment pass

PACK_WINDOW = 512   # tokens per packed training sequence
PACK_SHARD = 1024   # contiguous doc_ids per prefix-sum shard

RESAMPLE_SCALE = 1_000_000
RESAMPLE_MULT = 2654435761  # Knuth multiplicative hash constant
# target corpus mix by language (integer percents, sum 100)
RESAMPLE_TARGETS = {"en": 40, "zh": 15, "es": 15, "de": 15, "fr": 15}


# --- orders_rank_window -----------------------------------------------------
def rank_partial(batch: pa.Table) -> pa.Table:
    """Per-batch top-RANK_K per customer (commutative) + shard key. The
    shuffle then moves <= K rows per (customer, block)."""
    df = pd.DataFrame(
        {
            "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
            "price_cents": np.floor(
                batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
            ).astype("int64"),
        }
    )
    top = (
        df.sort_values(
            ["o_custkey", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
        )
        .groupby("o_custkey", sort=False)
        .head(RANK_K)
    )
    top["shard"] = (top["o_custkey"] * RESAMPLE_MULT) % RANK_SHARDS
    return pa.Table.from_pandas(top, preserve_index=False)


def rank_finalize_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One customer shard: vectorized per-customer rank, keep rnk<=K."""
    g = g.sort_values(
        ["o_custkey", "price_cents", "o_orderkey"], ascending=[True, False, True]
    )
    g["rnk"] = g.groupby("o_custkey", sort=False).cumcount() + 1
    g = g[g["rnk"] <= RANK_K]
    return g[["o_custkey", "o_orderkey", "price_cents", "rnk"]].astype(
        {"o_custkey": "int64", "o_orderkey": "int64", "rnk": "int64"}
    )


def q_orders_rank_window(sf_dir: str) -> rd.Dataset:
    """Top-3 orders per customer with rank (ROW_NUMBER window)."""
    from .queries import _t

    return (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(remote_fn(_QW, "rank_partial"), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(remote_fn(_QW, "rank_finalize_shard"), batch_format="pandas")
    )


SQL_ORDERS_RANK_WINDOW = f"""
SELECT o_custkey, o_orderkey, price_cents, rnk FROM (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey
         ) AS BIGINT) AS rnk
  FROM orders)
WHERE rnk <= {RANK_K}
"""


# --- doc_ntile --------------------------------------------------------------
def size_hist_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (n_chars -> count) partial histogram."""
    g = batch.select(["n_chars"]).group_by(["n_chars"]).aggregate(
        [("n_chars", "count")]
    )
    return select_rename(g, n_chars="n_chars", n="n_chars_count")


def ntile_of_rank(rank: np.ndarray, n_total: int, k: int) -> np.ndarray:
    """Exact SQL NTILE bucket (1-indexed) for 0-indexed global ranks:
    the first (N % k) buckets hold (N // k + 1) rows each."""
    q, rem = divmod(n_total, k)
    if q == 0:
        return rank + 1
    cut = rem * (q + 1)
    big = rank // (q + 1) + 1
    small = rem + (rank - cut) // q + 1
    return np.where(rank < cut, big, small).astype("int64")


def ntile_shard_key(batch: pa.Table) -> pa.Table:
    # multiplicative hashing needs the HIGH product bits: (x*M) & 31 is
    # just a permutation of x mod 32 (one shard for fixed-width corpora);
    # (x*M) >> 59 & 31 mixes every input bit into the shard. The & after
    # the arithmetic shift discards sign-fill, so the wrapped signed
    # product still yields the unsigned top bits.
    prod = pc.multiply(batch["n_chars"], RESAMPLE_MULT)
    shard = pc.cast(
        pc.bit_wise_and(pc.shift_right(prod, 59), NTILE_SHARDS - 1),
        pa.int64(),
    )
    return batch.append_column("shard", shard)


def ntile_assign_shard(
    g: pd.DataFrame, cum_before: dict, n_total: int
) -> pd.DataFrame:
    """One n_chars shard: global rank = cum_before[size] + within-size
    cumcount (doc_id order), then the exact NTILE formula."""
    g = g.sort_values(["n_chars", "doc_id"])
    within = g.groupby("n_chars", sort=False).cumcount().to_numpy()
    base = g["n_chars"].map(cum_before).to_numpy(dtype="int64")
    rank = base + within
    return pd.DataFrame(
        {
            "doc_id": g["doc_id"].astype("int64"),
            "n_chars": g["n_chars"].astype("int64"),
            "tile": ntile_of_rank(rank, n_total, NTILE_K),
        }
    )


def q_doc_ntile(sf_dir: str) -> rd.Dataset:
    """NTILE(4) quartile per document, ordered by (n_chars, doc_id)."""
    from .queries import _t

    hist = (
        _t(sf_dir, "documents", ["n_chars"])
        .map_batches(remote_fn(_QW, "size_hist_partial"), batch_format="pyarrow")
        # blocks x distinct-sizes combiner rows: width scales with blocks
        .repartition(coalesce_for_input(table_nbytes(sf_dir, "documents")))
        .groupby("n_chars")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per DISTINCT doc size
        .sort_values("n_chars")
    )
    counts = hist["n"].to_numpy(dtype="int64")
    n_total = int(counts.sum())
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    cum_before = dict(zip(hist["n_chars"].astype(int).tolist(), cum.tolist()))
    return (
        _t(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(remote_fn(_QW, "ntile_shard_key"), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            remote_fn(
                _QW, "ntile_assign_shard", cum_before=cum_before, n_total=n_total
            ),
            batch_format="pandas",
        )
    )


SQL_DOC_NTILE = f"""
SELECT doc_id, n_chars,
       CAST(ntile({NTILE_K}) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
FROM documents
"""


# --- pack_sequences ---------------------------------------------------------
def pack_len_partial(batch: pa.Table) -> pa.Table:
    """One (shard -> token sum) row per batch-shard: prefix-sum feed."""
    sums: dict = {}
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        s = d // PACK_SHARD
        sums[s] = sums.get(s, 0) + len((t or "").split(" "))
    ks = sorted(sums)
    return pa.table(
        {
            "shard": pa.array(ks, pa.int64()),
            "tok": pa.array([sums[k] for k in ks], pa.int64()),
        }
    )


def pack_assign_shard(g: pd.DataFrame, shard_offsets: dict) -> pd.DataFrame:
    """One contiguous doc_id shard: in-shard cumsum + broadcast offset."""
    g = g.sort_values("doc_id")
    dl = (
        g["text"].map(lambda t: len((t or "").split(" "))).to_numpy(dtype="int64")
    )
    shard = int(g["doc_id"].iloc[0]) // PACK_SHARD
    off = int(shard_offsets[shard]) + np.concatenate(
        [[0], np.cumsum(dl)[:-1]]
    ).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": g["doc_id"].astype("int64"),
            "dl": dl,
            "off": off,
            "first_bin": off // PACK_WINDOW,
            "last_bin": (off + dl - 1) // PACK_WINDOW,
        }
    )


def pack_shard_key(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "shard", pc.cast(pc.divide(batch["doc_id"], PACK_SHARD), pa.int64())
    )


def q_pack_sequences(sf_dir: str) -> rd.Dataset:
    """Concat-then-chunk packing layout: global token offset + the
    512-token bins each doc spans, in doc_id order."""
    from .queries import _t

    shard_sums = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_QW, "pack_len_partial"), batch_format="pyarrow")
        # one row per (shard, block): shard count grows with the corpus
        .repartition(coalesce_for_input(table_nbytes(sf_dir, "documents")))
        .groupby("shard")
        .aggregate(Sum("tok", alias_name="tok"))
        .to_pandas()  # one row per 1024 docs; tree-reduce again at 10^12
        .sort_values("shard")
    )
    toks = shard_sums["tok"].to_numpy(dtype="int64")
    offs = np.concatenate([[0], np.cumsum(toks)[:-1]])
    shard_offsets = dict(
        zip(shard_sums["shard"].astype(int).tolist(), offs.tolist())
    )
    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(remote_fn(_QW, "pack_shard_key"), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            remote_fn(_QW, "pack_assign_shard", shard_offsets=shard_offsets),
            batch_format="pandas",
        )
    )


SQL_PACK_SEQUENCES = f"""
SELECT doc_id, dl,
       CAST(sum(dl) OVER w - dl AS BIGINT) AS off,
       CAST((sum(dl) OVER w - dl) // {PACK_WINDOW} AS BIGINT) AS first_bin,
       CAST((sum(dl) OVER w - 1) // {PACK_WINDOW} AS BIGINT) AS last_bin
FROM (SELECT doc_id,
             CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS dl
      FROM documents)
WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
"""


# --- resample_weighted ------------------------------------------------------
def lang_count_partial(batch: pa.Table) -> pa.Table:
    g = batch.select(["lang"]).group_by(["lang"]).aggregate([("lang", "count")])
    return select_rename(g, lang="lang", n="lang_count")


def resample_filter_partial(batch: pa.Table, thresholds: dict) -> pa.Table:
    """Accept doc iff hash residue < its language's integer threshold;
    reduce survivors to one (lang, docs, chars) row per batch-lang."""
    from .queries import hash_residue

    residue = hash_residue(batch["doc_id"], RESAMPLE_SCALE)
    thr = pc.take(
        pa.array(list(thresholds.values()), pa.int64()),
        pc.index_in(batch["lang"], pa.array(list(thresholds.keys()))),
    )
    kept = batch.filter(pc.less(residue, thr))
    g = (
        kept.select(["lang", "n_chars"])
        .group_by(["lang"])
        .aggregate([("n_chars", "count"), ("n_chars", "sum")])
    )
    return select_rename(
        g, lang="lang", kept_docs="n_chars_count", kept_chars="n_chars_sum"
    )


def resample_thresholds(lang_counts: dict) -> dict:
    """Integer acceptance thresholds: keep min(1, target_share * N /
    n_lang) of each language, as an exact integer on both engines."""
    n_total = sum(lang_counts.values())
    # languages absent from the target mix are DROPPED (the SQL twin's
    # inner join does the same), never a KeyError crash
    return {
        lang: min(
            RESAMPLE_SCALE,
            (RESAMPLE_TARGETS[lang] * n_total * RESAMPLE_SCALE)
            // (100 * n),
        )
        for lang, n in sorted(lang_counts.items())
        if lang in RESAMPLE_TARGETS
    }


def q_resample_weighted(sf_dir: str) -> rd.Dataset:
    """Deterministic per-language downsampling toward the target mix."""
    from .queries import _t

    counts = (
        _t(sf_dir, "documents", ["lang"])
        .map_batches(remote_fn(_QW, "lang_count_partial"), batch_format="pyarrow")
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # one row per language
    )
    thresholds = resample_thresholds(
        dict(zip(counts["lang"].tolist(), counts["n"].astype(int).tolist()))
    )
    return (
        _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(
            remote_fn(_QW, "resample_filter_partial", thresholds=thresholds),
            batch_format="pyarrow",
        )
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby("lang")
        .aggregate(
            Sum("kept_docs", alias_name="kept_docs"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
    )


_TARGET_VALUES = ", ".join(
    f"('{lang}', {pct})" for lang, pct in RESAMPLE_TARGETS.items()
)

SQL_RESAMPLE_WEIGHTED = f"""
WITH c AS (
  SELECT lang, COUNT(*) AS n_lang, SUM(COUNT(*)) OVER () AS n_total
  FROM documents GROUP BY lang),
t(lang, pct) AS (VALUES {_TARGET_VALUES}),
thr AS (
  SELECT c.lang,
         LEAST({RESAMPLE_SCALE},
               (t.pct * c.n_total * {RESAMPLE_SCALE}) // (100 * c.n_lang)
         ) AS thr
  FROM c JOIN t ON c.lang = t.lang)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS kept_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE ((d.doc_id % 2147483647) * {RESAMPLE_MULT}) % {RESAMPLE_SCALE} < thr.thr
GROUP BY d.lang
"""


WINDOW_QUERIES = {
    "orders_rank_window": q_orders_rank_window,
    "doc_ntile": q_doc_ntile,
    "pack_sequences": q_pack_sequences,
    "resample_weighted": q_resample_weighted,
}

WINDOW_ORACLES = {
    "orders_rank_window": SQL_ORDERS_RANK_WINDOW,
    "doc_ntile": SQL_DOC_NTILE,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "resample_weighted": SQL_RESAMPLE_WEIGHTED,
}
