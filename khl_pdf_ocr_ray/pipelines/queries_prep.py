"""Training-data preparation operators: the LLM-corpus ops a web-scale
pipeline runs between raw extraction and tokenization.

Every query here has a STATIC DuckDB oracle (value-hash green in the
driver's gate, not rows-only):

- ``decontaminate``    — eval-set n-gram decontamination: flag training
  docs sharing any word trigram with a held-out eval split (the GPT-3 /
  PaLM-style 13-gram decontamination, at n=3 because the synthetic docs
  are short). Fully distributed: both sides explode to per-doc DISTINCT
  trigrams and meet in a hash join on the trigram — the eval side is NOT
  broadcast (eval sets are unbounded in general; a Bloom prefilter is the
  documented optimization when it is known-small);
- ``chunk_docs``       — fixed-size overlapping word-window chunking
  (size 32, stride 24): the tokenizer-feed operator. Embarrassingly
  parallel flat-map, no shuffle;
- ``stratified_sample``— deterministic per-language top-k sample by
  multiplicative hash (seeded, layout-independent — the same rule family
  as train_test_split). Per-batch partial top-k means the shuffle moves
  at most k rows per (lang, block);
- ``pii_scrub``        — regex redaction (email -> phone -> number, in
  that order on the progressively redacted string) with per-pattern match
  counts. Pure Arrow RE2 kernels (``count_substring_regex`` /
  ``replace_substring_regex``) — vectorized, zero Python per row, and
  engine-parity with DuckDB's RE2 by construction;
- ``dedup_prefix_keep_best`` — canonical-doc selection: group by a cheap
  near-dup key (first 50 chars) and keep the highest-quality member
  (n_chars DESC, doc_id ASC) plus the group size. The commutative argmax
  runs as a per-batch partial, so the shuffle moves <= 1 row per
  (prefix, block) instead of one row per doc;
- ``lang_size_quantiles`` — per-language exact discrete quantiles via a
  distributed (lang, size) histogram: the grouped variant of
  doc_size_quantiles, with no driver-side walk.

Scale notes (100 TB):
- decontaminate's two explodes recompute the trigram stream rather than
  materializing it (embarrassingly parallel; re-reading beats pinning an
  exploded corpus in the object store). The join and both groupbys key on
  the trigram / doc_id — standard slim shuffles;
- chunk_docs streams: output blocks are bounded by input block size x
  (chunk/stride) overlap factor (~1.33x here);
- pii_scrub is map-only; stratified_sample and dedup_prefix_keep_best
  shuffle only per-batch winners (k rows resp. 1 row per key per block).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..joins import safe_join
from ..functions.arrowkit import select_rename
from ..io import table_nbytes
from ..remote import remote_fn

_QP = "khl_pdf_ocr_ray.pipelines.queries_prep"

# decontamination: eval split = doc_id % DECON_EVAL_MOD == 0 (~4%), word
# trigrams (the corpus' docs are 10-100 words; 13-grams would never collide)
DECON_EVAL_MOD = 23
DECON_N = 3

# chunking: 32-word windows advancing 24 words (8-word overlap)
CHUNK_SIZE = 32
CHUNK_STRIDE = 24

# stratified sample: k per language, Knuth multiplicative hash mod 2^32
SAMPLE_K = 10
SAMPLE_MULT = 2654435761
SAMPLE_ID_MOD = 2147483647  # overflow guard, see sample_hash_partial
SAMPLE_MOD = 2**32

# canonical-selection near-dup key: leading 50 characters
PREFIX_LEN = 50

# redaction patterns: RE2-compatible (pyarrow.compute and DuckDB both run
# RE2, so Ray and oracle agree by construction); applied in this order on
# the progressively redacted string
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
PII_NUMBER = r"[0-9]+"


# --- batch bodies (top-level so remote_fn can import them) ------------------
def trigram_explode(batch: pa.Table, eval_side: bool) -> pa.Table:
    """Per-doc DISTINCT word trigrams for one side of the decontamination
    join. The eval/train residue filter runs inside the batch (vectorized
    mask) so no row-level ``Dataset.filter`` appears on the hot path."""
    mod = pc.subtract(
        batch["doc_id"],
        pc.multiply(pc.divide(batch["doc_id"], DECON_EVAL_MOD), DECON_EVAL_MOD),
    )
    mask = pc.equal(mod, 0) if eval_side else pc.not_equal(mod, 0)
    batch = batch.filter(mask)
    ids, ngs = [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = (t or "").split(" ")
        seen = {
            " ".join(ws[i : i + DECON_N]) for i in range(len(ws) - (DECON_N - 1))
        }
        for ng in seen:
            ids.append(d)
            ngs.append(ng)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "ng": pa.array(ngs, pa.string())}
    )


def drop_count_col(batch: pa.Table) -> pa.Table:
    return batch.select(["ng"])


def chunk_explode(batch: pa.Table) -> pa.Table:
    """Overlapping word-window chunks: start positions 0, STRIDE, 2*STRIDE,
    ... while start < n_words (every word lands in >= 1 chunk)."""
    ids, ks, lens, texts = [], [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = (t or "").split(" ")
        n_chunks = (len(ws) - 1) // CHUNK_STRIDE + 1
        for k in range(n_chunks):
            piece = ws[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_SIZE]
            ids.append(d)
            ks.append(k)
            lens.append(len(piece))
            texts.append(" ".join(piece))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_id": pa.array(ks, pa.int64()),
            "n_words": pa.array(lens, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
        }
    )


def sample_hash_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial top-k per lang by (hash, doc_id): the winning k of
    each batch are the only candidates that can win globally, so at most
    k rows per (lang, block) reach the shuffle."""
    # doc_id reduced mod 2^31-1 BEFORE the multiply: keeps the product
    # < 2^63 so Arrow can't wrap where DuckDB would raise (identity for
    # every doc_id < 2^31-1) — same guard as queries.SPLIT_ID_MOD
    rid = pc.subtract(
        batch["doc_id"],
        pc.multiply(pc.divide(batch["doc_id"], SAMPLE_ID_MOD), SAMPLE_ID_MOD),
    )
    prod = pc.multiply(rid, SAMPLE_MULT)
    h = pc.subtract(
        prod, pc.multiply(pc.divide(prod, SAMPLE_MOD), SAMPLE_MOD)
    )
    df = pa.table(
        {"lang": batch["lang"], "doc_id": batch["doc_id"], "h": h}
    ).to_pandas()
    top = (
        df.sort_values(["lang", "h", "doc_id"])
        .groupby("lang", sort=False)
        .head(SAMPLE_K)
    )
    return pa.Table.from_pandas(top, preserve_index=False).cast(
        pa.schema([("lang", pa.string()), ("doc_id", pa.int64()), ("h", pa.int64())])
    )


def sample_final(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["h", "doc_id"]).head(SAMPLE_K).reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
    return g[["lang", "doc_id", "rank"]]


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """Sequential redact-and-count, all Arrow RE2 kernels (no Python rows):
    each count runs on the PREVIOUS pattern's redacted output so the SQL
    twin can nest regexp_replace identically."""
    s0 = batch["props"]
    n_email = pc.count_substring_regex(s0, PII_EMAIL)
    s1 = pc.replace_substring_regex(s0, PII_EMAIL, "<EMAIL>")
    n_phone = pc.count_substring_regex(s1, PII_PHONE)
    s2 = pc.replace_substring_regex(s1, PII_PHONE, "<PHONE>")
    n_number = pc.count_substring_regex(s2, PII_NUMBER)
    s3 = pc.replace_substring_regex(s2, PII_NUMBER, "<NUM>")
    return pa.table(
        {
            "event_id": batch["event_id"],
            "props_clean": s3,
            "n_email": pc.cast(n_email, pa.int64()),
            "n_phone": pc.cast(n_phone, pa.int64()),
            "n_number": pc.cast(n_number, pa.int64()),
        }
    )


def prefix_best_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (count, argmax) combiner for canonical-doc selection: one
    surviving row per prefix per batch. Commutative+associative, so the
    final per-prefix pick over partials equals the global pick."""
    df = pa.table(
        {
            "prefix": pc.utf8_slice_codeunits(batch["text"], 0, PREFIX_LEN),
            "keep_doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
        }
    ).to_pandas()
    counts = df.groupby("prefix", sort=False).size().rename("n_dups")
    best = (
        df.sort_values(["n_chars", "keep_doc_id"], ascending=[False, True])
        .groupby("prefix", sort=False)
        .head(1)
        .set_index("prefix")
    )
    out = best.join(counts).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [
                ("prefix", pa.string()),
                ("keep_doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("n_dups", pa.int64()),
            ]
        )
    )


def prefix_best_final(g: pd.DataFrame) -> pd.DataFrame:
    n = int(g["n_dups"].sum())
    best = g.sort_values(["n_chars", "keep_doc_id"], ascending=[False, True]).head(1)
    best = best.copy()
    best["n_dups"] = np.int64(n)
    return best[["prefix", "keep_doc_id", "n_chars", "n_dups"]]


GROUP_QUANTILE_PS = (25, 50, 90)


def lang_quantile_final(g: pd.DataFrame) -> pd.DataFrame:
    """Walk one language's (n_chars -> count) histogram for the discrete
    quantiles: v[ceil(p*n)-1] of the sorted values (duckdb quantile_disc).
    The group is a histogram (one row per distinct size), never the docs."""
    import math

    g = g.sort_values("n_chars")
    total = int(g["n"].sum())
    cum = g["n"].cumsum()
    rows = []
    for p in GROUP_QUANTILE_PS:
        rank = math.ceil(p / 100 * total)
        val = int(g.loc[cum >= rank, "n_chars"].iloc[0])
        rows.append((g["lang"].iloc[0], p, val))
    out = pd.DataFrame(rows, columns=["lang", "p", "n_chars_q"])
    return out.astype({"p": "int64", "n_chars_q": "int64"})


CONT_QUANTILE_PS = (25, 50, 75)  # quarters: frac is exact in binary FP, so
# lo + frac*(hi-lo) is bit-identical to any algebraically-equal form and
# the hashed doubles can't drift between engines


def lang_quantile_cont_final(g: pd.DataFrame) -> pd.DataFrame:
    """Walk one language's histogram for the INTERPOLATED quantiles
    (R-7 / duckdb quantile_cont): h = (n-1)*p, result = v[floor(h)] +
    frac*(v[floor(h)+1] - v[floor(h)]). The group is the (size -> count)
    histogram, never the docs."""
    import math

    g = g.sort_values("n_chars")
    total = int(g["n"].sum())
    cum = g["n"].cumsum()

    def value_at(i: int) -> int:  # 0-based index into the sorted values
        return int(g.loc[cum >= i + 1, "n_chars"].iloc[0])

    rows = []
    for p in CONT_QUANTILE_PS:
        h = (total - 1) * (p / 100)
        lo_i = math.floor(h)
        lo = value_at(lo_i)
        hi = value_at(min(lo_i + 1, total - 1))
        rows.append((g["lang"].iloc[0], p, lo + (h - lo_i) * (hi - lo)))
    out = pd.DataFrame(rows, columns=["lang", "p", "n_chars_q"])
    return out.astype({"p": "int64", "n_chars_q": "float64"})


def q_lang_size_percentiles_cont(sf_dir: str) -> rd.Dataset:
    """Per-language INTERPOLATED percentiles (PERCENTILE_CONT class) —
    the continuous counterpart of lang_size_quantiles, same fully
    distributed histogram plan: one (lang, size) row per distinct pair
    per block shuffles, the per-lang walk sees distinct-size cardinality
    rows, never documents."""
    return (
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="n"))
        .repartition(2)  # tiny histogram table (see lang_size_quantiles)
        .groupby("lang")
        .map_groups(remote_fn(_QP, "lang_quantile_cont_final"), batch_format="pandas")
    )


# --- queries ----------------------------------------------------------------
def _docs(sf_dir: str, columns) -> rd.Dataset:
    from .queries import _t

    return _t(sf_dir, "documents", columns)


def q_lang_size_quantiles(sf_dir: str) -> rd.Dataset:
    """Per-language exact size quantiles — the GROUPED variant of
    doc_size_quantiles, fully distributed (no driver histogram walk):
    the first groupby partial-aggregates per block, so the shuffle moves
    one (lang, size) row per distinct pair per block; the per-lang walk
    then sees a histogram whose row count is the distinct-size cardinality,
    never the document count."""
    return (
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="n"))
        # tiny histogram table; coalesce below the language count so no
        # reduce partition of the second groupby is empty/schemaless
        .repartition(2)
        .groupby("lang")
        .map_groups(remote_fn(_QP, "lang_quantile_final"), batch_format="pandas")
    )


def q_decontaminate(sf_dir: str) -> rd.Dataset:
    """Training docs contaminated by the eval split, with shared-trigram
    counts. Plan: explode both sides to per-doc distinct trigrams
    (map-only), distinct the eval side (slim groupby on the trigram),
    hash-join on the trigram, count per training doc. Trigram keys are
    far less skewed than unigrams (df decays fast with n); if a corpus
    shows hot trigrams, joins.skew_join is the drop-in (tfidf_top_terms
    demonstrates the routing)."""
    train = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QP, "trigram_explode", eval_side=False), batch_format="pyarrow"
    )
    ev = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            remote_fn(_QP, "trigram_explode", eval_side=True), batch_format="pyarrow"
        )
        .groupby("ng")
        .aggregate(Count(alias_name="_c"))
        .map_batches(remote_fn(_QP, "drop_count_col"), batch_format="pyarrow")
        .rename_columns({"ng": "ng_r"})
    )
    # both sides are trigram explodes of the non-empty documents table
    # (the eval split always exists: doc_id % DECON_EVAL_MOD == 0 hits) ->
    # streaming join; sized from the source bytes x the explode factor
    nb = table_nbytes(sf_dir, "documents")
    hit = safe_join(
        train, ev, on=("ng",), right_on=("ng_r",),
        assume_non_empty=True, left_nbytes=3 * nb, right_nbytes=nb,
    )
    return hit.groupby("doc_id").aggregate(Count(alias_name="n_shared"))


def q_chunk_docs(sf_dir: str) -> rd.Dataset:
    """Tokenizer-feed chunking: 32-word windows, stride 24. Map-only."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QP, "chunk_explode"), batch_format="pyarrow"
    )


def q_stratified_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic per-language k-sample by multiplicative hash: the
    seeded, layout-independent analogue of reservoir sampling (same row
    set no matter how blocks split)."""
    return (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(remote_fn(_QP, "sample_hash_partial"), batch_format="pyarrow")
        # the partial output is <= k rows per (lang, block); coalesce below
        # the language count so no reduce partition is empty (an empty
        # map_groups block has no schema and poisons the stream's union)
        .repartition(2)
        .groupby("lang")
        .map_groups(remote_fn(_QP, "sample_final"), batch_format="pandas")
    )


def q_pii_scrub(sf_dir: str) -> rd.Dataset:
    """Redact email/phone/number patterns in event props; per-pattern match
    counts kept for audit. Map-only, pure Arrow RE2 kernels."""
    from .queries import _t

    return _t(sf_dir, "events", ["event_id", "props"]).map_batches(
        remote_fn(_QP, "pii_scrub_batch"), batch_format="pyarrow"
    )


def q_dedup_prefix_keep_best(sf_dir: str) -> rd.Dataset:
    """Canonical-document selection over a cheap near-dup key: per leading-
    50-char prefix keep the largest doc (ties to the smallest doc_id) and
    report the group size."""
    return (
        _docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(remote_fn(_QP, "prefix_best_partial"), batch_format="pyarrow")
        .groupby("prefix")
        .map_groups(remote_fn(_QP, "prefix_best_final"), batch_format="pandas")
    )




# --- events_zscore (feature standardization) ---------------------------------
def zscore_sums_partial(batch: pa.Table) -> pa.Table:
    """Per-(type, batch) exact integer (n, sum cents, sum cents^2)."""
    from .queries import _cents

    cents = _cents(batch["value"])
    t = pa.table(
        {
            "event_type": batch["event_type"],
            "cents": cents,
            "sq": pc.multiply(cents, cents),
        }
    )
    g = t.group_by(["event_type"]).aggregate(
        [("cents", "count"), ("cents", "sum"), ("sq", "sum")]
    )
    return select_rename(
        g, event_type="event_type", n="cents_count", sx="cents_sum", sxx="sq_sum"
    )


def zscore_apply(batch: pa.Table, stats: dict) -> pa.Table:
    """Broadcast-stats apply pass: z = (x*n - sx) / sqrt(n*sxx - sx^2)
    (algebraically identical to (x - mean)/std, but with ONE exact integer
    numerator and ONE double division, so the floats hash bit-identical to
    the SQL twin that uses the same expression shape). The type column is
    dictionary-encoded once per batch, so the per-row stats lookup is a
    fancy-index — no per-row Python in the full-table pass."""
    import numpy as np

    from .queries import _cents

    x = _cents(batch["value"]).to_numpy()
    enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
    types = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy()
    n = np.array([stats[t][0] for t in types], dtype="int64")[codes]
    sx = np.array([stats[t][1] for t in types], dtype="int64")[codes]
    den = np.array([stats[t][2] for t in types], dtype="float64")[codes]
    z = (x * n - sx).astype("float64") / den
    return pa.table(
        {
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "z": pa.array(z, pa.float64()),
        }
    )


def q_events_zscore(sf_dir: str) -> rd.Dataset:
    """Per-event-type z-score standardization of the value column — the
    two-pass (aggregate stats -> broadcast -> map apply) feature-scaling
    operator every ML prep pipeline needs. Pass 1 reduces to |types|
    integer-sum rows on the driver; pass 2 is map-only with the stats as
    plain broadcast kwargs (the master-lookup pattern) — no shuffle of
    the fact table at all."""
    import math

    from .queries import _t

    sums = (
        _t(sf_dir, "events", ["event_type", "value"])
        .map_batches(remote_fn(_QP, "zscore_sums_partial"), batch_format="pyarrow")
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()  # <= |event types| rows
    )
    stats = {}
    for r in sums.itertuples():
        n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)
        stats[str(r.event_type)] = (n, sx, math.sqrt(float(n * sxx - sx * sx)))
    return _t(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        remote_fn(_QP, "zscore_apply", stats=stats),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ZSCORE_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS x
  FROM events
), s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x*x) AS BIGINT) AS sxx
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type,
       CAST(c.x*s.n - s.sx AS DOUBLE)
         / sqrt(CAST(s.n*s.sxx - s.sx*s.sx AS DOUBLE)) AS z
FROM c JOIN s USING (event_type)
"""


# --- events_onehot (categorical feature encoding) ----------------------------
from .queries_corpus import EVENT_TYPES as ONEHOT_TYPES  # single source of
# truth for the event-type vocabulary (also drives events_pivot's columns)


def onehot_batch(batch: pa.Table) -> pa.Table:
    """Map-only one-hot expansion of event_type into indicator columns."""
    cols = {"event_id": batch["event_id"]}
    for t in ONEHOT_TYPES:
        cols[f"is_{t}"] = pc.cast(pc.equal(batch["event_type"], t), pa.int64())
    return pa.table(cols)


def q_events_onehot(sf_dir: str) -> rd.Dataset:
    """One-hot encoding of the categorical event_type — the feature-
    encoding map every tabular training pipeline runs. Embarrassingly
    parallel, no shuffle; the category vocabulary is fixed/broadcast
    (deriving it is a |types|-row distinct aggregate when unknown)."""
    from .queries import _t

    return _t(sf_dir, "events", ["event_id", "event_type"]).map_batches(
        remote_fn(_QP, "onehot_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ONEHOT_SQL = "SELECT event_id, " + ", ".join(
    f"CAST(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END AS BIGINT) AS is_{t}"
    for t in ONEHOT_TYPES
) + " FROM events"


# --- text_normalize (NFC + control strip + whitespace collapse) ---------------
NORM_MESS_MOD = 4  # every 4th doc gets planted mojibake/control mess
# decomposed e+combining-acute (x2), a tab, double spaces, a BEL control
NORM_MESS_SUFFIX = "\téclair  café\x07"

_RE_CTRL = None
_RE_WS = None


def normalize_text_value(s: str) -> str:
    """THE normalization rule, shared semantics with the SQL oracle:
    NFC-compose, control chars -> space, collapse ASCII whitespace runs,
    trim. The whitespace class is explicit [ \\t\\r\\n] on BOTH engines —
    a bare \\s would pick up each engine's own unicode space table."""
    import re
    import unicodedata

    global _RE_CTRL, _RE_WS
    if _RE_CTRL is None:
        _RE_CTRL = re.compile(r"[\x00-\x1f\x7f]")
        _RE_WS = re.compile(r"[ \t\r\n]+")
    s = unicodedata.normalize("NFC", s)
    return _RE_WS.sub(" ", _RE_CTRL.sub(" ", s)).strip()


def text_normalize_batch(batch: pa.Table) -> pa.Table:
    """Per-row cleaning witness: md5 of the normalized text + whether
    normalization changed anything. Input mess is planted on every
    NORM_MESS_MOD-th doc (decomposed accents, a control char, tab/double
    spaces) so the operator demonstrably bites; the corpus itself is
    clean ASCII."""
    import hashlib

    ids = batch["doc_id"].to_pylist()
    ids_out, md5s, changed = [], [], []
    for d, t in zip(ids, batch["text"].to_pylist()):
        raw = (t or "") + (NORM_MESS_SUFFIX if d % NORM_MESS_MOD == 0 else "")
        clean = normalize_text_value(raw)
        ids_out.append(d)
        md5s.append(hashlib.md5(clean.encode("utf-8")).hexdigest())
        changed.append(clean != raw)
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "norm_md5": pa.array(md5s, pa.string()),
            "changed": pa.array(changed, pa.bool_()),
        }
    )


def q_text_normalize(sf_dir: str) -> rd.Dataset:
    """Unicode text normalization (the ftfy/cleaning step of every web
    pipeline): NFC composition, control-char strip, whitespace collapse —
    map-only, per-row md5 witness checked against DuckDB's nfc_normalize
    + RE2 twin. 100 TB: embarrassingly parallel."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QP, "text_normalize_batch"), batch_format="pyarrow"
    )


SQL_TEXT_NORMALIZE = f"""
WITH raw AS (
  SELECT doc_id,
         coalesce(text, '') ||
         CASE WHEN doc_id % {NORM_MESS_MOD} = 0
              THEN chr(9) || 'e' || chr(769) || 'clair  cafe' || chr(769)
                   || chr(7)
              ELSE '' END AS t
  FROM documents),
n AS (
  SELECT doc_id, t,
         trim(regexp_replace(regexp_replace(nfc_normalize(t),
              '[\\x00-\\x1f\\x7f]', ' ', 'g'), '[ \\t\\r\\n]+', ' ', 'g')) AS c
  FROM raw)
SELECT doc_id, md5(c) AS norm_md5, (c <> t) AS changed FROM n
"""


# --- JSONL sink -> source roundtrip ------------------------------------------
def jsonl_md5_batch(batch: pa.Table) -> pa.Table:
    """Per-row md5 of the roundtripped text — the fidelity witness the
    static oracle recomputes with DuckDB's md5() over the ORIGINAL table,
    so any sink/source mangling (escaping, encoding, type drift) breaks
    the value hash."""
    import hashlib

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "n_chars": batch["n_chars"],
            "text_md5": pa.array(
                [
                    hashlib.md5((t or "").encode("utf-8")).hexdigest()
                    for t in batch["text"].to_pylist()
                ],
                pa.string(),
            ),
        }
    )


def _jsonl_dir(sf_dir: str) -> str:
    """Documents exported once to JSONL via the distributed write_json
    sink (cached on the source table's content fingerprint)."""
    import hashlib

    from ..state.atomic import ensure_published

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.sha256(
        f"{src}:{st.st_size}:{st.st_mtime_ns}:jsonl1".encode()
    ).hexdigest()[:16]
    out = f"/tmp/khlray_cache/jsonl_{key}"

    def _build(tmp: str) -> None:
        rd.read_parquet(src).write_json(tmp)

    return ensure_published(out, _build)


def q_jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """JSONL sink -> source roundtrip: documents exported with the
    distributed ``write_json`` sink, re-read with ``read_json``, and
    verified row-exact (text md5 + int columns) against the original
    parquet — the format-interop surface (S4) as a value-hash-checked
    query. 100 TB: both the sink and the source are per-block parallel;
    nothing aggregates."""
    return rd.read_json(_jsonl_dir(sf_dir)).map_batches(
        remote_fn(_QP, "jsonl_md5_batch"), batch_format="pyarrow"
    )


SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, lang, n_chars, md5(coalesce(text, '')) AS text_md5
FROM documents
"""


# --- source_quota_sample (per-domain quota cap) -------------------------------
QUOTA_K = 5  # max docs kept per source


def quota_partial(batch: pa.Table) -> pa.Table:
    """Per-batch bottom-QUOTA_K doc_ids per source: only a batch's K
    winners can win globally, so <= K rows per (source, block) shuffle."""
    src = np.asarray(batch["source"].to_pylist())
    did = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((did, src))
    src_s = src[order]
    keep_idx = []
    n = len(src_s)
    run_start = 0
    for i in range(1, n + 1):
        if i == n or src_s[i] != src_s[run_start]:
            keep_idx.extend(order[run_start : min(run_start + QUOTA_K, i)])
            run_start = i
    return batch.select(["doc_id", "source"]).take(
        np.array(sorted(keep_idx), dtype=np.int64)
    )


def quota_final(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("doc_id").head(QUOTA_K)
    return g[["doc_id", "source"]].astype({"doc_id": "int64"})


def q_source_quota_sample(sf_dir: str) -> rd.Dataset:
    """Per-domain quota sampling — the "cap any one site's share" step a
    web corpus applies before training (C4/Gopher keep per-domain caps so
    boilerplate-heavy hosts can't dominate): keep the QUOTA_K lowest
    doc_ids per source. Plan: per-batch bottom-K combiner (<= K rows per
    (source, block) shuffle) -> per-source head-K finalize. 100 TB: the
    exchange is bounded by |sources| x K x blocks, never corpus rows."""
    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(remote_fn(_QP, "quota_partial"), batch_format="pyarrow")
        .groupby("source")
        .map_groups(remote_fn(_QP, "quota_final"), batch_format="pandas")
    )


SQL_SOURCE_QUOTA = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents) t
WHERE rn <= {QUOTA_K}
"""


# --- T5-style span corruption (Raffel et al. 2020) ---------------------------
SPAN_MASK_MOD = 1000
SPAN_MASK_PERMILLE = 60  # ~6% of token positions START a mask span
SPAN_MIN_LEN, SPAN_LEN_CHOICES = 2, 3  # span length in {2, 3, 4}


def span_corrupt_doc(doc_id: int, text: str):
    """(input_text, target_text, n_spans) for one document: greedy
    deterministic span masking — position i starts a span iff its
    multiplicative hash lands under the permille threshold and i is not
    already inside a span; masked spans become <extra_id_k> sentinels in
    the input and (sentinel + tokens) in the target, the T5 denoising
    objective. Python-int hash arithmetic (no overflow at any id)."""
    from .queries_window import RESAMPLE_MULT

    words = [w for w in (text or "").split(" ") if w]
    inp, tgt = [], []
    i, k, n = 0, 0, len(words)
    while i < n:
        h = ((doc_id * 1_000_003 + i) * RESAMPLE_MULT) % SPAN_MASK_MOD
        if h < SPAN_MASK_PERMILLE and n - i >= SPAN_MIN_LEN:
            length = min(
                SPAN_MIN_LEN + ((doc_id + i) % SPAN_LEN_CHOICES), n - i
            )
            sentinel = f"<extra_id_{k}>"
            inp.append(sentinel)
            tgt.append(sentinel)
            tgt.extend(words[i : i + length])
            i += length
            k += 1
        else:
            inp.append(words[i])
            i += 1
    return " ".join(inp), " ".join(tgt), k


def span_corruption_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    outs = [span_corrupt_doc(int(d), t) for d, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": pa.array([int(d) for d in ids], pa.int64()),
            "n_spans": pa.array([o[2] for o in outs], pa.int64()),
            "input_text": pa.array([o[0] for o in outs], pa.string()),
            "target_text": pa.array([o[1] for o in outs], pa.string()),
        }
    )


def q_span_corruption(sf_dir: str) -> rd.Dataset:
    """T5 span-corruption pretraining pairs over the corpus — map-only,
    embarrassingly parallel; the denoising-objective data-prep step
    between chunking and tokenization. Sequential-twin checked (the mask
    rule is hash-deterministic, so the dump certifies batching/layout
    invariance end-to-end)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        remote_fn(_QP, "span_corruption_batch"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


PREP_QUERIES: Dict[str, object] = {
    "span_corruption": q_span_corruption,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "text_normalize": q_text_normalize,
    "events_zscore": q_events_zscore,
    "events_onehot": q_events_onehot,
    "decontaminate": q_decontaminate,
    "chunk_docs": q_chunk_docs,
    "stratified_sample": q_stratified_sample,
    "pii_scrub": q_pii_scrub,
    "dedup_prefix_keep_best": q_dedup_prefix_keep_best,
    "lang_size_quantiles": q_lang_size_quantiles,
    "lang_size_percentiles_cont": q_lang_size_percentiles_cont,
    "source_quota_sample": q_source_quota_sample,
}


PREP_ORACLES: Dict[str, str] = {
    "source_quota_sample": SQL_SOURCE_QUOTA,
    "jsonl_roundtrip": SQL_JSONL_ROUNDTRIP,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "events_zscore": ZSCORE_SQL,
    "events_onehot": ONEHOT_SQL,
    "decontaminate": f"""
WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
      FROM w, UNNEST(range(1, len(ws)-1)) AS t(i)),
ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM g JOIN ev USING(ng)
WHERE g.doc_id % {DECON_EVAL_MOD} <> 0
GROUP BY g.doc_id
""",
    "chunk_docs": f"""
WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
       CAST(len(ws[k*{CHUNK_STRIDE}+1 : k*{CHUNK_STRIDE}+{CHUNK_SIZE}]) AS BIGINT)
         AS n_words,
       array_to_string(ws[k*{CHUNK_STRIDE}+1 : k*{CHUNK_STRIDE}+{CHUNK_SIZE}], ' ')
         AS chunk_text
FROM w, UNNEST(range(0, (len(ws)-1)//{CHUNK_STRIDE} + 1)) AS t(k)
""",
    "stratified_sample": f"""
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rank FROM (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang
      ORDER BY ((doc_id % {SAMPLE_ID_MOD}) * {SAMPLE_MULT}) % {SAMPLE_MOD}, doc_id) AS rk
  FROM documents) t WHERE rk <= {SAMPLE_K}
""",
    "pii_scrub": f"""
SELECT event_id,
  regexp_replace(regexp_replace(regexp_replace(props,
    '{PII_EMAIL}', '<EMAIL>', 'g'),
    '{PII_PHONE}', '<PHONE>', 'g'),
    '{PII_NUMBER}', '<NUM>', 'g') AS props_clean,
  CAST(len(regexp_extract_all(props, '{PII_EMAIL}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(regexp_replace(props, '{PII_EMAIL}', '<EMAIL>', 'g'),
    '{PII_PHONE}')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(props,
    '{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_PHONE}', '<PHONE>', 'g'),
    '{PII_NUMBER}')) AS BIGINT) AS n_number
FROM events
""",
    "lang_size_percentiles_cont": f"""
SELECT lang, p,
  CASE p WHEN {CONT_QUANTILE_PS[0]} THEN quantile_cont(n_chars, {CONT_QUANTILE_PS[0] / 100})
         WHEN {CONT_QUANTILE_PS[1]} THEN quantile_cont(n_chars, {CONT_QUANTILE_PS[1] / 100})
         ELSE quantile_cont(n_chars, {CONT_QUANTILE_PS[2] / 100}) END
    AS n_chars_q
FROM documents, (SELECT unnest([{CONT_QUANTILE_PS[0]}, {CONT_QUANTILE_PS[1]}, {CONT_QUANTILE_PS[2]}]) AS p) ps
GROUP BY lang, p
""",
    "lang_size_quantiles": f"""
SELECT lang, p,
  CAST(CASE p WHEN {GROUP_QUANTILE_PS[0]} THEN quantile_disc(n_chars, {GROUP_QUANTILE_PS[0] / 100})
              WHEN {GROUP_QUANTILE_PS[1]} THEN quantile_disc(n_chars, {GROUP_QUANTILE_PS[1] / 100})
              ELSE quantile_disc(n_chars, {GROUP_QUANTILE_PS[2] / 100}) END AS BIGINT)
    AS n_chars_q
FROM documents, (SELECT unnest([{GROUP_QUANTILE_PS[0]}, {GROUP_QUANTILE_PS[1]}, {GROUP_QUANTILE_PS[2]}]) AS p) ps
GROUP BY lang, p
""",
    "dedup_prefix_keep_best": f"""
WITH k AS (SELECT substr(text, 1, {PREFIX_LEN}) AS prefix, doc_id, n_chars
           FROM documents),
c AS (SELECT prefix, CAST(count(*) AS BIGINT) AS n_dups FROM k GROUP BY prefix),
b AS (SELECT prefix, doc_id AS keep_doc_id, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY prefix
      ORDER BY n_chars DESC, doc_id) AS rk FROM k) t WHERE rk = 1)
SELECT b.prefix, b.keep_doc_id, b.n_chars, c.n_dups
FROM b JOIN c USING (prefix)
""",
}
