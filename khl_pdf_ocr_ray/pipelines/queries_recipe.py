"""The end-to-end LLM training-data recipe, as ONE streaming pipeline:

    quality filter (unigram-LM perplexity window + repetition cap,
                    eval split held out)
      -> exact dedup (md5, keep lowest doc_id)
      -> eval-set trigram decontamination
      -> overlapping-window chunking
      -> per-language corpus accounting

Every stage reuses a kernel that is independently oracle-checked as its
own registry query (``unigram_logprob``, ``word_repetition``,
``dedup_exact``, ``decontaminate``, ``chunk_docs``); this query certifies
their COMPOSITION — the thing a real corpus build actually runs — against
a sequential twin that chains the same kernels single-process
(state/oracle_dump_near.py).

Filter rule (all integer comparisons — exact parity by construction):
keep a document iff
  - it is not in the eval split (doc_id % DECON_EVAL_MOD != 0),
  - rep_permille <= RECIPE_REP_MAX (repetition cap), and
  - neg_logprob_fx <= RECIPE_MAX_BITS_FX * n_tokens (perplexity cap,
    cross-multiplied so no float division enters the decision).

Scale notes (100 TB):
- the LM model is trained on the full corpus in one (term, n) combiner
  pass and broadcast (ray.put at real vocab sizes);
- the filter is map-only; only survivors' (doc_id, digest) and trigram
  rows shuffle as keys — survivor text is materialized ONCE (object
  store, spillable) and reused by the dedup join, the trigram explode and
  the chunk pass; at 100 TB the equivalent is a stage checkpoint (write
  survivors to partitioned parquet, read back per stage) so no text block
  outlives its consumers;
- the decontamination join is trigram-keyed (eval side never broadcast);
- the final accounting reduces to |langs| rows via a per-batch combiner.
"""

from __future__ import annotations

import hashlib
from typing import Dict

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..io import table_nbytes
from ..joins import safe_join
from ..remote import remote_fn

_QR = "khl_pdf_ocr_ray.pipelines.queries_recipe"

RECIPE_REP_MAX = 650           # permille repeated-word cap (word_repetition rule)
RECIPE_MAX_BITS_FX = 5 * (1 << 20)  # 5.0 bits/token NLL cap, fixed-point x2^20

# planted exact duplicates: every 10th doc re-enters under a shifted id so
# the dedup stage demonstrably bites (the raw driver corpus is dup-free —
# dedup_exact shows 500 distinct hashes at sf0.001)
RECIPE_DUP_MOD = 10
RECIPE_DUP_OFFSET = 10_000_000

# eval split + trigram width + chunk geometry: single source of truth
from .queries_prep import CHUNK_SIZE, CHUNK_STRIDE, DECON_EVAL_MOD  # noqa: E402


def recipe_input_batch(batch: pa.Table) -> pa.Table:
    """Recipe input stream: the documents table plus an exact copy of
    every RECIPE_DUP_MOD-th doc under doc_id + RECIPE_DUP_OFFSET (same
    lang/text). Map-only fan-out; a doc and its copy may land in
    different blocks — exactly the case the distributed dedup must
    handle."""
    ids = batch["doc_id"].to_pylist()
    langs = batch["lang"].to_pylist()
    texts = batch["text"].to_pylist()
    out_i, out_l, out_t = list(ids), list(langs), list(texts)
    for d, lang, t in zip(ids, langs, texts):
        if d % RECIPE_DUP_MOD == 0:
            out_i.append(d + RECIPE_DUP_OFFSET)
            out_l.append(lang)
            out_t.append(t)
    return pa.table(
        {
            "doc_id": pa.array(out_i, pa.int64()),
            "lang": pa.array(out_l, pa.string()),
            "text": pa.array(out_t, pa.string()),
        }
    )


def recipe_filter_batch(batch: pa.Table, model: Dict[str, int]) -> pa.Table:
    """Map-only quality gate: drops the eval split, repetitive docs and
    high-perplexity docs. One tokenization per doc feeds both signals."""
    from .queries_corpus import _rep_permille

    floor_fx = min(model.values()) - (1 << 20)
    ids, langs, texts = [], [], []
    for d, lang, t in zip(
        batch["doc_id"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["text"].to_pylist(),
    ):
        if d % DECON_EVAL_MOD == 0:
            continue
        ws = (t or "").split(" ")
        if _rep_permille(ws) > RECIPE_REP_MAX:
            continue
        nll_fx = -sum(model.get(w, floor_fx) for w in ws)
        if nll_fx > RECIPE_MAX_BITS_FX * len(ws):
            continue
        ids.append(d)
        langs.append(lang)
        texts.append(t)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def recipe_hash_batch(batch: pa.Table) -> pa.Table:
    digests = [
        hashlib.md5((s or "").encode("utf-8")).hexdigest()
        for s in batch["text"].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text_hash": pa.array(digests, pa.string()),
        }
    )


def keep_ids_only(batch: pa.Table) -> pa.Table:
    return pa.table({"keep_doc_id": batch["keep_doc_id"]})


def eval_ng_distinct(batch: pa.Table) -> pa.Table:
    return pa.table({"ng_eval": batch["ng"]})


def flagged_ids_only(batch: pa.Table) -> pa.Table:
    return pa.table({"flagged_doc_id": batch["doc_id"]})


def chunk_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (lang, n_docs, n_chunks, n_tokens) combiner. Chunk
    geometry matches queries_prep.chunk_explode arithmetically: chunk k
    covers ws[k*S : k*S+C], k = 0 .. (n-1)//S."""
    rows: Dict[str, list] = {}
    for lang, t in zip(batch["lang"].to_pylist(), batch["text"].to_pylist()):
        n = len((t or "").split(" "))
        n_chunks = (n - 1) // CHUNK_STRIDE + 1
        n_tokens = sum(
            min(CHUNK_SIZE, n - k * CHUNK_STRIDE) for k in range(n_chunks)
        )
        agg = rows.setdefault(lang, [0, 0, 0])
        agg[0] += 1
        agg[1] += n_chunks
        agg[2] += n_tokens
    langs = sorted(rows)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_docs": pa.array([rows[l][0] for l in langs], pa.int64()),
            "n_chunks": pa.array([rows[l][1] for l in langs], pa.int64()),
            "n_tokens": pa.array([rows[l][2] for l in langs], pa.int64()),
        }
    )


def q_llm_corpus_recipe(sf_dir: str) -> rd.Dataset:
    """The composed training-corpus build; returns the per-language
    accounting of the cleaned, deduplicated, decontaminated, chunked
    corpus (lang, n_docs, n_chunks, n_tokens)."""
    from .queries import _t
    from .queries_corpus import _docs_coalesce, lm_model_from_counts

    docs = _t(sf_dir, "documents", ["doc_id", "lang", "text"]).map_batches(
        remote_fn(_QR, "recipe_input_batch"), batch_format="pyarrow"
    )

    # 1. LM training pass (full corpus, like unigram_logprob)
    counts = (
        docs.map_batches(
            remote_fn("khl_pdf_ocr_ray.pipelines.queries_corpus", "lm_count_partial"),
            batch_format="pyarrow",
        )
        # blocks x vocab combiner rows: coalesce width must scale with the
        # input's block count, never a literal 2
        .repartition(_docs_coalesce(sf_dir))
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    model = lm_model_from_counts(counts)

    # 2. map-only quality gate; survivors materialized once (reused by the
    # dedup join, the trigram explode and the final chunk pass)
    survivors = docs.map_batches(
        remote_fn(_QR, "recipe_filter_batch", model=model), batch_format="pyarrow"
    ).materialize()

    # 3. exact dedup: slim (doc_id, digest) stream -> keep min doc_id
    keep = (
        survivors.map_batches(remote_fn(_QR, "recipe_hash_batch"), batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"))
        .map_batches(remote_fn(_QR, "keep_ids_only"), batch_format="pyarrow")
    )
    deduped = safe_join(survivors, keep, on=("doc_id",), right_on=("keep_doc_id",))
    assert deduped is not None  # survivors non-empty on the driver corpora
    deduped = deduped.materialize()

    # 4. decontamination: eval trigrams (from the FULL corpus eval split)
    # joined against survivors' trigrams; flagged docs anti-joined away
    eval_ngs = (
        docs.map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.pipelines.queries_prep",
                "trigram_explode",
                eval_side=True,
            ),
            batch_format="pyarrow",
        )
        .groupby("ng")
        .aggregate(Count(alias_name="_n"))
        .map_batches(remote_fn(_QR, "eval_ng_distinct"), batch_format="pyarrow")
    )
    train_ngs = deduped.select_columns(["doc_id", "text"]).map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.pipelines.queries_prep",
            "trigram_explode",
            eval_side=False,
        ),
        batch_format="pyarrow",
    )
    # both trigram explodes come from structurally non-empty inputs (the
    # eval split always exists; the quality gate keeps most docs), so the
    # big decontamination join streams — no materialized barrier on the
    # exploded n-gram table. The anti join below KEEPS the fallback path:
    # `flagged` is empty whenever nothing is contaminated, and left_anti
    # against an empty right must return `deduped` unchanged (safe_join's
    # documented sentinel), which requires emptiness detection.
    nb = table_nbytes(sf_dir, "documents")
    hit = safe_join(
        train_ngs, eval_ngs, on=("ng",), right_on=("ng_eval",),
        assume_non_empty=True, left_nbytes=3 * nb, right_nbytes=nb,
    )
    flagged = (
        hit.groupby("doc_id")
        .aggregate(Count(alias_name="_n"))
        .map_batches(remote_fn(_QR, "flagged_ids_only"), batch_format="pyarrow")
    )
    clean = safe_join(
        deduped, flagged, on=("doc_id",), right_on=("flagged_doc_id",),
        join_type="left_anti",
    )
    assert clean is not None

    # 5. chunk accounting -> |langs|-row result
    return (
        clean.map_batches(remote_fn(_QR, "chunk_stats_partial"), batch_format="pyarrow")
        .repartition(2)  # tiny combiner output; non-empty reduce partitions
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )


RECIPE_QUERIES: Dict[str, object] = {
    "llm_corpus_recipe": q_llm_corpus_recipe,  # dump-backed oracle
}
