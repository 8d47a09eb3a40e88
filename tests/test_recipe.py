"""Stage-effect checks for the composed LLM training-data recipe
(pipelines/queries_recipe.py): each stage of the composition must
demonstrably bite on the driver corpus, and the kernels must be
batching-invariant (the property the distributed plan relies on)."""

import pyarrow as pa
import pyarrow.parquet as pq

from khl_pdf_ocr_ray.pipelines.queries_corpus import (
    lm_count_partial,
    lm_model_from_counts,
)
from khl_pdf_ocr_ray.pipelines.queries_recipe import (
    DECON_EVAL_MOD,
    RECIPE_DUP_MOD,
    RECIPE_DUP_OFFSET,
    chunk_stats_partial,
    recipe_filter_batch,
    recipe_hash_batch,
    recipe_input_batch,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(SF + "/documents.parquet", columns=["doc_id", "lang", "text"])


def test_input_plants_exact_duplicates():
    docs = _docs()
    expanded = recipe_input_batch(docs)
    n_planted = sum(1 for d in docs["doc_id"].to_pylist() if d % RECIPE_DUP_MOD == 0)
    assert expanded.num_rows == docs.num_rows + n_planted
    # a planted copy hashes identically to its original
    h = recipe_hash_batch(expanded).to_pandas().set_index("doc_id")["text_hash"]
    orig = next(d for d in docs["doc_id"].to_pylist() if d % RECIPE_DUP_MOD == 0)
    assert h[orig] == h[orig + RECIPE_DUP_OFFSET]


def test_every_stage_bites():
    docs = recipe_input_batch(_docs())
    model = lm_model_from_counts(lm_count_partial(docs).to_pandas())
    surv = recipe_filter_batch(docs, model)
    # quality gate drops eval docs and low-quality docs, keeps a majority
    assert 0 < surv.num_rows < docs.num_rows
    assert all(d % DECON_EVAL_MOD != 0 for d in surv["doc_id"].to_pylist())
    # dedup stage has real work: at least one surviving duplicate pair
    h = recipe_hash_batch(surv).to_pandas()
    assert (h.groupby("text_hash")["doc_id"].count() > 1).any()


def test_filter_batching_invariant():
    docs = recipe_input_batch(_docs())
    model = lm_model_from_counts(lm_count_partial(docs).to_pandas())
    whole = recipe_filter_batch(docs, model)
    parts = pa.concat_tables(
        [recipe_filter_batch(docs.slice(i, 97), model) for i in range(0, docs.num_rows, 97)]
    )
    assert whole.equals(parts)


def test_chunk_stats_match_chunk_explode_geometry():
    from khl_pdf_ocr_ray.pipelines.queries_prep import chunk_explode

    docs = _docs().slice(0, 50)
    stats = chunk_stats_partial(docs.select(["lang", "text"])).to_pandas()
    chunks = chunk_explode(docs.select(["doc_id", "text"])).to_pandas()
    lang_by_doc = dict(
        zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist())
    )
    chunks["lang"] = chunks["doc_id"].map(lang_by_doc)
    want = chunks.groupby("lang").agg(
        n_chunks=("chunk_id", "count"), n_tokens=("n_words", "sum")
    )
    got = stats.set_index("lang")
    assert got["n_chunks"].to_dict() == want["n_chunks"].to_dict()
    assert got["n_tokens"].to_dict() == {k: int(v) for k, v in want["n_tokens"].items()}
