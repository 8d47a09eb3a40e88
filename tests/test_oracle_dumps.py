"""Sequential-oracle dump parity: the dump-backed DuckDB oracles must match
the Ray queries exactly (the driver runs this same comparison at sf0.01)."""

import duckdb
import pandas as pd
import pytest

DUMP_QUERIES = [
    "extract_pages",
    "extract_entities",
    "extract_refs_mode",
    "ref_team_matrix",
    "extract_host_stats",
    "master_validate",
    "pdf_words",
    "extract_blocks",
    "fingerprint_rolling",
    "skew_partition_stats",
    "url_dedup",
    "url_template_topk",
    "line_dedup",
    "host_pagerank",
    "host_hits",
    "url_blocklist",
    "html_block_stats",
    "media_image_features",
    "media_audio_features",
    "media_frame_sample",
    "media_phash_dups",
    "media_audiofp_dups",
    "media_vhash_dups",
    "fingerprint_pr_eval",
    "lineage",
    # near-dup / ANN family (state/oracle_dump_near.py sequential twins)
    "minhash_dups",
    "source_kl_drift",
    "minhash_clusters",
    "simhash_dups",
    "ngram_jaccard_dups",
    "ngram_containment",
    "embedding_align",
    "minhash_incremental",
    "minhash_keep_best",
    "ann_lsh",
    "ann_lsh_incremental",
    "ann_ivf",
    "ann_ivf_incremental",
    "ann_ivfpq",
    "embedding_dups_lsh",
    "embedding_clusters",
    "hll_distinct_users",
    "hll_users_by_type",
    "bigram_topk_cms",
    "bm25_topk",
    "kmeans_clusters",
    "pca_project",
    "unigram_logprob",
    "bigram_logprob",
    "dsir_topk",
    "ccnet_buckets",
    "domain_classifier",
    "llm_corpus_recipe",
    "cluster_lang_purity",
    "semdedup",
    "cluster_top_terms",
    # training-engine widening (state/oracle_dump_train.py twins)
    "bpe_merges",
    "bpe_encode",
    "bpe_fertility",
    "compression_ratio",
    "cdc_chunk_dedup",
    "temperature_sample",
    "doc_graph_coreness",
    "span_corruption",
    "compaction_plan",
    # link-graph extraction (state/oracle_dump_links.py twins)
    "html_links",
    "html_link_degree",
    "html_meta",
    "anchor_text_agg",
    # Bloom-prefiltered plan twin (shares line_dedup's oracle)
    "bloom_line_dedup",
    # table-region cells (oracle_dump.py pages surface)
    "pdf_table_cells",
    # graph additions (queries_graphy in-module twins)
    "graph_label_communities",
    "graph_mst_boruvka",
    "graph_ppr",
    # MMR diversified rerank (queries_mmr in-module twin)
    "mmr_rerank",
    # isotonic calibration (queries_iso GCM-hull twin)
    "isotonic_calibration",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("qname", DUMP_QUERIES)
def test_dump_oracle_matches_ray_query(ray_session, sf_smoke_dir, qname):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES, oracles

    sqls = oracles(sf_smoke_dir)
    res = QUERIES[qname](sf_smoke_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_smoke_dir}/documents.parquet')"
    )
    odf = con.execute(sqls[qname]).df()
    a, b = _norm(df), _norm(odf)
    assert len(a) == len(b)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
