"""khl_pdf_ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch generalization of the capabilities of the reference repo
``GG-Andrew/khl-pdf-ocr`` (a single-document Flask PDF extractor,
/root/reference/app.py) into a streaming, distributed extraction pipeline
over Common-Crawl-style Parquet page shards:

- HTML boilerplate stripping via text-density / link-density block scoring
  (stdlib html.parser; no external deps),
- PDF layout parsing (word -> reading-order sort -> greedy y-cluster lines
  -> upper-median column split -> regex entity extraction), replicating the
  reference algorithms' semantics exactly (byte-identical extracted text),
- an OCR-fallback actor-pool stage with the engine held per actor,
- shuffle-bearing corpus operators (dedup exact/MinHash/SimHash/Jaccard/
  embedding, stats, top-k, joins, ANN search, text QC),
- per-partition lineage manifests and checkpoint/resume.

Layout:
  functions/  pure per-document kernels (no Ray imports)
  sources/    payload codecs + deterministic synthetic corpus generation
  stages/     Ray Data map_batches / actor-pool / shuffle stages
  pipelines/  end-to-end pipelines and the queries()/oracle_sql() registry
  state/      lineage + checkpoint manifests
"""

__version__ = "0.1.0"
