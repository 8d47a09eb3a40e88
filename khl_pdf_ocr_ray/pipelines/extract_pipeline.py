"""The flagship pipeline: pages parquet -> extracted parquet, streaming.

read_parquet (pruned) -> vectorized meta projection -> text-layer extract
(stateless tasks) -> OCR fallback (actor pool, flagged rows only) ->
consume (write_parquet / aggregate / return Dataset). No full
materialization anywhere; blocks stream with backpressure.

Scale notes (100 TB thinking, tested single-node):
- the payload column is read once and dropped as soon as extraction is
  done; only flagged rows carry payload into the OCR stage (`_payload`,
  null elsewhere) so rasters/binaries never sit in the object store
  longer than one stage;
- batch sizes: extraction batches are modest (payload-heavy rows);
  OCR batches small (raster work per row);
- per-stage concurrency left to the streaming executor for stateless
  stages; the OCR pool is explicitly sized.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Optional

import pyarrow as pa

import ray.data as rd

from ..remote import remote_cls, remote_fn
from ..sources.synth import SEED
from ..stages.extract import EXTRACTED_SCHEMA, OcrConfig

CACHE_ROOT = "/tmp/khlray_cache"


@dataclass
class ExtractConfig:
    """Pipeline knobs (SURVEY.md §2.1 S6 analogue of env-var config)."""

    extract_batch_size: int = 256       # payload-heavy rows -> modest batches
    ocr_batch_size: int = 32            # raster work per row -> small batches
    ocr_concurrency: tuple = (2, 8)     # actor pool (min, max)
    ocr_num_cpus: float = 1.0           # one engine per core (app.py OCR is 1-proc-per-call)
    ocr: OcrConfig = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.ocr is None:
            self.ocr = OcrConfig()


def read_pages(path: str, columns: Optional[list] = None) -> rd.Dataset:
    """Prune at the read: only the columns the pipeline consumes."""
    return rd.read_parquet(path, columns=columns or ["url", "warc_ts", "html", "text", "lang"])


def build_extract_pipeline(pages: rd.Dataset, cfg: Optional[ExtractConfig] = None) -> rd.Dataset:
    """pages Dataset -> extracted Dataset (lazy; caller consumes)."""
    cfg = cfg or ExtractConfig()
    ds = pages.map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.extract", "meta_stage"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.extract", "extract_text_layer"),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    ds = ds.map_batches(
        remote_cls("khl_pdf_ocr_ray.stages.extract", "OcrFallbackStage"),
        fn_constructor_kwargs={"dpi": cfg.ocr.dpi, "lang": cfg.ocr.lang},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.ocr_concurrency,
        num_cpus=cfg.ocr_num_cpus,
    )
    return ds


def run_extract(pages_path: str, cfg: Optional[ExtractConfig] = None) -> rd.Dataset:
    return build_extract_pipeline(read_pages(pages_path), cfg)


# --- synthetic corpus materialization (cached) ------------------------------
def pages_cache_dir(sf_dir: str, repeat: int = 1, seed: int = SEED) -> str:
    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    key = hashlib.sha256(
        f"{doc_path}:{st.st_size}:{repeat}:{seed}:v3".encode()
    ).hexdigest()[:16]
    return os.path.join(CACHE_ROOT, f"pages_{key}")


def synthesize_pages(
    sf_dir: str, repeat: int = 1, seed: int = SEED, num_blocks: Optional[int] = None
) -> str:
    """Generate (once, cached) the deterministic pages corpus for an sf dir.

    Runs as a Ray pipeline so generation parallelizes at bench scale:
    read documents -> map_batches(fan-out rows) -> write_parquet shards.
    Returns the parquet directory path.
    """
    out_dir = pages_cache_dir(sf_dir, repeat, seed)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    if num_blocks is None:
        num_blocks = max(4, min(64, docs.count() // 125))
    pages = docs.repartition(num_blocks).map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.sources.synth",
            "pages_from_documents_batch",
            repeat=repeat,
            seed=seed,
        ),
        batch_format="pyarrow",
        batch_size=256,
    )
    pages.write_parquet(out_dir)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
