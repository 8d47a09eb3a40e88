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
    # OCR batches sized like the extract batches: the stage passes most rows
    # through untouched, and tiny batches multiply actor-task dispatch cost
    # (3000+ RPCs per 100k rows at 32). Batch 1024 / pool 16 were A/B-tested
    # at 800k docs/32 CPUs (6 interleaved pairs against this config): the
    # wider/chunkier settings lost 5 of 6 pairs despite ds.stats() showing
    # large nominal queue wait behind the 8-actor pool — the queue is
    # absorbed by pipelining, and the wider pool's extra logical-CPU
    # reservation starves the extract tasks instead. Real raster engines
    # with multi-second per-page cost would shrink this via OcrConfig.
    ocr_batch_size: int = 256
    # actor pool (min, max): Ray fuses the upstream task stages into this
    # pool, so its size IS the whole pipeline's parallelism. None -> derive
    # from the session's CPU count at build time (min high enough that
    # autoscaler ramp-up lag doesn't dominate short runs; a slice left free
    # for the read/write task stages)
    ocr_concurrency: tuple | None = None
    # logical CPUs reserved per OCR actor. The deterministic stand-in engine
    # does light work (most rows pass through), so the pool must not starve
    # the task stages of a small node; a real tesseract-style engine pegging
    # one core per page would set this to 1.0
    ocr_num_cpus: float = 0.25
    # extractor subset, mirroring the reference's ?mode= dispatch
    # (app.py:405-412): "all" | "words" | "refs" | "goalies"
    mode: str = "all"
    # reference debug=1: surface raw_ref_line / ocr_ref_line / ocr_fallback
    # as extra output columns (app.py:203, 261, 336)
    debug: bool = False
    ocr: OcrConfig = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.ocr is None:
            self.ocr = OcrConfig()


def read_pages(path: str, columns: Optional[list] = None) -> rd.Dataset:
    """Prune at the read: only the columns the pipeline consumes.

    Plain read_parquet, NOT io.read_parquet_clean: the pages corpus is
    Ray-written (schemas already metadata-free), and an explicit schema=
    suppresses the read's automatic block splitting — which caps the
    pipeline's parallelism at the file count."""
    return rd.read_parquet(path, columns=columns or ["url", "warc_ts", "html", "text", "lang"])


def build_extract_pipeline(pages: rd.Dataset, cfg: Optional[ExtractConfig] = None) -> rd.Dataset:
    """pages Dataset -> extracted Dataset (lazy; caller consumes)."""
    cfg = cfg or ExtractConfig()
    concurrency = cfg.ocr_concurrency
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # small fixed pool: the OCR stage is deliberately NOT fused with the
        # task stages (see ray_remote_args_fn below), so the heavy text-layer
        # extraction parallelizes across all CPUs as tasks while this pool
        # only absorbs the flagged slice + cheap pass-through filtering.
        # Width 16 was A/B-tested at 800k docs/32 CPUs and lost to 8 in 5 of
        # 6 interleaved pairs (see ocr_batch_size note). A real
        # multi-second-per-page OCR engine would size this up via
        # ExtractConfig.ocr_concurrency.
        width = max(2, min(8, ncpu // 2))
        concurrency = (width, width)
    ds = pages.map_batches(
        remote_fn("khl_pdf_ocr_ray.stages.extract", "meta_stage"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        remote_fn(
            "khl_pdf_ocr_ray.stages.extract",
            "extract_text_layer",
            mode=cfg.mode,
            debug=cfg.debug,
        ),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    ds = ds.map_batches(
        remote_cls("khl_pdf_ocr_ray.stages.extract", "OcrFallbackStage"),
        fn_constructor_kwargs={
            "dpi": cfg.ocr.dpi,
            "lang": cfg.ocr.lang,
            "mode": cfg.mode,
            "contrast": cfg.ocr.contrast,
            "sharpen": cfg.ocr.sharpen,
            "psm": cfg.ocr.psm,
            "debug": cfg.debug,
        },
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=concurrency,
        num_cpus=cfg.ocr_num_cpus,
        # presence of a ray_remote_args_fn disables operator fusion (Ray's
        # fusion rule refuses ops with a remote-args fn): without this, the
        # task stages above are fused INTO the actor pool and the pool size
        # caps the whole pipeline's parallelism
        ray_remote_args_fn=dict,
    )
    return ds


def run_extract(pages_path: str, cfg: Optional[ExtractConfig] = None) -> rd.Dataset:
    return build_extract_pipeline(read_pages(pages_path), cfg)


# --- synthetic corpus materialization (cached) ------------------------------
def pages_cache_dir(
    sf_dir: str,
    repeat: int = 1,
    seed: int = SEED,
    giants_per_mille: int = 0,
    num_blocks=None,
) -> str:
    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    # num_blocks is part of the key: its whole purpose is file LAYOUT, so
    # an explicit value must never be silently served a cached other layout.
    # size AND mtime_ns: a regenerated source file of identical byte size
    # must never serve a stale cached corpus (content-fingerprint
    # convention shared with state/manifest.fragment_fingerprint)
    key = hashlib.sha256(
        f"{doc_path}:{st.st_size}:{st.st_mtime_ns}:{repeat}:{seed}"
        f":{giants_per_mille}:{num_blocks}:v7".encode()  # v7: HTML tables
    ).hexdigest()[:16]
    return os.path.join(CACHE_ROOT, f"pages_{key}")


def synthesize_pages(
    sf_dir: str,
    repeat: int = 1,
    seed: int = SEED,
    num_blocks: Optional[int] = None,
    giants_per_mille: int = 0,
) -> str:
    """Generate (once, cached) the deterministic pages corpus for an sf dir.

    Runs as a Ray pipeline so generation parallelizes at bench scale:
    read documents -> map_batches(fan-out rows) -> write_parquet shards.
    Returns the parquet directory path.
    """
    from ..state.atomic import ensure_published

    out_dir = pages_cache_dir(sf_dir, repeat, seed, giants_per_mille, num_blocks)

    def _build(tmp_dir: str) -> None:
        from ..io import read_parquet_clean

        # metadata-clean read: the b'pandas' schema dict would make every
        # repartition reduce task log "Failed to hash the schemas" and lose
        # schema dedup on the exchange
        docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"))
        n = num_blocks if num_blocks is not None else max(4, min(64, docs.count() // 125))
        pages = docs.repartition(n).map_batches(
            remote_fn(
                "khl_pdf_ocr_ray.sources.synth",
                "pages_from_documents_batch",
                repeat=repeat,
                seed=seed,
                giants_per_mille=giants_per_mille,
            ),
            batch_format="pyarrow",
            batch_size=256,
        )
        # bounded file size so the read side gets enough parallel fragments
        # (also the resumable-partition granularity for the extract job)
        pages.write_parquet(tmp_dir, max_rows_per_file=2500)

    # crash- and concurrency-safe publish (tmp dir + rename + _DONE under
    # an exclusive lock): see state/atomic.py
    return ensure_published(out_dir, _build)
