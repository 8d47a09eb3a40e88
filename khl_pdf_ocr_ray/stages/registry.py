"""Stage registry — the user-extension surface (SURVEY.md §2.10).

The reference's extension points are a ``mode`` query param and env vars;
the engine generalizes that to a declared registry of pipeline steps: each
entry names a ``map_batches``-compatible callable (function for stateless
tasks, class for actor pools), its batch format, and whether it holds
state. ``build_stage`` resolves an entry through remote.py so a stage is
usable from any driver cwd; user code can register additional stages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional


@dataclass(frozen=True)
class StageSpec:
    module: str          # import path of the implementation
    attr: str            # function or callable-class name
    kind: str            # "task" (stateless fn) | "actor" (stateful pool)
    batch_format: str    # "pyarrow" | "pandas"
    description: str


REGISTRY: Dict[str, StageSpec] = {
    "meta": StageSpec(
        "khl_pdf_ocr_ray.stages.extract", "meta_stage", "task", "pyarrow",
        "vectorized n_bytes + host projection",
    ),
    "extract_text_layer": StageSpec(
        "khl_pdf_ocr_ray.stages.extract", "extract_text_layer", "task", "pyarrow",
        "HTML/WBOX/PDF text-layer extraction + entity parsers, flags OCR rows",
    ),
    "ocr_fallback": StageSpec(
        "khl_pdf_ocr_ray.stages.extract", "OcrFallbackStage", "actor", "pyarrow",
        "raster OCR fallbacks for flagged rows; engine held per actor",
    ),
    "words_explode": StageSpec(
        "khl_pdf_ocr_ray.stages.extract", "words_explode_batch", "task", "pyarrow",
        "pages -> exploded (url, page, y, x, token) word boxes",
    ),
    "partition_key": StageSpec(
        "khl_pdf_ocr_ray.stages.skew", "add_partition_key", "task", "pyarrow",
        "salted host-hash partition key with giant-doc isolation",
    ),
    "lang_id": StageSpec(
        "khl_pdf_ocr_ray.stages.textqc", "lang_id_batch", "task", "pyarrow",
        "stopword-count language identification",
    ),
    "quality": StageSpec(
        "khl_pdf_ocr_ray.stages.textqc", "quality_batch", "task", "pyarrow",
        "token/type/char quality metrics",
    ),
    "fingerprint": StageSpec(
        "khl_pdf_ocr_ray.stages.textqc", "fingerprint_batch", "task", "pyarrow",
        "md5 + rolling-hash document fingerprints",
    ),
    "minhash_sig": StageSpec(
        "khl_pdf_ocr_ray.stages.dedup", "minhash_sig_batch", "task", "pyarrow",
        "128-perm MinHash signatures",
    ),
    "simhash": StageSpec(
        "khl_pdf_ocr_ray.stages.dedup", "simhash_batch", "task", "pyarrow",
        "64-bit SimHash + band keys",
    ),
    "image_features": StageSpec(
        "khl_pdf_ocr_ray.stages.multimodal", "ImageFeatureStage", "actor", "pyarrow",
        "image decode + stats + thumbnail dims",
    ),
    "audio_features": StageSpec(
        "khl_pdf_ocr_ray.stages.multimodal", "AudioFeatureStage", "actor", "pyarrow",
        "audio decode + windowed features",
    ),
    "frame_sample": StageSpec(
        "khl_pdf_ocr_ray.stages.multimodal", "VideoFrameSampleStage", "actor", "pyarrow",
        "video frame sampling",
    ),
    "fetcher": StageSpec(
        "khl_pdf_ocr_ray.sources.fetch", "FetcherStage", "actor", "pyarrow",
        "HTTP fetch with per-actor session (transport-injectable)",
    ),
    "shingle_explode": StageSpec(
        "khl_pdf_ocr_ray.stages.dedup", "shingle_explode_batch", "task", "pyarrow",
        "doc -> (shingle, doc_id) inverted-index rows",
    ),
    "lsh_bucket": StageSpec(
        "khl_pdf_ocr_ray.stages.knn", "lsh_bucket_batch", "task", "pyarrow",
        "embedding -> LSH bucket rows (the persisted-index build map)",
    ),
    "triangle_replicate": StageSpec(
        "khl_pdf_ocr_ray.stages.knn", "triangle_replicate_batch", "task", "pyarrow",
        "all-pairs triangle replication for the distributed exact self-join",
    ),
    "fragment_extract": StageSpec(
        "khl_pdf_ocr_ray.state.manifest", "FragmentExtractWorker", "actor", "pyarrow",
        "resumable fragment-per-task extract: partition write + manifest per call",
    ),
    "bloom_partial": StageSpec(
        "khl_pdf_ocr_ray.functions.bloom", "bloom_partial_batch", "task", "pyarrow",
        "per-batch Bloom bitmap partial (semi-join prefilter build)",
    ),
    "bloom_probe": StageSpec(
        "khl_pdf_ocr_ray.functions.bloom", "bloom_probe_batch", "task", "pyarrow",
        "map-side Bloom membership prefilter before an exact join",
    ),
}


def register(name: str, spec: StageSpec) -> None:
    if name in REGISTRY:
        raise ValueError(f"stage {name!r} already registered")
    REGISTRY[name] = spec


def build_stage(name: str, **static_kwargs):
    """Resolve a registry entry to the object to pass to ``map_batches``
    (wrapped for worker-side importability)."""
    from ..remote import remote_cls, remote_fn

    spec = REGISTRY[name]
    if spec.kind == "actor":
        if static_kwargs:
            raise ValueError(
                f"stage {name!r} is an actor stage: pass construction args "
                "via map_batches(fn_constructor_kwargs=...), not build_stage()"
            )
        return remote_cls(spec.module, spec.attr)
    return remote_fn(spec.module, spec.attr, **static_kwargs)
