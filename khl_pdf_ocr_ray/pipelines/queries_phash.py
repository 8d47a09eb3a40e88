"""Multimodal near-duplicate detection: fingerprint dedup + eval.

``media_phash_dups`` / ``media_audiofp_dups`` / ``media_vhash_dups`` —
the image / audio / video near-dup trio, one shared plan: decode ->
63-bit fingerprint (DCT pHash / Haitsma-Kalker spectral hash /
mean-frame pHash) -> banded LSH (16+16+16+15 bits) -> in-bucket
SWAR-popcount verify -> distinct pairs with Hamming <= the threshold.
The banding is pigeonhole-COMPLETE at Hamming <= 3, so each
distributed plan's pair set equals its sequential brute-force twin's
exactly — those twins (state/oracle_dump.py) are the oracles.

``fingerprint_pr_eval`` scores all three pair sets against the
planted family ground truth (id // variants) in integer permille.

The corpora are the planted family tables in stages/multimodal.py
(per-family structure in DCT coefficients / band envelopes / mean
frames; variants add noise plus the invariance each hash exists for —
brightness shift, gain change, frame reorder). See the multimodal.py
section comments for measured separations.

Plan / 100 TB notes: decode+hash is an ACTOR-POOL stage (per-actor
DCT basis — real held state) with small batches (binary payloads are
wide rows); the only exchange moves (media_id, fp, band) rows — 4 x
16 bytes per item, payloads never shuffle; in-bucket verify is
vectorized with a LOUD bucket-cap assert (hot buckets take the
simhash split-on-extra-bits treatment). Identical shape to the text
simhash plan carrying the 100 TB skew documentation
(stages/dedup.py:45-55).

Reference analogue: /root/reference/app.py has no media surface;
brief scope (multimodal dedup as a first-class component).
"""

from __future__ import annotations

import ray.data as rd

from ..remote import remote_cls, remote_fn

_MM = "khl_pdf_ocr_ray.stages.multimodal"
_QP = "khl_pdf_ocr_ray.pipelines.queries_phash"


def _fp_dups(table_fn_name: str, stage_name: str, batch_size: int) -> rd.Dataset:
    """The shared banded-LSH near-dup plan over one planted media table."""
    import importlib

    from ray.data.aggregate import Min

    mm = importlib.import_module(_MM)
    media = rd.from_arrow(getattr(mm, table_fn_name)()).repartition(8)
    bands = media.map_batches(
        remote_cls(_MM, stage_name),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(2, 4),
        num_cpus=0.5,
    )
    pairs = bands.groupby("shard").map_groups(
        remote_fn(_MM, "phash_bucket_pairs"), batch_format="pyarrow"
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def q_media_phash_dups(sf_dir: str) -> rd.Dataset:
    """(id_a, id_b, hamming) image pairs, Hamming <= PHASH_HAMMING_MAX."""
    return _fp_dups("media_phash_table", "PhashBandStage", 32)


def q_media_audiofp_dups(sf_dir: str) -> rd.Dataset:
    """(id_a, id_b, hamming) audio pairs, Hamming <= AFP_HAMMING_MAX."""
    return _fp_dups("media_afp_table", "AfpBandStage", 32)


def q_media_vhash_dups(sf_dir: str) -> rd.Dataset:
    """(id_a, id_b, hamming) video pairs, Hamming <= PHASH_HAMMING_MAX
    (video payloads are the widest rows, hence the smaller batch)."""
    return _fp_dups("media_vhash_table", "VhashBandStage", 16)


def pr_tag(batch, variants: int, modality: str):
    """pairs batch -> one (modality, tp, fp) partial row."""
    import numpy as np
    import pyarrow as pa

    a = batch["id_a"].to_numpy(zero_copy_only=False).astype("int64")
    b = batch["id_b"].to_numpy(zero_copy_only=False).astype("int64")
    tp = int(((a // variants) == (b // variants)).sum())
    return pa.table(
        {
            "modality": pa.array([modality], pa.string()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([len(a) - tp], pa.int64()),
        }
    )


def pr_finalize(batch, planted: int):
    """(modality, tp, fp) totals -> permille precision/recall/F1.
    Empty pair sets report precision 0 (nothing found), not a crash."""
    import pyarrow as pa

    rows = {
        "modality": [], "tp": [], "fp": [], "fn": [],
        "precision_permille": [], "recall_permille": [], "f1_permille": [],
    }
    for r in batch.to_pylist():
        tp, fp = int(r["tp"]), int(r["fp"])
        fn = planted - tp
        rows["modality"].append(r["modality"])
        rows["tp"].append(tp)
        rows["fp"].append(fp)
        rows["fn"].append(fn)
        rows["precision_permille"].append(
            1000 * tp // (tp + fp) if tp + fp else 0
        )
        rows["recall_permille"].append(1000 * tp // planted)
        rows["f1_permille"].append(2000 * tp // (2 * tp + fp + fn))
    return pa.table(
        {
            "modality": pa.array(rows["modality"], pa.string()),
            "tp": pa.array(rows["tp"], pa.int64()),
            "fp": pa.array(rows["fp"], pa.int64()),
            "fn": pa.array(rows["fn"], pa.int64()),
            "precision_permille": pa.array(
                rows["precision_permille"], pa.int64()
            ),
            "recall_permille": pa.array(rows["recall_permille"], pa.int64()),
            "f1_permille": pa.array(rows["f1_permille"], pa.int64()),
        }
    )


def q_fingerprint_pr_eval(sf_dir: str) -> rd.Dataset:
    """Precision/recall/F1 of each fingerprint modality's banded pair set
    against the PLANTED family ground truth (id // variants) — the
    minhash_pr_eval pattern for the image/audio/video trio. The pair
    sets are the SAME certified-by-dump sets the media_*_dups queries
    emit, so the eval's inputs carry their own oracle. Plan: three pair
    streams tag map-side into one (modality, tp, fp) row each; ONE
    3-row exchange; integer permille finalize. The planted-total and
    variants constants are shared with the dump-SQL twin through
    state/oracle_dump.py's imports — not re-hardcoded there."""
    from ray.data.aggregate import Sum

    from ..stages.multimodal import (
        AFP_VARIANTS,
        N_AFP_FAMILIES,
        N_PHASH_FAMILIES,
        N_VHASH_FAMILIES,
        PHASH_VARIANTS,
        VHASH_VARIANTS,
    )

    assert (
        N_PHASH_FAMILIES == N_AFP_FAMILIES == N_VHASH_FAMILIES
        and PHASH_VARIANTS == AFP_VARIANTS == VHASH_VARIANTS
    ), "per-modality planted totals diverged — recompute per modality"
    v = PHASH_VARIANTS
    planted = N_PHASH_FAMILIES * (v * (v - 1) // 2)
    parts = [
        q_media_phash_dups(sf_dir).map_batches(
            remote_fn(_QP, "pr_tag", variants=v, modality="phash"),
            batch_format="pyarrow",
        ),
        q_media_audiofp_dups(sf_dir).map_batches(
            remote_fn(_QP, "pr_tag", variants=v, modality="audiofp"),
            batch_format="pyarrow",
        ),
        q_media_vhash_dups(sf_dir).map_batches(
            remote_fn(_QP, "pr_tag", variants=v, modality="vhash"),
            batch_format="pyarrow",
        ),
    ]
    return (
        parts[0]
        .union(parts[1], parts[2])
        .groupby("modality")
        .aggregate(Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"))
        .map_batches(
            remote_fn(_QP, "pr_finalize", planted=planted),
            batch_format="pyarrow",
        )
    )


PHASH_QUERIES = {
    "media_phash_dups": q_media_phash_dups,
    "media_audiofp_dups": q_media_audiofp_dups,
    "media_vhash_dups": q_media_vhash_dups,
    "fingerprint_pr_eval": q_fingerprint_pr_eval,
}
# oracles: dump-backed (state/oracle_dump.py brute-force pair dumps),
# added by pipelines.queries.oracles()
