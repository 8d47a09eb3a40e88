"""Multimodal near-duplicate detection: perceptual-hash image dedup.

``media_phash_dups`` — the image twin of simhash_dups: decode ->
63-bit DCT perceptual hash -> banded LSH (16+16+16+15 bits) ->
in-bucket SWAR-popcount verify -> distinct pairs with Hamming <=
PHASH_HAMMING_MAX. The banding is pigeonhole-COMPLETE at that
threshold, so the distributed plan's pair set equals the sequential
brute-force twin's exactly — that twin (state/oracle_dump.py) is the
oracle.

The corpus is the planted image-family table
(stages/multimodal.media_phash_table): per-family structure lives in
the low-frequency DCT coefficients, variants add pixel noise and a
brightness shift (invisible to the hash — DC excluded). See the
multimodal.py section comment for the measured separation.

Plan / 100 TB notes: decode+hash is an ACTOR-POOL stage (per-actor
DCT basis; stands in for real embedder weights) with small batches
(binary payloads are wide rows); the only exchange moves (media_id,
phash, band) rows — 4 x 16 bytes per image, payloads never shuffle;
in-bucket verify is capped (BUCKET_CAP) and vectorized. Identical
shape to the text simhash plan that already carries the 100 TB
skew/cap documentation (stages/dedup.py:45-55).

Reference analogue: /root/reference/app.py has no media surface;
brief scope (multimodal dedup as a first-class component).
"""

from __future__ import annotations

import ray.data as rd

from ..remote import remote_cls, remote_fn

_MM = "khl_pdf_ocr_ray.stages.multimodal"


def q_media_phash_dups(sf_dir: str) -> rd.Dataset:
    """(id_a, id_b, hamming) pairs with Hamming <= PHASH_HAMMING_MAX."""
    from ray.data.aggregate import Min

    from ..stages.multimodal import media_phash_table

    media = rd.from_arrow(media_phash_table()).repartition(8)
    bands = media.map_batches(
        remote_cls(_MM, "PhashBandStage"),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(2, 4),
        num_cpus=0.5,
    )
    pairs = bands.groupby("shard").map_groups(
        remote_fn(_MM, "phash_bucket_pairs"), batch_format="pyarrow"
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def q_media_audiofp_dups(sf_dir: str) -> rd.Dataset:
    """(id_a, id_b, hamming) audio pairs with Hamming <= AFP_HAMMING_MAX
    — the audio twin of media_phash_dups: decode -> 63-bit Haitsma-
    Kalker-style spectral fingerprint -> the SAME pigeonhole-complete
    banding and in-bucket SWAR verify (fp_band_rows /
    phash_bucket_pairs are hash-agnostic over 63-bit fingerprints)."""
    from ray.data.aggregate import Min

    from ..stages.multimodal import media_afp_table

    media = rd.from_arrow(media_afp_table()).repartition(8)
    bands = media.map_batches(
        remote_cls(_MM, "AfpBandStage"),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(2, 4),
        num_cpus=0.5,
    )
    pairs = bands.groupby("shard").map_groups(
        remote_fn(_MM, "phash_bucket_pairs"), batch_format="pyarrow"
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def q_media_vhash_dups(sf_dir: str) -> rd.Dataset:
    """(id_a, id_b, hamming) video pairs with Hamming <= PHASH_HAMMING_MAX
    — the video twin: frame-average -> phash63 (frame-order- and
    noise-invariant), same banding and in-bucket verify."""
    from ray.data.aggregate import Min

    from ..stages.multimodal import media_vhash_table

    media = rd.from_arrow(media_vhash_table()).repartition(8)
    bands = media.map_batches(
        remote_cls(_MM, "VhashBandStage"),
        batch_format="pyarrow",
        batch_size=16,  # video payloads are the widest rows
        concurrency=(2, 4),
        num_cpus=0.5,
    )
    pairs = bands.groupby("shard").map_groups(
        remote_fn(_MM, "phash_bucket_pairs"), batch_format="pyarrow"
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


PHASH_QUERIES = {
    "media_phash_dups": q_media_phash_dups,
    "media_audiofp_dups": q_media_audiofp_dups,
    "media_vhash_dups": q_media_vhash_dups,
}
# oracles: dump-backed (state/oracle_dump.py brute-force pair dumps),
# added by pipelines.queries.oracles()
