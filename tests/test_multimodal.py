"""Multimodal column stages: toy-container decode, features, sampling."""

import numpy as np
import pytest

from khl_pdf_ocr_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageFeatureStage,
    MediaDecodeError,
    VideoFrameSampleStage,
    decode_audio,
    decode_image,
    decode_video,
    media_table,
    synth_audio,
    synth_image,
    synth_video,
)


def test_image_roundtrip_deterministic():
    p = synth_image(7, width=16, height=8, channels=3)
    img = decode_image(p)
    assert img.shape == (8, 16, 3)
    assert decode_image(synth_image(7, 16, 8, 3)).tobytes() == img.tobytes()


def test_real_jpeg_is_marked_stub():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")


def test_truncated_image_raises():
    p = synth_image(3)[:-10]
    with pytest.raises(MediaDecodeError):
        decode_image(p)


def test_audio_decode():
    rate, samples = decode_audio(synth_audio(5, n_samples=256, sample_rate=8000))
    assert rate == 8000 and len(samples) == 256


def test_video_decode_shape():
    frames = decode_video(synth_video(2, n_frames=4, width=6, height=5))
    assert frames.shape == (4, 5, 6)


def test_image_stage_batch():
    t = media_table(10)
    out = ImageFeatureStage(target_w=4, target_h=4)(t)
    assert out.num_rows == 10  # one per image row
    assert out["ok"].to_pylist() == [True] * 10
    assert all(w == 4 for w in out["thumb_w"].to_pylist())
    # deterministic features
    out2 = ImageFeatureStage(target_w=4, target_h=4)(t)
    assert out.equals(out2)


def test_audio_stage_batch():
    t = media_table(6)
    out = AudioFeatureStage(window=512)(t)
    assert out.num_rows == 6
    assert all(v > 0 for v in out["rms_x100"].to_pylist())


def test_video_stage_every_k():
    t = media_table(3)
    out = VideoFrameSampleStage(every_k=4)(t)
    # 16 frames, every 4th -> 4 samples per video
    assert out.num_rows == 3 * 4
    assert sorted(set(out["frame_idx"].to_pylist())) == [0, 4, 8, 12]


def test_media_queries_on_ray(ray_session, sf_smoke_dir):
    from khl_pdf_ocr_ray.pipelines.queries import QUERIES

    img = QUERIES["media_image_features"](sf_smoke_dir).to_pandas()
    assert len(img) == 200 and img["ok"].all()
    aud = QUERIES["media_audio_features"](sf_smoke_dir).to_pandas()
    assert len(aud) == 200
    vid = QUERIES["media_frame_sample"](sf_smoke_dir).to_pandas()
    assert len(vid) == 800
    # run twice -> identical (actor-pool plumbing preserves determinism)
    img2 = QUERIES["media_image_features"](sf_smoke_dir).to_pandas()
    a = img.sort_values("media_id").reset_index(drop=True)
    b = img2.sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)


def test_truncated_and_zero_dim_payloads_become_error_rows():
    import pyarrow as pa

    from khl_pdf_ocr_ray.stages.multimodal import (
        AudioFeatureStage,
        ImageFeatureStage,
        VideoFrameSampleStage,
    )

    def _batch(kind, payload):
        return pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "media_type": [kind],
                "payload": pa.array([payload], pa.binary()),
            }
        )

    import struct

    from khl_pdf_ocr_ray.stages.multimodal import IMG_MAGIC

    for stage, kind, payload in [
        (ImageFeatureStage(), "image", b"FIMG1\x00"),           # truncated header
        (ImageFeatureStage(), "image", IMG_MAGIC + struct.pack(">HHB", 0, 24, 3)),
        (AudioFeatureStage(), "audio", b"FAUD1\x00\x00"),
    ]:
        out = stage(_batch(kind, payload)).to_pandas()
        assert len(out) == 1 and not bool(out["ok"].iloc[0])
        assert out["error"].iloc[0] != ""
    # video marks undecodable rows with the in-band frame_idx -1 sentinel
    vout = VideoFrameSampleStage()(_batch("video", b"FVID1\x00")).to_pandas()
    assert vout["frame_idx"].tolist() == [-1]


def test_audio_samples_roundtrip_big_endian():
    from khl_pdf_ocr_ray.stages.multimodal import decode_audio, synth_audio

    rate, samples = decode_audio(synth_audio(1, n_samples=64))
    assert rate == 16000
    # a declared-BE container decoded as BE yields the bounded sine+noise,
    # not byte-swapped full-range garbage
    assert abs(int(samples.max())) <= 8500 and abs(int(samples.min())) <= 8500


def test_phash_family_separation_and_band_completeness():
    """The planted DCT-space families must separate: in-family pairs land at
    small Hamming, cross-family pairs far above the threshold, and the
    16+16+16+15 banding is pigeonhole-complete at PHASH_HAMMING_MAX."""
    import numpy as np

    from khl_pdf_ocr_ray.stages.multimodal import (
        PHASH_BANDS,
        PHASH_BITS,
        PHASH_HAMMING_MAX,
        PHASH_VARIANTS,
        decode_image,
        media_phash_table,
        phash63,
    )

    # pigeonhole: <=3 flipped bits spread over 4 disjoint bands leave at
    # least one band untouched, so banding misses nothing at the threshold
    assert PHASH_HAMMING_MAX < PHASH_BANDS

    t = media_phash_table(n_families=8, variants=PHASH_VARIANTS)
    hashes = [phash63(decode_image(p)) for p in t["payload"].to_pylist()]
    fams = [mid // PHASH_VARIANTS for mid in t["media_id"].to_pylist()]
    in_fam, cross = [], []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            (in_fam if fams[i] == fams[j] else cross).append(d)
    # at least some in-family pairs survive the threshold; no cross-family
    # pair does (zero false positives on the planted corpus)
    assert sum(d <= PHASH_HAMMING_MAX for d in in_fam) >= 4
    assert min(cross) > PHASH_HAMMING_MAX
    # hash is sign-free (63 bits) and brightness-invariant (DC excluded)
    assert max(hashes) < (1 << PHASH_BITS)
    img = decode_image(t["payload"][0].as_py()).astype(np.int64)
    shifted = np.clip(img + 25, 0, 255).astype(np.uint8)
    assert phash63(shifted) == hashes[0] or bin(
        phash63(shifted) ^ hashes[0]
    ).count("1") <= 2  # clipping at 0/255 may flip a coef near the median


def test_afp_family_separation_and_gain_invariance():
    """Planted audio families separate at the Hamming threshold; a pure
    gain change is invisible to the second-order-difference bits."""
    import numpy as np

    from khl_pdf_ocr_ray.stages.multimodal import (
        AFP_HAMMING_MAX,
        AFP_VARIANTS,
        PHASH_BITS,
        afp63,
        decode_audio,
        media_afp_table,
    )

    t = media_afp_table(n_families=8, variants=AFP_VARIANTS)
    hashes = [afp63(decode_audio(p)[1]) for p in t["payload"].to_pylist()]
    fams = [mid // AFP_VARIANTS for mid in t["media_id"].to_pylist()]
    in_fam, cross = [], []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            (in_fam if fams[i] == fams[j] else cross).append(d)
    assert sum(d <= AFP_HAMMING_MAX for d in in_fam) >= len(in_fam) // 2
    assert min(cross) > AFP_HAMMING_MAX
    assert max(hashes) < (1 << PHASH_BITS)  # 63-bit, banding-compatible

    # exact gain scaling (no noise, no clipping) leaves every bit intact:
    # energies scale by gain^2 uniformly, second-order diff signs survive
    _rate, s = decode_audio(t["payload"][0].as_py())
    assert afp63((s * 2).astype(np.int64)) == hashes[0]


def test_afp_band_stage_matches_kernel(ray_session):
    """The actor stage's band rows reconstruct the kernel's hash."""
    from khl_pdf_ocr_ray.stages.multimodal import (
        AfpBandStage,
        afp63,
        decode_audio,
        media_afp_table,
    )

    t = media_afp_table(n_families=2, variants=2)
    out = AfpBandStage()(t).to_pandas()
    want = {
        int(m): afp63(decode_audio(p)[1])
        for m, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist())
    }
    assert len(out) == 4 * len(want)  # 4 band rows per clip
    for mid, grp in out.groupby("media_id"):
        assert set(grp["phash"]) == {want[mid]}
        # band keys re-assemble into the hash: 16+16+16+15 layout
        key = {int(r.band_id): int(r.band_key) for r in grp.itertuples()}
        assert key[0] | key[1] << 16 | key[2] << 32 | key[3] << 48 == want[mid]


def test_vhash_family_separation_and_order_invariance():
    """Planted video families separate; the hash is invariant to frame
    reordering (mean-frame construction)."""
    import numpy as np

    from khl_pdf_ocr_ray.stages.multimodal import (
        PHASH_HAMMING_MAX,
        VHASH_VARIANTS,
        decode_video,
        media_vhash_table,
        vhash63,
    )

    t = media_vhash_table(n_families=8, variants=VHASH_VARIANTS)
    hashes = [vhash63(decode_video(p)) for p in t["payload"].to_pylist()]
    fams = [mid // VHASH_VARIANTS for mid in t["media_id"].to_pylist()]
    in_fam, cross = [], []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            (in_fam if fams[i] == fams[j] else cross).append(d)
    assert sum(d <= PHASH_HAMMING_MAX for d in in_fam) >= len(in_fam) // 2
    assert min(cross) > PHASH_HAMMING_MAX

    # any frame permutation leaves the hash bit-identical
    frames = decode_video(t["payload"][0].as_py())
    perm = frames[::-1].copy()
    assert vhash63(perm) == hashes[0]
    rs = np.random.RandomState(3)
    shuf = frames[rs.permutation(len(frames))]
    assert vhash63(shuf) == hashes[0]
