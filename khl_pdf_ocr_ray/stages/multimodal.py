"""Multimodal columns: image / audio / video as opaque binary + metadata.

The build brief: treat media as ``binary`` columns with typed metadata and
implement decode / feature-extract / resize / frame-sample as actor-pool
``map_batches`` stages; the real decode libraries (PIL/ffmpeg/librosa) are
absent from this container, so decoding real JPEG/WAV/MP4 raises a
clearly-marked NotImplementedError, while a deterministic toy container
format (FIMG/FAUD/FVID) exercises ALL of the Ray-side plumbing for real:
actor-held decoder state, Arrow binary columns in/out, fixed output
schemas, small batches for large payloads.

Toy container layouts (big-endian):
  FIMG1 | u16 width | u16 height | u8 channels | pixel bytes (w*h*c)
  FAUD1 | u32 sample_rate | i16 samples...
  FVID1 | u16 n_frames | u16 width | u16 height | frames (w*h bytes each)

Payloads are synthesized deterministically from an id (seeded RandomState),
so every feature value is reproducible and oracle-testable.
"""

from __future__ import annotations

import struct
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

IMG_MAGIC = b"FIMG1"
AUD_MAGIC = b"FAUD1"
VID_MAGIC = b"FVID1"

try:  # real decoders, when the wheels exist
    from PIL import Image  # type: ignore

    HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None  # type: ignore
    HAS_PIL = False


class MediaDecodeError(ValueError):
    pass


# --- deterministic synthesis -------------------------------------------------
def synth_image(media_id: int, width: int = 32, height: int = 24, channels: int = 3) -> bytes:
    rs = np.random.RandomState(media_id % (2**31))
    pixels = rs.randint(0, 256, size=width * height * channels, dtype=np.int64).astype(np.uint8)
    return IMG_MAGIC + struct.pack(">HHB", width, height, channels) + pixels.tobytes()


def synth_audio(media_id: int, n_samples: int = 4096, sample_rate: int = 16000) -> bytes:
    rs = np.random.RandomState((media_id * 31 + 7) % (2**31))
    t = np.arange(n_samples)
    freq = 100 + (media_id % 20) * 50
    wave = (
        8000 * np.sin(2 * np.pi * freq * t / sample_rate)
        + rs.randint(-500, 500, size=n_samples)
    ).astype(np.int16)
    # the FAUD1 container is declared big-endian throughout: samples must
    # be emitted as >i2 (astype(int16).tobytes() would be native-LE on
    # x86, silently byte-swapping every decoded sample)
    return AUD_MAGIC + struct.pack(">I", sample_rate) + wave.astype(">i2").tobytes()


def synth_video(media_id: int, n_frames: int = 16, width: int = 16, height: int = 12) -> bytes:
    rs = np.random.RandomState((media_id * 17 + 3) % (2**31))
    frames = rs.randint(0, 256, size=n_frames * width * height, dtype=np.int64).astype(np.uint8)
    return VID_MAGIC + struct.pack(">HHH", n_frames, width, height) + frames.tobytes()


def media_table(n: int, seed_base: int = 0) -> pa.Table:
    """Deterministic media corpus: one image+audio+video row triplet per id."""
    ids, kinds, payloads = [], [], []
    for i in range(n):
        mid = seed_base + i
        ids += [mid] * 3
        kinds += ["image", "audio", "video"]
        payloads += [synth_image(mid), synth_audio(mid), synth_video(mid)]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


# --- decoders ---------------------------------------------------------------
def decode_image(payload: bytes) -> np.ndarray:
    """payload -> HxWxC uint8 array. Toy container decoded natively; real
    formats require PIL (STUB: raises when the wheel is absent)."""
    if payload.startswith(IMG_MAGIC):
        try:
            w, h, c = struct.unpack(">HHB", payload[5:10])
        except struct.error as e:  # truncated header -> in-band error row
            raise MediaDecodeError(f"image: truncated header ({e})") from e
        if w == 0 or h == 0 or c == 0:
            raise MediaDecodeError("image: zero-dimension header")
        pix = np.frombuffer(payload[10 : 10 + w * h * c], dtype=np.uint8)
        if pix.size != w * h * c:
            raise MediaDecodeError("image: truncated pixel section")
        return pix.reshape(h, w, c)
    if HAS_PIL:  # pragma: no cover - PIL absent in this container
        import io

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    raise NotImplementedError(
        "real image decoding requires PIL, which is not installed; "
        "only the FIMG1 toy container is supported here"
    )


def decode_audio(payload: bytes):
    if not payload.startswith(AUD_MAGIC):
        raise NotImplementedError(
            "real audio decoding requires an audio library (librosa/soundfile); "
            "only the FAUD1 toy container is supported here"
        )
    try:
        (rate,) = struct.unpack(">I", payload[5:9])
    except struct.error as e:
        raise MediaDecodeError(f"audio: truncated header ({e})") from e
    samples = np.frombuffer(payload[9:], dtype=">i2").astype(np.int64)
    return rate, samples


def decode_video(payload: bytes) -> np.ndarray:
    if not payload.startswith(VID_MAGIC):
        raise NotImplementedError(
            "real video decoding requires ffmpeg bindings; "
            "only the FVID1 toy container is supported here"
        )
    try:
        n, w, h = struct.unpack(">HHH", payload[5:11])
    except struct.error as e:
        raise MediaDecodeError(f"video: truncated header ({e})") from e
    if n == 0 or w == 0 or h == 0:
        raise MediaDecodeError("video: zero-dimension header")
    frames = np.frombuffer(payload[11 : 11 + n * w * h], dtype=np.uint8)
    if frames.size != n * w * h:
        raise MediaDecodeError("video: truncated frames")
    return frames.reshape(n, h, w)


# --- actor-pool stages ------------------------------------------------------
class ImageFeatureStage:
    """Actor stage: decode + feature-extract + resize-dims per image row.

    Use: ``ds.map_batches(ImageFeatureStage, fn_constructor_kwargs=
    {"target_w": 8, "target_h": 8}, batch_size=32, concurrency=(2, 8),
    batch_format="pyarrow")`` — decoder state built once per actor; batches
    kept small because payloads are large (the memory rule for binary
    columns)."""

    def __init__(self, target_w: int = 8, target_h: int = 8):
        self.target_w = target_w
        self.target_h = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: Dict[str, List] = {
            "media_id": [],
            "width": [],
            "height": [],
            "channels": [],
            "mean_x100": [],
            "thumb_w": [],
            "thumb_h": [],
            "ok": [],
            "error": [],
        }
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype != "image":
                continue
            out["media_id"].append(mid)
            try:
                img = decode_image(payload)
                h, w, c = img.shape
                # nearest-neighbor "resize": subsample grid (pure numpy)
                ys = np.linspace(0, h - 1, self.target_h).astype(int)
                xs = np.linspace(0, w - 1, self.target_w).astype(int)
                thumb = img[np.ix_(ys, xs)]
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_x100"].append(int(100 * img.mean()))
                out["thumb_w"].append(thumb.shape[1])
                out["thumb_h"].append(thumb.shape[0])
                out["ok"].append(True)
                out["error"].append("")
            except (MediaDecodeError, NotImplementedError) as e:
                out["width"].append(0)
                out["height"].append(0)
                out["channels"].append(0)
                out["mean_x100"].append(0)
                out["thumb_w"].append(0)
                out["thumb_h"].append(0)
                out["ok"].append(False)
                out["error"].append(str(e)[:120])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "width": pa.array(out["width"], pa.int64()),
                "height": pa.array(out["height"], pa.int64()),
                "channels": pa.array(out["channels"], pa.int64()),
                "mean_x100": pa.array(out["mean_x100"], pa.int64()),
                "thumb_w": pa.array(out["thumb_w"], pa.int64()),
                "thumb_h": pa.array(out["thumb_h"], pa.int64()),
                "ok": pa.array(out["ok"], pa.bool_()),
                "error": pa.array(out["error"], pa.string()),
            }
        )


class AudioFeatureStage:
    """Actor stage: windowed audio features (RMS, zero-crossings)."""

    def __init__(self, window: int = 1024):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: Dict[str, List] = {
            "media_id": [],
            "sample_rate": [],
            "n_samples": [],
            "rms_x100": [],
            "zero_crossings": [],
            "n_windows": [],
        }
        ok: List[bool] = []
        err: List[str] = []
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype != "audio":
                continue
            rows["media_id"].append(mid)
            try:
                rate, samples = decode_audio(payload)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
                rows["rms_x100"].append(
                    int(100 * np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                    if len(samples)
                    else 0
                )
                rows["zero_crossings"].append(int(np.sum(np.abs(np.diff(np.sign(samples))) > 0)))
                rows["n_windows"].append(len(samples) // self.window)
                ok.append(True)
                err.append("")
            except (MediaDecodeError, NotImplementedError, ValueError) as e:
                # in-band error rows (same contract as ImageFeatureStage)
                for k in ("sample_rate", "n_samples", "rms_x100", "zero_crossings", "n_windows"):
                    rows[k].append(0)
                ok.append(False)
                err.append(str(e)[:120])
        t = pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
        return t.append_column("ok", pa.array(ok, pa.bool_())).append_column(
            "error", pa.array(err, pa.string())
        )


class VideoFrameSampleStage:
    """Actor stage: sample every k-th frame, emit per-frame means."""

    def __init__(self, every_k: int = 4):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: Dict[str, List] = {"media_id": [], "frame_idx": [], "frame_mean_x100": []}
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype != "video":
                continue
            try:
                frames = decode_video(payload)
            except (MediaDecodeError, NotImplementedError, ValueError):
                # undecodable video -> frame_idx -1 marker row (in-band)
                rows["media_id"].append(mid)
                rows["frame_idx"].append(-1)
                rows["frame_mean_x100"].append(0)
                continue
            for idx in range(0, frames.shape[0], self.every_k):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(idx)
                rows["frame_mean_x100"].append(int(100 * frames[idx].mean()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


# --- perceptual-hash image near-dup (planted families) -----------------------
# pHash over the toy container: grayscale -> 2D DCT-II -> 8x8 low-frequency
# block minus the DC coefficient -> sign vs the EXACT median (63 values, odd,
# so the median is a single element — no float averaging) -> 63-bit hash.
# Near-dups are pairs with Hamming distance <= PHASH_HAMMING_MAX; banding
# (16+16+16+15 bits) is pigeonhole-complete for that threshold, so the
# banded distributed plan finds EXACTLY the brute-force pair set.
#
# The family corpus is synthesized directly in DCT space (large low-frequency
# amplitudes, per-variant pixel noise and a brightness shift): random-pixel
# images have near-zero low-frequency energy, which makes sign bits pure
# noise — measured before this design: in-family Hamming 8-38. With
# DCT-space families: in-family 0-10 (~53% of in-family pairs within the
# threshold at the default knobs), cross-family >= 18, zero false positives.
# The brightness shift is invisible to the hash (DC excluded) — the
# photo-like invariance pHash exists for.

PHASH_SIZE = 32
PHASH_LOW = 8
PHASH_BITS = 63
PHASH_BANDS = 4           # 16+16+16+15 bits
PHASH_HAMMING_MAX = 3     # <= 3 bit flips -> one band must match (pigeonhole)
N_PHASH_FAMILIES = 40
PHASH_VARIANTS = 5
_PHASH_SHARDS = 64        # coarse shuffle key (many buckets per group)


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (row k = frequency k)."""
    k = np.arange(n).reshape(-1, 1)
    x = np.arange(n).reshape(1, -1)
    b = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    b[0] *= np.sqrt(1.0 / n)
    b[1:] *= np.sqrt(2.0 / n)
    return b


_PHASH_BASIS = _dct_basis(PHASH_SIZE)


def synth_image_phash(family_id: int, variant_id: int) -> bytes:
    """One planted family member as an FIMG1 payload (single channel)."""
    rs = np.random.RandomState((family_id * 101 + 17) % (2**31))
    c = np.zeros((PHASH_SIZE, PHASH_SIZE))
    c[:PHASH_LOW, :PHASH_LOW] = rs.uniform(-60, 60, size=(PHASH_LOW, PHASH_LOW))
    c[0, 0] = 900.0  # bright DC keeps pixels mid-range after clipping
    img = _PHASH_BASIS.T @ c @ _PHASH_BASIS
    vs = np.random.RandomState(
        (family_id * 1009 + variant_id * 31 + 5) % (2**31)
    )
    noise = vs.randint(-6, 7, size=(PHASH_SIZE, PHASH_SIZE))
    shift = (variant_id - PHASH_VARIANTS // 2) * 10
    gray = np.clip(img + noise + shift, 0, 255).astype(np.uint8)
    return (
        IMG_MAGIC
        + struct.pack(">HHB", PHASH_SIZE, PHASH_SIZE, 1)
        + gray.tobytes()
    )


def media_phash_table(
    n_families: int = N_PHASH_FAMILIES, variants: int = PHASH_VARIANTS
) -> pa.Table:
    """The planted near-dup image corpus: media_id = family * variants + v."""
    ids, payloads = [], []
    for f in range(n_families):
        for v in range(variants):
            ids.append(f * variants + v)
            payloads.append(synth_image_phash(f, v))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def phash63(img: np.ndarray, basis: np.ndarray = None) -> int:
    """HxW[xC] uint8 -> 63-bit perceptual hash (see section comment)."""
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    assert g.shape == (PHASH_SIZE, PHASH_SIZE), (
        f"phash63 expects {PHASH_SIZE}x{PHASH_SIZE} input, got {g.shape} — "
        "resize (ImageFeatureStage thumbnailing) before hashing"
    )
    b = _PHASH_BASIS if basis is None else basis
    d = b @ g @ b.T
    co = d[:PHASH_LOW, :PHASH_LOW].flatten()[1:]  # 63 coefs, DC excluded
    med = np.partition(co, PHASH_BITS // 2)[PHASH_BITS // 2]
    v = 0
    for i, b in enumerate(co > med):
        if b:
            v |= 1 << i
    return v


def fp_band_rows(ids: list, hashes: list) -> pa.Table:
    """63-bit fingerprints -> LSH band rows (the simhash layout: one row
    per (media_id, band); shard is the coarse shuffle key). Shared by the
    image-phash and audio-fingerprint stages — the 16+16+16+15 banding is
    pigeonhole-complete at Hamming <= 3 for any 63-bit hash."""
    out_ids, out_h, band_ids, band_keys = [], [], [], []
    widths = [16, 16, 16, PHASH_BITS - 48]
    offsets = [0, 16, 32, 48]
    for mid, h in zip(ids, hashes):
        for b in range(PHASH_BANDS):
            out_ids.append(mid)
            out_h.append(h)
            band_ids.append(b)
            band_keys.append((h >> offsets[b]) & ((1 << widths[b]) - 1))
    band_ids_np = np.array(band_ids, dtype=np.int64)
    band_keys_np = np.array(band_keys, dtype=np.int64)
    return pa.table(
        {
            "media_id": pa.array(out_ids, pa.int64()),
            "phash": pa.array(out_h, pa.int64()),
            "band_id": pa.array(band_ids_np, pa.int64()),
            "band_key": pa.array(band_keys_np, pa.int64()),
            "shard": pa.array(
                (band_ids_np * 65536 + band_keys_np) % _PHASH_SHARDS,
                pa.int64(),
            ),
        }
    )


class PhashBandStage:
    """Actor stage: decode -> phash -> LSH band rows."""

    def __init__(self):
        # per-actor state: the DCT basis (cheap here; stands in for the
        # model-sized state a real embedder would hold)
        self.basis = _dct_basis(PHASH_SIZE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        hashes = [
            phash63(decode_image(p), self.basis)
            for p in batch["payload"].to_pylist()
        ]
        return fp_band_rows(ids, hashes)


def phash_bucket_pairs(shard: pa.Table) -> pa.Table:
    """In-bucket pair generation + popcount verify (simhash machinery:
    lexsort, run bounds, vectorized SWAR popcount, loud BUCKET_CAP assert)."""
    from .dedup import BUCKET_CAP, _group_bounds, _i64, popcount64

    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    if shard.num_rows < 2:
        return empty
    bid = _i64(shard["band_id"])
    bkey = _i64(shard["band_key"])
    mid = _i64(shard["media_id"])
    ph = _i64(shard["phash"]).view(np.uint64)  # 63-bit, sign never set
    order = np.lexsort((mid, bkey, bid))
    bid, bkey, mid, ph = bid[order], bkey[order], mid[order], ph[order]
    starts, ends = _group_bounds(bid, bkey)
    out_a, out_b, out_h = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        # LOUD on overflow rather than silently truncating: the exact-
        # equality contract with the uncapped brute-force dump twin only
        # holds while every band bucket fits; a real hot bucket needs the
        # simhash skew treatment (split the bucket on extra hash bits)
        assert e - s <= BUCKET_CAP, (
            f"fingerprint band bucket has {e - s} rows > BUCKET_CAP "
            f"({BUCKET_CAP}) — split hot buckets on extra hash bits "
            "(stages/dedup.py simhash skew convention) before pairing"
        )
        g_ids = mid[s:e]
        g_ph = ph[s:e]
        ia, ib = np.triu_indices(len(g_ids), k=1)
        ham = popcount64(g_ph[ia] ^ g_ph[ib])
        keep = (ham <= PHASH_HAMMING_MAX) & (g_ids[ia] != g_ids[ib])
        a, b = g_ids[ia[keep]], g_ids[ib[keep]]
        out_a.append(np.minimum(a, b))
        out_b.append(np.maximum(a, b))
        out_h.append(ham[keep])
    if not out_a:
        return empty
    return pa.table(
        {
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "hamming": np.concatenate(out_h),
        }
    )


# --- audio-fingerprint near-dup (planted families) ----------------------------
# Haitsma-Kalker-style robust audio hash over the toy container: 9
# non-overlapping 512-sample frames -> 9 spectral band energies per frame
# (rfft bins [5 + 25b, 5 + 25(b+1))) -> sign of the SECOND-order
# difference (band-adjacent delta, then frame-adjacent delta) -> 63 bits
# (the 64th dd bit is dropped so the hash shares the image-phash 63-bit
# banding). The double difference cancels both the overall gain (energy
# scales by gain^2 uniformly: signs unchanged) and any per-frame additive
# energy floor — the volume invariance the H-K fingerprint exists for
# (Haitsma & Kalker 2002, "A Highly Robust Audio Fingerprint System").
#
# Families plant structure in a per-(frame, band) integer amplitude
# envelope; variants change gain (0.5 + 0.25v) and add sample noise.
# Measured separation at the default knobs: in-family Hamming <= 5 with
# ~98% of pairs within the <= 3 threshold, cross-family >= 13, zero
# false positives.

AFP_WIN = 512         # samples per frame
AFP_FRAMES = 9
AFP_NBANDS = 9
AFP_BIN0 = 5          # first rfft bin of band 0
AFP_BW = 25           # rfft bins per band
AFP_HAMMING_MAX = PHASH_HAMMING_MAX  # shares the pigeonhole-complete banding
N_AFP_FAMILIES = 40
AFP_VARIANTS = 5


def afp63(samples: np.ndarray) -> int:
    """int16 sample vector -> 63-bit Haitsma-Kalker-style fingerprint."""
    need = AFP_FRAMES * AFP_WIN
    assert len(samples) >= need, (
        f"afp63 needs >= {need} samples, got {len(samples)}"
    )
    x = samples[:need].astype(np.float64).reshape(AFP_FRAMES, AFP_WIN)
    spec = np.abs(np.fft.rfft(x, axis=1)) ** 2
    e = np.stack(
        [
            spec[:, AFP_BIN0 + b * AFP_BW : AFP_BIN0 + (b + 1) * AFP_BW].sum(
                axis=1
            )
            for b in range(AFP_NBANDS)
        ],
        axis=1,
    )  # (frames, bands)
    d = e[:, :-1] - e[:, 1:]  # band-adjacent deltas
    dd = d[1:] - d[:-1]  # frame-adjacent second difference: (8, 8)
    bits = (dd > 0).flatten()[: PHASH_BITS]  # 63 of the 64 dd signs
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


def synth_audio_afp(family_id: int, variant_id: int) -> bytes:
    """One planted audio-family member as an FAUD1 payload."""
    rs = np.random.RandomState((family_id * 211 + 9) % (2**31))
    amp = rs.randint(1, 9, size=(AFP_FRAMES, AFP_NBANDS)).astype(np.float64)
    vs = np.random.RandomState(
        (family_id * 2003 + variant_id * 37 + 1) % (2**31)
    )
    gain = 0.5 + 0.25 * variant_id
    t = np.arange(AFP_WIN)
    out = np.zeros(AFP_FRAMES * AFP_WIN)
    for n in range(AFP_FRAMES):
        fr = np.zeros(AFP_WIN)
        for b in range(AFP_NBANDS):
            fbin = AFP_BIN0 + b * AFP_BW + 12  # band-center frequency
            fr += amp[n, b] * 300 * np.sin(2 * np.pi * fbin * t / AFP_WIN + 0.7 * b)
        out[n * AFP_WIN : (n + 1) * AFP_WIN] = fr
    out = out * gain + vs.randint(-50, 51, size=AFP_FRAMES * AFP_WIN)
    wave = np.clip(out, -32768, 32767).astype(np.int16)
    return AUD_MAGIC + struct.pack(">I", 16000) + wave.astype(">i2").tobytes()


def media_afp_table(
    n_families: int = N_AFP_FAMILIES, variants: int = AFP_VARIANTS
) -> pa.Table:
    """The planted near-dup audio corpus: media_id = family * variants + v."""
    ids, payloads = [], []
    for f in range(n_families):
        for v in range(variants):
            ids.append(f * variants + v)
            payloads.append(synth_audio_afp(f, v))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["audio"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class AfpBandStage:
    """Actor stage: decode audio -> afp63 -> LSH band rows (the shared
    fp_band_rows layout; verified downstream by phash_bucket_pairs)."""

    def __init__(self):
        # stateless by design: the rfft path has no precomputable state in
        # numpy (a real system would hold filterbank weights / a codec
        # context here — that pattern is exercised by Phash/VhashBandStage)
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        hashes = []
        for payload in batch["payload"].to_pylist():
            _rate, samples = decode_audio(payload)
            hashes.append(afp63(samples))
        return fp_band_rows(ids, hashes)


# --- video-hash near-dup (planted families) -----------------------------------
# Video twin of the fingerprint family: sample/average frames -> ONE
# 32x32 mean frame -> the image phash63 kernel. Averaging makes the hash
# invariant to FRAME REORDERING and to per-frame noise (which cancels by
# 1/sqrt(n_frames)) while the brightness shift stays invisible (DC
# excluded) — the coarse "same clip, re-encoded/trimmed-order" signal a
# crawl dedup wants before expensive per-frame alignment. Families plant
# low-frequency DCT structure in the base frame; variants add per-frame
# noise, a brightness shift, and a frame-order shuffle. Measured at the
# default knobs: in-family Hamming <= 4 (~85% within the <= 3
# threshold), cross-family >= 20, zero false positives.

VHASH_FRAMES = 12
N_VHASH_FAMILIES = 40
VHASH_VARIANTS = 5


def vhash63(frames: np.ndarray, basis: np.ndarray = None) -> int:
    """(n, H, W) uint8 frames -> 63-bit mean-frame perceptual hash."""
    assert frames.ndim == 3, "vhash63 expects (n_frames, H, W)"
    return phash63(frames.astype(np.float64).mean(axis=0), basis)


def synth_video_vhash(family_id: int, variant_id: int) -> bytes:
    """One planted video-family member as an FVID1 payload (32x32)."""
    rs = np.random.RandomState((family_id * 401 + 23) % (2**31))
    c = np.zeros((PHASH_SIZE, PHASH_SIZE))
    c[:PHASH_LOW, :PHASH_LOW] = rs.uniform(-60, 60, (PHASH_LOW, PHASH_LOW))
    c[0, 0] = 900.0
    base = _PHASH_BASIS.T @ c @ _PHASH_BASIS
    vs = np.random.RandomState(
        (family_id * 3001 + variant_id * 41 + 11) % (2**31)
    )
    shift = (variant_id - VHASH_VARIANTS // 2) * 8
    frames = []
    for _ in range(VHASH_FRAMES):
        noise = vs.randint(-12, 13, size=(PHASH_SIZE, PHASH_SIZE))
        frames.append(np.clip(base + noise + shift, 0, 255).astype(np.uint8))
    vs.shuffle(frames)  # the hash must not care about frame order
    stack = np.stack(frames)
    return (
        VID_MAGIC
        + struct.pack(">HHH", VHASH_FRAMES, PHASH_SIZE, PHASH_SIZE)
        + stack.tobytes()
    )


def media_vhash_table(
    n_families: int = N_VHASH_FAMILIES, variants: int = VHASH_VARIANTS
) -> pa.Table:
    """The planted near-dup video corpus: media_id = family * variants + v."""
    ids, payloads = [], []
    for f in range(n_families):
        for v in range(variants):
            ids.append(f * variants + v)
            payloads.append(synth_video_vhash(f, v))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["video"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class VhashBandStage:
    """Actor stage: decode video -> vhash63 -> LSH band rows."""

    def __init__(self):
        self.basis = _dct_basis(PHASH_SIZE)  # per-actor state stand-in

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        hashes = [
            vhash63(decode_video(p), self.basis)
            for p in batch["payload"].to_pylist()
        ]
        return fp_band_rows(ids, hashes)
