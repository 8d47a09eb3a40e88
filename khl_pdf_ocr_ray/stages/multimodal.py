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
