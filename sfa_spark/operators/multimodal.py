"""Multimodal columns (BASELINE.json north star): image/audio/video as
opaque binary columns with typed metadata; decode / feature-extract /
resize / frame-sample as Arrow-batched mapInPandas.

The container has no image/audio codecs, so REAL decoding is stubbed
behind NotImplementedError; the 'fake' format is a deterministic
md5-seeded decoder so the Spark-side plumbing (schema, batch shape,
partitioning) is fully real and tested. Swapping in PIL/ffmpeg later
only replaces `_decode_one`.

Scale: mapInPandas streams Arrow batches — one Python worker per task,
binary payloads never pass through the driver. For 100 TB media,
partition by content shard and size `maxRecordsPerBatch` so a batch of
decoded frames fits in worker memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, format string, width int, height int, "
    "channels int"
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, mean double, std double, phash string"
)


try:  # real-codec escape hatch: PIL decodes png/jpeg when installed
    from PIL import Image as _PILImage
except ImportError:  # deterministic fake codec remains the CI path
    _PILImage = None


def _decode_one(payload: bytes, fmt: str, width: int, height: int, channels: int) -> np.ndarray:
    """Decode a media payload to (H, W, C) uint8.

    The deterministic 'fake' codec always ships; png/jpeg route through
    PIL when it is importable (env-gated — absent in this container)."""
    if fmt == "fake":
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (height, width, channels), dtype=np.uint8)
    if fmt in ("png", "jpeg", "jpg") and _PILImage is not None:
        import io

        img = _PILImage.open(io.BytesIO(payload))
        arr = np.asarray(img.convert("RGB" if channels == 3 else "L"), dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr
    raise NotImplementedError(
        f"codec for format={fmt!r} not available in this environment; "
        "install Pillow/ffmpeg to enable real decode"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item decode → (byte count, pixel mean/std, 64-bit pHash-like
    signature from the 8×8 downsample). mapInPandas: batches of binary
    rows in, small feature rows out — payloads never leave executors."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                img = _decode_one(
                    bytes(r["payload"]), r["format"], r["width"], r["height"], r["channels"]
                ).astype(np.float64)
                small = img.mean(axis=2)
                h, w = small.shape
                ds = small[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
                bits = (ds > np.median(ds)).flatten()
                phash = "".join("1" if b else "0" for b in bits)
                out.append(
                    (
                        r["media_id"],
                        len(bytes(r["payload"])),
                        float(img.mean()),
                        float(img.std()),
                        phash,
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "mean", "std", "phash"]
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded frames, re-encoded as raw
    bytes (format 'raw'): demonstrates a decode→transform→re-encode
    round trip through Arrow batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = _decode_one(
                    bytes(r["payload"]), r["format"], r["width"], r["height"], r["channels"]
                )
                yi = (np.arange(out_h) * r["height"] // out_h).astype(int)
                xi = (np.arange(out_w) * r["width"] // out_w).astype(int)
                small = img[yi][:, xi]
                rows.append(
                    (r["media_id"], small.tobytes(), "raw", out_w, out_h, r["channels"])
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "format", "width", "height", "channels"],
            )

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def split_mjpeg(payload: bytes) -> list[bytes]:
    """Split an MJPEG container (concatenated JPEG images) into per-
    frame byte blobs by scanning SOI (FFD8) / EOI (FFD9) markers.

    This is the REAL container-demux step of an MJPEG pipeline and
    needs no codec — only the pixel decode of each emitted frame is
    codec-gated (PIL hatch in _decode_one)."""
    frames = []
    i = 0
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF and payload[i + 1] == 0xD8:
            j = i + 2
            while j < n - 1 and not (payload[j] == 0xFF and payload[j + 1] == 0xD9):
                j += 1
            if j < n - 1:
                frames.append(payload[i : j + 2])
                i = j + 2
                continue
            break
        i += 1
    return frames


def _gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode GIF frames via the PIL escape hatch (env-gated: the
    container ships no codecs, so this raises NotImplementedError
    unless Pillow is installed — same contract as _decode_one)."""
    if _PILImage is None:
        raise NotImplementedError(
            "GIF decode needs Pillow; install it to enable the real path"
        )
    import io

    from PIL import ImageSequence

    img = _PILImage.open(io.BytesIO(payload))
    return [
        np.asarray(f.convert("RGB"), dtype=np.uint8)
        for f in ImageSequence.Iterator(img)
    ]


try:  # real-codec escape hatch: PyAV decodes mp4/h264/webm when installed
    import av as _pyav
except ImportError:  # absent in this container — NotImplementedError path
    _pyav = None


def _video_frames(payload: bytes, fmt: str) -> list[np.ndarray]:
    """Decode a compressed video container (mp4/h264/mkv/webm) to RGB
    frame arrays via the PyAV escape hatch — the same env-gated
    contract as _decode_one/_gif_frames: a deterministic
    NotImplementedError when the codec stack is absent, a real decode
    mirroring the PIL contract when it is. ffmpeg-the-binary is an
    equivalent swap (subprocess rawvideo pipe) — PyAV is preferred
    because frames stay in-process as numpy arrays."""
    if _pyav is None:
        raise NotImplementedError(
            f"video codec for format={fmt!r} needs PyAV (pip install av) "
            "or an ffmpeg pipeline; not available in this environment"
        )
    import io

    frames: list[np.ndarray] = []
    with _pyav.open(io.BytesIO(payload), format=fmt if fmt != "h264" else None) as c:
        for frame in c.decode(video=0):
            frames.append(frame.to_ndarray(format="rgb24"))
    return frames


def frame_sample(video: DataFrame, every_k: int) -> DataFrame:
    """Sample every k-th frame of a video payload. Emits one row per
    kept frame with frame_idx — the schema/explode shape of a real
    video pipeline. Containers:

      * 'rawcat' (and any unlisted format) — payload = concatenated raw
        frames of width×height×channels bytes; pure slicing.
      * 'mjpeg' — payload = concatenated JPEGs; frames split by SOI/EOI
        marker scan (real demux, codec-free); each emitted frame is a
        standalone JPEG blob for a downstream _decode_one.
      * 'gif' — decoded through the PIL hatch when Pillow is present
        (frames re-emitted as raw RGB bytes); NotImplementedError
        otherwise — the same env-gated contract as image decode.
      * 'mp4' / 'h264' / 'mkv' / 'webm' — decoded through the PyAV
        hatch (_video_frames) when installed; frames re-emitted as raw
        RGB bytes, NotImplementedError otherwise.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                fmt = r["format"]
                if fmt == "mjpeg":
                    frames = split_mjpeg(payload)
                elif fmt == "gif":
                    frames = [a.tobytes() for a in _gif_frames(payload)]
                elif fmt in ("mp4", "h264", "mkv", "webm"):
                    frames = [a.tobytes() for a in _video_frames(payload, fmt)]
                else:
                    frame_bytes = r["width"] * r["height"] * r["channels"]
                    n_frames = len(payload) // frame_bytes if frame_bytes else 0
                    frames = [
                        payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                        for fi in range(n_frames)
                    ]
                for fi in range(0, len(frames), every_k):
                    rows.append((r["media_id"], fi, frames[fi]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return video.mapInPandas(fn, schema="media_id long, frame_idx int, frame binary")
