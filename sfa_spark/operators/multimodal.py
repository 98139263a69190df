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
except ImportError:  # pure-stdlib PNG decoder below keeps png REAL
    _PILImage = None


def _png_decode(data: bytes) -> np.ndarray:
    """Minimal pure-stdlib PNG decoder (public spec, RFC 2083 / W3C
    PNG): 8-bit depth, color types gray(0)/RGB(2)/gray+alpha(4)/
    RGBA(6), non-interlaced, all five scanline filters. zlib inflate +
    per-row unfilter — no third-party codec needed, so the REAL png
    decode branch executes even in containers without Pillow. Returns
    (H, W, C) uint8."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, idat = 8, b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"PNG depth={depth}/ctype={ctype}/interlace={interlace} "
            "unsupported by the stdlib decoder (8-bit non-interlaced "
            "gray/RGB/gray+alpha/RGBA only; palette PNGs need Pillow)"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * nch
    # Loud truncation/corruption guard: a well-signed PNG whose IDAT
    # inflates to the wrong length (truncated upload, bit rot) must not
    # surface as an opaque IndexError deep in the unfilter loop. Chunk
    # CRCs are NOT checked (skipped above) — this length check is the
    # integrity gate.
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"corrupt PNG: inflated IDAT is {len(raw)} bytes, expected "
            f"{h * (stride + 1)} for {w}x{h}x{nch} (truncated or "
            "damaged stream; note chunk CRCs are not verified)"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        cur = np.zeros(stride, dtype=np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the left neighbor: scan
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = int(prev[x])
                if ft == 1:
                    v = line[x] + a
                elif ft == 3:
                    v = line[x] + ((a + b) >> 1)
                elif ft == 4:
                    c = int(prev[x - nch]) if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                else:
                    raise ValueError(f"bad PNG filter {ft}")
                cur[x] = v & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, nch)


def _to_channels(arr: np.ndarray, channels: int) -> np.ndarray:
    """Channel-convert a decoded (H, W, C) image to the requested
    channel count, mirroring PIL's convert('RGB'/'L') semantics
    (ITU-R 601 luma for the gray path)."""
    c = arr.shape[2]
    if c == channels:
        return arr
    if channels == 3:
        if c == 4:
            return arr[:, :, :3]
        return np.repeat(arr[:, :, :1], 3, axis=2)
    if channels == 1:
        if c >= 3:
            # PIL's exact convert('L') fixed-point ITU-R 601 rounding —
            # (R*19595 + G*38470 + B*7471 + 0x8000) >> 16 — so the
            # stdlib path decodes bit-identically to the PIL path and
            # results don't depend on whether Pillow is installed
            luma = (
                arr[:, :, 0].astype(np.uint32) * 19595
                + arr[:, :, 1].astype(np.uint32) * 38470
                + arr[:, :, 2].astype(np.uint32) * 7471
                + 0x8000
            ) >> 16
            return luma.astype(np.uint8)[:, :, None]
        return arr[:, :, :1]
    raise NotImplementedError(f"conversion {c}→{channels} channels")


def _decode_one(payload: bytes, fmt: str, width: int, height: int, channels: int) -> np.ndarray:
    """Decode a media payload to (H, W, C) uint8.

    The deterministic 'fake' codec always ships; png AND baseline jpeg
    decode REAL in any environment (PIL when importable, else the
    pure-stdlib _png_decode / jpeg.decode_baseline — r7 closed the
    jpeg gap). Only progressive/12-bit jpeg, gif and video remain
    PIL/PyAV-gated. Note jpeg is lossy reconstruction: the stdlib
    float IDCT and libjpeg's integer IDCT may differ by ±1 LSB per
    sample — inherent conformant-decoder variance, unlike the
    bit-exact png path."""
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
    if fmt == "png":
        return _to_channels(_png_decode(payload), channels)
    if fmt in ("jpeg", "jpg"):
        from sfa_spark.operators.jpeg import decode_baseline

        return _to_channels(decode_baseline(payload), channels)
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
    """Decode GIF frames to full-canvas RGB arrays: PIL when
    importable, else the pure-stdlib LZW decoder (r7 — GIF is
    palette + LZW, losslessly decodable with no codec library; see
    operators/gif.py for the supported feature set)."""
    if _PILImage is not None:
        import io

        from PIL import ImageSequence

        img = _PILImage.open(io.BytesIO(payload))
        return [
            np.asarray(f.convert("RGB"), dtype=np.uint8)
            for f in ImageSequence.Iterator(img)
        ]
    from sfa_spark.operators.gif import decode_frames

    return decode_frames(payload)


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
      * 'avi' — MJPEG-in-AVI, the REAL in-container compressed-video
        branch (r8): RIFF chunk demux (operators/avi.py, public AVI
        spec) yields per-frame JPEG blobs, and each SAMPLED frame is
        pixel-decoded to raw RGB by the stdlib baseline-JPEG decoder —
        container + codec both real with no library. Only the kept
        (every k-th) frames are decoded; skipped frames cost only the
        O(bytes) chunk walk.
      * 'gif' — decoded through the PIL hatch when Pillow is present
        (frames re-emitted as raw RGB bytes) or the stdlib LZW decoder.
      * 'mp4' / 'h264' / 'mkv' / 'webm' — decoded through the PyAV
        hatch (_video_frames) when installed; frames re-emitted as raw
        RGB bytes, NotImplementedError otherwise (inter-frame entropy
        codecs stay out of stdlib scope).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                fmt = r["format"]
                decode_kept = None
                if fmt == "mjpeg":
                    frames = split_mjpeg(payload)
                elif fmt == "avi":
                    from sfa_spark.operators.avi import split_avi_mjpeg

                    frames = split_avi_mjpeg(payload)
                    decode_kept = lambda blob: _decode_one(  # noqa: E731
                        blob, "jpeg", r["width"], r["height"], 3
                    ).tobytes()
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
                    blob = frames[fi]
                    if decode_kept is not None:
                        blob = decode_kept(blob)
                    rows.append((r["media_id"], fi, blob))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return video.mapInPandas(fn, schema="media_id long, frame_idx int, frame binary")


# ---------------------------------------------------------------- audio

AUDIO_SCHEMA = "media_id bigint, payload binary, format string"

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_s double, "
    "rms double, zero_cross_rate double, peak double"
)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM payload to (sample_rate, mono float64 in
    [−1, 1]) with the stdlib only — REAL audio decode, codec-free (PCM
    is uncompressed; the `wave` module just parses the RIFF header).
    Multi-channel audio is downmixed by channel mean. 8/16/32-bit PCM
    supported; compressed WAVs raise like any other missing codec."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"PCM sample width {width} not supported")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return sr, x


def _decode_audio(payload: bytes, fmt: str) -> tuple[int, np.ndarray]:
    """'wav' → real stdlib PCM decode; 'fake' → deterministic md5-seeded
    noise at 16 kHz (the image/video fake-codec contract); anything
    else is an env-gated NotImplementedError (swap in soundfile/ffmpeg
    to enable mp3/flac/ogg)."""
    if fmt == "wav":
        return decode_wav(payload)
    if fmt == "fake":
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return 16000, rng.uniform(-1.0, 1.0, max(len(payload), 1))
    raise NotImplementedError(
        f"audio codec for format={fmt!r} not available in this environment; "
        "install soundfile/ffmpeg to enable real decode"
    )


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip decode → (sample_rate, length, duration, RMS energy,
    zero-crossing rate, peak) — the audio curation feature set (silence
    / clipping / junk detection before training). Same mapInPandas
    shape as extract_features: binary batches in, small feature rows
    out, payloads never leave executors."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                sr, x = _decode_audio(bytes(r["payload"]), r["format"])
                n = int(x.size)
                rms = float(np.sqrt((x * x).mean())) if n else 0.0
                zcr = (
                    float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
                    if n > 1
                    else 0.0
                )
                peak = float(np.abs(x).max()) if n else 0.0
                rows.append(
                    (r["media_id"], sr, n, n / sr if sr else 0.0, rms, zcr, peak)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_s",
                    "rms", "zero_cross_rate", "peak",
                ],
            )

    return audio.mapInPandas(fn, schema=AUDIO_FEATURE_SCHEMA)


def clip_sample(audio: DataFrame, clip_s: float, stride_s: float | None = None) -> DataFrame:
    """Split each payload into fixed-duration training clips (the audio
    analog of frame_sample): one row per clip with its offset and RMS —
    the pre-filter a speech pipeline runs before feature extraction.
    Short tails (< clip_s) are dropped, matching fixed-window training
    consumption."""
    stride_s = stride_s if stride_s is not None else clip_s

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                sr, x = _decode_audio(bytes(r["payload"]), r["format"])
                clip_n = int(round(clip_s * sr))
                stride_n = max(int(round(stride_s * sr)), 1)
                if clip_n <= 0:
                    continue
                ci = 0
                for start in range(0, x.size - clip_n + 1, stride_n):
                    seg = x[start : start + clip_n]
                    rows.append(
                        (
                            r["media_id"], ci, start / sr,
                            float(np.sqrt((seg * seg).mean())),
                        )
                    )
                    ci += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "clip_idx", "start_s", "rms"]
            )

    return audio.mapInPandas(
        fn, schema="media_id long, clip_idx int, start_s double, rms double"
    )


def phash_neardup_pairs(
    feats: DataFrame,
    hash_col: str = "phash",
    id_col: str = "media_id",
    max_hamming: int = 3,
    n_bands: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Near-duplicate detection on fixed-width bit-string signatures
    (the pHash column of extract_features, or any 64-bit fingerprint):
    band-equality blocking + exact Hamming verify.

    Completeness by pigeonhole: a pair within Hamming distance d
    differs in at most d bands, so with d < n_bands the pair agrees on
    at least one full band and MUST surface as a candidate — the
    banding loses nothing (requires max_hamming < n_bands, asserted).

    Scale shape: the same signature→band→equality-join→verify layout as
    MinHash-LSH and SimHash blocking — one hash join per corpus on
    (band, key), exact verify row-local on candidates; never all-pairs.
    Hot band buckets are quadratic in bucket size (clustered corpora —
    a near-dup-heavy crawl — produce them), so the verify must be as
    cheap as the join: the bit-string packs ONCE per doc into 32-bit
    words and Hamming is bit_count(xor) per word — one popcount
    instruction instead of a `bits`-step substring fold (r6: this took
    the sf0.1 clustered-simhash bench point from ~30 s to join-bound),
    the ≤ max_hamming filter runs BEFORE the distinct so the dedup
    shuffle carries only true near-dups, and AQE handles residual
    bucket skew.

    Output: (id_a, id_b, hamming) with id_a < id_b, hamming ≤
    max_hamming.
    """
    assert max_hamming < n_bands, "pigeonhole completeness needs d < n_bands"
    assert bits % n_bands == 0
    band_w = bits // n_bands
    n_words = (bits + 31) // 32
    h = F.col(hash_col)
    words = F.array(
        *[
            F.conv(
                F.substring(h, w * 32 + 1, min(32, bits - w * 32)), 2, 10
            ).cast("long")
            for w in range(n_words)
        ]
    )
    banded = feats.select(
        F.col(id_col).alias("id"),
        words.alias("hw"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(h, b * band_w + 1, band_w).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "hw", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(
        F.col("id").alias("id_a"), F.col("hw").alias("hw_a"), "band", "key"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("hw").alias("hw_b"), "band", "key"
    )
    ham = sum(
        F.bit_count(
            F.element_at("hw_a", w + 1).bitwiseXOR(
                F.element_at("hw_b", w + 1)
            )
        )
        for w in range(n_words)
    ).cast("int")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
