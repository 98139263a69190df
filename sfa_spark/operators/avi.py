"""Minimal RIFF/AVI container support for the MJPEG video path.

MJPEG-in-AVI is the one compressed-video format this engine decodes
REAL in-container: the container walk below is a plain RIFF chunk
parser (public spec: Microsoft AVI RIFF, msdn 'AVI RIFF File
Reference'), and each extracted frame is a standalone baseline JPEG
that operators/jpeg.py:decode_baseline already decodes with no codec
library. h264/vp9-class codecs stay behind the PyAV hatch
(multimodal._video_frames) — entropy-coded inter-frame codecs are out
of scope for a stdlib decoder.

Layout (all sizes little-endian u32, chunks padded to even):

  RIFF <size> 'AVI '
    LIST <size> 'hdrl'            # avih main header + one strl per stream
    LIST <size> 'movi'            # the frame data
      '##dc' <size> <jpeg bytes>  # ## = stream index, dc = compressed video
      (or nested LIST 'rec ' groups of the same)
    'idx1' <size> <entries>       # optional seek index

The writer emits exactly this shape (one 'vids'/'MJPG' stream, keyframe
index) so round-trip tests exercise the same structure a capture tool
writes; the demuxer tolerates anything chunk-shaped, skips what it
doesn't know, and recurses into 'rec ' groups.

At scale this runs row-local inside mapInPandas (multimodal.
frame_sample): payload bytes never leave the executor, and only every
k-th frame is pixel-decoded — the demux itself is an O(n_bytes) scan.
"""

from __future__ import annotations

import struct


def split_avi_mjpeg(payload: bytes) -> list[bytes]:
    """Extract the MJPEG frame blobs from an AVI container, in stream
    order. Frames are the data of '##dc'/'##db' chunks inside the
    'movi' list (recursing into 'rec ' groups) that start with the
    JPEG SOI marker. Raises ValueError when the payload is not a
    RIFF/AVI file; returns [] when it is one with no MJPEG frames."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(buf: bytes, lo: int, hi: int, in_movi: bool) -> None:
        i = lo
        while i + 8 <= hi:
            fourcc = buf[i : i + 4]
            (size,) = struct.unpack_from("<I", buf, i + 4)
            body_lo, body_hi = i + 8, min(i + 8 + size, hi)
            if fourcc == b"LIST" and body_hi - body_lo >= 4:
                ltype = buf[body_lo : body_lo + 4]
                walk(
                    buf,
                    body_lo + 4,
                    body_hi,
                    in_movi or ltype in (b"movi", b"rec "),
                )
            elif (
                in_movi
                and fourcc[2:4] in (b"dc", b"db")
                and buf[body_lo : body_lo + 2] == b"\xff\xd8"
            ):
                frames.append(buf[body_lo:body_hi])
            i = body_hi + (size & 1)  # chunks pad to even

    # the RIFF size field counts from byte 8 ('AVI ' inclusive)
    riff_end = min(8 + struct.unpack_from("<I", payload, 4)[0], len(payload))
    walk(payload, 12, riff_end, False)
    return frames


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Write an MJPEG AVI: one 'vids' stream, handler 'MJPG', each
    input blob one keyframe '00dc' chunk, with the idx1 index capture
    tools emit. The inverse of split_avi_mjpeg for round-trip tests
    and a container sink for JPEG frame streams."""
    n = len(jpeg_frames)
    bufsz = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        bufsz * fps,               # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags = AVIF_HASINDEX
        n, 0, 1, bufsz,            # frames, initial, streams, sugg buffer
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n, bufsz, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    for f in jpeg_frames:
        movi_chunks.append(_chunk(b"00dc", f))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(movi_chunks[-1])
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
