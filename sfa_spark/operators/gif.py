"""Pure-stdlib GIF decoder (public spec: GIF87a/89a, the W3C/
CompuServe specification). Like the PNG (r6) and baseline-JPEG (r7)
decoders, this makes the GIF frame-sampling path REAL in containers
without Pillow — GIF is palette + LZW, both losslessly decodable with
no codec library.

Supported: global and local color tables, variable-width LZW with
clear/EOI codes and 12-bit cap, interlaced images (4-pass
deinterlace), multiple frames with graphic-control transparency and
disposal methods 0/1 (leave) and 2 (restore to background) — frames
are composited onto the logical-screen canvas and emitted as full RGB
arrays, matching what PIL's ImageSequence + convert('RGB') yields for
the common browser-compatible cases. Disposal 3 (restore previous)
raises NotImplementedError (rare; Pillow handles it when installed).

GIF is lossless, so unlike the JPEG bound the round-trip contract is
EXACT equality (tests pair this with a spec-side encoder).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW: variable code width from min_code_size+1 up to
    12 bits, CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first per the GIF spec
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError(
            f"corrupt GIF: LZW stream yielded {len(out)} of "
            f"{n_expected} pixels"
        )
    return bytes(out[:n_expected])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Invert the GIF 4-pass interlace row ordering."""
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF byte stream to (H, W, 3) uint8 RGB
    arrays composited on the logical-screen canvas."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w, h, flags, bg_idx, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def skip_subblocks(p: int) -> int:
        while p < len(payload) and payload[p]:
            p += 1 + payload[p]
        return p + 1

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            if label == 0xF9:  # graphic control: flags + transparency
                gflags = payload[pos + 3]
                disposal = (gflags >> 2) & 0x7
                transparent = (
                    payload[pos + 6] if gflags & 0x1 else None
                )
            # every extension body is a sub-block chain — skip it
            # uniformly (the GCE's fields were read in place above)
            pos = skip_subblocks(pos + 2)
            continue
        if b == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            ct = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("corrupt GIF: no color table in scope")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos]:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # block terminator
            idx = np.frombuffer(
                _lzw_decode(min_code, bytes(lzw), iw * ih), dtype=np.uint8
            ).reshape(ih, iw)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if idx.max() >= len(ct):
                raise ValueError("corrupt GIF: palette index out of range")
            region = canvas[iy : iy + ih, ix : ix + iw]
            rgb = ct[idx]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                rgb = np.where(mask, rgb, region)
            if disposal == 3:
                raise NotImplementedError(
                    "GIF disposal method 3 (restore previous) "
                    "unsupported by the stdlib decoder; install Pillow"
                )
            canvas[iy : iy + ih, ix : ix + iw] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore region to background after frame
                canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
            transparent = None
            disposal = 0
            continue
        raise ValueError(f"corrupt GIF: unknown block 0x{b:02x} at {pos}")
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames
