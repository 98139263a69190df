"""Pure-stdlib baseline JPEG decoder (public spec: ITU-T T.81 /
ISO 10918-1, the same Annex F baseline process libjpeg implements).

Scope — the common corpus case, mirroring what _png_decode did for
PNG in r6: baseline sequential DCT (SOF0), 8-bit samples, Huffman
entropy coding, grayscale or YCbCr with any h/v sampling factors
(4:4:4, 4:2:0, 4:2:2 all fall out of the generic MCU walk), restart
markers, byte stuffing. Progressive (SOF2), arithmetic coding and
12-bit precision raise NotImplementedError with the Pillow hint —
the same env-gated contract as the other codecs.

Fidelity note: JPEG decoding is reconstruction, not bit-exact
inversion — different conformant decoders (libjpeg's islow integer
IDCT vs this float IDCT) legitimately differ by ±1 LSB per sample.
Tests therefore certify a round-trip bound against a spec-side
encoder (tests/test_multivariate_multimodal.py), not byte equality
with Pillow.

Reference parity: the reference engine treats media as opaque typed
blobs; this decoder exists so the multimodal feature-extract path
(operators/multimodal.py `_decode_one`) exercises a REAL branch for
the second-most-common image format even in codec-less containers.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# 8-point IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_IDCT = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
     * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)]
    for u in range(8)
])


class _Huff:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                k += 1
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("corrupt JPEG: entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1 EXTEND: map the `size`-bit magnitude to signed
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _destuff(data: bytes) -> tuple[list[bytes], int]:
    """Split the entropy stream at restart markers, dropping stuffed
    zero bytes (FF 00 -> FF). Returns (segments, bytes consumed up to
    the terminating marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            if i + 1 >= n:
                break
            m = data[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def decode_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF byte stream to (H, W, C) uint8 with C = 1
    (grayscale source) or 3 (RGB from YCbCr, BT.601 round-half-up)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, _Huff] = {}
    hac: dict[int, _Huff] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables (12-bit JPEG) "
                        "unsupported; install Pillow"
                    )
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    seg[o + 1 : o + 65], dtype=np.uint8
                ).astype(np.int32)
                qt[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = seg[o + 17 : o + 17 + nv]
                (hdc if tc == 0 else hac)[th] = _Huff(bits, vals)
                o += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG unsupported; install Pillow"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK?) unsupported"
                )
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/extended/"
                "arithmetic) unsupported by the stdlib decoder; "
                "install Pillow"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                comp["dc"], comp["ac"] = tt >> 4, tt & 0xF
                scan.append(comp)
            segs, used = _destuff(data[pos:])
            return _decode_scan(scan, qt, hdc, hac, w, h, restart, segs)
        # else: APPn/COM — skipped
    raise ValueError("corrupt JPEG: no SOS marker before EOI")


def _decode_scan(scan, qt, hdc, hac, w, h, restart, segs) -> np.ndarray:
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in scan
    ]
    n_mcu = mcux * mcuy
    per_seg = restart if restart else n_mcu
    mcu = 0
    for seg in segs:
        rd = _BitReader(seg)
        pred = [0] * len(scan)  # DC predictors reset at restarts
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(scan):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.float64)
                        s = rd.decode(hdc[c["dc"]])
                        diff = _extend(rd.read_bits(s), s)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.decode(hac[c["ac"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC index overrun"
                                )
                            blk[k] = _extend(rd.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = blk
                        coef = coef.reshape(8, 8) * q
                        spatial = _IDCT.T @ coef @ _IDCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu += 1
    if mcu != n_mcu:
        raise ValueError(
            f"corrupt JPEG: decoded {mcu} of {n_mcu} MCUs"
        )
    # upsample each component to full resolution and crop the padding
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    # BT.601 (T.871) inverse, the same matrix libjpeg/PIL use
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
