"""Multivariate sources + MUSE classifier + multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfa_spark.operators import multimodal
from sfa_spark.sources import multivariate as MV


def test_wide_to_long_and_derivatives(spark):
    rows = [(1, t, float(t), float(10 * t)) for t in range(5)]
    df = spark.createDataFrame(rows, "id long, ts long, d0 double, d1 double")
    long = MV.wide_to_long(df, "id", "ts", ["d0", "d1"])
    assert long.count() == 10
    got = {(r["dim"], r["pos"]): r["value"] for r in long.collect()}
    assert got[(0, 3)] == 3.0 and got[(1, 3)] == 30.0
    withd = MV.derivatives(long, n_dims=2)
    dv = {(r["dim"], r["pos"]): r["value"] for r in withd.where("dim >= 2").collect()}
    assert dv[(2, 0)] == 1.0 and dv[(3, 0)] == 10.0  # |x[i+1]-x[i]|
    assert withd.where("dim >= 2").groupBy("dim").count().collect()[0]["count"] == 4


@pytest.fixture(scope="module")
def mv_corpus(spark):
    # class encoded in dim 1 frequency; dim 0 is noise
    rng = np.random.default_rng(11)
    rows, labels = [], []
    for i in range(24):
        label = float(i % 2)
        t = np.linspace(0, 6 * np.pi, 64)
        d0 = rng.normal(0, 1, 64)
        d1 = np.sin(t * (4 if label else 1)) + rng.normal(0, 0.2, 64)
        rows += [(i, 0, d0.tolist()), (i, 1, d1.tolist())]
        labels.append((i, label))
    arrays = spark.createDataFrame(rows, "series_id long, dim int, values array<double>")
    lab = spark.createDataFrame(labels, "series_id long, label double")
    return arrays.cache(), lab.cache()


def test_muse_separates_classes(spark, mv_corpus):
    from sfa_spark.ml import classifiers as C

    arrays, labels = mv_corpus
    train_l = labels.where("series_id < 16")
    train_a = arrays.join(train_l.select("series_id"), "series_id")
    test_a = arrays.join(
        labels.where("series_id >= 16").select("series_id"), "series_id"
    )
    model = C.muse_fit(train_a, train_l, windows=[16], word_length=4, alphabet=4)
    pred = C.muse_predict(model, test_a)
    acc = (
        pred.join(labels, "series_id")
        .agg(F.avg((F.col("pred_label") == F.col("label")).cast("double")))
        .collect()[0][0]
    )
    assert acc >= 0.75, f"MUSE accuracy {acc}"


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, bytes([i] * 64), "fake", 16, 16, 3) for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, format string, width int, height int, channels int"
    ).cache()


def test_extract_features_deterministic(spark, media):
    a = {r["media_id"]: (r["mean"], r["phash"]) for r in multimodal.extract_features(media).collect()}
    b = {r["media_id"]: (r["mean"], r["phash"]) for r in multimodal.extract_features(media).collect()}
    assert a == b and len(a) == 6
    assert all(len(v[1]) == 64 for v in a.values())


def test_resize_roundtrip_shape(spark, media):
    small = multimodal.resize(media, 8, 8)
    rows = small.collect()
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    assert all(len(bytes(r["payload"])) == 8 * 8 * 3 for r in rows)


def test_frame_sample(spark):
    frame = bytes(range(48))  # 4x4x3
    video = spark.createDataFrame(
        [(1, frame * 10, "raw", 4, 4, 3)],
        "media_id long, payload binary, format string, width int, height int, channels int",
    )
    out = multimodal.frame_sample(video, every_k=3).collect()
    assert [r["frame_idx"] for r in out] == [0, 3, 6, 9]
    assert all(len(bytes(r["frame"])) == 48 for r in out)


def test_real_codec_raises(spark):
    # jpeg reaches the REAL stdlib decoder since r7 — a truncated
    # payload fails with its corruption error through the Spark task;
    # a format with no decoder at all still hits the codec gate
    jpg = spark.createDataFrame(
        [(1, b"\xff\xd8\xff", "jpeg", 4, 4, 3)],
        "media_id long, payload binary, format string, width int, height int, channels int",
    )
    with pytest.raises(Exception, match="corrupt JPEG|no SOS"):
        multimodal.extract_features(jpg).collect()
    tiff = spark.createDataFrame(
        [(1, b"II*\x00", "tiff", 4, 4, 3)],
        "media_id long, payload binary, format string, width int, height int, channels int",
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.extract_features(tiff).collect()


def _png_encode(arr, row_filters=None):
    """Test-side PNG writer (public spec): 8-bit, ctype from channel
    count, per-row filter bytes as requested (default 0/None) — the
    FILTER side of what the stdlib decoder must invert."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    row_filters = row_filters or [0] * h
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, ft in enumerate(row_filters):
        line = flat[y]
        if ft == 0:
            enc = line
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            enc = (line - left) & 0xFF
        elif ft == 2:  # Up
            enc = (line - prev) & 0xFF
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            enc = (line - ((left + prev) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (line - pred) & 0xFF
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(typ, payload):
        import zlib as z

        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", z.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_stdlib_decoder_roundtrip_all_filters():
    """The REAL png decode branch executes in this container: the
    pure-stdlib decoder inverts every scanline filter (None/Sub/Up/
    Average/Paeth) exactly, for RGB, RGBA and grayscale."""
    import numpy as np

    from sfa_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (10, 6, c), dtype=np.uint8)
        filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
        payload = _png_encode(img, filters)
        out = mm._png_decode(payload)
        assert out.shape == img.shape
        assert (out == img).all()
    # channel conversion mirrors PIL convert semantics EXACTLY —
    # convert('L') is the fixed-point ITU-R 601 rounding
    # (R*19595 + G*38470 + B*7471 + 0x8000) >> 16, so decode results
    # cannot depend on whether Pillow is installed
    rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    assert (mm._to_channels(rgba, 3) == rgba[:, :, :3]).all()
    rgb = rgba[:, :, :3]
    gray = mm._to_channels(rgb, 1)
    want = (
        rgb[:, :, 0].astype(np.uint32) * 19595
        + rgb[:, :, 1].astype(np.uint32) * 38470
        + rgb[:, :, 2].astype(np.uint32) * 7471
        + 0x8000
    ) >> 16
    assert gray.shape == (4, 4, 1)
    assert (gray[:, :, 0] == want.astype(np.uint8)).all()
    # pure green (0,255,0): PIL gives 150; float truncation would give 149
    green = np.zeros((1, 1, 3), dtype=np.uint8)
    green[0, 0, 1] = 255
    assert mm._to_channels(green, 1)[0, 0, 0] == 150
    # palette PNGs (ctype 3) fail with the documented error, not KeyError
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    pal_png = (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="palette"):
        mm._png_decode(pal_png)


def test_real_png_decode_through_spark(spark):
    """End-to-end REAL codec execution through the Spark plumbing:
    actual PNG payloads → extract_features (mean/std match numpy on
    the source pixels) and resize → raw roundtrip."""
    import numpy as np

    from sfa_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for i in range(3)}
    rows = [
        (i, bytearray(_png_encode(img)), "png", 16, 16, 3)
        for i, img in imgs.items()
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    for i, img in imgs.items():
        assert feats[i]["mean"] == pytest.approx(img.astype(float).mean(), abs=1e-9)
        assert feats[i]["std"] == pytest.approx(img.astype(float).std(), abs=1e-9)
    small = {
        r["media_id"]: r for r in mm.resize(media, 8, 8).collect()
    }
    for i, img in imgs.items():
        got = np.frombuffer(bytes(small[i]["payload"]), dtype=np.uint8).reshape(8, 8, 3)
        yi = (np.arange(8) * 16 // 8).astype(int)
        xi = (np.arange(8) * 16 // 8).astype(int)
        assert (got == img[yi][:, xi]).all()


def test_real_codec_gate():
    """png AND baseline jpeg are REAL in any environment via the stdlib
    decoders (r7 closed the jpeg gap); corrupt/truncated inputs fail
    loudly, not opaquely."""
    import pytest as _pytest

    from sfa_spark.operators import multimodal as mm

    if mm._PILImage is None:
        # a truncated jpeg now reaches the REAL decoder and fails with
        # its corruption error, not the codec-missing gate
        with _pytest.raises(ValueError, match="corrupt JPEG|no SOS"):
            mm._decode_one(b"\xff\xd8\xff\xd9", "jpeg", 4, 4, 3)
    with _pytest.raises(ValueError, match="signature"):
        mm._png_decode(b"\x89PNG fake----")


def test_mjpeg_demux_frame_sample(spark):
    """MJPEG container demux is codec-free: synthetic SOI/EOI-delimited
    blobs split into standalone per-frame JPEG byte blobs, every_k
    sampling applied — the real video-container plumbing."""
    from sfa_spark.operators import multimodal

    def jpeg_blob(body: bytes) -> bytes:
        return b"\xff\xd8" + body + b"\xff\xd9"

    frames = [jpeg_blob(bytes([i]) * (10 + i)) for i in range(7)]
    payload = b"".join(frames)
    video = spark.createDataFrame(
        [(1, payload, "mjpeg", 0, 0, 0)], multimodal.MEDIA_SCHEMA
    )
    out = sorted(
        multimodal.frame_sample(video, every_k=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in out] == [0, 2, 4, 6]
    for r in out:
        assert bytes(r["frame"]) == frames[r["frame_idx"]]
    # plain-python splitter agrees
    assert multimodal.split_mjpeg(payload) == frames


def test_gif_decode_gate(spark):
    """GIF frame decode is REAL in any environment since r7 (stdlib
    LZW decoder when Pillow is absent); corrupt streams fail loudly."""
    import io

    import pytest
    from sfa_spark.operators import multimodal

    if multimodal._PILImage is None:
        with pytest.raises(ValueError, match="corrupt GIF|LZW"):
            multimodal._gif_frames(
                b"GIF89a" + b"\x01\x00\x01\x00\x00\x00\x00" + b"\x2c"
                + b"\x00" * 9 + b"\x02\x01\x00\x00\x3b"
            )
    else:  # env-gated real path: a 1x1 GIF must decode to one frame
        img = multimodal._PILImage.new("RGB", (1, 1))
        buf = io.BytesIO()
        img.save(buf, format="GIF")
        frames = multimodal._gif_frames(buf.getvalue())
        assert len(frames) == 1 and frames[0].shape == (1, 1, 3)


def test_video_decode_gate(spark):
    """mp4/h264 frame decode routes through the PyAV hatch — the same
    env-gated contract as the PIL paths: NotImplementedError without
    the codec stack, real RGB frames with it; the frame_sample plumbing
    surfaces the gate (not a silent empty result)."""
    import pytest
    from sfa_spark.operators import multimodal

    if multimodal._pyav is None:
        with pytest.raises(NotImplementedError, match="PyAV"):
            multimodal._video_frames(b"\x00\x00\x00\x18ftypmp42-not-really", "mp4")
        media = spark.createDataFrame(
            [(1, bytearray(b"xx"), "mp4", 2, 2, 3)], multimodal.MEDIA_SCHEMA
        )
        with pytest.raises(Exception, match="NotImplementedError|PyAV"):
            multimodal.frame_sample(media, every_k=1).collect()
    else:  # env-gated real path: encode a 2-frame clip, decode it back
        import io

        import numpy as np

        buf = io.BytesIO()
        with multimodal._pyav.open(buf, "w", format="mp4") as c:
            st = c.add_stream("h264", rate=2)
            st.width, st.height, st.pix_fmt = 16, 16, "yuv420p"
            for _ in range(2):
                arr = np.zeros((16, 16, 3), dtype=np.uint8)
                for pkt in st.encode(
                    multimodal._pyav.VideoFrame.from_ndarray(arr, format="rgb24")
                ):
                    c.mux(pkt)
            for pkt in st.encode():
                c.mux(pkt)
        frames = multimodal._video_frames(buf.getvalue(), "mp4")
        assert len(frames) == 2 and frames[0].shape == (16, 16, 3)


def _wav_bytes(freq=440.0, sr=8000, dur=0.5, amp=0.5, n_ch=1):
    import io
    import wave

    import numpy as np

    t = np.arange(int(sr * dur)) / sr
    x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    if n_ch == 2:
        x = np.column_stack([x, x]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_audio_features_real_wav(spark):
    """REAL PCM decode end-to-end: a sine WAV's RMS must be amp/√2,
    its zero-crossing rate 2f/sr, and duration n/sr — no fake codec
    involved. Stereo downmix must agree with mono."""
    import numpy as np

    from sfa_spark.operators import multimodal as MM

    wav = _wav_bytes(freq=440.0, sr=8000, dur=0.5, amp=0.5)
    wav2 = _wav_bytes(freq=440.0, sr=8000, dur=0.5, amp=0.5, n_ch=2)
    df = spark.createDataFrame(
        [(1, bytearray(wav), "wav"), (2, bytearray(wav2), "wav")],
        MM.AUDIO_SCHEMA,
    )
    res = {r["media_id"]: r for r in MM.audio_features(df).collect()}
    for mid in (1, 2):
        r = res[mid]
        assert r["sample_rate"] == 8000 and r["n_samples"] == 4000
        assert abs(r["duration_s"] - 0.5) < 1e-9
        assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 0.01
        assert abs(r["zero_cross_rate"] - 2 * 440.0 / 8000) < 0.01
        assert 0.45 < r["peak"] <= 0.51


def test_audio_clip_sample_offsets_and_fake_codec(spark):
    from sfa_spark.operators import multimodal as MM

    wav = _wav_bytes(sr=8000, dur=1.0)
    df = spark.createDataFrame(
        [(1, bytearray(wav), "wav"), (2, bytearray(b"\x01\x02" * 8000), "fake")],
        MM.AUDIO_SCHEMA,
    )
    out = MM.clip_sample(df, clip_s=0.25).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append((r["clip_idx"], r["start_s"]))
    # 1.0 s / 0.25 s clips → 4 clips at 0, .25, .5, .75
    assert sorted(by_id[1]) == [(0, 0.0), (1, 0.25), (2, 0.5), (3, 0.75)]
    # fake codec: 16 kHz, 16000 samples → 4 clips, deterministic
    assert len(by_id[2]) == 4
    # unknown codec is env-gated
    import pytest as _pt

    bad = spark.createDataFrame([(3, bytearray(b"xx"), "mp3")], MM.AUDIO_SCHEMA)
    with _pt.raises(Exception, match="NotImplementedError|not available"):
        MM.audio_features(bad).collect()


def test_phash_neardup_pigeonhole_complete_and_image_path(spark):
    """Banded blocking finds EVERY pair within max_hamming (< n_bands,
    pigeonhole) and nothing above — brute-force cross-check; and the
    decoded-image path surfaces identical payloads at hamming 0."""
    from itertools import combinations

    from sfa_spark.operators.multimodal import (
        extract_features,
        phash_neardup_pairs,
    )

    sigs = {
        0: "0" * 16,
        1: "0" * 15 + "1",          # d(0,1)=1
        2: "0" * 12 + "1111",       # d(0,2)=4 — excluded at d<=3
        3: "1" + "0" * 14 + "1",    # d(1,3)=1, d(0,3)=2
        4: "1111" + "0" * 12,       # d(2,4)=8
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in sigs.items()], "media_id long, phash string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(
            df, max_hamming=3, n_bands=4, bits=16
        ).collect()
    }
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    want = {
        (i, j): ham(sigs[i], sigs[j])
        for i, j in combinations(sorted(sigs), 2)
        if ham(sigs[i], sigs[j]) <= 3
    }
    assert got == want
    # image path: two identical fake payloads + one different
    media = spark.createDataFrame(
        [
            (10, b"same-bytes", "fake", 16, 16, 3),
            (11, b"same-bytes", "fake", 16, 16, 3),
            (12, b"other-bytes", "fake", 16, 16, 3),
        ],
        "media_id long, payload binary, format string, width int, height int, channels int",
    )
    feats = extract_features(media)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(
            feats, max_hamming=0, n_bands=4, bits=64
        ).collect()
    }
    assert pairs == {(10, 11): 0}


def test_png_truncated_idat_fails_loudly():
    """r6 ADVICE: a well-signed PNG whose IDAT inflates short (or long)
    must raise the documented ValueError, not an opaque IndexError deep
    in the unfilter loop."""
    import struct
    import zlib

    import numpy as np

    from sfa_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good = _png_encode(img)

    # rebuild the file with the IDAT payload cut to half its scanlines
    def chunks(b):
        pos = 8
        while pos + 8 <= len(b):
            (ln,) = struct.unpack(">I", b[pos : pos + 4])
            typ = b[pos + 4 : pos + 8]
            yield typ, b[pos + 8 : pos + 8 + ln]
            pos += 12 + ln

    parts = dict(chunks(good))
    raw = zlib.decompress(parts[b"IDAT"])
    short = zlib.compress(raw[: len(raw) // 2])

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", parts[b"IHDR"])
        + chunk(b"IDAT", short)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt PNG"):
        mm._png_decode(bad)
    # the intact file still round-trips
    assert (mm._png_decode(good) == img).all()


def test_drift_psi_quantile_all_null_reference_aborts(spark):
    """r6 ADVICE: quantile-bucket PSI with an empty/all-NULL reference
    side must abort loudly (NULL decile edges would silently bucket
    every row as NULL), while the width mode on the same data and a
    healthy quantile run stay unaffected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sfa_spark.operators.audit import drift_psi

    old = spark.range(5).select(F.lit(None).cast("double").alias("x"))
    new = spark.range(100).select((F.col("id") * 1.0).alias("x"))
    with _pytest.raises(Exception, match="no non-null values"):
        drift_psi(old, new, "x", buckets="quantile").collect()
    # healthy reference: runs and returns occupied buckets
    ok_old = spark.range(100).select((F.col("id") * 1.0).alias("x"))
    rows = drift_psi(ok_old, new, "x", buckets="quantile").collect()
    assert len(rows) == 10


# ---------------------------------------------------------------------------
# test-side baseline JPEG encoder (public spec, ITU-T T.81): the FDCT +
# Huffman side of what the stdlib decoder must invert. Uses all-ones
# quantization (near-lossless: the only loss is coefficient rounding)
# and flat fixed-length Huffman tables (12 DC symbols at 4 bits, 162 AC
# symbols at 8 bits — canonical, prefix-free, spec-legal).


def _jpeg_encode(arr, subsample=None, restart=0):
    import struct

    import numpy as np

    from sfa_spark.operators.jpeg import _IDCT, _ZIGZAG

    h, w, nc = arr.shape
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = bytes(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_bits = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
    ac_vals = bytes(ac_syms)

    def canonical(bits, vals):
        enc, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                enc[vals[k]] = (code, ln)
                k += 1
                code += 1
            code <<= 1
        return enc

    dc_enc = canonical(dc_bits, dc_vals)
    ac_enc = canonical(ac_bits, ac_vals)

    if nc == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168735892 * rgb[:, :, 0] - 0.331264108 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418687589 * rgb[:, :, 1] - 0.081312411 * rgb[:, :, 2]
        if subsample == "420":  # 2x2 box average
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                q = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
                return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0
            planes = [(y, 2, 2), (down(cb), 1, 1), (down(cr), 1, 1)]
        elif subsample == "422":  # horizontal-only 1x2 average
            def downh(p):
                ww = (p.shape[1] + 1) // 2 * 2
                q = np.pad(p, ((0, 0), (0, ww - p.shape[1])), mode="edge")
                return (q[:, 0::2] + q[:, 1::2]) / 2.0
            planes = [(y, 2, 1), (downh(cb), 1, 1), (downh(cr), 1, 1)]
        else:
            planes = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]
    else:
        planes = [(arr[:, :, 0].astype(np.float64), 1, 1)]
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    padded = []
    for p, ch, cv in planes:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        padded.append(
            (np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"), ch, cv)
        )

    bits_out = []

    def emit(code, ln):
        for i in range(ln - 1, -1, -1):
            bits_out.append((code >> i) & 1)

    def emit_val(v, s):
        if s:
            emit(v if v >= 0 else v + (1 << s) - 1, s)

    def size_of(v):
        s = 0
        a = abs(v)
        while a:
            s += 1
            a >>= 1
        return s

    out_segments = []
    pred = [0] * len(planes)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart and mcu and mcu % restart == 0:
            out_segments.append(bits_out)
            bits_out = []
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, (p, ch, cv) in enumerate(padded):
            for by in range(cv):
                for bx in range(ch):
                    y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                    blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = _IDCT @ blk @ _IDCT.T  # orthonormal FDCT
                    # zigzag order: zz[k] = coef[_ZIGZAG[k]]
                    zz = np.rint(coef.flatten())[_ZIGZAG].astype(int)
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    s = size_of(diff)
                    emit(*dc_enc[s])
                    emit_val(diff, s)
                    k, run = 1, 0
                    while k < 64:
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                        else:
                            while run > 15:
                                emit(*ac_enc[0xF0])
                                run -= 16
                            s = size_of(v)
                            emit(*ac_enc[(run << 4) | s])
                            emit_val(v, s)
                            run = 0
                        k += 1
                    if run:
                        emit(*ac_enc[0x00])  # EOB
    out_segments.append(bits_out)

    def pack(bits):
        while len(bits) % 8:
            bits.append(1)  # pad with 1s per spec
        raw = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            raw.append(b)
        return bytes(raw).replace(b"\xff", b"\xff\x00")  # byte stuffing

    entropy = bytearray()
    for i, segbits in enumerate(out_segments):
        entropy += pack(segbits)
        if i < len(out_segments) - 1:
            entropy += bytes([0xFF, 0xD0 + (i % 8)])

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    ones_zz = bytes([1] * 64)  # quant table in zigzag order, all ones
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + ones_zz)
    comps_sof = bytearray([len(planes)])
    for ci, (_, ch, cv) in enumerate(padded):
        comps_sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes(comps_sof))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_stdlib_decoder_roundtrip_gray_and_444():
    """The REAL baseline-jpeg branch executes in this container: with
    all-ones quantization the only loss is coefficient rounding, so the
    decode must reproduce the input within a tight bound (orthonormal
    rounding error), for grayscale and 4:4:4 color, at non-multiple-
    of-8 sizes (pad/crop path)."""
    import numpy as np

    from sfa_spark.operators import jpeg as J

    rng = np.random.default_rng(3)
    gray = rng.integers(32, 224, (13, 11, 1), dtype=np.uint8)
    out = J.decode_baseline(_jpeg_encode(gray))
    assert out.shape == gray.shape
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 4

    rgb = rng.integers(32, 224, (10, 18, 3), dtype=np.uint8)
    out = J.decode_baseline(_jpeg_encode(rgb))
    assert out.shape == rgb.shape
    d = np.abs(out.astype(int) - rgb.astype(int))
    assert d.max() <= 12 and d.mean() < 2.0


def test_jpeg_stdlib_decoder_420_and_restart_markers():
    """4:2:0 chroma subsampling (the generic MCU walk) and restart
    intervals (predictor reset + byte alignment at RSTn). Constant
    chroma makes 2x2 subsampling exact, so the same rounding bound
    applies."""
    import numpy as np

    from sfa_spark.operators import jpeg as J

    rng = np.random.default_rng(5)
    luma = rng.integers(40, 210, (21, 19), dtype=np.uint8)
    # constant color cast: every pixel same (Cb, Cr), varying luma
    rgb = np.stack(
        [
            np.clip(luma.astype(int) + 20, 0, 255),
            luma.astype(int),
            np.clip(luma.astype(int) - 15, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    out = J.decode_baseline(_jpeg_encode(rgb, subsample="420"))
    assert out.shape == rgb.shape
    d = np.abs(out.astype(int) - rgb.astype(int))
    assert d.max() <= 14 and d.mean() < 2.5

    out2 = J.decode_baseline(_jpeg_encode(rgb, subsample="420", restart=2))
    assert (out2 == out).all()  # restart markers change framing only

    gray = rng.integers(32, 224, (17, 33, 1), dtype=np.uint8)
    out3 = J.decode_baseline(_jpeg_encode(gray, restart=1))
    assert np.abs(out3.astype(int) - gray.astype(int)).max() <= 4


def test_jpeg_unsupported_variants_fail_loudly():
    """Progressive (SOF2) and 12-bit precision raise the documented
    NotImplementedError — the env-gated contract, not a crash."""
    import struct

    import numpy as np
    import pytest as _pytest

    from sfa_spark.operators import jpeg as J

    gray = np.full((8, 8, 1), 100, dtype=np.uint8)
    good = _jpeg_encode(gray)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(NotImplementedError, match="SOF2"):
        J.decode_baseline(prog)
    # 12-bit: patch SOF0 precision byte (first payload byte after len)
    i = good.index(b"\xff\xc0")
    bad12 = good[: i + 4] + bytes([12]) + good[i + 5 :]
    with _pytest.raises(NotImplementedError, match="12-bit"):
        J.decode_baseline(bad12)


def test_real_jpeg_decode_through_spark(spark):
    """End-to-end: jpeg payloads flow through the mapInPandas feature
    extractor with the REAL stdlib decode branch — mean/std of the
    decoded pixels match the source image within the rounding bound."""
    import numpy as np

    from sfa_spark.operators import multimodal as mm

    rng = np.random.default_rng(9)
    rows, imgs = [], {}
    for i in range(6):
        img = rng.integers(32, 224, (16, 16, 3), dtype=np.uint8)
        imgs[i] = img
        rows.append((i, bytearray(_jpeg_encode(img)), "jpeg", 16, 16, 3))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert len(feats) == 6
    for i, img in imgs.items():
        assert abs(feats[i]["mean"] - img.mean()) < 2.0
        assert abs(feats[i]["std"] - img.std()) < 2.0


# ---------------------------------------------------------------------------
# test-side GIF encoder (public spec, GIF89a): palette + LZW — the
# compress side of what the stdlib decoder must invert. GIF is
# lossless, so round-trips are EXACT.


def _gif_lzw_encode(min_code_size, indices):
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code, width):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in bytes(indices):
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            # classic (gifcompr) growth: the width serves EMITTED codes
            # (≤ next_code-1), so it grows only once next_code-1 itself
            # would no longer fit — one add later than the naive
            # next_code == 2^width rule, matching the decoder's lag
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_interlace_rows(h):
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def _gif_encode(w, h, palette, frames, bg_idx=0):
    """frames: list of dicts {idx: (ih,iw) uint8 array, x, y,
    transparent: int|None, disposal: int, interlace: bool}."""
    import struct

    n = len(palette)
    depth = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), bg_idx, 0)
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += bytes(3 * ((1 << depth) - n))
    out += pal
    for f in frames:
        if f.get("transparent") is not None or f.get("disposal"):
            gflags = (f.get("disposal", 0) << 2) | (
                1 if f.get("transparent") is not None else 0
            )
            out += bytes([0x21, 0xF9, 4, gflags, 0, 0,
                          f.get("transparent") or 0, 0])
        idx = f["idx"]
        ih, iw = idx.shape
        iflags = 0x40 if f.get("interlace") else 0
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", f.get("x", 0), f.get("y", 0), iw, ih, iflags
        )
        rows = idx
        if f.get("interlace"):
            rows = idx[_gif_interlace_rows(ih)]
        mcs = max(2, depth)
        out += bytes([mcs])
        lzw = _gif_lzw_encode(mcs, rows.flatten())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_stdlib_decoder_roundtrip_exact():
    """GIF is lossless: a random-palette random-index frame decodes to
    EXACTLY palette[idx], plain and interlaced, including LZW table
    growth and the KwKwK corner."""
    import numpy as np

    from sfa_spark.operators import gif as G

    rng = np.random.default_rng(17)
    palette = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(256)]
    idx = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    pal_arr = np.array(palette, dtype=np.uint8)
    want = pal_arr[idx]

    payload = _gif_encode(31, 23, palette, [{"idx": idx}])
    frames = G.decode_frames(payload)
    assert len(frames) == 1
    assert (frames[0] == want).all()

    inter = _gif_encode(31, 23, palette, [{"idx": idx, "interlace": True}])
    frames = G.decode_frames(inter)
    assert (frames[0] == want).all()

    # KwKwK stress: long runs of one symbol force the cScSc pattern
    runs = np.zeros((8, 64), dtype=np.uint8)
    runs[:, 32:] = 1
    payload = _gif_encode(64, 8, palette[:4], [{"idx": runs}])
    assert (G.decode_frames(payload)[0] == np.array(palette[:4], np.uint8)[runs]).all()


def test_gif_stdlib_decoder_animation_transparency_disposal():
    """Multi-frame compositing: a sub-rect frame with a transparent
    index keeps the canvas underneath; disposal 2 restores the region
    to the background color before the next frame."""
    import numpy as np

    from sfa_spark.operators import gif as G

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    pal = np.array(palette, dtype=np.uint8)
    base = np.full((6, 6), 1, dtype=np.uint8)  # all red
    patch = np.array([[2, 3], [3, 2]], dtype=np.uint8)
    patch_t = np.array([[2, 0], [0, 2]], dtype=np.uint8)  # 0 transparent

    payload = _gif_encode(
        6, 6, palette,
        [
            {"idx": base, "disposal": 1},
            {"idx": patch_t, "x": 2, "y": 1, "transparent": 0, "disposal": 2},
            {"idx": patch, "x": 0, "y": 4, "disposal": 1},
        ],
    )
    frames = G.decode_frames(payload)
    assert len(frames) == 3
    f0, f1, f2 = frames
    assert (f0 == pal[base]).all()
    # frame 1: green at (1,2) and (2,3); transparent cells keep red
    want1 = pal[base].copy()
    want1[1, 2] = pal[2]
    want1[2, 3] = pal[2]
    assert (f1 == want1).all()
    # frame 2: disposal 2 restored the patch region to background
    # (palette[0] = black), then the new patch landed at (4..5, 0..1)
    want2 = pal[base].copy()
    want2[1:3, 2:4] = pal[0]
    want2[4:6, 0:2] = pal[np.array([[2, 3], [3, 2]])]
    assert (f2 == want2).all()


def test_gif_frame_sample_through_spark(spark):
    """End-to-end: gif payloads flow through frame_sample's mapInPandas
    with the REAL stdlib decode branch (when Pillow is absent)."""
    import numpy as np

    from sfa_spark.operators import multimodal as mm

    rng = np.random.default_rng(21)
    palette = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(16)]
    frames = [
        {"idx": rng.integers(0, 16, (8, 8), dtype=np.uint8)} for _ in range(5)
    ]
    payload = _gif_encode(8, 8, palette, frames)
    video = spark.createDataFrame(
        [(1, bytearray(payload), "gif", 8, 8, 3)], mm.MEDIA_SCHEMA
    )
    out = mm.frame_sample(video, every_k=2).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    pal = np.array(palette, dtype=np.uint8)
    for r in out:
        got = np.frombuffer(bytes(r["frame"]), dtype=np.uint8).reshape(8, 8, 3)
        want = pal[frames[r["frame_idx"]]["idx"]]
        assert (got == want).all()


def test_jpeg_stdlib_decoder_422():
    """4:2:2 (horizontal-only chroma subsampling) exercises the
    asymmetric h/v sampling-factor path of the generic MCU walk.
    Horizontally-constant chroma makes the 1x2 subsample exact."""
    import numpy as np

    from sfa_spark.operators import jpeg as J

    rng = np.random.default_rng(13)
    luma = rng.integers(40, 210, (12, 22), dtype=np.uint8)
    rgb = np.stack(
        [
            np.clip(luma.astype(int) + 10, 0, 255),
            luma.astype(int),
            np.clip(luma.astype(int) - 10, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    out = J.decode_baseline(_jpeg_encode(rgb, subsample="422"))
    assert out.shape == rgb.shape
    d = np.abs(out.astype(int) - rgb.astype(int))
    assert d.max() <= 14 and d.mean() < 2.5


def test_gif_lzw_roundtrip_property():
    """Property: for random index streams over random alphabet sizes,
    encoder→decoder is the identity — exercises width growth at every
    alphabet size, long runs (KwKwK chains), and the 4096-entry cap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sfa_spark.operators.gif import _lzw_decode

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=2, max_value=8).flatmap(
            lambda mcs: st.tuples(
                st.just(mcs),
                st.lists(
                    st.integers(min_value=0, max_value=(1 << mcs) - 1),
                    min_size=1,
                    max_size=4000,
                ),
            )
        )
    )
    def check(case):
        mcs, data = case
        payload = _gif_lzw_encode(mcs, bytes(data))
        out = _lzw_decode(mcs, payload, len(data))
        assert list(out) == data

    check()

    # deterministic cap stress: 30k bytes at mcs=8 drives the table
    # past 4096 entries — both sides must stop adding in lockstep
    import numpy as np

    rng = np.random.default_rng(29)
    big = rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
    from sfa_spark.operators.gif import _lzw_decode as dec

    assert dec(8, _gif_lzw_encode(8, big), len(big)) == big


def test_avi_mjpeg_real_video_frame_sample(spark):
    """The r8 real compressed-video branch: REAL baseline JPEGs packed
    into a spec-shaped RIFF/AVI (header, movi list, idx1 index), RIFF-
    demuxed and pixel-decoded to RGB by the stdlib JPEG decoder — no
    codec library anywhere, not a fake path. frame_sample emits every
    k-th frame as raw RGB bytes matching a direct _decode_one of the
    same JPEG blob."""
    from sfa_spark.operators import avi as A

    rng = np.random.default_rng(7)
    w = h = 16
    raw = [
        (rng.integers(0, 256, (h, w, 3)).astype(np.uint8) // 4 * 4)
        for _ in range(5)
    ]
    jpegs = [_jpeg_encode(img) for img in raw]

    payload = A.encode_avi_mjpeg(jpegs, w, h, fps=10)
    # round trip: the demux recovers the exact frame blobs in order
    assert A.split_avi_mjpeg(payload) == jpegs
    # 'rec ' grouping (capture tools batch frames): same frames out
    import struct as _struct

    grouped = A._list(b"rec ", b"".join(A._chunk(b"00dc", f) for f in jpegs))
    riff = b"AVI " + A._list(b"movi", grouped)
    assert (
        A.split_avi_mjpeg(b"RIFF" + _struct.pack("<I", len(riff)) + riff)
        == jpegs
    )
    with pytest.raises(ValueError, match="RIFF"):
        A.split_avi_mjpeg(b"\x00" * 64)

    video = spark.createDataFrame(
        [(9, payload, "avi", w, h, 3)], multimodal.MEDIA_SCHEMA
    )
    out = sorted(
        multimodal.frame_sample(video, every_k=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        want = multimodal._decode_one(
            jpegs[r["frame_idx"]], "jpeg", w, h, 3
        ).tobytes()
        assert bytes(r["frame"]) == want
        # and the decode is a faithful reconstruction of the source
        got = np.frombuffer(bytes(r["frame"]), dtype=np.uint8).reshape(h, w, 3)
        err = np.abs(
            got.astype(int) - raw[r["frame_idx"]].astype(int)
        )
        assert err.max() <= 8, err.max()
