"""Baseline JPEG stdlib codec vs the canonical JVM ImageIO codec
(VERDICT r7 item 6: real non-PNG decode without Pillow, proven against
ImageIO — the same canonical-encoder strategy as the PNG/Avro/protobuf
tiers). Encode with ImageIO → decode here, and encode here → decode
with ImageIO, so neither direction is self-proven.

Tolerances: T.81 does not require bit-identical decoders — IDCT
rounding legitimately differs by ±1-2 gray levels, and chroma
upsampling filters (our sample replication vs libjpeg's triangle
filter) differ more at hard chroma edges. The bounds here were
measured against this container's ImageIO and pinned with headroom."""

from __future__ import annotations

import hashlib

import pytest

from datapipeline_scripts_spark.extensions import jpeg_stdlib as js


def _writer(jvm, quality=None, progressive=False):
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    wr = it.next()
    p = wr.getDefaultWriteParam()
    if quality is not None:
        p.setCompressionMode(2)  # ImageWriteParam.MODE_EXPLICIT
        p.setCompressionQuality(float(quality))
    if progressive:
        p.setProgressiveMode(1)  # ImageWriteParam.MODE_DEFAULT
    return wr, p


def _encode(jvm, img, quality=None, progressive=False) -> bytes:
    baos = jvm.java.io.ByteArrayOutputStream()
    wr, p = _writer(jvm, quality, progressive)
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), p)
    wr.dispose()
    ios.close()
    return bytes(baos.toByteArray())


def _gray_img(jvm, w, h, fn):
    """TYPE_BYTE_GRAY via raster samples — setRGB would sRGB→linear
    convert (TYPE_BYTE_GRAY is a LINEAR colorspace) and the file would
    hold different samples than fn returns."""
    BI = jvm.java.awt.image.BufferedImage
    img = BI(w, h, BI.TYPE_BYTE_GRAY)
    r = img.getRaster()
    for y in range(h):
        for x in range(w):
            r.setSample(x, y, 0, fn(x, y))
    return img


def _rgb_img(jvm, w, h, fn):
    BI = jvm.java.awt.image.BufferedImage
    img = BI(w, h, BI.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = fn(x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    return img


def _ref_gray_raster(jvm, payload):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    w, h = img.getWidth(), img.getHeight()
    r = img.getRaster()
    return w, h, [[r.getSample(x, y, 0) for x in range(w)] for y in range(h)]


def _ref_gray_bt601(jvm, payload):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    w, h = img.getWidth(), img.getHeight()
    out = []
    for y in range(h):
        row = []
        for x in range(w):
            v = img.getRGB(x, y)
            r, g, b = (v >> 16) & 255, (v >> 8) & 255, v & 255
            row.append((299 * r + 587 * g + 114 * b) // 1000)
        out.append(row)
    return w, h, out


def _max_mean_diff(w, h, ours, ref):
    diffs = [abs(ours[y * w + x] - ref[y][x]) for y in range(h) for x in range(w)]
    return max(diffs), sum(diffs) / len(diffs)


def test_idct_basis_pinned():
    """The float→int basis quantization happens once at import; pin its
    fingerprint so any libm/platform drift fails LOUDLY instead of
    silently changing every decoded pixel fleet-wide."""
    b = js._IDCT_BASIS
    assert len(b) == 64 and all(len(r) == 64 for r in b)
    assert all(r[0] == 1024 for r in b)  # DC basis: 8192/8 exactly
    fp = hashlib.md5(repr(b).encode()).hexdigest()
    assert fp == "bcd22310db282f3307c55e01a3cf6667"
    assert sum(sum(abs(v) for v in r) for r in b) == 3659264


def test_std_tables_match_imageio_dht(spark):
    """The hardcoded Annex K huffman specs must be byte-identical to
    the DHT segments ImageIO writes (it uses the standard tables) —
    catches any transcription typo in the 162-entry AC list."""
    jvm = spark._jvm
    p = _encode(jvm, _gray_img(jvm, 8, 8, lambda x, y: 90))
    dhts = {}
    for marker, off, ln in js._iter_segments(p):
        if marker == 0xC4:
            seg = p[off : off + ln]
            dhts[seg[0]] = seg[1:]
    want_dc = bytes(js.STD_DC_BITS) + bytes(js.STD_DC_VALS)
    want_ac = bytes(js.STD_AC_BITS) + bytes(js.STD_AC_VALS)
    assert dhts[0x00] == want_dc
    assert dhts[0x10] == want_ac


@pytest.mark.parametrize("quality", [None, 0.9, 0.5, 0.3])
def test_gray_conformance_vs_imageio(spark, quality):
    """Grayscale gradients: ImageIO-encoded, decoded by both codecs —
    within IDCT-rounding distance (measured max 1 here; bound 2)."""
    jvm = spark._jvm
    w, h = 24, 16
    p = _encode(jvm, _gray_img(jvm, w, h, lambda x, y: (8 * x + 3 * y) % 256), quality)
    assert js.is_jpeg(p)
    assert js.jpeg_size(p) == (w, h)
    gw, gh, g = js.jpeg_decode_gray(p)
    assert (gw, gh) == (w, h)
    rw, rh, ref = _ref_gray_raster(jvm, p)
    mx, mean = _max_mean_diff(w, h, g, ref)
    assert mx <= 2, (quality, mx, mean)


@pytest.mark.parametrize("w,h,quality", [(32, 24, None), (32, 24, 0.95), (21, 13, 0.7)])
def test_rgb_conformance_vs_imageio(spark, w, h, quality):
    """YCbCr 4:2:0 gradients (ImageIO's default sampling) through
    upsample + JFIF color convert + BT.601: measured max 2; bound 4.
    Odd dimensions exercise the partial-MCU edge blocks."""
    jvm = spark._jvm
    p = _encode(
        jvm,
        _rgb_img(jvm, w, h, lambda x, y: (7 * x % 256, (255 - 5 * y) % 256, (3 * x + 4 * y) % 256)),
        quality,
    )
    assert js.jpeg_size(p) == (w, h)
    gw, gh, g = js.jpeg_decode_gray(p)
    assert (gw, gh) == (w, h)
    rw, rh, ref = _ref_gray_bt601(jvm, p)
    mx, mean = _max_mean_diff(w, h, g, ref)
    assert mx <= 4, (quality, mx, mean)
    assert mean <= 1.0, (quality, mx, mean)


def test_rgb_harsh_chroma_bounded(spark):
    """Red/blue 4-px checkerboard — the worst case for replication-vs-
    triangle chroma upsampling. Measured max 19 at q50; bound 32 with
    a tight mean so a systematic error can't hide in the headroom."""
    jvm = spark._jvm
    w = h = 32
    img = _rgb_img(
        jvm, w, h,
        lambda x, y: (255, 0, 0) if (x // 4 + y // 4) % 2 == 0 else (0, 0, 255),
    )
    for quality in (None, 0.5):
        p = _encode(jvm, img, quality)
        gw, gh, g = js.jpeg_decode_gray(p)
        rw, rh, ref = _ref_gray_bt601(jvm, p)
        mx, mean = _max_mean_diff(w, h, g, ref)
        assert mx <= 32, (quality, mx, mean)
        assert mean <= 5.0, (quality, mx, mean)


def test_progressive_refused_loudly_but_size_works(spark):
    jvm = spark._jvm
    p = _encode(
        jvm,
        _rgb_img(jvm, 20, 10, lambda x, y: (x * 12 % 256, y * 20 % 256, 99)),
        0.8,
        progressive=True,
    )
    assert js.jpeg_size(p) == (20, 10)  # dims are metadata even for SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        js.jpeg_decode_gray(p)


def test_corruption_is_loud():
    with pytest.raises(ValueError, match="SOI"):
        js.jpeg_decode_gray(b"\x00\x01\x02\x03\x04")
    with pytest.raises(ValueError, match="SOI"):
        js.jpeg_size(b"GIF89a-not-a-jpeg")
    # valid SOI then garbage
    with pytest.raises(ValueError):
        js.jpeg_size(b"\xff\xd8\x00\x00\x00\x00")
    # truncated mid-header
    p = js.encode_gray_baseline(8, 8, [[3] + [0] * 63])
    with pytest.raises(ValueError):
        js.jpeg_decode_gray(p[:20])


def test_encoder_decoder_integer_exactness():
    """Our encoder hands QUANTIZED coefficients to our decoder: the
    output pixel is an exact closed-form integer function of them —
    the property the staged multimodal_real_jpeg oracle recomputes in
    SQL. DC-only → flat block at ((1024·dc·q00+4096)>>13)+128; adding
    AC(0,1) varies only with x through the pinned basis column."""
    q00, q01 = js.STD_LUMA_QUANT[0], js.STD_LUMA_QUANT[1]
    B = js._IDCT_BASIS

    def blk(dc, ac01=0):
        b = [0] * 64
        b[0], b[1] = dc, ac01
        return b

    w, h = 24, 8
    dcs = [5, -3, 12]
    p = js.encode_gray_baseline(w, h, [blk(d) for d in dcs])
    gw, gh, g = js.jpeg_decode_gray(p)
    assert (gw, gh) == (w, h)
    for bi, dc in enumerate(dcs):
        want = ((1024 * dc * q00 + 4096) >> 13) + 128
        assert all(
            g[y * w + bi * 8 + x] == want for y in range(8) for x in range(8)
        ), (bi, want)
    # AC(0,1) + restart markers every MCU (the path ImageIO can't emit)
    spec = [(4, 3), (7, -2), (-5, 1), (0, 4)]
    w2 = 32
    p2 = js.encode_gray_baseline(w2, 8, [blk(d, a) for d, a in spec], restart_interval=1)
    gw2, gh2, g2 = js.jpeg_decode_gray(p2)
    for bi, (dc, ac) in enumerate(spec):
        for x in range(8):
            want = ((1024 * dc * q00 + B[x][1] * ac * q01 + 4096) >> 13) + 128
            want = max(0, min(255, want))
            for y in range(8):
                assert g2[y * w2 + bi * 8 + x] == want, (bi, x, y)
    # decode is deterministic byte-for-byte
    assert js.jpeg_decode_gray(p2)[2] == g2


def test_encoder_output_decodes_identically_in_imageio(spark):
    """Cross-proof in the OTHER direction: the JVM decoder reads our
    encoder's restart-marker DC+AC file to the exact same samples
    (smooth low-frequency content → IDCT variance is sub-rounding)."""
    jvm = spark._jvm

    def blk(dc, ac01):
        b = [0] * 64
        b[0], b[1] = dc, ac01
        return b

    spec = [(4, 3), (7, -2), (-5, 1), (0, 4), (9, 0), (-8, 2), (2, -4), (0, 0)]
    w, h = 32, 16
    p = js.encode_gray_baseline(w, h, [blk(d, a) for d, a in spec], restart_interval=3)
    gw, gh, g = js.jpeg_decode_gray(p)
    rw, rh, ref = _ref_gray_raster(jvm, p)
    assert (rw, rh) == (w, h)
    mx, mean = _max_mean_diff(w, h, g, ref)
    assert mx == 0, (mx, mean)


def test_band_row_contract():
    """jpeg_gray_band_row mirrors png_gray_band_row: area-true box
    average over column bands, all rows."""
    p = js.encode_gray_baseline(16, 8, [[10] + [0] * 63, [-10] + [0] * 63])
    w, h, g = js.jpeg_decode_gray(p)
    left = ((1024 * 10 * 16 + 4096) >> 13) + 128
    right = ((1024 * -10 * 16 + 4096) >> 13) + 128
    bands = js.jpeg_gray_band_row(p, 4)
    assert bands == [left, left, right, right]


@pytest.mark.parametrize("sampling,label,bound", [
    ((1, 1), "4:4:4", 0),
    ((2, 1), "4:2:2", 1),  # triangle-vs-box at chroma block edges
    ((2, 2), "4:2:0", 2),
])
def test_color_samplings_cross_proven_vs_imageio(spark, sampling, label, bound):
    """The color encoder unlocks the decoder's 4:4:4 / 4:2:2 paths
    (ImageIO's writer only emits 4:2:0): DC-only YCbCr files decode
    bit-identically in both codecs when no upsampling interpolation is
    involved (4:4:4, and 4:2:2 on flat blocks), and within ±2 for
    4:2:0. Seeded random DC walks cover the interleave order and the
    per-component DC predictors."""
    import random

    from datapipeline_scripts_spark.extensions import jpeg_stdlib as js

    jvm = spark._jvm
    rnd = random.Random(hash(label) & 0xFFFF)

    def blk(dc):
        b = [0] * 64
        b[0] = dc
        return b

    h1, v1 = sampling
    mcux, mcuy = 3, 2
    w, h = 8 * h1 * mcux, 8 * v1 * mcuy
    ydc = [rnd.randint(-15, 15) for _ in range(mcux * h1 * mcuy * v1)]
    cbdc = [rnd.randint(-8, 8) for _ in range(mcux * mcuy)]
    crdc = [rnd.randint(-8, 8) for _ in range(mcux * mcuy)]
    p = js.encode_ycbcr_baseline(
        w, h,
        [blk(d) for d in ydc], [blk(d) for d in cbdc], [blk(d) for d in crdc],
        sampling=sampling, restart_interval=2,
    )
    assert js.jpeg_size(p) == (w, h)
    gw, gh, g = js.jpeg_decode_gray(p)
    assert (gw, gh) == (w, h)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(p))
    diffs = []
    for y in range(h):
        for x in range(w):
            v = img.getRGB(x, y)
            r, gg, b = (v >> 16) & 255, (v >> 8) & 255, v & 255
            diffs.append(abs(g[y * w + x] - (299 * r + 587 * gg + 114 * b) // 1000))
    assert max(diffs) <= bound, (label, max(diffs), sum(diffs) / len(diffs))
