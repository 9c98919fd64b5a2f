"""Baseline TIFF stdlib codec vs the canonical JVM ImageIO TIFF
plugin — both directions, every supported compression. TIFF at this
profile (8-bit strips) is lossless, so every comparison is exact
equality; any ±1 would be a real bug."""

from __future__ import annotations

import random

import pytest

from datapipeline_scripts_spark.extensions import tiff_stdlib as ts


def _gray(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000


def _noise(n, seed):
    return bytes(random.Random(seed).randrange(256) for _ in range(n))


def _smooth(w, h, spp=1):
    return bytes(
        (x * 5 + y * 9 + c * 31) % 256
        for y in range(h)
        for x in range(w)
        for c in range(spp)
    )


# ---------------------------------------------------------------------------
# Pure-Python roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_gray(compression, big_endian):
    w, h = 19, 11  # ragged strips below
    data = _noise(w * h, compression * 2 + big_endian)
    p = ts.encode_tiff(
        w, h, data, compression=compression, rows_per_strip=3, big_endian=big_endian
    )
    assert ts.is_tiff(p)
    assert ts.tiff_size(p) == (w, h)
    assert ts.tiff_decode_gray(p) == (w, h, bytearray(data))


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
def test_roundtrip_rgb(compression):
    w, h = 13, 7
    data = _smooth(w, h, 3)
    p = ts.encode_tiff(w, h, data, rgb=True, compression=compression, rows_per_strip=2)
    expect = bytearray(
        _gray(data[3 * i], data[3 * i + 1], data[3 * i + 2]) for i in range(w * h)
    )
    assert ts.tiff_decode_gray(p) == (w, h, expect)


@pytest.mark.parametrize("compression", [5, 8])
def test_roundtrip_predictor(compression):
    w, h = 40, 9
    data = _smooth(w, h)  # smooth data is what the predictor exists for
    p = ts.encode_tiff(w, h, data, compression=compression, predictor=True)
    assert ts.tiff_decode_gray(p) == (w, h, bytearray(data))
    rgbd = _smooth(w, h, 3)
    p = ts.encode_tiff(w, h, rgbd, rgb=True, compression=compression, predictor=True)
    expect = bytearray(
        _gray(rgbd[3 * i], rgbd[3 * i + 1], rgbd[3 * i + 2]) for i in range(w * h)
    )
    assert ts.tiff_decode_gray(p) == (w, h, expect)


def test_roundtrip_lzw_dictionary_full():
    """Enough noise to climb every code width and force a mid-stream
    CLEAR at 4096 entries."""
    w = h = 120
    data = _noise(w * h, 77)
    p = ts.encode_tiff(w, h, data, compression=5)
    assert ts.tiff_decode_gray(p) == (w, h, bytearray(data))


# ---------------------------------------------------------------------------
# Our encoder → canonical decoder
# ---------------------------------------------------------------------------


def _imageio_read_gray_samples(jvm, payload: bytes):
    """Raster samples, NOT getRGB — gray BufferedImages are linear
    colorspace and getRGB would sRGB-convert the values."""
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    assert img is not None, "ImageIO refused the TIFF"
    w, h = img.getWidth(), img.getHeight()
    r = img.getRaster()
    return w, h, bytes(r.getSample(x, y, 0) for y in range(h) for x in range(w))


def _imageio_read_rgb(jvm, payload: bytes):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    assert img is not None, "ImageIO refused the TIFF"
    w, h = img.getWidth(), img.getHeight()
    return w, h, [
        ((v >> 16) & 255, (v >> 8) & 255, v & 255)
        for y in range(h)
        for v in (img.getRGB(0, y, w, 1, None, 0, w) or [])
    ]


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_our_encoder_bit_exact_in_imageio_gray(spark, compression, big_endian):
    jvm = spark._jvm
    w, h = 21, 10
    data = _noise(w * h, compression + 10 * big_endian)
    p = ts.encode_tiff(
        w, h, data, compression=compression, rows_per_strip=4, big_endian=big_endian
    )
    iw, ih, samples = _imageio_read_gray_samples(jvm, p)
    assert (iw, ih) == (w, h)
    assert samples == data


@pytest.mark.parametrize("compression", [5, 8])
def test_our_encoder_predictor_bit_exact_in_imageio(spark, compression):
    jvm = spark._jvm
    w, h = 33, 8
    data = _smooth(w, h, 3)
    p = ts.encode_tiff(w, h, data, rgb=True, compression=compression, predictor=True)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    assert (iw, ih) == (w, h)
    expect = [tuple(data[3 * i : 3 * i + 3]) for i in range(w * h)]
    assert pix == expect


def test_our_encoder_lzw_full_dict_bit_exact_in_imageio(spark):
    jvm = spark._jvm
    w = h = 120
    data = _noise(w * h, 5)
    p = ts.encode_tiff(w, h, data, compression=5)
    iw, ih, samples = _imageio_read_gray_samples(jvm, p)
    assert (iw, ih) == (w, h)
    assert samples == data


# ---------------------------------------------------------------------------
# Canonical encoder → our decoder
# ---------------------------------------------------------------------------


def _imageio_write_tiff(jvm, img, ctype: str | None) -> bytes:
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    wr = it.next()
    prm = wr.getDefaultWriteParam()
    if ctype is not None:
        prm.setCompressionMode(2)  # ImageWriteParam.MODE_EXPLICIT
        prm.setCompressionType(ctype)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), prm)
    wr.dispose()
    ios.close()
    return bytes(baos.toByteArray())


def _gray_img(jvm, w, h, fn):
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


@pytest.mark.parametrize("ctype", [None, "LZW", "ZLib", "PackBits", "Deflate"])
def test_imageio_writer_gray_bit_exact_here(spark, ctype):
    jvm = spark._jvm
    w, h = 37, 23
    p = _imageio_write_tiff(jvm, _gray_img(jvm, w, h, lambda x, y: (x * 7 + y * 11) % 256), ctype)
    assert ts.is_tiff(p)
    iw, ih, samples = _imageio_read_gray_samples(jvm, p)
    assert ts.tiff_decode_gray(p) == (iw, ih, bytearray(samples))
    assert (iw, ih) == (w, h)


@pytest.mark.parametrize("ctype", [None, "LZW", "ZLib", "PackBits", "Deflate"])
def test_imageio_writer_rgb_bit_exact_here(spark, ctype):
    jvm = spark._jvm
    w, h = 29, 17
    p = _imageio_write_tiff(
        jvm,
        _rgb_img(jvm, w, h, lambda x, y: ((x * 9) % 256, (y * 13) % 256, (x * y) % 256)),
        ctype,
    )
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    dw, dh, gray = ts.tiff_decode_gray(p)
    assert (dw, dh) == (iw, ih) == (w, h)
    assert list(gray) == [_gray(r, g, b) for r, g, b in pix]


def test_imageio_writer_palette_bit_exact_here(spark):
    """TYPE_BYTE_INDEXED writes a palette (photometric 3) TIFF through
    the default 256-color ICM — our ColorMap high-byte convention must
    agree with what ImageIO itself reads back."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    w, h = 16, 12
    img = BI(w, h, BI.TYPE_BYTE_INDEXED)
    for y in range(h):
        for x in range(w):
            v = ((x * 16) % 256, (y * 21) % 256, (x + y) % 256)
            img.setRGB(x, y, (v[0] << 16) | (v[1] << 8) | v[2])
    p = _imageio_write_tiff(jvm, img, "LZW")
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    dw, dh, gray = ts.tiff_decode_gray(p)
    assert (dw, dh) == (iw, ih) == (w, h)
    assert list(gray) == [_gray(r, g, b) for r, g, b in pix]


def test_sixteen_bit_refusal_is_loud(spark):
    """A canonical 16-bit gray TIFF must refuse by name, not decode
    to garbage bytes."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    img = BI(8, 8, BI.TYPE_USHORT_GRAY)
    r = img.getRaster()
    for y in range(8):
        for x in range(8):
            r.setSample(x, y, 0, (x * y * 1000) % 65536)
    p = _imageio_write_tiff(jvm, img, None)
    assert ts.tiff_size(p) == (8, 8)  # dims stay readable
    with pytest.raises(NotImplementedError, match="bits-per-sample"):
        ts.tiff_decode_gray(p)


# ---------------------------------------------------------------------------
# Contracts and refusals
# ---------------------------------------------------------------------------


def test_corruption_is_loud():
    data = _noise(8 * 8, 1)
    p = ts.encode_tiff(8, 8, data, compression=5)
    with pytest.raises(ValueError, match="signature"):
        ts.tiff_decode_gray(b"XXXX" + p[4:])
    with pytest.raises(ValueError):
        ts.tiff_decode_gray(p[:30])  # IFD is at the tail: offsets dangle


def test_encoder_validations():
    with pytest.raises(ValueError, match="samples"):
        ts.encode_tiff(4, 4, b"\x00" * 15)
    with pytest.raises(ValueError, match="predictor"):
        ts.encode_tiff(2, 2, b"\x00" * 4, compression=32773, predictor=True)
    with pytest.raises(ValueError, match="compression"):
        ts.encode_tiff(2, 2, b"\x00" * 4, compression=6)


def test_band_row_contract():
    data = (b"\x0a" * 8 + b"\xc8" * 8) * 4
    p = ts.encode_tiff(16, 4, data, compression=32773)
    assert ts.tiff_gray_band_row(p, 4) == [10, 10, 200, 200]


def _imageio_write_tiled(jvm, img, ctype, tw, tl):
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    wr = it.next()
    prm = wr.getDefaultWriteParam()
    prm.setTilingMode(2)  # MODE_EXPLICIT
    prm.setTiling(tw, tl, 0, 0)
    if ctype is not None:
        prm.setCompressionMode(2)
        prm.setCompressionType(ctype)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), prm)
    wr.dispose()
    ios.close()
    return bytes(baos.toByteArray())


@pytest.mark.parametrize("ctype", [None, "LZW", "Deflate", "PackBits"])
def test_imageio_tiled_gray_bit_exact_here(spark, ctype):
    """Tile organization (round 8, canonical-writer direction): a
    50x41 image over 16x16 tiles has partial tiles on BOTH edges —
    the full-size-tile crop rule must hold under every codec."""
    jvm = spark._jvm
    w, h = 50, 41
    p = _imageio_write_tiled(
        jvm, _gray_img(jvm, w, h, lambda x, y: (x * 13 + y * 7) % 256), ctype, 16, 16
    )
    assert ts.tiff_size(p) == (w, h)
    iw, ih, samples = _imageio_read_gray_samples(jvm, p)
    assert ts.tiff_decode_gray(p) == (iw, ih, bytearray(samples))
    assert (iw, ih) == (w, h)


def test_imageio_tiled_rgb_bit_exact_here(spark):
    jvm = spark._jvm
    w, h = 37, 20
    p = _imageio_write_tiled(
        jvm,
        _rgb_img(jvm, w, h, lambda x, y: ((x * 11) % 256, (y * 17) % 256, (x ^ y) % 256)),
        "LZW",
        16,
        16,
    )
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    dw, dh, gray = ts.tiff_decode_gray(p)
    assert (dw, dh) == (iw, ih) == (w, h)
    assert list(gray) == [_gray(r, g, b) for r, g, b in pix]


@pytest.mark.parametrize("ctype", [None, "LZW", "Deflate", "PackBits"])
def test_imageio_bilevel_bit_exact_here(spark, ctype):
    """1-bit bilevel (round 8): a canonical TYPE_BYTE_BINARY write —
    MSB-first packed rows at a non-multiple-of-8 width — decodes here
    to the exact 0/255 raster ImageIO itself reads back (bilevel uses
    an exact two-entry IndexColorModel, so getRGB is safe)."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    w, h = 21, 9  # 21 bits/row: 3 packed bytes with 3 pad bits
    img = BI(w, h, BI.TYPE_BYTE_BINARY)
    r = img.getRaster()
    for y in range(h):
        for x in range(w):
            r.setSample(x, y, 0, int((x * y + x) % 3 == 0))
    p = _imageio_write_tiff(jvm, img, ctype)
    assert ts.tiff_size(p) == (w, h)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    dw, dh, gray = ts.tiff_decode_gray(p)
    assert (dw, dh) == (iw, ih) == (w, h)
    assert list(gray) == [rr for rr, _g, _b in pix]
    assert set(gray) == {0, 255}


# ---------------------------------------------------------------------------
# 16-bit unsigned gray (VERDICT r09 item 6) + per-class refusal pins
# ---------------------------------------------------------------------------


def _gray16_img(jvm, w, h, fn):
    BI = jvm.java.awt.image.BufferedImage
    img = BI(w, h, BI.TYPE_USHORT_GRAY)
    r = img.getRaster()
    for y in range(h):
        for x in range(w):
            r.setSample(x, y, 0, fn(x, y))
    return img


def _imageio_read_gray16(jvm, payload: bytes):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    assert img is not None, "ImageIO refused the TIFF"
    r = img.getRaster()
    w, h = img.getWidth(), img.getHeight()
    return w, h, [r.getSample(x, y, 0) for y in range(h) for x in range(w)]


@pytest.mark.parametrize("ctype", [None, "LZW", "ZLib", "PackBits", "Deflate"])
def test_imageio_writer_gray16_sample_exact_here(spark, ctype):
    """The canonical writer's 16-bit gray TIFFs decode sample-exact
    through tiff_decode_gray16, every compression."""
    jvm = spark._jvm
    w, h = 29, 17
    p = _imageio_write_tiff(
        jvm, _gray16_img(jvm, w, h, lambda x, y: (x * 2531 + y * 7919) % 65536), ctype
    )
    gw, gh, got = ts.tiff_decode_gray16(p)
    iw, ih, want = _imageio_read_gray16(jvm, p)
    assert (gw, gh) == (iw, ih) == (w, h)
    assert got == want


def test_imageio_writer_gray16_tiled_sample_exact_here(spark):
    """Tile-organized 16-bit gray (explicit tiling through the
    canonical writer) decodes sample-exact, edge tiles cropped."""
    jvm = spark._jvm
    w, h = 37, 21
    img = _gray16_img(jvm, w, h, lambda x, y: (x * 911 + y * 127) % 65536)
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    wr = it.next()
    prm = wr.getDefaultWriteParam()
    prm.setCompressionMode(2)
    prm.setCompressionType("LZW")
    prm.setTilingMode(2)  # MODE_EXPLICIT
    prm.setTiling(16, 16, 0, 0)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), prm)
    wr.dispose()
    ios.close()
    p = bytes(baos.toByteArray())
    gw, gh, got = ts.tiff_decode_gray16(p)
    iw, ih, want = _imageio_read_gray16(jvm, p)
    assert (gw, gh) == (iw, ih) == (w, h)
    assert got == want


def _mk_tiff(entries: dict[int, tuple[int, list[int]]], data: bytes = b"") -> bytes:
    """Hand-assemble a minimal little-endian single-IFD TIFF. Values
    must fit inline (≤ 4 bytes); strip data (if any) lands right after
    the IFD — reference it via tag 273 with value `_DATA`."""
    import struct as st

    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(st.pack("<2sHI", b"II", 42, 8))
    out += st.pack("<H", n)
    for tag in sorted(entries):
        typ, vals = entries[tag]
        vals = [data_off if v == "_DATA" else v for v in vals]
        out += st.pack("<HHI", tag, typ, len(vals))
        cell = bytearray(4)
        fmt = {3: "<H", 4: "<I"}[typ]
        sz = {3: 2, 4: 4}[typ]
        for i, v in enumerate(vals):
            st.pack_into(fmt, cell, i * sz, v)
        out += cell
    out += st.pack("<I", 0)  # no next IFD
    out += data
    return bytes(out)


def _base16(w=4, h=4, over=None):
    e = {
        256: (3, [w]),
        257: (3, [h]),
        258: (3, [16]),
        259: (3, [1]),
        262: (3, [1]),
        277: (3, [1]),
        273: (4, ["_DATA"]),
        279: (4, [w * h * 2]),
    }
    e.update(over or {})
    return e


def test_handcrafted_gray16_predictor_decodes_per_spec(spark):
    """A predictor-2 deflate 16-bit strip TIFF (assembled by hand)
    decodes with differencing applied on SAMPLES, not bytes (TIFF 6.0
    §14). The oracle is arithmetic: the stream is hand-differenced
    from known samples, so recovering those samples IS the
    per-spec proof. The JVM's bundled ImageIO plugin REFUSES this
    combination ('16-bit samples are not supported for Horizontal
    differencing Predictor') — pinned below, so if a future JDK adds
    support this test flags us to cross-check against it."""
    import struct as st
    import zlib

    w, h = 6, 3
    samples = [(x * 12345 + y * 54321) % 65536 for y in range(h) for x in range(w)]
    raw = bytearray()
    for y in range(h):
        row = samples[y * w : (y + 1) * w]
        diff = [row[0]] + [(row[x] - row[x - 1]) & 0xFFFF for x in range(1, w)]
        raw += st.pack(f"<{w}H", *diff)
    data = zlib.compress(bytes(raw))
    p = _mk_tiff(
        _base16(w, h, {259: (3, [8]), 317: (3, [2]), 279: (4, [len(data)])}),
        data,
    )
    gw, gh, got = ts.tiff_decode_gray16(p)
    assert (gw, gh) == (w, h) and got == samples
    jvm = spark._jvm
    try:
        jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(p))
        refused = False
    except Exception as exc:  # Py4JJavaError — IIOException inside
        refused = "not supported for Horizontal differencing" in str(exc)
    assert refused, "ImageIO now reads 16-bit+predictor: cross-check against it"


def test_refusals_are_loud_per_class():
    """VERDICT r09 item 6: every residual unsupported TIFF class
    refuses loudly with its tag named — none may rot into a silent
    wrong decode."""
    import zlib

    data8 = bytes(16)
    base8 = {
        256: (3, [4]),
        257: (3, [4]),
        258: (3, [8]),
        259: (3, [1]),
        262: (3, [1]),
        277: (3, [1]),
        273: (4, ["_DATA"]),
        279: (4, [16]),
    }

    def mk8(over):
        e = dict(base8)
        e.update(over)
        return _mk_tiff(e, data8)

    # planar separates
    with pytest.raises(NotImplementedError, match="planar"):
        ts.tiff_decode_gray(mk8({284: (3, [2])}))
    with pytest.raises(NotImplementedError, match="planar"):
        ts.tiff_decode_gray16(_mk_tiff(_base16(over={284: (3, [2])}), bytes(32)))
    # floating samples
    with pytest.raises(NotImplementedError, match="sample format 3"):
        ts.tiff_decode_gray(mk8({339: (3, [3])}))
    with pytest.raises(NotImplementedError, match="sample format 3"):
        ts.tiff_decode_gray16(_mk_tiff(_base16(over={339: (3, [3])}), bytes(32)))
    # 4-bit depth
    with pytest.raises(NotImplementedError, match="bits-per-sample"):
        ts.tiff_decode_gray(mk8({258: (3, [4])}))
    # 16-bit through the 8-bit API points at the 16-bit one
    with pytest.raises(NotImplementedError, match="tiff_decode_gray16"):
        ts.tiff_decode_gray(_mk_tiff(_base16(), bytes(32)))
    # CCITT fax codes (compression 3) — refused at the strip codec
    bilevel = {
        256: (3, [8]),
        257: (3, [2]),
        258: (3, [1]),
        259: (3, [3]),
        262: (3, [0]),
        277: (3, [1]),
        273: (4, ["_DATA"]),
        279: (4, [4]),
    }
    with pytest.raises(NotImplementedError, match="compression 3"):
        ts.tiff_decode_gray(_mk_tiff(bilevel, bytes(4)))
    # RGB 16-bit refuses in gray16 too (one sample only)
    with pytest.raises(NotImplementedError, match="16-bit"):
        ts.tiff_decode_gray16(
            _mk_tiff(_base16(over={262: (3, [2]), 277: (3, [3])}), bytes(96))
        )


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_gray16_encoder_roundtrips(compression, big_endian):
    w, h = 13, 9
    samples = [(x * 4099 + y * 257) % 65536 for y in range(h) for x in range(w)]
    p = ts.encode_tiff_gray16(
        w, h, samples, compression=compression, rows_per_strip=4, big_endian=big_endian
    )
    assert ts.tiff_decode_gray16(p) == (w, h, samples)


@pytest.mark.parametrize("compression", [5, 8])
def test_gray16_encoder_predictor_roundtrips(compression):
    w, h = 11, 6
    samples = [(x * 60000 + y * 31) % 65536 for y in range(h) for x in range(w)]
    p = ts.encode_tiff_gray16(w, h, samples, compression=compression, predictor=True)
    assert ts.tiff_decode_gray16(p) == (w, h, samples)


@pytest.mark.parametrize("compression", [1, 5, 8])
def test_gray16_encoder_bit_exact_in_imageio(spark, compression):
    """Our 16-bit writer's files decode sample-exact in the canonical
    JVM reader (no predictor — ImageIO refuses that combination)."""
    jvm = spark._jvm
    w, h = 19, 7
    samples = [(x * 33331 + y * 777) % 65536 for y in range(h) for x in range(w)]
    p = ts.encode_tiff_gray16(w, h, samples, compression=compression, rows_per_strip=3)
    iw, ih, got = _imageio_read_gray16(jvm, p)
    assert (iw, ih) == (w, h) and got == samples
