"""BMP stdlib codec vs the canonical JVM ImageIO BMP plugin — both
directions, exact equality throughout (BMP is lossless)."""

from __future__ import annotations

import random

import pytest

from datapipeline_scripts_spark.extensions import bmp_stdlib as bs


def _gray(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000


def _rgb_raster(w, h, seed):
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(3 * w * h))


_PAL = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 12, 34, 250, 200, 200, 200])


@pytest.mark.parametrize("top_down", [False, True])
def test_roundtrip_24bit(top_down):
    w, h = 13, 7  # stride padding: 13*3=39 → 40
    data = _rgb_raster(w, h, top_down)
    p = bs.encode_bmp(w, h, data, top_down=top_down)
    assert bs.is_bmp(p)
    assert bs.bmp_size(p) == (w, h)
    expect = bytearray(
        _gray(data[3 * i], data[3 * i + 1], data[3 * i + 2]) for i in range(w * h)
    )
    assert bs.bmp_decode_gray(p) == (w, h, expect)


@pytest.mark.parametrize("rle", [False, True])
def test_roundtrip_8bit_palette(rle):
    w, h = 19, 5  # stride 19 → 20
    rnd = random.Random(rle)
    idx = bytes(rnd.randrange(5) for _ in range(w * h))
    p = bs.encode_bmp(w, h, idx, palette=_PAL, rle=rle)
    lut = [_gray(_PAL[3 * i], _PAL[3 * i + 1], _PAL[3 * i + 2]) for i in range(5)]
    assert bs.bmp_decode_gray(p) == (w, h, bytearray(lut[i] for i in idx))


def _imageio_read_rgb(jvm, payload: bytes):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    assert img is not None, "ImageIO refused the BMP"
    w, h = img.getWidth(), img.getHeight()
    return w, h, [
        ((v >> 16) & 255, (v >> 8) & 255, v & 255)
        for y in range(h)
        for v in (img.getRGB(0, y, w, 1, None, 0, w) or [])
    ]


@pytest.mark.parametrize("top_down", [False, True])
def test_our_24bit_encoder_bit_exact_in_imageio(spark, top_down):
    jvm = spark._jvm
    w, h = 21, 10
    data = _rgb_raster(w, h, 5 + top_down)
    p = bs.encode_bmp(w, h, data, top_down=top_down)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    assert (iw, ih) == (w, h)
    assert pix == [tuple(data[3 * i : 3 * i + 3]) for i in range(w * h)]


@pytest.mark.parametrize("rle", [False, True])
def test_our_palette_encoder_bit_exact_in_imageio(spark, rle):
    jvm = spark._jvm
    w, h = 18, 9
    rnd = random.Random(9 + rle)
    idx = bytes(rnd.randrange(5) for _ in range(w * h))
    p = bs.encode_bmp(w, h, idx, palette=_PAL, rle=rle)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    assert (iw, ih) == (w, h)
    assert pix == [tuple(_PAL[3 * i : 3 * i + 3]) for i in idx]


@pytest.mark.parametrize("ctype", [None, "BI_RGB", "BI_RLE8"])
def test_imageio_writer_bit_exact_here(spark, ctype):
    """Canonical-encoder direction. BI_RLE8 needs an indexed image;
    the default and BI_RGB paths run truecolor."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    w, h = 23, 11
    kind = BI.TYPE_BYTE_INDEXED if ctype == "BI_RLE8" else BI.TYPE_INT_RGB
    img = BI(w, h, kind)
    for y in range(h):
        for x in range(w):
            img.setRGB(x, y, ((x * 29 % 256) << 16) | ((y * 41 % 256) << 8) | ((x + y) % 256))
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("bmp")
    wr = it.next()
    prm = wr.getDefaultWriteParam()
    if ctype is not None:
        prm.setCompressionMode(2)  # MODE_EXPLICIT
        prm.setCompressionType(ctype)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), prm)
    wr.dispose()
    ios.close()
    p = bytes(baos.toByteArray())
    assert bs.is_bmp(p)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    dw, dh, gray = bs.bmp_decode_gray(p)
    assert (dw, dh) == (iw, ih) == (w, h)
    assert list(gray) == [_gray(r, g, b) for r, g, b in pix]


def test_corruption_and_refusals_are_loud(spark):
    data = _rgb_raster(4, 4, 0)
    p = bs.encode_bmp(4, 4, data)
    with pytest.raises(ValueError, match="signature"):
        bs.bmp_decode_gray(b"XX" + p[2:])
    with pytest.raises(ValueError):
        bs.bmp_decode_gray(p[:40])
    # 16-bit canonical file: dims readable, pixels refuse by depth
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    img = BI(5, 4, BI.TYPE_USHORT_565_RGB)
    for y in range(4):
        for x in range(5):
            img.setRGB(x, y, (x * 50 << 16) | (y * 60 << 8) | 99)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "bmp", baos)
    deep = bytes(baos.toByteArray())
    assert bs.bmp_size(deep) == (5, 4)
    with pytest.raises(NotImplementedError, match="depth|bitfield"):
        bs.bmp_decode_gray(deep)


def test_encoder_validations():
    with pytest.raises(ValueError, match="RGB bytes"):
        bs.encode_bmp(2, 2, b"\x00" * 11)
    with pytest.raises(ValueError, match="indices"):
        bs.encode_bmp(2, 2, b"\x00" * 3, palette=_PAL)
    with pytest.raises(ValueError, match="RLE8 requires"):
        bs.encode_bmp(2, 2, b"\x00" * 12, rle=True)
    with pytest.raises(ValueError, match="top-down"):
        bs.encode_bmp(2, 2, b"\x00" * 4, palette=_PAL, rle=True, top_down=True)


def test_band_row_contract():
    pal = bytes([10, 10, 10, 200, 200, 200])
    idx = (b"\x00" * 8 + b"\x01" * 8) * 4
    p = bs.encode_bmp(16, 4, idx, palette=pal, rle=True)
    assert bs.bmp_gray_band_row(p, 4) == [10, 10, 200, 200]
