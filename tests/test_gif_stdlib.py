"""GIF stdlib codec vs the canonical JVM ImageIO GIF plugin — the
same both-directions strategy as the PNG/JPEG/Avro/protobuf tiers:
files our encoder writes must decode bit-identically in ImageIO, and
files ImageIO writes must decode bit-identically here. GIF is
lossless, so every bound in this file is exact equality — any ±1
would be a real bug, not codec latitude."""

from __future__ import annotations

import random
import struct

import pytest

from datapipeline_scripts_spark.extensions import gif_stdlib as gs


def _gray(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000


def _expected_gray(palette, indices):
    lut = [
        _gray(palette[3 * i], palette[3 * i + 1], palette[3 * i + 2])
        for i in range(len(palette) // 3)
    ]
    return bytearray(lut[i] for i in indices)


def _imageio_read_rgb(jvm, payload: bytes):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    assert img is not None, "ImageIO refused the GIF"
    w, h = img.getWidth(), img.getHeight()
    return w, h, [
        ((v >> 16) & 255, (v >> 8) & 255, v & 255)
        for y in range(h)
        for v in (img.getRGB(0, y, w, 1, None, 0, w) or [])
    ]


def _imageio_write_gray_gif(jvm, w, h, fn) -> bytes:
    """TYPE_BYTE_GRAY via raster samples (setRGB would sRGB→linear
    convert), encoded by the canonical GIF writer."""
    BI = jvm.java.awt.image.BufferedImage
    img = BI(w, h, BI.TYPE_BYTE_GRAY)
    r = img.getRaster()
    for y in range(h):
        for x in range(w):
            r.setSample(x, y, 0, fn(x, y))
    baos = jvm.java.io.ByteArrayOutputStream()
    ok = jvm.javax.imageio.ImageIO.write(img, "gif", baos)
    assert ok, "no GIF writer available"
    return bytes(baos.toByteArray())


_PAL4 = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 12, 34, 250])


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local_table", [False, True])
def test_roundtrip_small_palette(interlace, local_table):
    w, h = 13, 7  # odd dims: interlace passes 2-4 hit ragged row sets
    rnd = random.Random(42)
    idx = bytes(rnd.randrange(4) for _ in range(w * h))
    p = gs.encode_gif(w, h, _PAL4, idx, interlace=interlace, local_table=local_table)
    assert gs.is_gif(p)
    assert gs.gif_size(p) == (w, h)
    dw, dh, gray = gs.gif_decode_gray(p)
    assert (dw, dh) == (w, h)
    assert gray == _expected_gray(_PAL4, idx)


def test_roundtrip_256_color_noise_forces_width_growth_and_clear():
    """120×120 of 256-color noise: the LZW dictionary climbs through
    every code width to 12 bits, fills at 4096, and the encoder emits a
    mid-stream CLEAR — the paths a tiny fixture never reaches."""
    w = h = 120
    rnd = random.Random(7)
    palette = bytes(rnd.randrange(256) for _ in range(3 * 256))
    idx = bytes(rnd.randrange(256) for _ in range(w * h))
    p = gs.encode_gif(w, h, palette, idx)
    dw, dh, gray = gs.gif_decode_gray(p)
    assert (dw, dh) == (w, h)
    assert gray == _expected_gray(palette, idx)


def test_roundtrip_kwkwk_sequence():
    """abababab… is the classic KwKwK stream: the decoder must resolve
    a code equal to its next free slot from the previous entry."""
    idx = bytes([0, 1] * 32)[:63]
    p = gs.encode_gif(63, 1, _PAL4, idx)
    assert gs.gif_decode_gray(p)[2] == _expected_gray(_PAL4, idx)


def test_roundtrip_single_pixel_and_flat():
    p = gs.encode_gif(1, 1, _PAL4, b"\x03")
    assert gs.gif_decode_gray(p) == (1, 1, _expected_gray(_PAL4, b"\x03"))
    flat = bytes(64) * 8  # one repeated symbol: longest-match chains
    p = gs.encode_gif(64, 8, _PAL4, flat)
    assert gs.gif_decode_gray(p)[2] == _expected_gray(_PAL4, flat)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local_table", [False, True])
def test_our_encoder_bit_exact_in_imageio(spark, interlace, local_table):
    """Canonical-decoder direction: ImageIO must read our files to the
    exact palette colors — interlaced, local-table, and ragged dims."""
    jvm = spark._jvm
    w, h = 21, 10
    rnd = random.Random(interlace * 2 + local_table)
    idx = bytes(rnd.randrange(4) for _ in range(w * h))
    p = gs.encode_gif(w, h, _PAL4, idx, interlace=interlace, local_table=local_table)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    assert (iw, ih) == (w, h)
    expect = [tuple(_PAL4[3 * i : 3 * i + 3]) for i in idx]
    assert pix == expect


def test_our_encoder_bit_exact_in_imageio_256_noise(spark):
    """Same direction at full dictionary stress: width growth to 12
    bits and the mid-stream CLEAR must read back exactly in ImageIO."""
    jvm = spark._jvm
    w = h = 120
    rnd = random.Random(11)
    palette = bytes(rnd.randrange(256) for _ in range(3 * 256))
    idx = bytes(rnd.randrange(256) for _ in range(w * h))
    p = gs.encode_gif(w, h, palette, idx)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    assert (iw, ih) == (w, h)
    expect = [tuple(palette[3 * i : 3 * i + 3]) for i in idx]
    assert pix == expect


def test_imageio_writer_bit_exact_here(spark):
    """Canonical-encoder direction: a gradient the JVM writer encodes
    decodes here to exactly what ImageIO itself reads back."""
    jvm = spark._jvm
    w, h = 37, 23
    p = _imageio_write_gray_gif(jvm, w, h, lambda x, y: (x * 7 + y * 11) % 256)
    assert gs.is_gif(p)
    iw, ih, pix = _imageio_read_rgb(jvm, p)
    dw, dh, gray = gs.gif_decode_gray(p)
    assert (dw, dh) == (iw, ih) == (w, h)
    assert list(gray) == [_gray(r, g, b) for r, g, b in pix]


def test_gif_size_and_first_frame_of_animation():
    """Two image blocks in one stream: gif_size reads the logical
    screen, decode returns the FIRST frame only."""
    rnd = random.Random(3)
    idx1 = bytes(rnd.randrange(4) for _ in range(8 * 8))
    idx2 = bytes(rnd.randrange(4) for _ in range(8 * 8))
    p1 = gs.encode_gif(8, 8, _PAL4, idx1)
    p2 = gs.encode_gif(8, 8, _PAL4, idx2)
    sep = p2.index(0x2C, 13 + 3 * 4)
    animated = p1[:-1] + p2[sep:]  # strip trailer, append frame 2
    assert gs.gif_size(animated) == (8, 8)
    assert gs.gif_decode_gray(animated)[2] == _expected_gray(_PAL4, idx1)


def test_extensions_are_skipped():
    idx = bytes([1, 2, 3, 0])
    p = gs.encode_gif(2, 2, _PAL4, idx)
    # splice a Graphic Control Extension before the image descriptor
    sep = p.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = p[:sep] + gce + p[sep:]
    assert gs.gif_decode_gray(spliced)[2] == _expected_gray(_PAL4, idx)


def test_corruption_is_loud():
    idx = bytes([0, 1, 2, 3])
    p = gs.encode_gif(2, 2, _PAL4, idx)
    with pytest.raises(ValueError, match="signature"):
        gs.gif_decode_gray(b"NOTGIF" + p[6:])
    with pytest.raises(ValueError):
        gs.gif_decode_gray(p[: len(p) // 2])  # truncated mid-stream
    # no color table at all: GCT flag off, no LCT on the image
    lct = gs.encode_gif(2, 2, _PAL4, idx, local_table=True)
    sep = lct.index(0x2C, 13)
    ipacked = lct[sep + 9]
    stripped = lct[: sep + 9] + bytes([ipacked & 0x3F]) + lct[sep + 10 + 12 :]
    with pytest.raises(ValueError, match="color table"):
        gs.gif_decode_gray(stripped)


def test_encoder_validations():
    with pytest.raises(ValueError, match="palette"):
        gs.encode_gif(2, 2, b"\x00\x00", b"\x00" * 4)
    with pytest.raises(ValueError, match="indices"):
        gs.encode_gif(2, 2, _PAL4, b"\x00" * 3)
    with pytest.raises(ValueError, match="beyond palette"):
        gs.encode_gif(2, 2, _PAL4, bytes([0, 1, 2, 9]))


def test_band_row_contract():
    """Box-average bands match the PNG/JPEG band-row family: left and
    right halves of a two-tone image average to their palette grays."""
    pal = bytes([10, 10, 10, 200, 200, 200])
    idx = (b"\x00" * 8 + b"\x01" * 8) * 4
    p = gs.encode_gif(16, 4, pal, idx)
    assert gs.gif_gray_band_row(p, 4) == [10, 10, 200, 200]
