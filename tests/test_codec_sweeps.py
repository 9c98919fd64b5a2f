"""Seeded generative sweeps over the round-8 codec family — the same
strategy as the Avro named-type and protobuf presence sweeps: many
random configurations through the full encode→decode chain, with a
rotating subset cross-checked against the canonical JVM codec. All
four formats here are lossless, so every assertion is exact."""

from __future__ import annotations

import random
import struct

import pytest

from datapipeline_scripts_spark.extensions import bmp_stdlib as bs
from datapipeline_scripts_spark.extensions import gif_stdlib as gs
from datapipeline_scripts_spark.extensions import tiff_stdlib as ts
from datapipeline_scripts_spark.extensions import wav_stdlib as ws


def _gray(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000


def _read_rgb(jvm, payload):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
    assert img is not None
    w, h = img.getWidth(), img.getHeight()
    return w, h, [
        ((v >> 16) & 255, (v >> 8) & 255, v & 255)
        for y in range(h)
        for v in (img.getRGB(0, y, w, 1, None, 0, w) or [])
    ]


@pytest.mark.parametrize("seed", range(15))
def test_gif_random_roundtrips(spark, seed):
    rnd = random.Random(1000 + seed)
    w, h = rnd.randint(1, 40), rnd.randint(1, 24)
    ncolors = rnd.choice([2, 3, 4, 7, 16, 64, 200, 256])
    palette = bytes(rnd.randrange(256) for _ in range(3 * ncolors))
    idx = bytes(rnd.randrange(ncolors) for _ in range(w * h))
    interlace = rnd.random() < 0.5
    local = rnd.random() < 0.5
    p = gs.encode_gif(w, h, palette, idx, interlace=interlace, local_table=local)
    lut = [_gray(palette[3 * i], palette[3 * i + 1], palette[3 * i + 2]) for i in range(ncolors)]
    assert gs.gif_decode_gray(p) == (w, h, bytearray(lut[i] for i in idx))
    # canonical cross-check subset; interlaced heights 2-4 excluded —
    # the JDK reader consumes a phantom pass-2 row there (see
    # test_gif_interlace_small_height_jdk_deviation)
    if seed % 3 == 0 and w * h <= 300 and not (interlace and h < 5):
        iw, ih, pix = _read_rgb(spark._jvm, p)
        assert (iw, ih) == (w, h)
        assert pix == [tuple(palette[3 * i : 3 * i + 3]) for i in idx]


def test_gif_interlace_small_height_jdk_deviation(spark):
    """Pins a measured JDK ImageIO deviation from GIF89a Appendix E:
    for interlaced heights 2-4 the JDK reader consumes one stream row
    for pass 2 (start row 4) even though that pass is empty, shifting
    every later row and leaving the last target as the pass-1
    progressive fill. Our codec follows the spec (pass 2 contributes
    zero rows below height 5) — the agreement at EVERY height ≥ 5 in
    the sweep above is what localizes the deviation to the JDK. This
    test documents the decision to keep the spec behavior: if a JDK
    ever fixes it, the assertions below flip and this test will say
    so loudly."""
    jvm = spark._jvm
    palette = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40])
    w, h = 8, 3  # our spec order writes rows [0, 2, 1]
    idx = bytes([r for r in range(h) for _ in range(w)])
    p = gs.encode_gif(w, h, palette, idx, interlace=True)
    # our decoder: spec row placement, bit-exact
    lut = [_gray(*palette[3 * i : 3 * i + 3]) for i in range(4)]
    assert gs.gif_decode_gray(p) == (w, h, bytearray(lut[i] for i in idx))
    # the JDK reader: row 1's stream data was burned on phantom y=4,
    # so y1 keeps the pass-1 replication of row 0 and y2 gets what
    # belongs to y1 (stream row 3)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(p))
    got = [img.getRGB(0, y) & 0xFFFFFF for y in range(h)]
    assert got == [0x0A0000, 0x0A0000, 0x001400]


@pytest.mark.parametrize("seed", range(16))
def test_tiff_random_roundtrips(spark, seed):
    rnd = random.Random(2000 + seed)
    w, h = rnd.randint(1, 40), rnd.randint(1, 24)
    rgb = rnd.random() < 0.5
    comp = rnd.choice([1, 5, 8, 32773])
    pred = comp in (5, 8) and rnd.random() < 0.5
    rps = rnd.choice([None, 1, 2, 3, 7])
    be = rnd.random() < 0.5
    spp = 3 if rgb else 1
    data = bytes(rnd.randrange(256) for _ in range(w * h * spp))
    p = ts.encode_tiff(
        w, h, data, rgb=rgb, compression=comp, predictor=pred,
        rows_per_strip=rps, big_endian=be,
    )
    if rgb:
        expect = bytearray(
            _gray(data[3 * i], data[3 * i + 1], data[3 * i + 2]) for i in range(w * h)
        )
    else:
        expect = bytearray(data)
    assert ts.tiff_decode_gray(p) == (w, h, expect)
    if seed % 4 == 0 and w * h <= 300:
        jvm = spark._jvm
        if rgb:
            iw, ih, pix = _read_rgb(jvm, p)
            assert (iw, ih) == (w, h)
            assert pix == [tuple(data[3 * i : 3 * i + 3]) for i in range(w * h)]
        else:
            img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(p))
            r = img.getRaster()
            got = bytes(r.getSample(x, y, 0) for y in range(h) for x in range(w))
            assert got == data


@pytest.mark.parametrize("seed", range(10))
def test_bmp_random_roundtrips(spark, seed):
    rnd = random.Random(3000 + seed)
    w, h = rnd.randint(1, 40), rnd.randint(1, 24)
    paletted = rnd.random() < 0.5
    if paletted:
        ncolors = rnd.choice([2, 5, 16, 256])
        palette = bytes(rnd.randrange(256) for _ in range(3 * ncolors))
        idx = bytes(rnd.randrange(ncolors) for _ in range(w * h))
        rle = rnd.random() < 0.5
        p = bs.encode_bmp(w, h, idx, palette=palette, rle=rle)
        lut = [
            _gray(palette[3 * i], palette[3 * i + 1], palette[3 * i + 2])
            for i in range(ncolors)
        ]
        expect = bytearray(lut[i] for i in idx)
        rgb_expect = [tuple(palette[3 * i : 3 * i + 3]) for i in idx]
    else:
        data = bytes(rnd.randrange(256) for _ in range(3 * w * h))
        p = bs.encode_bmp(w, h, data, top_down=rnd.random() < 0.5)
        expect = bytearray(
            _gray(data[3 * i], data[3 * i + 1], data[3 * i + 2]) for i in range(w * h)
        )
        rgb_expect = [tuple(data[3 * i : 3 * i + 3]) for i in range(w * h)]
    assert bs.bmp_decode_gray(p) == (w, h, expect)
    if seed % 3 == 0 and w * h <= 300:
        iw, ih, pix = _read_rgb(spark._jvm, p)
        assert (iw, ih) == (w, h)
        assert pix == rgb_expect


@pytest.mark.parametrize("seed", range(12))
def test_wav_random_roundtrips(spark, seed):
    rnd = random.Random(4000 + seed)
    bits = rnd.choice([8, 16, 24, 32])
    channels = rnd.randint(1, 4)
    n_frames = rnd.randint(1, 200)
    rate = rnd.choice([8000, 16000, 44100, 48000])
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    s = [rnd.randint(lo, hi) for _ in range(n_frames * channels)]
    p = ws.encode_wav(channels, rate, bits, s)
    assert ws.wav_info(p) == (channels, rate, bits, n_frames)
    assert ws.wav_decode(p) == (channels, rate, bits, s)
    ch, rt, nf, peak, energy = ws.wav_features(p)
    assert peak == max(abs(v) for v in s)
    assert energy == sum(v * v for v in s)
    if seed % 3 == 0:  # canonical reader cross-check subset
        jvm = spark._jvm
        ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
            jvm.java.io.ByteArrayInputStream(p)
        )
        f = ais.getFormat()
        assert (f.getChannels(), int(f.getSampleRate()), f.getSampleSizeInBits()) == (
            channels, rate, bits,
        )
        assert ais.getFrameLength() == n_frames
        raw = bytes(ais.readAllBytes())
        for cc, start, size in ws._chunks(p):
            if cc == b"data":
                assert raw == p[start : start + size]
                break


@pytest.mark.parametrize("seed", range(8))
def test_tiff_tiled_and_bilevel_random(spark, seed):
    """Round-8 late TIFF additions under the same sweep discipline:
    random geometries through ImageIO's tiled writer (partial edge
    tiles everywhere) and random bilevel rasters, every codec."""
    jvm = spark._jvm
    rnd = random.Random(5000 + seed)
    BI = jvm.java.awt.image.BufferedImage
    w, h = rnd.randint(3, 50), rnd.randint(3, 40)
    ctype = rnd.choice([None, "LZW", "Deflate", "PackBits"])
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    wr = it.next()
    prm = wr.getDefaultWriteParam()
    if ctype is not None:
        prm.setCompressionMode(2)
        prm.setCompressionType(ctype)
    if seed % 2 == 0:  # tiled 8-bit gray
        img = BI(w, h, BI.TYPE_BYTE_GRAY)
        r = img.getRaster()
        vals = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
        for y in range(h):
            for x in range(w):
                r.setSample(x, y, 0, vals[y][x])
        prm.setTilingMode(2)
        prm.setTiling(16, 16, 0, 0)
    else:  # bilevel (strip or tiled)
        img = BI(w, h, BI.TYPE_BYTE_BINARY)
        r = img.getRaster()
        vals = [[rnd.randrange(2) for _ in range(w)] for _ in range(h)]
        for y in range(h):
            for x in range(w):
                r.setSample(x, y, 0, int(vals[y][x]))
        if seed % 4 == 1:
            prm.setTilingMode(2)
            prm.setTiling(16, 16, 0, 0)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), prm)
    wr.dispose()
    ios.close()
    p = bytes(baos.toByteArray())
    dw, dh, gray = ts.tiff_decode_gray(p)
    assert (dw, dh) == (w, h)
    if seed % 2 == 0:
        assert list(gray) == [vals[y][x] for y in range(h) for x in range(w)]
    else:
        assert list(gray) == [255 * vals[y][x] for y in range(h) for x in range(w)]
