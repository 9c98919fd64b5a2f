"""Pure-stdlib AVI container demuxer/muxer for MJPEG video — the
VIDEO leg of the in-container real-decode family. A crawled corpus's
video needs two separable capabilities: DEMUX (split the container
into frames) and per-frame DECODE. This module does the first for
the simplest real container (AVI is RIFF — the same chunk discipline
`wav_stdlib` already walks) and delegates the second to
`jpeg_stdlib` for the Motion-JPEG case, where every frame is a
standalone baseline JPEG.

Proof posture, stated honestly: this container has NO canonical
implementation inside this container (ImageIO and javax.sound do not
read AVI), so the muxer/demuxer pair is proven by roundtrip plus
spec-pinned golden bytes — one tier weaker than the
both-directions-vs-canonical standard of the other codecs. The
FRAMES, however, keep the canonical proof: every payload
`avi_frames` extracts from our muxer's output is a baseline JPEG
that the JVM's ImageIO decodes bit-identically
(tests/test_avi_stdlib.py runs exactly that, frame by frame), and
the pixel path in production is the ImageIO-cross-proven
`jpeg_stdlib` decoder. Nothing silent: non-vids-first files,
non-MJPG handlers and malformed chunk chains refuse loudly.

Scale shape: demux is a sequential O(file) chunk walk per payload —
embarrassingly parallel across documents inside `mapInPandas`, the
same worker-side unit as the image codecs; frame decode then fans
out per frame. Reference parity: SURVEY.md §2.E4's frame-sample
operator (`multimodal_frames`) — this module is what turns its
deterministic-fake frame source into a real one for MJPEG payloads.
"""

from __future__ import annotations

import struct

from datapipeline_scripts_spark.extensions import jpeg_stdlib


def is_avi(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"AVI "
    )


def _chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) between pos and end —
    LIST chunks yield their list-type as fourcc `LIST:xxxx`."""
    while pos + 8 <= end:
        cc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if start + size > end:
            raise ValueError(f"corrupt AVI: chunk {cc!r} beyond its parent")
        yield cc, start, size
        pos = start + size + (size & 1)


def avi_info(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """(width, height, n_frames, us_per_frame, handler fourcc) from
    the avih/strh headers of the first video stream."""
    payload = bytes(payload)
    if not is_avi(payload):
        raise ValueError("not an AVI (bad RIFF signature)")
    avih = None
    handler = None
    for cc, start, size in _chunks(payload, 12, len(payload)):
        if cc != b"LIST" or payload[start : start + 4] != b"hdrl":
            continue
        for c2, s2, z2 in _chunks(payload, start + 4, start + size):
            if c2 == b"avih":
                if z2 < 40:
                    raise ValueError("corrupt AVI: avih too small")
                avih = struct.unpack_from("<10I", payload, s2)
            elif c2 == b"LIST" and payload[s2 : s2 + 4] == b"strl" and handler is None:
                for c3, s3, z3 in _chunks(payload, s2 + 4, s2 + z2):
                    if c3 == b"strh":
                        if z3 < 8:
                            raise ValueError("corrupt AVI: strh too small")
                        if payload[s3 : s3 + 4] != b"vids":
                            raise NotImplementedError(
                                "AVI first stream is not video (vids)"
                            )
                        handler = payload[s3 + 4 : s3 + 8]
        break
    if avih is None or handler is None:
        raise ValueError("corrupt AVI: missing avih/strh headers")
    us_per_frame, _, _, _, n_frames, _, _, _, width, height = avih
    return width, height, n_frames, us_per_frame, bytes(handler)


def avi_frame_spans(payload: bytes) -> list[tuple[int, int]]:
    """(byte_offset, size) of each stream-0 frame body ('00dc'/'00db'
    chunks) within the payload, in movi order — the zero-copy index a
    frame-sampling operator slices from."""
    payload = bytes(payload)
    if not is_avi(payload):
        raise ValueError("not an AVI (bad RIFF signature)")
    spans: list[tuple[int, int]] = []
    seen_movi = False
    for cc, start, size in _chunks(payload, 12, len(payload)):
        if cc == b"LIST" and payload[start : start + 4] == b"movi":
            seen_movi = True
            for c2, s2, z2 in _chunks(payload, start + 4, start + size):
                if c2 in (b"00dc", b"00db"):
                    spans.append((s2, z2))
    if not seen_movi:
        raise ValueError("corrupt AVI: no movi list")
    return spans


def avi_frames(payload: bytes) -> list[bytes]:
    """The stream-0 frame payloads in movi order. For an MJPG handler
    each element is a standalone baseline JPEG decodable by
    `jpeg_stdlib`."""
    payload = bytes(payload)
    return [payload[s : s + z] for s, z in avi_frame_spans(payload)]


def avi_decode_frame_gray(payload: bytes, index: int) -> tuple[int, int, bytearray]:
    """Decode one MJPEG frame to grayscale through the production
    JPEG path — the per-frame unit `multimodal` feature extraction
    parallelizes over."""
    w, h, n, _, handler = avi_info(payload)
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI codec {handler!r} not supported (MJPG only); "
            "re-encode or install a real media stack"
        )
    frames = avi_frames(payload)
    if not 0 <= index < len(frames):
        raise ValueError(f"frame {index} out of range ({len(frames)} frames)")
    fw, fh, gray = jpeg_stdlib.jpeg_decode_gray(frames[index])
    if (fw, fh) != (w, h):
        raise ValueError(
            f"corrupt AVI: frame {index} is {fw}x{fh}, header says {w}x{h}"
        )
    return fw, fh, gray


def encode_avi_mjpeg(
    width: int,
    height: int,
    jpeg_frames: list[bytes],
    us_per_frame: int = 40000,
) -> bytes:
    """Minimal single-stream MJPEG AVI: RIFF(AVI )[LIST hdrl[avih,
    LIST strl[strh, strf]], LIST movi[00dc…], idx1]. Every element of
    `jpeg_frames` must already be a complete JPEG (e.g. from
    `jpeg_stdlib.encode_gray_baseline`)."""
    if width <= 0 or height <= 0:
        raise ValueError("empty frame size")
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    for i, f in enumerate(jpeg_frames):
        if not jpeg_stdlib.is_jpeg(f):
            raise ValueError(f"frame {i} is not a JPEG")

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<10I4I",
        us_per_frame,
        0,
        0,
        0x10,  # AVIF_HASINDEX
        n,
        0,
        1,
        max_bytes,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids",
        b"MJPG",
        0,
        0,
        0,
        0,
        us_per_frame,   # scale; rate/scale = fps
        1_000_000,      # rate: 1e6/us_per_frame frames per second

        0,
        n,
        max_bytes,
        0xFFFFFFFF,
        0,
        0,
        0,
        width,
        height,
    )
    strf = struct.pack(
        "<IiihhIIiiII",
        40,
        width,
        height,
        1,
        24,
        0x47504A4D,  # 'MJPG' as a BI compression fourcc
        width * height * 3,
        0,
        0,
        0,
        0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx_entries = []
    for f in jpeg_frames:
        idx_entries.append((len(movi_body) - 4, len(f)))  # offset from 'movi' tag
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off + 4, size) for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body
