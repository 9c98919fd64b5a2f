"""Pure-stdlib GIF87a/89a codec — the third leg of the in-container
real-image-decode family (`png_stdlib.py`, `jpeg_stdlib.py`).

GIF is the last of the three classic web-corpus raster formats a
crawled multimodal pipeline actually meets at volume, and — like PNG,
unlike JPEG — it is LOSSLESS, so every decode here is bit-exact by
construction: palette-indexed pixels through GIF's LZW variant
(LSB-first variable-width codes, 3..12 bits, clear/EOI, deferred-clear
tolerated) with optional Adam-style 4-pass interlacing. The decoder
reads the FIRST image of a stream (animation frames beyond the first
are out of scope for dims/fingerprint extraction and skipped), honors
local-over-global color tables, and converts palette RGB to grayscale
with the same integer BT.601 form the PNG/JPEG paths use
(`(299r + 587g + 114b) // 1000`) so one dHash family covers all three
formats.

The ENCODER exists for the same reason `encode_gray_baseline` does in
jpeg_stdlib: fixture generation that any spec decoder must read
bit-identically. Its LZW side steps a simulation of the *decoder's*
code-width counter (the decoder lags the encoder's dictionary by
exactly one entry, so deriving the width from the decoder's counter —
not the encoder's — is what makes the stream canonical), emitting a
CLEAR whenever the dictionary fills. Cross-proofs in
tests/test_gif_stdlib.py run both directions against the JVM's
canonical ImageIO GIF plugin: our files decode bit-identically there,
and ImageIO-written files decode bit-identically here. One measured
exception, pinned in tests/test_codec_sweeps.py: the JDK reader
deviates from GIF89a Appendix E for INTERLACED images of height 2-4
(it consumes a phantom pass-2 row); this codec keeps the spec
behavior — pass 2 contributes zero rows below height 5 — and agrees
with ImageIO at every height ≥ 5.

Reference parity: the reference treats media as opaque binary columns
(SURVEY.md §2.E4); this codec is what lets the Spark-side real-decode
path (`extensions/multimodal.py`) produce true dimensions and
fingerprints for GIF payloads on every worker with no third-party
image library, fleet-deterministically.

Scope refusals are loud: no color table, truncated LZW, or a
malformed descriptor raise ValueError — never a silently wrong pixel.
"""

from __future__ import annotations

import struct

_SIGS = (b"GIF87a", b"GIF89a")

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


def is_gif(payload: bytes) -> bool:
    return bytes(payload[:6]) in _SIGS


def gif_size(payload: bytes) -> tuple[int, int]:
    """(width, height) from the Logical Screen Descriptor — after
    validating the BLOCK FRAMING (color-table sizes, extension and
    image-data sub-block chains, a reachable image descriptor). The
    walk never entropy-decodes, so it stays O(file/255), but it is
    what separates a real GIF from arbitrary bytes behind a six-byte
    signature: `jpeg_size` gets this for free from the SOF scan, GIF
    needs the walk."""
    if not is_gif(payload):
        raise ValueError("not a GIF (bad signature)")
    payload = bytes(payload)
    if len(payload) < 13:
        raise ValueError("corrupt GIF: truncated logical screen descriptor")
    w, h = struct.unpack_from("<HH", payload, 6)
    pos = 13
    if payload[10] & 0x80:
        pos += 3 * (2 << (payload[10] & 0x07))
    images = 0
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= len(payload):
                raise ValueError("corrupt GIF: truncated extension")
            pos = _skip_subblocks(payload, pos + 1)
        elif block == _IMAGE_SEP:
            if pos + 9 > len(payload):
                raise ValueError("corrupt GIF: truncated image descriptor")
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos = _skip_subblocks(payload, pos + 1)  # +1 skips the LZW mcs
            images += 1
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
    if not images:
        raise ValueError("corrupt GIF: no image descriptor")
    return w, h


def _read_color_table(payload: bytes, pos: int, packed: int) -> tuple[bytes, int]:
    n = 2 << (packed & 0x07)
    table = payload[pos : pos + 3 * n]
    if len(table) < 3 * n:
        raise ValueError("corrupt GIF: truncated color table")
    return table, pos + 3 * n


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: unterminated sub-block chain")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln


def _collect_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: unterminated image data")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        parts.append(payload[pos : pos + ln])
        if len(parts[-1]) < ln:
            raise ValueError("corrupt GIF: truncated image data sub-block")
        pos += ln


def _lzw_decode(mcs: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW: LSB-first variable-width codes. Emits exactly
    `expected` indices; tolerates deferred clears (frozen dictionary at
    4096 entries) and trailing padding after the EOI code."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"corrupt GIF: LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    # dictionary: code -> decoded byte string; roots are single indices
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    prev_entry: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("corrupt GIF: LZW data ended before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = mcs + 1
            prev_entry = None
            continue
        if code == eoi:
            break
        if prev_entry is None:
            if code >= clear:
                raise ValueError("corrupt GIF: first LZW code is not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev_entry + prev_entry[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF: LZW code beyond dictionary")
        if prev_entry is not None and len(table) < 4096:
            table.append(prev_entry + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out += entry
        prev_entry = entry
        if len(out) >= expected:
            # spec: an EOI should follow; some writers pad — stop here
            break
    if len(out) < expected:
        raise ValueError(
            f"corrupt GIF: LZW stream decoded {len(out)} of {expected} pixels"
        )
    del out[expected:]
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_row_order(height: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES for y in range(start, height, step)]


def gif_decode_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """Full decode of the first frame → (width, height, row-major 8-bit
    grayscale). The frame is composed onto a canvas of the logical
    screen size, background-filled, so partial-canvas frames land at
    their declared offset."""
    payload = bytes(payload)
    w, h = gif_size(payload)
    if len(payload) < 13:
        raise ValueError("corrupt GIF: truncated header")
    # header layout: 0-5 signature, 6-9 w/h, 10 packed, 11 bg, 12 aspect
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = b""
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, packed)

    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            raise ValueError("corrupt GIF: no image data before trailer")
        if block == _EXTENSION:
            if pos >= len(payload):
                raise ValueError("corrupt GIF: truncated extension")
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("corrupt GIF: truncated image descriptor")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
            raise ValueError("corrupt GIF: image descriptor outside canvas")
        lct = b""
        if ipacked & 0x80:
            lct, pos = _read_color_table(payload, pos, ipacked)
        palette = lct or gct
        if not palette:
            raise ValueError("corrupt GIF: image has neither local nor global color table")
        if pos >= len(payload):
            raise ValueError("corrupt GIF: missing LZW min code size")
        mcs = payload[pos]
        data, pos = _collect_subblocks(payload, pos + 1)
        indices = _lzw_decode(mcs, data, iw * ih)

        ncolors = len(palette) // 3
        gray_lut = bytes(
            (299 * palette[3 * i] + 587 * palette[3 * i + 1] + 114 * palette[3 * i + 2])
            // 1000
            for i in range(ncolors)
        )
        hi = max(indices)
        if hi >= ncolors:
            raise ValueError("corrupt GIF: pixel index beyond color table")

        if gct and bg_index < len(gct) // 3:
            p3 = 3 * bg_index
            bg_gray = (299 * gct[p3] + 587 * gct[p3 + 1] + 114 * gct[p3 + 2]) // 1000
        else:
            bg_gray = 0
        canvas = bytearray([bg_gray]) * (w * h)

        rows = _interlaced_row_order(ih) if ipacked & 0x40 else range(ih)
        for src_y, dst_y in enumerate(rows):
            row = indices[src_y * iw : (src_y + 1) * iw]
            off = (top + dst_y) * w + left
            canvas[off : off + iw] = bytes(map(gray_lut.__getitem__, row))
        return w, h, canvas


def gif_gray_band_row(payload: bytes, n: int) -> list[int]:
    """Decode and box-average into an n-pixel row — same area-true
    downscale as `png_gray_band_row` / `jpeg_gray_band_row`, feeding
    the shared difference hash."""
    w, h, gray = gif_decode_gray(payload)
    if w == 0 or h == 0:
        return [0] * n
    out = []
    for k in range(n):
        x0 = k * w // n
        x1 = max((k + 1) * w // n, x0 + 1)
        total = 0
        for y in range(h):
            row = y * w
            total += sum(gray[row + x0 : row + x1])
        out.append(total // ((x1 - x0) * h))
    return out


# ---------------------------------------------------------------------------
# Encoder — single-frame GIF89a from an explicit palette + index raster.
# ---------------------------------------------------------------------------


class _LZWWriter:
    """LSB-first bit packer whose code width follows the DECODER's
    counter: the decoder adds its (i-1)-th dictionary entry upon
    reading the i-th post-clear code and widens when that counter hits
    1<<width, so the encoder derives the width for code i+1 from that
    same counter — one behind its own dictionary — making the stream
    readable by any spec decoder."""

    def __init__(self, mcs: int):
        self.mcs = mcs
        self.clear = 1 << mcs
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self.width = mcs + 1
        self.dec_free = self.eoi + 1
        self.codes_since_clear = 0

    def _put(self, code: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += self.width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def emit(self, code: int) -> None:
        self._put(code)
        self.codes_since_clear += 1
        if self.codes_since_clear >= 2 and self.dec_free < 4096:
            self.dec_free += 1
            if self.dec_free == (1 << self.width) and self.width < 12:
                self.width += 1

    def emit_clear(self) -> None:
        self._put(self.clear)
        self.width = self.mcs + 1
        self.dec_free = self.eoi + 1
        self.codes_since_clear = 0

    def finish(self) -> bytes:
        self._put(self.eoi)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(mcs: int, indices) -> bytes:
    w = _LZWWriter(mcs)
    w.emit_clear()
    d: dict[tuple[int, int], int] = {}
    enc_next = w.eoi + 1
    prev = indices[0]
    for k in indices[1:]:
        key = (prev, k)
        nxt = d.get(key)
        if nxt is not None:
            prev = nxt
            continue
        w.emit(prev)
        if enc_next < 4096:
            d[key] = enc_next
            enc_next += 1
        else:
            w.emit_clear()
            d.clear()
            enc_next = w.eoi + 1
        prev = k
    w.emit(prev)
    return w.finish()


def encode_gif(
    width: int,
    height: int,
    palette: bytes,
    indices,
    *,
    interlace: bool = False,
    local_table: bool = False,
) -> bytes:
    """Single-frame GIF89a. `palette` is packed RGB triples (length a
    multiple of 3, 2..256 entries — padded to the next power of two as
    the wire format requires); `indices` is the row-major top-to-bottom
    raster (the encoder reorders rows itself when `interlace`).
    `local_table` ships the palette as the image's local color table
    (no global one) to exercise that decode path."""
    if width <= 0 or height <= 0:
        raise ValueError("empty image")
    if len(palette) % 3 or not 2 <= len(palette) // 3 <= 256:
        raise ValueError("palette must hold 2..256 RGB triples")
    ncolors = len(palette) // 3
    indices = bytes(indices)
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, got {len(indices)}")
    if max(indices) >= ncolors:
        raise ValueError("pixel index beyond palette")

    size_bits = max(1, (ncolors - 1).bit_length())
    padded = palette + b"\x00" * (3 * ((1 << size_bits) - ncolors))
    mcs = max(2, size_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    if local_table:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | ((size_bits - 1) << 4) | (size_bits - 1), 0, 0])
        out += padded

    out.append(_IMAGE_SEP)
    out += struct.pack("<HHHH", 0, 0, width, height)
    ipacked = (0x40 if interlace else 0x00) | (0x80 | (size_bits - 1) if local_table else 0x00)
    out.append(ipacked)
    if local_table:
        out += padded

    if interlace:
        raster = bytearray()
        for y in _interlaced_row_order(height):
            raster += indices[y * width : (y + 1) * width]
        indices = bytes(raster)

    out.append(mcs)
    data = _lzw_encode(mcs, indices)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(_TRAILER)
    return bytes(out)
