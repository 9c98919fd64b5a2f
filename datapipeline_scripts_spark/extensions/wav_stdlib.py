"""Pure-stdlib WAV (RIFF/PCM) codec — the AUDIO leg of the
in-container real-decode family, beside the five raster codecs. A
crawled multimodal corpus's audio overwhelmingly arrives as PCM WAV
(or is transcoded to it at ingest), and PCM is exact integers end to
end, so — like GIF/TIFF/BMP — every proof here is exact equality.

Scope: canonical RIFF/WAVE streams with a `fmt ` chunk of format 1
(integer PCM), 8-bit unsigned / 16-bit / 24-bit / 32-bit signed
little-endian samples, any channel count, unknown chunks (LIST, fact,
cue …) skipped by the spec's size-walk (incl. the odd-size pad
byte). IEEE-float (3), A-law/µ-law (6/7) and WAVE_FORMAT_EXTENSIBLE
(0xFFFE) refuse loudly by name, never decoding to wrong integers.

Decoded samples are SIGNED integers at native width (8-bit unsigned
is re-centered by −128, per the format's own convention), so
downstream feature math (peak, energy) is integer-exact and
fleet-deterministic. `wav_features` returns the exact integers a
DuckDB oracle can recompute: frame count, per-file peak |sample| and
the energy sum Σ s² (no sqrt — callers needing RMS do the final
division/root where approximation is acceptable; the driver-checked
quantities stay exact).

The ENCODER writes the same profile. tests/test_wav_stdlib.py proves
both directions against the JVM's canonical `javax.sound.sampled`
WAV reader/writer (AudioSystem), byte-for-byte on the PCM payload.

Reference parity: the reference treats media as opaque binary
columns (SURVEY.md §2.E4); this codec gives the Spark-side
real-decode path true audio metadata and exact signal features with
no third-party audio library.
"""

from __future__ import annotations

import struct


def is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"WAVE"
    )


def _chunks(payload: bytes):
    """Yield (fourcc, start, size) walking the RIFF chunk list."""
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if start + size > n:
            raise ValueError(f"corrupt WAV: chunk {cc!r} beyond file")
        yield cc, start, size
        pos = start + size + (size & 1)  # chunks are word-aligned


def wav_info(payload: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits_per_sample, n_frames) from the
    fmt/data chunks — header-only, no sample decode."""
    payload = bytes(payload)
    if not is_wav(payload):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    fmt = None
    data_size = None
    for cc, start, size in _chunks(payload):
        if cc == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("corrupt WAV: fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHH", payload, start)
        elif cc == b"data" and data_size is None:
            data_size = size
    if fmt is None or data_size is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if channels == 0 or bits == 0:
        raise ValueError("corrupt WAV: zero channels or bit depth")
    expect_align = channels * ((bits + 7) // 8)
    if block_align not in (0, expect_align):
        raise ValueError(
            f"corrupt WAV: block align {block_align} != channels×width {expect_align}"
        )
    if audio_format != 1:
        names = {3: "IEEE float", 6: "A-law", 7: "mu-law", 0xFFFE: "extensible"}
        raise NotImplementedError(
            f"WAV format {names.get(audio_format, audio_format)} not supported "
            "by the stdlib decoder (integer PCM only)"
        )
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"WAV bit depth {bits} not supported")
    return channels, rate, bits, data_size // expect_align


def wav_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Full decode → (channels, sample_rate, bits, interleaved signed
    samples). 8-bit streams are stored unsigned and re-centered here."""
    payload = bytes(payload)
    channels, rate, bits, n_frames = wav_info(payload)
    for cc, start, size in _chunks(payload):
        if cc == b"data":
            data = payload[start : start + size]
            break
    width = bits // 8
    total = n_frames * channels
    samples: list[int] = []
    if bits == 8:
        samples = [b - 128 for b in data[:total]]
    elif bits == 16:
        samples = list(struct.unpack_from(f"<{total}h", data))
    elif bits == 32:
        samples = list(struct.unpack_from(f"<{total}i", data))
    else:  # 24-bit: sign-extend each little-endian triple
        for i in range(total):
            v = int.from_bytes(data[3 * i : 3 * i + 3], "little")
            samples.append(v - (1 << 24) if v & 0x800000 else v)
    return channels, rate, bits, samples


def wav_features(payload: bytes) -> tuple[int, int, int, int, int]:
    """(channels, sample_rate, n_frames, peak, energy) with peak =
    max |sample| and energy = Σ sample² over ALL channels — exact
    integers, the oracle-checkable core of an audio-quality filter
    (silence/clipping detection scales from these two).
    Python ints don't overflow; a SQL twin must accumulate energy in
    DECIMAL(38,0)/HUGEINT (32-bit samples square to ~4e18 each)."""
    channels, rate, _, samples = wav_decode(payload)
    peak = max((abs(s) for s in samples), default=0)
    energy = sum(s * s for s in samples)
    return channels, rate, len(samples) // channels, peak, energy


def encode_wav(
    channels: int,
    sample_rate: int,
    bits: int,
    samples,
) -> bytes:
    """Canonical RIFF/WAVE from interleaved signed samples (8-bit
    input is signed −128..127 here and stored unsigned, matching
    `wav_decode`'s re-centering)."""
    if channels <= 0 or sample_rate <= 0:
        raise ValueError("channels and sample rate must be positive")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    samples = list(samples)
    if len(samples) % channels:
        raise ValueError("sample count is not a whole number of frames")
    lo, hi = (-(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    if samples and not all(lo <= s <= hi for s in samples):
        raise ValueError(f"sample outside the {bits}-bit signed range")
    width = bits // 8
    if bits == 8:
        data = bytes((s + 128) for s in samples)
    elif bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 32:
        data = struct.pack(f"<{len(samples)}i", *samples)
    else:
        data = b"".join(
            (s & 0xFFFFFF).to_bytes(3, "little") for s in samples
        )
    block_align = channels * width
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
