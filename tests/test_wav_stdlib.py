"""WAV stdlib codec vs the canonical JVM javax.sound.sampled
reader/writer — both directions. PCM is exact integers, so every
comparison is exact equality."""

from __future__ import annotations

import random
import struct

import pytest

from datapipeline_scripts_spark.extensions import wav_stdlib as ws


def _samples(n, bits, seed):
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    rnd = random.Random(seed)
    return [rnd.randint(lo, hi) for _ in range(n)]


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(bits, channels):
    s = _samples(50 * channels, bits, bits + channels)
    p = ws.encode_wav(channels, 8000, bits, s)
    assert ws.is_wav(p)
    assert ws.wav_info(p) == (channels, 8000, bits, 50)
    assert ws.wav_decode(p) == (channels, 8000, bits, s)


def test_features_exact():
    s = [3, -4, 0, 5, -5, 1]
    p = ws.encode_wav(2, 44100, 16, s)
    channels, rate, n_frames, peak, energy = ws.wav_features(p)
    assert (channels, rate, n_frames) == (2, 44100, 3)
    assert peak == 5
    assert energy == 9 + 16 + 0 + 25 + 25 + 1
    # 32-bit energy exceeds int64 territory per-term aggregate safety
    big = [2**31 - 1, -(2**31)] * 8
    p = ws.encode_wav(1, 8000, 32, big)
    assert ws.wav_features(p)[4] == sum(v * v for v in big)


def test_unknown_chunks_and_padding_are_skipped():
    s = _samples(21, 16, 1)  # odd count on mono → odd data size? (16-bit: even)
    p = ws.encode_wav(1, 8000, 16, s)
    # splice a LIST chunk with an ODD size (forces the pad-byte walk)
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = p[:12] + meta + p[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert ws.wav_decode(spliced) == (1, 8000, 16, s)


def test_refusals_and_corruption_are_loud():
    s = _samples(8, 16, 2)
    p = bytearray(ws.encode_wav(1, 8000, 16, s))
    with pytest.raises(ValueError, match="signature"):
        ws.wav_info(b"RIFX" + bytes(p[4:]))
    with pytest.raises(ValueError):
        ws.wav_info(bytes(p[:30]))  # truncated inside fmt
    p[20:22] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="float"):
        ws.wav_info(bytes(p))
    p[20:22] = struct.pack("<H", 0xFFFE)
    with pytest.raises(NotImplementedError, match="extensible"):
        ws.wav_info(bytes(p))


def test_encoder_validations():
    with pytest.raises(ValueError, match="range"):
        ws.encode_wav(1, 8000, 8, [200])
    with pytest.raises(ValueError, match="whole number"):
        ws.encode_wav(2, 8000, 16, [1, 2, 3])
    with pytest.raises(ValueError, match="bit depth"):
        ws.encode_wav(1, 8000, 12, [])


# ---------------------------------------------------------------------------
# Cross-proofs vs javax.sound.sampled
# ---------------------------------------------------------------------------


def _wave_type(jvm):
    try:
        t = jvm.javax.sound.sampled.AudioFileFormat.Type.WAVE
        if t is not None:
            return t
    except Exception:
        pass
    # static-field fallback via reflection (py4j static members can fail)
    cls = jvm.java.lang.Class.forName("javax.sound.sampled.AudioFileFormat$Type")
    return cls.getField("WAVE").get(None)


@pytest.mark.parametrize("bits,channels", [(8, 1), (16, 2), (24, 1), (32, 2)])
def test_our_encoder_byte_exact_in_javax_sound(spark, bits, channels):
    """The canonical reader must see our exact format fields and the
    exact PCM payload bytes."""
    jvm = spark._jvm
    s = _samples(40 * channels, bits, bits * 3 + channels)
    p = ws.encode_wav(channels, 16000, bits, s)
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(p)
    )
    f = ais.getFormat()
    assert f.getChannels() == channels
    assert int(f.getSampleRate()) == 16000
    assert f.getSampleSizeInBits() == bits
    assert not f.isBigEndian()
    enc = f.getEncoding().toString()
    assert enc == ("PCM_UNSIGNED" if bits == 8 else "PCM_SIGNED")
    assert ais.getFrameLength() == 40
    raw = bytes(ais.readAllBytes())
    # recover the data chunk we wrote and compare byte-for-byte
    for cc, start, size in ws._chunks(p):
        if cc == b"data":
            assert raw == p[start : start + size]
            break


@pytest.mark.parametrize("bits,channels", [(8, 1), (16, 2), (24, 2), (32, 1)])
def test_javax_sound_writer_decodes_exactly_here(spark, bits, channels):
    """Canonical-encoder direction: AudioSystem-written WAVs decode
    here to the exact samples."""
    jvm = spark._jvm
    n_frames = 37
    s = _samples(n_frames * channels, bits, bits + 7 * channels)
    # raw little-endian PCM payload for the canonical writer
    if bits == 8:
        raw = bytes(v + 128 for v in s)
    elif bits == 16:
        raw = struct.pack(f"<{len(s)}h", *s)
    elif bits == 32:
        raw = struct.pack(f"<{len(s)}i", *s)
    else:
        raw = b"".join((v & 0xFFFFFF).to_bytes(3, "little") for v in s)
    fmt = jvm.javax.sound.sampled.AudioFormat(
        float(16000), bits, channels, bits != 8, False
    )
    ais = jvm.javax.sound.sampled.AudioInputStream(
        jvm.java.io.ByteArrayInputStream(raw), fmt, n_frames
    )
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.sound.sampled.AudioSystem.write(ais, _wave_type(jvm), baos)
    p = bytes(baos.toByteArray())
    assert ws.is_wav(p)
    assert ws.wav_decode(p) == (channels, 16000, bits, s)
