"""AIFF / AIFC decode (round 12): FORM walk, COMM with the 80-bit
extended sample rate, SSND offsets, signed 8-bit (unlike WAV),
big-endian 16/24-bit, and AIFC 'NONE'/'sowt'. Fixtures byte-built;
oracle = the sample list the fixture encodes."""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import decode_audio


def ext80(v: int) -> bytes:
    """Encode a positive integer as IEEE 80-bit extended."""
    if v == 0:
        return b"\x00" * 10
    e = v.bit_length() - 1
    mant = v << (63 - e)
    return struct.pack(">H", 16383 + e) + mant.to_bytes(8, "big")


def build_aiff(samples, rate, bits, channels=1, form=b"AIFF",
               ctype=b"NONE", ssnd_offset=0, little=False):
    width = bits // 8
    frames = len(samples) // channels
    comm = struct.pack(">hIh", channels, frames, bits) + ext80(rate)
    if form == b"AIFC":
        comm += ctype + b"\x00"  # pstring name (empty)
    data = b"".join(
        v.to_bytes(width, "little" if little else "big", signed=True)
        for v in samples
    )
    ssnd = struct.pack(">II", ssnd_offset, 0) + b"\x00" * ssnd_offset + data

    def chunk(cid, body):
        return cid + struct.pack(">I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    body = form + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_16bit_big_endian():
    pcm = [((i * 37) % 4001) - 2000 for i in range(500)]
    rate, ch, bits, got = decode_audio(build_aiff(pcm, 44100, 16))
    assert (rate, ch, bits) == (44100, 1, 16)
    assert list(got) == pcm


def test_8bit_is_signed_and_stereo():
    pcm = [(-128 + (i * 7) % 256) for i in range(200)]  # interleaved 2ch
    rate, ch, bits, got = decode_audio(
        build_aiff(pcm, 8000, 8, channels=2))
    assert (rate, ch, bits) == (8000, 2, 8)
    assert list(got) == pcm


def test_24bit_and_ssnd_offset():
    pcm = [((i * 9973) % 2000001) - 1000000 for i in range(64)]
    out = build_aiff(pcm, 48000, 24, ssnd_offset=6)
    rate, ch, bits, got = decode_audio(out)
    assert (bits, list(got)) == (24, pcm)


def test_aifc_none_and_sowt():
    pcm = [((i * 31) % 1201) - 600 for i in range(128)]
    a = build_aiff(pcm, 22050, 16, form=b"AIFC", ctype=b"NONE")
    assert list(decode_audio(a)[3]) == pcm
    b = build_aiff(pcm, 22050, 16, form=b"AIFC", ctype=b"sowt",
                   little=True)
    assert list(decode_audio(b)[3]) == pcm


def test_odd_rate_ext80_roundtrip():
    pcm = [0, 1, -1]
    for rate in (8000, 11025, 22050, 44100, 48000, 96000):
        assert decode_audio(build_aiff(pcm, rate, 16))[0] == rate


def test_gates_and_malformed():
    pcm = [0] * 8
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_audio(build_aiff(pcm, 8000, 16, form=b"AIFC",
                                ctype=b"ima4"))
    good = build_aiff(pcm, 8000, 16)
    with pytest.raises(ValueError):
        decode_audio(good[: len(good) - 6])  # SSND shorter than COMM
    # frame-count bomb
    bomb = bytearray(good)
    at = bytes(bomb).index(b"COMM") + 8 + 2
    bomb[at : at + 4] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError):
        decode_audio(bytes(bomb))


def test_aiff_flows_through_audio_features(spark):
    from simple_etl_spark.llm.multimodal import audio_features

    pcm = [((i * 17) % 801) - 400 for i in range(320)]
    df = spark.createDataFrame(
        [(1, bytearray(build_aiff(pcm, 16000, 16)))],
        "doc_id bigint, payload binary",
    )
    row = audio_features(df).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["n_frames"] == 320
    assert row["peak_abs"] == max(abs(v) for v in pcm)
