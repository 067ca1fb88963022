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


def build_aifc_g711(codes: bytes, rate: int, ctype: bytes,
                    channels: int = 1) -> bytes:
    """AIFC container carrying raw G.711 codes (1 byte/sample); COMM
    declares the DECODED 16-bit size per the AIFC-1991 convention."""
    frames = len(codes) // channels
    comm = struct.pack(">hIh", channels, frames, 16) + ext80(rate)
    comm += ctype + b"\x00"
    ssnd = struct.pack(">II", 0, 0) + codes

    def chunk(cid, body):
        return cid + struct.pack(">I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    body = b"AIFC" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_aifc_g711_literal_pins():
    """The same ITU-T literals the WAV tier pins, through the AIFC
    container (all four fourcc casings)."""
    _, _, bits, mu = decode_audio(
        build_aifc_g711(bytes([0x00, 0x7F, 0x80, 0xFF]), 8000, b"ulaw"))
    assert bits == 16 and list(mu) == [-32124, 0, 32124, 0]
    _, _, _, al = decode_audio(
        build_aifc_g711(bytes([0x00, 0x55, 0xD5, 0xAA, 0x2A]), 8000,
                        b"alaw"))
    assert list(al) == [-5504, -8, 8, 32256, -32256]
    for ct in (b"ULAW", b"ALAW"):
        assert decode_audio(build_aifc_g711(b"\x00\xff", 8000, ct))[2] == 16


def test_aifc_g711_matches_wav_tier_full_table():
    """Cross-container identity: AIFC-ulaw/alaw must decode to exactly
    the WAV format-7/6 expansion of the same 256 code points."""
    sys.path.insert(0, "tests")
    from tests.test_audio import make_wav_g711

    allb = bytes(range(256))
    for law, ct in (("ulaw", b"ulaw"), ("alaw", b"alaw")):
        wav = decode_audio(make_wav_g711(allb, 8000, 1, law))
        aifc = decode_audio(build_aifc_g711(allb, 8000, ct))
        assert list(aifc[3]) == list(wav[3])
        assert (aifc[0], aifc[1]) == (8000, 1)


def test_aifc_g711_short_ssnd_fails_loud():
    good = build_aifc_g711(bytes(64), 8000, b"ulaw")
    with pytest.raises(ValueError):
        decode_audio(good[:-40])
