"""FLAC decode (round 12): STREAMINFO, frame CRC-8/16, constant /
verbatim / fixed / LPC subframes, Rice partitions + raw escapes,
wasted bits, stereo decorrelation. FLAC is LOSSLESS, so the oracle is
the strongest kind: decode(encode(pcm)) must equal pcm exactly, and
the STREAMINFO MD5 the encoder embeds is independently verified by
the decoder against its own output — a real-container integrity
check, not a fixture convention."""

from __future__ import annotations

import hashlib
import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import (
    _FIXED_COEFS,
    _flac_crc8,
    _flac_crc16,
    decode_audio,
)


class _W:
    """MSB-first bit writer."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, k):
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self):
        assert self.n == 0
        return bytes(self.out)


def _utf8_num(n):
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _zig(v):
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_residual(bw, res, order, bs, po=0, k=None, escape_raw=None):
    bw.put(0, 2)  # 4-bit rice
    bw.put(po, 4)
    per = bs >> po
    at = 0
    for p in range(1 << po):
        n = per - order if p == 0 else per
        part = res[at : at + n]
        at += n
        if escape_raw is not None:
            bw.put(15, 4)
            bw.put(escape_raw, 5)
            for v in part:
                bw.put(v & ((1 << escape_raw) - 1), escape_raw)
            continue
        kk = k
        if kk is None:
            m = max((_zig(v) for v in part), default=0)
            kk = max(m.bit_length() - 3, 0)
            kk = min(kk, 14)
        bw.put(kk, 4)
        for v in part:
            u = _zig(v)
            q = u >> kk
            for _ in range(q):
                bw.put(0, 1)
            bw.put(1, 1)
            if kk:
                bw.put(u & ((1 << kk) - 1), kk)


def _write_subframe(bw, samples, bps, kind, order=0, coefs=None,
                    shift=0, prec=None, wasted=0, po=0,
                    escape_raw=None):
    bw.put(0, 1)
    eff = [v >> wasted for v in samples]
    ebps = bps - wasted
    if kind == "constant":
        bw.put(0, 6)
    elif kind == "verbatim":
        bw.put(1, 6)
    elif kind == "fixed":
        bw.put(8 + order, 6)
    elif kind == "lpc":
        bw.put(0x20 | (order - 1), 6)
    if wasted:
        bw.put(1, 1)
        for _ in range(wasted - 1):
            bw.put(0, 1)
        bw.put(1, 1)
    else:
        bw.put(0, 1)
    bs = len(samples)
    if kind == "constant":
        assert all(v == eff[0] for v in eff)
        bw.put(eff[0], ebps)
        return
    if kind == "verbatim":
        for v in eff:
            bw.put(v, ebps)
        return
    if kind == "fixed":
        coefs = _FIXED_COEFS[order]
        shift = 0
    else:
        assert coefs is not None and prec is not None
    for v in eff[:order]:
        bw.put(v, ebps)
    if kind == "lpc":
        bw.put(prec - 1, 4)
        bw.put(shift, 5)
        for c in coefs:
            bw.put(c, prec)
    res = []
    for i in range(order, bs):
        acc = sum(c * eff[i - 1 - j] for j, c in enumerate(coefs))
        res.append(eff[i] - (acc >> shift))
    _write_residual(bw, res, order, bs, po=po, escape_raw=escape_raw)


def encode_flac(chans, rate, bps, block_size=None, mode="independent",
                subframe="verbatim", md5=True, **sub_kw):
    """Single-stream FLAC from per-channel sample lists; every frame
    uses the same subframe kind (except stereo decorrelation modes,
    where the side channel carries the derived signal)."""
    n = len(chans[0])
    nch = len(chans)
    block_size = block_size or n
    width = bps // 8
    pcm = bytearray()
    for i in range(n):
        for c in range(nch):
            pcm += (chans[c][i] & ((1 << bps) - 1)).to_bytes(
                width, "little")
    digest = hashlib.md5(bytes(pcm)).digest() if md5 else b"\x00" * 16
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    v = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    si += v.to_bytes(8, "big")
    si += digest
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    fno = 0
    at = 0
    while at < n:
        bs = min(block_size, n - at)
        bw = _W()
        bw.put(0x3FFE, 14)
        bw.put(0, 1)
        bw.put(0, 1)  # fixed blocksize strategy
        bw.put(7, 4)  # 16-bit block size - 1 at end
        bw.put(0, 4)  # rate from STREAMINFO
        ca = {"independent": nch - 1, "left_side": 8,
              "right_side": 9, "mid_side": 10}[mode]
        bw.put(ca, 4)
        bw.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        bw.put(0, 1)
        for b in _utf8_num(fno):
            bw.put(b, 8)
        bw.put(bs - 1, 16)
        hdr = bw.out[:]
        assert bw.n == 0
        bw.put(_flac_crc8(hdr), 8)
        seg = [c[at : at + bs] for c in chans]
        if mode == "independent":
            for c in range(nch):
                _write_subframe(bw, seg[c], bps, subframe, **sub_kw)
        else:
            left, right = seg
            side = [l - r for l, r in zip(left, right)]
            if mode == "left_side":
                _write_subframe(bw, left, bps, subframe, **sub_kw)
                _write_subframe(bw, side, bps + 1, subframe, **sub_kw)
            elif mode == "right_side":
                _write_subframe(bw, side, bps + 1, subframe, **sub_kw)
                _write_subframe(bw, right, bps, subframe, **sub_kw)
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _write_subframe(bw, mid, bps, subframe, **sub_kw)
                _write_subframe(bw, side, bps + 1, subframe, **sub_kw)
        bw.align()
        body = bw.bytes()
        out += body + struct.pack(">H", _flac_crc16(body))
        at += bs
        fno += 1
    return bytes(out)


def _saw(n, lo, hi, step=7):
    out, v, d = [], lo, step
    for _ in range(n):
        out.append(v)
        v += d
        if v >= hi or v <= lo:
            d = -d
    return out


def test_verbatim_and_constant_roundtrip():
    pcm = _saw(96, -3000, 3000)
    rate, ch, bits, got = decode_audio(encode_flac([pcm], 8000, 16))
    assert (rate, ch, bits) == (8000, 1, 16)
    assert list(got) == pcm
    flat = [123] * 64
    _r, _c, _b, got = decode_audio(
        encode_flac([flat], 16000, 16, subframe="constant"))
    assert list(got) == flat


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    pcm = _saw(128, -2000, 2000, 13)
    out = encode_flac([pcm], 44100, 16, subframe="fixed", order=order)
    assert list(decode_audio(out)[3]) == pcm


def test_lpc_roundtrip_and_multiframe():
    pcm = _saw(200, -9000, 9000, 31)
    out = encode_flac([pcm], 48000, 16, block_size=64, subframe="lpc",
                      order=2, coefs=[3, -1], shift=1, prec=5)
    assert list(decode_audio(out)[3]) == pcm


def test_rice_partitions_and_escape():
    pcm = _saw(128, -500, 500, 3)
    out = encode_flac([pcm], 8000, 16, subframe="fixed", order=1, po=2)
    assert list(decode_audio(out)[3]) == pcm
    # escape_raw applies to residuals — fixed order 0 makes the
    # residual the signal itself
    out = encode_flac([pcm], 8000, 16, subframe="fixed", order=0,
                      escape_raw=11)
    assert list(decode_audio(out)[3]) == pcm


def test_wasted_bits_roundtrip():
    pcm = [v << 3 for v in _saw(64, -200, 200, 5)]
    out = encode_flac([pcm], 8000, 16, subframe="verbatim", wasted=3)
    assert list(decode_audio(out)[3]) == pcm


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_roundtrip(mode):
    left = _saw(96, -4000, 4000, 17)
    right = [v // 2 + 100 for v in left]
    out = encode_flac([left, right], 44100, 16, mode=mode)
    rate, ch, bits, got = decode_audio(out)
    assert (rate, ch, bits) == (44100, 2, 16)
    assert list(got[0::2]) == left and list(got[1::2]) == right


@pytest.mark.parametrize("bps", [8, 24])
def test_other_bit_depths(bps):
    lim = 1 << (bps - 1)
    pcm = _saw(64, -(lim // 2), lim // 2, lim // 37 + 1)
    rate, ch, bits, got = decode_audio(encode_flac([pcm], 8000, bps))
    assert bits == bps and list(got) == pcm


def test_streaminfo_md5_is_enforced():
    pcm = _saw(64, -100, 100)
    out = bytearray(encode_flac([pcm], 8000, 16))
    # STREAMINFO md5 is the last 16 bytes of the 34-byte block at
    # offset 8; corrupt one byte
    out[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_audio(bytes(out))


def test_frame_crc_corruption_fails_loud():
    pcm = _saw(64, -100, 100)
    out = bytearray(encode_flac([pcm], 8000, 16, md5=False))
    out[-3] ^= 0x01  # inside the last frame body
    with pytest.raises(ValueError, match="CRC"):
        decode_audio(bytes(out))


def test_flac_flows_through_audio_features(spark):
    from simple_etl_spark.llm.multimodal import audio_features

    pcm = _saw(160, -1000, 1000)
    out = encode_flac([pcm], 16000, 16)
    df = spark.createDataFrame(
        [(1, bytearray(out))], "doc_id bigint, payload binary"
    )
    row = audio_features(df).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["channels"] == 1
    assert row["n_frames"] == 160
    assert row["peak_abs"] == max(abs(v) for v in pcm)
