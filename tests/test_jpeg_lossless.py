"""Lossless JPEG (SOF3, Huffman — T.81 Annex H).

Lossless means the ORIGINAL pixels are the oracle: decode(encode(x))
must equal x exactly (scaled by the documented 8-bit output rule for
precisions above 8). The test encoder implements the same Annex H
prediction rules as the decoder; because the mode is lossless, any
self-consistent predictor pair would roundtrip, so the tests ALSO pin
the prediction rules themselves on hand-computable fixtures (flat
image → all-zero differences after the first; a known two-sample
32768 difference → the SSSS=16 no-bits code path).
"""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import decode_image

from tests.test_jpeg import _BitWriter, _bits_of, _category, _enc_huff, seg

# DC-style category table extended to SSSS=16 for 16-bit differences:
# all 17 symbols at code length 5 is a valid canonical set (17 < 32,
# the all-ones code stays unused)
DC16 = (
    [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(17)),
)


def _predict(plane, i, w, pred_sel, default):
    x = i % w
    if i == 0:
        return default
    if i < w:
        return plane[i - 1]
    if x == 0:
        return plane[i - w]
    ra, rb, rc = plane[i - 1], plane[i - w], plane[i - w - 1]
    return {
        1: ra,
        2: rb,
        3: rc,
        4: ra + rb - rc,
        5: ra + ((rb - rc) >> 1),
        6: rb + ((ra - rc) >> 1),
        7: (ra + rb) >> 1,
    }[pred_sel]


def encode_jpeg_lossless(planes, w, h, prec, pred_sel=1, pt=0):
    """Minimal SOF3 encoder: ``planes`` is a list of per-component
    sample lists (row-major, 0..2^prec-1). Interleaved one sample per
    component per MCU (all sampling factors 1)."""
    nch = len(planes)
    dt = _enc_huff(*DC16)
    bw = _BitWriter()
    shifted = [[v >> pt for v in p] for p in planes]
    default = 1 << (prec - pt - 1)
    for i in range(w * h):
        for ci in range(nch):
            p = shifted[ci]
            pred = _predict(p, i, w, pred_sel, default)
            diff = (p[i] - pred) & 0xFFFF
            if diff == 32768:
                bw.put(*dt[16])  # SSSS=16: no extra bits
                continue
            sd = diff - 65536 if diff > 32768 else diff
            s = _category(sd)
            bw.put(*dt[s])
            if s:
                bw.put(_bits_of(sd, s), s)
    bw.pad()

    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(DC16[0]) + bytes(DC16[1])
    out += seg(0xC4, dht)
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([nch])
    for ci in range(nch):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC3, sof)
    sos = bytes([nch])
    for ci in range(nch):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([pred_sel, 0, pt])
    out += seg(0xDA, sos)
    out += bytes(bw.out) + b"\xff\xd9"
    return bytes(out)


def _rand(n, seed, lim):
    vals, x = [], seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        vals.append(x % lim)
    return vals


@pytest.mark.parametrize("pred_sel", [1, 2, 3, 4, 5, 6, 7])
def test_gray8_roundtrips_exactly_every_predictor(pred_sel):
    w, h = 23, 11
    pix = _rand(w * h, 7 + pred_sel, 256)
    jpg = encode_jpeg_lossless([pix], w, h, 8, pred_sel=pred_sel)
    assert decode_image(jpg) == (w, h, 1, bytes(pix))


def test_rgb8_roundtrips_exactly():
    w, h = 17, 9
    planes = [_rand(w * h, s, 256) for s in (1, 2, 3)]
    jpg = encode_jpeg_lossless(planes, w, h, 8, pred_sel=4)
    inter = bytes(planes[c][i] for i in range(w * h) for c in range(3))
    assert decode_image(jpg) == (w, h, 3, inter)


def test_gray16_scales_to_8bit_exactly():
    w, h = 12, 8
    pix = _rand(w * h, 99, 65536)
    jpg = encode_jpeg_lossless([pix], w, h, 16, pred_sel=7)
    expect = bytes((v * 255 + 32767) // 65535 for v in pix)
    assert decode_image(jpg) == (w, h, 1, expect)


def test_gray12_scales_like_the_dct_path():
    w, h = 10, 10
    pix = _rand(w * h, 5, 4096)
    jpg = encode_jpeg_lossless([pix], w, h, 12, pred_sel=5)
    expect = bytes((v * 255 + 2047) // 4095 for v in pix)
    assert decode_image(jpg) == (w, h, 1, expect)


def test_point_transform_drops_low_bits():
    w, h = 8, 8
    pix = _rand(w * h, 3, 256)
    jpg = encode_jpeg_lossless([pix], w, h, 8, pred_sel=1, pt=2)
    expect = bytes((v >> 2) << 2 for v in pix)
    assert decode_image(jpg) == (w, h, 1, expect)


def test_flat_image_is_all_zero_diffs():
    """Prediction-rule pin: a flat image encodes as one nonzero
    difference (the first sample against the 2^(P-1) default) and
    zeros everywhere else — byte-countably tiny."""
    w, h = 32, 32
    jpg = encode_jpeg_lossless([[200] * (w * h)], w, h, 8, pred_sel=4)
    assert decode_image(jpg) == (w, h, 1, bytes([200] * (w * h)))
    # 1024 five-bit zero-category codes = 640 bytes of entropy data;
    # any nonzero differences would add magnitude bits on top
    assert len(jpg) < 720, len(jpg)


def test_ssss16_codes_a_32768_difference():
    """P=16: samples [0, 32768] force diff = 32768 — the SSSS=16
    no-extra-bits special case both sides must agree on."""
    w, h = 2, 1
    pix = [0, 32768]
    jpg = encode_jpeg_lossless([pix], w, h, 16, pred_sel=1)
    # prediction for (0,0) is 1<<15 = 32768 → first diff is -32768 ≡
    # 32768 (mod 2^16), so BOTH samples ride the SSSS=16 path
    expect = bytes((v * 255 + 32767) // 65535 for v in pix)
    assert decode_image(jpg) == (w, h, 1, expect)


def test_lossless_gates_fail_loud():
    w, h = 8, 8
    pix = _rand(w * h, 1, 256)
    jpg = encode_jpeg_lossless([pix], w, h, 8)
    # restart intervals: splice a DRI segment before SOS
    i = jpg.index(b"\xff\xda")
    dri = seg(0xDD, struct.pack(">H", 4))
    with pytest.raises(NotImplementedError, match="restart"):
        decode_image(jpg[:i] + dri + jpg[i:])
    # bad predictor selector
    bad = bytearray(jpg)
    j = bad.index(b"\xff\xda")
    bad[j + 2 + 3 + 2] = 0  # Ss byte (after len, ns, 1 comp spec)
    with pytest.raises(ValueError, match="predictor"):
        decode_image(bytes(bad))


def test_lossless_flows_through_image_features(spark):
    from simple_etl_spark.llm.multimodal import image_features

    w, h = 16, 4
    pix = _rand(w * h, 42, 256)
    jpg = encode_jpeg_lossless([pix], w, h, 8, pred_sel=6)
    df = spark.createDataFrame(
        [(1, bytearray(jpg))], "doc_id bigint, payload binary"
    )
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (w, h, 1)
    assert row["mean_px"] == sum(pix) // len(pix)


def test_ycbcr_lossless_is_gated_not_scrambled():
    """Adobe APP14 transform=1 declares YCbCr components: emitting
    them as direct RGB would scramble colors silently, so the decoder
    gates — the lossless twin of the sequential path's transform=0
    RGB gate (code-review r11)."""
    w, h = 8, 8
    planes = [_rand(w * h, s, 256) for s in (1, 2, 3)]
    jpg = encode_jpeg_lossless(planes, w, h, 8)
    app14 = seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 1]))
    i = jpg.index(b"\xff\xc4")
    with pytest.raises(NotImplementedError, match="YCbCr"):
        decode_image(jpg[:i] + app14 + jpg[i:])


def test_out_of_range_point_transform_sample_fails_loud():
    """A malformed stream whose reconstruction exceeds the declared
    precision must raise, not wrap mod 2^16 into a small value
    (code-review r11): prec=8 pt=2 with coded value 0x4000 shifts to
    0x10000, which a masked reconstruction would fold to 0."""
    w, h = 1, 1
    # hand-code one sample: diff = 0x4000 - default(32) = 16352
    dt = _enc_huff(*DC16)
    bw = _BitWriter()
    diff = 0x4000 - (1 << (8 - 2 - 1))
    s = _category(diff)
    bw.put(*dt[s])
    bw.put(_bits_of(diff, s), s)
    bw.pad()
    out = bytearray(b"\xff\xd8")
    out += seg(0xC4, bytes([0x00]) + bytes(DC16[0]) + bytes(DC16[1]))
    out += seg(0xC3, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 0, 2]))
    out += bytes(bw.out) + b"\xff\xd9"
    with pytest.raises(ValueError, match="exceeds the declared precision"):
        decode_image(bytes(out))
