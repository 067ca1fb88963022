"""Baseline JPEG decode (the last codec gate).

No codec library exists in this container to produce fixtures, so the
tests carry their own minimal baseline encoder (standard ITU T.81
Annex K quantization + Huffman tables). Decoder correctness is NOT
checked encoder-vs-decoder roundtrip alone (shared-bug risk): the
oracle is an INDEPENDENT NumPy pipeline run on the quantized
coefficient blocks the encoder emitted — dequantize, NumPy-matrix
IDCT, clamp, upsample, color-convert — compared byte-exactly to the
engine decoder's output, plus analytic flat-block expectations where
the math is closed-form (a flat 8x8 block is DC-only).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from simple_etl_spark.llm.multimodal import _JPEG_ZIGZAG, decode_image

# --- ITU T.81 Annex K tables (public standard constants) -------------------

QL = [  # luminance, natural order
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QC = [  # chrominance
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal 8x8 DCT-II matrix (NumPy-built — independent of the
# engine's math.cos basis)
_D = np.array([
    [(math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
     * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
])


def _enc_huff(counts, symbols):
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc, self.n = 0, 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _category(v):
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s


def _bits_of(v, s):
    return v if v >= 0 else v + (1 << s) - 1


def jpeg_front_end(pix, w, h, channels, samp):
    """Shared FDCT front end for the baseline and progressive test
    encoders: RGB→YCbCr, box-mean subsample, edge-replicate pad,
    float FDCT, quantize. Returns (coeff_blocks, samp, quants, tq,
    th, mcux, mcuy) where coeff_blocks[ci] is a dict (block_y,
    block_x) -> 64 QUANTIZED coefficients in natural order — the
    independent oracle's input (reference_decode never sees the
    bitstream, so encoder/decoder bitstream bugs cannot cancel)."""
    if channels == 3:
        rgb = np.frombuffer(bytes(pix), dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
        ycc = np.empty_like(rgb)
        ycc[..., 0] = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        ycc[..., 1] = 128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        ycc[..., 2] = 128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        ycc = np.clip(np.round(ycc), 0, 255)
        comp_pixels = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        quants = [QL, QC, QC]
        tq = [0, 1, 1]
        th = [0, 1, 1]
    else:
        comp_pixels = [np.frombuffer(bytes(pix), dtype=np.uint8)
                       .reshape(h, w).astype(np.float64)]
        samp, quants, tq, th = [(1, 1)], [QL], [0], [0]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # build padded, (optionally) subsampled planes
    planes = []
    for ci, p in enumerate(comp_pixels):
        hc, vc = samp[ci]
        if (hc, vc) != (hmax, vmax):
            fy, fx = vmax // vc, hmax // hc
            ph, pw = -(-h // fy), -(-w // fx)
            sub = np.zeros((ph, pw))
            for yy in range(ph):
                for xx in range(pw):
                    blkv = p[yy * fy : min((yy + 1) * fy, h),
                             xx * fx : min((xx + 1) * fx, w)]
                    sub[yy, xx] = np.round(blkv.mean())
            p = sub
        tgt_h, tgt_w = mcuy * vc * 8, mcux * hc * 8
        pad = np.empty((tgt_h, tgt_w))
        ph, pw = p.shape
        pad[:ph, :pw] = p
        pad[ph:, :pw] = p[ph - 1 : ph, :]  # edge-replicate
        pad[:, pw:] = pad[:, pw - 1 : pw]
        planes.append(pad)

    # FDCT + quantize every block
    coeff_blocks = []
    for ci, p in enumerate(planes):
        q = np.array(quants[ci]).reshape(8, 8)
        blocks = {}
        for by in range(p.shape[0] // 8):
            for bx in range(p.shape[1] // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                f = _D @ blk @ _D.T
                blocks[(by, bx)] = np.round(f / q).astype(np.int64)
        coeff_blocks.append(blocks)
    return coeff_blocks, samp, quants, tq, th, mcux, mcuy


def seg(marker, data):
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


def dqt_payload(tid, tbl):  # DQT rides in zigzag order
    zz = bytes(tbl[_JPEG_ZIGZAG[z]] for z in range(64))
    return bytes([tid]) + zz


def dht_payload(tc, tid, counts, symbols):
    return bytes([(tc << 4) | tid]) + bytes(counts) + bytes(symbols)


def jpeg_headers(w, h, channels, samp, tq, sof_marker, restart,
                 dht_segments):
    """SOI..DRI header bytes shared by the baseline and progressive
    test encoders (quant tables, Huffman tables, SOFn, optional
    DRI)."""
    out = bytearray(b"\xff\xd8")
    if channels == 3:
        out += seg(0xDB, dqt_payload(0, QL) + dqt_payload(1, QC))
    else:
        out += seg(0xDB, dqt_payload(0, QL))
    out += seg(0xC4, dht_segments)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tq[ci]])
    out += seg(sof_marker, sof)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    return out


def encode_jpeg(pix, w, h, channels, subsample=False, restart=0,
                samp=None):
    """Minimal baseline encoder. Returns (jpeg_bytes, coeff_blocks,
    samp); ``samp`` overrides the subsample flag with an arbitrary
    divisible sampling-factor list (e.g. [(4,1),(1,1),(1,1)] for
    4:1:1)."""
    if samp is None:
        samp = ([(2, 2), (1, 1), (1, 1)] if subsample
                else [(1, 1)] * channels)
    coeff_blocks, samp, quants, tq, th, mcux, mcuy = jpeg_front_end(
        pix, w, h, channels, samp
    )
    jpg = encode_jpeg_from_coeffs(coeff_blocks, samp, w, h, channels,
                                  tq, th, mcux, mcuy, restart)
    return jpg, coeff_blocks, samp


def encode_jpeg_from_coeffs(coeff_blocks, samp, w, h, channels, tq, th,
                            mcux, mcuy, restart=0):
    """Entropy-code + assemble a baseline file from QUANTIZED
    coefficient blocks directly — lets tests craft coefficient
    patterns no pixel front end produces (e.g. distinct flat DC per
    block for the non-divisible upsample pin)."""
    planes = coeff_blocks  # per-component block dicts

    # entropy-code
    dc_tabs = [_enc_huff(*DC_LUM), _enc_huff(*DC_CHR)]
    ac_tabs = [_enc_huff(*AC_LUM), _enc_huff(*AC_CHR)]
    bw = _BitWriter()
    preds = [0] * len(planes)
    rst_n = 0
    body_parts = []
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bw.pad()
            body_parts.append(bytes(bw.out))
            body_parts.append(bytes([0xFF, 0xD0 + rst_n]))
            bw = _BitWriter()
            rst_n = (rst_n + 1) & 7
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci in range(len(planes)):
            hc, vc = samp[ci]
            dt, at = dc_tabs[th[ci]], ac_tabs[th[ci]]
            for bv in range(vc):
                for bh in range(hc):
                    blk = coeff_blocks[ci][(my * vc + bv, mx * hc + bh)]
                    zz = blk.flatten()[_JPEG_ZIGZAG]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    s = _category(diff)
                    bw.put(*dt[s])
                    if s:
                        bw.put(_bits_of(diff, s), s)
                    run = 0
                    last_nz = max((i for i in range(1, 64) if zz[i]),
                                  default=0)
                    for i in range(1, last_nz + 1):
                        v = int(zz[i])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            bw.put(*at[0xF0])
                            run -= 16
                        s = _category(v)
                        bw.put(*at[(run << 4) | s])
                        bw.put(_bits_of(v, s), s)
                        run = 0
                    if last_nz < 63:
                        bw.put(*at[0x00])  # EOB
    bw.pad()
    body_parts.append(bytes(bw.out))
    body = b"".join(body_parts)

    if channels == 3:
        dhts = (dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_LUM)
                + dht_payload(0, 1, *DC_CHR) + dht_payload(1, 1, *AC_CHR))
    else:
        dhts = dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_LUM)
    out = jpeg_headers(w, h, channels, samp, tq, 0xC0, restart, dhts)
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (th[ci] << 4) | th[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body + b"\xff\xd9"
    return bytes(out)


def reference_decode(coeff_blocks, samp, w, h, channels):
    """Independent NumPy pipeline: dequantize -> matrix IDCT -> clamp
    -> replication upsample -> YCbCr->RGB, mirroring the documented
    decode contract (not the decoder's code)."""
    quants = [QL, QC, QC] if channels == 3 else [QL]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = []
    for ci, blocks in enumerate(coeff_blocks):
        q = np.array(quants[ci]).reshape(8, 8)
        nby = max(k[0] for k in blocks) + 1
        nbx = max(k[1] for k in blocks) + 1
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.int64)
        for (by, bx), blk in blocks.items():
            f = blk.astype(np.float64) * q
            s = _D.T @ f @ _D
            px = np.clip(np.round(s).astype(np.int64) + 128, 0, 255)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
        planes.append(plane)
    if channels == 1:
        return planes[0][:h, :w].astype(np.uint8).tobytes()
    full = []
    for ci, p in enumerate(planes):
        # nearest-sample index map (src = x*hc//hmax): identical to
        # np.repeat for divisible ratios, and defined for the
        # non-divisible ones T.81 permits (e.g. 3:2)
        hc, vc = samp[ci]
        ys = (np.arange(h) * vc) // vmax
        xs = (np.arange(w) * hc) // hmax
        full.append(p[np.ix_(ys, xs)].astype(np.float64))
    yy, cb, cr = full
    r = np.clip(np.round(yy + 1.402 * (cr - 128)), 0, 255)
    g = np.clip(np.round(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255)
    b = np.clip(np.round(yy + 1.772 * (cb - 128)), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8).tobytes()


def _gradient_rgb(w, h):
    return bytes(
        ((x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1),
         ((x + y) * 255) // max(w + h - 2, 1))[c]
        for y in range(h) for x in range(w) for c in range(3)
    )


# --- tests ------------------------------------------------------------------

def test_flat_gray_block_decodes_analytically():
    """A flat 8x8 gray image is DC-only: quantized DC round((v-128)*8/16)
    -> decoded value is analytic."""
    for v in (0, 77, 128, 200, 255):
        pix = bytes([v] * 64)
        jpg, blocks, samp = encode_jpeg(pix, 8, 8, 1)
        w, h, nch, out = decode_image(jpg)
        assert (w, h, nch) == (8, 8, 1)
        dcq = round((v - 128) * 8 / 16)
        expected = min(255, max(0, round(dcq * 16 / 8) + 128))
        assert set(out) == {expected}, (v, set(out))


def test_gray_gradient_matches_independent_reference():
    w, h = 24, 16
    pix = bytes(((x * 7 + y * 13) % 256) for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg(pix, w, h, 1)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 1)
    assert out == reference_decode(blocks, samp, w, h, 1)


def test_rgb_444_matches_independent_reference():
    w, h = 16, 8
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg(pix, w, h, 3)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 3)
    assert out == reference_decode(blocks, samp, w, h, 3)


def test_rgb_420_subsampled_matches_independent_reference():
    w, h = 20, 12  # non-multiple of 16: exercises MCU padding + crop
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg(pix, w, h, 3, subsample=True)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 3)
    assert out == reference_decode(blocks, samp, w, h, 3)


@pytest.mark.parametrize("samp", [
    [(4, 1), (1, 1), (1, 1)],  # 4:1:1 — horizontal factor 4
    [(1, 4), (1, 1), (1, 1)],  # vertical factor 4
    [(2, 2), (2, 1), (1, 1)],  # mixed per-component ratios
    [(3, 1), (1, 1), (1, 1)],  # factor 3 (legal, rarely emitted)
    [(4, 2), (2, 1), (1, 1)],  # 2x ratios against a 4x max
])
def test_full_spec_sampling_factors_match_reference(samp):
    """T.81 B.2.2 allows sampling factors 1-4; the decoder must
    handle the whole range (r11 closed the old factors>2 gate).

    Comparison is near-exact rather than byte-exact: the engine's
    separable IDCT and the oracle's matrix IDCT can land on opposite
    sides of an exact .5 tie (observed: -25.5 vs -25.4999... on this
    image), which the byte-exact tests elsewhere avoid by
    construction. A geometry/upsample bug produces errors of tens
    across whole tiles, which the ≤2 / 99%-exact bound still
    catches."""
    w, h = 37, 21  # non-multiple of every MCU size: padding + crop
    pix = _gradient_rgb(w, h)
    jpg, blocks, sampo = encode_jpeg(pix, w, h, 3, samp=samp)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 3)
    ref = reference_decode(blocks, sampo, w, h, 3)
    a = np.frombuffer(out, np.uint8).astype(int)
    b = np.frombuffer(ref, np.uint8).astype(int)
    d = np.abs(a - b)
    assert d.max() <= 2, d.max()
    assert (d == 0).mean() >= 0.99, (d == 0).mean()


def test_sampling_factor_above_4_is_malformed():
    w, h = 8, 8
    jpg, _, _ = encode_jpeg(_gradient_rgb(w, h), w, h, 3)
    # patch SOF0 component 0's Hi/Vi byte (5,1) — outside the spec range
    i = jpg.index(b"\xff\xc0")
    body = bytearray(jpg)
    body[i + 12] = 0x51
    with pytest.raises(ValueError):
        decode_image(bytes(body))


def test_sof1_extended_sequential_decodes_as_baseline():
    """SOF1 (extended sequential, Huffman, 8-bit) uses the identical
    decode procedure as SOF0 — accepted since r11."""
    w, h = 16, 16
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg(pix, w, h, 3)
    sof1 = jpg.replace(b"\xff\xc0", b"\xff\xc1", 1)
    assert decode_image(sof1) == decode_image(jpg)


def test_restart_markers_reset_predictors():
    w, h = 32, 8
    pix = bytes(((x * 11 + y * 3) % 256) for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg(pix, w, h, 1, restart=2)
    assert b"\xff\xd0" in jpg  # a real RST0 landed in the stream
    gw, gh, nch, out = decode_image(jpg)
    assert out == reference_decode(blocks, samp, w, h, 1)


def test_lossy_but_close_to_source():
    """End-to-end sanity: decode(encode(x)) stays near x (quality is
    the standard tables'), so the decoder isn't just consistent with
    the reference but actually decodes the image."""
    w, h = 16, 16
    pix = bytes([60] * (w * h * 3))
    jpg, _, _ = encode_jpeg(pix, w, h, 3)
    _, _, _, out = decode_image(jpg)
    err = np.abs(np.frombuffer(out, np.uint8).astype(int) - 60)
    assert err.max() <= 4, err.max()


def test_exotic_frames_stay_gated():
    """Progressive (SOF2) decodes since r11 and arithmetic (SOF9/10)
    since r12 — the remaining frame gates are hierarchical /
    differential and arithmetic lossless."""
    w, h = 8, 8
    jpg, _, _ = encode_jpeg(bytes([9] * 64), w, h, 1)
    for m in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
        exotic = jpg.replace(b"\xff\xc0", bytes([0xFF, m]), 1)
        with pytest.raises(NotImplementedError):
            decode_image(exotic)
    # a baseline HUFFMAN body relabeled SOF9 is routed to the QM
    # tier, NOT silently decoded as Huffman (a QM stream carries no
    # redundancy, so garbage input can "decode" — but never to the
    # Huffman pixels)
    arith = jpg.replace(b"\xff\xc0", b"\xff\xc9", 1)
    base_pixels = decode_image(jpg)
    try:
        assert decode_image(arith) != base_pixels
    except ValueError:
        pass
    with pytest.raises(ValueError):
        decode_image(jpg[: len(jpg) // 2])  # truncated entropy data
    # a baseline body relabeled SOF2 is NOT silently decoded: the
    # sequential scan header (Ss=0 Se=63) is invalid for progressive
    prog = jpg.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_image(prog)


def test_jpeg_flows_through_image_features(spark):
    from simple_etl_spark.llm.multimodal import image_features

    w, h = 8, 8
    jpg, blocks, samp = encode_jpeg(bytes([200] * 64), w, h, 1)
    df = spark.createDataFrame(
        [(1, bytearray(jpg))], "doc_id bigint, payload binary"
    )
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (8, 8, 1)
    ref = reference_decode(blocks, samp, w, h, 1)
    assert row["mean_px"] == sum(ref) // len(ref)


# --- review r9 regressions ---------------------------------------------------

def test_truncated_segments_raise_value_error_not_struct_error():
    """struct.error/KeyError must never escape decode_image's
    ValueError contract (they would kill the Spark task instead of
    yielding NULL features)."""
    for payload in (
        b"\xff\xd8\xff\xdd\x00\x02",          # DRI with empty body
        b"\xff\xd8\xff\xc0\x00\x03\x08",      # SOF0 with 1-byte body
    ):
        with pytest.raises(ValueError):
            decode_image(payload)


def test_sos_with_unknown_component_raises_value_error():
    jpg, _, _ = encode_jpeg(bytes([9] * 64), 8, 8, 1)
    sos_at = jpg.index(b"\xff\xda")
    bad = bytearray(jpg)
    bad[sos_at + 5] = 9  # scan selector -> undeclared component id
    with pytest.raises(ValueError):
        decode_image(bytes(bad))


def test_jpeg_header_bomb_is_rejected_before_allocation():
    """A tiny payload declaring 65535x65535 must raise, not allocate
    multi-GB planes (the JPEG sibling of the PNG inflate bound)."""
    import tracemalloc

    jpg, _, _ = encode_jpeg(bytes([9] * 64), 8, 8, 1)
    sof_at = jpg.index(b"\xff\xc0")
    bad = bytearray(jpg)
    struct.pack_into(">HH", bad, sof_at + 5, 65535, 65535)
    tracemalloc.start()
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_image(bytes(bad))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 50_000_000, peak


def test_png_header_bomb_is_rejected():
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 6, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_image(bomb)


def test_gray_with_nontrivial_sampling_factors_is_noninterleaved():
    """T.81 A.2.2: sampling factors are ignored for single-component
    scans — a grayscale file declaring H=V=2 carries exactly the same
    raster-order data units as one declaring 1x1, so patching only the
    SOF sampling byte must not change the decode."""
    w, h = 24, 16  # not a multiple of 16: would over-demand data
    pix = bytes(((x * 7 + y * 13) % 256) for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg(pix, w, h, 1)
    sof_at = jpg.index(b"\xff\xc0")
    patched = bytearray(jpg)
    assert patched[sof_at + 11] == 0x11  # (H<<4)|V for component 1
    patched[sof_at + 11] = 0x22
    ref = decode_image(jpg)
    got = decode_image(bytes(patched))
    assert got == ref


def test_fill_bytes_before_markers_are_legal():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes — both in the header walk and at restart boundaries."""
    w, h = 32, 8
    pix = bytes(((x * 11 + y * 3) % 256) for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg(pix, w, h, 1, restart=2)
    ref = decode_image(jpg)
    # fill before a header marker (DQT)
    dqt_at = jpg.index(b"\xff\xdb")
    padded = jpg[:dqt_at] + b"\xff" + jpg[dqt_at:]
    assert decode_image(padded) == ref
    # fill before the first restart marker
    rst_at = jpg.index(b"\xff\xd0")
    padded2 = jpg[:rst_at] + b"\xff" + jpg[rst_at:]
    assert decode_image(padded2) == ref


def test_bit_reader_accumulator_stays_bounded():
    """Review r9 (reproduced): the accumulator must be REPLACED per
    fill, not appended — appending kept every consumed byte and made
    entropy decode quadratic in scan size."""
    import time

    from simple_etl_spark.llm.multimodal import _JpegBitReader

    buf = bytes([0x55]) * 200_000
    br = _JpegBitReader(buf, 0)
    t0 = time.time()
    for _ in range(len(buf) * 8):
        br.read_bit()
    assert time.time() - t0 < 2.0, "bit reader is superlinear"
    assert br.acc.bit_length() <= 8


def test_larger_jpeg_decodes_in_reasonable_time(spark=None):
    """End-to-end guard for the same defect: a 160x96 4:2:0 image
    (~300 blocks) must decode in well under a second, not minutes."""
    import time

    w, h = 160, 96
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg(pix, w, h, 3, subsample=True)
    t0 = time.time()
    out = decode_image(jpg)
    assert time.time() - t0 < 5.0
    assert out[:3] == (w, h, 3)
    assert out[3] == reference_decode(blocks, samp, w, h, 3)


def _app14(transform):
    data = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
    return bytes([0xFF, 0xEE]) + struct.pack(">H", len(data) + 2) + data


def encode_rgb_jpeg(pix, w, h, rgb_cids=False):
    """Native RGB-colorspace baseline fixture: each channel front-
    ended as an independent gray plane (no color transform), all
    components on QL/table 0, marked RGB via Adobe APP14 transform=0
    or via 'R','G','B' component ids. Returns (jpeg, per_channel
    blocks)."""
    rgb = np.frombuffer(bytes(pix), np.uint8).reshape(h, w, 3)
    ch_blocks = []
    for c in range(3):
        blks, _s, _q, _tq, _th, mcux, mcuy = jpeg_front_end(
            rgb[..., c].tobytes(), w, h, 1, [(1, 1)]
        )
        ch_blocks.append(blks[0])
    cids = (0x52, 0x47, 0x42) if rgb_cids else (1, 2, 3)
    out = bytearray(b"\xff\xd8")
    if not rgb_cids:
        out += _app14(0)
    out += seg(0xDB, dqt_payload(0, QL))
    out += seg(0xC4, dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_LUM))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid in cids:
        sof += bytes([cid, 0x11, 0])
    out += seg(0xC0, sof)
    sos = bytes([3])
    for cid in cids:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    dt, at = _enc_huff(*DC_LUM), _enc_huff(*AC_LUM)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c in range(3):
            zz = [int(v) for v in
                  ch_blocks[c][(my, mx)].flatten()[_JPEG_ZIGZAG]]
            diff = zz[0] - preds[c]
            preds[c] = zz[0]
            s = _category(diff)
            bw.put(*dt[s])
            if s:
                bw.put(_bits_of(diff, s), s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*at[0xF0])
                    run -= 16
                s = _category(v)
                bw.put(*at[(run << 4) | s])
                bw.put(_bits_of(v, s), s)
                run = 0
            if last_nz < 63:
                bw.put(*at[0x00])
    bw.pad()
    out += bytes(bw.out) + b"\xff\xd9"
    return bytes(out), ch_blocks


def _rgb_reference(ch_blocks, w, h):
    """Interleave three independently-decoded gray planes."""
    planes = [reference_decode([b], [(1, 1)], w, h, 1) for b in ch_blocks]
    out = bytearray(w * h * 3)
    for c in range(3):
        out[c::3] = planes[c]
    return bytes(out)


def test_adobe_app14_rgb_decodes_natively():
    """Adobe transform=0 components are literally R/G/B — decoded
    without the YCbCr matrix since r12 (gated fail-loud r10-r11);
    transform=1 is explicit YCbCr and must decode byte-identically to
    the unmarked JFIF file."""
    w, h = 16, 8
    pix = _gradient_rgb(w, h)
    jpg, ch_blocks = encode_rgb_jpeg(pix, w, h)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 3)
    assert got == _rgb_reference(ch_blocks, w, h)
    ycc, _, _ = encode_jpeg(pix, w, h, 3)
    assert decode_image(ycc[:2] + _app14(1) + ycc[2:]) == decode_image(ycc)
    # and RGB data is NOT run through the matrix: the native decode
    # differs from a YCbCr interpretation of the same file
    assert got != decode_image(ycc)[3]


def test_rgb_component_ids_decode_natively():
    """T.81 'R','G','B' component IDs mark an RGB frame even without
    APP14 — same native path."""
    w, h = 8, 8
    pix = _gradient_rgb(w, h)
    jpg, ch_blocks = encode_rgb_jpeg(pix, w, h, rgb_cids=True)
    assert decode_image(jpg)[3] == _rgb_reference(ch_blocks, w, h)


def test_non_divisible_sampling_ratio_3_to_2():
    """T.81 does not require component factors to divide hmax: a
    (3,1)/(2,1)/(1,1) frame has a 3:2 luma:chroma ratio. The pixel
    front end only produces divisible ratios (box-mean needs integer
    boxes), so this fixture crafts DC-only coefficient blocks directly
    — every block flat with a DISTINCT value, so the upsample index
    map (src = x*hc//hmax) is pinned across block boundaries against
    the same index-map oracle."""
    samp = [(3, 1), (2, 1), (1, 1)]
    w, h = 24, 8
    hmax = 3
    coeff_blocks = []
    for ci, (hc, vc) in enumerate(samp):
        mcux = -(-w // (8 * hmax))
        nbx, nby = mcux * hc, vc  # one MCU row at h=8
        blocks = {}
        for by in range(nby):
            for bx in range(nbx):
                blk = np.zeros((8, 8), dtype=np.int64)
                # distinct flat value per (component, block): DC-only,
                # exactly invertible (q0*c/8 is integral for q0 16/17)
                blk[0, 0] = (ci + 1) * 8 + bx * 16
                blocks[(by, bx)] = blk
        coeff_blocks.append(blocks)
    jpg = encode_jpeg_from_coeffs(coeff_blocks, samp, w, h, 3,
                                  [0, 1, 1], [0, 1, 1], 1, 1)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 3)
    assert out == reference_decode(coeff_blocks, samp, w, h, 3)
