"""12-bit JPEG decode (T.81 extended sequential SOF1 and progressive
SOF2 at sample precision 12, with 16-bit (Pq=1) quantization tables).

Fixtures are grayscale 12-bit images built by a minimal test encoder
over the shared _BitWriter/Huffman plumbing; the oracle is the same
bitstream-independent NumPy pipeline pattern as tests/test_jpeg.py —
dequantize the encoder's quantized coefficients, matrix-IDCT, level
shift by 2048, clamp to 0..4095, then scale into the 8-bit output
domain with the decoder's documented rounding ((v*255 + 2047) //
4095, the 16-bit PNG precedent).
"""

from __future__ import annotations

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import _JPEG_ZIGZAG, decode_image

from tests.test_jpeg import (
    DC_LUM,
    QL,
    _BitWriter,
    _bits_of,
    _category,
    _D,
    _enc_huff,
    seg,
)
from tests.test_jpeg_progressive import (
    AC_PROG,
    _default_script,
    dht_payload,
)

# 16-bit quantization table: the 8-bit Annex K luminance table scaled
# 20x so entries overflow one byte (max 121*20 = 2420) and Pq=1 is
# genuinely exercised.
QL12 = [q * 20 for q in QL]

AC_SEQ = AC_PROG  # the flat 176-symbol table works for sequential too


def _coeffs12(pix12, w, h):
    """FDCT + quantize 12-bit grayscale samples (level shift 2048)."""
    p = np.asarray(pix12, dtype=np.float64).reshape(h, w)
    mcux, mcuy = -(-w // 8), -(-h // 8)
    pad = np.empty((mcuy * 8, mcux * 8))
    pad[:h, :w] = p
    pad[h:, :w] = p[h - 1 : h, :]
    pad[:, w:] = pad[:, w - 1 : w]
    q = np.array(QL12).reshape(8, 8)
    blocks = {}
    for by in range(mcuy):
        for bx in range(mcux):
            blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 2048.0
            f = _D @ blk @ _D.T
            blocks[(by, bx)] = np.round(f / q).astype(np.int64)
    return blocks, mcux, mcuy


def _headers12(w, h, sof_marker):
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x10])  # Pq=1, Tq=0
    for z in range(64):
        dqt += struct.pack(">H", QL12[_JPEG_ZIGZAG[z]])
    out += seg(0xDB, dqt)
    out += seg(0xC4, dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_SEQ))
    sof = bytes([12]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += seg(sof_marker, sof)
    return out


def encode_jpeg12_gray(pix12, w, h):
    """Extended sequential (SOF1) 12-bit grayscale encoder."""
    blocks, mcux, mcuy = _coeffs12(pix12, w, h)
    dt = _enc_huff(*DC_LUM)
    at = _enc_huff(*AC_SEQ)
    bw = _BitWriter()
    pred = 0
    for by in range(mcuy):
        for bx in range(mcux):
            zz = [int(v) for v in blocks[(by, bx)].flatten()[_JPEG_ZIGZAG]]
            diff = zz[0] - pred
            pred = zz[0]
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
    out = _headers12(w, h, 0xC1)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(bw.out) + b"\xff\xd9"
    return bytes(out), blocks


def encode_jpeg12_gray_progressive(pix12, w, h):
    """Progressive (SOF2) 12-bit grayscale encoder, reusing the 8-bit
    progressive scan encoders (they are precision-agnostic: they read
    quantized coefficients and Al shifts only)."""
    from tests.test_jpeg_progressive import (
        _ScanWriter,
        _encode_ac_first_scan,
        _encode_ac_refine_scan,
        _encode_dc_scan,
    )

    blocks, mcux, mcuy = _coeffs12(pix12, w, h)
    coeff_blocks = [blocks]
    samp = [(1, 1)]
    dc_tabs = [_enc_huff(*DC_LUM)]
    at = _enc_huff(*AC_PROG)
    out = bytearray(_headers12(w, h, 0xC2))
    for comps, ss, se, ah, al in _default_script(1):
        sos = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        sw = _ScanWriter()
        if ss == 0:
            _encode_dc_scan(sw, coeff_blocks, samp, comps, ah, al,
                            dc_tabs, [0], mcux, mcuy, w, h, 0)
        elif ah == 0:
            _encode_ac_first_scan(sw, coeff_blocks, samp, 0, ss, se, al,
                                  at, w, h, 0)
        else:
            _encode_ac_refine_scan(sw, coeff_blocks, samp, 0, ss, se, al,
                                   at, w, h, 0)
        out += sw.body()
    out += b"\xff\xd9"
    return bytes(out), blocks


def reference_decode12(blocks, w, h):
    """Bitstream-independent oracle: dequant → matrix IDCT → +2048 →
    clamp 0..4095 → exact 8-bit scaling."""
    q = np.array(QL12).reshape(8, 8)
    nby = max(k[0] for k in blocks) + 1
    nbx = max(k[1] for k in blocks) + 1
    plane = np.zeros((nby * 8, nbx * 8), dtype=np.int64)
    for (by, bx), blk in blocks.items():
        f = blk.astype(np.float64) * q
        s = _D.T @ f @ _D
        px = np.clip(np.round(s).astype(np.int64) + 2048, 0, 4095)
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    scaled = (plane * 255 + 2047) // 4095
    return scaled[:h, :w].astype(np.uint8).tobytes()


def _gradient12(w, h):
    return [((x * 4095) // max(w - 1, 1) + (y * 977)) % 4096
            for y in range(h) for x in range(w)]


def test_12bit_sequential_matches_coefficient_oracle():
    w, h = 21, 13
    pix = _gradient12(w, h)
    jpg, blocks = encode_jpeg12_gray(pix, w, h)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 1)
    assert out == reference_decode12(blocks, w, h)


def test_12bit_flat_block_is_analytic():
    """A flat 12-bit block is DC-only: decoded value has a closed
    form — quantize(8*(v-2048)/q0) dequantized back and scaled."""
    v = 3000
    jpg, _ = encode_jpeg12_gray([v] * 64, 8, 8)
    _, _, _, out = decode_image(jpg)
    q0 = QL12[0]
    dc = round((v - 2048) * 8 / q0) * q0 / 8
    expect = max(0, min(4095, round(dc) + 2048))
    expect8 = (expect * 255 + 2047) // 4095
    assert set(out) == {expect8}, (set(out), expect8)


def test_12bit_progressive_matches_sequential():
    w, h = 24, 16
    pix = _gradient12(w, h)
    base, blocks = encode_jpeg12_gray(pix, w, h)
    prog, _ = encode_jpeg12_gray_progressive(pix, w, h)
    assert decode_image(prog) == decode_image(base)
    assert decode_image(base)[3] == reference_decode12(blocks, w, h)


def test_12bit_baseline_sof0_is_malformed():
    w, h = 8, 8
    jpg, _ = encode_jpeg12_gray([2048] * 64, w, h)
    bad = jpg.replace(b"\xff\xc1", b"\xff\xc0", 1)
    with pytest.raises(ValueError, match="must be 8-bit"):
        decode_image(bad)


def test_16bit_sample_precision_is_malformed():
    w, h = 8, 8
    jpg, _ = encode_jpeg12_gray([2048] * 64, w, h)
    i = jpg.index(b"\xff\xc1")
    body = bytearray(jpg)
    body[i + 4] = 16  # precision byte
    with pytest.raises(ValueError, match="16-bit JPEG DCT"):
        decode_image(bytes(body))


def test_truncated_16bit_dqt_is_malformed():
    w, h = 8, 8
    jpg, _ = encode_jpeg12_gray([2048] * 64, w, h)
    i = jpg.index(b"\xff\xdb")
    # shrink the DQT segment length so the 16-bit table is truncated
    body = bytearray(jpg)
    body[i + 2 : i + 4] = struct.pack(">H", 2 + 100)
    with pytest.raises(ValueError):
        decode_image(bytes(body))
