"""Multi-scan SEQUENTIAL JPEG (T.81 B.2.3): a sequential frame whose
components are split across several scans — one-per-scan
non-interleaved (what real encoders emit for 4:4:4 "non-interleaved"
mode) or partial interleaved groupings. Closes the r11 gate
"multi-scan sequential JPEG" for BOTH entropy tiers.

Oracle strategy as in the sibling JPEG suites: fixtures share
jpeg_front_end's quantized coefficients, decode is pinned against the
NumPy coefficient-domain pipeline and against the engine's own decode
of the single-scan interleaved twin."""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import _JPEG_ZIGZAG, decode_image

from tests.test_jpeg import (
    AC_CHR,
    AC_LUM,
    DC_CHR,
    DC_LUM,
    _BitWriter,
    _bits_of,
    _category,
    _enc_huff,
    _gradient_rgb,
    dht_payload,
    encode_jpeg,
    jpeg_front_end,
    jpeg_headers,
    reference_decode,
    seg,
)
from tests.test_jpeg_arith import (
    ArithWriter,
    arith_headers,
    enc_ac_band,
    enc_dc_diff,
)


def _zz(block):
    import numpy as np

    return [int(v) for v in np.asarray(block).flatten()[_JPEG_ZIGZAG]]


def _huff_block(bw, dt, at, zz, pred):
    diff = zz[0] - pred
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
    return zz[0]


def _geom(samp, w, h):
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    out = []
    for hc, vc in samp:
        cbw = -(-(-(-w * hc // hmax)) // 8)
        cbh = -(-(-(-h * vc // vmax)) // 8)
        out.append((cbw, cbh))
    return out, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def encode_multiscan(pix, w, h, channels, groups, subsample=False,
                     restart=0):
    """Huffman sequential file with ``groups`` scans (each a list of
    component indices): interleaved within a group, non-interleaved
    for singleton groups."""
    samp = ([(2, 2), (1, 1), (1, 1)] if subsample
            else [(1, 1)] * channels)
    coeff_blocks, samp, quants, tq, th, mcux, mcuy = jpeg_front_end(
        pix, w, h, channels, samp
    )
    geom, mcux, mcuy = _geom(samp, w, h)
    dc_tabs = [_enc_huff(*DC_LUM), _enc_huff(*DC_CHR)]
    ac_tabs = [_enc_huff(*AC_LUM), _enc_huff(*AC_CHR)]
    if channels == 3:
        dhts = (dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_LUM)
                + dht_payload(0, 1, *DC_CHR) + dht_payload(1, 1, *AC_CHR))
    else:
        dhts = dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_LUM)
    out = bytearray(jpeg_headers(w, h, channels, samp, tq, 0xC0,
                                 restart, dhts))
    for group in groups:
        sos = bytes([len(group)])
        for ci in group:
            sos += bytes([ci + 1, (th[ci] << 4) | th[ci]])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        bw = _BitWriter()
        parts = []
        preds = {ci: 0 for ci in group}
        rst = 0

        def flush_rst():
            nonlocal bw, rst
            bw.pad()
            parts.append(bytes(bw.out))
            parts.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            bw = _BitWriter()
            for ci in preds:
                preds[ci] = 0

        if len(group) > 1:
            for m in range(mcux * mcuy):
                if restart and m and m % restart == 0:
                    flush_rst()
                my, mx = divmod(m, mcux)
                for ci in group:
                    hc, vc = samp[ci]
                    for bv in range(vc):
                        for bh in range(hc):
                            zz = _zz(coeff_blocks[ci][
                                (my * vc + bv, mx * hc + bh)])
                            preds[ci] = _huff_block(
                                bw, dc_tabs[th[ci]], ac_tabs[th[ci]],
                                zz, preds[ci])
        else:
            ci = group[0]
            cbw, cbh = geom[ci]
            n = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if restart and n and n % restart == 0:
                        flush_rst()
                    n += 1
                    zz = _zz(coeff_blocks[ci][(by, bx)])
                    preds[ci] = _huff_block(
                        bw, dc_tabs[th[ci]], ac_tabs[th[ci]],
                        zz, preds[ci])
        bw.pad()
        parts.append(bytes(bw.out))
        out += b"".join(parts)
    out += b"\xff\xd9"
    return bytes(out), coeff_blocks, samp


def encode_multiscan_arith(pix, w, h, channels, groups,
                           subsample=False, restart=0):
    """Arithmetic (SOF9) twin of :func:`encode_multiscan`."""
    samp = ([(2, 2), (1, 1), (1, 1)] if subsample
            else [(1, 1)] * channels)
    coeff_blocks, samp, quants, tq, th, mcux, mcuy = jpeg_front_end(
        pix, w, h, channels, samp
    )
    geom, mcux, mcuy = _geom(samp, w, h)
    out = bytearray(arith_headers(w, h, channels, samp, tq, 0xC9,
                                  restart, quants))
    for group in groups:
        sos = bytes([len(group)])
        for ci in group:
            sos += bytes([ci + 1, (th[ci] << 4) | th[ci]])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        wtr = ArithWriter(channels)
        parts = []
        rst = 0

        def flush_rst():
            nonlocal rst
            parts.append(wtr.enc.flush())
            parts.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            wtr.reset()

        def one(ci, by, bx):
            z = _zz(coeff_blocks[ci][(by, bx)])
            diff = z[0] - wtr.last[ci]
            wtr.last[ci] = z[0]
            enc_dc_diff(wtr, ci, th[ci], 0, 1, diff)
            enc_ac_band(wtr, th[ci], 5, z, 1, 63)

        if len(group) > 1:
            for m in range(mcux * mcuy):
                if restart and m and m % restart == 0:
                    flush_rst()
                my, mx = divmod(m, mcux)
                for ci in group:
                    hc, vc = samp[ci]
                    for bv in range(vc):
                        for bh in range(hc):
                            one(ci, my * vc + bv, mx * hc + bh)
        else:
            ci = group[0]
            cbw, cbh = geom[ci]
            n = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if restart and n and n % restart == 0:
                        flush_rst()
                    n += 1
                    one(ci, by, bx)
        parts.append(wtr.enc.flush())
        out += b"".join(parts)
    out += b"\xff\xd9"
    return bytes(out), coeff_blocks, samp


# -- tests ------------------------------------------------------------


def test_huffman_one_component_per_scan_444():
    w, h = 16, 16
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_multiscan(pix, w, h, 3, [[0], [1], [2]])
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)
    base, _, _ = encode_jpeg(pix, w, h, 3)
    assert decode_image(jpg) == decode_image(base)


def test_huffman_grouped_scans_420():
    """[Y] non-interleaved + [Cb,Cr] interleaved, 4:2:0 — the Cb/Cr
    scan's MCU geometry differs from the frame MCU only in which
    components participate."""
    w, h = 20, 12
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_multiscan(pix, w, h, 3, [[0], [1, 2]],
                                         subsample=True)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)


def test_huffman_multiscan_with_restarts():
    w, h = 32, 16
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_multiscan(pix, w, h, 3, [[0], [1], [2]],
                                         restart=3)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)


def test_arith_one_component_per_scan_444():
    w, h = 16, 16
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_multiscan_arith(pix, w, h, 3,
                                               [[0], [1], [2]])
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)


def test_arith_grouped_scans_420_with_restarts():
    w, h = 24, 16
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_multiscan_arith(
        pix, w, h, 3, [[0], [1, 2]], subsample=True, restart=2
    )
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)


def test_component_coded_twice_fails_loud():
    w, h = 8, 8
    pix = _gradient_rgb(w, h)
    jpg, _, _ = encode_multiscan(pix, w, h, 3, [[0], [0], [1], [2]])
    with pytest.raises(ValueError, match="re-codes"):
        decode_image(jpg)


def test_missing_component_fails_loud():
    w, h = 8, 8
    pix = _gradient_rgb(w, h)
    jpg, _, _ = encode_multiscan(pix, w, h, 3, [[0], [1]])
    with pytest.raises(ValueError, match="never codes"):
        decode_image(jpg)
