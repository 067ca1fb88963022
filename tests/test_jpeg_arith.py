"""Arithmetic-coded JPEG (SOF9/SOF10) decode — T.81 Annex D QM-coder
with the Annex F/G statistical models.

Fixture strategy mirrors test_jpeg_progressive.py's dual oracle: the
encoder here shares the baseline encoder's FDCT front end
(tests/test_jpeg.py::jpeg_front_end), so an arithmetic file and a
baseline Huffman file built from the SAME pixels carry IDENTICAL
quantized coefficients, and the decode is checked against

1. ``reference_decode(coeff_blocks)`` — the NumPy coefficient-domain
   pipeline that never sees either bitstream, and
2. the engine's own decode of the Huffman twin — byte identity
   proves the QM entropy tier reconstructs the exact coefficients.

The QM encoder is written from the ENCODER flowcharts (T.81 D.1) in
a deliberately different register organization than the decoder (a
big-integer code fraction with automatic carry propagation and a
CLEARBITS-style flush, vs the decoder's windowed value register), so
a transcription slip in either side's interval arithmetic breaks the
roundtrip instead of cancelling. The Table D.3 state machine is the
one shared artifact — its rows are additionally sanity-pinned below
(Qe ranges, switch states, pointer bounds).
"""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import (
    _JPEG_ZIGZAG,
    _QM_FIXED,
    _QM_STATES,
    decode_image,
)

from tests.test_jpeg import (
    _gradient_rgb,
    dqt_payload,
    encode_jpeg,
    jpeg_front_end,
    reference_decode,
    seg,
)

QL = None  # quant tables come from jpeg_front_end via tq ids


# -- QM encoder (T.81 D.1) -------------------------------------------


class QmEncoder:
    """MPS-at-bottom QM encoder. ``c`` is the interval base as an
    arbitrary-precision integer aligned with ``a`` (16 initial bits +
    one per renormalization), so carry propagation is free."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.nbits = 0

    def encode(self, stats, i, d):
        sv = stats[i]
        qe, nlps, nmps, sw = _QM_STATES[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if d == mps:
            if a >= 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the top
                self.c += a
                a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if a < qe:  # conditional exchange: LPS takes the bottom
                pass
            else:
                self.c += a
                a = qe
            if sw:
                mps ^= 1
            stats[i] = (mps << 7) | nlps
        while a < 0x8000:
            a <<= 1
            self.c <<= 1
            self.nbits += 1
        self.a = a

    def flush(self) -> bytes:
        """Pick the value in [c, c+a) with the most trailing zero
        bits (CLEARBITS), emit it MSB-first with 0x00 stuffed after
        every 0xFF data byte."""
        t = (self.c + self.a - 1) & ~0xFFFF
        if t < self.c:
            t += 0x8000
        total = self.nbits + 16
        nbytes = (total + 7) // 8
        t <<= nbytes * 8 - total
        raw = t.to_bytes(nbytes, "big")
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class ArithWriter:
    """One entropy segment's encoder + statistics (both reset per
    scan and per restart, mirroring the decoder)."""

    def __init__(self, n_comps):
        self.enc = QmEncoder()
        self.dc_stats = {}
        self.ac_stats = {}
        self.fixed = bytearray([_QM_FIXED])
        self.last = [0] * n_comps
        self.ctx = [0] * n_comps
        self._n = n_comps

    def dc(self, tbl):
        return self.dc_stats.setdefault(tbl, bytearray(64))

    def ac(self, tbl):
        return self.ac_stats.setdefault(tbl, bytearray(256))

    def reset(self):
        self.__init__(self._n)


def enc_dc_diff(w, ci, tbl, lo, up, diff):
    enc, stats = w.enc, w.dc(tbl)
    ctx = w.ctx[ci]
    if diff == 0:
        enc.encode(stats, ctx, 0)
        w.ctx[ci] = 0
        return
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    st = ctx + 2 + sign
    if sz == 0:
        enc.encode(stats, st, 0)
        m = 0
    else:
        enc.encode(stats, st, 1)
        m = 1
        st = 20
        while sz >= (m << 1):
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
        enc.encode(stats, st, 0)
    if m < (1 << lo) >> 1:
        w.ctx[ci] = 0
    elif m > (1 << up) >> 1:
        w.ctx[ci] = 12 + sign * 4
    else:
        w.ctx[ci] = 4 + sign * 4
    st += 14
    bit = m >> 1
    while bit:
        enc.encode(stats, st, 1 if sz & bit else 0)
        bit >>= 1


def enc_ac_band(w, tbl, kx, coefz, ss, se):
    """AC coefficients of one block for a first pass (values already
    point-transformed); mirrors the decoder's per-k EOB / zero-run /
    magnitude tree."""
    enc, stats = w.enc, w.ac(tbl)
    kend = se
    while kend >= ss and coefz[kend] == 0:
        kend -= 1
    k = ss
    while k <= kend:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        while coefz[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = coefz[k]
        sign = 1 if v < 0 else 0
        enc.encode(w.fixed, 0, sign)
        sz = (-v if sign else v) - 1
        st += 2
        if sz == 0:
            enc.encode(stats, st, 0)
            m = 0
        else:
            enc.encode(stats, st, 1)
            if sz == 1:
                enc.encode(stats, st, 0)
                m = 1
            else:
                enc.encode(stats, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st += 1
                enc.encode(stats, st, 0)
        st += 14
        bit = m >> 1
        while bit:
            enc.encode(stats, st, 1 if sz & bit else 0)
            bit >>= 1
        k += 1
    if k <= se:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def enc_ac_refine(w, tbl, truez, ss, se, al):
    """AC refinement pass: correction bits for previously-significant
    coefficients, ±1 insertions for newly-significant ones."""
    enc, stats = w.enc, w.ac(tbl)
    ah = al + 1
    prev = [0] * 64
    new = [False] * 64
    for k in range(ss, se + 1):
        av = abs(truez[k])
        prev[k] = av >> ah
        new[k] = (av >> al) == 1 and prev[k] == 0
    kex = se
    while kex >= ss and prev[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            j = k
            while j <= se and not new[j]:
                j += 1
            if j > se:
                enc.encode(stats, st, 1)  # EOB
                return
            enc.encode(stats, st, 0)
        while True:
            if prev[k]:
                enc.encode(stats, st + 2, (abs(truez[k]) >> al) & 1)
                break
            if new[k]:
                enc.encode(stats, st + 1, 1)
                enc.encode(w.fixed, 0, 1 if truez[k] < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1


# -- file assembly ----------------------------------------------------


def _zz(block):
    import numpy as np

    return [int(v) for v in np.asarray(block).flatten()[_JPEG_ZIGZAG]]


def arith_headers(w, h, channels, samp, tq, sof_marker, restart,
                  quants, dac=b""):
    out = bytearray(b"\xff\xd8")
    if channels == 3:
        out += seg(0xDB, dqt_payload(0, quants[0]) + dqt_payload(1, quants[1]))
    else:
        out += seg(0xDB, dqt_payload(0, quants[0]))
    if dac:
        out += seg(0xCC, dac)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tq[ci]])
    out += seg(sof_marker, sof)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    return out


def encode_jpeg_arith(pix, w, h, channels, subsample=False, restart=0,
                      samp=None, dc_cond=None, ac_kx=None):
    """Sequential arithmetic (SOF9) twin of tests/test_jpeg.py::
    encode_jpeg — same front end, QM entropy tier."""
    if samp is None:
        samp = ([(2, 2), (1, 1), (1, 1)] if subsample
                else [(1, 1)] * channels)
    coeff_blocks, samp, quants, tq, th, mcux, mcuy = jpeg_front_end(
        pix, w, h, channels, samp
    )
    n = channels
    dc_cond = dc_cond or {}
    ac_kx = ac_kx or {}
    dac = b""
    for t, (lo, up) in sorted(dc_cond.items()):
        dac += bytes([t, (up << 4) | lo])
    for t, kx in sorted(ac_kx.items()):
        dac += bytes([(1 << 4) | t, kx])
    out = arith_headers(w, h, n, samp, tq, 0xC9, restart, quants, dac)
    sos = bytes([n])
    for ci in range(n):
        sos += bytes([ci + 1, (th[ci] << 4) | th[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    wtr = ArithWriter(n)
    parts = []
    rst = 0
    m_count = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            parts.append(wtr.enc.flush())
            parts.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            wtr.reset()
        my, mx = divmod(m, mcux)
        for ci in range(n):
            hc, vc = samp[ci]
            lo, up = dc_cond.get(th[ci], (0, 1))
            kx = ac_kx.get(th[ci], 5)
            for bv in range(vc):
                for bh in range(hc):
                    blk = coeff_blocks[ci][(my * vc + bv, mx * hc + bh)]
                    z = _zz(blk)
                    diff = z[0] - wtr.last[ci]
                    wtr.last[ci] = z[0]
                    enc_dc_diff(wtr, ci, th[ci], lo, up, diff)
                    enc_ac_band(wtr, th[ci], kx, z, 1, 63)
        m_count += 1
    parts.append(wtr.enc.flush())
    out += b"".join(parts)
    out += b"\xff\xd9"
    return bytes(out), coeff_blocks, samp


def encode_jpeg_arith_progressive(pix, w, h, channels, script,
                                  restart=0):
    """Progressive arithmetic (SOF10): ``script`` entries are
    (comp_indices, ss, se, ah, al) exactly as the Huffman progressive
    test encoder takes them."""
    samp = ([(2, 2), (1, 1), (1, 1)] if channels == 3
            else [(1, 1)] * channels)
    coeff_blocks, samp, quants, tq, th, mcux, mcuy = jpeg_front_end(
        pix, w, h, channels, samp
    )
    n = channels
    out = arith_headers(w, h, n, samp, tq, 0xCA, restart, quants)

    # per-component non-interleaved block dims (same arithmetic the
    # decoder's _JpegProgState.geom uses)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    geom = []
    for ci in range(n):
        hc, vc = samp[ci]
        cbw = -(-(-(-w * hc // hmax)) // 8)
        cbh = -(-(-(-h * vc // vmax)) // 8)
        geom.append((cbw, cbh))

    for comp_idx, ss, se, ah, al in script:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, (th[ci] << 4) | th[ci]])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        wtr = ArithWriter(n)
        parts = []
        rst = 0

        def maybe_restart(i):
            nonlocal rst
            if restart and i and i % restart == 0:
                parts.append(wtr.enc.flush())
                parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                wtr.reset()

        if ss == 0:
            if len(comp_idx) > 1:
                for m in range(mcux * mcuy):
                    maybe_restart(m)
                    my, mx = divmod(m, mcux)
                    for ci in comp_idx:
                        hc, vc = samp[ci]
                        lo, up = (0, 1)
                        for bv in range(vc):
                            for bh in range(hc):
                                z0 = _zz(coeff_blocks[ci][
                                    (my * vc + bv, mx * hc + bh)])[0]
                                if ah == 0:
                                    v = z0 >> al
                                    enc_dc_diff(wtr, ci, th[ci], lo,
                                                up, v - wtr.last[ci])
                                    wtr.last[ci] = v
                                else:
                                    wtr.enc.encode(
                                        wtr.fixed, 0, (z0 >> al) & 1
                                    )
            else:
                ci = comp_idx[0]
                cbw, cbh = geom[ci]
                i = 0
                for by in range(cbh):
                    for bx in range(cbw):
                        maybe_restart(i)
                        i += 1
                        z0 = _zz(coeff_blocks[ci][(by, bx)])[0]
                        if ah == 0:
                            v = z0 >> al
                            enc_dc_diff(wtr, ci, th[ci], (0, 1)[0], 1,
                                        v - wtr.last[ci])
                            wtr.last[ci] = v
                        else:
                            wtr.enc.encode(wtr.fixed, 0, (z0 >> al) & 1)
        else:
            ci = comp_idx[0]
            cbw, cbh = geom[ci]
            i = 0
            for by in range(cbh):
                for bx in range(cbw):
                    maybe_restart(i)
                    i += 1
                    z = _zz(coeff_blocks[ci][(by, bx)])
                    if ah == 0:
                        pt = [0] * 64
                        for k in range(ss, se + 1):
                            av = abs(z[k]) >> al
                            pt[k] = -av if z[k] < 0 else av
                        enc_ac_band(wtr, th[ci], 5, pt, ss, se)
                    else:
                        enc_ac_refine(wtr, th[ci], z, ss, se, al)
        parts.append(wtr.enc.flush())
        out += b"".join(parts)
    out += b"\xff\xd9"
    return bytes(out), coeff_blocks, samp


# -- tests ------------------------------------------------------------


def test_qm_state_table_invariants():
    """Structural pins on the Table D.3 transcription: 113 adaptive
    states + the fixed bin; Qe below the renorm bound everywhere;
    switch exactly on the ten Qe>0.5-region states; pointers in
    range; NMPS advances by one except at chain ends."""
    assert len(_QM_STATES) == 114
    switches = [i for i, (_q, _nl, _nm, sw) in enumerate(_QM_STATES) if sw]
    assert switches == [0, 14, 36, 64, 80, 88, 95, 105, 110, 112]
    for i, (qe, nl, nm, _sw) in enumerate(_QM_STATES):
        assert 1 <= qe < 0x8000
        assert 0 <= nl < 114 and 0 <= nm < 114
    qe_f, nl_f, nm_f, sw_f = _QM_STATES[_QM_FIXED]
    assert (nl_f, nm_f, sw_f) == (113, 113, 0)


def test_qm_coder_roundtrips_biased_and_mixed_bits():
    """Encoder/decoder roundtrip across bias regimes, adaptive and
    fixed bins, including renormalization storms and byte stuffing."""
    from simple_etl_spark.llm.multimodal import _QmDecoder

    import random

    rng = random.Random(42)
    bits = []
    for p in (0.5, 0.9, 0.02, 0.7):
        bits += [1 if rng.random() < p else 0 for _ in range(800)]
    enc = QmEncoder()
    st_e = bytearray(4)
    fx_e = bytearray([_QM_FIXED])
    for j, b in enumerate(bits):
        if j % 7 == 3:
            enc.encode(fx_e, 0, b)
        else:
            enc.encode(st_e, j % 4, b)
    data = enc.flush() + b"\xff\xd9"
    dec = _QmDecoder(data, 0)
    st_d = bytearray(4)
    fx_d = bytearray([_QM_FIXED])
    for j, b in enumerate(bits):
        if j % 7 == 3:
            assert dec.decode(fx_d, 0) == b, f"bit {j}"
        else:
            assert dec.decode(st_d, j % 4) == b, f"bit {j}"


def test_flat_gray_matches_huffman_twin_exactly():
    w, h = 16, 8
    pix = bytes([173] * (w * h))
    jpg, blocks, samp = encode_jpeg_arith(pix, w, h, 1)
    base, _, _ = encode_jpeg(pix, w, h, 1)
    assert decode_image(jpg) == decode_image(base)


def test_gray_gradient_matches_reference_and_twin():
    w, h = 24, 16
    pix = bytes((x * 7 + y * 11) % 256 for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg_arith(pix, w, h, 1)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 1)
    base, _, _ = encode_jpeg(pix, w, h, 1)
    assert decode_image(jpg) == decode_image(base)


def test_rgb_444_matches_reference():
    w, h = 16, 16
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg_arith(pix, w, h, 3)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)


def test_rgb_420_subsampled_matches_reference():
    w, h = 20, 12
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg_arith(pix, w, h, 3, subsample=True)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)


def test_restart_markers_reset_arith_state():
    w, h = 48, 8  # 6 MCUs, restart every 2
    pix = bytes((x * 5 + y * 3) % 256 for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg_arith(pix, w, h, 1, restart=2)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 1)


def test_dac_conditioning_values_respected():
    """Non-default conditioning (DC L/U and AC Kx) changes the coded
    stream; encoder and decoder agreeing on the DAC segment is the
    test."""
    w, h = 24, 16
    pix = bytes((x * x + 3 * y) % 256 for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg_arith(
        pix, w, h, 1, dc_cond={0: (2, 4)}, ac_kx={0: 13}
    )
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 1)


def test_progressive_spectral_selection():
    w, h = 16, 16
    pix = bytes((x * 13 + y * 5) % 256 for y in range(h) for x in range(w))
    script = [([0], 0, 0, 0, 0), ([0], 1, 9, 0, 0), ([0], 10, 63, 0, 0)]
    jpg, blocks, samp = encode_jpeg_arith_progressive(pix, w, h, 1, script)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 1)
    base, _, _ = encode_jpeg(pix, w, h, 1)
    assert decode_image(jpg) == decode_image(base)


def test_progressive_successive_approximation_gray():
    w, h = 16, 16
    pix = bytes((x * 13 + y * 5) % 256 for y in range(h) for x in range(w))
    script = [
        ([0], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    jpg, blocks, samp = encode_jpeg_arith_progressive(pix, w, h, 1, script)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 1)


def test_progressive_rgb_interleaved_dc_full_script():
    w, h = 16, 16
    pix = _gradient_rgb(w, h)
    script = [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    jpg, blocks, samp = encode_jpeg_arith_progressive(pix, w, h, 3, script)
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 3)


def test_progressive_restart_markers():
    w, h = 32, 32
    pix = bytes((x * 3 + y * 7) % 256 for y in range(h) for x in range(w))
    script = [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)]
    jpg, blocks, samp = encode_jpeg_arith_progressive(
        pix, w, h, 1, script, restart=3
    )
    assert decode_image(jpg)[3] == reference_decode(blocks, samp, w, h, 1)


def test_dac_rejects_bad_conditioning():
    w, h = 8, 8
    jpg, _, _ = encode_jpeg_arith(bytes([9] * 64), w, h, 1)
    at = jpg.index(b"\xff\xc9")
    # inject a DAC with Kx=0 before the SOF
    bad = jpg[:at] + seg(0xCC, bytes([0x10, 0])) + jpg[at:]
    with pytest.raises(ValueError, match="Kx"):
        decode_image(bad)
    bad2 = jpg[:at] + seg(0xCC, bytes([0x00, 0x27])) + jpg[at:]  # L=7>U=2
    with pytest.raises(ValueError, match="L="):
        decode_image(bad2)


def test_truncated_arith_stream_fails_loud():
    w, h = 16, 16
    pix = bytes((x * 13 + y * 5) % 256 for y in range(h) for x in range(w))
    jpg, _, _ = encode_jpeg_arith(pix, w, h, 1)
    with pytest.raises(ValueError):
        decode_image(jpg[: len(jpg) - (len(jpg) - jpg.index(b"\xff\xda")) // 2])


def test_arith_jpeg_flows_through_image_features(spark):
    """The Spark-side plumbing (mapInPandas image_features) reaches
    the QM tier through the same dispatch as every other format."""
    from simple_etl_spark.llm.multimodal import image_features

    w, h = 8, 8
    jpg, blocks, samp = encode_jpeg_arith(bytes([200] * 64), w, h, 1)
    df = spark.createDataFrame(
        [(1, bytearray(jpg))], "doc_id bigint, payload binary"
    )
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (8, 8, 1)


def test_arith_gray_nontrivial_sampling_is_noninterleaved():
    """T.81 A.2.2: sampling factors are ignored in a single-component
    frame — a gray SOF9 relabeled 2x2 must decode identically (the
    normalization lives in the shared _jpeg_validate_frame)."""
    w, h = 24, 16
    pix = bytes((x * 7 + y * 11) % 256 for y in range(h) for x in range(w))
    jpg, _, _ = encode_jpeg_arith(pix, w, h, 1)
    at = jpg.index(b"\xff\xc9")
    hv_off = at + 11  # marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1)
    assert jpg[hv_off] == 0x11
    patched = jpg[:hv_off] + bytes([0x22]) + jpg[hv_off + 1:]
    assert decode_image(patched) == decode_image(jpg)


def test_12bit_arith_sequential_matches_oracle():
    """SOF9 at 12-bit precision (T.81 allows 8/12 for the DCT modes):
    the QM entropy tier + 16-bit Pq=1 quant tables + the 12-bit
    output-domain scaling, pinned against the coefficient oracle."""
    from tests.test_jpeg_12bit import (
        QL12,
        _coeffs12,
        _gradient12,
        reference_decode12,
    )

    w, h = 21, 13
    pix12 = _gradient12(w, h)
    blocks, mcux, mcuy = _coeffs12(pix12, w, h)

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x10])
    for z in range(64):
        dqt += struct.pack(">H", QL12[_JPEG_ZIGZAG[z]])
    out += seg(0xDB, dqt)
    sof = bytes([12]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += seg(0xC9, sof)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wtr = ArithWriter(1)
    for by in range(mcuy):
        for bx in range(mcux):
            z = _zz(blocks[(by, bx)])
            diff = z[0] - wtr.last[0]
            wtr.last[0] = z[0]
            enc_dc_diff(wtr, 0, 0, 0, 1, diff)
            enc_ac_band(wtr, 0, 5, z, 1, 63)
    out += wtr.enc.flush() + b"\xff\xd9"

    gw, gh, ch, got = decode_image(bytes(out))
    assert (gw, gh, ch) == (w, h, 1)
    assert got == reference_decode12(blocks, w, h)


def test_fuzzed_entropy_bodies_fail_loud_or_decode():
    """A QM stream carries no redundancy, so random entropy bodies
    may 'decode'; what they must never do is hang, IndexError, or
    crash the statistical models — every outcome is a clean decode or
    a ValueError (magnitude-overflow / run-past-band / truncation
    guards)."""
    import random

    w, h = 16, 16
    pix = bytes((x * 13 + y * 5) % 256 for y in range(h) for x in range(w))
    jpg, _, _ = encode_jpeg_arith(pix, w, h, 1)
    sos_at = jpg.index(b"\xff\xda")
    body_at = sos_at + 2 + struct.unpack(">H", jpg[sos_at + 2:sos_at + 4])[0]
    head = jpg[:body_at]
    rng = random.Random(1234)
    for trial in range(40):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(4, 400)))
        try:
            decode_image(head + body + b"\xff\xd9")
        except ValueError:
            pass
