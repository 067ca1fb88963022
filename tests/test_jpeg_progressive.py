"""Progressive (SOF2) JPEG decode — T.81 Annex G.

The fixture encoder here shares the baseline encoder's FDCT front
end (tests/test_jpeg.py::jpeg_front_end), so a progressive file and
a baseline file built from the SAME pixels carry IDENTICAL quantized
coefficients. That gives two independent oracles:

1. ``reference_decode(coeff_blocks)`` — the NumPy coefficient-domain
   pipeline that never sees either bitstream (encoder/decoder
   bitstream bugs cannot cancel through it), and
2. the engine's own SEQUENTIAL decode of the baseline twin — byte
   identity between the two engine outputs proves the progressive
   scan accumulation reconstructs the exact coefficient array.

The encoder mirrors the libjpeg scan-script semantics (DC first/
refine, AC first/refine with EOB-run accumulation and buffered
correction bits) as T.81 G.1.2 specifies them, including restart
markers, so the decoder's hardest paths — EOBRUN spanning blocks,
refinement correction bits inside ZRL spans and EOB runs, successive
approximation down to Al=0 — are all exercised with byte-built
files.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import _JPEG_ZIGZAG, decode_image

from tests.test_jpeg import (
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

# A single AC Huffman table holding EVERY symbol a progressive AC
# scan can emit: EOBn (n 0-14), ZRL, and (run<<4)|size for size 1-10.
# The Annex K sequential tables lack the EOBn codes (n>=1), which is
# why progressive encoders ship custom tables. All 176 symbols at
# code length 8 is a valid canonical set (176 < 256, all-ones unused).
_AC_PROG_SYMBOLS = (
    [r << 4 for r in range(15)]            # EOB0..EOB14
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
AC_PROG = ([0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_SYMBOLS), 0, 0, 0, 0, 0,
            0, 0, 0], _AC_PROG_SYMBOLS)


def _default_script(channels):
    """libjpeg-style script: DC first (Al=1), banded AC first scans,
    AC refinements, DC refinement — every coefficient reaches Al=0."""
    if channels == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
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


def _spectral_only_script(channels):
    """Spectral selection without successive approximation (Ah=Al=0
    everywhere) — isolates the band/EOBRUN machinery from the
    refinement machinery."""
    if channels == 1:
        return [([0], 0, 0, 0, 0), ([0], 1, 9, 0, 0), ([0], 10, 63, 0, 0)]
    return [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 20, 0, 0),
        ([1], 21, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]


def _zz_of(block):
    return [int(v) for v in block.flatten()[_JPEG_ZIGZAG]]


class _ScanWriter:
    """Entropy writer for one progressive scan, with restart-marker
    segmentation (flush EOB run, byte-align, emit RSTn)."""

    def __init__(self):
        self.bw = _BitWriter()
        self.parts = []
        self.rst = 0

    def restart(self):
        self.bw.pad()
        self.parts.append(bytes(self.bw.out))
        self.parts.append(bytes([0xFF, 0xD0 + self.rst]))
        self.bw = _BitWriter()
        self.rst = (self.rst + 1) & 7

    def body(self):
        self.bw.pad()
        self.parts.append(bytes(self.bw.out))
        return b"".join(self.parts)


def _nonint_dims(w, h, samp, ci):
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    hc, vc = samp[ci]
    cpw = -(-w * hc // hmax)
    cph = -(-h * vc // vmax)
    return -(-cpw // 8), -(-cph // 8)


def _encode_dc_scan(sw, coeff_blocks, samp, comps, ah, al, dc_tabs, th,
                    mcux, mcuy, w, h, restart):
    """DC scan: interleaved MCU order when len(comps)>1, else the
    component's own non-interleaved raster (T.81 A.2.2)."""
    bw = None  # always use sw.bw (restart() swaps it)
    if len(comps) > 1:
        preds = {ci: 0 for ci in comps}
        for m in range(mcux * mcuy):
            if restart and m and m % restart == 0:
                sw.restart()
                preds = {ci: 0 for ci in comps}
            my, mx = divmod(m, mcux)
            for ci in comps:
                hc, vc = samp[ci]
                dt = dc_tabs[th[ci]]
                for bv in range(vc):
                    for bh in range(hc):
                        zz0 = int(coeff_blocks[ci][
                            (my * vc + bv, mx * hc + bh)].flatten()[0])
                        _put_dc(sw.bw, zz0, ah, al, dt, preds, ci)
    else:
        ci = comps[0]
        cbw, cbh = _nonint_dims(w, h, samp, ci)
        dt = dc_tabs[th[ci]]
        preds = {ci: 0}
        n = 0
        for by in range(cbh):
            for bx in range(cbw):
                if restart and n and n % restart == 0:
                    sw.restart()
                    preds = {ci: 0}
                n += 1
                zz0 = int(coeff_blocks[ci][(by, bx)].flatten()[0])
                _put_dc(sw.bw, zz0, ah, al, dt, preds, ci)


def _put_dc(bw, zz0, ah, al, dt, preds, ci):
    if ah == 0:
        tv = zz0 >> al  # arithmetic shift: the DC point transform
        diff = tv - preds[ci]
        preds[ci] = tv
        s = _category(diff)
        bw.put(*dt[s])
        if s:
            bw.put(_bits_of(diff, s), s)
    else:
        bw.put((zz0 >> al) & 1, 1)


def _ac_shift(v, al):
    """AC point transform: magnitude shift with sign restored
    (T.81 G.1.2.2 — truncation toward zero, unlike the DC shift)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _encode_ac_first_scan(sw, coeff_blocks, samp, ci, ss, se, al,
                          at, w, h, restart):
    cbw, cbh = _nonint_dims(w, h, samp, ci)
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            sw.bw.put(*at[n << 4])
            if n:
                sw.bw.put(eobrun - (1 << n), n)
            eobrun = 0

    n_blk = 0
    for by in range(cbh):
        for bx in range(cbw):
            if restart and n_blk and n_blk % restart == 0:
                flush()
                sw.restart()
            n_blk += 1
            zz = _zz_of(coeff_blocks[ci][(by, bx)])
            az = [_ac_shift(zz[k], al) for k in range(64)]
            last_nz = max((k for k in range(ss, se + 1) if az[k]),
                          default=None)
            if last_nz is None:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            for k in range(ss, last_nz + 1):
                v = az[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sw.bw.put(*at[0xF0])
                    run -= 16
                s = _category(v)
                sw.bw.put(*at[(run << 4) | s])
                sw.bw.put(_bits_of(v, s), s)
                run = 0
            if last_nz < se:
                eobrun += 1
    flush()


def _encode_ac_refine_scan(sw, coeff_blocks, samp, ci, ss, se, al,
                           at, w, h, restart):
    """T.81 G.1.2.3 refinement with libjpeg's buffered-correction-bit
    structure: bits for already-nonzero coefficients inside an EOB
    run are held until the run flushes, so they land exactly where
    the decoder's per-block tail loops will read them."""
    cbw, cbh = _nonint_dims(w, h, samp, ci)
    eobrun = 0
    pend = []  # correction bits riding with the pending EOB run

    def flush():
        nonlocal eobrun, pend
        if eobrun:
            n = eobrun.bit_length() - 1
            sw.bw.put(*at[n << 4])
            if n:
                sw.bw.put(eobrun - (1 << n), n)
            eobrun = 0
        for b in pend:
            sw.bw.put(b, 1)
        pend = []

    n_blk = 0
    for by in range(cbh):
        for bx in range(cbw):
            if restart and n_blk and n_blk % restart == 0:
                flush()
                sw.restart()
            n_blk += 1
            zz = _zz_of(coeff_blocks[ci][(by, bx)])
            az = [_ac_shift(zz[k], al) for k in range(64)]
            eob = max((k for k in range(ss, se + 1) if abs(az[k]) == 1),
                      default=ss - 1)
            run = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = az[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    flush()
                    sw.bw.put(*at[0xF0])
                    run -= 16
                    for b in br:
                        sw.bw.put(b, 1)
                    br = []
                if abs(t) > 1:
                    br.append(abs(t) & 1)
                    continue
                flush()
                sw.bw.put(*at[(run << 4) | 1])
                sw.bw.put(1 if t > 0 else 0, 1)
                for b in br:
                    sw.bw.put(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                pend.extend(br)
                if eobrun == 0x7FFF:
                    flush()
    flush()


def encode_jpeg_progressive(pix, w, h, channels, samp=None, script=None,
                            restart=0):
    """Progressive encoder over the shared FDCT front end. Returns
    (jpeg_bytes, coeff_blocks, samp)."""
    if samp is None:
        samp = [(1, 1)] * channels
    coeff_blocks, samp, _quants, tq, th, mcux, mcuy = jpeg_front_end(
        pix, w, h, channels, samp
    )
    if script is None:
        script = _default_script(channels)
    dc_tabs = [_enc_huff(*DC_LUM), _enc_huff(*DC_CHR)]
    at = _enc_huff(*AC_PROG)
    dhts = dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_PROG)
    if channels == 3:
        dhts += dht_payload(0, 1, *DC_CHR)
    out = bytearray(jpeg_headers(w, h, channels, samp, tq, 0xC2,
                                 restart, dhts))
    for comps, ss, se, ah, al in script:
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([ci + 1, (th[ci] << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        sw = _ScanWriter()
        if ss == 0:
            _encode_dc_scan(sw, coeff_blocks, samp, comps, ah, al,
                            dc_tabs, th, mcux, mcuy, w, h, restart)
        elif ah == 0:
            _encode_ac_first_scan(sw, coeff_blocks, samp, comps[0],
                                  ss, se, al, at, w, h, restart)
        else:
            _encode_ac_refine_scan(sw, coeff_blocks, samp, comps[0],
                                   ss, se, al, at, w, h, restart)
        out += sw.body()
    out += b"\xff\xd9"
    return bytes(out), coeff_blocks, samp


def _noise_rgb(w, h, seed=7):
    """Deterministic busy image: every block gets mid- and
    high-frequency AC content so refinement scans carry real
    correction bits and newly-nonzero insertions."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()


def _assert_near(out, ref, tol=2, exact=0.99):
    a = np.frombuffer(out, np.uint8).astype(int)
    b = np.frombuffer(ref, np.uint8).astype(int)
    d = np.abs(a - b)
    assert d.max() <= tol, d.max()
    assert (d == 0).mean() >= exact, (d == 0).mean()


# --- tests -------------------------------------------------------------------


def test_gray_progressive_matches_coefficient_oracle():
    w, h = 24, 17
    pix = bytes(((x * 7 + y * 13) % 256) for y in range(h) for x in range(w))
    jpg, blocks, samp = encode_jpeg_progressive(pix, w, h, 1)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 1)
    assert out == reference_decode(blocks, samp, w, h, 1)


def test_rgb_444_progressive_matches_coefficient_oracle():
    w, h = 19, 13
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg_progressive(pix, w, h, 3)
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 3)
    assert out == reference_decode(blocks, samp, w, h, 3)


def test_rgb_420_progressive_matches_coefficient_oracle():
    w, h = 37, 23  # odd dims: MCU padding + non-interleaved dims differ
    pix = _gradient_rgb(w, h)
    jpg, blocks, samp = encode_jpeg_progressive(
        pix, w, h, 3, samp=[(2, 2), (1, 1), (1, 1)]
    )
    gw, gh, nch, out = decode_image(jpg)
    assert (gw, gh, nch) == (w, h, 3)
    _assert_near(out, reference_decode(blocks, samp, w, h, 3))


def test_progressive_equals_baseline_pixels_noise():
    """The strongest identity: engine-progressive == engine-baseline
    byte-for-byte on a busy image (identical coefficients in, so the
    scan accumulation must reconstruct the exact array — float-tie
    concerns cancel because both go through the same IDCT)."""
    w, h = 32, 24
    pix = _noise_rgb(w, h)
    base, _, _ = encode_jpeg(pix, w, h, 3)
    prog, _, _ = encode_jpeg_progressive(pix, w, h, 3)
    assert decode_image(prog) == decode_image(base)


def test_progressive_equals_baseline_pixels_subsampled():
    w, h = 29, 18
    pix = _noise_rgb(w, h, seed=11)
    base, _, _ = encode_jpeg(pix, w, h, 3, subsample=True)
    prog, _, _ = encode_jpeg_progressive(
        pix, w, h, 3, samp=[(2, 2), (1, 1), (1, 1)]
    )
    assert decode_image(prog) == decode_image(base)


def test_spectral_only_script():
    w, h = 16, 16
    pix = _noise_rgb(w, h, seed=3)
    base, _, _ = encode_jpeg(pix, w, h, 3)
    prog, _, _ = encode_jpeg_progressive(
        pix, w, h, 3, script=_spectral_only_script(3)
    )
    assert decode_image(prog) == decode_image(base)


def test_single_component_dc_scans_are_noninterleaved():
    """A script whose DC scans cover one component each (ns=1) must
    use the component's own raster, not MCU order."""
    w, h = 20, 12
    pix = _noise_rgb(w, h, seed=5)
    script = [
        ([0], 0, 0, 0, 0),
        ([1], 0, 0, 0, 0),
        ([2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base, _, _ = encode_jpeg(pix, w, h, 3, subsample=True)
    prog, _, _ = encode_jpeg_progressive(
        pix, w, h, 3, samp=[(2, 2), (1, 1), (1, 1)], script=script
    )
    assert decode_image(prog) == decode_image(base)


def test_restart_markers_in_progressive_scans():
    w, h = 48, 16
    pix = _noise_rgb(w, h, seed=9)
    base, _, _ = encode_jpeg(pix, w, h, 3)
    prog, _, _ = encode_jpeg_progressive(pix, w, h, 3, restart=2)
    assert decode_image(prog) == decode_image(base)


def test_eobrun_spans_many_blocks():
    """A flat image has zero AC everywhere: the AC first scan is one
    EOBn code covering every block, and the refinement scans are
    EOB runs with no correction bits."""
    w, h = 64, 16  # 16 blocks
    pix = bytes([77]) * (w * h)
    jpg, blocks, samp = encode_jpeg_progressive(pix, w, h, 1)
    gw, gh, nch, out = decode_image(jpg)
    assert out == reference_decode(blocks, samp, w, h, 1)
    # every scan body must be tiny (one EOBn + padding each): the
    # file is headers + the 193-byte progressive DHT + a few bytes
    # of entropy data per scan
    assert len(jpg) < 420, len(jpg)


def test_eobrun_with_correction_bits():
    """Blocks with low-frequency energy followed by many all-zero
    blocks: refinement scans carry correction bits buffered across
    the EOB run — the decoder's tail-loop path."""
    w, h = 64, 8
    row = [(x * 31) % 256 for x in range(8)]
    pix = bytes((row[x % 8] if x < 16 else 100) for y in range(h)
                for x in range(w))
    base, _, _ = encode_jpeg(pix, w, h, 1)
    prog, _, _ = encode_jpeg_progressive(pix, w, h, 1)
    assert decode_image(prog) == decode_image(base)


def test_progressive_4x1_sampling():
    w, h = 33, 9
    pix = _noise_rgb(w, h, seed=13)
    base, _, _ = encode_jpeg(pix, w, h, 3, samp=[(4, 1), (1, 1), (1, 1)])
    prog, _, _ = encode_jpeg_progressive(
        pix, w, h, 3, samp=[(4, 1), (1, 1), (1, 1)]
    )
    assert decode_image(prog) == decode_image(base)


def test_progressive_flows_through_image_features(spark):
    """The graded Spark path (mapInPandas image_features) decodes a
    progressive payload like any other format."""
    from simple_etl_spark.llm.multimodal import image_features

    w, h = 16, 8
    pix = bytes([200] * (w * h))
    jpg, blocks, samp = encode_jpeg_progressive(pix, w, h, 1)
    df = spark.createDataFrame(
        [(1, bytearray(jpg))], "doc_id bigint, payload binary"
    )
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (w, h, 1)
    ref = reference_decode(blocks, samp, w, h, 1)
    assert row["mean_px"] == sum(ref) // len(ref)


def test_incomplete_script_fails_loud():
    w, h = 16, 16
    pix = _noise_rgb(w, h, seed=1)
    script = _default_script(3)[:-1]  # missing comp0's final AC refine
    jpg, _, _ = encode_jpeg_progressive(pix, w, h, 3, script=script)
    with pytest.raises(ValueError, match="incomplete"):
        decode_image(jpg)


def test_never_coded_coefficients_decode_as_zero():
    """A scan script that simply never codes part of the spectrum is
    spec-legal (T.81 Annex G mandates no 0..63 coverage) and must
    decode with those coefficients at zero — only a coefficient CODED
    but left above Al=0 is a truncated script (ADVICE r11). A flat
    image has all-zero AC, so a DC-only script reconstructs the exact
    pixels of its full baseline twin."""
    w, h = 16, 8
    pix = bytes([173] * (w * h))
    script = [([0], 0, 0, 0, 0)]  # DC at Al=0; AC 1..63 never coded
    jpg, blocks, samp = encode_jpeg_progressive(pix, w, h, 1,
                                                script=script)
    got = decode_image(jpg)
    base = decode_image(encode_jpeg(pix, w, h, 1)[0])
    assert got == base


def test_partial_ac_band_decodes():
    """Coding AC 1..5 to Al=0 and never touching 6..63 decodes; the
    result matches the coefficient-domain oracle with the never-coded
    zigzag band zeroed."""
    w, h = 16, 16
    pix = _noise_rgb(w, h, seed=7)[: w * h]  # one gray-ish plane
    script = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0)]
    jpg, blocks, samp = encode_jpeg_progressive(pix, w, h, 1,
                                                script=script)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 1)
    zeroed = {}
    for key, b in blocks[0].items():
        b2 = np.array(b).reshape(64).copy()
        for k in range(6, 64):
            b2[_JPEG_ZIGZAG[k]] = 0  # bands are zigzag, blocks natural
        zeroed[key] = b2.reshape(np.array(b).shape)
    _assert_near(got, reference_decode([zeroed], samp, w, h, 1))


def test_sos_zero_components_fails_loud():
    """An SOS with Ns=0 passes the length check with an empty scan
    list; the parser must reject it with ValueError (T.81 B.2.3:
    1 <= Ns <= 4), not crash downstream (ADVICE r11)."""
    w, h = 8, 8
    jpg, _, _ = encode_jpeg_progressive(bytes([50]) * 64, w, h, 1)
    at = jpg.index(b"\xff\xda")
    bad = jpg[:at] + b"\xff\xda\x00\x06\x00\x00\x3f\x00" + b"\xff\xd9"
    with pytest.raises(ValueError, match="outside 1..4"):
        decode_image(bad)


def test_ac_scan_before_dc_fails_loud():
    w, h = 8, 8
    pix = bytes([50]) * 64
    script = [([0], 1, 63, 0, 0), ([0], 0, 0, 0, 0)]
    jpg, _, _ = encode_jpeg_progressive(pix, w, h, 1, script=script)
    with pytest.raises(ValueError, match="before the component's DC"):
        decode_image(jpg)


def test_overlapping_first_scans_fail_loud():
    w, h = 8, 8
    pix = bytes([50]) * 64
    script = [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0), ([0], 1, 10, 0, 0)]
    jpg, _, _ = encode_jpeg_progressive(pix, w, h, 1, script=script)
    with pytest.raises(ValueError, match="re-codes"):
        decode_image(jpg)


def test_refinement_step_mismatch_fails_loud():
    w, h = 8, 8
    pix = bytes([50]) * 64
    # first scan at Al=2, refinement claims Ah=1 (should be 2)
    script = [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 2), ([0], 1, 63, 1, 0)]
    jpg, _, _ = encode_jpeg_progressive(pix, w, h, 1, script=script)
    with pytest.raises(ValueError):
        decode_image(jpg)


def test_interleaved_ac_scan_fails_loud():
    """T.81: AC scans in a progressive frame are single-component."""
    w, h = 16, 16
    pix = _gradient_rgb(w, h)
    jpg, _, _ = encode_jpeg_progressive(pix, w, h, 3)
    # patch the first AC SOS (comp0, Ss=1) to claim 2 components: we
    # rebuild a file with a hand-mangled script instead
    script = [([0, 1, 2], 0, 0, 0, 0)]
    head, _, _ = encode_jpeg_progressive(pix, w, h, 3, script=script)
    # splice an interleaved AC SOS header manually
    bad_sos = seg(0xDA, bytes([2, 1, 0, 2, 16, 1, 63, 0]))
    mangled = head[:-2] + bad_sos + b"\x00" + head[-2:]
    with pytest.raises(ValueError):
        decode_image(mangled)
