"""Hierarchical JPEG (T.81 Annex J subset): DHP progression, a
non-differential Huffman-sequential base frame, EXP reference
expansion (the J.1.1.3 midpoint-doubling filter), and SOF5
differential frames whose decoded corrections add onto the expanded
reference.

Oracle: the NumPy mirror of the documented algorithm — dequantize +
matrix-IDCT the base frame, clamp, expand with the same filter,
dequantize + IDCT the differential coefficients WITHOUT level shift
(clamp [-256, 255], zero DC prediction), add, clamp — computed from
the encoder's quantized coefficient blocks without touching the
bitstream, so encoder/decoder bitstream bugs cannot cancel."""

from __future__ import annotations

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import _JPEG_ZIGZAG, decode_image

from tests.test_jpeg import (
    AC_LUM,
    DC_LUM,
    QL,
    _BitWriter,
    _bits_of,
    _category,
    _D,
    _enc_huff,
    dht_payload,
    dqt_payload,
    seg,
)


def _quantize(plane, q, level, bw=None, bh=None):
    """FDCT + quantize one plane (h×w numpy) into per-block int64
    coefficient dicts; ``level`` subtracted first (the mid-level for
    the base frame, 0 for differential frames). ``bw``/``bh`` force
    the block grid (interleaved MCU padding for subsampled
    components); default = ceil(dim/8)."""
    h, w = plane.shape
    mcux = bw if bw is not None else -(-w // 8)
    mcuy = bh if bh is not None else -(-h // 8)
    pad = np.empty((mcuy * 8, mcux * 8))
    pad[:h, :w] = plane
    pad[h:, :w] = pad[h - 1 : h, :w]
    pad[:, w:] = pad[:, w - 1 : w][:, :1] * 0 + pad[:, w - 1 : w]
    qm = np.array(q).reshape(8, 8)
    blocks = {}
    for by in range(mcuy):
        for bx in range(mcux):
            blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - level
            f = _D @ blk @ _D.T
            blocks[(by, bx)] = np.round(f / qm).astype(np.int64)
    return blocks, mcux, mcuy


def _idct_plane(blocks, q, w, h, level, lo, hi=255):
    """Oracle reconstruction: dequant → IDCT → +level → clamp
    [lo, hi] → crop to w×h (int array)."""
    qm = np.array(q).reshape(8, 8)
    mcux = max(k[1] for k in blocks) + 1
    mcuy = max(k[0] for k in blocks) + 1
    out = np.zeros((mcuy * 8, mcux * 8), dtype=np.int64)
    for (by, bx), blk in blocks.items():
        f = blk.astype(np.float64) * qm
        s = _D.T @ f @ _D
        px = np.clip(np.round(s).astype(np.int64) + level, lo, hi)
        out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    return out[:h, :w]


def _expand(plane):
    """NumPy mirror of the J.1.1.3 doubling filter (both axes)."""
    h, w = plane.shape
    hx = np.zeros((h, 2 * w), dtype=np.int64)
    hx[:, 0::2] = plane
    nxt = np.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    hx[:, 1::2] = (plane + nxt + 1) >> 1
    vx = np.zeros((2 * h, 2 * w), dtype=np.int64)
    vx[0::2, :] = hx
    nxt = np.concatenate([hx[1:, :], hx[-1:, :]], axis=0)
    vx[1::2, :] = (hx + nxt + 1) >> 1
    return vx


def _entropy(frames_blocks, mcux, mcuy, factors, differential,
             restart=0):
    """Huffman-encode one frame's interleaved MCUs (hᵢ×vᵢ blocks per
    component per MCU); DC carries DPCM in non-differential frames
    and is coded directly (predictor pinned 0) in differential
    ones. ``factors`` is a per-component (h, v) list."""
    dt, at = _enc_huff(*DC_LUM), _enc_huff(*AC_LUM)
    n_comps = len(factors)
    bw = _BitWriter()
    parts = []
    preds = [0] * n_comps
    rst = 0

    def put_block(zz, ci):
        if differential:
            dcv = zz[0]
        else:
            dcv = zz[0] - preds[ci]
            preds[ci] = zz[0]
        s = _category(dcv)
        bw.put(*dt[s])
        if s:
            bw.put(_bits_of(dcv, s), s)
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

    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bw.pad()
            parts.append(bytes(bw.out))
            parts.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            bw = _BitWriter()
            preds = [0] * n_comps
        my, mx = divmod(m, mcux)
        for ci, (hc, vc) in enumerate(factors):
            for by in range(vc):
                for bx in range(hc):
                    blk = frames_blocks[ci][(my * vc + by, mx * hc + bx)]
                    zz = [int(v) for v in blk.flatten()[_JPEG_ZIGZAG]]
                    put_block(zz, ci)
    bw.pad()
    parts.append(bytes(bw.out))
    return b"".join(parts)


def _sof(marker, w, h, n_comps, prec=8, cids=None, factors=None):
    cids = cids or [ci + 1 for ci in range(n_comps)]
    factors = factors or [(1, 1)] * n_comps
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([n_comps])
    for ci in range(n_comps):
        hc, vc = factors[ci]
        sof += bytes([cids[ci], (hc << 4) | vc, 0])
    return seg(marker, sof)


def _sos(n_comps, cids=None):
    cids = cids or [ci + 1 for ci in range(n_comps)]
    s = bytes([n_comps])
    for ci in range(n_comps):
        s += bytes([cids[ci], 0x00])
    return seg(0xDA, s + bytes([0, 63, 0]))


def _entropy_arith(frames_blocks, mcux, mcuy, factors, differential,
                   restart=0):
    """QM-coded twin of :func:`_entropy` (SOF9/SOF13 frames): default
    conditioning (L,U)=(0,1), Kx=5, table 0. Differential frames code
    each block's DC directly (prediction pinned at zero) — the
    conditioning classification still applies to that value, exactly
    as the decoder assumes."""
    from tests.test_jpeg_arith import (
        ArithWriter,
        enc_ac_band,
        enc_dc_diff,
    )

    n = len(factors)
    wtr = ArithWriter(n)
    parts = []
    rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            parts.append(wtr.enc.flush())
            parts.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            wtr.reset()
        my, mx = divmod(m, mcux)
        for ci, (hc, vc) in enumerate(factors):
            for by in range(vc):
                for bx in range(hc):
                    blk = frames_blocks[ci][(my * vc + by, mx * hc + bx)]
                    z = [int(v) for v in blk.flatten()[_JPEG_ZIGZAG]]
                    if differential:
                        diff = z[0]
                    else:
                        diff = z[0] - wtr.last[ci]
                        wtr.last[ci] = z[0]
                    enc_dc_diff(wtr, ci, 0, 0, 1, diff)
                    enc_ac_band(wtr, 0, 5, z, 1, 63)
    parts.append(wtr.enc.flush())
    return b"".join(parts)


RGB_CIDS = [0x52, 0x47, 0x42]  # 'R','G','B' T.81 component-ID convention


def encode_hierarchical(planes_full, w, h, restart=0, cids=None,
                        prec=8, arith=False, diff_cids=None):
    """Two-level pyramid: base frame at (ceil(w/2), ceil(h/2)), EXP,
    one SOF5 differential frame at (w, h). ``planes_full`` is a list
    of h×w numpy arrays (1 = gray, 3 = YCbCr — or literal R/G/B when
    ``cids`` is RGB_CIDS, in which case the oracle interleaves the
    planes without the matrix). Odd ``w``/``h`` exercise the
    J.1.1.3 trim: the EXP-doubled reference overhangs the final
    frame by one column/row and the decoder must crop it.
    ``diff_cids`` reorders the differential frame's component list
    (a permutation of the reference's ids) — components are matched
    by ID, so the oracle is unchanged. Returns (jpeg_bytes,
    oracle_pixels) with the oracle computed coefficient-domain."""
    n = len(planes_full)
    w0, h0 = (w + 1) // 2, (h + 1) // 2
    q = QL if prec == 8 else [v * 20 for v in QL]
    level = (1 << prec) >> 1
    maxd = (1 << prec) - 1
    out = bytearray(b"\xff\xd8")
    out += _sof(0xDE, w, h, n, prec=prec, cids=cids)  # DHP
    if prec == 8:
        out += seg(0xDB, dqt_payload(0, q))
    else:  # Pq=1: 16-bit entries, zigzag order
        dqt = bytes([0x10])
        for z in range(64):
            dqt += struct.pack(">H", q[_JPEG_ZIGZAG[z]])
        out += seg(0xDB, dqt)
    out += seg(0xC4, dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_LUM))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    base_blocks = []
    refs = []
    for p in planes_full:
        pp = p
        if w % 2 or h % 2:  # edge-pad so 2x2 pooling stays defined
            pp = np.pad(p, ((0, 2 * h0 - h), (0, 2 * w0 - w)),
                        mode="edge")
        small = np.round(
            pp.reshape(h0, 2, w0, 2).mean(axis=(1, 3))
        ).astype(np.int64)
        blocks, mcux0, mcuy0 = _quantize(small.astype(np.float64), q,
                                         level)
        base_blocks.append(blocks)
        refs.append(_idct_plane(blocks, q, w0, h0, level, 0, maxd))
    # baseline SOF0 is 8-bit-only (T.81 B.2.2); 12-bit
    # non-differential frames ride extended sequential SOF1; the
    # arithmetic base frame is SOF9 at either precision
    base_marker = 0xC9 if arith else (0xC0 if prec == 8 else 0xC1)
    out += _sof(base_marker, w0, h0, n, prec=prec, cids=cids)
    out += _sos(n, cids=cids)
    if arith:
        out += _entropy_arith(base_blocks, mcux0, mcuy0, [(1, 1)] * n,
                              False, restart)
    else:
        out += _entropy(base_blocks, mcux0, mcuy0, [(1, 1)] * n, False,
                        restart)

    out += seg(0xDF, bytes([0x11]))  # EXP: double both axes
    # J.1.1.3: the doubled reference overhangs odd final dims by one
    # column/row — trim to the next frame's size (no-op when even)
    expanded = [_expand(r)[:h, :w] for r in refs]

    diff_blocks = []
    finals = []
    for p, ex in zip(planes_full, expanded):
        diff = p.astype(np.int64) - ex
        blocks, mcux1, mcuy1 = _quantize(diff.astype(np.float64), q, 0)
        diff_blocks.append(blocks)
        dec_diff = _idct_plane(blocks, q, w, h, 0, -(maxd + 1), maxd)
        finals.append(np.clip(ex + dec_diff, 0, maxd))
    base_cids = cids or [ci + 1 for ci in range(n)]
    emit_cids, emit_blocks = base_cids, diff_blocks
    if diff_cids is not None:  # reordered component list, same ids
        assert sorted(diff_cids) == sorted(base_cids)
        order = [base_cids.index(c) for c in diff_cids]
        emit_cids = list(diff_cids)
        emit_blocks = [diff_blocks[i] for i in order]
    out += _sof(0xCD if arith else 0xC5, w, h, n, prec=prec,
                cids=emit_cids)
    out += _sos(n, cids=emit_cids)
    if arith:
        out += _entropy_arith(emit_blocks, mcux1, mcuy1, [(1, 1)] * n,
                              True, restart)
    else:
        out += _entropy(emit_blocks, mcux1, mcuy1, [(1, 1)] * n, True,
                        restart)
    out += b"\xff\xd9"

    if prec != 8:
        # the decoder scales per-sample into the 8-bit domain BEFORE
        # any colorspace matrix — mirror exactly
        finals = [(f * 255 + (maxd >> 1)) // maxd for f in finals]
    if n == 1:
        oracle = finals[0].astype(np.uint8).tobytes()
    elif cids == RGB_CIDS:
        oracle = np.stack(finals, axis=-1).astype(np.uint8).tobytes()
    else:
        yp, cbp, crp = [f.astype(np.float64) for f in finals]
        r = np.round(yp + 1.402 * (crp - 128))
        g = np.round(yp - 0.344136 * (cbp - 128) - 0.714136 * (crp - 128))
        b = np.round(yp + 1.772 * (cbp - 128))
        rgb = np.stack(
            [np.clip(c, 0, 255) for c in (r, g, b)], axis=-1
        ).astype(np.uint8)
        oracle = rgb.tobytes()
    return bytes(out), oracle


def _gray_plane(w, h, seed=3):
    return np.array(
        [[(x * 13 + y * 7 + seed * 11) % 256 for x in range(w)]
         for y in range(h)], dtype=np.int64
    )


def test_two_level_gray_pyramid_matches_oracle():
    w, h = 32, 16
    jpg, oracle = encode_hierarchical([_gray_plane(w, h)], w, h)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 1)
    assert got == oracle


def test_two_level_ycbcr_pyramid_matches_oracle():
    w, h = 16, 16
    planes = [_gray_plane(w, h, s) for s in (1, 5, 9)]
    jpg, oracle = encode_hierarchical(planes, w, h)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 3)
    assert got == oracle


def test_hierarchical_with_restarts():
    w, h = 48, 16
    jpg, oracle = encode_hierarchical([_gray_plane(w, h)], w, h,
                                      restart=2)
    assert decode_image(jpg)[3] == oracle


def test_expansion_filter_is_midpoint_doubling():
    """Pin the J.1.1.3 filter directly: out[2i]=in[i], out[2i+1]=
    (in[i]+in[i+1]+1)>>1, edge-replicated."""
    from simple_etl_spark.llm.multimodal import _hier_upsample

    plane, w, h = _hier_upsample([10, 20, 30, 40], 2, 2, 1, 1)
    assert (w, h) == (4, 4)
    assert plane[0:4] == [10, 15, 20, 20]          # row 0: 10,20 doubled
    assert plane[8:12] == [30, 35, 40, 40]         # row 2: 30,40 doubled
    assert plane[4:8] == [20, 25, 30, 30]          # interpolated row
    assert plane[12:16] == plane[8:12]             # edge-replicated row


def test_hierarchical_error_paths():
    w, h = 16, 16
    jpg, _ = encode_hierarchical([_gray_plane(w, h)], w, h)
    # differential frame without a reference: strip the base frame's
    # SOF0+SOS+entropy (from SOF0 to the EXP marker)
    at0 = jpg.index(b"\xff\xc0")
    atx = jpg.index(b"\xff\xdf")
    with pytest.raises(ValueError,
                       match="reference|hierarchical sequence"):
        decode_image(jpg[:at0] + jpg[atx:])
    # truncated pyramid: stop before the EXP — the half-resolution
    # reference never reaches the DHP dims
    atx2 = jpg.index(b"\xff\xdf")
    with pytest.raises(ValueError, match="DHP"):
        decode_image(jpg[:atx2] + b"\xff\xd9")
    # EXP before any frame
    hdr_end = jpg.index(b"\xff\xdb")
    with pytest.raises(ValueError, match="EXP"):
        decode_image(jpg[:hdr_end] + b"\xff\xdf\x00\x03\x11"
                     + jpg[hdr_end:])
    # differential progressive stays gated
    bad = jpg.replace(b"\xff\xc5", b"\xff\xc6", 1)
    with pytest.raises(NotImplementedError):
        decode_image(bad)


def test_odd_dimension_pyramid_trims_expanded_reference():
    """T.81 J.1.1.3: for odd final dims the EXP-doubled reference is
    one column/row larger than the differential frame — the decoder
    must TRIM it, not reject the file (review r14; previously raised
    'does not match the (expanded) reference')."""
    w, h = 17, 9
    jpg, oracle = encode_hierarchical([_gray_plane(w, h)], w, h)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 1)
    assert got == oracle
    # 3-component odd square, arithmetic entropy tier
    w, h = 15, 15
    planes = [_gray_plane(w, h, s) for s in (2, 4, 8)]
    jpg, oracle = encode_hierarchical(planes, w, h, arith=True)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 3)
    assert got == oracle


def test_differential_frame_component_reorder_matches_by_id():
    """Components are matched by ID across hierarchical frames: a
    differential frame listing the same components in a different
    order must merge each correction into ITS reference, not the
    positional one (review r14 — symmetric factors/dims previously
    slipped past the guards and scrambled colors silently)."""
    w, h = 16, 16
    planes = [_gray_plane(w, h, s) for s in (1, 5, 9)]
    jpg, oracle = encode_hierarchical(planes, w, h,
                                      diff_cids=[3, 1, 2])
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 3)
    assert got == oracle
    # a differential frame with DIFFERENT ids is a malformed file
    jpg_bad, _ = encode_hierarchical(planes, w, h,
                                     diff_cids=[1, 2, 3])
    at = jpg_bad.rindex(b"\xff\xc5")
    sos_at = jpg_bad.index(b"\xff\xda", at)
    bad = bytearray(jpg_bad)
    bad[at + 10] = 7      # first diff-frame component id 1 -> 7 (SOF)
    bad[sos_at + 5] = 7   # and in the scan header, so decode reaches
    with pytest.raises(ValueError, match="components"):  # the merge
        decode_image(bytes(bad))


def test_hierarchical_frame_pixel_bomb_rejected():
    """A frame header inside a hierarchical sequence carries its own
    dims; huge declared dims must be rejected BEFORE plane
    allocation (review r14 — the DHP cap alone let a crafted SOF
    allocate unbounded memory)."""
    jpg, _ = encode_hierarchical([_gray_plane(16, 16)], 16, 16)
    at = jpg.index(b"\xff\xc0")
    bad = bytearray(jpg)
    bad[at + 5 : at + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_image(bytes(bad))
    # arithmetic twin (SOF9 base frame)
    jpg_a, _ = encode_hierarchical([_gray_plane(16, 16)], 16, 16,
                                   arith=True)
    at = jpg_a.index(b"\xff\xc9")
    bad = bytearray(jpg_a)
    bad[at + 5 : at + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_image(bytes(bad))


def test_exp_expansion_bomb_rejected(monkeypatch):
    """A run of EXP markers doubles reference memory each time; the
    expansion must stay under the decode cap even though each
    individual EXP is well-formed (review r14)."""
    import simple_etl_spark.llm.multimodal as mm

    jpg, _ = encode_hierarchical([_gray_plane(16, 16)], 16, 16)
    spliced = jpg[:-2] + b"\xff\xdf\x00\x03\x11" * 3 + jpg[-2:]
    monkeypatch.setattr(mm, "MAX_DECODE_PIXELS", 10_000)
    with pytest.raises(ValueError, match="EXP expands"):
        decode_image(spliced)


def test_hierarchical_rgb_component_ids_bypass_matrix():
    """A hierarchical pyramid whose components carry the 'R','G','B'
    ids is literal RGB: the planes must interleave directly instead
    of passing through the YCbCr matrix (ADVICE r12 — the same gate
    sequential/progressive/arithmetic already honor via is_rgb)."""
    w, h = 16, 16
    planes = [_gray_plane(w, h, s) for s in (2, 6, 10)]
    jpg, oracle = encode_hierarchical(planes, w, h, cids=RGB_CIDS)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 3)
    assert got == oracle
    # and the identical pyramid under YCbCr ids decodes DIFFERENTLY
    jpg_y, oracle_y = encode_hierarchical(planes, w, h)
    assert decode_image(jpg_y)[3] == oracle_y
    assert oracle_y != oracle


def test_12bit_hierarchical_pyramid_matches_oracle():
    """12-bit pyramids (DHP/SOF precision 12, Pq=1 quant tables):
    full precision through the base frame, EXP, and the differential
    addition, scaled into the 8-bit domain only at assembly — gray
    and YCbCr, both against the coefficient-domain oracle."""
    w, h = 16, 16
    g12 = np.array(
        [[(x * 201 + y * 117 + 31) % 4096 for x in range(w)]
         for y in range(h)], dtype=np.int64
    )
    jpg, oracle = encode_hierarchical([g12], w, h, prec=12)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 1)
    assert got == oracle
    planes = [(g12 * s + 7 * s) % 4096 for s in (1, 3, 5)]
    jpg, oracle = encode_hierarchical(planes, w, h, prec=12)
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 3)
    assert got == oracle


def test_hierarchical_precision_mismatch_fails_loud():
    """A frame whose SOF precision differs from the DHP's must raise,
    not decode with the wrong level shift."""
    w, h = 16, 16
    jpg, _ = encode_hierarchical([_gray_plane(w, h)], w, h)
    bad = bytearray(jpg)
    at = bytes(bad).index(b"\xff\xde") + 4
    bad[at] = 12  # DHP says 12-bit, frames stay 8-bit
    with pytest.raises(ValueError, match="precision"):
        decode_image(bytes(bad))
    # 16-bit hierarchical stays gated (T.81 allows DCT only at 8/12)
    bad[at] = 16
    with pytest.raises(NotImplementedError):
        decode_image(bytes(bad))


def encode_hierarchical_subsampled(comp_planes, w, h, factors,
                                   restart=0):
    """Subsampled two-level pyramid: ``comp_planes`` are numpy arrays
    at each component's OWN resolution for the FULL frame level
    (ceil(h·vᵢ/vmax) × ceil(w·hᵢ/hmax)); the base frame is the
    2x-downsampled twin. Returns (jpeg_bytes, oracle_pixels) with the
    oracle mirroring decode exactly: per-component coefficient-domain
    reconstruction, EXP doubling, differential add, then the
    nearest-sample upsample (src = x·cw//w) and the JFIF matrix."""
    n = len(comp_planes)
    hmax = max(hc for hc, _vc in factors)
    vmax = max(vc for _hc, vc in factors)
    w0, h0 = w // 2, h // 2
    mcux0 = -(-w0 // (8 * hmax))
    mcuy0 = -(-h0 // (8 * vmax))
    mcux1 = -(-w // (8 * hmax))
    mcuy1 = -(-h // (8 * vmax))
    out = bytearray(b"\xff\xd8")
    out += _sof(0xDE, w, h, n, factors=factors)  # DHP
    out += seg(0xDB, dqt_payload(0, QL))
    out += seg(0xC4, dht_payload(0, 0, *DC_LUM) + dht_payload(1, 0, *AC_LUM))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    base_blocks = []
    refs = []
    cdims0 = []
    cdims1 = []
    for p, (hc, vc) in zip(comp_planes, factors):
        chf, cwf = p.shape
        cw0, ch0 = -(-w0 * hc // hmax), -(-h0 * vc // vmax)
        assert (cwf, chf) == (-(-w * hc // hmax), -(-h * vc // vmax))
        assert (cwf // 2, chf // 2) == (cw0, ch0)
        cdims0.append((cw0, ch0))
        cdims1.append((cwf, chf))
        small = np.round(
            p.reshape(ch0, 2, cw0, 2).mean(axis=(1, 3))
        ).astype(np.int64)
        blocks, _, _ = _quantize(small.astype(np.float64), QL, 128,
                                 bw=mcux0 * hc, bh=mcuy0 * vc)
        base_blocks.append(blocks)
        refs.append(_idct_plane(blocks, QL, cw0, ch0, 128, 0))
    out += _sof(0xC0, w0, h0, n, factors=factors)
    out += _sos(n)
    out += _entropy(base_blocks, mcux0, mcuy0, factors, False, restart)

    out += seg(0xDF, bytes([0x11]))  # EXP: double both axes
    expanded = [_expand(r) for r in refs]

    diff_blocks = []
    finals = []
    for p, ex, (hc, vc) in zip(comp_planes, expanded, factors):
        diff = p.astype(np.int64) - ex
        blocks, _, _ = _quantize(diff.astype(np.float64), QL, 0,
                                 bw=mcux1 * hc, bh=mcuy1 * vc)
        diff_blocks.append(blocks)
        cwf, chf = p.shape[1], p.shape[0]
        dec_diff = _idct_plane(blocks, QL, cwf, chf, 0, -256)
        finals.append(np.clip(ex + dec_diff, 0, 255))
    out += _sof(0xC5, w, h, n, factors=factors)
    out += _sos(n)
    out += _entropy(diff_blocks, mcux1, mcuy1, factors, True, restart)
    out += b"\xff\xd9"

    # oracle: nearest-sample upsample then the matrix
    full = []
    for f, (hc, vc) in zip(finals, factors):
        chf, cwf = f.shape
        if (cwf, chf) == (w, h):
            full.append(f)
        else:
            up = np.empty((h, w), dtype=np.int64)
            for y in range(h):
                sy = y * chf // h
                for x in range(w):
                    up[y, x] = f[sy, x * cwf // w]
            full.append(up)
    if n == 1:
        oracle = full[0].astype(np.uint8).tobytes()
    else:
        yp, cbp, crp = [f.astype(np.float64) for f in full]
        r = np.round(yp + 1.402 * (crp - 128))
        g = np.round(yp - 0.344136 * (cbp - 128) - 0.714136 * (crp - 128))
        b = np.round(yp + 1.772 * (cbp - 128))
        oracle = np.stack(
            [np.clip(c, 0, 255) for c in (r, g, b)], axis=-1
        ).astype(np.uint8).tobytes()
    return bytes(out), oracle


def test_subsampled_420_hierarchical_pyramid():
    """4:2:0 pyramid (luma (2,2), chroma (1,1)): per-component
    references at their own resolutions through base/EXP/differential,
    upsampled only at assembly — against the full NumPy mirror."""
    w, h = 32, 32
    factors = [(2, 2), (1, 1), (1, 1)]
    luma = np.array(
        [[(x * 13 + y * 7 + 3) % 256 for x in range(w)]
         for y in range(h)], dtype=np.int64
    )
    cb = np.array(
        [[(x * 29 + y * 17 + 11) % 256 for x in range(w // 2)]
         for y in range(h // 2)], dtype=np.int64
    )
    cr = np.array(
        [[(x * 5 + y * 23 + 7) % 256 for x in range(w // 2)]
         for y in range(h // 2)], dtype=np.int64
    )
    jpg, oracle = encode_hierarchical_subsampled(
        [luma, cb, cr], w, h, factors
    )
    gw, gh, ch, got = decode_image(jpg)
    assert (gw, gh, ch) == (w, h, 3)
    assert got == oracle


def test_subsampled_422_hierarchical_with_restarts():
    """4:2:2 ((2,1) luma) plus restart markers through the MCU-
    interleaved hierarchical path."""
    w, h = 32, 16
    factors = [(2, 1), (1, 1), (1, 1)]
    luma = np.array(
        [[(x * 11 + y * 19 + 1) % 256 for x in range(w)]
         for y in range(h)], dtype=np.int64
    )
    cb = np.array(
        [[(x * 7 + y * 3 + 90) % 256 for x in range(w // 2)]
         for y in range(h)], dtype=np.int64
    )
    cr = np.array(
        [[(x * 31 + y * 13 + 40) % 256 for x in range(w // 2)]
         for y in range(h)], dtype=np.int64
    )
    jpg, oracle = encode_hierarchical_subsampled(
        [luma, cb, cr], w, h, factors, restart=1
    )
    assert decode_image(jpg)[3] == oracle


def test_subsampled_differential_factor_mismatch_fails_loud():
    """A differential frame whose sampling factors differ from the
    reference frame's must raise, not add misaligned planes. A factor
    flip usually re-shapes the MCU grid so the entropy parse itself
    fails loud; the dispatcher's explicit factors/dims checks guard
    the residual case where a permuted layout still parses. Either
    way: ValueError, never a silently-misassembled image."""
    w, h = 32, 32
    factors = [(2, 2), (1, 1), (1, 1)]
    planes = [
        np.zeros((h, w), dtype=np.int64),
        np.zeros((h // 2, w // 2), dtype=np.int64),
        np.zeros((h // 2, w // 2), dtype=np.int64),
    ]
    jpg, _ = encode_hierarchical_subsampled(planes, w, h, factors)
    bad = bytearray(jpg)
    at = bytes(bad).rindex(b"\xff\xc5")  # differential SOF5
    # component 0's (h,v) byte sits at SOF payload offset 7
    bad[at + 4 + 7] = 0x11  # (2,2) -> (1,1)
    with pytest.raises(ValueError,
                       match="factors|component dims|entropy"):
        decode_image(bytes(bad))


def test_arithmetic_hierarchical_matches_oracle_and_huffman_twin():
    """SOF9 base + SOF13 differential frames through the QM-coder:
    the entropy tier must be transparent — the arithmetic pyramid
    decodes byte-identically to its Huffman twin AND to the
    coefficient-domain oracle (gray and YCbCr)."""
    w, h = 32, 16
    gray = [_gray_plane(w, h)]
    jpg_a, oracle = encode_hierarchical(gray, w, h, arith=True)
    jpg_h, oracle_h = encode_hierarchical(gray, w, h)
    assert oracle == oracle_h  # entropy-independent construction
    got = decode_image(jpg_a)
    assert got[:3] == (w, h, 1)
    assert got[3] == oracle
    assert got[3] == decode_image(jpg_h)[3]
    planes = [_gray_plane(16, 16, s) for s in (1, 5, 9)]
    jpg_a, oracle = encode_hierarchical(planes, 16, 16, arith=True)
    assert decode_image(jpg_a)[3] == oracle


def test_arithmetic_hierarchical_with_restarts_and_12bit():
    w, h = 48, 16
    jpg, oracle = encode_hierarchical([_gray_plane(w, h)], w, h,
                                      restart=2, arith=True)
    assert decode_image(jpg)[3] == oracle
    g12 = np.array(
        [[(x * 151 + y * 211 + 9) % 4096 for x in range(16)]
         for y in range(16)], dtype=np.int64
    )
    jpg, oracle = encode_hierarchical([g12], 16, 16, prec=12,
                                      arith=True)
    assert decode_image(jpg)[3] == oracle


def test_mixed_entropy_pyramid_gates_stay_loud():
    """Differential progressive (SOF14) stays gated even now that
    SOF13 decodes; a SOF13 outside a hierarchical sequence is
    rejected."""
    w, h = 16, 16
    jpg, _ = encode_hierarchical([_gray_plane(w, h)], w, h, arith=True)
    bad = jpg.replace(b"\xff\xcd", b"\xff\xce", 1)
    with pytest.raises(NotImplementedError):
        decode_image(bad)
    at = jpg.index(b"\xff\xc9")
    no_dhp = jpg[:2] + jpg[at:]  # strip DHP: SOF13 with no hierarchy
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(no_dhp)
