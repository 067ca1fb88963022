"""GIF decode (round 12): LZW (variable code widths, dictionary
growth, KwKwK, CLEAR resets), global/local color tables, interlacing,
transparency, and 89a animation disposal methods. Fixtures are
byte-built with a REAL test-side LZW compressor (dictionary growth
exercised) plus a degenerate clear-per-symbol encoder (CLEAR-reset
path exercised); the oracle is the index array mapped through the
palette directly — the bitstream never touches it."""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import (
    _decode_gif_frames,
    decode_image,
    demux_video,
)


class _LsbWriter:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, k):
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def lzw_compress(indices, min_code):
    """Classic GIF LZW compressor: emits CLEAR, grows the dictionary,
    widens codes exactly when the decoder expects it."""
    clear = 1 << min_code
    eoi = clear + 1
    bw = _LsbWriter()
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    bw.put(clear, width)
    seq = b""
    for v in indices:
        cand = seq + bytes([v])
        if cand in table:
            seq = cand
            continue
        bw.put(table[seq], width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        seq = bytes([v])
        if nxt == 4097:  # dictionary full: reset
            bw.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code + 1
    if seq:
        bw.put(table[seq], width)
    bw.put(eoi, width)
    return bw.bytes()


def lzw_degenerate(indices, min_code):
    """CLEAR before every literal: a valid stream that never grows the
    dictionary — pins the reset path."""
    clear = 1 << min_code
    bw = _LsbWriter()
    width = min_code + 1
    for v in indices:
        bw.put(clear, width)
        bw.put(v, width)
    bw.put(clear + 1, width)
    return bw.bytes()


def _sub_blocks(data):
    out = bytearray()
    for i in range(0, len(data), 200):
        chunk = data[i : i + 200]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def build_gif(w, h, frames, palette, min_code=2, interlace_first=False,
              compressor=lzw_compress, bg=0):
    """frames: list of (ix, iy, iw, ih, indices, gce) where gce is
    None or (disposal, delay_cs, transparent_idx_or_None)."""
    n = len(palette) // 3
    size_field = max((n - 1).bit_length() - 1, 0)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, bg, 0])
    full = palette + b"\x00" * (3 * ((2 << size_field) - n))
    out += full
    for fi, (ix, iy, iw, ih, idx, gce) in enumerate(frames):
        if gce is not None:
            disposal, delay, trans = gce
            flags = (disposal << 2) | (1 if trans is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags])
            out += struct.pack("<H", delay)
            out += bytes([trans if trans is not None else 0, 0])
        ipacked = 0x40 if (interlace_first and fi == 0) else 0
        out += bytes([0x2C]) + struct.pack("<HHHH", ix, iy, iw, ih)
        out += bytes([ipacked])
        data = idx
        if ipacked & 0x40:
            rows = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                rows.extend(range(start, ih, step))
            re = bytearray(iw * ih)
            for src, dst in enumerate(rows):
                re[src * iw : (src + 1) * iw] = idx[dst * iw : (dst + 1) * iw]
            data = bytes(re)
        out += bytes([min_code])
        out += _sub_blocks(compressor(data, min_code))
    out += b"\x3b"
    return bytes(out)


PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])  # R G B W


def _expect_rgb(idx, palette, w, h):
    return b"".join(palette[3 * v : 3 * v + 3] for v in idx)


def test_single_frame_matches_palette_oracle():
    w, h = 7, 5
    idx = bytes((x + y) % 4 for y in range(h) for x in range(w))
    gif = build_gif(w, h, [(0, 0, w, h, idx, None)], PAL4)
    gw, gh, ch, px = decode_image(gif)
    assert (gw, gh, ch) == (w, h, 3)
    assert px == _expect_rgb(idx, PAL4, w, h)


def test_lzw_dictionary_growth_and_kwkwk():
    """A long self-repeating index stream forces dictionary growth,
    width bumps, and the KwKwK (code == next index) case."""
    w, h = 64, 32
    idx = bytes((x * x + 3 * y) % 4 for y in range(h) for x in range(w))
    idx = idx[: w * h // 2] + idx[: w * h // 2]  # long repeats
    gif = build_gif(w, h, [(0, 0, w, h, idx, None)], PAL4)
    assert decode_image(gif)[3] == _expect_rgb(idx, PAL4, w, h)
    # KwKwK minimal case: "aaaa" emits code==next-index immediately
    idx2 = bytes([1, 1, 1, 1] * (w * h // 4))
    gif2 = build_gif(w, h, [(0, 0, w, h, idx2, None)], PAL4)
    assert decode_image(gif2)[3] == _expect_rgb(idx2, PAL4, w, h)


def test_degenerate_clear_stream_decodes():
    w, h = 9, 4
    idx = bytes((x * y) % 4 for y in range(h) for x in range(w))
    gif = build_gif(w, h, [(0, 0, w, h, idx, None)], PAL4,
                    compressor=lzw_degenerate)
    assert decode_image(gif)[3] == _expect_rgb(idx, PAL4, w, h)


def test_interlaced_frame():
    w, h = 8, 13
    idx = bytes((3 * x + y) % 4 for y in range(h) for x in range(w))
    gif = build_gif(w, h, [(0, 0, w, h, idx, None)], PAL4,
                    interlace_first=True)
    assert decode_image(gif)[3] == _expect_rgb(idx, PAL4, w, h)


def test_animation_disposals_and_transparency():
    """Frame 1 full canvas; frame 2 a sub-rect with transparency and
    restore-to-background; frame 3 sees the background-restored rect;
    composed canvases verified pixel-exactly frame by frame."""
    w, h = 6, 4
    f1 = bytes([0] * (w * h))                      # all red
    f2 = bytes([2, 3, 1, 3])                       # 2x2 at (1,1), idx 3 transparent
    f3 = bytes([1] * (w * h))                      # all green
    gif = build_gif(
        w, h,
        [
            (0, 0, w, h, f1, (1, 5, None)),        # keep
            (1, 1, 2, 2, f2, (2, 7, 3)),           # restore-to-bg after
            (0, 0, w, h, f3, (0, 0, None)),
        ],
        PAL4,
        bg=0,
    )
    gw, gh, frames, delays = _decode_gif_frames(gif)
    assert (gw, gh) == (w, h) and len(frames) == 3
    assert delays == [5, 7, 0]
    assert frames[0] == _expect_rgb(f1, PAL4, w, h)
    # frame 2: canvas = f1 with (1,1)=blue, (2,1)=transparent->red,
    # (1,2)=green, (2,2)=transparent->red
    c = bytearray(frames[0])
    for (xx, yy, v) in ((1, 1, 2), (1, 2, 1)):
        o = (yy * w + xx) * 3
        c[o : o + 3] = PAL4[3 * v : 3 * v + 3]
    assert frames[1] == bytes(c)
    assert frames[2] == _expect_rgb(f3, PAL4, w, h)


def test_restore_to_previous_disposal():
    w, h = 4, 4
    f1 = bytes([0] * 16)
    f2 = bytes([2] * 4)   # 2x2 overlay, disposal 3
    f3 = bytes([1, 1, 1, 1])  # another overlay at same spot
    gif = build_gif(
        w, h,
        [
            (0, 0, w, h, f1, (1, 0, None)),
            (1, 1, 2, 2, f2, (3, 0, None)),
            (1, 1, 2, 2, f3, (0, 0, None)),
        ],
        PAL4,
    )
    _w, _h, frames, _d = _decode_gif_frames(gif)
    # frame 3 composes onto the RESTORED (pre-f2) canvas
    c = bytearray(frames[0])
    for yy in (1, 2):
        for xx in (1, 2):
            o = (yy * w + xx) * 3
            c[o : o + 3] = PAL4[3:6]
    assert frames[2] == bytes(c)


def test_animated_gif_through_video_tier():
    w, h = 6, 4
    f1 = bytes([0] * (w * h))
    f2 = bytes([1] * (w * h))
    gif = build_gif(w, h, [(0, 0, w, h, f1, (1, 4, None)),
                           (0, 0, w, h, f2, (0, 4, None))], PAL4)
    v = demux_video(gif)
    assert (v["container"], v["width"], v["height"]) == ("gif", w, h)
    assert (v["fps_num"], v["fps_den"]) == (100, 4)
    assert len(v["frames"]) == 2
    from simple_etl_spark.llm.multimodal import decode_video_frame

    assert decode_video_frame("rgb", w, h, v["frames"][1])[3] == \
        _expect_rgb(f2, PAL4, w, h)


def test_malformed_gifs_fail_loud():
    w, h = 4, 4
    idx = bytes([0] * 16)
    gif = build_gif(w, h, [(0, 0, w, h, idx, None)], PAL4)
    with pytest.raises(ValueError):
        decode_image(gif[: len(gif) // 2])
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_image(b"GIF89a" + struct.pack("<HH", 60000, 60000)
                     + gif[10:])
    # frame exceeding the logical screen
    bad = build_gif(4, 4, [(2, 2, 4, 4, bytes(16), None)], PAL4)
    with pytest.raises(ValueError, match="logical screen"):
        decode_image(bad)
    # pixel index outside the palette (palette of 2, index 3 coded)
    pal2 = bytes([10, 10, 10, 200, 200, 200])
    bad2 = build_gif(2, 2, [(0, 0, 2, 2, bytes([0, 1, 3, 0]), None)],
                     pal2, min_code=2)
    with pytest.raises(ValueError, match="color table"):
        decode_image(bad2)


def test_disposal2_restores_to_transparent_black():
    """Disposal=2 must clear the frame rect to transparent (black in
    the flattened RGB output), NOT the palette background color —
    matching PIL/browser compositing (ADVICE r12). bg=3 (white) is
    deliberately loud: the old behavior painted white here."""
    w, h = 4, 4
    f1 = bytes([0] * 16)   # all red
    f2 = bytes([2] * 4)    # 2x2 blue at (1,1), disposal 2
    f3 = bytes([1])        # 1x1 green at (0,0): rect stays visible
    gif = build_gif(
        w, h,
        [
            (0, 0, w, h, f1, (1, 0, None)),
            (1, 1, 2, 2, f2, (2, 0, 3)),
            (0, 0, 1, 1, f3, (0, 0, None)),
        ],
        PAL4,
        bg=3,
    )
    _w, _h, frames, _d = _decode_gif_frames(gif)
    assert len(frames) == 3
    c = bytearray(frames[0])
    c[0:3] = PAL4[3:6]  # frame 3's green pixel
    for yy in (1, 2):
        for xx in (1, 2):
            o = (yy * w + xx) * 3
            c[o : o + 3] = b"\x00\x00\x00"
    assert frames[2] == bytes(c)


def test_decode_image_stops_after_first_gif_frame():
    """decode_image wants frame 0 only: a corrupt SECOND frame must
    not break the still-image decode (ADVICE r12 early-exit), while
    the full animation decode still fails loud on it."""
    w, h = 6, 4
    f1 = bytes((x + y) % 4 for y in range(h) for x in range(w))
    f2 = bytes([1] * 4)
    gif = bytearray(build_gif(w, h, [(0, 0, w, h, f1, None),
                                     (1, 1, 2, 2, f2, None)], PAL4))
    # corrupt frame 2's LZW minimum-code-size byte (descriptor is
    # 0x2C + <HHHH ix=1 iy=1 iw=2 ih=2> + packed flags)
    desc2 = bytes([0x2C]) + struct.pack("<HHHH", 1, 1, 2, 2)
    at = bytes(gif).index(desc2)
    gif[at + 10] = 0x01  # min code size below the legal 2..11 range
    gw, gh, ch, px = decode_image(bytes(gif))
    assert (gw, gh, ch) == (w, h, 3)
    assert px == _expect_rgb(f1, PAL4, w, h)
    with pytest.raises(ValueError, match="minimum code size"):
        _decode_gif_frames(bytes(gif))
