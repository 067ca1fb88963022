"""Baseline TIFF decode (round 12): II/MM byte orders, strip walks,
Compression 1 / PackBits / TIFF-LZW (MSB-first, early change),
photometric 0/1/2/3. Fixtures are byte-built with a real test-side
TIFF-LZW compressor and PackBits encoder; the oracle is the pixel
array the fixture was built from."""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import decode_image


def packbits(data):
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and (i - lit) < 128:
            if i + 2 < n and data[i] == data[i + 1] == data[i + 2]:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


class _MsbWriter:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, k):
        self.acc = (self.acc << k) | v
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def bytes(self):
        if self.n:
            self.put(0, 8 - self.n)
        return bytes(self.out)


def tiff_lzw(data):
    """TIFF-variant LZW compressor: MSB-first, early change (width
    bumps when the NEXT code to be added would be 2^width - 1)."""
    clear, eoi = 256, 257
    bw = _MsbWriter()
    width = 9
    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    bw.put(clear, width)
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        bw.put(table[seq], width)
        table[cand] = nxt
        nxt += 1
        # early change: widen once the just-added entry's index is
        # 2^width - 1 (i.e. nxt == 2^width) — one code earlier than GIF
        if nxt == (1 << width) and width < 12:
            width += 1
        seq = bytes([b])
        if nxt == 4094:
            bw.put(clear, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
    if seq:
        bw.put(table[seq], width)
    bw.put(eoi, width)
    return bw.bytes()


def _hdiff(raw, row_bytes, spp):
    """Forward-apply TIFF horizontal differencing (tag 317 = 2):
    every sample stores its delta from the previous pixel's same
    sample — the inverse of what the decoder must apply."""
    buf = bytearray(raw)
    for r0 in range(0, len(buf), row_bytes):
        end = min(r0 + row_bytes, len(buf))
        for i in range(end - 1, r0 + spp - 1, -1):
            buf[i] = (buf[i] - buf[i - spp]) & 0xFF
    return bytes(buf)


def build_tiff(w, h, pixels, spp=1, photo=1, comp=1, rps=None,
               endian="<", colormap=None, predictor=1):
    import zlib

    rps = rps or h
    strips = []
    row_bytes = w * spp
    y = 0
    while y < h:
        rows = min(rps, h - y)
        raw = pixels[y * row_bytes : (y + rows) * row_bytes]
        if predictor == 2:
            raw = _hdiff(raw, row_bytes, spp)
        if comp == 32773:
            strips.append(packbits(raw))
        elif comp == 5:
            strips.append(tiff_lzw(raw))
        elif comp in (8, 32946):
            strips.append(zlib.compress(raw))
        else:  # 1 = none; unknown codes carry raw bytes so the
            strips.append(raw)  # decoder's gate fires, not a layout error
        y += rows
    entries = []

    extra = bytearray()
    hdr_size = 8
    ifd_at = hdr_size

    def entry(tag, typ, cnt, vals):
        entries.append((tag, typ, cnt, vals))

    entry(256, 3, 1, [w])
    entry(257, 3, 1, [h])
    entry(258, 3, spp, [8] * spp)
    entry(259, 3, 1, [comp])
    entry(262, 3, 1, [photo])
    entry(277, 3, 1, [spp])
    entry(278, 3, 1, [rps])
    entry(273, 4, len(strips), None)   # patched below
    entry(279, 4, len(strips), [len(s) for s in strips])
    if colormap is not None:
        entry(320, 3, len(colormap), colormap)
    if predictor != 1:
        entry(317, 3, 1, [predictor])
    entries.sort()
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    data_at = ifd_at + ifd_size

    # lay out out-of-line values then strips
    blobs = {}
    cursor = data_at
    for tag, typ, cnt, vals in entries:
        size = {3: 2, 4: 4}[typ] * cnt
        if size > 4:
            blobs[tag] = cursor
            cursor += size
    strip_offsets = []
    for s in strips:
        strip_offsets.append(cursor)
        cursor += len(s)

    out = bytearray()
    out += (b"II*\x00" if endian == "<" else b"MM\x00*")
    out += struct.pack(endian + "I", ifd_at)
    out += struct.pack(endian + "H", n)
    for tag, typ, cnt, vals in entries:
        if tag == 273:
            vals = strip_offsets
        out += struct.pack(endian + "HH", tag, typ)
        out += struct.pack(endian + "I", cnt)
        size = {3: 2, 4: 4}[typ] * cnt
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            packed = struct.pack(endian + fmt * cnt, *vals)
            out += packed + b"\x00" * (4 - size)
        else:
            out += struct.pack(endian + "I", blobs[tag])
    out += struct.pack(endian + "I", 0)  # next IFD
    for tag, typ, cnt, vals in entries:
        if tag == 273:
            vals = strip_offsets
        size = {3: 2, 4: 4}[typ] * cnt
        if size > 4:
            fmt = {3: "H", 4: "I"}[typ]
            out += struct.pack(endian + fmt * cnt, *vals)
    for s in strips:
        out += s
    return bytes(out)


def _gray(w, h):
    return bytes((x * 11 + y * 29) % 256 for y in range(h) for x in range(w))


@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("comp", [1, 32773, 5])
def test_gray_roundtrip_both_endians_all_compressions(endian, comp):
    w, h = 23, 9
    pix = _gray(w, h)
    tif = build_tiff(w, h, pix, comp=comp, endian=endian, rps=4)
    assert decode_image(tif) == (w, h, 1, pix)


def test_white_is_zero_inverts():
    w, h = 8, 4
    pix = _gray(w, h)
    tif = build_tiff(w, h, pix, photo=0)
    assert decode_image(tif)[3] == bytes(255 - v for v in pix)


def test_rgb_and_rgba_lzw():
    w, h = 17, 7
    rgb = bytes((x * 7 + y * 13 + c * 41) % 256
                for y in range(h) for x in range(w) for c in range(3))
    tif = build_tiff(w, h, rgb, spp=3, photo=2, comp=5)
    assert decode_image(tif) == (w, h, 3, rgb)
    rgba = bytearray()
    for i in range(w * h):
        rgba += rgb[i * 3 : i * 3 + 3] + b"\x80"
    tif4 = build_tiff(w, h, bytes(rgba), spp=4, photo=2, comp=32773)
    assert decode_image(tif4) == (w, h, 3, rgb)  # alpha dropped


def test_palette_colormap_scaled():
    w, h = 6, 3
    idx = bytes((x + y) % 4 for y in range(h) for x in range(w))
    cmap = [0] * 768
    cols16 = [(65535, 0, 0), (0, 65535, 0), (0, 0, 32768), (65535, 65535, 65535)]
    for i, (r, g, b) in enumerate(cols16):
        cmap[i] = r
        cmap[256 + i] = g
        cmap[512 + i] = b
    tif = build_tiff(w, h, idx, photo=3, colormap=cmap)
    _w, _h, ch, px = decode_image(tif)
    assert ch == 3
    exp = {0: (255, 0, 0), 1: (0, 255, 0),
           2: (0, 0, (32768 * 255 + 32767) // 65535),
           3: (255, 255, 255)}
    for i, v in enumerate(idx):
        assert tuple(px[i * 3 : i * 3 + 3]) == exp[v]


def test_lzw_dictionary_growth_large_image():
    w, h = 200, 40  # enough distinct sequences to cross width bumps
    pix = bytes((x * x + y * 3) % 251 for y in range(h) for x in range(w))
    tif = build_tiff(w, h, pix, comp=5)
    assert decode_image(tif)[3] == pix


def test_gates_and_malformed():
    w, h = 8, 4
    pix = _gray(w, h)
    tif = build_tiff(w, h, pix, comp=1)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_image(build_tiff(w, h, pix, comp=7))  # JPEG-in-TIFF
    with pytest.raises(ValueError):
        decode_image(tif[: len(tif) - 10])
    bomb = bytearray(tif)
    at = bytes(bomb).index(struct.pack("<HH", 256, 3))
    bomb[at + 8 : at + 12] = struct.pack("<I", 60000)
    at = bytes(bomb).index(struct.pack("<HH", 257, 3))
    bomb[at + 8 : at + 12] = struct.pack("<I", 60000)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_image(bytes(bomb))


def build_tiled_tiff(w, h, pixels, tw, tl, spp=1, photo=1, comp=5,
                     endian="<"):
    """Tile-organized fixture: tw x tl tiles padded at the edges,
    each compressed independently."""
    across = -(-w // tw)
    down = -(-h // tl)
    tiles = []
    for ty in range(down):
        for tx in range(across):
            tile = bytearray(tw * tl * spp)
            for yy in range(tl):
                sy = ty * tl + yy
                if sy >= h:
                    break
                cols = min(tw, w - tx * tw)
                src = (sy * w + tx * tw) * spp
                tile[yy * tw * spp : yy * tw * spp + cols * spp] = \
                    pixels[src : src + cols * spp]
            if comp == 5:
                tiles.append(tiff_lzw(bytes(tile)))
            elif comp == 32773:
                tiles.append(packbits(bytes(tile)))
            else:
                tiles.append(bytes(tile))
    entries = []

    def entry(tag, typ, cnt, vals):
        entries.append((tag, typ, cnt, vals))

    entry(256, 3, 1, [w])
    entry(257, 3, 1, [h])
    entry(258, 3, spp, [8] * spp)
    entry(259, 3, 1, [comp])
    entry(262, 3, 1, [photo])
    entry(277, 3, 1, [spp])
    entry(322, 3, 1, [tw])
    entry(323, 3, 1, [tl])
    entry(324, 4, len(tiles), None)
    entry(325, 4, len(tiles), [len(t) for t in tiles])
    entries.sort()
    n = len(entries)
    ifd_at = 8
    data_at = ifd_at + 2 + 12 * n + 4
    blobs = {}
    cursor = data_at
    for tag, typ, cnt, vals in entries:
        size = {3: 2, 4: 4}[typ] * cnt
        if size > 4:
            blobs[tag] = cursor
            cursor += size
    tile_offsets = []
    for t in tiles:
        tile_offsets.append(cursor)
        cursor += len(t)
    out = bytearray()
    out += (b"II*\x00" if endian == "<" else b"MM\x00*")
    out += struct.pack(endian + "I", ifd_at)
    out += struct.pack(endian + "H", n)
    for tag, typ, cnt, vals in entries:
        if tag == 324:
            vals = tile_offsets
        out += struct.pack(endian + "HH", tag, typ)
        out += struct.pack(endian + "I", cnt)
        size = {3: 2, 4: 4}[typ] * cnt
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            out += struct.pack(endian + fmt * cnt, *vals)
            out += b"\x00" * (4 - size)
        else:
            out += struct.pack(endian + "I", blobs[tag])
    out += struct.pack(endian + "I", 0)
    for tag, typ, cnt, vals in entries:
        if tag == 324:
            vals = tile_offsets
        size = {3: 2, 4: 4}[typ] * cnt
        if size > 4:
            fmt = {3: "H", 4: "I"}[typ]
            out += struct.pack(endian + fmt * cnt, *vals)
    for t in tiles:
        out += t
    return bytes(out)


@pytest.mark.parametrize("comp", [1, 32773, 5])
def test_tiled_tiff_gray_edge_padding(comp):
    """37x21 image in 16x16 tiles: right/bottom tiles are padded —
    the blit must crop exactly."""
    w, h = 37, 21
    pix = _gray(w, h)
    tif = build_tiled_tiff(w, h, pix, 16, 16, comp=comp)
    assert decode_image(tif) == (w, h, 1, pix)


def test_tiled_tiff_rgb_big_endian():
    w, h = 20, 18
    rgb = bytes((x * 5 + y * 3 + c * 17) % 256
                for y in range(h) for x in range(w) for c in range(3))
    tif = build_tiled_tiff(w, h, rgb, 16, 16, spp=3, photo=2,
                           comp=5, endian=">")
    assert decode_image(tif) == (w, h, 3, rgb)


def test_tiled_tiff_bad_grid_fails_loud():
    w, h = 20, 18
    pix = _gray(w, h)
    tif = bytearray(build_tiled_tiff(w, h, pix, 16, 16, comp=1))
    at = bytes(tif).index(struct.pack("<HH", 322, 3))
    tif[at + 8 : at + 10] = struct.pack("<H", 15)  # not multiple of 16
    with pytest.raises(ValueError, match="multiple of 16"):
        decode_image(bytes(tif))


def test_deflate_strips_roundtrip_both_codes():
    """Compression 8 (TIFF6 tech-note Deflate) and 32946 (legacy
    Adobe code) decode via stdlib zlib — gray and RGB, multi-strip."""
    w, h = 9, 6
    gray = bytes((x * 29 + y * 13) % 256 for y in range(h) for x in range(w))
    for code in (8, 32946):
        t = build_tiff(w, h, gray, comp=code, rps=2)
        assert decode_image(t) == (w, h, 1, gray)
    rgb = bytes((i * 41 + 5) % 256 for i in range(w * h * 3))
    t = build_tiff(w, h, rgb, spp=3, photo=2, comp=8, rps=3)
    assert decode_image(t) == (w, h, 3, rgb)


def test_predictor2_applies_to_every_codec():
    """Tag 317=2 (horizontal differencing) must be UN-applied after
    decompression — silently ignoring it scrambled every predictor-2
    file. Pinned for deflate, LZW, PackBits, and uncompressed, gray
    and multi-sample."""
    w, h = 8, 5
    gray = bytes((x * 7 + y * 31) % 256 for y in range(h) for x in range(w))
    for code in (1, 5, 8, 32773):
        t = build_tiff(w, h, gray, comp=code, rps=2, predictor=2)
        assert decode_image(t) == (w, h, 1, gray), code
    rgb = bytes((i * 23 + 3) % 256 for i in range(w * h * 3))
    t = build_tiff(w, h, rgb, spp=3, photo=2, comp=8, predictor=2)
    assert decode_image(t) == (w, h, 3, rgb)


def test_predictor_gate_and_corrupt_deflate():
    w, h = 4, 2
    gray = bytes(range(8))
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_image(build_tiff(w, h, gray, predictor=3))
    t = bytearray(build_tiff(w, h, gray, comp=8))
    t[-3] ^= 0xFF  # corrupt the zlib stream tail
    with pytest.raises(ValueError):
        decode_image(bytes(t))
