"""Property-based roundtrips for the round-12 codec tier (hypothesis):
random inputs through encode→decode must reproduce exactly. These are
the adversarial complement to the structured fixtures — the generators
explore block-size edges, rice-parameter extremes, LZW dictionary
boundaries, and sample-domain corners no hand-written case covers."""

from __future__ import annotations

import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import (
    _QM_FIXED,
    _QmDecoder,
    _gif_lzw,
    _tiff_lzw,
    decode_audio,
    decode_image,
    demux_video,
    encode_flac_verbatim,
    encode_y4m,
)


@settings(max_examples=40, deadline=None)
@given(
    pcm=st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
    rate=st.sampled_from([8000, 16000, 44100]),
    block=st.integers(16, 200),
)
def test_flac_verbatim_roundtrip_property(pcm, rate, block):
    r, c, b, got = decode_audio(
        encode_flac_verbatim(pcm, rate, 16, block_size=block))
    assert (r, c, b) == (rate, 1, 16)
    assert list(got) == pcm


@settings(max_examples=30, deadline=None)
@given(
    bits=st.lists(st.integers(0, 1), min_size=1, max_size=2000),
    nbins=st.integers(1, 6),
    data=st.data(),
)
def test_qm_coder_roundtrip_property(bits, nbins, data):
    from tests.test_jpeg_arith import QmEncoder

    ctx = [data.draw(st.integers(0, nbins - 1)) for _ in bits]
    enc = QmEncoder()
    st_e = bytearray(nbins)
    fx_e = bytearray([_QM_FIXED])
    for b, c in zip(bits, ctx):
        if c == 0:
            enc.encode(fx_e, 0, b)
        else:
            enc.encode(st_e, c, b)
    payload = enc.flush() + b"\xff\xd9"
    dec = _QmDecoder(payload, 0)
    st_d = bytearray(nbins)
    fx_d = bytearray([_QM_FIXED])
    for b, c in zip(bits, ctx):
        got = dec.decode(fx_d, 0) if c == 0 else dec.decode(st_d, c)
        assert got == b


@settings(max_examples=40, deadline=None)
@given(payload=st.binary(min_size=1, max_size=1500))
def test_tiff_lzw_roundtrip_property(payload):
    from tests.test_tiff import tiff_lzw

    assert _tiff_lzw(tiff_lzw(payload), len(payload)) == payload


@settings(max_examples=40, deadline=None)
@given(
    idx=st.lists(st.integers(0, 15), min_size=1, max_size=1500),
    min_code=st.sampled_from([4, 5]),
)
def test_gif_lzw_roundtrip_property(idx, min_code):
    from tests.test_gif import lzw_compress

    data = bytes(idx)
    assert bytes(_gif_lzw(lzw_compress(data, min_code), min_code,
                          len(data))) == data


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    nframes=st.integers(1, 4),
    data=st.data(),
)
def test_y4m_mono_roundtrip_property(w, h, nframes, data):
    frames = [
        bytes(data.draw(st.integers(0, 255)) for _ in range(w * h))
        for _ in range(nframes)
    ]
    v = demux_video(encode_y4m(w, h, frames))
    assert v["frames"] == frames


@settings(max_examples=40, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_decoders_never_crash_on_junk_property(junk):
    """Arbitrary bytes (optionally wearing a real magic) must decode
    or raise ValueError/NotImplementedError — never IndexError,
    struct.error, or a hang."""
    for magic in (b"", b"GIF89a", b"II*\x00", b"fLaC", b"\x89PNG\r\n\x1a\n",
                  b"\xff\xd8\xff", b"FORM\x00\x00\x01\x00AIFF",
                  b"YUV4MPEG2 "):
        for fn in (decode_image, decode_audio):
            try:
                fn(magic + junk)
            except (ValueError, NotImplementedError):
                pass
        try:
            demux_video(magic + junk)
        except (ValueError, NotImplementedError):
            pass


# -- round-13 surfaces -------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    pcm=st.lists(st.integers(-128, 127), min_size=0, max_size=400),
    block=st.integers(16, 96),
)
def test_flac_verbatim_8bit_roundtrip_property(pcm, block):
    """The r13 byte-aligned fast path covers 8-bit verbatim runs too."""
    r, c, b, got = decode_audio(
        encode_flac_verbatim(pcm, 8000, 8, block_size=block))
    assert (r, c, b) == (8000, 1, 8)
    assert list(got) == pcm


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 120),
    nch=st.sampled_from([1, 2]),
    pi=st.integers(0, 6),
    delta0=st.integers(16, 4096),
    data=st.data(),
)
def test_ms_adpcm_roundtrip_property(n, nch, pi, delta0, data):
    from tests.test_audio import _ms_encode, make_wav_ms

    per = 2 * ((n + 1) // 2)  # even nibble count per channel
    spb = per + 2
    chans = [
        [data.draw(st.integers(-32768, 32767)) for _ in range(spb)]
        for _ in range(nch)
    ]
    blocks, recon = _ms_encode(chans, spb, pi=pi, delta0=delta0)
    got = decode_audio(make_wav_ms(blocks, 8000, nch, spb))[3]
    exp = []
    for i in range(spb):
        for c in range(nch):
            exp.append(recon[c][i])
    assert list(got) == exp


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    comp=st.sampled_from([1, 5, 8, 32773]),
    predictor=st.sampled_from([1, 2]),
    spp=st.sampled_from([1, 3]),
    data=st.data(),
)
def test_tiff_predictor_codec_matrix_property(w, h, comp, predictor,
                                              spp, data):
    from tests.test_tiff import build_tiff

    px = bytes(data.draw(st.integers(0, 255)) for _ in range(w * h * spp))
    t = build_tiff(w, h, px, spp=spp, photo=2 if spp == 3 else 1,
                   comp=comp, predictor=predictor)
    assert decode_image(t) == (w, h, spp, px)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 10),
    depth=st.sampled_from([1, 2, 4]),
    data=st.data(),
)
def test_png_sub8_gray_roundtrip_property(w, h, depth, data):
    from tests.test_multimodal import _png

    mask = (1 << depth) - 1
    vals = [data.draw(st.integers(0, mask)) for _ in range(w * h)]
    per = 8 // depth
    stride = (w * depth + 7) // 8
    rows = bytearray(stride * h)
    for y in range(h):
        for x in range(w):
            shift = 8 - depth * ((x % per) + 1)
            rows[y * stride + x // per] |= vals[y * w + x] << shift
    got = decode_image(_png(w, h, 0, bytes(rows), depth=depth))
    scale = 255 // mask
    assert got == (w, h, 1, bytes(v * scale for v in vals))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    depth=st.sampled_from([10, 12, 16]),
    data=st.data(),
)
def test_y4m_high_depth_scaling_property(w, h, depth, data):
    import struct

    from simple_etl_spark.llm.multimodal import decode_video_frame

    ceil = (1 << depth) - 1
    luma = [data.draw(st.integers(0, ceil)) for _ in range(w * h)]
    body = struct.pack(f"<{w * h}H", *luma)
    # drive through a 444 frame with neutral chroma so the scaled
    # luma must appear on all channels
    mid = (ceil + 1) // 2
    frame = body + struct.pack(f"<{w * h}H", *([mid] * (w * h))) * 2
    _w, _h, _c, px = decode_video_frame(f"yuv444p{depth}", w, h, frame)
    half = ceil >> 1
    exp = [(v * 255 + half) // ceil for v in luma]
    assert all(
        px[i * 3] == px[i * 3 + 1] == px[i * 3 + 2] == exp[i]
        for i in range(w * h)
    )


@settings(max_examples=40, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_bmp_and_rle_junk_never_crash_property(junk):
    """Random bytes behind a BMP header shell (palette depths, RLE
    compressions) must decode or raise — never IndexError/KeyError."""
    import struct

    for bpp, comp in ((8, 0), (8, 1), (4, 2), (4, 0), (1, 0), (24, 0)):
        used = min(1 << bpp, 4)
        table = b"\x00\x01\x02\x00" * used
        off = 14 + 40 + len(table)
        dib = struct.pack("<IiiHHIIiiII", 40, 5, 4, 1, bpp, comp,
                          len(junk), 0, 0, used, 0)
        head = struct.pack("<2sIHHI", b"BM", off + len(junk), 0, 0, off)
        try:
            decode_image(head + dib + table + junk)
        except (ValueError, NotImplementedError):
            pass
