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
