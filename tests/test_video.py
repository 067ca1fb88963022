"""Video container tier (round 12): stdlib demux for MJPEG/DIB AVI
and YUV4MPEG2, per-frame decode composed with the full JPEG decoder,
and the Spark plumbing (video_features / video_frames mapInPandas).
Fixtures are byte-built by the engine's own encode_y4m /
encode_avi_mjpeg synthesizers; the JPEG frames come from the
independent test encoder so the container layer is exercised over a
payload the decoder tier already pins byte-exactly."""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "tests")

from simple_etl_spark.llm.multimodal import (
    decode_video_frame,
    demux_video,
    encode_avi_mjpeg,
    encode_y4m,
    video_features,
    video_frames,
)

from tests.test_jpeg import encode_jpeg, reference_decode


def test_y4m_mono_roundtrip():
    frames = [bytes(range(64)), bytes([200]) * 64, bytes([5]) * 64]
    v = demux_video(encode_y4m(8, 8, frames, (30, 1)))
    assert (v["container"], v["width"], v["height"]) == ("y4m", 8, 8)
    assert (v["fps_num"], v["fps_den"], v["frame_kind"]) == (30, 1, "gray")
    assert v["frames"] == frames
    assert decode_video_frame("gray", 8, 8, frames[0])[3] == frames[0]


def test_y4m_yuv420_matches_jpeg_matrix():
    """The raw-YUV frame decode must use the same BT.601 full-range
    matrix and nearest-sample chroma upsampling as the JPEG path:
    gray chroma (128) yields r=g=b=luma exactly."""
    w, h = 4, 2
    yp = bytes([0, 64, 128, 255, 10, 20, 200, 250])
    cp = bytes([128, 128])  # 2x1 chroma plane at 4:2:0
    hdr = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
    payload = hdr + b"FRAME\n" + yp + cp + cp
    v = demux_video(payload)
    assert v["frame_kind"] == "yuv420"
    fw, fh, fc, px = decode_video_frame("yuv420", w, h, v["frames"][0])
    assert (fw, fh, fc) == (w, h, 3)
    assert all(px[i * 3] == px[i * 3 + 1] == px[i * 3 + 2] == yp[i]
               for i in range(w * h))


def test_y4m_yuv444_known_color():
    """Full-resolution chroma: one saturated pixel through the JFIF
    matrix (y=76, cb=84, cr=255 is ~pure red under BT.601)."""
    hdr = b"YUV4MPEG2 W1 H1 F25:1 Ip A1:1 C444\n"
    payload = hdr + b"FRAME\n" + bytes([76, 84, 255])
    v = demux_video(payload)
    _w, _h, _c, px = decode_video_frame("yuv444", 1, 1, v["frames"][0])
    r, g, b = px
    assert r == 254 and g < 35 and b < 10


def test_avi_mjpeg_frames_decode_via_full_jpeg_tier():
    w, h = 16, 8
    pix1 = bytes((x * 7 + y * 11) % 256 for y in range(h) for x in range(w))
    pix2 = bytes([137] * (w * h))
    j1, b1, s1 = encode_jpeg(pix1, w, h, 1)
    j2, b2, s2 = encode_jpeg(pix2, w, h, 1)
    v = demux_video(encode_avi_mjpeg(w, h, [j1, j2], (15, 1)))
    assert (v["container"], v["frame_kind"]) == ("avi", "jpeg")
    assert (v["width"], v["height"], v["fps_num"], v["fps_den"]) == \
        (w, h, 15, 1)
    f1 = decode_video_frame("jpeg", w, h, v["frames"][0])
    assert f1[3] == reference_decode(b1, s1, w, h, 1)


def test_avi_dib_frames_decode_bottom_up_bgr():
    """Uncompressed BI_RGB AVI: bottom-up BGR rows, 4-byte padded."""
    w, h = 2, 2
    # desired image top-down RGB: top = [blue, white], bottom =
    # [red, green]; DIB stores BGR rows bottom-up, 4-byte padded
    bgr_bottom = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"   # red, green
    bgr_top = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # blue, white
    frame = bgr_bottom + bgr_top  # bottom row stored FIRST
    avi = bytearray(encode_avi_mjpeg(w, h, [bytes(frame)]))
    at = bytes(avi).index(b"MJPG")  # strh handler fourcc
    avi[at : at + 4] = b"DIB "
    at2 = bytes(avi).index(b"MJPG")  # strf biCompression
    avi[at2 : at2 + 4] = b"\x00\x00\x00\x00"
    v = demux_video(bytes(avi))
    assert v["frame_kind"] == "dib"
    _w, _h, _c, px = decode_video_frame("dib", w, h, v["frames"][0])
    assert px[0:6] == bytes([0, 0, 255, 255, 255, 255])  # blue, white
    assert px[6:12] == bytes([255, 0, 0, 0, 255, 0])     # red, green


def test_unknown_codec_and_malformed_fail_loud():
    j, _, _ = encode_jpeg(bytes([9] * 64), 8, 8, 1)
    avi = bytearray(encode_avi_mjpeg(8, 8, [j]))
    for at in [i for i in range(len(avi) - 4)
               if bytes(avi[i:i + 4]) == b"MJPG"][1:]:
        avi[at : at + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        demux_video(bytes(avi))
    with pytest.raises(ValueError):
        demux_video(b"RIFF\x10\x00\x00\x00AVI LIST")
    with pytest.raises(ValueError):
        demux_video(b"YUV4MPEG2 W4 H2 C420jpeg\nFRAME\n\x00")
    with pytest.raises(NotImplementedError, match="colorspace"):
        demux_video(b"YUV4MPEG2 W4 H2 C411\nFRAME\n")
    with pytest.raises(ValueError):
        demux_video(b"\x89PNG....")


def test_video_header_bomb_is_rejected():
    hdr = b"YUV4MPEG2 W60000 H60000 F25:1 Cmono\n"
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        demux_video(hdr)


def test_video_features_and_frames_spark(spark):
    frames = [bytes([10] * 64), bytes([20] * 64), bytes([60] * 64)]
    y4m = encode_y4m(8, 8, frames, (30, 1))
    j, _, _ = encode_jpeg(bytes([100] * 64), 8, 8, 1)
    avi = encode_avi_mjpeg(8, 8, [j, j], (15, 1))
    df = spark.createDataFrame(
        [(1, bytearray(y4m)), (2, bytearray(avi)), (3, None),
         (4, bytearray(b"junk"))],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r for r in video_features(df).collect()}
    assert rows[1]["container"] == "y4m" and rows[1]["n_frames"] == 3
    assert rows[1]["mean_px"] == (10 + 20 + 60) * 64 // 192
    assert rows[2]["container"] == "avi" and rows[2]["n_frames"] == 2
    assert rows[2]["fps_num"] == 15
    assert rows[3]["container"] is None and rows[4]["container"] is None

    fr = video_frames(df.filter("doc_id = 1"), stride=2).collect()
    assert [r["frame_idx"] for r in fr] == [0, 2]
    assert [r["mean_px"] for r in fr] == [10, 60]
    with pytest.raises(ValueError, match="stride"):
        video_frames(df, stride=0)


def test_avi_rec_sublists_demux_in_stream_order():
    """AVI 1.0 interleaving wraps frames in 'rec ' sub-LISTs inside
    'movi'; the demuxer must recurse into them in stream order
    instead of silently reporting zero frames (ADVICE r12)."""
    w, h = 16, 8
    pixs = [bytes((x * 3 + y * 5 + s) % 256
                  for y in range(h) for x in range(w))
            for s in (0, 50, 100)]
    jpgs = [encode_jpeg(p, w, h, 1)[0] for p in pixs]
    base = encode_avi_mjpeg(w, h, jpgs, (10, 1))

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    # frame 0 direct, frames 1-2 inside one 'rec ' LIST
    movi = chunk(
        b"LIST",
        b"movi" + chunk(b"00dc", jpgs[0])
        + chunk(b"LIST", b"rec " + chunk(b"00dc", jpgs[1])
                + chunk(b"00dc", jpgs[2])),
    )
    i = base.index(b"movi")
    body = base[8 : i - 8] + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    v = demux_video(avi)
    assert v["frame_kind"] == "jpeg"
    assert v["frames"] == jpgs


def test_y4m_high_bit_depth_planar():
    """C420p10/C444p12-style tags (2-byte LE samples) decode through
    the exact 16-bit-PNG rounding rule into the 8-bit pipeline: a
    gray-chroma high-depth frame must reproduce the scaled luma on
    all three channels, and out-of-ceiling samples fail loud."""
    w, h = 4, 2
    luma10 = [0, 256, 512, 1023, 100, 200, 300, 1000]
    mid10 = [512] * 2  # 2x1 chroma at 4:2:0, 10-bit midpoint
    body = struct.pack("<8H", *luma10) + struct.pack("<2H", *mid10) * 2
    payload = (b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420p10\n"
               + b"FRAME\n" + body)
    v = demux_video(payload)
    assert v["frame_kind"] == "yuv420p10"
    fw, fh, fc, px = decode_video_frame("yuv420p10", w, h, v["frames"][0])
    assert (fw, fh, fc) == (w, h, 3)
    exp = [(x * 255 + 511) // 1023 for x in luma10]
    # the 10-bit midpoint 512 scales to exactly 128 — the 8-bit
    # matrix's neutral chroma — so r=g=b=scaled luma must hold
    assert all(
        px[i * 3] == px[i * 3 + 1] == px[i * 3 + 2] == exp[i]
        for i in range(w * h)
    )
    # 444p12 single pixel: 12-bit midpoint 2048 -> 128 as well
    body = struct.pack("<3H", 4095, 2048, 2048)
    payload = (b"YUV4MPEG2 W1 H1 F25:1 C444p12\n" + b"FRAME\n" + body)
    v = demux_video(payload)
    px = decode_video_frame("yuv444p12", 1, 1, v["frames"][0])[3]
    assert px == bytes([255, 255, 255])
    # out-of-ceiling sample fails loud
    bad = struct.pack("<8H", 1024, *luma10[1:]) \
        + struct.pack("<2H", *mid10) * 2
    with pytest.raises(ValueError, match="ceiling"):
        decode_video_frame("yuv420p10", w, h, bad)
    # unknown high-depth tag still gates
    with pytest.raises(NotImplementedError, match="colorspace"):
        demux_video(b"YUV4MPEG2 W4 H2 C420p9\nFRAME\n")


def test_y4m_high_bit_depth_odd_dims_fail_with_clear_error():
    """Odd dimensions under chroma subsampling must hit the same
    even-dimension guard the 8-bit tags do — a literal kind compare
    let C420p10/C422p12 odd-dims files through to a garbled
    frame-offset error (review r14)."""
    with pytest.raises(ValueError, match="must be even"):
        demux_video(b"YUV4MPEG2 W3 H2 F25:1 C420p10\nFRAME\n" + b"\x00" * 18)
    with pytest.raises(ValueError, match="must be even"):
        demux_video(b"YUV4MPEG2 W4 H3 F25:1 C420p16\nFRAME\n" + b"\x00" * 36)
    with pytest.raises(ValueError, match="must be even"):
        demux_video(b"YUV4MPEG2 W3 H1 F25:1 C422p12\nFRAME\n" + b"\x00" * 12)
    # odd dims stay fine where chroma is full-resolution
    body = struct.pack("<3H", 4095, 2048, 2048)
    v = demux_video(b"YUV4MPEG2 W1 H1 F25:1 C444p12\n" + b"FRAME\n" + body)
    assert v["width"] == 1 and v["height"] == 1


def test_avi_video_stream_id_scopes_frames():
    """An audio-first AVI numbers the video stream '01': frames must
    come from '01dc' chunks only, and a stray other-stream '02dc'
    chunk must not interleave; two vids streams gate loud."""
    w, h = 16, 8
    pix = bytes((x * 7 + y) % 256 for y in range(h) for x in range(w))
    j, _, _ = encode_jpeg(pix, w, h, 1)
    base = encode_avi_mjpeg(w, h, [j], (10, 1))

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    # build hdrl with an 'auds' strl FIRST, then the vids strl
    strh_a = (b"auds" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 0, 0, 0, 0, 0))
    strl_a = chunk(b"LIST", b"strl" + chunk(b"strh", strh_a))
    i = base.index(b"LIST", base.index(b"hdrl"))  # vids strl
    # reuse base's avih + vids strl; insert the audio strl before it
    avih_at = base.index(b"avih")
    avih = chunk(b"avih", base[avih_at + 8 : avih_at + 8 + 56])
    vids_at = base.index(b"strl") - 8
    vids_end = vids_at + 8 + struct.unpack(
        "<I", base[vids_at + 4 : vids_at + 8])[0]
    vids = base[vids_at:vids_end]
    hdrl = chunk(b"LIST", b"hdrl" + avih + strl_a + vids)
    movi = chunk(b"LIST", b"movi"
                 + chunk(b"01dc", j)          # the video stream
                 + chunk(b"00wb", b"\x00" * 8)  # audio data
                 + chunk(b"02dc", b"garbage"))  # stray stream
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    v = demux_video(avi)
    assert len(v["frames"]) == 1 and v["frames"][0] == j
    # two video streams fail loud
    hdrl2 = chunk(b"LIST", b"hdrl" + avih + vids + vids)
    body2 = b"AVI " + hdrl2 + movi
    with pytest.raises(NotImplementedError, match="one video"):
        demux_video(b"RIFF" + struct.pack("<I", len(body2)) + body2)
