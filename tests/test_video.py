"""From-scratch Y4M (YUV4MPEG2) codec tests (r14 — the video leg of
the north-star multimodal contract).

Same strategy as the WAV/PNG/JPEG suites: hand-built known-answer
streams independent of encode_y4m, loud-error paths, bit-exact
round-trips (raw video is lossless), and the Arrow-worker end-to-end
through the judged builders."""

from __future__ import annotations

import hashlib

import pytest

from etl_pulumi_aws_snowflake_spark.operators import multimodal as M
from etl_pulumi_aws_snowflake_spark.operators import video as V


# --------------------------------------------------------------------
# known-answer decode (hand-written streams, not encode_y4m output)


def test_decode_known_answer_mono():
    raw = b"YUV4MPEG2 W2 H2 F30:1 Ip A1:1 Cmono\nFRAME\nabcdFRAME\nwxyz"
    d = V.decode_y4m(raw)
    assert (d["width"], d["height"], d["n_frames"]) == (2, 2, 2)
    assert (d["fps_num"], d["fps_den"]) == (30, 1)
    assert d["frames"] == [b"abcd", b"wxyz"]
    assert d["duration_us"] == 2 * 1_000_000 // 30


def test_decode_c444_plane_arithmetic():
    # 1x2 C444 = 3 planes of 2 bytes = 6 bytes/frame
    raw = b"YUV4MPEG2 W1 H2 F25:1 C444\nFRAME\nyyuuvv"
    d = V.decode_y4m(raw)
    assert d["frames"] == [b"yyuuvv"] and d["colorspace"] == "444"


@pytest.mark.parametrize("cs", ["420", "420jpeg", "420mpeg2", "420paldv"])
def test_decode_c420_family_and_spec_default(cs):
    # 2x2 4:2:0 = 4 + 1 + 1 = 6 bytes/frame; C missing → spec default 420
    header = f"YUV4MPEG2 W2 H2 F25:1 C{cs}\n" if cs != "420" else (
        "YUV4MPEG2 W2 H2 F25:1\n"
    )
    d = V.decode_y4m(header.encode() + b"FRAME\nyyyyuv")
    assert d["frames"] == [b"yyyyuv"]


def test_decode_skips_x_extensions_and_rational_default_den():
    raw = b"YUV4MPEG2 W1 H1 F24 XYSCSS=MONO Cmono\nFRAME\nz"
    d = V.decode_y4m(raw)
    assert (d["fps_num"], d["fps_den"]) == (24, 1)
    assert d["frames"] == [b"z"]


def test_decode_empty_stream_has_zero_frames():
    d = V.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cmono\n")
    assert d["n_frames"] == 0 and d["duration_us"] == 0


# --------------------------------------------------------------------
# loud errors


def test_not_y4m_raises():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        V.decode_y4m(b"RIFF....WAVE")


def test_unsupported_colorspace_names_itself():
    with pytest.raises(ValueError, match="C422"):
        V.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\nxxxxxx")


def test_missing_geometry_raises():
    with pytest.raises(ValueError, match="W/H"):
        V.decode_y4m(b"YUV4MPEG2 F25:1 Cmono\n")


def test_truncated_final_frame_raises_not_crops():
    raw = b"YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAME\nabcdFRAME\nwx"
    with pytest.raises(ValueError, match="truncated"):
        V.decode_y4m(raw)


def test_garbage_between_frames_raises():
    raw = b"YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAME\nabcdJUNK"
    with pytest.raises(ValueError, match="FRAME marker"):
        V.decode_y4m(raw)


def test_frame_level_parameters_raise():
    raw = b"YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAME Ix\nabcd"
    with pytest.raises(ValueError, match="frame-level"):
        V.decode_y4m(raw)


def test_unknown_stream_parameter_raises():
    with pytest.raises(ValueError, match="unknown Y4M"):
        V.decode_y4m(b"YUV4MPEG2 W2 H2 Q9 Cmono\nFRAME\nabcd")


def test_odd_dimensions_under_420_raise():
    with pytest.raises(ValueError, match="even dimensions"):
        V.decode_y4m(b"YUV4MPEG2 W3 H3 F25:1 C420\nFRAME\nxxxxxxxxxxxxx")
    # review r14: ONE odd dimension must raise too — w*h*9 % 6 == 0
    # made 2x3 pass the old whole-byte check and mis-frame the stream
    with pytest.raises(ValueError, match="even dimensions"):
        V.decode_y4m(b"YUV4MPEG2 W2 H3 F25:1 C420\nFRAME\nxxxxxxxxx")
    with pytest.raises(ValueError, match="even dimensions"):
        V.frame_bytes(3, 2, "420jpeg")


def test_bad_frame_rate_raises():
    with pytest.raises(ValueError, match="frame rate"):
        V.decode_y4m(b"YUV4MPEG2 W1 H1 F0:1 Cmono\nFRAME\nz")


@pytest.mark.parametrize("hdr", [b"W-5 H3", b"W3 H-5", b"W0 H3", b"W3 H0"])
def test_negative_or_zero_geometry_raises_not_hangs(hdr):
    # ADVICE r14: W-5 made frame_bytes negative and the FRAME walk
    # moved pos backwards — an infinite loop instead of a loud error
    raw = b"YUV4MPEG2 " + hdr + b" F25:1 Cmono\nFRAME         \n"
    with pytest.raises(ValueError, match="geometry"):
        V.decode_y4m(raw)


# --------------------------------------------------------------------
# encoder round-trips (raw planes — bit-exact)


@pytest.mark.parametrize(
    "w,h,cs", [(2, 3, "mono"), (1, 2, "444"), (4, 2, "420jpeg")]
)
def test_encode_decode_roundtrip_bit_exact(w, h, cs):
    import random

    rng = random.Random(hash((w, h, cs)) & 0xFFFF)
    n = V.frame_bytes(w, h, cs)
    frames = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(3)]
    d = V.decode_y4m(
        V.encode_y4m(frames, width=w, height=h, fps=(30000, 1001),
                     colorspace=cs)
    )
    assert d["frames"] == frames
    assert (d["fps_num"], d["fps_den"]) == (30000, 1001)
    assert d["duration_us"] == 3 * 1_000_000 * 1001 // 30000


def test_encode_rejects_wrong_frame_size():
    with pytest.raises(ValueError, match="needs"):
        V.encode_y4m([b"abc"], width=2, height=2, colorspace="mono")


# --------------------------------------------------------------------
# Arrow-worker end-to-end through the judged builders


def test_video_frames_match_python_truth(spark):
    docs = spark.createDataFrame([(5, "clip")], "doc_id long, text string")
    h = hashlib.sha256(b"clip").hexdigest()
    rows = sorted(
        V.video_frames(M.as_y4m(docs)).collect(), key=lambda r: r["frame_no"]
    )
    assert len(rows) == 4
    for j, r in enumerate(rows):
        frame = h[6 * j : 6 * j + 6].encode()
        assert r["n_bytes"] == 6
        assert r["checksum"] == hashlib.md5(frame).hexdigest()


def test_video_meta_matches_builder_geometry(spark):
    docs = spark.createDataFrame([(9, "m")], "doc_id long, text string")
    row = V.video_meta(M.as_y4m(docs)).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (2, 3, 4)
    assert (row["fps_num"], row["fps_den"]) == (25, 1)
    assert row["duration_us"] == 160000


def test_as_y4m_geometry_guard():
    with pytest.raises(ValueError, match="raster bytes"):
        M.as_y4m(None, width=4, height=4, n_frames=5)


def test_capabilities_report_y4m():
    assert M.capabilities()["y4m_decode"] is True


def test_video_frame_features_samples_and_matches_image_tier(spark):
    """The composition operator's per-frame features equal a hand walk
    through decode_y4m + the image tier (PGM wrap + decode_image),
    including the luma-plane slice of a NON-mono (C420) stream and the
    every_n sampling stride — driven through the real DataFrame
    operator."""
    from etl_pulumi_aws_snowflake_spark.operators.multimodal import (
        decode_image,
    )

    w, h, n = 4, 2, 5
    frames = [bytes((i * 37 + k) % 256 for k in range(w * h * 9 // 6))
              for i in range(n)]
    payload = V.encode_y4m(frames, width=w, height=h, colorspace="420")
    media = spark.createDataFrame(
        [(3, bytearray(payload))], "doc_id long, content binary"
    )
    for every_n in (1, 2, 3):
        want = []
        for j in range(0, n, every_n):
            y = frames[j][: w * h]  # luma plane of the 420 frame
            rgb = decode_image(f"P5\n{w} {h}\n255\n".encode() + y)
            assert bytes(rgb[0::3]) == y  # gray->RGB replication exact
            want.append((3, j, w, h, w * h, sum(y), min(y), max(y),
                         hashlib.md5(rgb).hexdigest()))
        got = [
            tuple(r)
            for r in V.video_frame_features(media, every_n=every_n)
            .orderBy("frame_no").collect()
        ]
        assert got == want
