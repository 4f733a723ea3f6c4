"""Property-based fuzz for the r14 codec tier (hypothesis): encode →
decode must be the identity for every lossless format at ARBITRARY
geometry and content, not just the hand-picked suites' shapes.  Each
property also cross-checks one independent implementation where the
stdlib provides one (wave, audioop)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pulumi_aws_snowflake_spark.operators import audio as A
from etl_pulumi_aws_snowflake_spark.operators import multimodal as M
from etl_pulumi_aws_snowflake_spark.operators import video as V

_SETTINGS = dict(max_examples=60, deadline=None)


@settings(**_SETTINGS)
@given(
    n_frames=st.integers(1, 200),
    channels=st.integers(1, 4),
    bits=st.sampled_from([8, 16]),
    rate=st.integers(1, 192_000),
    data=st.data(),
)
def test_wav_roundtrip_any_geometry(n_frames, channels, bits, rate, data):
    n = n_frames * channels * bits // 8
    pcm = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    d = A.decode_wav(
        A.encode_wav(
            pcm, sample_rate=rate, bits_per_sample=bits, channels=channels
        )
    )
    assert d["pcm"] == pcm
    assert d["n_frames"] == n_frames
    assert (d["channels"], d["bits_per_sample"], d["sample_rate"]) == (
        channels, bits, rate,
    )
    # sample view is a lossless reshape of the PCM bytes
    flat = [v for fr in A.wav_samples(d) for v in fr]
    assert len(flat) == n_frames * channels


@settings(**_SETTINGS)
@given(codes=st.binary(min_size=1, max_size=256),
       law=st.sampled_from(["alaw", "ulaw"]))
def test_g711_roundtrip_matches_audioop_stream(codes, law):
    import pytest

    audioop = pytest.importorskip("audioop")
    d = A.decode_g711(A.encode_g711(codes, law=law))
    assert d["pcm"] == codes
    ref = audioop.ulaw2lin if law == "ulaw" else audioop.alaw2lin
    expect = list(struct.unpack(f"<{len(codes)}h", ref(codes, 2)))
    assert d["linear"] == expect


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    cs=st.sampled_from(["mono", "444", "420jpeg"]),
    n=st.integers(0, 5),
    fps=st.tuples(st.integers(1, 120_000), st.integers(1, 1001)),
    data=st.data(),
)
def test_y4m_roundtrip_any_geometry(w, h, cs, n, fps, data):
    if cs.startswith("420"):
        w, h = w * 2, h * 2  # 4:2:0 needs even dims
    size = V.frame_bytes(w, h, cs)
    frames = [
        bytes(data.draw(st.binary(min_size=size, max_size=size)))
        for _ in range(n)
    ]
    d = V.decode_y4m(
        V.encode_y4m(frames, width=w, height=h, fps=fps, colorspace=cs)
    )
    assert d["frames"] == frames
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, n)
    assert (d["fps_num"], d["fps_den"]) == fps


@settings(**_SETTINGS)
@given(w=st.integers(1, 12), h=st.integers(1, 12), data=st.data())
def test_bmp_roundtrip_any_geometry(w, h, data):
    n = w * h * 3
    rgb = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    assert M._decode_bmp(M.encode_bmp(rgb, w, h)) == rgb


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 10),
    n_entries=st.integers(1, 256),
    filt=st.sampled_from([0, 1, 2, 3, 4, None]),
    data=st.data(),
)
def test_png_palette_roundtrip_any_geometry(w, h, n_entries, filt, data):
    pal = bytes(
        data.draw(st.binary(min_size=n_entries * 3, max_size=n_entries * 3))
    )
    idx = bytes(
        data.draw(
            st.lists(
                st.integers(0, n_entries - 1),
                min_size=w * h, max_size=w * h,
            )
        )
    )
    raw = M.encode_png(idx, w, h, color_type=3, filter_choice=filt,
                       palette=pal)
    expect = b"".join(pal[i * 3 : i * 3 + 3] for i in idx)
    assert M._decode_png(raw) == expect
