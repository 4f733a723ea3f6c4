"""From-scratch WAV (RIFF/PCM) codec tests (r14 — the audio leg of the
north-star multimodal contract).

Strategy mirrors the PNG/JPEG suites: hand-built known-answer
containers that do NOT reuse encode_wav (so decoder vectors aren't
circular), encoder→decoder round-trips (bit-exact — PCM is lossless),
loud-error paths for every out-of-scope format, and the Arrow-worker
end-to-end through the judged entries' builders."""

from __future__ import annotations

import hashlib
import struct

import pytest

from etl_pulumi_aws_snowflake_spark.operators import audio as A
from etl_pulumi_aws_snowflake_spark.operators import multimodal as M


def _hand_wav(
    pcm: bytes,
    *,
    rate: int = 8000,
    bits: int = 8,
    channels: int = 1,
    fmt_code: int = 1,
    mid_chunks: bytes = b"",
    block_align: int | None = None,
    byte_rate: int | None = None,
) -> bytes:
    """Build a container byte-by-byte WITHOUT encode_wav so decoder
    vectors are independent of the encoder's choices."""
    ba = block_align if block_align is not None else channels * bits // 8
    br = byte_rate if byte_rate is not None else rate * ba
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate, br, ba, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + mid_chunks
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------
# known-answer decode


def test_decode_known_answer_8bit_mono():
    d = A.decode_wav(_hand_wav(bytes([0, 128, 255, 7])))
    assert d["pcm"] == bytes([0, 128, 255, 7])
    assert (d["channels"], d["bits_per_sample"]) == (1, 8)
    assert (d["sample_rate"], d["n_frames"]) == (8000, 4)
    assert d["duration_us"] == 4 * 1_000_000 // 8000
    assert A.wav_samples(d) == [(0,), (128,), (255,), (7,)]


def test_decode_known_answer_16bit_stereo_signed_le():
    # frames: (1, -1), (-32768, 32767) — the signed-16-LE convention
    pcm = struct.pack("<4h", 1, -1, -32768, 32767)
    d = A.decode_wav(_hand_wav(pcm, rate=44100, bits=16, channels=2))
    assert d["n_frames"] == 2
    assert A.wav_samples(d) == [(1, -1), (-32768, 32767)]
    assert d["duration_us"] == 2 * 1_000_000 // 44100


def test_decode_skips_unknown_chunks_with_word_alignment():
    """A LIST chunk with an ODD payload size: the walker must step over
    the pad byte the size field doesn't count, or the data chunk tag
    lands off-by-one and everything breaks."""
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    even = b"fake" + struct.pack("<I", 4) + b"abcd"
    d = A.decode_wav(_hand_wav(bytes([9, 9]), mid_chunks=odd + even))
    assert d["pcm"] == bytes([9, 9])


def test_decode_trailing_chunk_after_data_is_fine():
    raw = _hand_wav(bytes([1, 2]))  # decode stops at data; suffix unused
    assert A.decode_wav(raw)["pcm"] == bytes([1, 2])


# --------------------------------------------------------------------
# loud errors — every rejected format names itself


@pytest.mark.parametrize(
    "code,name",
    [(2, "ADPCM"), (6, "A-law"), (7, "mu-law"),
     (0x11, "ADPCM"), (0x1234, "0x1234")],
)
def test_non_pcm_formats_raise_with_name(code, name):
    with pytest.raises(ValueError, match=name):
        A.decode_wav(_hand_wav(bytes([0, 0]), fmt_code=code))


def test_not_riff_raises():
    with pytest.raises(ValueError, match="RIFF"):
        A.decode_wav(b"OggS" + b"\x00" * 40)


def test_riff_but_not_wave_raises():
    raw = bytearray(_hand_wav(bytes([0, 0])))
    raw[8:12] = b"AVI "
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        A.decode_wav(bytes(raw))


def test_truncated_container_raises():
    raw = _hand_wav(bytes(range(10)))
    with pytest.raises(ValueError, match="truncated"):
        A.decode_wav(raw[:-4])


def test_data_before_fmt_raises():
    body = (
        b"WAVE" + b"data" + struct.pack("<I", 2) + b"\x01\x02"
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="precedes fmt"):
        A.decode_wav(raw)


def test_missing_data_chunk_raises():
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 8000, 1, 8
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="no data chunk"):
        A.decode_wav(raw)


def test_24bit_pcm_decodes_signed_le():
    # two frames: 0x123456 and a negative value (sign extension)
    pcm = bytes([0x56, 0x34, 0x12]) + bytes([0xFF, 0xFF, 0xFF])
    d = A.decode_wav(_hand_wav(pcm, bits=24))
    assert (d["bits_per_sample"], d["n_frames"]) == (24, 2)
    assert A.wav_samples(d) == [(0x123456,), (-1,)]


def test_32bit_int_pcm_decodes():
    import struct as _s

    pcm = _s.pack("<2i", 2**30, -(2**31))
    d = A.decode_wav(_hand_wav(pcm, bits=32))
    assert A.wav_samples(d) == [(2**30,), (-(2**31),)]


def test_ieee_float_pcm_decodes():
    import struct as _s

    pcm = _s.pack("<4f", 0.0, -1.0, 0.5, 1.0)
    d = A.decode_wav(_hand_wav(pcm, bits=32, fmt_code=3, channels=2))
    assert d["sample_format"] == "float"
    assert (d["channels"], d["n_frames"]) == (2, 2)
    assert A.wav_samples(d) == [(0.0, -1.0), (0.5, 1.0)]


def test_ieee_float64_decodes():
    import struct as _s

    pcm = _s.pack("<2d", 0.25, -0.125)
    d = A.decode_wav(_hand_wav(pcm, bits=64, fmt_code=3))
    assert A.wav_samples(d) == [(0.25,), (-0.125,)]


_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def _hand_wav_extensible(pcm, *, sub_code, bits, channels=1, rate=8000,
                         guid_tail=_GUID_TAIL):
    ba = channels * bits // 8
    sub = struct.pack("<H", sub_code) + guid_tail
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, channels, rate, rate * ba, ba, bits,
        22, bits, 0,
    ) + sub
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_extensible_wrapper_unwraps_pcm_and_float():
    import struct as _s

    d = A.decode_wav(_hand_wav_extensible(bytes([1, 2]), sub_code=1, bits=8))
    assert (d["sample_format"], d["bits_per_sample"]) == ("int", 8)
    assert A.wav_samples(d) == [(1,), (2,)]
    d = A.decode_wav(_hand_wav_extensible(
        _s.pack("<2f", 0.5, -0.5), sub_code=3, bits=32))
    assert d["sample_format"] == "float"


def test_extensible_foreign_guid_raises():
    tail = bytes(reversed(_GUID_TAIL))
    with pytest.raises(ValueError, match="SubFormat GUID"):
        A.decode_wav(_hand_wav_extensible(
            bytes([0, 0]), sub_code=1, bits=8, guid_tail=tail))


def test_extensible_wrapped_adpcm_still_names_itself():
    with pytest.raises(ValueError, match="ADPCM"):
        A.decode_wav(_hand_wav_extensible(
            bytes([0, 0]), sub_code=2, bits=8))


def test_extensible_short_fmt_raises():
    raw = _hand_wav(bytes([0, 0]), fmt_code=0xFFFE)
    with pytest.raises(ValueError, match="EXTENSIBLE fmt chunk too short"):
        A.decode_wav(raw)


def test_float_with_integer_width_raises():
    with pytest.raises(ValueError, match="IEEE-float PCM invalid"):
        A.decode_wav(_hand_wav(b"\x00\x00", bits=16, fmt_code=3))


def test_inconsistent_block_align_raises():
    """A lying header (block_align disagreeing with channels × width)
    must fail loudly — silently trusting either field mis-frames the
    whole stream."""
    with pytest.raises(ValueError, match="inconsistent"):
        A.decode_wav(_hand_wav(bytes([0, 0]), block_align=2))
    with pytest.raises(ValueError, match="inconsistent"):
        A.decode_wav(_hand_wav(bytes([0, 0]), byte_rate=4000))


def test_partial_trailing_frame_raises():
    pcm = struct.pack("<3h", 1, 2, 3)  # 6 bytes, stereo-16 frame = 4
    with pytest.raises(ValueError, match="whole number"):
        A.decode_wav(_hand_wav(pcm, bits=16, channels=2))


def test_short_fmt_chunk_is_a_loud_valueerror():
    """Review r14: a fmt chunk DECLARING fewer than 16 bytes must be a
    ValueError, not a struct.error leak or a parse of the next chunk's
    bytes as fmt fields — for both the PCM and G.711 walks."""
    fmt8 = struct.pack("<HHI", 1, 1, 8000)  # 8 bytes only
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", 2) + b"\x01\x02"
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="fmt chunk too short"):
        A.decode_wav(raw)
    with pytest.raises(ValueError, match="fmt chunk too short"):
        A.decode_g711(raw)


def test_zero_frame_wav_features_are_identities_not_a_crash(spark):
    """Review r14: a zero-frame container is VALID audio — features
    must report the additive identities, not die on max() of an empty
    sequence inside the worker."""
    d = A.decode_wav(A.encode_wav(b""))
    assert d["n_frames"] == 0 and d["duration_us"] == 0

    import pandas as pd

    from etl_pulumi_aws_snowflake_spark.operators.audio import (
        extract_audio_features,
    )

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                "content": [A.encode_wav(b"")],
                "mime": ["audio/wav"],
                "n_bytes": [len(A.encode_wav(b""))],
            }
        )
    )
    row = extract_audio_features(media).collect()[0]
    assert (row["n_frames"], row["peak"], row["amp_sum"]) == (0, 0, 0)


def test_wav_frames_rejects_mono(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="stereo"):
        A.wav_frames(M.as_wav(docs)).collect()


# --------------------------------------------------------------------
# encoder round-trips (PCM is lossless — bit-exact, unlike JPEG)


@pytest.mark.parametrize("bits,channels", [(8, 1), (8, 3), (16, 1), (16, 2)])
def test_encode_decode_roundtrip_bit_exact(bits, channels):
    import random

    rng = random.Random(bits * 100 + channels)
    width = bits // 8
    n = 17 * channels * width  # odd frame count → odd data size at 8-bit
    pcm = bytes(rng.randrange(256) for _ in range(n))
    raw = A.encode_wav(
        pcm, sample_rate=22050, bits_per_sample=bits, channels=channels,
        extra_chunks=((b"LIST", b"INFO"),),
    )
    d = A.decode_wav(raw)
    assert d["pcm"] == pcm
    assert d["channels"] == channels and d["bits_per_sample"] == bits
    assert d["n_frames"] == 17


def test_encode_rejects_partial_frames_and_bad_geometry():
    with pytest.raises(ValueError, match="whole number"):
        A.encode_wav(b"\x00\x01\x02", bits_per_sample=16)
    with pytest.raises(ValueError, match="unsupported"):
        A.encode_wav(b"\x00", bits_per_sample=12)
    with pytest.raises(ValueError, match="channel count"):
        A.encode_wav(b"", channels=0)


def test_encoder_output_is_stdlib_wave_readable():
    """Cross-check against the stdlib ``wave`` module (an independent
    implementation that ships in this container): our container parses
    there with identical metadata and frames."""
    import io
    import wave

    pcm = struct.pack("<6h", 0, 1, -1, 100, -100, 32767)
    raw = A.encode_wav(pcm, sample_rate=16000, bits_per_sample=16, channels=2)
    with wave.open(io.BytesIO(raw)) as w:
        assert w.getnchannels() == 2
        assert w.getsampwidth() == 2
        assert w.getframerate() == 16000
        assert w.getnframes() == 3
        assert w.readframes(3) == pcm


def test_decoder_reads_stdlib_wave_output():
    import io
    import wave

    pcm = bytes([0, 10, 255, 128])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(pcm)
    d = A.decode_wav(buf.getvalue())
    assert d["pcm"] == pcm and d["sample_rate"] == 8000


# --------------------------------------------------------------------
# G.711 A-law / mu-law expansion


def test_g711_laws_match_audioop_exhaustively():
    """Cross-validate both expansion laws against stdlib audioop's C
    tables (an independent implementation) over ALL 256 code bytes —
    gated on import since audioop leaves the stdlib in 3.13."""
    audioop = pytest.importorskip("audioop")

    for b in range(256):
        assert A.mulaw_to_linear(b) == struct.unpack(
            "<h", audioop.ulaw2lin(bytes([b]), 2)
        )[0], f"mu-law byte {b:#04x}"
        assert A.alaw_to_linear(b) == struct.unpack(
            "<h", audioop.alaw2lin(bytes([b]), 2)
        )[0], f"A-law byte {b:#04x}"


def test_g711_spec_extremes():
    # ITU G.711 maxima: mu-law ±32124, A-law ±32256; mu 0xFF is zero
    assert A.mulaw_to_linear(0x80) == 32124
    assert A.mulaw_to_linear(0x00) == -32124
    assert A.mulaw_to_linear(0xFF) == 0
    assert A.alaw_to_linear(0xAA) == 32256
    assert A.alaw_to_linear(0x2A) == -32256


def test_decode_g711_container_roundtrip():
    codes = bytes(range(0, 256, 16))
    d = A.decode_g711(A.encode_g711(codes, law="ulaw", sample_rate=8000))
    assert d["law"] == "ulaw" and d["n_frames"] == len(codes)
    assert d["linear"] == [A.mulaw_to_linear(b) for b in codes]
    d = A.decode_g711(A.encode_g711(codes, law="alaw", channels=2))
    assert d["law"] == "alaw" and d["n_frames"] == len(codes) // 2
    assert d["linear"] == [A.alaw_to_linear(b) for b in codes]


def test_decode_g711_rejects_pcm_and_vice_versa():
    pcm = A.encode_wav(bytes([1, 2]))
    with pytest.raises(ValueError, match="format code 1"):
        A.decode_g711(pcm)
    g711 = A.encode_g711(bytes([1, 2]), law="ulaw")
    with pytest.raises(ValueError, match="mu-law"):
        A.decode_wav(g711)


def test_encode_g711_guards():
    with pytest.raises(ValueError, match="law"):
        A.encode_g711(b"\x00", law="pcm")
    with pytest.raises(ValueError, match="whole number"):
        A.encode_g711(b"\x00\x01\x02", law="alaw", channels=2)


def test_g711_samples_worker_matches_python_truth(spark):
    import hashlib as _h

    docs = spark.createDataFrame([(4, "tone")], "doc_id long, text string")
    h = _h.sha256(b"tone").hexdigest()
    for law, fn in [("ulaw", A.mulaw_to_linear), ("alaw", A.alaw_to_linear)]:
        rows = sorted(
            A.g711_samples(M.as_g711(docs, law)).collect(),
            key=lambda r: r["idx"],
        )
        assert [r["linear"] for r in rows] == [fn(ord(c)) for c in h[:16]]


# --------------------------------------------------------------------
# Arrow-worker end-to-end through the judged builders


def test_as_wav_payload_decodes_to_hex_prefix(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in A.extract_pcm_features(M.as_wav(docs)).collect()
    }
    for doc_id, text in [(1, "hello"), (2, "world")]:
        expect = hashlib.sha256(text.encode()).hexdigest()[:32].encode()
        assert rows[doc_id]["n_bytes"] == 32
        assert rows[doc_id]["checksum"] == hashlib.md5(expect).hexdigest()


def test_audio_features_match_python_truth(spark):
    docs = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    vals = hashlib.sha256(b"abc").hexdigest()[:32].encode()
    row = A.extract_audio_features(M.as_wav(docs)).collect()[0]
    assert row["n_frames"] == 32 and row["sample_rate"] == 8000
    assert row["duration_us"] == 4000
    assert row["peak"] == max(vals) and row["amp_sum"] == sum(vals)


def test_wav_frames_match_python_truth(spark):
    docs = spark.createDataFrame([(3, "xyz")], "doc_id long, text string")
    h = hashlib.sha256(b"xyz").hexdigest()
    rows = sorted(
        A.wav_frames(M.as_wav16(docs)).collect(), key=lambda r: r["frame_no"]
    )
    assert len(rows) == 8
    for j, r in enumerate(rows):
        assert r["ch0"] == ord(h[4 * j]) + 256 * ord(h[4 * j + 1])
        assert r["ch1"] == ord(h[4 * j + 2]) + 256 * ord(h[4 * j + 3])


def test_as_wav_geometry_guards():
    with pytest.raises(ValueError, match="n_samples"):
        M.as_wav(None, n_samples=65)
    with pytest.raises(ValueError, match="n_samples"):
        M.as_wav(None, n_samples=31)  # odd → container needs a pad byte
    with pytest.raises(ValueError, match="n_frames"):
        M.as_wav16(None, n_frames=17)


def test_capabilities_report_wav():
    assert M.capabilities()["wav_decode"] is True


def test_audio_features_reject_float_payloads(spark):
    import struct as _s

    from pyspark.sql import functions as F

    raw = _hand_wav(_s.pack("<2f", 0.5, -0.5), bits=32, fmt_code=3)
    media = spark.range(1).select(
        F.col("id").alias("doc_id"), F.lit(raw).alias("content")
    )
    with pytest.raises(Exception, match="exact-integer"):
        A.extract_audio_features(media).collect()
