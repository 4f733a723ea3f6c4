"""From-scratch baseline JPEG (SOF0) codec tests (VERDICT r13 #1).

Strategy mirrors the PNG suite: hand-built known-answer streams that do
NOT reuse encode_jpeg (so decoder vectors aren't circular), encoder→
decoder round-trips (exact on the constant-block contract, tolerance-
bounded on random rasters), loud-error paths for every out-of-scope
feature, and the Arrow-worker end-to-end through the judged entries'
builders."""

from __future__ import annotations

import hashlib
import random
import struct

import pytest

from etl_pulumi_aws_snowflake_spark.operators import jpeg as J
from etl_pulumi_aws_snowflake_spark.operators import multimodal as M


# --------------------------------------------------------------------
# primitives


def test_zigzag_is_a_permutation_with_spec_prefix():
    assert sorted(J.ZIGZAG) == list(range(64))
    # first diagonal walk straight from T.81 figure 5
    assert J.ZIGZAG[:10] == (0, 1, 8, 16, 9, 2, 3, 10, 17, 24)
    # zigzag is symmetric under transposition read back-to-front
    assert J.ZIGZAG[63] == 63 and J.ZIGZAG[62] == 62


def test_magnitude_extend_roundtrip():
    """_magnitude and _extend are exact inverses over the baseline
    coefficient range, including the one's-complement negatives."""
    for v in list(range(-255, 256)) + [-2047, 2047, -1024, 1023]:
        size, bits = J._magnitude(v)
        assert J._extend(bits, size) == v, v
    assert J._magnitude(0) == (0, 0)
    assert J._magnitude(1) == (1, 1)
    assert J._magnitude(-1) == (1, 0)  # one's complement
    assert J._magnitude(-3) == (2, 0)


def test_canonical_huffman_codes_match_annex_c():
    """Canonical assignment over the Annex K DC-luminance BITS: the
    spec's generate_size/code tables give 00,010..110,1110,... ."""
    codes = J._build_huffman_codes(J._DC_LUM_BITS, J._DC_LUM_VALS)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)
    # prefix-free: no code is a prefix of a longer one
    all_codes = sorted(codes.values(), key=lambda cl: cl[1])
    for i, (c1, l1) in enumerate(all_codes):
        for c2, l2 in all_codes[i + 1 :]:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1


def test_ycbcr_conversions_are_floor_half_up_and_clamped():
    assert J.rgb_to_ycbcr(255, 255, 255) == (255, 128, 128)
    assert J.rgb_to_ycbcr(0, 0, 0) == (0, 128, 128)
    assert J.ycbcr_to_rgb(255, 128, 128) == (255, 255, 255)
    # clamp binds on saturated chroma (r and b overflow; g stays in
    # range at floor(255 - 0.344136*127 - 0.714136*127 + 0.5) = 121)
    assert J.ycbcr_to_rgb(255, 255, 255) == (255, 121, 255)
    assert J.ycbcr_to_rgb(0, 0, 0) == (0, 135, 0)


# --------------------------------------------------------------------
# hand-built known-answer streams (decoder only — not via encode_jpeg)


def _seg(marker: bytes, body: bytes) -> bytes:
    return marker + struct.pack(">H", len(body) + 2) + body


def _dht(tclass: int, tid: int, lengths: list[int], vals: bytes) -> bytes:
    bits = [0] * 16
    for ln in lengths:
        bits[ln - 1] += 1
    return _seg(b"\xff\xc4", bytes([tclass << 4 | tid]) + bytes(bits) + vals)


def _gray_frame(q_seg: bytes, entropy: bytes, dc_sym: int) -> bytes:
    """Minimal 8x8 grayscale SOF0 stream: trivial one-code Huffman
    tables (DC: single symbol ``dc_sym`` with code '0' of length 1;
    AC: single EOB symbol, code '0' length 1) so entropy bytes can be
    written by hand."""
    return (
        b"\xff\xd8"
        + q_seg
        + _seg(
            b"\xff\xc0",
            bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]),
        )
        + _dht(0, 0, [1], bytes([dc_sym]))
        + _dht(1, 0, [1], bytes([0x00]))
        + _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )


def test_decode_known_answer_dc_only_8bit_dqt():
    """DC diff +5 against quant step 16: dequant 80, IDCT of a lone DC
    is constant 80/8 = 10, +128 level shift → every pixel 138.
    Entropy bits: DC code '0', magnitude '101', EOB '0' → 01010 padded
    with 1s = 0x57."""
    q = _seg(b"\xff\xdb", bytes([0x00]) + bytes([16] * 64))
    payload = _gray_frame(q, bytes([0x57]), dc_sym=3)
    w, h, rgb = J.decode_jpeg(payload)
    assert (w, h) == (8, 8)
    assert rgb == bytes([138]) * (8 * 8 * 3)


def test_decode_known_answer_16bit_dqt_and_ff_stuffing_and_clamp():
    """Three features in one vector: a precision-1 (16-bit) DQT, a
    0xFF00-stuffed entropy byte, and the sample clamp.  DC table maps
    code '11' (len 2) → size 8; raw bits 11111111 = +255; dequant by
    the 16-bit quant step 16 → 4080; IDCT constant 510 + 128 clamps to
    255.  Entropy bits 11 11111111 0(EOB) pad → bytes FF (stuffed) DF."""
    q = _seg(
        b"\xff\xdb", bytes([0x10]) + struct.pack(">64H", *([16] * 64))
    )
    stream = (
        b"\xff\xd8"
        + q
        + _seg(
            b"\xff\xc0",
            bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]),
        )
        + _dht(0, 0, [2, 2, 2, 2], bytes([1, 2, 3, 8]))  # 8 → code '11'
        + _dht(1, 0, [1], bytes([0x00]))
        + _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0xFF, 0x00, 0xDF])
        + b"\xff\xd9"
    )
    w, h, rgb = J.decode_jpeg(stream)
    assert rgb == bytes([255]) * (8 * 8 * 3)


def test_decode_known_answer_ac_coefficient():
    """One AC coefficient on top of DC: AC table code '0' (len 1) →
    symbol 0x01 (run 0, size 1), second AC symbol '10' (len 2) → EOB.
    Entropy: DC '0' size3 '101'(+5), AC '0' bit '1'(+1), EOB '10' →
    0101 0110 = 0x56.  Quant step 16 everywhere: coefficients are
    DC=80, AC=16 in zigzag position 1 → natural (0,1), the first
    HORIZONTAL frequency — the decoded block must vary along x and be
    constant along y (a transposed coefficient layout would flip it) —
    checked against an independent numpy IDCT."""
    import numpy as np

    q = _seg(b"\xff\xdb", bytes([0x00]) + bytes([16] * 64))
    stream = (
        b"\xff\xd8"
        + q
        + _seg(
            b"\xff\xc0",
            bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]),
        )
        + _dht(0, 0, [1], bytes([3]))
        + _dht(1, 0, [1, 2], bytes([0x01, 0x00]))
        + _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x56])
        + b"\xff\xd9"
    )
    w, h, rgb = J.decode_jpeg(stream)
    coefs = np.zeros((8, 8))
    coefs[0, 0] = 80.0
    coefs[0, 1] = 16.0
    block = J._DCT_M.T @ coefs @ J._DCT_M + 128.0
    expect = np.clip(np.floor(block + 0.5), 0, 255).astype(int)
    got = [rgb[3 * i] for i in range(64)]
    assert got == [int(expect[y, x]) for y in range(8) for x in range(8)]
    # and the column structure is real: varies along x, constant in y
    assert len({int(expect[0, x]) for x in range(8)}) > 1
    assert all(expect[y, 0] == expect[0, 0] for y in range(8))


# --------------------------------------------------------------------
# encoder → decoder round-trips


def test_constant_block_exact_roundtrip_gray():
    """The exactness contract the judged entry leans on: constant 8x8
    blocks under flat-8 tables decode bit-exactly, DC prediction
    chained across blocks."""
    h = hashlib.sha256(b"vector").hexdigest()
    vals = [ord(c) for c in h[:4]]
    raster = bytes(
        vals[(yy // 8) * 2 + (xx // 8)] for yy in range(16) for xx in range(16)
    )
    w, hh, rgb = J.decode_jpeg(J.encode_jpeg(raster, 16, 16))
    assert (w, hh) == (16, 16)
    assert rgb == b"".join(
        bytes([raster[i]] * 3) for i in range(len(raster))
    )


def test_constant_mcu_exact_roundtrip_color_420_with_restarts():
    """4:2:0 constant 16x16 MCUs with DRI=2: MCU1 exercises cross-MCU
    DC prediction, MCU2 sits after an RST reset; decoded colors are
    exactly the double rounding trip, uniform across each MCU."""
    colors = [(250, 10, 10), (10, 250, 10), (63, 97, 200)]
    raster = b"".join(
        bytes(colors[xx // 16]) for yy in range(16) for xx in range(48)
    )
    payload = J.encode_jpeg(
        raster, 48, 16, color=True, subsample=True, restart_interval=2
    )
    assert b"\xff\xdd" in payload  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    w, hh, rgb = J.decode_jpeg(payload)
    for i, (r, g, b) in enumerate(colors):
        er, eg, eb = J.ycbcr_to_rgb(*J.rgb_to_ycbcr(r, g, b))
        for yy in range(16):
            for xx in range(16):
                off = (yy * 48 + i * 16 + xx) * 3
                assert rgb[off : off + 3] == bytes((er, eg, eb)), (i, yy, xx)


def test_random_roundtrip_tolerance_gray_and_color():
    """General rasters are lossy as JPEG always is; with unit quant
    tables the only loss is DCT/IDCT float rounding plus (for color)
    the YCbCr trip, so the per-sample error is tightly bounded.  Odd
    dimensions exercise MCU edge padding + crop."""
    rng = random.Random(14)
    q1 = (1,) * 64
    for w0, h0 in [(8, 8), (13, 9), (24, 16)]:
        pix = bytes(rng.randrange(256) for _ in range(w0 * h0))
        w, h, rgb = J.decode_jpeg(
            J.encode_jpeg(pix, w0, h0, quant=q1)
        )
        assert (w, h) == (w0, h0)
        err = max(abs(rgb[3 * i] - pix[i]) for i in range(w0 * h0))
        assert err <= 2, (w0, h0, err)
        # gray replicates to r=g=b
        assert all(
            rgb[3 * i] == rgb[3 * i + 1] == rgb[3 * i + 2]
            for i in range(w0 * h0)
        )
    pix = bytes(rng.randrange(256) for _ in range(16 * 16 * 3))
    w, h, rgb = J.decode_jpeg(
        J.encode_jpeg(pix, 16, 16, color=True, quant=q1)
    )
    err = max(abs(rgb[i] - pix[i]) for i in range(len(pix)))
    assert err <= 6, err  # YCbCr int trip adds a few counts


def test_restart_interval_roundtrip_matches_no_restart():
    """Restart markers change the stream framing, not the pixels:
    the same raster encodes to identical decoded output with and
    without DRI."""
    rng = random.Random(3)
    pix = bytes(rng.randrange(256) for _ in range(32 * 8))
    plain = J.decode_jpeg(J.encode_jpeg(pix, 32, 8))
    with_rst = J.decode_jpeg(J.encode_jpeg(pix, 32, 8, restart_interval=1))
    assert plain == with_rst


def test_subsampled_422_style_shapes_decode():
    """Sampling factors beyond the encoder's two shapes still decode:
    a 4:2:0 stream whose height is one MCU but width several exercises
    the replication upsample indexing."""
    colors = [(200, 40, 90)] * 2
    raster = b"".join(
        bytes(colors[xx // 16]) for yy in range(16) for xx in range(32)
    )
    w, h, rgb = J.decode_jpeg(
        J.encode_jpeg(raster, 32, 16, color=True, subsample=True)
    )
    er, eg, eb = J.ycbcr_to_rgb(*J.rgb_to_ycbcr(200, 40, 90))
    assert rgb[:3] == bytes((er, eg, eb))
    assert rgb[-3:] == bytes((er, eg, eb))


# --------------------------------------------------------------------
# loud errors — every out-of-scope feature names itself


def _valid_gray() -> bytes:
    return J.encode_jpeg(bytes(range(64)), 8, 8)


def test_loud_error_progressive_and_arithmetic_and_lossless():
    base = _valid_gray()
    for sof, msg in [
        # SOF2 now DECODES (tests/test_jpeg_progressive.py) — but a
        # baseline stream RELABELED progressive carries a full-band
        # interleaved scan, which is malformed progressive: loud
        (0xC2, "Se=0"),
        (0xC9, "arithmetic"),
        (0xC3, "lossless"),
        (0xC1, "extended sequential"),
    ]:
        # rewrite the SOF0 marker byte
        idx = base.index(b"\xff\xc0")
        corrupt = base[: idx + 1] + bytes([sof]) + base[idx + 2 :]
        with pytest.raises(ValueError, match=msg):
            J.decode_jpeg(corrupt)


def test_loud_error_12bit_precision_and_cmyk():
    base = _valid_gray()
    idx = base.index(b"\xff\xc0")
    corrupt = bytearray(base)
    corrupt[idx + 4] = 12  # precision byte
    with pytest.raises(ValueError, match="12-bit"):
        J.decode_jpeg(bytes(corrupt))
    # 4-component frame header
    sof4 = _seg(
        b"\xff\xc0",
        bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([4])
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]),
    )
    stream = b"\xff\xd8" + sof4
    with pytest.raises(ValueError, match="CMYK"):
        J.decode_jpeg(stream)


def test_loud_error_truncation_and_sync():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg")
    base = _valid_gray()
    with pytest.raises(ValueError, match="truncated|ran out|cut off"):
        J.decode_jpeg(base[:40])
    # entropy data cut off mid-scan
    with pytest.raises(ValueError, match="ran out|truncated|marker"):
        J.decode_jpeg(base[:-10])
    with pytest.raises(ValueError, match="EOI before any scan"):
        J.decode_jpeg(b"\xff\xd8\xff\xd9")


def test_loud_error_missing_tables_and_bad_rst():
    q = _seg(b"\xff\xdb", bytes([0x00]) + bytes([16] * 64))
    # SOS without any DHT
    stream = (
        b"\xff\xd8"
        + q
        + _seg(
            b"\xff\xc0",
            bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]),
        )
        + _seg(b"\xff\xda", bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x57])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="missing DC Huffman"):
        J.decode_jpeg(stream)
    # wrong RST sequence number: encode with DRI=1 then swap RST0→RST5
    pix = bytes(range(64)) * 4
    payload = J.encode_jpeg(pix, 16, 16, restart_interval=1)
    assert b"\xff\xd0" in payload
    with pytest.raises(ValueError, match="RST sequence"):
        J.decode_jpeg(payload.replace(b"\xff\xd0", b"\xff\xd5", 1))


def test_loud_error_progressive_scan_params_and_multiscan():
    base = _valid_gray()
    idx = base.index(b"\xff\xda")
    corrupt = bytearray(base)
    corrupt[idx + 7] = 1  # Ss=1: spectral selection
    with pytest.raises(ValueError, match="spectral|progressive"):
        J.decode_jpeg(bytes(corrupt))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="gray raster"):
        J.encode_jpeg(b"123", 8, 8)
    with pytest.raises(ValueError, match="RGB raster"):
        J.encode_jpeg(b"123", 8, 8, color=True)
    with pytest.raises(ValueError, match="color-only"):
        J.encode_jpeg(bytes(64), 8, 8, subsample=True)


# --------------------------------------------------------------------
# decode_image dispatch + Arrow-worker end-to-end


def test_decode_image_dispatches_jpeg():
    h = hashlib.sha256(b"dispatch").hexdigest()
    vals = [ord(c) for c in h[:4]]
    raster = bytes(
        vals[(yy // 8) * 2 + (xx // 8)] for yy in range(16) for xx in range(16)
    )
    payload = J.encode_jpeg(raster, 16, 16)
    rgb = M.decode_image(payload)
    assert rgb == b"".join(bytes([v] * 3) for v in raster)
    assert M.capabilities()["jpeg_decode"] is True


def test_unsupported_jpeg_falls_through_to_pil(monkeypatch):
    """Same contract as PNG: a JPEG the tier rejects → PIL when
    present, loud ValueError when not.  Real progressive now decodes
    in-tier (r15), so the vehicle is a MALFORMED progressive stream
    (a relabeled baseline whose full-band scan is an illegal DC
    scan)."""
    base = _valid_gray()
    idx = base.index(b"\xff\xc0")
    progressive = base[: idx + 1] + bytes([0xC2]) + base[idx + 2 :]
    monkeypatch.setattr(M, "_HAVE_PIL", False)
    with pytest.raises(ValueError, match="Se=0"):
        M.decode_image(progressive)

    class FakeImg:
        def convert(self, mode):
            import numpy as np

            return np.array([[[1, 2, 3]]], dtype=np.uint8)

    class FakePIL:
        @staticmethod
        def open(buf):
            return FakeImg()

    monkeypatch.setattr(M, "_HAVE_PIL", True)
    monkeypatch.setattr(M, "_PILImage", FakePIL)
    assert M.decode_image(progressive) == bytes([1, 2, 3])


def test_prefer_fast_without_pil_is_a_noop(monkeypatch):
    """The production arm is capability-GATED, never -required: with
    PIL absent (this container), prefer_fast must route through the
    from-scratch tier bit-identically."""
    base = _valid_gray()
    monkeypatch.setattr(M, "_HAVE_PIL", False)
    assert M.decode_image(base, prefer_fast=True) == M.decode_image(base)


def test_prefer_fast_uses_pil_first_and_falls_back(monkeypatch):
    """With PIL present, prefer_fast decodes JPEG through it; a PIL
    failure falls back to the from-scratch tier instead of losing the
    payload."""
    base = _valid_gray()
    want = M.decode_image(base)

    class FakeImg:
        def convert(self, mode):
            import numpy as np

            return np.array([[[9, 9, 9]]], dtype=np.uint8)

    class FakePIL:
        @staticmethod
        def open(buf):
            return FakeImg()

    monkeypatch.setattr(M, "_HAVE_PIL", True)
    monkeypatch.setattr(M, "_PILImage", FakePIL)
    assert M.decode_image(base, prefer_fast=True) == bytes([9, 9, 9])
    assert M.decode_image(base) == want  # judged path ignores the arm

    class BrokenPIL:
        @staticmethod
        def open(buf):
            raise OSError("no codec")

    monkeypatch.setattr(M, "_PILImage", BrokenPIL)
    assert M.decode_image(base, prefer_fast=True) == want


@pytest.mark.skipif(not M._HAVE_PIL, reason="PIL not installed")
def test_pil_fast_arm_matches_from_scratch():
    """PIXEL PARITY between the libjpeg arm and the from-scratch
    decoder on fixture payloads (runs only where a codec library
    exists; constant blocks round-trip bit-exactly in both)."""
    h = hashlib.sha256(b"parity").hexdigest()
    vals = [ord(c) for c in h[:4]]
    raster = bytes(
        vals[(yy // 8) * 2 + (xx // 8)] for yy in range(16) for xx in range(16)
    )
    payload = J.encode_jpeg(raster, 16, 16)
    assert M.decode_image(payload, prefer_fast=True) == M.decode_image(payload)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, f"jpeg doc {i}") for i in range(6)], "doc_id long, text string"
    )


def test_as_jpeg_gray_end_to_end(spark, docs_df):
    """The judged gray entry's full path in the Arrow worker: encode
    SOF0, decode, checksum equals the predicted expanded raster."""
    rows = {
        r["doc_id"]: r
        for r in M.extract_features(M.as_jpeg_gray(docs_df), fake=False).collect()
    }
    for i in range(6):
        hx = hashlib.sha256(f"jpeg doc {i}".encode()).hexdigest()
        expect = b"".join(
            bytes([ord(hx[(yy // 8) * 2 + (xx // 8)])] * 3)
            for yy in range(16)
            for xx in range(16)
        )
        assert rows[i]["n_bytes"] == 768
        assert rows[i]["checksum"] == hashlib.md5(expect).hexdigest()


def test_jpeg_mcu_colors_end_to_end(spark, docs_df):
    """The judged color entry's full path: three 4:2:0 MCUs with
    restarts decode to the exact double-rounding-trip colors."""
    rows = M.jpeg_mcu_colors(M.as_jpeg_color(docs_df)).collect()
    assert len(rows) == 18
    by_key = {(r["doc_id"], r["mcu"]): r for r in rows}
    for i in range(6):
        hx = hashlib.sha256(f"jpeg doc {i}".encode()).hexdigest()
        for m in range(3):
            er, eg, eb = J.ycbcr_to_rgb(
                *J.rgb_to_ycbcr(
                    ord(hx[3 * m]), ord(hx[3 * m + 1]), ord(hx[3 * m + 2])
                )
            )
            r = by_key[(i, m)]
            assert (r["r"], r["g"], r["b"]) == (er, eg, eb), (i, m)


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2 (review r14): a one-component scan is NON-interleaved —
    MCU = one 8x8 block in raster order, whatever the frame header's
    sampling factors say.  A grayscale stream re-declared as h=v=2 must
    decode identically to its 1x1 form (before the fix it walked 16x16
    MCUs and died with a truncation error or wrong pixels)."""
    pix = bytes((i * 7 + 3) % 256 for i in range(24 * 16))
    plain = J.encode_jpeg(pix, 24, 16)
    idx = plain.index(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) ncomp(1) then cid, hv, tq
    patched = bytearray(plain)
    assert patched[idx + 11] == 0x11
    patched[idx + 11] = 0x22
    assert J.decode_jpeg(bytes(patched)) == J.decode_jpeg(plain)


def test_malformed_segments_raise_valueerror_not_struct_error():
    """Review r14: short segment bodies must surface as the documented
    loud ValueError (also what decode_image's PIL fall-through
    catches), never an escaping struct.error/IndexError."""
    # DRI with a 1-byte body (declared length 3)
    bad_dri = b"\xff\xd8" + b"\xff\xdd\x00\x03\x01" + b"\xff\xd9"
    with pytest.raises(ValueError):
        J.decode_jpeg(bad_dri)
    # SOF0 with a truncated body
    bad_sof = b"\xff\xd8" + b"\xff\xc0\x00\x04\x08\x00" + b"\xff\xd9"
    with pytest.raises(ValueError):
        J.decode_jpeg(bad_sof)


def test_vectorized_color_conversion_matches_scalar():
    """The numpy plane conversion in _decode_scan must be bit-identical
    to ycbcr_to_rgb (same constants, association, floor(+0.5), clamp) —
    pinned over a deterministic sweep of the YCbCr cube."""
    import numpy as np

    vals = list(range(0, 256, 15)) + [255]
    trip = [(y, cb, cr) for y in vals for cb in vals for cr in vals]
    yp = np.array([t[0] for t in trip], dtype=np.float64)
    cb = np.array([t[1] for t in trip], dtype=np.float64) - 128.0
    cr = np.array([t[2] for t in trip], dtype=np.float64) - 128.0
    vec = np.clip(
        np.stack(
            [
                np.floor(yp + 1.402 * cr + 0.5),
                np.floor(yp - 0.344136 * cb - 0.714136 * cr + 0.5),
                np.floor(yp + 1.772 * cb + 0.5),
            ],
            axis=1,
        ),
        0.0,
        255.0,
    ).astype(int)
    for i, (y, b_, r_) in enumerate(trip):
        assert tuple(vec[i]) == J.ycbcr_to_rgb(y, b_, r_), (y, b_, r_)
