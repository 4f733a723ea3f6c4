"""Full-matrix PNG decode (operators/multimodal.py::_decode_png, r15):
every spec-legal (color type, bit depth) combination plus Adam7
interlace, verified against an INDEPENDENT reference encoder built in
this file (lattice scatter + per-pass filtering + bit packing written
from RFC 2083 directly, sharing no code with the decoder)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pulumi_aws_snowflake_spark.operators import multimodal as M

SIG = b"\x89PNG\r\n\x1a\n"
ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _pack_row(samples: list[int], depth: int) -> bytes:
    """One scanline's channel samples → bytes (MSB-first sub-byte
    packing / big-endian 16-bit), per RFC 2083 §2.3."""
    if depth == 16:
        return b"".join(struct.pack(">H", s) for s in samples)
    if depth == 8:
        return bytes(samples)
    out, acc, nbits = bytearray(), 0, 0
    for s in samples:
        acc = (acc << depth) | s
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc, nbits = 0, 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


def _filter_rows(rows: list[bytes], fbpp: int, choice) -> bytes:
    """Filter a region's scanlines; ``choice`` is an int or a per-row
    callable (cycle filters to keep every unfilter path hot)."""
    prior = bytes(len(rows[0])) if rows else b""
    out = bytearray()
    for y, row in enumerate(rows):
        f = choice(y) if callable(choice) else choice
        out.append(f)
        if f == 0:
            out += row
        elif f == 1:
            out += bytes(
                (row[x] - (row[x - fbpp] if x >= fbpp else 0)) & 0xFF
                for x in range(len(row))
            )
        elif f == 2:
            out += bytes((row[x] - prior[x]) & 0xFF for x in range(len(row)))
        else:
            raise AssertionError("reference encoder: use filters 0-2")
        prior = row
    return bytes(out)


def build_png(
    width: int,
    height: int,
    depth: int,
    color_type: int,
    pixels: list[list[tuple[int, ...]]],
    interlace: int = 0,
    plte: bytes | None = None,
    filter_choice=0,
) -> bytes:
    """Independent reference container builder: ``pixels[y][x]`` is a
    tuple of channel samples at full depth range."""
    ch = CHANNELS[color_type]

    def region(px_rows):
        rows = [
            _pack_row([s for p in r for s in p], depth) for r in px_rows
        ]
        fbpp = max(1, ch * depth // 8)
        return _filter_rows(rows, fbpp, filter_choice)

    if interlace:
        stream = bytearray()
        for x0, y0, dx, dy in ADAM7:
            sub = [
                [pixels[y][x] for x in range(x0, width, dx)]
                for y in range(y0, height, dy)
            ]
            sub = [r for r in sub if r]
            if sub:
                stream += region(sub)
        raw = bytes(stream)
    else:
        raw = region(pixels)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, interlace
    )
    return (
        SIG + _chunk(b"IHDR", ihdr)
        + (_chunk(b"PLTE", plte) if plte is not None else b"")
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _expect_rgb(pixels, color_type, depth, plte=None) -> bytes:
    out = bytearray()
    for row in pixels:
        for p in row:
            if color_type == 3:
                idx = p[0]
                out += plte[idx * 3 : idx * 3 + 3]
                continue
            if depth == 16:
                vals = tuple(s >> 8 for s in p)
            elif depth in (1, 2, 4):
                vals = tuple(s * (255 // ((1 << depth) - 1)) for s in p)
            else:
                vals = p
            if color_type in (0, 4):
                out += bytes((vals[0],) * 3)
            else:
                out += bytes(vals[:3])
    return bytes(out)


def _grid(width, height, ch, maxv):
    return [
        [
            tuple((x * 7 + y * 13 + c * 29) % (maxv + 1) for c in range(ch))
            for x in range(width)
        ]
        for y in range(height)
    ]


@pytest.mark.parametrize("color_type,depth", [
    (0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
    (2, 8), (2, 16),
    (4, 8), (4, 16),
    (6, 8), (6, 16),
    (3, 1), (3, 2), (3, 4), (3, 8),
])
def test_every_legal_type_depth_combo_decodes(color_type, depth):
    w, h = 5, 4
    maxv = (1 << depth) - 1
    plte = None
    if color_type == 3:
        n = min(1 << depth, 256)
        plte = bytes(
            v for i in range(n) for v in (i * 3 % 256, 255 - i, i ^ 0x55)
        )
        maxv = n - 1
    px = _grid(w, h, CHANNELS[color_type], maxv)
    raw = build_png(w, h, depth, color_type, px, plte=plte)
    assert M._decode_png(raw) == _expect_rgb(px, color_type, depth, plte)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (5, 5), (8, 8), (9, 10), (16, 13)])
def test_adam7_interlace_scatter(w, h):
    """Interlaced decode equals the plain decode of the same pixels —
    including sizes where several Adam7 passes are EMPTY (w or h < 8)."""
    px = _grid(w, h, 3, 255)
    inter = build_png(w, h, 8, 2, px, interlace=1)
    plain = build_png(w, h, 8, 2, px, interlace=0)
    want = _expect_rgb(px, 2, 8)
    assert M._decode_png(inter) == want
    assert M._decode_png(plain) == want


def test_adam7_16bit_gray_with_filtered_passes():
    px = _grid(10, 9, 1, 65535)
    raw = build_png(
        10, 9, 16, 0, px, interlace=1, filter_choice=lambda y: y % 3
    )
    assert M._decode_png(raw) == _expect_rgb(px, 0, 16)


def test_16bit_filters_use_two_byte_fbpp():
    """Sub/Up filtering at depth 16 must step 2 bytes per channel —
    an fbpp=1 bug shifts every sample's low byte into the next pixel."""
    px = _grid(6, 3, 3, 65535)
    raw = build_png(6, 3, 16, 2, px, filter_choice=1)
    assert M._decode_png(raw) == _expect_rgb(px, 2, 16)


def test_subbyte_palette_with_sub_filter():
    plte = bytes(v for i in range(4) for v in (i * 40, i * 50, i * 60))
    px = [[(x % 4,) for x in range(11)] for _ in range(3)]  # 11 → padded byte
    raw = build_png(11, 3, 2, 3, px, plte=plte, filter_choice=1)
    assert M._decode_png(raw) == _expect_rgb(px, 3, 2, plte)


def test_illegal_depth_type_combo_is_loud():
    px = [[(0,)]]
    raw = build_png(1, 1, 8, 3, px, plte=b"\x00\x00\x00")
    # hand-corrupt the IHDR to claim 16-bit palette (spec-illegal)
    bad = bytearray(raw)
    ihdr_at = bad.index(b"IHDR")
    bad[ihdr_at + 12] = 16  # depth byte
    body = bytes(bad[ihdr_at : ihdr_at + 4 + 13])
    bad[ihdr_at + 17 : ihdr_at + 21] = struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="not legal for color type"):
        M._decode_png(bytes(bad))


def test_short_and_overlong_rasters_are_loud():
    px = _grid(4, 4, 3, 255)
    good = build_png(4, 4, 8, 2, px)

    def with_idat(raw_bytes):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        return (
            SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw_bytes))
            + _chunk(b"IEND", b"")
        )

    full = zlib.decompress(
        good[good.index(b"IDAT") + 4 :].split(b"IEND")[0][:-4]
    )
    with pytest.raises(ValueError, match="short of"):
        M._decode_png(with_idat(full[:-1]))
    with pytest.raises(ValueError, match="beyond the final scanline"):
        M._decode_png(with_idat(full + b"\x00"))


@given(
    w=st.integers(1, 12), h=st.integers(1, 12),
    color_type=st.sampled_from([0, 2, 4, 6]),
    depth=st.sampled_from([8, 16]),
    interlace=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=60, deadline=None)
def test_fuzz_roundtrip_all_geometries(w, h, color_type, depth, interlace, seed):
    import random

    rnd = random.Random(seed)
    maxv = (1 << depth) - 1
    px = [
        [
            tuple(rnd.randint(0, maxv) for _ in range(CHANNELS[color_type]))
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    raw = build_png(
        w, h, depth, color_type, px, interlace=interlace,
        filter_choice=lambda y: y % 3,
    )
    assert M._decode_png(raw) == _expect_rgb(px, color_type, depth)
