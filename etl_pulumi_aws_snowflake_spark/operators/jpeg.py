"""From-scratch baseline JPEG (SOF0) codec — stdlib + numpy only
(VERDICT r13 #1: the last common real-image format behind the PIL
capability gate; JPEG is the dominant payload in a real multimodal
corpus).

Decoder: full marker walk (APPn/COM skipped, DQT with 8/16-bit
precision, DHT canonical-Huffman table build, DRI restart intervals,
SOF0 frame header, SOS scan header), byte-stuffed entropy-segment bit
reader, per-MCU Huffman entropy decode (DC predictor + magnitude
EXTEND, AC run/size with EOB and ZRL), dequantization through the
zigzag order, 8x8 IDCT as two orthogonal matrix products, sampling-
factor chroma upsample (nearest/replication), and YCbCr->RGB with the
JFIF constants.  PROGRESSIVE (SOF2) streams decode too (r15, T.81
Annex G.2): coefficients accumulate across scans — interleaved or
single-component DC first/refinement passes, single-component AC
spectral bands with EOBn run lengths, AC successive-approximation
refinement with correction bits — and dequant/IDCT/color conversion
run once at EOI through the same reconstruction tail as baseline.
Loud ``ValueError`` on everything outside that scope: arithmetic
coding (SOF9-11/DAC), 12-bit precision, hierarchical/lossless SOFs,
4-component (CMYK) scans, missing tables, truncated or mis-sequenced
streams, malformed scan parameters.

Encoder: exists for the same reason :func:`multimodal.encode_png`
does — to synthesize REAL containers so the decode path can be judged
and tested without any codec library.  It writes standards-correct
baseline streams: ITU T.81 Annex K Huffman tables in DHT (the decoder
still parses the tables from the stream — nothing is shared out of
band), interleaved 4:4:4 or 4:2:0 MCUs, optional restart markers,
caller-supplied quantization tables.

Exactness contract the judged entries lean on (and tests pin): an 8x8
block of ONE constant sample value round-trips bit-exactly through
flat quantization tables whose DC step divides 8 — the DCT of a
constant block is a single DC coefficient ``8*(v-128)`` (an exact
integer in IEEE double, the AC sums cancel to ~1e-13 and quantize to
hard zeros), so quantize/dequantize/IDCT reproduce ``v`` exactly.
That turns lossy JPEG into a relationally-replayable oracle: constant
blocks in, known pixels out, with the Huffman/MCU/restart/upsample/
color-convert machinery all on the judged path.  General rasters are
lossy as usual and are covered by round-trip tolerance tests.

Reference anchor: the reference pipeline treats media as opaque S3
objects (glue/glue_job.py:22-32 moves bytes, never decodes); this
module is the decode tier a 100 TB multimodal corpus needs on top.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# Zigzag scan: natural (row-major) index of the k-th zigzag position.
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

#: Default quantization table: flat 8s.  Deliberate: a flat table with
#: DC step 8 makes constant blocks round-trip EXACTLY (module
#: docstring), which is what lets decode results be value-judged.
FLAT_Q8 = (8,) * 64

# ITU T.81 Annex K "typical" Huffman tables (public spec text).  The
# encoder writes these into DHT; the decoder always parses DHT.
_DC_LUM_BITS = (0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_LUM_VALS = tuple(range(12))
_DC_CHR_BITS = (0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
_DC_CHR_VALS = tuple(range(12))
_AC_LUM_BITS = (0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
_AC_LUM_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)
_AC_CHR_BITS = (0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
_AC_CHR_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

# 8x8 orthonormal DCT-II matrix: C[u, x] = 0.5*c(u)*cos((2x+1)u*pi/16),
# c(0)=1/sqrt(2) else 1.  Forward: F = C @ f @ C.T; inverse: f = C.T @
# F @ C — the separable form of the T.81 definition.
_DCT_M = np.array(
    [
        [
            0.5
            * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _round_half_up(x: float) -> int:
    """floor(x + 0.5) — the deterministic rounding both sides of the
    oracle replay use (Python's round() is banker's; DuckDB's differs
    again; floor(+0.5) is the one form both engines compute
    identically in IEEE double)."""
    return math.floor(x + 0.5)


def rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF RGB->YCbCr, floor(+0.5) rounding, clamped to 0..255.
    Module-level (not encoder-internal) because the judged color
    entry's oracle replays exactly this arithmetic in SQL."""
    y = _round_half_up(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _round_half_up(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = _round_half_up(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    return (
        min(255, max(0, y)),
        min(255, max(0, cb)),
        min(255, max(0, cr)),
    )


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF YCbCr->RGB, floor(+0.5) rounding, clamped — the decoder's
    color conversion, also replayed verbatim by the oracle."""
    r = _round_half_up(y + 1.402 * (cr - 128))
    g = _round_half_up(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b = _round_half_up(y + 1.772 * (cb - 128))
    return (
        min(255, max(0, r)),
        min(255, max(0, g)),
        min(255, max(0, b)),
    )


def _build_huffman_codes(bits: tuple, vals: tuple) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment per T.81 Annex C: symbols in
    ``vals`` order get ascending codes, ``bits[l]`` of length l.
    Returns {symbol: (code, length)}."""
    codes, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def pad_align(self) -> None:
        """Byte-align with 1 bits (T.81 F.1.2.3 — before RST/EOI)."""
        while self._n:
            self.write(1, 1)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, raw bits) for a DC diff / AC value: negatives
    use the one's-complement form the EXTEND procedure inverts."""
    if v == 0:
        return 0, 0
    size = v.bit_length() if v > 0 else (-v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    writer: _BitWriter,
    samples: np.ndarray,
    qtable: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """FDCT + quantize + Huffman-encode one 8x8 block; returns the new
    DC predictor."""
    shifted = samples.astype(np.float64) - 128.0
    coefs = _DCT_M @ shifted @ _DCT_M.T
    quant = np.floor(coefs / qtable + 0.5).astype(np.int64)
    zz = [int(quant.flat[ZIGZAG[k]]) for k in range(64)]
    diff = zz[0] - pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL: 16 zeros
            writer.write(zc, zl)
            run -= 16
        size, bits = _magnitude(zz[k])
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return zz[0]


def _dht_segment(tclass: int, tid: int, bits: tuple, vals: tuple) -> bytes:
    body = bytes([tclass << 4 | tid]) + bytes(bits[1:]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, table: tuple) -> bytes:
    body = bytes([tid]) + bytes(table[ZIGZAG[k]] for k in range(64))
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    color: bool = False,
    subsample: bool = False,
    quant: tuple = FLAT_Q8,
    chroma_quant: tuple | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Standards-correct baseline JPEG encoder (stdlib + numpy).

    ``pixels``: grayscale raster (``w*h`` bytes) when ``color=False``,
    RGB24 (``w*h*3``) when True.  ``subsample=True`` writes 4:2:0
    (luma 2x2, chroma 1x1 sampling factors; color only) — the dominant
    real-world baseline shape; otherwise 4:4:4.  Images are edge-
    padded to full MCUs; the frame header keeps the true dimensions so
    the decoder crops.  ``restart_interval`` > 0 emits DRI and RSTn
    markers every that-many MCUs with DC-predictor resets."""
    if color and len(pixels) != width * height * 3:
        raise ValueError(
            f"encode_jpeg: RGB raster is {len(pixels)} bytes, expected "
            f"{width * height * 3}"
        )
    if not color and len(pixels) != width * height:
        raise ValueError(
            f"encode_jpeg: gray raster is {len(pixels)} bytes, expected "
            f"{width * height}"
        )
    if subsample and not color:
        raise ValueError("encode_jpeg: 4:2:0 subsampling is color-only")
    qt_l = np.array(quant, dtype=np.float64).reshape(8, 8)
    qt_c = np.array(chroma_quant or quant, dtype=np.float64).reshape(8, 8)

    if color:
        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
        planes = np.empty((3, height, width), dtype=np.int64)
        for yy in range(height):
            for xx in range(width):
                planes[:, yy, xx] = rgb_to_ycbcr(*(int(v) for v in arr[yy, xx]))
    else:
        planes = (
            np.frombuffer(pixels, dtype=np.uint8)
            .reshape(1, height, width)
            .astype(np.int64)
        )

    # Component sampling factors (h, v) and quant-table ids.
    if color:
        lum = (2, 2) if subsample else (1, 1)
        comps = [(1, lum, 0), (2, (1, 1), 1), (3, (1, 1), 1)]
    else:
        comps = [(1, (1, 1), 0)]
    hmax = max(h for _, (h, _v), _ in comps)
    vmax = max(v for _, (_h, v), _ in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    # Per-component plane at its own resolution, edge-padded to whole
    # blocks.  Chroma downsample: box mean over the sampling window.
    comp_planes = []
    for ci, (_cid, (h, v), _tq) in enumerate(comps):
        sx, sy = hmax // h, vmax // v
        cw, ch = mcus_x * h * 8, mcus_y * v * 8
        plane = np.empty((ch, cw), dtype=np.float64)
        src = planes[ci]
        for yy in range(ch):
            for xx in range(cw):
                y0 = min(yy * sy, height - 1)
                x0 = min(xx * sx, width - 1)
                if sx == 1 and sy == 1:
                    plane[yy, xx] = src[y0, x0]
                else:
                    win = src[
                        y0 : min(y0 + sy, height), x0 : min(x0 + sx, width)
                    ]
                    plane[yy, xx] = float(win.mean())
        comp_planes.append(plane)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, tuple(int(q) for q in quant))
    if color:
        out += _dqt_segment(1, tuple(int(q) for q in (chroma_quant or quant)))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, (h, v), tq in comps:
        sof += bytes([cid, (h << 4) | v, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if color:
        out += _dht_segment(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht_segment(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, _hv, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])  # DC/AC table ids = tq here
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _build_huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _build_huffman_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _build_huffman_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _build_huffman_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    n_since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and n_since_restart == restart_interval
            ):
                writer.pad_align()
                writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                n_since_restart = 0
                preds = [0] * len(comps)
            for ci, (_cid, (h, v), tq) in enumerate(comps):
                qt = qt_l if tq == 0 else qt_c
                dc = dc_l if tq == 0 else dc_c
                ac = ac_l if tq == 0 else ac_c
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        block = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, qt, preds[ci], dc, ac
                        )
            n_since_restart += 1
    writer.pad_align()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    0xFF00; any other 0xFF-marker mid-read is surfaced loudly except
    RSTn, which :func:`restart` consumes at interval boundaries."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG: entropy data ran out")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG: dangling 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy "
                        "data (truncated scan?)"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Byte-align and consume the next RSTn marker, verifying the
        modulo-8 sequence number."""
        self._n = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG: expected RST marker")
        if self.data[self.pos] != 0xFF:
            raise ValueError(
                f"expected RST marker, found 0x{self.data[self.pos]:02X}"
            )
        marker = self.data[self.pos + 1]
        if not 0xD0 <= marker <= 0xD7:
            raise ValueError(
                f"expected RST marker, found 0xFF{marker:02X}"
            )
        if marker - 0xD0 != expected % 8:
            raise ValueError(
                f"RST sequence error: got RST{marker - 0xD0}, expected "
                f"RST{expected % 8}"
            )
        self.pos += 2


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(bits: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` raw magnitude bits to a signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


_SOF_UNSUPPORTED = {
    0xC1: "extended sequential (SOF1)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline (SOF0) JPEG to ``(width, height, rgb24)``.

    Scope: 8-bit baseline Huffman, 1 or 3 components, any sampling
    factors in 1..2 (4:4:4, 4:2:0, 4:2:2, 4:4:0), restart intervals.
    Everything else raises ``ValueError`` naming the feature — never a
    silent wrong-pixels decode.  Structurally malformed segments
    (short bodies hitting struct/index errors) also surface as
    ValueError, keeping the loud contract AND the PIL fall-through in
    ``decode_image`` reachable (review r14)."""
    try:
        return _decode_jpeg_checked(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG segment: {exc}") from exc


def _decode_jpeg_checked(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    hufftabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG: marker cut off")
        if payload[pos] != 0xFF:
            raise ValueError(
                f"JPEG marker sync lost at byte {pos} "
                f"(0x{payload[pos]:02X})"
            )
        marker = payload[pos + 1]
        if marker == 0x00:
            # a 1-padded final entropy byte can reach 0xFF and get
            # byte-stuffed: a stray FF00 between scans is not a marker
            pos += 2
            continue
        if marker == 0xFF:
            pos += 1  # fill byte before a marker (T.81 B.1.1.2)
            continue
        if marker in _SOF_UNSUPPORTED:
            raise ValueError(
                f"unsupported JPEG coding process: {_SOF_UNSUPPORTED[marker]}"
                " — baseline SOF0 only"
            )
        if marker == 0xCC:
            raise ValueError(
                "arithmetic coding conditioning (DAC) present — "
                "baseline Huffman only"
            )
        if marker == 0xD9:  # EOI is standalone (no length segment)
            if frame is not None and frame.get("nscans", 0) > 0:
                # progressive: all scans accumulated — reconstruct
                return _progressive_reconstruct(frame, qtables)
            raise ValueError("JPEG EOI before any scan data")
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG: marker segment cut off")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG: segment body cut off")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                raw = body[p : p + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT segment")
                if prec:
                    vals = list(
                        struct.unpack(f">{64}H", raw)
                    )
                else:
                    vals = list(raw)
                tab = [0] * 64
                for k in range(64):
                    tab[ZIGZAG[k]] = vals[k]
                qtables[tid] = tab
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tclass, tid = body[p] >> 4, body[p] & 0x0F
                bits = body[p + 1 : p + 17]
                nvals = sum(bits)
                vals = body[p + 17 : p + 17 + nvals]
                if len(vals) < nvals:
                    raise ValueError("truncated DHT segment")
                table: dict[tuple[int, int], int] = {}
                code, i = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(code, length)] = vals[i]
                        code += 1
                        i += 1
                    code <<= 1
                hufftabs[(tclass, tid)] = table
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                raise ValueError("multiple SOF frame headers")
            precision = body[0]
            if precision != 8:
                raise ValueError(
                    f"{precision}-bit JPEG unsupported (8-bit only)"
                )
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(
                    f"{ncomp}-component JPEG unsupported (grayscale or "
                    "YCbCr only; CMYK out of scope)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise ValueError(
                        f"sampling factors {h}x{v} unsupported (1..2)"
                    )
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            frame = {
                "width": width,
                "height": height,
                "comps": comps,
                "progressive": marker == 0xC2,
                "nscans": 0,
            }
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF frame header")
            ns = body[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scan_comps = []
            for s in range(ns):
                cid, tt = body[1 + 2 * s : 3 + 2 * s]
                if cid not in by_id:
                    raise ValueError(f"SOS names unknown component {cid}")
                by_id[cid]["td"] = tt >> 4
                by_id[cid]["ta"] = tt & 0x0F
                scan_comps.append(by_id[cid])
            ss, se, ah_al = body[1 + 2 * ns : 4 + 2 * ns]
            if frame["progressive"]:
                pos = _decode_progressive_scan(
                    payload, pos + 2 + seglen, frame, scan_comps,
                    hufftabs, ss, se, ah_al >> 4, ah_al & 0x0F,
                    restart_interval,
                )
                frame["nscans"] += 1
                continue
            if ns != len(frame["comps"]):
                raise ValueError(
                    "non-interleaved / multi-scan JPEG unsupported "
                    "(baseline interleaved single scan only)"
                )
            if (ss, se, ah_al) != (0, 63, 0):
                raise ValueError(
                    "spectral selection / successive approximation "
                    f"({ss},{se},{ah_al:02X}) — progressive parameters "
                    "in a baseline scan"
                )
            pos = pos + 2 + seglen
            return _decode_scan(
                payload, pos, frame, qtables, hufftabs, restart_interval
            )
        # APPn / COM / anything benign: skip.
        pos = pos + 2 + seglen
    raise ValueError("unreachable")


def _decode_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    qtables: dict,
    hufftabs: dict,
    restart_interval: int,
) -> tuple[int, int, bytes]:
    width, height, comps = frame["width"], frame["height"], frame["comps"]
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # MCU is one 8x8 data unit in raster order and the frame
        # header's sampling factors do not shape the scan.  Without
        # this, a grayscale stream declaring h=v=2 (legal, some
        # encoders emit it) would be walked as 16x16 MCUs — wrong
        # block count and order (review r14).
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"missing quantization table {c['tq']}")
        if (0, c["td"]) not in hufftabs:
            raise ValueError(f"missing DC Huffman table {c['td']}")
        if (1, c["ta"]) not in hufftabs:
            raise ValueError(f"missing AC Huffman table {c['ta']}")
        c["plane"] = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        c["qt"] = np.array(qtables[c["tq"]], dtype=np.float64).reshape(8, 8)
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    rst = 0
    n_since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_since_restart == restart_interval:
                reader.restart(rst)
                rst += 1
                n_since_restart = 0
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = hufftabs[(0, c["td"])]
                ac_tab = hufftabs[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = [0] * 64
                        size = _huff_decode(reader, dc_tab)
                        if size > 11:
                            raise ValueError(
                                f"DC magnitude category {size} out of "
                                "range (baseline max 11)"
                            )
                        diff = _extend(reader.read_bits(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_tab)
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run == 0:  # EOB
                                    break
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                raise ValueError(
                                    f"invalid AC run/size symbol "
                                    f"0x{sym:02X}"
                                )
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index overran the "
                                    "block (corrupt entropy data)"
                                )
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coefs = np.zeros((8, 8), dtype=np.float64)
                        for k in range(64):
                            coefs.flat[ZIGZAG[k]] = zz[k]
                        coefs *= c["qt"]
                        block = _DCT_M.T @ coefs @ _DCT_M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
            n_since_restart += 1
    return _planes_to_rgb(comps, width, height, hmax, vmax)


def _planes_to_rgb(
    comps: list, width: int, height: int, hmax: int, vmax: int
) -> tuple[int, int, bytes]:
    """Shared reconstruction tail (baseline + progressive): sample the
    per-component planes with floor(+0.5) + clamp, upsample by
    replication, crop to frame size, and convert to RGB24."""
    full = []
    for c in comps:
        samp = np.clip(np.floor(c["plane"] + 0.5), 0.0, 255.0).astype(
            np.int64
        )
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            samp = np.repeat(np.repeat(samp, sy, axis=0), sx, axis=1)
        full.append(samp[:height, :width])
    # Vectorized plane→RGB24 (review r14: per-pixel Python calls were
    # the hot path on real-sized images).  The numpy elementwise
    # expressions are the SAME IEEE-double ops as ycbcr_to_rgb — same
    # constants, same association, floor(+0.5), clamp — so the bytes
    # are bit-identical to the scalar form (pinned by a test).
    if len(comps) == 1:
        rgb = np.repeat(full[0].astype(np.uint8)[:, :, None], 3, axis=2)
    else:
        yp = full[0].astype(np.float64)
        cb = full[1].astype(np.float64) - 128.0
        cr = full[2].astype(np.float64) - 128.0
        rgb = np.stack(
            [
                np.floor(yp + 1.402 * cr + 0.5),
                np.floor(yp - 0.344136 * cb - 0.714136 * cr + 0.5),
                np.floor(yp + 1.772 * cb + 0.5),
            ],
            axis=2,
        )
        rgb = np.clip(rgb, 0.0, 255.0).astype(np.uint8)
    return width, height, rgb.tobytes()


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G.2 (r15).  Coefficients
# accumulate across scans in per-component zigzag-order arrays; the
# dequant + IDCT + color conversion happens ONCE at EOI through the
# same reconstruction tail as baseline.
# ---------------------------------------------------------------------------


def _ensure_coef(frame: dict) -> None:
    """Allocate the coefficient accumulators on the first scan.  The
    arrays are MCU-padded (interleaved DC scans walk the padded grid);
    non-interleaved scans walk only the component's own ceil-dims
    sub-grid (``nbx``/``nby``) per T.81 A.2."""
    comps = frame["comps"]
    if "coef" in comps[0]:
        return
    if len(comps) == 1:
        comps[0]["h"] = comps[0]["v"] = 1  # A.2, as in the baseline path
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    width, height = frame["width"], frame["height"]
    frame["mcus_x"] = (width + 8 * hmax - 1) // (8 * hmax)
    frame["mcus_y"] = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bx_total"] = frame["mcus_x"] * c["h"]
        c["by_total"] = frame["mcus_y"] * c["v"]
        cw = (width * c["h"] + hmax - 1) // hmax
        chh = (height * c["v"] + vmax - 1) // vmax
        c["nbx"] = (cw + 7) // 8
        c["nby"] = (chh + 7) // 8
        c["coef"] = np.zeros((c["by_total"], c["bx_total"], 64), np.int64)


def _refine_ac_block(
    reader: _BitReader, ac_tab: dict, coef, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3, the libjpeg control flow): newly-nonzero coefficients
    arrive as size-1 symbols with a sign bit; every HISTORY-nonzero
    coefficient crossed — including the whole band during an EOB run —
    absorbs one correction bit."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        if reader.read_bit() and not (int(coef[k]) & p1):
            coef[k] += p1 if coef[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_decode(reader, ac_tab)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: r == 15 → skip 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise ValueError(
                        f"AC refinement magnitude size {s} invalid "
                        "(successive approximation refines 1 bit)"
                    )
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if coef[k]:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _first_ac_block(
    reader: _BitReader, ac_tab: dict, coef, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """AC first-pass band decode for one block (T.81 G.1.2.2): the
    baseline run/size alphabet plus EOBn run-length symbols."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_decode(reader, ac_tab)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r < 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError(
                "AC coefficient index overran the spectral band "
                "(corrupt progressive entropy data)"
            )
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _decode_progressive_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    scan_comps: list,
    hufftabs: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode one progressive scan into the coefficient accumulators;
    returns the byte position after the entropy-coded segment."""
    _ensure_coef(frame)
    if ss == 0:
        if se != 0:
            raise ValueError(
                f"progressive DC scan must have Se=0, got Se={se} "
                "(DC and AC never share a scan)"
            )
    else:
        if len(scan_comps) != 1:
            raise ValueError(
                "progressive AC scans are single-component (T.81 G.1); "
                f"got {len(scan_comps)} components for band "
                f"{ss}..{se}"
            )
        if not ss <= se <= 63:
            raise ValueError(f"spectral band {ss}..{se} out of range")
    if ah and ah != al + 1:
        raise ValueError(
            f"successive approximation must refine one bit (Ah={ah}, "
            f"Al={al})"
        )
    if al > 13:
        raise ValueError(f"point transform Al={al} out of range")
    for c in scan_comps:
        if ss == 0 and ah == 0 and (0, c["td"]) not in hufftabs:
            raise ValueError(f"missing DC Huffman table {c['td']}")
        if ss > 0 and (1, c["ta"]) not in hufftabs:
            raise ValueError(f"missing AC Huffman table {c['ta']}")
    reader = _BitReader(payload, pos)
    preds = [0] * len(scan_comps)
    eobrun = 0
    rst = 0
    n_since_restart = 0

    def maybe_restart() -> None:
        nonlocal preds, eobrun, rst, n_since_restart
        if restart_interval and n_since_restart == restart_interval:
            reader.restart(rst)
            rst += 1
            n_since_restart = 0
            preds = [0] * len(scan_comps)
            eobrun = 0

    if ss == 0 and len(scan_comps) > 1:
        # interleaved DC scan: MCU walk over the padded grid
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                maybe_restart()
                for ci, c in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = c["coef"][
                                my * c["v"] + by, mx * c["h"] + bx
                            ]
                            if ah == 0:
                                size = _huff_decode(
                                    reader, hufftabs[(0, c["td"])]
                                )
                                if size > 11:
                                    raise ValueError(
                                        f"DC magnitude category {size} "
                                        "out of range (max 11)"
                                    )
                                preds[ci] += _extend(
                                    reader.read_bits(size), size
                                )
                                coef[0] = preds[ci] << al
                            else:
                                coef[0] |= reader.read_bit() << al
                n_since_restart += 1
        return reader.pos
    # non-interleaved: one component, its own ceil-dims block grid
    c = scan_comps[0]
    for byi in range(c["nby"]):
        for bxi in range(c["nbx"]):
            maybe_restart()
            coef = c["coef"][byi, bxi]
            if ss == 0:
                if ah == 0:
                    size = _huff_decode(reader, hufftabs[(0, c["td"])])
                    if size > 11:
                        raise ValueError(
                            f"DC magnitude category {size} out of range "
                            "(max 11)"
                        )
                    preds[0] += _extend(reader.read_bits(size), size)
                    coef[0] = preds[0] << al
                else:
                    coef[0] |= reader.read_bit() << al
            elif ah == 0:
                eobrun = _first_ac_block(
                    reader, hufftabs[(1, c["ta"])], coef, ss, se, al,
                    eobrun,
                )
            else:
                eobrun = _refine_ac_block(
                    reader, hufftabs[(1, c["ta"])], coef, ss, se, al,
                    eobrun,
                )
            n_since_restart += 1
    return reader.pos


_ZZ_NATURAL = None  # built lazily: zigzag k → natural flat index


def _progressive_reconstruct(
    frame: dict, qtables: dict
) -> tuple[int, int, bytes]:
    """Dequant + IDCT every accumulated block, then the shared
    reconstruction tail."""
    global _ZZ_NATURAL
    if _ZZ_NATURAL is None:
        _ZZ_NATURAL = np.array([ZIGZAG[k] for k in range(64)])
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"missing quantization table {c['tq']}")
        qt = np.array(qtables[c["tq"]], dtype=np.float64).reshape(8, 8)
        plane = np.zeros((c["by_total"] * 8, c["bx_total"] * 8))
        for by in range(c["by_total"]):
            for bx in range(c["bx_total"]):
                coefs = np.zeros(64, dtype=np.float64)
                coefs[_ZZ_NATURAL] = c["coef"][by, bx]
                coefs = coefs.reshape(8, 8) * qt
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT_M.T @ coefs @ _DCT_M + 128.0
                )
        c["plane"] = plane
    return _planes_to_rgb(
        comps, frame["width"], frame["height"], hmax, vmax
    )
