"""Progressive JPEG (SOF2) decode (operators/jpeg.py, r15): streams
are built by an in-test progressive ENCODER written from T.81 Annex G
directly (spectral selection, successive approximation, EOBn run
lengths, refinement correction bits), and every decode must be
BIT-IDENTICAL to the baseline decode of the same coefficient arrays —
the two paths share only the reconstruction tail, so agreement pins
the whole multi-scan accumulation logic."""

from __future__ import annotations

import random
import struct

import pytest

from etl_pulumi_aws_snowflake_spark.operators import jpeg as J

# ---------------------------------------------------------------------
# shared stream-framing helpers (the decoder parses everything from the
# stream; nothing is shared out of band)
# ---------------------------------------------------------------------

# custom canonical tables: every symbol we emit at code length 8
_AC_SYMS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 5)}
    | {0x00, 0xF0, 0x10, 0x20, 0x30, 0x40}
)
_AC_BITS = tuple([0] * 8 + [len(_AC_SYMS)] + [0] * 8)
_DC_BITS, _DC_VALS = J._DC_LUM_BITS, J._DC_LUM_VALS

_DC_CODES = J._build_huffman_codes(_DC_BITS, _DC_VALS)
_AC_CODES = J._build_huffman_codes(_AC_BITS, tuple(_AC_SYMS))


def _sof(marker: int, w: int, h: int, comps) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, ch, cv in comps:
        body += bytes([cid, (ch << 4) | cv, 0])
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _sos(cids, ss, se, ah, al) -> bytes:
    body = bytes([len(cids)])
    for cid in cids:
        body += bytes([cid, 0x00])  # td=0, ta=0
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _headers(marker, w, h, comps) -> bytes:
    return (
        b"\xff\xd8"
        + J._dqt_segment(0, J.FLAT_Q8)
        + J._dht_segment(0, 0, _DC_BITS, _DC_VALS)
        + J._dht_segment(1, 0, _AC_BITS, tuple(_AC_SYMS))
        + _sof(marker, w, h, comps)
    )


def _t(v: int, al: int) -> int:
    """AC point transform: truncate toward zero (T.81 G.1.2.2)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


class _Geom:
    """Block-grid geometry mirroring the decoder's T.81 A.2 rules."""

    def __init__(self, w, h, comps):
        self.comps = [
            {"id": cid, "h": ch, "v": cv} for cid, ch, cv in comps
        ]
        if len(self.comps) == 1:
            self.comps[0]["h"] = self.comps[0]["v"] = 1
        self.hmax = max(c["h"] for c in self.comps)
        self.vmax = max(c["v"] for c in self.comps)
        self.mcus_x = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcus_y = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        for c in self.comps:
            c["bxt"] = self.mcus_x * c["h"]
            c["byt"] = self.mcus_y * c["v"]
            cw = (w * c["h"] + self.hmax - 1) // self.hmax
            chh = (h * c["v"] + self.vmax - 1) // self.vmax
            c["nbx"] = (cw + 7) // 8
            c["nby"] = (chh + 7) // 8


def _rand_coefs(geom, seed, dc_range=60, ac_range=14, density=0.2,
                zero_block_frac=0.3):
    rnd = random.Random(seed)
    out = []
    for c in geom.comps:
        blocks = {}
        for by in range(c["byt"]):
            for bx in range(c["bxt"]):
                zz = [0] * 64
                zz[0] = rnd.randint(-dc_range, dc_range)
                if rnd.random() >= zero_block_frac:
                    for k in range(1, 64):
                        if rnd.random() < density:
                            v = rnd.randint(1, ac_range)
                            zz[k] = v if rnd.random() < 0.5 else -v
                blocks[(by, bx)] = zz
        out.append(blocks)
    return out


# ---------------------------------------------------------------------
# baseline twin: the SAME coefficients as one interleaved SOF0 scan
# ---------------------------------------------------------------------

def _baseline_stream(w, h, comps, geom, coefs) -> bytes:
    out = bytearray(_headers(0xC0, w, h, comps))
    out += _sos([c[0] for c in comps], 0, 63, 0, 0)
    wr = J._BitWriter()
    preds = [0] * len(geom.comps)
    for my in range(geom.mcus_y):
        for mx in range(geom.mcus_x):
            for ci, c in enumerate(geom.comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = coefs[ci][(my * c["v"] + by, mx * c["h"] + bx)]
                        size, bits = J._magnitude(zz[0] - preds[ci])
                        preds[ci] = zz[0]
                        code, ln = _DC_CODES[size]
                        wr.write(code, ln)
                        if size:
                            wr.write(bits, size)
                        run = 0
                        last = max(
                            (k for k in range(1, 64) if zz[k]), default=0
                        )
                        for k in range(1, last + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                zc, zl = _AC_CODES[0xF0]
                                wr.write(zc, zl)
                                run -= 16
                            size, bits = J._magnitude(zz[k])
                            code, ln = _AC_CODES[(run << 4) | size]
                            wr.write(code, ln)
                            wr.write(bits, size)
                            run = 0
                        if last < 63:
                            code, ln = _AC_CODES[0x00]
                            wr.write(code, ln)
    wr.pad_align()
    out += wr.out + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# progressive scan emitters (T.81 Annex G, written independently)
# ---------------------------------------------------------------------

def _emit_dc_first(wr, geom, coefs, scan_cis, al):
    preds = [0] * len(scan_cis)
    for my in range(geom.mcus_y):
        for mx in range(geom.mcus_x):
            for pi, ci in enumerate(scan_cis):
                c = geom.comps[ci]
                reps = (
                    [(by, bx) for by in range(c["v"]) for bx in range(c["h"])]
                    if len(scan_cis) > 1 else [(0, 0)]
                )
                for by, bx in reps:
                    zz = coefs[ci][(my * c["v"] + by, mx * c["h"] + bx)]
                    v = zz[0] >> al  # DC: arithmetic shift
                    size, bits = J._magnitude(v - preds[pi])
                    preds[pi] = v
                    code, ln = _DC_CODES[size]
                    wr.write(code, ln)
                    if size:
                        wr.write(bits, size)


def _emit_dc_first_noninterleaved(wr, geom, coefs, ci, al):
    c = geom.comps[ci]
    pred = 0
    for by in range(c["nby"]):
        for bx in range(c["nbx"]):
            v = coefs[ci][(by, bx)][0] >> al
            size, bits = J._magnitude(v - pred)
            pred = v
            code, ln = _DC_CODES[size]
            wr.write(code, ln)
            if size:
                wr.write(bits, size)


def _emit_dc_refine(wr, geom, coefs, scan_cis, al):
    for my in range(geom.mcus_y):
        for mx in range(geom.mcus_x):
            for ci in scan_cis:
                c = geom.comps[ci]
                reps = (
                    [(by, bx) for by in range(c["v"]) for bx in range(c["h"])]
                    if len(scan_cis) > 1 else [(0, 0)]
                )
                for by, bx in reps:
                    zz = coefs[ci][(my * c["v"] + by, mx * c["h"] + bx)]
                    wr.write((zz[0] >> al) & 1, 1)


class _AcFirst:
    def __init__(self, wr, ss, se, al, max_eob_run=4):
        self.wr, self.ss, self.se, self.al = wr, ss, se, al
        self.eob_run = 0
        self.max_eob = max_eob_run

    def _flush(self):
        if not self.eob_run:
            return
        r = self.eob_run.bit_length() - 1
        code, ln = _AC_CODES[r << 4]
        self.wr.write(code, ln)
        if r:
            self.wr.write(self.eob_run - (1 << r), r)
        self.eob_run = 0

    def block(self, zz):
        band = [_t(zz[k], self.al) for k in range(self.ss, self.se + 1)]
        last = max((i for i, v in enumerate(band) if v), default=-1)
        if last < 0:
            self.eob_run += 1
            if self.eob_run == self.max_eob:
                self._flush()
            return
        self._flush()
        run = 0
        for i in range(last + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _AC_CODES[0xF0]
                self.wr.write(code, ln)
                run -= 16
            size, bits = J._magnitude(v)
            code, ln = _AC_CODES[(run << 4) | size]
            self.wr.write(code, ln)
            self.wr.write(bits, size)
            run = 0
        if last < self.se - self.ss:
            self.eob_run += 1
            if self.eob_run == self.max_eob:
                self._flush()

    def done(self):
        self._flush()


class _AcRefine:
    """The G.1.2.3 refinement emitter: newly-significant coefficients
    as size-1 symbols + sign; correction bits buffered and flushed
    after the symbol (or with the EOBn covering trailing blocks)."""

    def __init__(self, wr, ss, se, al, max_eob_run=4):
        self.wr, self.ss, self.se, self.al = wr, ss, se, al
        self.eob_run = 0
        self.be: list[int] = []
        self.max_eob = max_eob_run

    def _flush(self):
        if not self.eob_run:
            return
        r = self.eob_run.bit_length() - 1
        code, ln = _AC_CODES[r << 4]
        self.wr.write(code, ln)
        if r:
            self.wr.write(self.eob_run - (1 << r), r)
        for b in self.be:
            self.wr.write(b, 1)
        self.eob_run = 0
        self.be = []

    def block(self, zz):
        now = [_t(zz[k], self.al) for k in range(self.ss, self.se + 1)]
        absv = [abs(v) for v in now]
        eob = -1
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        run = 0
        br: list[int] = []
        for i, v in enumerate(now):
            a = absv[i]
            if a == 0:
                run += 1
                continue
            # ZRLs are emitted EAGERLY (the decoder reads correction
            # bits interleaved in crossing order, so each ZRL may only
            # carry the corrections inside its own 16-zero window) —
            # but never beyond the last new significant: those zeros
            # fold into the EOB run
            while run > 15 and i <= eob:
                self._flush()
                code, ln = _AC_CODES[0xF0]
                self.wr.write(code, ln)
                run -= 16
                for b in br:
                    self.wr.write(b, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            # newly significant
            self._flush()
            code, ln = _AC_CODES[(run << 4) | 1]
            self.wr.write(code, ln)
            self.wr.write(1 if v > 0 else 0, 1)
            for b in br:
                self.wr.write(b, 1)
            br = []
            run = 0
        if run > 0 or br or eob < 0:
            self.eob_run += 1
            self.be += br
            if self.eob_run == self.max_eob:
                self._flush()

    def done(self):
        self._flush()


def _emit_ac_scan(wr, geom, coefs, ci, ss, se, ah, al):
    c = geom.comps[ci]
    enc = (
        _AcRefine(wr, ss, se, al) if ah else _AcFirst(wr, ss, se, al)
    )
    for by in range(c["nby"]):
        for bx in range(c["nbx"]):
            enc.block(coefs[ci][(by, bx)])
    enc.done()


def _progressive_stream(w, h, comps, geom, coefs, scans) -> bytes:
    """scans: list of ("dc"/"dcr", [ci...], ah, al) or
    ("ac"/"acr", ci, ss, se, ah, al)."""
    out = bytearray(_headers(0xC2, w, h, comps))
    for scan in scans:
        wr = J._BitWriter()
        if scan[0] in ("dc", "dcr"):
            _, cis, ah, al = scan
            out += _sos([comps[ci][0] for ci in cis], 0, 0, ah, al)
            if scan[0] == "dc":
                if len(cis) > 1:
                    _emit_dc_first(wr, geom, coefs, cis, al)
                else:
                    _emit_dc_first_noninterleaved(wr, geom, coefs, cis[0], al)
            else:
                _emit_dc_refine(wr, geom, coefs, cis, al)
        else:
            _, ci, ss, se, ah, al = scan
            out += _sos([comps[ci][0]], ss, se, ah, al)
            _emit_ac_scan(wr, geom, coefs, ci, ss, se, ah, al)
        wr.pad_align()
        out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------

_FULL_SCANS_GRAY = [
    ("dc", [0], 0, 1),
    ("ac", 0, 1, 5, 0, 1),
    ("ac", 0, 6, 63, 0, 1),
    ("dcr", [0], 1, 0),
    ("acr", 0, 1, 5, 1, 0),
    ("acr", 0, 6, 63, 1, 0),
]


def _scans_color(ncomp=3):
    scans = [("dc", list(range(ncomp)), 0, 1)]
    for ci in range(ncomp):
        scans += [("ac", ci, 1, 5, 0, 1), ("ac", ci, 6, 63, 0, 1)]
    scans.append(("dcr", list(range(ncomp)), 1, 0))
    for ci in range(ncomp):
        scans += [("acr", ci, 1, 5, 1, 0), ("acr", ci, 6, 63, 1, 0)]
    return scans


def _compare(w, h, comps, seed, scans=None, **kw):
    geom = _Geom(w, h, comps)
    coefs = _rand_coefs(geom, seed, **kw)
    base = J.decode_jpeg(_baseline_stream(w, h, comps, geom, coefs))
    scans = scans or (
        _FULL_SCANS_GRAY if len(comps) == 1 else _scans_color(len(comps))
    )
    prog = J.decode_jpeg(_progressive_stream(w, h, comps, geom, coefs, scans))
    assert base[0] == prog[0] and base[1] == prog[1]
    assert base[2] == prog[2], "progressive decode != baseline twin"


def test_single_block_grayscale_all_scan_types():
    _compare(8, 8, [(1, 1, 1)], seed=1)


def test_multiblock_grayscale_with_eob_runs():
    _compare(24, 16, [(1, 1, 1)], seed=2, zero_block_frac=0.6)


def test_dense_grayscale_no_eob_runs():
    _compare(16, 16, [(1, 1, 1)], seed=3, density=0.9, zero_block_frac=0.0)


def test_color_444():
    _compare(16, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)], seed=4)


def test_color_420_with_pad_column():
    # w=24 under 4:2:0: luma ceil-grid is 3 blocks wide but the padded
    # MCU grid is 4 — interleaved DC walks the pad, AC scans must not
    _compare(
        24, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], seed=5,
    )


def test_odd_dimensions_crop():
    _compare(13, 11, [(1, 1, 1)], seed=6)
    _compare(19, 13, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], seed=7)


def test_dc_only_progressive_decodes():
    comps = [(1, 1, 1)]
    geom = _Geom(16, 16, comps)
    coefs = _rand_coefs(geom, 8, density=0.0, zero_block_frac=1.0)
    base = J.decode_jpeg(_baseline_stream(16, 16, comps, geom, coefs))
    prog = J.decode_jpeg(_progressive_stream(
        16, 16, comps, geom, coefs,
        [("dc", [0], 0, 1), ("dcr", [0], 1, 0)],
    ))
    assert base[2] == prog[2]


@pytest.mark.parametrize("seed", range(9, 29))
def test_fuzz_gray_and_color(seed):
    if seed % 2:
        _compare(
            (seed % 3 + 1) * 8 + seed % 5, 8 + seed % 7,
            [(1, 1, 1)], seed=seed,
            density=0.1 + (seed % 4) * 0.2,
            zero_block_frac=(seed % 3) * 0.3,
        )
    else:
        _compare(
            16 + seed % 9, 16 + seed % 5,
            [(1, 2, 2), (2, 1, 1), (3, 1, 1)], seed=seed,
            density=0.1 + (seed % 4) * 0.2,
            zero_block_frac=(seed % 3) * 0.3,
        )


def test_deep_successive_approximation_three_levels():
    comps = [(1, 1, 1)]
    geom = _Geom(16, 8, comps)
    coefs = _rand_coefs(geom, 30, density=0.5, zero_block_frac=0.0)
    scans = [
        ("dc", [0], 0, 2),
        ("ac", 0, 1, 63, 0, 2),
        ("dcr", [0], 2, 1),
        ("acr", 0, 1, 63, 2, 1),
        ("dcr", [0], 1, 0),
        ("acr", 0, 1, 63, 1, 0),
    ]
    base = J.decode_jpeg(_baseline_stream(16, 8, comps, geom, coefs))
    prog = J.decode_jpeg(_progressive_stream(16, 8, comps, geom, coefs, scans))
    assert base[2] == prog[2]


def test_loud_errors_on_malformed_scan_parameters():
    comps = [(1, 1, 1)]
    geom = _Geom(8, 8, comps)
    coefs = _rand_coefs(geom, 40)
    head = _headers(0xC2, 8, 8, comps)

    with pytest.raises(ValueError, match="Se=0"):
        J.decode_jpeg(head + _sos([1], 0, 5, 0, 0) + b"\xff\xd9")
    with pytest.raises(ValueError, match="single-component"):
        J.decode_jpeg(
            _headers(0xC2, 8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)])
            + _sos([1, 2], 1, 5, 0, 0) + b"\xff\xd9"
        )
    with pytest.raises(ValueError, match="out of range"):
        J.decode_jpeg(head + _sos([1], 5, 70, 0, 0) + b"\xff\xd9")
    with pytest.raises(ValueError, match="refine one bit"):
        J.decode_jpeg(head + _sos([1], 1, 5, 3, 0) + b"\xff\xd9")
    # EOI before any scan still raises
    with pytest.raises(ValueError, match="before any scan"):
        J.decode_jpeg(head + b"\xff\xd9")


def test_refinement_size_must_be_one():
    comps = [(1, 1, 1)]
    head = _headers(0xC2, 8, 8, comps)
    # a refinement scan whose first symbol claims size 2
    wr = J._BitWriter()
    code, ln = _AC_CODES[0x02]
    wr.write(code, ln)
    wr.pad_align()
    raw = (
        head + _sos([1], 0, 0, 0, 1)  # minimal DC scan first
    )
    wr_dc = J._BitWriter()
    c, ln2 = _DC_CODES[0]
    wr_dc.write(c, ln2)
    wr_dc.pad_align()
    raw += wr_dc.out
    raw += _sos([1], 1, 5, 1, 0) + wr.out + b"\xff\xd9"
    with pytest.raises(ValueError, match="refines 1 bit"):
        J.decode_jpeg(raw)


def test_stuffed_padding_byte_between_scans():
    """pad_align can complete a scan's final byte to 0xFF, which gets
    byte-stuffed — the inter-scan FF00 (and fill bytes) must not break
    marker sync.  Seed 1's stream contains exactly this shape."""
    comps = [(1, 1, 1)]
    geom = _Geom(16, 8, comps)
    coefs = _rand_coefs(geom, 1)
    prog = _progressive_stream(16, 8, comps, geom, coefs, _FULL_SCANS_GRAY)
    assert b"\xff\x00\xff" in prog  # the stuffed-pad shape is present
    base = J.decode_jpeg(_baseline_stream(16, 8, comps, geom, coefs))
    assert J.decode_jpeg(prog)[2] == base[2]
    # explicit fill byte before EOI is also legal (T.81 B.1.1.2)
    assert J.decode_jpeg(prog[:-2] + b"\xff\xff\xd9")[2] == base[2]


def test_restart_markers_in_progressive_dc_scan():
    """DRI applies to progressive scans too: predictors reset at each
    RSTn and the decoder verifies the modulo-8 sequence."""
    comps = [(1, 1, 1)]
    geom = _Geom(32, 8, comps)  # 4 blocks
    coefs = _rand_coefs(geom, 50)
    out = bytearray(_headers(0xC2, 32, 8, comps))
    out += b"\xff\xdd" + struct.pack(">HH", 4, 2)  # DRI = 2
    out += _sos([1], 0, 0, 0, 0)
    wr = J._BitWriter()
    pred, rst, n = 0, 0, 0
    for bx in range(4):
        if n == 2:
            wr.pad_align()
            wr.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            n = 0
            pred = 0
        v = coefs[0][(0, bx)][0]
        size, bits = J._magnitude(v - pred)
        pred = v
        code, ln = _DC_CODES[size]
        wr.write(code, ln)
        if size:
            wr.write(bits, size)
        n += 1
    wr.pad_align()
    out += wr.out + b"\xff\xd9"
    # baseline twin: DC only, no restarts, same coefficients
    dc_only = {
        (by, bx): [zz[0]] + [0] * 63
        for (by, bx), zz in coefs[0].items()
    }
    base = J.decode_jpeg(_baseline_stream(32, 8, comps, geom, [dc_only]))
    assert J.decode_jpeg(bytes(out))[2] == base[2]
    # a wrong RSTn sequence number stays loud
    bad = bytes(out).replace(b"\xff\xd0", b"\xff\xd3", 1)
    with pytest.raises(ValueError, match="RST sequence"):
        J.decode_jpeg(bad)


def test_restart_markers_in_progressive_ac_scan():
    """DRI in an AC band scan: the EOB run may never cross a restart
    boundary — the encoder flushes it and the decoder resets it."""
    comps = [(1, 1, 1)]
    geom = _Geom(32, 8, comps)  # 4 blocks
    coefs = _rand_coefs(geom, 60, density=0.0, zero_block_frac=1.0)
    # block 0 gets AC content; blocks 1-3 are zero (EOB-run bait)
    coefs[0][(0, 0)][2] = 5
    coefs[0][(0, 0)][4] = -3
    out = bytearray(_headers(0xC2, 32, 8, comps))
    # DC first scan for all blocks (no DRI yet)
    out += _sos([1], 0, 0, 0, 0)
    wr = J._BitWriter()
    _emit_dc_first_noninterleaved(wr, geom, coefs, 0, 0)
    wr.pad_align()
    out += wr.out
    # AC scan with DRI=2: restart between blocks 2 and 3
    out += b"\xff\xdd" + struct.pack(">HH", 4, 2)
    out += _sos([1], 1, 63, 0, 0)
    wr = J._BitWriter()
    enc = _AcFirst(wr, 1, 63, 0, max_eob_run=8)
    for i, bx in enumerate(range(4)):
        if i == 2:  # restart boundary: flush, align, RST0
            enc.done()
            wr.pad_align()
            wr.out += b"\xff\xd0"
            enc = _AcFirst(wr, 1, 63, 0, max_eob_run=8)
        enc.block(coefs[0][(0, bx)])
    enc.done()
    wr.pad_align()
    out += wr.out + b"\xff\xd9"
    base = J.decode_jpeg(_baseline_stream(32, 8, comps, geom, coefs))
    assert J.decode_jpeg(bytes(out))[2] == base[2]
