"""IMA ADPCM (WAV format 0x11, operators/audio.py::decode_adpcm):
verified against an INDEPENDENT in-test reference decoder written from
the IMA 1992 recommended practice directly, plus round-trips through
the paired encoder and every loud-error contract."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pulumi_aws_snowflake_spark.operators import audio as A

STEPS = A._IMA_STEPS  # the public table; the transition is re-derived


def _ref_transition(pred: int, index: int, nib: int):
    """Reference state transition, written from the spec text (not the
    operator): reconstructed diff is step/8 plus step/(4,2,1) per
    magnitude bit; sign bit subtracts; clamp sample and index."""
    step = STEPS[index]
    diff = step >> 3
    for bit, shift in ((1, 2), (2, 1), (4, 0)):
        if nib & bit:
            diff += step >> shift
    pred = pred + (-diff if nib & 8 else diff)
    pred = min(32767, max(-32768, pred))
    index = min(88, max(0, index + (-1, -1, -1, -1, 2, 4, 6, 8)[nib & 7]))
    return pred, index


def _ref_decode_block(raw: bytes, ch: int, ba: int):
    """Reference block decode: per-channel 4-byte headers, then
    channel-major 4-byte nibble words, low nibble first."""
    preds, idxs = [], []
    for c in range(ch):
        p, ix, _ = struct.unpack_from("<hBB", raw, 4 * c)
        preds.append(p)
        idxs.append(ix)
    out = [[p] for p in preds]
    pos = 4 * ch
    while pos < ba:
        for c in range(ch):
            for byte in raw[pos + 4 * c : pos + 4 * c + 4]:
                for nib in (byte & 15, byte >> 4):
                    preds[c], idxs[c] = _ref_transition(
                        preds[c], idxs[c], nib
                    )
                    out[c].append(preds[c])
        pos += 4 * ch
    return out


def test_transition_hand_vector():
    # pred 0, index 0 (step 7), nibble 3: diff = 0 + 1 + 3 = 4
    assert A._ima_step(0, 0, 3) == (4, 0)
    # nibble 0xF: diff = 0+1+3+7 = 11, sign → -11, index +8
    assert A._ima_step(0, 0, 0xF) == (-11, 8)
    # clamps: huge predictor, max index
    assert A._ima_step(32760, 88, 7)[0] == 32767
    assert A._ima_step(0, 88, 7)[1] == 88
    assert A._ima_step(0, 0, 0)[1] == 0


@given(st.integers(-32768, 32767), st.integers(0, 88), st.integers(0, 15))
@settings(max_examples=300, deadline=None)
def test_transition_matches_reference(pred, index, nib):
    assert A._ima_step(pred, index, nib) == _ref_transition(pred, index, nib)


def _frames(n, ch, seed=7):
    import random

    rnd = random.Random(seed)
    return [
        tuple(rnd.randint(-32768, 32767) for _ in range(ch))
        for _ in range(n)
    ]


@pytest.mark.parametrize("ch", [1, 2, 3])
def test_decode_matches_reference_blockwise(ch):
    frames = _frames(40, ch)
    raw = A.encode_adpcm(frames, samples_per_block=17)
    d = A.decode_adpcm(raw)
    assert (d["channels"], d["n_frames"]) == (ch, 40)
    # reference decode over the data chunk directly
    at = raw.index(b"data") + 8
    size = struct.unpack_from("<I", raw, at - 4)[0]
    data = raw[at : at + size]
    ba = 4 * ch + 16 * ch // 2
    ref: list[tuple[int, ...]] = []
    for b0 in range(0, size, ba):
        blk = _ref_decode_block(data[b0 : b0 + ba], ch, ba)
        ref += [tuple(blk[c][j] for c in range(ch)) for j in range(17)]
    assert d["linear"] == ref[:40]


def test_roundtrip_error_bounded_and_header_sample_exact():
    frames = _frames(33, 1)
    d = A.decode_adpcm(A.encode_adpcm(frames, samples_per_block=9))
    assert d["n_frames"] == 33
    # every block's header carries sample 0 verbatim
    for b in range(0, 33, 9):
        assert d["linear"][b][0] == frames[b][0]
    # ADPCM is lossy but bounded: reconstruction error < 2*step at the
    # widest step the walk can reach
    for got, want in zip(d["linear"], frames):
        assert abs(got[0] - want[0]) <= 2 * STEPS[-1] // 8 + STEPS[-1]


def test_fact_chunk_trims_final_block_padding():
    frames = _frames(12, 1)  # 9 + 3 → second block padded to 9
    d = A.decode_adpcm(A.encode_adpcm(frames, samples_per_block=9))
    assert d["n_frames"] == 12
    assert len(d["linear"]) == 12
    assert len(d["pcm"]) == 12 * 2


def test_duration_and_pcm_are_consistent():
    frames = _frames(9, 2)
    d = A.decode_adpcm(A.encode_adpcm(frames, samples_per_block=9))
    assert d["duration_us"] == 9 * 1_000_000 // 8000
    vals = struct.unpack(f"<{9 * 2}h", d["pcm"])
    assert [tuple(vals[i : i + 2]) for i in range(0, 18, 2)] == d["linear"]


def _patch(raw: bytes, at: int, new: bytes) -> bytes:
    b = bytearray(raw)
    b[at : at + len(new)] = new
    return bytes(b)


def test_loud_errors():
    raw = A.encode_adpcm(_frames(9, 1), samples_per_block=9)
    fmt_at = raw.index(b"fmt ") + 8

    with pytest.raises(ValueError, match="expects IMA ADPCM"):
        A.decode_adpcm(_patch(raw, fmt_at, struct.pack("<H", 1)))
    with pytest.raises(ValueError, match="4-bit"):
        A.decode_adpcm(_patch(raw, fmt_at + 14, struct.pack("<H", 8)))
    with pytest.raises(ValueError, match="wSamplesPerBlock"):
        A.decode_adpcm(_patch(raw, fmt_at + 18, struct.pack("<H", 99)))
    # block header step index out of range
    data_at = raw.index(b"data") + 8
    with pytest.raises(ValueError, match="step index"):
        A.decode_adpcm(_patch(raw, data_at + 2, bytes([200])))
    # torn block: shrink the data chunk size by one byte
    with pytest.raises(ValueError, match="whole number of"):
        A.decode_adpcm(_patch(
            raw, data_at - 4,
            struct.pack("<I", struct.unpack_from("<I", raw, data_at - 4)[0] - 1),
        ))
    # fact chunk lying beyond capacity
    fact_at = raw.index(b"fact") + 8
    with pytest.raises(ValueError, match="fact chunk claims"):
        A.decode_adpcm(_patch(raw, fact_at, struct.pack("<I", 10)))


def test_encoder_guards():
    with pytest.raises(ValueError, match="empty"):
        A.encode_adpcm([])
    with pytest.raises(ValueError, match="ragged"):
        A.encode_adpcm([(1, 2), (3,)])
    with pytest.raises(ValueError, match="multiple of 8"):
        A.encode_adpcm([(0,)], samples_per_block=10)


def test_strict_pcm_tier_still_names_adpcm():
    raw = A.encode_adpcm(_frames(9, 1), samples_per_block=9)
    with pytest.raises(ValueError, match="IMA ADPCM"):
        A.decode_wav(raw)


@given(
    n=st.integers(1, 60), ch=st.integers(1, 2), seed=st.integers(0, 999),
    spb=st.sampled_from([9, 17, 33]),
)
@settings(max_examples=60, deadline=None)
def test_fuzz_roundtrip_decodes_exactly_n_frames(n, ch, seed, spb):
    frames = _frames(n, ch, seed)
    d = A.decode_adpcm(A.encode_adpcm(frames, samples_per_block=spb))
    assert d["n_frames"] == n
    assert len(d["linear"]) == n
    assert all(len(f) == ch for f in d["linear"])


# --------------------------------------------------------------------
# MS ADPCM (format 0x02)
# --------------------------------------------------------------------

def _ref_ms_decode_block(raw, ch, ba, coef_table):
    """Independent reference, written from the ADPCMWAVEFORMAT doc:
    interleaved headers, high-nibble-first data, adaptive delta."""
    adapt = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)
    cfs = [coef_table[raw[c]] for c in range(ch)]
    idl = [struct.unpack_from("<h", raw, ch + 2 * c)[0] for c in range(ch)]
    s1 = [struct.unpack_from("<h", raw, 3 * ch + 2 * c)[0] for c in range(ch)]
    s2 = [struct.unpack_from("<h", raw, 5 * ch + 2 * c)[0] for c in range(ch)]
    out = [[s2[c], s1[c]] for c in range(ch)]
    nibs = []
    for byte in raw[7 * ch : ba]:
        nibs += [byte >> 4, byte & 15]
    for j, nib in enumerate(nibs):
        c = j % ch
        signed = nib - 16 if nib >= 8 else nib
        # spec pseudo-code divides with C semantics (trunc toward 0);
        # float division is exact here (|sum| < 2**25 ≪ 2**53)
        pred = int((s1[c] * cfs[c][0] + s2[c] * cfs[c][1]) / 256)
        pred = max(-32768, min(32767, pred + signed * idl[c]))
        idl[c] = max(16, (adapt[nib] * idl[c]) >> 8)
        s2[c], s1[c] = s1[c], pred
        out[c].append(pred)
    return out


@pytest.mark.parametrize("ch", [1, 2])
def test_ms_decode_matches_reference(ch):
    frames = _frames(25, ch, seed=11)
    raw = A.encode_ms_adpcm(frames, samples_per_block=10)
    d = A.decode_ms_adpcm(raw)
    assert (d["channels"], d["n_frames"]) == (ch, 25)
    at = raw.index(b"data") + 8
    size = struct.unpack_from("<I", raw, at - 4)[0]
    data = raw[at : at + size]
    ba = 7 * ch + 8 * ch // 2
    ref = []
    for b0 in range(0, size, ba):
        blk = _ref_ms_decode_block(
            data[b0 : b0 + ba], ch, ba, A.MS_ADPCM_COEFS
        )
        ref += [tuple(blk[c][j] for c in range(ch)) for j in range(10)]
    assert d["linear"] == ref[:25]


def test_ms_trunc_division_interop_vector():
    """A negative predictor sum not divisible by 256 distinguishes the
    spec's C truncating division (what ffmpeg/libsndfile implement)
    from a floored ``>> 8``: with coefficient pair (240, 0), s1 = -1,
    and zero correction nibbles the third sample is trunc(-240/256)
    = 0; a floored shift yields -1 there (and -1 for every later
    sample).  Hand-patched block header, so the in-repo encoder cannot
    compensate for the decoder."""
    raw = bytearray(A.encode_ms_adpcm([(0,)] * 4, samples_per_block=4))
    at = raw.index(b"data") + 8
    raw[at : at + 8] = bytes([4]) + struct.pack("<hhh", 16, -1, 0) + b"\x00"
    d = A.decode_ms_adpcm(bytes(raw))
    assert d["linear"] == [(0,), (-1,), (0,), (0,)]


def test_ms_header_samples_exact_and_fact_trim():
    frames = _frames(14, 1, seed=12)  # 10 + 4 → padded second block
    d = A.decode_ms_adpcm(A.encode_ms_adpcm(frames, samples_per_block=10))
    assert d["n_frames"] == 14
    # each block's header carries its first two samples verbatim
    assert d["linear"][0][0] == frames[0][0]
    assert d["linear"][1][0] == frames[1][0]
    assert d["linear"][10][0] == frames[10][0]
    assert d["linear"][11][0] == frames[11][0]


@pytest.mark.parametrize("pi", range(7))
def test_ms_every_standard_predictor_roundtrips(pi):
    frames = _frames(10, 1, seed=13 + pi)
    d = A.decode_ms_adpcm(
        A.encode_ms_adpcm(frames, samples_per_block=10, predictor=pi)
    )
    assert d["n_frames"] == 10
    assert d["linear"][0][0] == frames[0][0]


def test_ms_loud_errors():
    raw = A.encode_ms_adpcm(_frames(10, 1, seed=20), samples_per_block=10)
    fmt_at = raw.index(b"fmt ") + 8
    with pytest.raises(ValueError, match="expects MS ADPCM"):
        A.decode_ms_adpcm(_patch(raw, fmt_at, struct.pack("<H", 0x11)))
    with pytest.raises(ValueError, match="wSamplesPerBlock"):
        A.decode_ms_adpcm(_patch(raw, fmt_at + 18, struct.pack("<H", 99)))
    data_at = raw.index(b"data") + 8
    with pytest.raises(ValueError, match="predictor index"):
        A.decode_ms_adpcm(_patch(raw, data_at, bytes([9])))
    with pytest.raises(ValueError, match="whole number of"):
        A.decode_ms_adpcm(_patch(
            raw, data_at - 4,
            struct.pack("<I", struct.unpack_from("<I", raw, data_at - 4)[0] - 1),
        ))
    fact_at = raw.index(b"fact") + 8
    with pytest.raises(ValueError, match="fact chunk claims"):
        A.decode_ms_adpcm(_patch(raw, fact_at, struct.pack("<I", 11)))
    with pytest.raises(ValueError, match="MS ADPCM"):
        A.decode_wav(raw)  # the strict tier still names it


@given(
    n=st.integers(1, 40), ch=st.integers(1, 2), seed=st.integers(0, 999),
    pi=st.integers(0, 6),
)
@settings(max_examples=60, deadline=None)
def test_ms_fuzz_roundtrip_frame_counts(n, ch, seed, pi):
    frames = _frames(n, ch, seed)
    d = A.decode_ms_adpcm(A.encode_ms_adpcm(
        frames, samples_per_block=10, predictor=pi))
    assert d["n_frames"] == n and len(d["linear"]) == n
