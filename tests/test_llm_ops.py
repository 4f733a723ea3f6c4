"""LLM-data-pipeline operator tests (SURVEY.md §2.10) — properties the
DuckDB oracle comparison can't express: cross-engine hash bit-parity,
LSH recall vs the exact baseline, ANN subset-correctness, multimodal
stub gating, and invariance properties (reorder sensitivity)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.functions import hashing as H
from etl_pulumi_aws_snowflake_spark.functions import text as T
from etl_pulumi_aws_snowflake_spark.operators import dedup as D
from etl_pulumi_aws_snowflake_spark.operators import multimodal as M
from etl_pulumi_aws_snowflake_spark.operators import similarity as S
from etl_pulumi_aws_snowflake_spark.sources import load_table

from .oracle_check import duckdb_con

SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "a a a repeated tokens a a",
    "single",
    "dog lazy the over jumps fox brown quick the",
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "doc_id long, text string"
    )


def _duck_eval(expr: str, text: str):
    import duckdb

    return duckdb.sql(
        f"SELECT {expr} AS v FROM (SELECT ? AS text)", params=[text]
    ).fetchone()[0]


@pytest.mark.parametrize(
    "pair",
    [
        H.fingerprint("text"),
        H.simhash(H.word_hashes("text"), 32),
        H.minhash_signature(H.shingle_hashes(H.word_hashes("text"), 2), 4),
        T.lang_id("text"),
    ],
    ids=["fingerprint", "simhash", "minhash_sig", "lang_id"],
)
def test_hash_bit_parity(spark, sample_df, pair):
    """The Spark and DuckDB dialects of every hash/score expression must
    agree exactly on every sample — this is what makes MinHash/SimHash
    oracle-checkable rather than rows-only."""
    got = [
        r.v for r in sample_df.orderBy("doc_id").select(F.expr(pair.spark).alias("v")).collect()
    ]
    want = [_duck_eval(pair.duck, s) for s in SAMPLES]
    assert got == want


def test_exact_dedup_survivor(spark):
    df = spark.createDataFrame(
        [(10, "x"), (3, "x"), (7, "y")], "doc_id long, text string"
    )
    rows = {r.keep_id: r.n_copies for r in D.exact_dedup(df).collect()}
    assert rows == {3: 2, 7: 1}


def test_jaccard_pairs_known_overlap(spark):
    # doc 1/2 share all but one word-2-gram; doc 3 disjoint.
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5"),
            (2, "w1 w2 w3 w4 w6"),
            (3, "z1 z2 z3 z4 z5"),
        ],
        "doc_id long, text string",
    )
    pairs = D.jaccard_pairs(df, k=2, threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.doc_a, p.doc_b, p.n_shared) == (1, 2, 3)
    assert math.isclose(p.jaccard, 3 / 5)


def test_max_doc_freq_prunes_boilerplate(spark):
    # 'b b' boilerplate shingle in every doc; unique content otherwise.
    df = spark.createDataFrame(
        [(i, f"u{i} v{i} b b") for i in range(6)], "doc_id long, text string"
    )
    assert D.jaccard_pairs(df, k=2, threshold=0.1).count() == 15
    assert D.jaccard_pairs(df, k=2, threshold=0.1, max_doc_freq=3).count() == 0


def test_minhash_lsh_recall(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_pairs(docs, k=3, threshold=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(docs, k=3, threshold=0.8).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    assert lsh <= exact, "verify step must keep precision exact"
    recall = len(lsh & exact) / len(exact)
    # 8 bands × 2 rows at j=0.8 → P(candidate) ≈ 1-(1-0.64)^8 ≈ 0.9997
    assert recall >= 0.9, f"LSH recall {recall} below expectation"


def test_simhash_invariance(spark, sample_df):
    codes = {r.doc_id: r.simhash for r in D.simhash_codes(sample_df).collect()}
    # SimHash is a token-multiset statistic: reordering preserves it...
    assert codes[0] == codes[3]
    # ...while the rolling fingerprint is order-sensitive.
    fps = {
        r.doc_id: r.fp
        for r in sample_df.select(
            "doc_id", F.expr(H.fingerprint("text").spark).alias("fp")
        ).collect()
    }
    assert fps[0] != fps[3]


def test_cosine_topk_matches_numpy(spark, sf_smoke):
    import numpy as np

    emb = load_table(spark, sf_smoke, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    got = S.cosine_topk(probes, emb, k=3).collect()

    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    for probe_id in {r.probe_id for r in got}:
        p = vecs[probe_id]
        sims = {
            vid: float(v @ p / (np.linalg.norm(v) * np.linalg.norm(p)))
            for vid, v in vecs.items()
            if vid != probe_id
        }
        want = sorted(sims, key=lambda v: (-sims[v], v))[:3]
        mine = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.probe_id == probe_id]
        assert mine == want
        for r in got:
            if r.probe_id == probe_id:
                assert math.isclose(r.cos, sims[r.vec_id], rel_tol=1e-9)


def test_ivf_subset_of_brute(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    brute = {
        (r.probe_id, r.vec_id): r.cos
        for r in S.cosine_topk(probes, emb, k=500).collect()
    }
    ivf = S.ivf_topk(probes, emb, k=3, nprobe=2, seed_stride=50).collect()
    assert ivf, "IVF search returned nothing"
    for r in ivf:
        # every ANN hit must carry the true cosine for that pair
        assert math.isclose(r.cos, brute[(r.probe_id, r.vec_id)], rel_tol=1e-12)
    # with 10 lists and nprobe=2 some recall is expected even on
    # near-random vectors (the probe's own list is always searched)
    hits = sum(
        1
        for r in ivf
        if r.rank == 1
    )
    assert hits == len({r.probe_id for r in ivf})


def test_ivf_trained_centroids(spark, sf_smoke):
    """The KMeans path plugs trained centroids into the SAME ivf
    machinery: every vector gets a list in [0, nlists), ivf_topk
    returns valid exact-cosine candidates, and recall@3 vs brute force
    is at least as good as chance would allow (the probe's own list is
    always searched, so rank-1 self-neighbors are found)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    cents = S.train_ivf_centroids(emb, nlists=8, seed=7, max_iter=5)
    assert len(cents) == 8 and all(len(v) > 0 for _, v in cents)

    assigned = S.ivf_assign(emb, centroids=cents)
    lists = {r.list_id for r in assigned.select("list_id").distinct().collect()}
    assert lists <= set(range(8)) and len(lists) > 1
    assert assigned.count() == emb.count()

    brute = {
        (r.probe_id, r.vec_id): r.cos
        for r in S.cosine_topk(probes, emb, k=500).collect()
    }
    ivf = S.ivf_topk(probes, emb, k=3, nprobe=2, centroids=cents).collect()
    assert ivf
    for r in ivf:
        assert math.isclose(r.cos, brute[(r.probe_id, r.vec_id)], rel_tol=1e-12)
    # deterministic given (data, seed, partitioning): rerun agrees
    again = S.ivf_topk(
        probes, emb, k=3, nprobe=2,
        centroids=S.train_ivf_centroids(emb, nlists=8, seed=7, max_iter=5),
    ).collect()
    assert {(r.probe_id, r.rank, r.vec_id) for r in ivf} == {
        (r.probe_id, r.rank, r.vec_id) for r in again
    }


def test_multimodal_stub_gating():
    # JPEG gained a from-scratch tier in r14: a malformed JPEG-shaped
    # payload is now a loud ValueError from that tier (not a codec
    # gate); a format with NO from-scratch tier (GIF) stays codec-gated
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xe0jpeg-ish")
    with pytest.raises(NotImplementedError):
        M.decode_image(b"GIF89a not decodable here")
    assert M.decode_image(b"\xff\xd8", fake=True) == b"\xff\xd8"


def test_multimodal_capabilities(monkeypatch):
    """capabilities() is the single source of truth for codec presence
    — truthful in both the codec-absent (this container) and
    codec-present deployments; the from-scratch tiers (PNM, PNG, JPEG,
    BMP, WAV, Y4M) are always there."""
    assert M.capabilities() == {
        "image_decode": M._HAVE_PIL,
        "pnm_decode": True,
        "png_decode": True,
        "jpeg_decode": True,
        "bmp_decode": True,
        "wav_decode": True,
        "y4m_decode": True,
    }
    monkeypatch.setattr(M, "_HAVE_PIL", False)
    assert M.capabilities()["image_decode"] is False
    with pytest.raises(NotImplementedError):
        M.decode_image(b"x")
    monkeypatch.setattr(M, "_HAVE_PIL", True)
    assert M.capabilities()["image_decode"] is True


def test_pnm_decode_real_pixels():
    """The from-scratch Netpbm decoder (VERDICT r11 #6): P6 passes
    raster bytes through exactly; header whitespace runs and # comments
    parse per spec; P5 grayscale expands r=g=b; malformed headers,
    16-bit maxval, and truncated rasters fail loudly — and the decode
    works with NO codec library present."""
    rgb = bytes(range(24))  # 4x2 RGB
    assert M.decode_image(b"P6\n4 2\n255\n" + rgb) == rgb
    # comments + arbitrary whitespace in the header
    assert (
        M.decode_image(b"P6 # c\n# full comment line\n 4\t2 #w\n255 " + rgb)
        == rgb
    )
    # P5 grayscale expands to RGB the way PIL convert("RGB") does
    assert M.decode_image(b"P5\n2 2\n255\n" + bytes([0, 7, 9, 255])) == bytes(
        [0, 0, 0, 7, 7, 7, 9, 9, 9, 255, 255, 255]
    )
    # raster bytes that LOOK like whitespace/comments must not be eaten
    tricky = b"\n# \x0b\t" + bytes(range(19))
    assert M.decode_image(b"P6\n4 2\n255\n" + tricky) == tricky
    with pytest.raises(ValueError, match="truncated"):
        M.decode_image(b"P6\n4 2\n255\n" + rgb[:-1])
    with pytest.raises(ValueError, match="maxval"):
        M.decode_image(b"P6\n1 1\n65535\n" + b"\0" * 6)
    with pytest.raises(ValueError, match="malformed"):
        M.decode_image(b"P6\n4 x\n255\n" + rgb)
    with pytest.raises(ValueError, match="degenerate"):
        M.decode_image(b"P6\n0 2\n255\n")


def test_as_ppm_payloads_decode_end_to_end(spark, sample_df):
    """as_ppm builds REAL P6 payloads in codegen and the non-fake
    extract_features path decodes them in the Python worker: checksum
    == md5 of the sha256-hex raster the oracle replays."""
    feats = {
        r.doc_id: r
        for r in M.extract_features(M.as_ppm(sample_df), fake=False).collect()
    }
    for i, s in enumerate(SAMPLES):
        want = hashlib.sha256(s.encode()).hexdigest()[:24].encode()
        assert feats[i].n_bytes == 24
        assert feats[i].checksum == hashlib.md5(want).hexdigest()
    with pytest.raises(ValueError, match="sha256"):
        M.as_ppm(sample_df, width=11, height=2)  # 66 raster bytes > 64


def test_png_paeth_predictor_spec_vectors():
    """The Paeth predictor against hand-computed RFC 2083 §6.6 values —
    an EXTERNAL oracle (the spec's arithmetic worked by hand), so a
    matched encoder/decoder bug cannot cancel here."""
    # p = a+b-c; nearest of (a, b, c) to p, ties a then b then c
    assert M._paeth(1, 2, 3) == 1      # p=0: pa=1 smallest -> a
    assert M._paeth(100, 50, 0) == 100  # p=150: pa=50 smallest -> a
    assert M._paeth(0, 0, 0) == 0      # all tie -> a
    assert M._paeth(20, 10, 21) == 10  # p=9: pb=1 smallest -> b
    assert M._paeth(8, 4, 6) == 6      # p=6: pc=0 smallest -> c
    assert M._paeth(2, 4, 3) == 3      # p=3: pa=pb=1, pc=0 -> c
    assert M._paeth(0, 255, 255) == 0  # p=0: pa=0 -> a


def _chunk(tag: bytes, data: bytes) -> bytes:
    """Independent chunk builder for known-answer containers (the test
    does NOT reuse encode_png, so decoder vectors aren't circular)."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, scanlines: bytes) -> bytes:
    import struct
    import zlib

    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0),
        )
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_known_answer_vectors():
    """Decoder against hand-unfiltered spec vectors for every filter
    type — each expected raster is worked by hand from RFC 2083 §6
    (Recon formulas), built with an independent container builder."""
    # filter None: pixels pass through
    px = bytes([1, 2, 3, 200, 100, 50])
    assert M.decode_image(_png(2, 1, 2, b"\x00" + px)) == px
    # Sub: Recon(x) = Filt(x) + Recon(x - bpp)
    got = M.decode_image(_png(2, 1, 2, bytes([1, 10, 20, 30, 5, 5, 5])))
    assert got == bytes([10, 20, 30, 15, 25, 35])
    # Up: Recon(x) = Filt(x) + Prior(x); row0 None, row1 Up
    got = M.decode_image(
        _png(1, 2, 2, bytes([0, 10, 20, 30]) + bytes([2, 5, 6, 7]))
    )
    assert got == bytes([10, 20, 30, 15, 26, 37])
    # Average: Recon(x) = Filt(x) + floor((left + prior)/2); prior=0 row
    got = M.decode_image(_png(2, 1, 2, bytes([3, 10, 20, 30, 4, 4, 4])))
    assert got == bytes([10, 20, 30, 9, 14, 19])
    # Paeth on grayscale with a real prior row (hand-worked):
    # row0 = [100, 200]; row1 filt = [10, 20]
    #   x=0: a=0,b=100,c=0 -> pred 100 -> 110
    #   x=1: a=110,b=200,c=100 -> p=210, pb=10 smallest -> 200 -> 220
    got = M.decode_image(
        _png(2, 2, 0, bytes([0, 100, 200]) + bytes([4, 10, 20]))
    )
    assert got == bytes([100] * 3 + [200] * 3 + [110] * 3 + [220] * 3)
    # channel mapping: LA drops alpha + replicates; RGBA drops alpha
    got = M.decode_image(_png(2, 1, 4, bytes([0, 9, 128, 250, 0])))
    assert got == bytes([9, 9, 9, 250, 250, 250])
    got = M.decode_image(
        _png(1, 1, 6, bytes([0, 11, 22, 33, 44]))
    )
    assert got == bytes([11, 22, 33])


def test_png_roundtrip_every_filter_and_color_type():
    """encode_png -> decode round-trips seeded random rasters for each
    color type x each fixed filter x the cycling mode; combined with
    the hand vectors above this pins both directions of all five
    filters without a codec library."""
    import random

    rng = random.Random(13)
    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        w, h = rng.randint(1, 9), rng.randint(5, 9)
        raster = bytes(rng.randrange(256) for _ in range(w * h * ch))
        # the RGB24 projection of the raster (gray replicate, alpha drop)
        want = bytearray()
        for i in range(0, len(raster), ch):
            px = raster[i : i + ch]
            want += (
                bytes([px[0]] * 3) if ch <= 2 else px[:3]
            )
        for choice in (0, 1, 2, 3, 4, None):
            payload = M.encode_png(
                raster, w, h, color_type=color_type, filter_choice=choice
            )
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
            assert M.decode_image(payload) == bytes(want), (
                color_type,
                choice,
            )


def test_png_decode_loud_errors():
    """Out-of-scope and corrupt containers fail loudly with actionable
    messages — never wrong pixels: 16-bit depth, Adam7 interlace,
    palette without its PLTE, CRC corruption, truncation, bad filter
    byte."""
    import struct
    import zlib

    base_px = bytes([5, 6, 7, 8])
    good = M.encode_png(base_px, 2, 2, color_type=0, filter_choice=0)
    assert M.decode_image(good) == bytes(
        b for g in base_px for b in (g, g, g)
    )

    def ihdr(depth=8, color=0, interlace=0):
        return struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)

    scan = zlib.compress(bytes([0, 5, 6]) + bytes([0, 7, 8]))
    sig = b"\x89PNG\r\n\x1a\n"
    # 16-bit and Adam7 DECODE as of r15 (tests/test_png_full.py); a
    # 16-bit header over an 8-bit-sized raster is now a SIZE error
    with pytest.raises(ValueError, match="short of"):
        M.decode_image(
            sig + _chunk(b"IHDR", ihdr(depth=16)) + _chunk(b"IDAT", scan)
            + _chunk(b"IEND", b"")
        )
    # spec-illegal combination: 16-bit palette
    with pytest.raises(ValueError, match="not legal for color type"):
        M.decode_image(
            sig + _chunk(b"IHDR", ihdr(depth=16, color=3))
            + _chunk(b"PLTE", bytes(3)) + _chunk(b"IDAT", scan)
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="interlace method 2"):
        M.decode_image(
            sig + _chunk(b"IHDR", ihdr(interlace=2)) + _chunk(b"IDAT", scan)
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="missing PLTE"):
        # palette color type now decodes (r14) — but only WITH a PLTE
        M.decode_image(
            sig + _chunk(b"IHDR", ihdr(color=3)) + _chunk(b"IDAT", scan)
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="color type 5"):
        M.decode_image(
            sig + _chunk(b"IHDR", ihdr(color=5)) + _chunk(b"IDAT", scan)
            + _chunk(b"IEND", b"")
        )
    # CRC corruption: flip one raster-affecting byte inside IDAT
    corrupt = bytearray(good)
    idat_at = bytes(corrupt).index(b"IDAT")
    corrupt[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M.decode_image(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_image(good[:-8])
    with pytest.raises(ValueError, match="filter type"):
        M.decode_image(_png(2, 2, 0, bytes([9, 5, 6]) + bytes([0, 7, 8])))
    with pytest.raises(ValueError, match="signature"):
        M._decode_png(b"\x89PNG\r\n\x1a\x00 not quite")


def test_png_palette_decode_known_answer():
    """Hand-built type-3 container (not via encode_png): 2x1 indices
    [1, 0] against a 2-entry PLTE — decoded RGB is the table rows in
    index order."""
    import struct
    import zlib

    pal = bytes([10, 20, 30, 40, 50, 60])
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
        )
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 1, 0])))
        + _chunk(b"IEND", b"")
    )
    assert M.decode_image(raw) == bytes([40, 50, 60, 10, 20, 30])


def test_png_palette_loud_errors():
    import struct
    import zlib

    def raw(pal, idx):
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(
                b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
            )
            + _chunk(b"PLTE", pal)
            + _chunk(b"IDAT", zlib.compress(bytes([0, idx])))
            + _chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="index 2 out of range"):
        M._decode_png(raw(bytes(6), 2))
    with pytest.raises(ValueError, match="PLTE length"):
        M._decode_png(raw(bytes(4), 0))
    with pytest.raises(ValueError, match="palette must be given"):
        M.encode_png(bytes([0]), 1, 1, color_type=3)
    with pytest.raises(ValueError, match="palette must be given"):
        M.encode_png(bytes([0, 0, 0]), 1, 1, color_type=2,
                     palette=bytes(6))
    with pytest.raises(ValueError, match="out of range"):
        M.encode_png(bytes([3]), 1, 1, color_type=3, palette=bytes(6))
    with pytest.raises(ValueError, match="palette length"):
        M.encode_png(bytes([0]), 1, 1, color_type=3, palette=bytes(7))


def test_png_palette_roundtrip_every_filter():
    """Palette rasters (1-byte pixel stride) through every scanline
    filter — the narrowest bpp the unfilter loops see."""
    import random

    rng = random.Random(3)
    pal = M.PNG_TEST_PALETTE
    for filt in (0, 1, 2, 3, 4, None):
        idx = bytes(rng.randrange(256) for _ in range(6 * 5))
        raw = M.encode_png(
            idx, 6, 5, color_type=3, filter_choice=filt, palette=pal
        )
        expect = b"".join(pal[i * 3 : i * 3 + 3] for i in idx)
        assert M._decode_png(raw) == expect, f"filter {filt}"


def test_image_pixels_worker_matches_palette_arithmetic(spark):
    import hashlib as _h

    docs = spark.createDataFrame([(2, "icon")], "doc_id long, text string")
    h = _h.sha256(b"icon").hexdigest()
    rows = sorted(
        M.image_pixels(M.as_png_palette(docs)).collect(),
        key=lambda r: r["px"],
    )
    assert len(rows) == 10
    for px, r in enumerate(rows):
        v = ord(h[px])
        assert (r["r"], r["g"], r["b"]) == (v, 255 - v, v ^ 0x55), px


def test_as_png_payloads_decode_end_to_end(spark, sample_df):
    """as_png builds REAL PNG containers in the Arrow worker and the
    non-fake extract_features path decodes them: checksum == md5 of
    the sha256-hex raster the oracle replays; the default 5-row shape
    cycles through all five scanline filters on the judged path."""
    feats = {
        r.doc_id: r
        for r in M.extract_features(M.as_png(sample_df), fake=False).collect()
    }
    for i, s in enumerate(SAMPLES):
        want = hashlib.sha256(s.encode()).hexdigest()[:30].encode()
        assert feats[i].n_bytes == 30
        assert feats[i].checksum == hashlib.md5(want).hexdigest()
    with pytest.raises(ValueError, match="sha256"):
        M.as_png(sample_df, width=11, height=2)  # 66 raster bytes > 64


def test_multimodal_features_checksum(spark, sample_df):
    feats = {r.doc_id: r for r in M.extract_features(M.as_media(sample_df)).collect()}
    for i, s in enumerate(SAMPLES):
        assert feats[i].n_bytes == len(s.encode())
        assert feats[i].checksum == hashlib.md5(s.encode()).hexdigest()


def test_frame_sample_shape(spark, sample_df):
    rows = M.frame_sample(M.as_media(sample_df), every_n_bytes=8).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, s in enumerate(SAMPLES):
        buf = s.encode()
        frames = sorted(by_doc[i], key=lambda r: r.frame_no)
        assert len(frames) == math.ceil(len(buf) / 8)
        assert [f.frame_byte for f in frames] == [
            buf[off] for off in range(0, len(buf), 8)
        ]


def test_oracle_tables_present(spark, sf_smoke):
    """documents/embeddings views exist in the oracle connection (guards
    the TABLE_NAMES lists staying in sync)."""
    con = duckdb_con(sf_smoke)
    assert con.execute("SELECT count(*) FROM documents").fetchone()[0] > 0
    assert con.execute("SELECT count(*) FROM embeddings").fetchone()[0] > 0
    con.close()


def test_connected_components_warns_when_unconverged(spark):
    """A 4-node path graph needs >1 round of min-label propagation;
    max_iters=1 must WARN (silently returning split labels would
    over-count dedup survivors) while full iteration converges quietly."""
    import warnings

    from etl_pulumi_aws_snowflake_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(chain, max_iters=1)
    assert any("did not converge" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = {
            r.id: r.label for r in connected_components(chain).collect()
        }
    assert not any("did not converge" in str(w.message) for w in caught)
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cosine_topk_blas_matches_fold(spark):
    """The BLAS matmul path must return the same neighbors and ranks
    as the strict-fold form, with cos equal to 1e-9 (summation-order
    ulps only)."""
    from pyspark.sql import functions as F

    from etl_pulumi_aws_snowflake_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    a = {
        (r["probe_id"], r["rank"]): (r["vec_id"], r["cos"])
        for r in S.cosine_topk(probes, emb, 5).collect()
    }
    b = {
        (r["probe_id"], r["rank"]): (r["vec_id"], r["cos"])
        for r in S.cosine_topk_blas(probes, emb, 5).collect()
    }
    assert {k: v[0] for k, v in a.items()} == {k: v[0] for k, v in b.items()}
    assert all(abs(a[k][1] - b[k][1]) < 1e-9 for k in a)


def test_cosine_topk_blas_rejects_oversized_probe_set(spark):
    """Passing a corpus as probes must raise cleanly (limit+1 probe
    collect), never OOM the driver by collecting the full input."""
    import pytest

    from etl_pulumi_aws_snowflake_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="max_probes"):
        S.cosine_topk_blas(emb, emb, 5, max_probes=10)


def test_operator_persists_released_at_query_boundary(spark, sf_smoke):
    """Operator-internal persists (minhash/ngram shingle sets, the
    semantic_near_pairs IVF assignment) must not outlive their query in
    a registry run: the deferred pool releases them when the next
    registry query starts, so a sequential session never accumulates
    caches."""
    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    qs = all_queries()
    spark.catalog.clearCache()

    def n_persisted():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # a persisting query, materialized (as the driver would)
    qs["dedup_minhash_lsh"](spark, sf_smoke).collect()
    assert n_persisted() > 0  # the shingle cache is live for this query

    # next registry query -> previous query's caches are released
    qs["dedup_exact"](spark, sf_smoke).collect()
    assert n_persisted() == 0

    # same for the semantic_near_pairs assignment persist
    qs["dedup_embedding_survivors"](spark, sf_smoke).collect()
    qs["dedup_exact"](spark, sf_smoke).collect()
    assert n_persisted() == 0


def test_resize_media_checksum_matches_local(spark, sf_smoke):
    """resize_media's sampled bytes (the part the SQL oracle can't
    express) must equal a local python replay of the same stride walk."""
    import hashlib

    from etl_pulumi_aws_snowflake_spark.operators.multimodal import (
        as_media,
        resize_media,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    got = {
        r.doc_id: (r.in_bytes, r.stride, r.out_bytes, r.out_checksum)
        for r in resize_media(as_media(docs), target_bytes=64).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        buf = r.text.encode("utf-8")
        stride = max(1, len(buf) // 64)
        out = buf[::stride]
        assert got[r.doc_id] == (
            len(buf),
            stride,
            len(out),
            hashlib.md5(out).hexdigest(),
        )


def test_semantic_near_pairs_multi_assign_tightens_recall(spark, sf_correct):
    """VERDICT r04 #6: n_assign=2 must recover strictly more of the
    exact near-pair ground truth than single-assign, while remaining a
    superset of the single-assign candidates (top-1 is always among
    top-2) and a subset of the truth (candidates are verified by exact
    cosine, so multi-assign adds recall, never false positives)."""
    from etl_pulumi_aws_snowflake_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_correct}/embeddings.parquet")
    thr, stride = 0.35, 50
    truth = {
        (r.probe_id, r.vec_id)
        for r in S.cosine_near_pairs(emb, emb, thr)
        .filter("probe_id < vec_id")
        .collect()
    }
    single = {
        (r.doc_a, r.doc_b) for r in S.semantic_near_pairs(emb, thr, stride).collect()
    }
    multi = {
        (r.doc_a, r.doc_b)
        for r in S.semantic_near_pairs(emb, thr, stride, n_assign=2).collect()
    }
    assert single < multi <= truth  # strictly more recall, no junk
    # bounded cost: a pair appears once however many lists it shares
    rows = S.semantic_near_pairs(emb, thr, stride, n_assign=2).count()
    assert rows == len(multi)


def test_ivf_assign_topn_first_choice_matches_single_assign(spark, sf_correct):
    """ivf_assign_topn(n_assign=1) must reproduce ivf_assign exactly,
    and its top-2 assignment must CONTAIN the single assignment — the
    superset property semantic_near_pairs' multi-assign relies on.
    Checked on both tiers (literal and window-fallback)."""
    from etl_pulumi_aws_snowflake_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_correct}/embeddings.parquet")
    single = {(r.vec_id, r.list_id) for r in S.ivf_assign(emb, 50).collect()}

    def check():
        top1 = {(r.vec_id, r.list_id) for r in S.ivf_assign_topn(emb, 50, 1).collect()}
        assert top1 == single
        top2 = {(r.vec_id, r.list_id) for r in S.ivf_assign_topn(emb, 50, 2).collect()}
        assert single < top2
        assert len(top2) == 2 * len(single)  # exactly two lists per vector

    check()
    old = S.MAX_CLOSURE_SEEDS
    S.MAX_CLOSURE_SEEDS = 0  # force the window-fallback tier (loud warn)
    try:
        with pytest.warns(RuntimeWarning, match="MAX_CLOSURE_SEEDS"):
            check()
    finally:
        S.MAX_CLOSURE_SEEDS = old


def test_dedup_survivors_with_no_pairs_keeps_everything(spark):
    """Degenerate input: an empty candidate-pair list (clean corpus, or
    a threshold nothing crosses) must yield every doc keeping itself —
    not an error from the empty edge set inside connected_components."""
    from etl_pulumi_aws_snowflake_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [], "doc_a bigint, doc_b bigint, sim double"
    )
    rows = dedup_survivors(docs, pairs).collect()
    assert len(rows) == 5
    assert all(r.keep_id == r.doc_id and not r.is_dup for r in rows)


def test_pack_chunks_doc_spanning_multiple_budgets(spark):
    """Hand-checkable degenerate case: one 7-token doc at budget 4 must
    split 4+3 across chunks 0 and 1, and the next doc starts mid-chunk
    — the enumerated twin of test_packing.py's invariant sweep."""
    from etl_pulumi_aws_snowflake_spark.operators.packing import pack_chunks

    docs = spark.createDataFrame(
        [(1, 7), (2, 3)], "doc_id bigint, n_tokens bigint"
    )
    rows = sorted(
        pack_chunks(docs, budget=4).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    spark.catalog.clearCache()
    got = [(r.doc_id, r.chunk_id, r.tok_start, r.tok_end) for r in rows]
    assert got == [(1, 0, 0, 4), (1, 1, 4, 7), (2, 1, 7, 8), (2, 2, 8, 10)]


def _synthetic_corpus(spark, n=600, dim=4):
    """Deterministic small corpus wide enough to exceed one 256-seed
    chunk when densely seeded (no RNG — values from integer mixes)."""
    rows = [
        (
            i,
            [
                float(((i + 1) * (d + 3) * 2654435761) % 1000 - 500) / 250.0
                for d in range(dim)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_assign_chunked_arrow_tier_matches_join_tier(spark):
    """VERDICT r09 #1: crossing 256 seeds must STAY on the Arrow tier
    (chunk-of-256 running-best merge) instead of silently dropping onto
    the interpreted per-pair fold — that switch measured 65× on the r09
    scale curve.  300 seeds → two chunks; results must be bit-identical
    to the broadcast-join + max_by fallback, for top-1 AND top-2."""
    corpus = _synthetic_corpus(spark)
    # stride 2 over 600 vectors → 300 seeds: > MAX_LITERAL_SEEDS (two
    # chunks), ≤ MAX_CLOSURE_SEEDS (Arrow tier retained)
    arrow1 = {(r.vec_id, r.list_id) for r in S.ivf_assign(corpus, 2).collect()}
    arrow2 = {
        (r.vec_id, r.list_id) for r in S.ivf_assign_topn(corpus, 2, 2).collect()
    }
    old = S.MAX_CLOSURE_SEEDS
    S.MAX_CLOSURE_SEEDS = 0
    try:
        with pytest.warns(RuntimeWarning, match="MAX_CLOSURE_SEEDS"):
            join1 = {
                (r.vec_id, r.list_id) for r in S.ivf_assign(corpus, 2).collect()
            }
        with pytest.warns(RuntimeWarning, match="MAX_CLOSURE_SEEDS"):
            join2 = {
                (r.vec_id, r.list_id)
                for r in S.ivf_assign_topn(corpus, 2, 2).collect()
            }
    finally:
        S.MAX_CLOSURE_SEEDS = old
    assert arrow1 == join1
    assert arrow2 == join2
    assert arrow1 < arrow2  # superset property survives chunking


def test_ivf_nlists_seeding_is_fixed_count_and_deterministic(spark):
    """The fixed-``nlists`` hash-rank seeding (the 100 TB default) must
    (a) pick exactly nlists seeds regardless of corpus size — the knob
    the stride mode lets grow, which is what went quadratic — and
    (b) pick exactly the ids the dialect-shared rank expression names
    (replayed here in plain Python), independent of partitioning."""
    P = S.SEED_HASH_P

    def expected(ids, nlists):
        return set(
            sorted(ids, key=lambda i: (((i % P) * 2654435761 + 12345) % P, i))[
                :nlists
            ]
        )

    for n in (300, 600):
        corpus = _synthetic_corpus(spark, n=n).repartition(7)
        assigned = S.ivf_assign(corpus, nlists=16)
        lists = {r.list_id for r in assigned.select("list_id").distinct().collect()}
        assert lists <= expected(range(n), 16)
        seeds = {
            r.seed_id
            for r in S._seed_frame(corpus, 50, None, nlists=16).collect()
        }
        assert seeds == expected(range(n), 16)
        assert len(seeds) == 16  # constant cardinality at 2× the data


def test_ivf_topk_nlists_matches_stride_shape_and_is_exact_within_lists(spark):
    """ivf_topk(nlists=...) must produce the same schema/rank contract
    as the stride mode and be exact within searched lists: every
    returned (probe, vec) pair's cos must equal the brute-force cosine
    for that pair (precision is exact; only recall is approximate)."""
    corpus = _synthetic_corpus(spark, n=400)
    probes = corpus.filter(F.col("vec_id") % 100 == 0)
    ann = S.ivf_topk(probes, corpus, k=3, nprobe=2, nlists=8).collect()
    assert {r.rank for r in ann} <= {1, 2, 3}
    exact = {
        (r.probe_id, r.vec_id): r.cos
        for r in S.cosine_topk(probes, corpus, k=400).collect()
    }
    for r in ann:
        assert math.isclose(r.cos, exact[(r.probe_id, r.vec_id)], rel_tol=0, abs_tol=0)


def test_ivf_indexed_matches_unindexed_bit_for_bit(spark, tmp_path):
    """The persisted-index search must reproduce the in-memory
    ivf_topk EXACTLY under the same seeding — the round trip through
    snapshot_commit_partitioned / snapshot_read changes where bytes
    live, never what the operator returns."""
    corpus = _synthetic_corpus(spark, n=400)
    probes = corpus.filter(F.col("vec_id") % 100 == 0)
    root = str(tmp_path / "ivf")
    S.ivf_build_index(corpus, root, nlists=8)
    direct = S.ivf_topk(probes, corpus, k=3, nprobe=2, nlists=8).collect()
    indexed = S.ivf_topk_indexed(probes, root, k=3, nprobe=2).collect()
    key = lambda r: (r.probe_id, r.rank)
    assert sorted(map(tuple, indexed), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, direct), key=lambda t: (t[0], t[1])
    )
    assert len(indexed) > 0


def test_ivf_indexed_search_is_partition_pruned(spark, tmp_path):
    """The entire point of the persisted index: the corpus side of the
    search must open ONLY the probes' routed lists' partition dirs —
    pruning at the manifest, before any task launches — never the full
    corpus."""
    corpus = _synthetic_corpus(spark, n=400)
    probes = corpus.filter(F.col("vec_id") == 0)  # one probe
    root = str(tmp_path / "ivf")
    S.ivf_build_index(corpus, root, nlists=8)
    result = S.ivf_topk_indexed(probes, root, k=3, nprobe=2)
    corpus_files = [f for f in result.inputFiles() if "/corpus/" in f]
    assert corpus_files, "corpus scan contributed no files?"
    lists_read = {f.split("_p=")[1].split("/")[0] for f in corpus_files}
    # one probe, nprobe=2 -> exactly 2 of the 8 list partitions opened
    assert len(lists_read) == 2, lists_read


#: (build, append, delete, search) per index payload type — the
#: lifecycle property tests run over BOTH (VERDICT r11 #1: the int8
#: index must hold the same add()/remove_ids contracts as the float
#: one, not just build+serve).
_IVF_PAYLOADS = {
    "float": (
        S.ivf_build_index,
        S.ivf_index_append,
        S.ivf_index_delete,
        S.ivf_topk_indexed,
    ),
    "quantized": (
        S.ivf_build_index_quantized,
        S.ivf_index_append_quantized,
        S.ivf_index_delete_quantized,
        S.ivf_topk_indexed_quantized,
    ),
}


@pytest.mark.parametrize("payload", sorted(_IVF_PAYLOADS))
def test_ivf_index_append_equals_rebuild_with_frozen_seeds(
    spark, tmp_path, payload
):
    """Append must equal a full build over everything with the SAME
    centroids (the FAISS add() contract): assignment against the
    frozen seed table, search results bit-identical.  Holds for the
    float AND the int8 payload (quantization is per-vector, so it
    commutes with when the vector arrived)."""
    build, append, _, search = _IVF_PAYLOADS[payload]
    corpus = _synthetic_corpus(spark, n=400)
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    extra = corpus.filter(F.col("vec_id") % 2 == 1)
    probes = corpus.filter(F.col("vec_id") % 100 == 0)

    grown = str(tmp_path / "grown")
    build(base, grown, nlists=8)
    append(extra, grown)

    # reference: one-shot build over the FULL corpus with the base
    # half's frozen centroids (collected from the grown index root)
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read
    import os
    cent = [
        (r["seed_id"], r["v"])
        for r in snapshot_read(spark, os.path.join(grown, "seeds")).collect()
    ]
    full = str(tmp_path / "full")
    build(corpus, full, centroids=cent)

    got = sorted(map(tuple, search(probes, grown, k=3, nprobe=2).collect()))
    want = sorted(map(tuple, search(probes, full, k=3, nprobe=2).collect()))
    assert got == want and got
    # appended vectors are actually findable: odd ids appear in results
    assert any(r[2] % 2 == 1 for r in got)


def test_ivf_index_append_upserts_existing_vec_id(spark, tmp_path):
    """Re-appending an existing vec_id replaces its row (count stable),
    matching MERGE upsert semantics — the re-embedding flow, valid
    while the new embedding stays in the same list."""
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read
    import os

    corpus = _synthetic_corpus(spark, n=200)
    root = str(tmp_path / "ivf")
    S.ivf_build_index(corpus, root, nlists=4)
    before = snapshot_read(spark, os.path.join(root, "corpus")).count()
    S.ivf_index_append(corpus.filter(F.col("vec_id") < 20), root)
    after = snapshot_read(spark, os.path.join(root, "corpus")).count()
    assert before == after == 200


def test_ivf_index_compact_after_appends_preserves_search(spark, tmp_path):
    """Index lifecycle closure: daily appends fragment the corpus
    snapshot (each pruned MERGE pins another version dir); the GENERIC
    snapshot_compact is the maintenance op — post-compaction searches
    are bit-identical and the manifest references collapse to <= 2
    versions, so GC bounds on-disk history exactly as for any other
    snapshot table."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        _current_version,
        _read_manifest,
        DEFAULT_FS,
        snapshot_compact,
    )

    corpus = _synthetic_corpus(spark, n=300)
    probes = corpus.filter(F.col("vec_id") % 100 == 0)
    root = str(tmp_path / "ivf")
    S.ivf_build_index(corpus.filter(F.col("vec_id") < 298), root, nlists=4)
    # a small append hits a strict subset of the 4 lists: the rest
    # carry forward by reference -> the fragmented state a steady
    # append workload accumulates
    S.ivf_index_append(corpus.filter(F.col("vec_id") >= 298), root)
    before = sorted(
        map(tuple, S.ivf_topk_indexed(probes, root, k=3, nprobe=2).collect())
    )
    crt = os.path.join(root, "corpus")
    man = _read_manifest(crt, _current_version(crt, DEFAULT_FS), DEFAULT_FS)
    pre_versions = set(man["entries"].values())
    assert len(pre_versions) == 2, "append did not fragment?"
    assert snapshot_compact(spark, crt, max_versions_referenced=1) is not None
    man2 = _read_manifest(crt, _current_version(crt, DEFAULT_FS), DEFAULT_FS)
    post_versions = set(man2["entries"].values())
    # post-compaction references <= {new, previous-live}; the build
    # version the appends had been carrying is fully released
    assert len(post_versions) <= 2
    assert min(pre_versions) not in post_versions
    after = sorted(
        map(tuple, S.ivf_topk_indexed(probes, root, k=3, nprobe=2).collect())
    )
    assert before == after and before


# --- retrieval: BM25 + RRF (operators/search.py) ------------------------


def test_bm25_scores_match_duckdb_within_tolerance(spark, sf_correct):
    """The judged BM25 output is rank-only (ln differs across engines
    in the last ulp); this is the promised tolerance check on the
    SCORES, plus exact agreement on the ranks themselves."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.queries.llm_search import BM25_TERMS

    docs = load_table(spark, sf_correct, "documents")
    got = {
        r["rank"]: (r["doc_id"], r["score"])
        for r in SR.bm25_topk(docs, BM25_TERMS, k=10).collect()
    }
    tfs = ", ".join(
        f"{SR._tf(t).duck} AS tf_{i}" for i, t in enumerate(BM25_TERMS)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    con = duckdb_con(sf_correct)
    want = {
        rank: (doc_id, score)
        for rank, doc_id, score in con.execute(
            f"""
            WITH d AS (SELECT doc_id, {H.words('text').duck} AS ws FROM documents),
            base AS (SELECT doc_id, len(ws) AS dl, {tfs} FROM d),
            stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sum_dl, {dfs} FROM base),
            joined AS (SELECT base.*, stats.*,
                              cast(sum_dl as double)/cast(n as double) AS avgdl
                       FROM base CROSS JOIN stats),
            scored AS (SELECT doc_id,
                              {SR.bm25_score_expr(len(BM25_TERMS))} AS score
                       FROM joined)
            SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank,
                   doc_id, score
            FROM scored QUALIFY rank <= 10
            """
        ).fetchall()
    }
    assert set(got) == set(want) == set(range(1, 11))
    for rank in got:
        assert got[rank][0] == want[rank][0], (rank, got[rank], want[rank])
        assert got[rank][1] == pytest.approx(want[rank][1], abs=1e-9)


def test_bm25_rank_gaps_dwarf_the_ulp_band(sf_correct):
    """Rank-only judging is sound only while distinct scores differ by
    far more than the cross-engine ulp divergence: every adjacent score
    gap in the full ranking must be exactly 0 (a true tie — broken by
    doc_id identically in both engines) or > 1e-9."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.queries.llm_search import BM25_TERMS

    tfs = ", ".join(
        f"{SR._tf(t).duck} AS tf_{i}" for i, t in enumerate(BM25_TERMS)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    con = duckdb_con(sf_correct)
    scores = [
        s
        for (s,) in con.execute(
            f"""
            WITH d AS (SELECT doc_id, {H.words('text').duck} AS ws FROM documents),
            base AS (SELECT doc_id, len(ws) AS dl, {tfs} FROM d),
            stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sum_dl, {dfs} FROM base),
            joined AS (SELECT base.*, stats.*,
                              cast(sum_dl as double)/cast(n as double) AS avgdl
                       FROM base CROSS JOIN stats)
            SELECT {SR.bm25_score_expr(len(BM25_TERMS))} AS score
            FROM joined ORDER BY score DESC
            """
        ).fetchall()
    ]
    assert len(scores) > 10
    for hi, lo in zip(scores, scores[1:]):
        gap = hi - lo
        assert gap == 0.0 or gap > 1e-9, (hi, lo)


def test_bm25_requires_terms(spark, sample_df):
    from etl_pulumi_aws_snowflake_spark.operators import search as SR

    with pytest.raises(ValueError, match="at least one query term"):
        SR.bm25_topk(sample_df, [])
    with pytest.raises(ValueError, match="escaping"):
        SR.bm25_topk(sample_df, ["o'brien"])


def test_rrf_fuse_missing_arm_contributes_zero(spark):
    """A candidate absent from one arm gets exactly the other arm's
    1/(k+rank); present in both, exactly the two-term sum — and the
    pivoted fixed-order addition makes these doubles deterministic."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR

    arm0 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "probe_id long, doc_id long, rank long"
    )
    arm1 = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "probe_id long, doc_id long, rank long"
    )
    got = {
        r["doc_id"]: r["rrf"]
        for r in SR.rrf_fuse([arm0, arm1], k=10, k_const=60).collect()
    }
    assert got[10] == 1.0 / 61.0
    assert got[12] == 1.0 / 62.0
    assert got[11] == 1.0 / 62.0 + 1.0 / 61.0
    with pytest.raises(ValueError, match="at least one ranking arm"):
        SR.rrf_fuse([])


# --- persisted incremental LSH dedup index ------------------------------


def _lsh_corpus(spark, n=60, planted=6):
    """Deterministic corpus with planted near-dups: doc n-planted+j is
    doc j's text with the last word changed, so (j, n-planted+j) are
    high-Jaccard pairs crossing any split that separates them."""
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(30)) for _ in range(n - planted)
    ]
    for j in range(planted):
        texts.append(texts[j].rsplit(" ", 1)[0] + " changed")
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_lsh_index_check_equals_oneshot_pairs(spark, tmp_path):
    """Build-then-check must find exactly the one-shot
    minhash_lsh_pairs results restricted to new×indexed pairs — the
    index layer adds persistence and pruning, never different
    answers."""
    docs = _lsh_corpus(spark)
    old = docs.filter(F.col("doc_id") < 54)
    new = docs.filter(F.col("doc_id") >= 54)
    root = str(tmp_path / "lsh")
    D.lsh_build_index(old, root)
    got = {
        (r["doc_new"], r["doc_old"], r["jaccard"])
        for r in D.lsh_index_check(new, root, threshold=0.5).collect()
    }
    oneshot = {
        (r["doc_b"], r["doc_a"], r["jaccard"])
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
        if r["doc_b"] >= 54 and r["doc_a"] < 54
    }
    assert got == oneshot and got, got


def test_lsh_index_append_equals_rebuild(spark, tmp_path):
    """After appending a batch, the bands and sets snapshots must hold
    exactly what a fresh build over the union holds — the pruned-MERGE
    append is a pure optimization."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    docs = _lsh_corpus(spark)
    base = docs.filter(F.col("doc_id") < 40)
    batch = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 54))
    ra, rb = str(tmp_path / "app"), str(tmp_path / "full")
    D.lsh_build_index(base, ra)
    D.lsh_index_append(batch, ra)
    D.lsh_build_index(docs.filter(F.col("doc_id") < 54), rb)
    for leaf in ("bands", "sets"):
        a = {
            tuple(r)
            for r in snapshot_read(spark, os.path.join(ra, leaf))
            .drop("shingles")
            .collect()
        }
        b = {
            tuple(r)
            for r in snapshot_read(spark, os.path.join(rb, leaf))
            .drop("shingles")
            .collect()
        }
        assert a == b, leaf


def test_lsh_check_reads_only_routed_buckets(spark, tmp_path, monkeypatch):
    """The check's candidate join must open ONLY the band-bucket
    partitions the batch's keys route to (≤ bands per new doc), and
    the verify side only the candidate docs' set buckets — manifest
    pruning, the index's entire value at 100 TB.  Asserted by spying
    on the ``partition_values`` the operator passes to the REAL
    ``snapshot_read`` (whose pruning-by-construction is covered by the
    snapshot suite); the check subtree is persisted, so inputFiles()
    can't see the pruned scan."""
    from etl_pulumi_aws_snowflake_spark.streaming import snapshot as SN

    docs = _lsh_corpus(spark)
    old = docs.filter(F.col("doc_id") < 54)
    new = docs.filter(F.col("doc_id") == 54)  # ONE new doc -> <= 8 band keys
    root = str(tmp_path / "lsh")
    D.lsh_build_index(old, root)
    seen: dict[str, list] = {}
    real = SN.snapshot_read

    def spy(spark_, root_, partition_values=None, **kw):
        seen[root_.rsplit("/", 1)[-1]] = partition_values
        return real(spark_, root_, partition_values=partition_values, **kw)

    monkeypatch.setattr(SN, "snapshot_read", spy)
    got = D.lsh_index_check(new, root, threshold=0.5).collect()
    assert got  # the planted near-dup (54, 0) verified
    assert seen["bands"] is not None and 1 <= len(seen["bands"]) <= 8, seen
    # the verify side opens the CANDIDATE docs' buckets (candidates are
    # a banding superset — false positives may add a bucket or two) but
    # never the whole 16-bucket index
    assert seen["sets"] is not None and 1 <= len(seen["sets"]) <= 4, seen


def test_lsh_meta_freezes_band_parameters(spark, tmp_path):
    """check/append band with the INDEX's parameters read from the meta
    snapshot, not caller kwargs — mixing parameterizations would
    silently find nothing."""
    docs = _lsh_corpus(spark)
    root = str(tmp_path / "lsh")
    D.lsh_build_index(
        docs.filter(F.col("doc_id") < 54), root, num_hashes=8, bands=4
    )
    assert D._lsh_meta(spark, root) == (3, 8, 4, 16)
    got = D.lsh_index_check(
        docs.filter(F.col("doc_id") >= 54), root, threshold=0.5
    ).collect()
    assert got  # 4-band banding on both sides still finds the planted dups
    with pytest.raises(ValueError, match="divisible"):
        D.lsh_build_index(docs, str(tmp_path / "bad"), num_hashes=10, bands=4)


def test_stream_lsh_ingest_batch_split_independent(spark, tmp_path):
    """The streaming ingest's accumulated pair set must be the SAME
    however the file source slices the stream — including a new×new
    near-dup pair landing in one batch (within-batch channel) vs two
    batches (later-member-vs-index channel).  This is the determinism
    argument streaming/lsh_ingest.py rests its hash-judgeability on,
    exercised on channels the sf0.01 fixture doesn't hit (its pairs
    are all new×old)."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import dedup as D
    from etl_pulumi_aws_snowflake_spark.streaming.lsh_ingest import (
        stream_lsh_ingest,
    )

    base = _lsh_corpus(spark, n=48, planted=0)  # ids 0..47, no planted dups
    texts = {r["doc_id"]: r["text"] for r in base.collect()}
    new_rows = [
        (100, texts[0].rsplit(" ", 1)[0] + " edit"),  # new x old (0)
        (101, texts[1]),  # new x old (1), verbatim
        (102, texts[1] + " tail"),  # new x old AND new x new (101)
        (103, " ".join("zed" for _ in range(25))),  # matches nothing old
        (104, " ".join("zed" for _ in range(25)) + " tip"),  # new x new (103)
    ]
    docs_new = spark.createDataFrame(new_rows, "doc_id long, text string")

    def run(splits, leaf):
        work = str(tmp_path / leaf)
        root = os.path.join(work, "index")
        D.lsh_build_index(base, root)
        landing = os.path.join(work, "landing")
        for ids in splits:
            docs_new.filter(F.col("doc_id").isin(ids)).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
        stream_lsh_ingest(
            spark,
            landing,
            docs_new.schema,
            root,
            os.path.join(work, "results"),
            os.path.join(work, "ckpt"),
            threshold=0.5,
            max_files_per_trigger=1,
        )
        return {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in spark.read.parquet(os.path.join(work, "results")).collect()
        }

    one_batch = run([[100, 101, 102, 103, 104]], "one")
    split = run([[100, 103], [101, 104], [102]], "split")
    assert one_batch == split, (one_batch, split)
    pairs = {(a, b) for a, b, _ in one_batch}
    # both channels fired: new x new pairs present under both slicings
    assert (101, 102) in pairs and (103, 104) in pairs, pairs
    assert (1, 101) in pairs, pairs  # and new x old


def test_lsh_index_compact_after_appends_preserves_check(spark, tmp_path):
    """LSH lifecycle closure, mirroring the IVF one: appends fragment
    the bands snapshot (each pruned MERGE pins another version dir);
    the GENERIC snapshot_compact is the maintenance op — the
    post-compaction check is identical and manifest references
    collapse, so GC bounds on-disk history with no index-specific
    machinery."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        DEFAULT_FS,
        _current_version,
        _read_manifest,
        snapshot_compact,
    )

    docs = _lsh_corpus(spark)
    root = str(tmp_path / "lsh")
    # 64 buckets + a 2-doc append batch (<= 16 band keys) so the pruned
    # MERGE provably leaves untouched buckets behind on the old version
    # — the fragmentation this test is about (14 docs x 8 bands over 16
    # buckets would touch every bucket and fragment nothing)
    D.lsh_build_index(docs.filter(F.col("doc_id") < 40), root, n_buckets=64)
    D.lsh_index_append(
        docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 42)), root
    )
    batch = docs.filter(F.col("doc_id") >= 54)
    before = sorted(
        map(tuple, D.lsh_index_check(batch, root, threshold=0.5).collect())
    )
    bands_root = os.path.join(root, "bands")
    man = _read_manifest(
        bands_root, _current_version(bands_root, DEFAULT_FS), DEFAULT_FS
    )
    assert len(set(man["entries"].values())) == 2, "append did not fragment?"
    assert snapshot_compact(spark, bands_root, max_versions_referenced=1)
    man2 = _read_manifest(
        bands_root, _current_version(bands_root, DEFAULT_FS), DEFAULT_FS
    )
    assert len(set(man2["entries"].values())) <= 2
    after = sorted(
        map(tuple, D.lsh_index_check(batch, root, threshold=0.5).collect())
    )
    assert before == after and before


# ---------------------------------------------------------------------------
# Persisted inverted (BM25) index — operators/search.py
# ---------------------------------------------------------------------------


def test_bm25_indexed_equals_scan_bit_for_bit(spark, tmp_path):
    """The indexed search must reproduce the scan-path bm25_topk
    EXACTLY — ranks AND score doubles — whenever >= k docs match: the
    score expression is byte-shared and the tf/dl/n/df/avgdl values it
    sees are identical by construction (df is one COUNT over postings
    rows vs one SUM over tf_i>0, same set)."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR

    docs = _lsh_corpus(spark)
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(docs, root, n_buckets=8)
    terms = ("alpha", "beta", "changed")
    scan = SR.bm25_topk(docs, terms, k=10).collect()
    idx = SR.bm25_topk_indexed(spark, root, terms, k=10).collect()
    assert [tuple(r) for r in idx] == [tuple(r) for r in scan]
    assert len(idx) == 10 and all(r["score"] > 0 for r in idx)


def test_bm25_index_append_equals_rebuild(spark, tmp_path):
    """After appending a disjoint batch, postings, corpus-stats meta,
    and search results must all equal a fresh build over the union —
    the pruned-MERGE append plus the meta (n, sum_dl) advance is a
    pure optimization."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    docs = _lsh_corpus(spark)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    ra, rb = str(tmp_path / "app"), str(tmp_path / "full")
    SR.bm25_build_index(base, ra, n_buckets=8)
    SR.bm25_index_append(batch, ra)
    SR.bm25_build_index(docs, rb, n_buckets=8)
    for leaf in ("postings", "meta"):
        a = {tuple(r) for r in snapshot_read(spark, os.path.join(ra, leaf)).collect()}
        b = {tuple(r) for r in snapshot_read(spark, os.path.join(rb, leaf)).collect()}
        assert a == b, leaf
    terms = ("alpha", "changed")
    got_a = SR.bm25_topk_indexed(spark, ra, terms, k=10).collect()
    got_b = SR.bm25_topk_indexed(spark, rb, terms, k=10).collect()
    assert [tuple(r) for r in got_a] == [tuple(r) for r in got_b] and got_a


def test_bm25_indexed_rare_query_returns_matches_only(spark, tmp_path):
    """An inverted index never sees tf=0 docs: a query matching fewer
    than k documents returns exactly the matches — equal to the scan
    path's positive-score prefix (the scan fills the remaining ranks
    with zero-score docs, which no served result should contain)."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR

    docs = _lsh_corpus(spark)  # "changed" appears in exactly 6 planted docs
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(docs, root, n_buckets=8)
    idx = SR.bm25_topk_indexed(spark, root, ("changed",), k=10).collect()
    scan = SR.bm25_topk(docs, ("changed",), k=10).collect()
    assert len(idx) == 6 and all(r["score"] > 0 for r in idx)
    assert [tuple(r) for r in idx] == [tuple(r) for r in scan[:6]]
    assert all(r["score"] == 0.0 for r in scan[6:])
    with pytest.raises(ValueError, match="at least one"):
        SR.bm25_topk_indexed(spark, root, (), k=10)


def test_bm25_indexed_reads_only_routed_buckets(spark, tmp_path, monkeypatch):
    """The postings read must be pruned to the query terms' routed
    buckets — asserted by spying on the partition_values the operator
    hands the REAL snapshot_read (the candidate subtree is persisted,
    so inputFiles() can't see the pruned scan; same protocol as the
    LSH check's test)."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming import snapshot as SN

    docs = _lsh_corpus(spark)
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(docs, root, n_buckets=32)
    seen: dict[str, list] = {}
    real = SN.snapshot_read

    def spy(spark_, root_, partition_values=None, **kw):
        seen[root_.rsplit("/", 1)[-1]] = partition_values
        return real(spark_, root_, partition_values=partition_values, **kw)

    monkeypatch.setattr(SN, "snapshot_read", spy)
    got = SR.bm25_topk_indexed(spark, root, ("alpha", "changed"), k=5).collect()
    assert got
    # 2 terms -> at most 2 of the 32 bucket partitions opened
    assert seen["postings"] is not None and 1 <= len(seen["postings"]) <= 2, seen
    assert seen["meta"] is None  # the 1-row stats read is unpruned


def test_bm25_index_compact_after_appends_preserves_search(spark, tmp_path):
    """Lifecycle closure, mirroring IVF and LSH: an append whose terms
    route to a strict bucket subset fragments the postings snapshot
    (the pruned MERGE pins a second version dir); the GENERIC
    snapshot_compact defragments it and search results are identical
    — no index-specific maintenance machinery."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        DEFAULT_FS,
        _current_version,
        _read_manifest,
        snapshot_compact,
    )

    # disjoint vocabularies so the append provably touches a strict
    # subset of buckets: base docs carry w0..w19 + 'common', the
    # appended doc only {w0, common}
    base = spark.createDataFrame(
        [(i, f"w{i} w{i} common") for i in range(20)], "doc_id long, text string"
    )
    extra = spark.createDataFrame([(100, "w0 common")], "doc_id long, text string")
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(base, root, n_buckets=32)
    SR.bm25_index_append(extra, root)
    proot = os.path.join(root, "postings")
    man = _read_manifest(proot, _current_version(proot, DEFAULT_FS), DEFAULT_FS)
    assert len(set(man["entries"].values())) == 2, "append did not fragment?"
    terms = ("common", "w0")
    before = [
        tuple(r) for r in SR.bm25_topk_indexed(spark, root, terms, k=5).collect()
    ]
    assert snapshot_compact(spark, proot, max_versions_referenced=1)
    man2 = _read_manifest(proot, _current_version(proot, DEFAULT_FS), DEFAULT_FS)
    assert len(set(man2["entries"].values())) <= 2
    after = [
        tuple(r) for r in SR.bm25_topk_indexed(spark, root, terms, k=5).collect()
    ]
    assert before == after and before


def test_lsh_ingest_batch_replay_invariant(spark, tmp_path):
    """Crash-replay contract (ADVICE r10): an epoch that dies AFTER the
    index append but BEFORE the checkpoint commit re-runs against an
    index that already CONTAINS the batch, so every within-batch pair
    is rediscovered through the index channel too.  The epoch's landed
    row set must be IDENTICAL across attempts — the dedupe on the
    canonical pair key absorbs the double discovery."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.lsh_ingest import (
        lsh_ingest_batch,
    )

    base = _lsh_corpus(spark, n=48, planted=0)
    texts = {r["doc_id"]: r["text"] for r in base.collect()}
    batch = spark.createDataFrame(
        [
            (100, texts[0].rsplit(" ", 1)[0] + " edit"),  # new x old
            (101, " ".join("qix" for _ in range(25))),
            (102, " ".join("qix" for _ in range(25)) + " tip"),  # new x new
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "index")
    D.lsh_build_index(base, root)
    results = str(tmp_path / "results")

    def epoch_rows():
        return {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in spark.read.parquet(os.path.join(results, "epoch=0")).collect()
        }

    lsh_ingest_batch(batch, 0, root, results, threshold=0.5)
    first = epoch_rows()
    assert any(a == 101 and b == 102 for a, b, _ in first), first  # within-batch
    assert any(b == 100 or a == 100 for a, b, _ in first), first  # vs index

    # replay: same epoch re-runs, index now holds the batch itself
    lsh_ingest_batch(batch, 0, root, results, threshold=0.5)
    assert epoch_rows() == first

    # each canonical pair appears exactly once (not just set-equality
    # over a multiset with duplicates)
    rows = spark.read.parquet(os.path.join(results, "epoch=0")).collect()
    assert len(rows) == len(first)


def test_lsh_ingest_batch_releases_its_persists(spark, tmp_path):
    """Each ingest epoch frees its own deferred persists on exit
    (ADVICE r10: a continuous stream never crosses a query-registry
    boundary, so per-batch caches would otherwise accumulate without
    bound) — while persists registered by OTHER code stay pooled."""
    from etl_pulumi_aws_snowflake_spark import cache
    from etl_pulumi_aws_snowflake_spark.streaming.lsh_ingest import (
        lsh_ingest_batch,
    )

    base = _lsh_corpus(spark, n=24, planted=0)
    root = str(tmp_path / "index")
    D.lsh_build_index(base, root)
    cache.release_deferred(spark)

    host = cache.deferred_persist(spark.range(10).toDF("n"))
    host.count()
    batch = spark.createDataFrame(
        [(200, "alpha beta gamma delta eps zeta eta theta alpha beta")],
        "doc_id long, text string",
    )
    lsh_ingest_batch(batch, 0, root, str(tmp_path / "results"), threshold=0.5)

    with cache._LOCK:
        assert [id(df) for df, _ in cache._PENDING] == [id(host)]
    assert host.storageLevel.useMemory
    cache.release_deferred(spark)


def test_band_key_overflow_rejected_loudly(spark, tmp_path):
    """rows-per-band > 2 overflows the base-P int64 band-key combine
    (ADVICE r10: Spark wraps silently while DuckDB diverges) — every
    entry point fails loudly, and lsh_build_index fails BEFORE any
    snapshot commits so no index is left half-built with poisoned
    frozen parameters."""
    import os

    from etl_pulumi_aws_snowflake_spark.functions import hashing as H

    with pytest.raises(ValueError, match="rows"):
        H.band_keys(H.X("sig", "sig"), bands=4, rows=3)

    docs = _lsh_corpus(spark, n=10, planted=0)
    with pytest.raises(ValueError, match="2 \\* bands"):
        D._banded_keys(
            D.shingle_sets(docs), num_hashes=12, bands=4
        )

    root = str(tmp_path / "bad_lsh")
    with pytest.raises(ValueError, match="2 \\* bands"):
        D.lsh_build_index(docs, root, num_hashes=16, bands=4)
    assert not os.path.exists(root), "partial index committed"

    # the boundary case still works: rows == 2 is the documented max
    ok = D._banded_keys(D.shingle_sets(docs), num_hashes=8, bands=4)
    assert ok.count() == 10 * 4


def test_lsh_index_delete_equals_never_ingested(spark, tmp_path):
    """delete+rebuild-without-doc == never-ingested (VERDICT r10 #6):
    an index that ingested extra docs and then deleted them BY ID must
    answer lsh_index_check identically to one that never saw them —
    including the planted near-dups, which WOULD pair if any band or
    set row survived the delete."""
    docs = _lsh_corpus(spark)  # ids 0..59; 54..59 near-dup 0..5
    old = docs.filter(F.col("doc_id") < 48)
    extra = docs.filter((F.col("doc_id") >= 48) & (F.col("doc_id") < 54))
    batch = docs.filter(F.col("doc_id") >= 54)

    grown = str(tmp_path / "grown")
    D.lsh_build_index(old, grown)
    D.lsh_index_append(extra, grown)
    D.lsh_index_delete(extra.select("doc_id"), grown)

    fresh = str(tmp_path / "fresh")
    D.lsh_build_index(old, fresh)

    got = {
        tuple(r)
        for r in D.lsh_index_check(batch, grown, threshold=0.5).collect()
    }
    want = {
        tuple(r)
        for r in D.lsh_index_check(batch, fresh, threshold=0.5).collect()
    }
    assert got == want and want  # the planted (54..59 x 0..5) pairs

    # deleting an id that was never ingested is a no-op, not an insert
    v_before = D._lsh_meta(spark, grown)
    D.lsh_index_delete(
        spark.createDataFrame([(9999,)], "doc_id long"), grown
    )
    got2 = {
        tuple(r)
        for r in D.lsh_index_check(batch, grown, threshold=0.5).collect()
    }
    assert got2 == want
    assert D._lsh_meta(spark, grown) == v_before


def test_lsh_index_delete_is_partition_pruned(spark, tmp_path, monkeypatch):
    """The id-only delete must stay pruned: the sets read opens only
    the ids' dbuckets, never the whole index."""
    from etl_pulumi_aws_snowflake_spark.streaming import snapshot as SN

    docs = _lsh_corpus(spark)
    root = str(tmp_path / "lsh")
    D.lsh_build_index(docs, root)  # n_buckets=16 default
    seen = {}
    real = SN.snapshot_read

    def spy(spark_, root_, partition_values=None, **kw):
        seen.setdefault(root_.rsplit("/", 1)[-1], partition_values)
        return real(spark_, root_, partition_values=partition_values, **kw)

    monkeypatch.setattr(SN, "snapshot_read", spy)
    D.lsh_index_delete(
        spark.createDataFrame([(3,), (19,)], "doc_id long"), root
    )
    # both ids hash to dbuckets {3} (3 % 16 and 19 % 16) -> ONE bucket
    assert seen["sets"] == [3], seen


@pytest.mark.parametrize("payload", sorted(_IVF_PAYLOADS))
def test_ivf_index_delete_equals_never_ingested(spark, payload):
    """IVF deletion: build on everything (seeds frozen over the full
    corpus), delete the odd half, search — must equal a search over an
    index built from the even half WITH THE SAME frozen centroids
    (FAISS remove_ids semantics: centroids never move).  Holds for the
    float AND the int8 payload."""
    import tempfile

    build, _, delete, search = _IVF_PAYLOADS[payload]
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    with tempfile.TemporaryDirectory() as td:
        grown = f"{td}/grown"
        build(emb, grown, nlists=8)
        delete(emb.filter(F.col("vec_id") % 2 == 1), grown)

        from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
            snapshot_read,
        )

        cent = [
            (r["seed_id"], r["v"])
            for r in snapshot_read(spark, f"{grown}/seeds").collect()
        ]
        fresh = f"{td}/fresh"
        build(emb.filter(F.col("vec_id") % 2 == 0), fresh, centroids=cent)
        got = [
            tuple(r)
            for r in search(probes, grown, k=3, nprobe=2)
            .orderBy("probe_id", "rank")
            .collect()
        ]
        want = [
            tuple(r)
            for r in search(probes, fresh, k=3, nprobe=2)
            .orderBy("probe_id", "rank")
            .collect()
        ]
        assert got == want and got


def test_quantized_rerank_recall_and_lockstep_lifecycle(spark, tmp_path):
    """The IVF-ADC re-rank tier (VERDICT r11 #2), three claims:

    1. recall(rerank) >= recall(pure int8) on the same index — the
       structural guarantee the tier exists for;
    2. the float read is partition-pruned to the survivors' lists
       (never an unpruned corpus scan);
    3. append/delete on a rerank-enabled index maintain BOTH payloads
       in lockstep: post-maintenance rerank serves equal a fresh
       rerank build under the same frozen seeds."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming import snapshot as SN

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    root = str(tmp_path / "adc")
    S.ivf_build_index_quantized(emb, root, nlists=8, rerank_payload=True)

    def hits(ann):
        exact = S.cosine_topk(probes, emb, k=3).select("probe_id", "vec_id")
        return (
            ann.select("probe_id", "vec_id")
            .join(exact, ["probe_id", "vec_id"])
            .count()
        )

    # (2) spy the float-payload read while serving
    seen = {}
    orig = SN.snapshot_read

    def spy(spark_, path, partition_values=None, **kw):
        if path.endswith("/corpus"):
            seen["pv"] = partition_values
        return orig(spark_, path, partition_values=partition_values, **kw)

    import unittest.mock as mock

    with mock.patch.object(SN, "snapshot_read", spy):
        rr = S.ivf_topk_indexed_quantized_rerank(
            probes, root, k=3, nprobe=2, m=3
        )
        h_rerank = hits(rr)
    assert seen["pv"] is not None and len(seen["pv"]) <= 8
    # (1) rerank recall >= pure-int8 recall
    h_int8 = hits(S.ivf_topk_indexed_quantized(probes, root, k=3, nprobe=2))
    assert h_rerank >= h_int8 > 0

    # (3) lockstep maintenance: append odd-tail, delete a slice, then
    # rerank serve == fresh rerank build with the same frozen seeds
    grown = str(tmp_path / "grown")
    base = emb.filter(F.col("vec_id") % 4 != 3)
    S.ivf_build_index_quantized(base, grown, nlists=8, rerank_payload=True)
    S.ivf_index_append_quantized(emb.filter(F.col("vec_id") % 4 == 3), grown)
    S.ivf_index_delete_quantized(emb.filter(F.col("vec_id") % 4 == 1), grown)
    cent = [
        (r["seed_id"], r["v"])
        for r in SN.snapshot_read(spark, os.path.join(grown, "seeds")).collect()
    ]
    fresh = str(tmp_path / "fresh")
    S.ivf_build_index_quantized(
        emb.filter(F.col("vec_id") % 4 != 1),
        fresh,
        centroids=cent,
        rerank_payload=True,
    )
    got = sorted(
        map(
            tuple,
            S.ivf_topk_indexed_quantized_rerank(
                probes, grown, k=3, nprobe=2, m=3
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            S.ivf_topk_indexed_quantized_rerank(
                probes, fresh, k=3, nprobe=2, m=3
            ).collect(),
        )
    )
    assert got == want and got


def test_bm25_index_delete_equals_never_ingested(spark, tmp_path):
    """BM25 deletion: build+delete must answer queries identically to
    never-ingested — postings AND the meta stats (n, sum_dl), which
    every document's score depends on."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR

    base = spark.createDataFrame(
        [(i, f"w{i % 7} common filler{i}") for i in range(40)],
        "doc_id long, text string",
    )
    extra = spark.createDataFrame(
        [(100 + i, f"w{i % 7} common extra") for i in range(10)],
        "doc_id long, text string",
    )
    grown = str(tmp_path / "grown")
    SR.bm25_build_index(base.unionByName(extra), grown, n_buckets=8)
    SR.bm25_index_delete(extra, grown)

    fresh = str(tmp_path / "fresh")
    SR.bm25_build_index(base, fresh, n_buckets=8)

    terms = ("common", "w0")
    got = [
        tuple(r)
        for r in SR.bm25_topk_indexed(spark, grown, terms, k=10).collect()
    ]
    want = [
        tuple(r)
        for r in SR.bm25_topk_indexed(spark, fresh, terms, k=10).collect()
    ]
    assert got == want and got
    assert SR._bm25_meta(spark, grown) == SR._bm25_meta(spark, fresh)


def test_bm25_ingest_batch_replay_is_exactly_once(spark, tmp_path):
    """The streaming append's crash-replay contract: the postings
    MERGE is key-idempotent, but the meta advance is not — the
    epoch stamp must make a replayed epoch a wholesale no-op, or n/Σdl
    double-count and every score drifts."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming.bm25_ingest import (
        bm25_ingest_batch,
    )

    base = spark.createDataFrame(
        [(i, f"w{i % 5} common") for i in range(20)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, "w0 common extra"), (101, "w1 common extra")],
        "doc_id long, text string",
    )
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(base, root, n_buckets=8)

    bm25_ingest_batch(batch, 7, root)
    meta_once = SR._bm25_meta(spark, root)
    assert meta_once == (22, 20 * 2 + 2 * 3, 8)
    got_once = [
        tuple(r)
        for r in SR.bm25_topk_indexed(spark, root, ("common",), k=25).collect()
    ]

    # crash-replay: same epoch re-delivered
    bm25_ingest_batch(batch, 7, root)
    assert SR._bm25_meta(spark, root) == meta_once
    got_again = [
        tuple(r)
        for r in SR.bm25_topk_indexed(spark, root, ("common",), k=25).collect()
    ]
    assert got_again == got_once

    # a LATER epoch still applies
    batch2 = spark.createDataFrame(
        [(102, "w2 common extra")], "doc_id long, text string"
    )
    bm25_ingest_batch(batch2, 8, root)
    assert SR._bm25_meta(spark, root) == (23, meta_once[1] + 3, 8)


def test_stream_bm25_ingest_batch_split_independent(spark, tmp_path):
    """The final index (postings AND stats) must be the same however
    the file source slices the stream — the determinism argument
    streaming/bm25_ingest.py rests the e2e entry's hash on."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming.bm25_ingest import (
        stream_bm25_ingest,
    )

    base = spark.createDataFrame(
        [(i, f"w{i % 5} common body") for i in range(20)],
        "doc_id long, text string",
    )
    new_rows = [(100 + i, f"w{i % 3} common streamed") for i in range(6)]
    docs_new = spark.createDataFrame(new_rows, "doc_id long, text string")

    def run(splits, leaf):
        work = str(tmp_path / leaf)
        root = os.path.join(work, "index")
        SR.bm25_build_index(base, root, n_buckets=8)
        landing = os.path.join(work, "landing")
        for ids in splits:
            docs_new.filter(F.col("doc_id").isin(ids)).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
        stream_bm25_ingest(
            spark,
            landing,
            docs_new.schema,
            root,
            os.path.join(work, "ckpt"),
            max_files_per_trigger=1,
        )
        top = [
            tuple(r)
            for r in SR.bm25_topk_indexed(
                spark, root, ("common", "w0"), k=30
            ).collect()
        ]
        return top, SR._bm25_meta(spark, root)

    one = run([[100, 101, 102, 103, 104, 105]], "one")
    split = run([[100, 103], [101, 104], [102, 105]], "split")
    assert one == split
    assert one[1][0] == 26  # 20 base + 6 streamed


def test_stream_ivf_ingest_split_independent_and_replay_safe(spark, tmp_path):
    """The IVF streaming ingest needs no epoch bookkeeping: the append
    is replay-idempotent by its vec_id keys (re-running an epoch lands
    identical rows in identical lists), and the final index is
    batch-split-independent (id-disjoint batches union under the keyed
    MERGE).  Both proven on the search results of the grown index."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import similarity as S
    from etl_pulumi_aws_snowflake_spark.sources import load_table
    from etl_pulumi_aws_snowflake_spark.streaming.ivf_ingest import (
        ivf_ingest_batch,
        stream_ivf_ingest,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 60))

    def search(root):
        return [
            tuple(r)
            for r in S.ivf_topk_indexed(probes, root, k=3, nprobe=2)
            .orderBy("probe_id", "rank")
            .collect()
        ]

    def run(splits, leaf):
        work = str(tmp_path / leaf)
        root = os.path.join(work, "index")
        S.ivf_build_index(base, root, nlists=8)
        landing = os.path.join(work, "landing")
        for pred in splits:
            new.filter(pred).coalesce(1).write.mode("append").parquet(landing)
        stream_ivf_ingest(
            spark, landing, new.schema, root,
            os.path.join(work, "ckpt"), max_files_per_trigger=1,
        )
        return root

    one = search(run([F.lit(True)], "one"))
    root_split = run(
        [F.col("vec_id") % 3 == 0, F.col("vec_id") % 3 == 1,
         F.col("vec_id") % 3 == 2],
        "split",
    )
    assert search(root_split) == one and one

    # replay: re-delivering an already-applied batch changes nothing
    ivf_ingest_batch(new.filter(F.col("vec_id") % 3 == 1), 0, root_split)
    assert search(root_split) == one


def test_quantized_ivf_index_int8_contract(spark, tmp_path):
    """The int8 path's arithmetic contract on a constructed fixture:
    qv = floor(127·v/max|v| + 0.5) stays in [-127, 127] with the
    extremes hit exactly, zero vectors are dropped, the persisted
    payload carries NO scale (it cancels out of cosine), and the
    asymmetric search ranks by cos(p, q) with large-gap fixtures
    agreeing with full-precision ranking."""
    from etl_pulumi_aws_snowflake_spark.operators import similarity as S
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),     # near probe 0
        (2, [-0.5, 0.25, 0.0, 0.0]),   # extremes: -127 and 64 (63.5 rounds up)
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),     # zero vector -> dropped
        (5, [0.0, 0.95, 0.2, 0.0]),    # near probe 3
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    root = str(tmp_path / "ivfq")
    S.ivf_build_index_quantized(emb, root, nlists=2)

    q = {
        r["vec_id"]: (list(r["qv"]), r["qnrm"])
        for r in snapshot_read(spark, f"{root}/corpus_q").collect()
    }
    assert 4 not in q  # zero vector dropped
    assert q[0][0] == [127, 0, 0, 0]
    assert q[2][0] == [-127, 64, 0, 0]  # floor(63.5 + 0.5) = 64
    assert all(max(abs(x) for x in qv) == 127 for qv, _ in q.values())
    assert "qscale" not in snapshot_read(spark, f"{root}/corpus_q").columns

    probes = emb.filter(F.col("vec_id").isin([0, 3]))
    got = {
        (r["probe_id"], r["rank"]): r["vec_id"]
        for r in S.ivf_topk_indexed_quantized(
            probes, root, k=1, nprobe=2
        ).collect()
    }
    # large-gap fixture: int8 rounding cannot flip these ranks
    assert got[(0, 1)] == 1 and got[(3, 1)] == 5


def test_bm25_stream_stamp_replay_rules(spark, tmp_path):
    """The full (stream, epoch) replay matrix (ADVICE r11):

    1. a batch-mode append CARRIES the stamp forward, so a crash-replay
       interleaved with a batch append is STILL detected (the old
       stamp-drop opened a double-count window);
    2. a RESET checkpoint — same stream identity, epochs restarted
       below the stamp — raises loudly instead of silently dropping
       every future append;
    3. a NEW stream (different identity) adopting the index applies
       its epoch-0 batch normally and re-stamps."""
    import os

    import pytest

    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming.bm25_ingest import (
        bm25_ingest_batch,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    base = spark.createDataFrame(
        [(i, "w common") for i in range(10)], "doc_id long, text string"
    )
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(base, root, n_buckets=4)
    epoch3 = spark.createDataFrame(
        [(100, "w common x")], "doc_id long, text string"
    )
    bm25_ingest_batch(epoch3, 3, root, stream_id="ckpt-a")
    # (1) batch append between the epoch's meta commit and its
    # checkpoint commit: stamp carried forward...
    SR.bm25_index_append(
        spark.createDataFrame([(200, "w common y")], "doc_id long, text string"),
        root,
    )
    meta = snapshot_read(spark, os.path.join(root, "meta")).collect()[0]
    assert (meta["last_epoch"], meta["last_stream"]) == (3, "ckpt-a")
    # ...so the crash-replay of epoch 3 is still a no-op
    bm25_ingest_batch(epoch3, 3, root, stream_id="ckpt-a")
    assert SR._bm25_meta(spark, root) == (12, 20 + 3 + 3, 4)

    # (2) reset checkpoint: same stream identity, epoch regressed
    with pytest.raises(ValueError, match="reset/recreated checkpoint"):
        bm25_ingest_batch(
            spark.createDataFrame(
                [(300, "w common z")], "doc_id long, text string"
            ),
            0,
            root,
            stream_id="ckpt-a",
        )
    assert SR._bm25_meta(spark, root) == (12, 26, 4)  # nothing committed

    # (3) a NEW stream identity starting at epoch 0 applies + re-stamps
    batch = spark.createDataFrame(
        [(300, "w common z")], "doc_id long, text string"
    )
    bm25_ingest_batch(batch, 0, root, stream_id="ckpt-b")
    bm25_ingest_batch(batch, 0, root, stream_id="ckpt-b")  # replay
    assert SR._bm25_meta(spark, root) == (13, 26 + 3, 4)
    meta = snapshot_read(spark, os.path.join(root, "meta")).collect()[0]
    assert (meta["last_epoch"], meta["last_stream"]) == (0, "ckpt-b")


def test_bm25_index_delete_over_retreat_rejected(spark, tmp_path):
    """Deleting ids never ingested (or drifted text) would drive the
    corpus stats negative and make avgdl a garbage divisor — rejected
    loudly BEFORE anything commits (ADVICE r11); duplicate batch rows
    collapse to one retreat instead of double-counting."""
    import pytest

    from etl_pulumi_aws_snowflake_spark.operators import search as SR

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a d")], "doc_id long, text string"
    )
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(docs, root, n_buckets=4)

    # duplicate rows for one doc: retreat counted once, not twice
    dup = spark.createDataFrame(
        [(2, "a d"), (2, "a d")], "doc_id long, text string"
    )
    SR.bm25_index_delete(dup, root)
    assert SR._bm25_meta(spark, root) == (1, 3, 4)

    # over-retreat: 2 more docs than the index holds -> loud, no commit
    over = spark.createDataFrame(
        [(1, "a b c"), (7, "never ingested")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="drive the index stats negative"):
        SR.bm25_index_delete(over, root)
    assert SR._bm25_meta(spark, root) == (1, 3, 4)


def test_phrase_search_positional_contract(spark, tmp_path):
    """Positional-index phrase search: overlapping matches counted
    ('a a a' contains 'a a' twice), repeated phrase terms resolved by
    the same intersection arithmetic, order-sensitivity ('b a' is not
    'a b'), non-positional index rejected loudly, and a positional
    APPEND lands positional rows so streamed/appended docs are phrase-
    searchable too."""
    from etl_pulumi_aws_snowflake_spark.operators import search as SR

    docs = spark.createDataFrame(
        [
            (1, "x a b y a b z"),   # 'a b' twice, separated
            (2, "a a a"),           # 'a a' overlaps: 2 matches
            (3, "b a x"),           # reversed — no 'a b'
            (4, "a c b"),           # gap — not contiguous
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "pos")
    SR.bm25_build_index(docs, root, n_buckets=8, positions=True)

    got = {
        r["doc_id"]: r["n_matches"]
        for r in SR.phrase_search_indexed(spark, root, ("a", "b")).collect()
    }
    assert got == {1: 2}
    rep = {
        r["doc_id"]: r["n_matches"]
        for r in SR.phrase_search_indexed(spark, root, ("a", "a")).collect()
    }
    assert rep == {2: 2}

    # positional append: new doc becomes phrase-searchable
    SR.bm25_index_append(
        spark.createDataFrame([(10, "q a b q")], "doc_id long, text string"),
        root,
    )
    got2 = {
        r["doc_id"]: r["n_matches"]
        for r in SR.phrase_search_indexed(spark, root, ("a", "b")).collect()
    }
    assert got2 == {1: 2, 10: 1}

    # non-positional index fails loudly
    flat = str(tmp_path / "flat")
    SR.bm25_build_index(docs, flat, n_buckets=8)
    with pytest.raises(ValueError, match="positions"):
        SR.phrase_search_indexed(spark, flat, ("a", "b")).collect()
    # and BM25 ranking over the positional index is unaffected by the
    # extra column (same routed read, same score columns)
    top = SR.bm25_topk_indexed(spark, root, ("a",), k=5).collect()
    assert [r["doc_id"] for r in top]


def test_stream_ivf_q_ingest_split_independent_and_replay_safe(spark, tmp_path):
    """The QUANTIZED/ADC streaming ingest inherits the float path's
    no-bookkeeping idempotence: quantization is a per-vector pure
    function and BOTH payload MERGEs are keyed, so the grown index is
    batch-split-independent and a replayed batch is a serve-level
    no-op — proven on the two-tier rerank search results."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import similarity as S
    from etl_pulumi_aws_snowflake_spark.streaming.ivf_ingest import (
        ivf_ingest_batch,
        stream_ivf_ingest,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 60))

    def search(root):
        return [
            tuple(r)
            for r in S.ivf_topk_indexed_quantized_rerank(
                probes, root, k=3, nprobe=2, m=3
            )
            .orderBy("probe_id", "rank")
            .collect()
        ]

    def run(splits, leaf):
        work = str(tmp_path / leaf)
        root = os.path.join(work, "index")
        S.ivf_build_index_quantized(base, root, nlists=8, rerank_payload=True)
        landing = os.path.join(work, "landing")
        for pred in splits:
            new.filter(pred).coalesce(1).write.mode("append").parquet(landing)
        stream_ivf_ingest(
            spark, landing, new.schema, root,
            os.path.join(work, "ckpt"), max_files_per_trigger=1,
            quantized=True,
        )
        return root

    one = search(run([F.lit(True)], "one"))
    root_split = run(
        [F.col("vec_id") % 3 == 0, F.col("vec_id") % 3 == 1,
         F.col("vec_id") % 3 == 2],
        "split",
    )
    assert search(root_split) == one and one

    # replay: re-delivering an already-applied batch changes nothing
    ivf_ingest_batch(
        new.filter(F.col("vec_id") % 3 == 1), 0, root_split, quantized=True
    )
    assert search(root_split) == one


def test_bm25_legacy_stamp_still_suppresses_upgrade_replay(spark, tmp_path):
    """Review r12: a meta stamped by the pre-stream-identity code
    (bare last_epoch, no last_stream column) must match ANY incoming
    stream identity for its pending crash-replay — otherwise the one
    replay spanning a library upgrade double-counts (n, sum_dl)."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming.bm25_ingest import (
        bm25_ingest_batch,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit,
        snapshot_read,
    )

    base = spark.createDataFrame(
        [(i, "w common") for i in range(10)], "doc_id long, text string"
    )
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(base, root, n_buckets=4)
    batch = spark.createDataFrame(
        [(100, "w common x")], "doc_id long, text string"
    )
    bm25_ingest_batch(batch, 3, root, stream_id="ckpt-a")
    meta_after = SR._bm25_meta(spark, root)
    # simulate the pre-upgrade stamp: same stats, last_epoch only
    legacy = spark.createDataFrame(
        [(meta_after[0], meta_after[1], meta_after[2], 3)],
        "n bigint, sum_dl bigint, n_buckets int, last_epoch bigint",
    )
    snapshot_commit(legacy, os.path.join(root, "meta"))
    row = snapshot_read(spark, os.path.join(root, "meta")).collect()[0]
    assert "last_stream" not in row.__fields__

    # the upgrade-spanning crash-replay: same epoch, NEW-code identity
    bm25_ingest_batch(batch, 3, root, stream_id="ckpt-a")
    assert SR._bm25_meta(spark, root) == meta_after  # no double-count
    # and a genuinely later epoch still applies + re-stamps both fields
    bm25_ingest_batch(
        spark.createDataFrame([(200, "w common y")], "doc_id long, text string"),
        4,
        root,
        stream_id="ckpt-a",
    )
    row = snapshot_read(spark, os.path.join(root, "meta")).collect()[0]
    assert (row["last_epoch"], row["last_stream"]) == (4, "ckpt-a")


def test_rerank_refuses_pin_without_corpus_member(spark, tmp_path):
    """ADVICE r12 (medium): when the published pin exists but lacks the
    'corpus' member — the root was rebuilt in place WITHOUT
    rerank_payload — the rerank serve must raise, not silently fall
    back to version=None and re-score survivors against the STALE live
    corpus dir left behind by the earlier rerank build."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    root = str(tmp_path / "adc")
    S.ivf_build_index_quantized(emb, root, nlists=8, rerank_payload=True)
    assert S.ivf_topk_indexed_quantized_rerank(
        probes, root, k=3, nprobe=2, m=3
    ).count() > 0
    # in-place rebuild without the float payload: pin drops 'corpus',
    # but the old build's live corpus dir is still on disk (the trap)
    S.ivf_build_index_quantized(emb, root, nlists=8, rerank_payload=False)
    with pytest.raises(ValueError, match="rerank_payload"):
        S.ivf_topk_indexed_quantized_rerank(probes, root, k=3, nprobe=2, m=3)
    # the int8-only serve the error points at still works
    assert S.ivf_topk_indexed_quantized(
        probes, root, k=3, nprobe=2
    ).count() > 0


def test_bm25_null_stream_stamp_still_suppresses_replay(spark, tmp_path):
    """ADVICE r12: a batch-mode append/delete that carries a LEGACY
    bare-last_epoch stamp forward writes last_stream=NULL via _stamp.
    A later upgrade-spanning replay of that pending epoch must still
    match the stamp (NULL stream == transitional == match-any), or the
    guard is bypassed and (n, sum_dl) double-count."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators import search as SR
    from etl_pulumi_aws_snowflake_spark.streaming.bm25_ingest import (
        bm25_ingest_batch,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit,
        snapshot_read,
    )

    base = spark.createDataFrame(
        [(i, "w common") for i in range(10)], "doc_id long, text string"
    )
    root = str(tmp_path / "bm25")
    SR.bm25_build_index(base, root, n_buckets=4)
    batch = spark.createDataFrame(
        [(100, "w common x")], "doc_id long, text string"
    )
    bm25_ingest_batch(batch, 3, root, stream_id="ckpt-a")
    # simulate the pre-upgrade stamp: same stats, last_epoch only
    m = SR._bm25_meta(spark, root)
    snapshot_commit(
        spark.createDataFrame(
            [(m[0], m[1], m[2], 3)],
            "n bigint, sum_dl bigint, n_buckets int, last_epoch bigint",
        ),
        os.path.join(root, "meta"),
    )
    # a batch-mode append carries the stamp forward -> last_stream=NULL
    SR.bm25_index_append(
        spark.createDataFrame(
            [(200, "w common y")], "doc_id long, text string"
        ),
        root,
    )
    row = snapshot_read(spark, os.path.join(root, "meta")).collect()[0]
    assert row["last_epoch"] == 3 and row["last_stream"] is None
    meta_after = SR._bm25_meta(spark, root)

    # the upgrade-spanning crash-replay of the pending epoch, under the
    # NEW-code identity: must be suppressed (no (n, sum_dl) change)
    bm25_ingest_batch(batch, 3, root, stream_id="ckpt-a")
    assert SR._bm25_meta(spark, root) == meta_after
    # and a genuinely later epoch still applies + re-stamps both fields
    bm25_ingest_batch(
        spark.createDataFrame(
            [(300, "w common z")], "doc_id long, text string"
        ),
        4,
        root,
        stream_id="ckpt-a",
    )
    row = snapshot_read(spark, os.path.join(root, "meta")).collect()[0]
    assert (row["last_epoch"], row["last_stream"]) == (4, "ckpt-a")


def test_lsh_index_check_saturation_guard(spark, tmp_path):
    """VERDICT r12 #6: a batch whose banded keys route to every bucket
    degrades the check to an index scan — the runtime must SAY so
    (LshSaturationWarning at full coverage) and fail loudly when the
    caller caps coverage; a small batch against a wide index stays
    silent."""
    import warnings

    corpus = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} filler common text") for i in range(60)],
        "doc_id long, text string",
    )
    # NARROW index (4 buckets): a modest batch saturates it
    narrow = str(tmp_path / "narrow")
    D.lsh_build_index(corpus, narrow, n_buckets=4)
    batch = spark.createDataFrame(
        [(1000 + i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} filler common text") for i in range(20)],
        "doc_id long, text string",
    )
    with pytest.warns(D.LshSaturationWarning):
        D.lsh_index_check(batch, narrow).collect()
    with pytest.raises(ValueError, match="saturated"):
        D.lsh_index_check(batch, narrow, max_bucket_coverage=0.75)
    # WIDE index (256 buckets): the same batch routes to a sliver —
    # no warning, and the explicit cap passes
    wide = str(tmp_path / "wide")
    D.lsh_build_index(corpus, wide, n_buckets=256)
    with warnings.catch_warnings():
        warnings.simplefilter("error", D.LshSaturationWarning)
        got = D.lsh_index_check(
            batch, wide, max_bucket_coverage=0.75
        ).collect()
    assert got  # planted near-dups are still found through the guard


def test_rerank_int8_guard_fires_before_empty_early_return(spark, tmp_path):
    """Review r13 (int8 twin of the PQ ordering fix): the ADC-only
    guard is pure metadata and must precede the survivor collect."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    root = str(tmp_path / "adc_only")
    S.ivf_build_index_quantized(emb, root, nlists=8, rerank_payload=False)
    empty_probes = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="rerank_payload"):
        S.ivf_topk_indexed_quantized_rerank(empty_probes, root, k=3, nprobe=2)


def test_lsh_saturation_cap_of_one_fires_at_full_coverage(spark, tmp_path):
    """Review r13: the documented cap range is (0..1] — a cap of
    exactly 1.0 must FAIL at full saturation, not merely warn."""
    corpus = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} pad pad pad") for i in range(40)],
        "doc_id long, text string",
    )
    narrow = str(tmp_path / "narrow")
    D.lsh_build_index(corpus, narrow, n_buckets=2)
    batch = spark.createDataFrame(
        [(900 + i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} pad pad pad") for i in range(20)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="saturated"):
        D.lsh_index_check(batch, narrow, max_bucket_coverage=1.0)


def test_png_unsupported_features_fall_through_to_pil(monkeypatch, tmp_path):
    """Review r13: a codec-present deployment must not LOSE formats —
    a PNG the from-scratch tier rejects falls through to PIL when
    importable (faked here: the container has no codec), while without
    PIL the specific ValueError survives.  Every spec-legal PNG now
    decodes in-tier (16-bit + Adam7 landed r15), so the vehicle is a
    container claiming an UNKNOWN interlace method — the seam itself
    is what this pins."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    interlaced_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + chunk(b"IEND", b"")
    )
    # without PIL: the loud tier error
    monkeypatch.setattr(M, "_HAVE_PIL", False)
    with pytest.raises(ValueError, match="interlace method 2"):
        M.decode_image(interlaced_png)

    # with (fake) PIL: decode_image must reach the PIL tier
    class FakeImg:
        def convert(self, mode):
            import numpy as np

            return np.array([[[255, 0, 0]]], dtype=np.uint8)

    class FakePIL:
        @staticmethod
        def open(buf):
            return FakeImg()

    monkeypatch.setattr(M, "_HAVE_PIL", True)
    monkeypatch.setattr(M, "_PILImage", FakePIL)
    assert M.decode_image(interlaced_png) == bytes([255, 0, 0])


def test_png_invalid_deflate_is_a_loud_valueerror(monkeypatch):
    """ADVICE r13: a chunk-CRC-valid PNG with a truncated/invalid
    DEFLATE stream must raise ValueError (the documented loud
    contract / the PIL fall-through trigger), not escape as
    zlib.error."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", b"\x01\x02notdeflate")  # CRC fine, stream junk
        + chunk(b"IEND", b"")
    )
    monkeypatch.setattr(M, "_HAVE_PIL", False)
    with pytest.raises(ValueError, match="inflate failed"):
        M.decode_image(bad)


def test_lsh_index_check_validates_coverage_cap_range(spark, tmp_path):
    """ADVICE r13: a cap > 1.0 can never fire (coverage <= 1.0) and a
    cap <= 0 always fires — both are caller bugs rejected at entry."""
    docs = spark.createDataFrame(
        [(1, "some text to shingle and route")], "doc_id long, text string"
    )
    root = str(tmp_path / "lshguard")
    D.lsh_build_index(
        spark.createDataFrame(
            [(2, "an indexed corpus document")], "doc_id long, text string"
        ),
        root,
    )
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="must be in"):
            D.lsh_index_check(docs, root, max_bucket_coverage=bad)


def test_semantic_decontam_subset_self_hits_and_recall(spark, sf_correct, tmp_path):
    """The indexed semantic-decontamination arm (r16) is sound and
    useful: flagged ⊆ exact brute-force threshold set (IVF pruning can
    only MISS, never invent a hit), every eval probe that is a corpus
    member self-flags at cos 1.0 (verbatim contamination), and recall
    vs exact stays ≥ 0.7 at nprobe=2/nlists=10 (measured 1.0 at
    sf0.001, 0.8 at sf0.01 — the numbers SCALE.md records)."""
    from pyspark.sql import functions as F

    from etl_pulumi_aws_snowflake_spark.operators import similarity as S
    from etl_pulumi_aws_snowflake_spark.operators.decontam import (
        contamination_semantic_indexed,
    )

    emb = spark.read.parquet(f"{sf_correct}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") % 97 == 0)
    probe_ids = {r["vec_id"] for r in probes.select("vec_id").collect()}
    exact = {
        r["vec_id"]
        for r in S.cosine_near_pairs(probes, emb, threshold=0.35)
        .select("vec_id").distinct().collect()
    } | probe_ids
    root = str(tmp_path / "sem_ivf")
    S.ivf_build_index(emb, root, nlists=10)
    out = contamination_semantic_indexed(probes, root, 0.35, 2)
    rows = {r["vec_id"]: r for r in out.collect()}
    flagged = set(rows)
    assert flagged <= exact
    assert probe_ids <= flagged  # self-routing: own list is rank 1
    for pid in probe_ids:
        assert rows[pid]["max_cos"] == pytest.approx(1.0)
    assert len(flagged & exact) / len(exact) >= 0.7


def test_semantic_dedup_indexed_subset_and_keep_one(spark, sf_correct, tmp_path):
    """The indexed semantic-dedup leg (r17) is sound: candidate pairs ⊆
    exact brute-force pairs ≥ τ (routing can only MISS, never invent),
    no self-pairs, doc_a < doc_b; survivors obey the keep-one rule
    (keep_id ≤ vec_id, keep_id is itself kept, non-dup rows keep
    themselves); and recall vs the exact pair set stays ≥ 0.5 at
    nprobe=2/nlists=10 (measured 0.535 at sf0.01, 0.564 at sf0.001 — the asymmetric
    routed-top-2 vs assigned-top-1 candidate rule sits between the
    single-assign 88/271 and symmetric multi-assign 176/271 pair
    counts at sf0.01; SCALE.md records the numbers)."""
    from pyspark.sql import functions as F

    from etl_pulumi_aws_snowflake_spark.operators import dedup as D
    from etl_pulumi_aws_snowflake_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_correct}/embeddings.parquet")
    exact = {
        (min(r["probe_id"], r["vec_id"]), max(r["probe_id"], r["vec_id"]))
        for r in S.cosine_near_pairs(emb, emb, threshold=0.35)
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id").collect()
    }  # exact brute-force all-pairs above τ, canonicalized
    root = str(tmp_path / "dedup_sem_ivf")
    S.ivf_build_index(emb, root, nlists=10)
    pairs = S.semantic_near_pairs_indexed(emb, root, 0.35, nprobe=2)
    got = {(r["doc_a"], r["doc_b"])
           for r in pairs.select("doc_a", "doc_b").collect()}
    assert all(a < b for a, b in got)          # canonical, no self-pairs
    assert got <= exact
    assert len(got & exact) / max(len(exact), 1) >= 0.5
    surv = {r["vec_id"]: r
            for r in D.dedup_survivors(emb, pairs, id_col="vec_id").collect()}
    assert set(surv) == {r["vec_id"] for r in emb.select("vec_id").collect()}
    for vid, r in surv.items():
        assert r["keep_id"] <= vid
        assert r["is_dup"] == (r["keep_id"] != vid)
        assert surv[r["keep_id"]]["is_dup"] is False  # keeps are kept
    # symmetric (within-cluster) mode, r18: still a subset of exact
    # (routing prunes, the threshold is exact), strictly better recall
    # than the asymmetric serve at the same nprobe, and the production
    # config (symmetric nprobe=4) clears the ≥0.8 bar (measured 0.985
    # at sf0.01; full sweep in SCALE.md)
    sym2 = {
        (r["doc_a"], r["doc_b"])
        for r in S.semantic_near_pairs_indexed(
            emb, root, 0.35, nprobe=2, symmetric=True
        ).select("doc_a", "doc_b").collect()
    }
    assert sym2 <= exact
    assert len(sym2) >= len(got)
    sym4 = {
        (r["doc_a"], r["doc_b"])
        for r in S.semantic_near_pairs_indexed(
            emb, root, 0.35, nprobe=4, symmetric=True
        ).select("doc_a", "doc_b").collect()
    }
    assert sym2 <= sym4 <= exact      # nprobe only widens routing
    assert len(sym4 & exact) / max(len(exact), 1) >= 0.8
