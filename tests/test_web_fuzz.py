"""Hypothesis round-trip properties for the raw-web tier: encoders are
independent of the decoders under test (hand-built framing vs the
walkers), so a passing round-trip pins both directions — the
codec-tier fuzz discipline (tests/test_codec_fuzz.py) applied to the
text-side decode tier."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pulumi_aws_snowflake_spark.operators import web as W

_payload = st.binary(min_size=0, max_size=300)


def _frame_record(rec_type: str, payload: bytes, uri: str | None) -> bytes:
    extra = f"WARC-Target-URI: {uri}\r\n" if uri else ""
    return (
        f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n{extra}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


@given(
    recs=st.lists(
        st.tuples(
            st.sampled_from(["warcinfo", "request", "response",
                             "metadata", "resource"]),
            _payload,  # arbitrary bytes — incl. CRLFCRLF inside
        ),
        min_size=1, max_size=6,
    )
)
@settings(max_examples=150, deadline=None)
def test_warc_walk_roundtrip_arbitrary_payloads(recs):
    """Content-Length framing means payload bytes are OPAQUE: records
    whose payloads contain WARC/1.0 lines or CRLFCRLF separators must
    still slice exactly."""
    raw = b"".join(
        _frame_record(t, p, f"http://x/{i}" if t != "warcinfo" else None)
        for i, (t, p) in enumerate(recs)
    )
    got = W.warc_walk(raw)
    assert [(r["warc_type"], r["payload"]) for r in got] == [
        (t, p) for t, p in recs
    ]


@given(
    body=st.binary(min_size=0, max_size=400),
    cuts=st.lists(st.integers(min_value=1, max_value=64),
                  min_size=0, max_size=8),
)
@settings(max_examples=150, deadline=None)
def test_dechunk_roundtrip_random_splits(body, cuts):
    """Any chunking of any body (zero-size middle chunks never emitted;
    the terminator is the only 0) dechunks back to the body."""
    out, pos = bytearray(), 0
    for c in cuts:
        piece = body[pos : pos + c]
        if piece:
            out += f"{len(piece):x}\r\n".encode() + piece + b"\r\n"
            pos += len(piece)
    tail = body[pos:]
    if tail:
        out += f"{len(tail):x}\r\n".encode() + tail + b"\r\n"
    out += b"0\r\n\r\n"
    assert W.dechunk_http_body(bytes(out)) == body


@given(
    members=st.lists(st.binary(min_size=0, max_size=200),
                     min_size=1, max_size=5)
)
@settings(max_examples=100, deadline=None)
def test_gunzip_members_roundtrip(members):
    gz = b"".join(gzip.compress(m) for m in members)
    assert W.gunzip_members(gz) == b"".join(members)


@given(s=st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_entity_decode_total_and_encodable(s):
    """The entity decoder is TOTAL over arbitrary text (spec
    forgiveness: anything malformed stays literal) and its output is
    always UTF-8 encodable (lone surrogates rejected)."""
    out = W._decode_entities(s)
    out.encode("utf-8")
    # text without '&' is untouched
    if "&" not in s:
        assert out == s


_WORDS = st.lists(
    st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=10),
    min_size=1, max_size=40,
)


@given(words=_WORDS)
@settings(max_examples=100, deadline=None)
def test_page_synthesis_extraction_roundtrip(words):
    """For any space-separated ASCII body text, the synthesized page's
    extraction recovers exactly the five documented blocks with the
    body verbatim in block 3 — the property the judged oracles rely
    on, fuzzed beyond the fixture corpus."""
    text = " ".join(words)
    page = (
        W._HTML_HEAD + "9" + W._HTML_AFTER_TITLE + "9"
        + W._HTML_AFTER_H1 + text + W._HTML_AFTER_TEXT
    )
    r = W.html_text(page)
    got = [b[0] for b in r["blocks"]]
    assert got == [
        t.format(doc_id=9, text=text) for t in W.BLOCKS_TEMPLATE
    ]


# --------------------------------------------------------------------
# quarantine tier (r16): robust_rows must be TOTAL — any mutation of a
# valid WARC yields rows (ok or quarantine), never an exception
# --------------------------------------------------------------------

def _valid_warc(text: str, lane: int) -> str:
    """A single-response WARC string mirroring as_warc_mixed's lane
    shapes, built independently of codegen."""
    html = (
        W._HTML_HEAD + "1" + W._T_CLOSE
        + (W._META_1252 if lane == 3 else "")
        + W._AFTER_TITLE_REST + "1" + W._HTML_AFTER_H1 + text
        + "</p>\n<p>mark " + (W._MARK_SJ if lane in (2, 4) else W._MARK)
        + W._HTML_AFTER_TEXT
    )
    raw = html.encode("utf-8")
    chunked = (
        f"{len(raw):x}\r\n".encode() + raw + b"\r\n0\r\n\r\n"
    ).decode("utf-8", "surrogateescape")
    resp = (
        "HTTP/1.1 200 OK\r\ncontent-type: " + W.LANE_CT[lane]
        + "\r\ntransfer-encoding: chunked\r\n\r\n" + chunked
    )
    return (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: http://x/\r\n"
        f"Content-Length: {len(resp.encode('utf-8'))}\r\n\r\n"
        + resp + "\r\n\r\n"
    )


@given(
    text=st.text(alphabet="abcdef ghij", min_size=1, max_size=60),
    lane=st.integers(min_value=0, max_value=4),
    mutations=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000),
                  st.characters(min_codepoint=1, max_codepoint=0x2FFF)),
        min_size=0, max_size=4,
    ),
)
@settings(max_examples=250, deadline=None)
def test_robust_rows_total_under_mutation(text, lane, mutations):
    """Arbitrary character substitutions anywhere in a valid WARC —
    framing, headers, chunk sizes, HTML, marker bytes — must come back
    as rows whose error_class is one of the four tiers (or None for a
    still-decodable record).  Task death is the one forbidden
    outcome."""
    warc = _valid_warc(text, lane)
    chars = list(warc)
    for pos, ch in mutations:
        chars[pos % len(chars)] = ch
    mutated = "".join(chars)
    rows = W.robust_rows(1, mutated)
    for r in rows:
        assert r[3] in (None, "warc", "http", "charset", "html")
        if r[3] is None:
            assert r[6] is not None  # main_text present on ok rows
    if not rows:
        # zero rows is legal ONLY when the mutation legitimately
        # retyped the record away from 'response' (e.g. hitting the
        # WARC-Type header) — the walk itself must have been clean,
        # or robust_rows would have emitted a 'warc' quarantine row
        recs = W.warc_walk(mutated.encode())
        assert all(r["warc_type"] != "response" for r in recs)


@given(
    body=st.binary(min_size=0, max_size=300),
    label=st.sampled_from(sorted(W._LABEL_TO_CANONICAL)),
)
@settings(max_examples=300, deadline=None)
def test_decode_html_body_typed_errors_only(body, label):
    """decode_html_body over arbitrary bytes and every table label:
    either a str comes back or one of the two typed charset errors —
    and the windows-1252 family NEVER fails (total decoder)."""
    try:
        text, canon = W.decode_html_body(
            body, f"text/html; charset={label}")
        assert isinstance(text, str)
        assert canon in W._CHARSETS or canon in ("utf-8",)
    except (W.UnknownCharsetError, W.CharsetDecodeError):
        assert W._LABEL_TO_CANONICAL[label] != "windows-1252" or (
            body[:2] in (b"\xff\xfe", b"\xfe\xff")
            or body[:3] == b"\xef\xbb\xbf"
        )


# --------------------------------------------------------------------
# Content-Encoding tier (r17): the binary-fixture walk must be TOTAL,
# and the 'engine' outer ring must never fire on mere malformed INPUT
# --------------------------------------------------------------------

@given(
    text=st.text(alphabet="abcdef ghij", min_size=1, max_size=60),
    lane=st.integers(min_value=0, max_value=5),
    mutations=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000),
                  st.integers(min_value=0, max_value=255)),
        min_size=0, max_size=6,
    ),
)
@settings(max_examples=250, deadline=None)
def test_robust_rows_total_under_byte_mutation_encoded(text, lane, mutations):
    """Arbitrary BYTE substitutions anywhere in a Content-Encoded WARC
    (framing, HTTP headers, compressed stream bytes) must come back as
    rows whose error_class is one of the five input tiers — never
    'engine' (that ring is for decoder BUGS, and this suite is the
    evidence input alone cannot reach it), never an exception."""
    raw = bytearray(W._encoded_warc_bytes(6 + lane, text))
    for pos, b in mutations:
        raw[pos % len(raw)] = b
    rows = W.robust_rows(6 + lane, bytes(raw))
    for r in rows:
        assert r[3] in (None, "warc", "http", "charset", "html",
                        "encoding")
        if r[3] is None:
            assert r[6] is not None
