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
