"""Raw-web ingestion tier (operators/web.py): from-scratch HTML
tokenizer, WARC record walk, HTTP envelope strip + chunked decoding,
link-density boilerplate removal — unit grammar tests, loud-error
contracts, and synthesis/extraction agreement."""

from __future__ import annotations

import hashlib

import pytest

from etl_pulumi_aws_snowflake_spark.operators import web as W


# --------------------------------------------------------------------
# HTML tokenizer
# --------------------------------------------------------------------

def _page(text: str, doc_id: int = 7) -> str:
    return (
        W._HTML_HEAD + str(doc_id) + W._HTML_AFTER_TITLE + str(doc_id)
        + W._HTML_AFTER_H1 + text + W._HTML_AFTER_TEXT
    )


def test_skeleton_extracts_the_documented_blocks():
    text = "alpha beta gamma"
    r = W.html_text(_page(text, 7))
    assert r["title"] == "doc 7"
    got = [b[0] for b in r["blocks"]]
    want = [t.format(doc_id=7, text=text) for t in W.BLOCKS_TEMPLATE]
    assert got == want


def test_skeleton_link_densities():
    r = W.html_text(_page("x"))
    nav, h1, p1, p2, foot = r["blocks"]
    assert nav[2] / nav[1] > 0.5      # dropped by the 0.5 threshold
    assert foot[2] / foot[1] > 0.5
    assert h1[2] == p1[2] == p2[2] == 0


def test_script_content_with_lt_is_skipped_to_close_tag():
    # '<' and a fake close tag inside a STRING must not end the element
    h = '<p>a</p><script>if(1<2){x="</nope>";}</script><p>b</p>'
    assert [b[0] for b in W.html_text(h)["blocks"]] == ["a", "b"]


def test_style_title_textarea_are_raw_text():
    h = ("<title>t &amp; u</title><style>p>a{color:red}</style>"
         "<textarea><p>not a block</p></textarea><p>real</p>")
    r = W.html_text(h)
    assert r["title"] == "t & u"
    assert [b[0] for b in r["blocks"]] == ["real"]


def test_comment_and_doctype_skipped():
    h = "<!DOCTYPE html><!-- <p>ghost</p> --><p>live</p>"
    assert [b[0] for b in W.html_text(h)["blocks"]] == ["live"]


def test_quoted_gt_in_attribute_does_not_end_tag():
    h = '<p title="a>b">text</p>'
    assert [b[0] for b in W.html_text(h)["blocks"]] == ["text"]


def test_entities_named_decimal_hex_and_forgiveness():
    h = "<p>&amp;&lt;&gt;&#65;&#x42;&copy; &unknown; &brokenentity</p>"
    (block,) = W.html_text(h)["blocks"]
    assert block[0] == "&<>AB© &unknown; &brokenentity"


def test_whitespace_collapse_and_nbsp():
    h = "<p>a  \n\t b&nbsp;&#160;c</p>"
    (block,) = W.html_text(h)["blocks"]
    assert block[0] == "a b c"


def test_link_chars_attributed_only_inside_anchor():
    h = '<p>one <a href="/">two three</a> four</p>'
    (block,) = W.html_text(h)["blocks"]
    assert block == ("one two three four", 18, 9)


def test_bare_lt_is_text():
    h = "<p>1 < 2 and 2 > 1</p>"
    (block,) = W.html_text(h)["blocks"]
    assert block[0] == "1 < 2 and 2 > 1"


@pytest.mark.parametrize(
    "h,msg",
    [
        ("<p>x</p><!-- never closed", "unterminated HTML comment"),
        ("<!DOCTYPE html", "unterminated markup declaration"),
        ("<p>x</p><script>var a=1;", "unterminated raw-text <script>"),
        ("<p class='x", "unterminated <p> tag"),
    ],
)
def test_truncated_html_raises_loudly(h, msg):
    with pytest.raises(ValueError, match=msg.replace("<", "<").replace(
            "(", "\\(")):
        W.html_text(h)


def test_block_vs_inline_flush_semantics():
    h = "<div>a<span>b</span>c</div><div>d</div>"
    assert [b[0] for b in W.html_text(h)["blocks"]] == ["abc", "d"]


# --------------------------------------------------------------------
# WARC walk
# --------------------------------------------------------------------

def _rec(rec_type: str, payload: bytes, extra: str = "") -> bytes:
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n{extra}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def test_warc_walk_two_records_exact_slices():
    raw = _rec("warcinfo", b"k: v\r\n") + _rec(
        "response", b"BODYBYTES",
        extra="WARC-Target-URI: http://x/\r\n",
    )
    recs = W.warc_walk(raw)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["target_uri"] == "http://x/"
    assert recs[1]["payload"] == b"BODYBYTES"
    assert recs[1]["content_length"] == 9


@pytest.mark.parametrize(
    "raw,msg",
    [
        (b"NOTWARC/1.0\r\n", "expected WARC version line"),
        (b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
         "unsupported WARC version"),
        (b"WARC/1.0\r\nContent-Length: 5\r\n\r\nab", "truncated WARC"),
        (b"WARC/1.0\r\nNoColonHere\r\n\r\n\r\n\r\n", "malformed WARC header"),
        (b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n", "missing Content-Length"),
        (b"WARC/1.0\r\nA: b\r\n  folded\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
         "folding unsupported"),
    ],
)
def test_warc_walk_loud_errors(raw, msg):
    with pytest.raises(ValueError, match=msg):
        W.warc_walk(raw)


def test_warc_walk_content_length_lie_detected():
    # declared 4, actual payload 6 → the separator check must trip
    raw = (b"WARC/1.0\r\nContent-Length: 4\r\n\r\n"
           b"sixsix\r\n\r\n")
    with pytest.raises(ValueError, match="CRLFCRLF"):
        W.warc_walk(raw)


# --------------------------------------------------------------------
# HTTP envelope + chunked decoding
# --------------------------------------------------------------------

def _chunked(body: bytes, sizes: list[int]) -> bytes:
    out, pos = bytearray(), 0
    for s in sizes:
        out += f"{s:x}\r\n".encode() + body[pos : pos + s] + b"\r\n"
        pos += s
    assert pos == len(body)
    return bytes(out + b"0\r\n\r\n")


def test_dechunk_roundtrip_multi_chunk():
    body = b"The quick brown fox jumps over the lazy dog"
    raw = _chunked(body, [10, 1, 32])
    assert W.dechunk_http_body(raw) == body


def test_dechunk_ignores_chunk_extensions():
    raw = b"3;ext=1\r\nabc\r\n0\r\n\r\n"
    assert W.dechunk_http_body(raw) == b"abc"


@pytest.mark.parametrize(
    "raw,msg",
    [
        (b"zz\r\nabc\r\n0\r\n\r\n", "bad chunk size"),
        (b"5\r\nab\r\n", "truncated chunk"),
        (b"3\r\nabcXX0\r\n\r\n", "not terminated by CRLF"),
        (b"3\r\nabc\r\n0\r\n\r\nEXTRA", "trailing garbage"),
        (b"3\r\nabc\r\n0\r\nX-Trailer: v\r\n\r\n", "trailer section"),
        (b"3\r\nabc\r\n", "missing chunk-size line"),
    ],
)
def test_dechunk_loud_errors(raw, msg):
    with pytest.raises(ValueError, match=msg):
        W.dechunk_http_body(raw)


def test_http_response_content_length_and_chunked():
    body = b"<html>hello</html>"
    cl = (b"HTTP/1.1 200 OK\r\ncontent-length: "
          + str(len(body)).encode() + b"\r\n\r\n" + body)
    assert W.http_response_body(cl) == (200, body)
    ch = (b"HTTP/1.1 404 Not Found\r\ntransfer-encoding: chunked\r\n\r\n"
          + _chunked(body, [7, 11]))
    assert W.http_response_body(ch) == (404, body)


@pytest.mark.parametrize(
    "raw,msg",
    [
        (b"SPDY/1 200\r\n\r\n", "not an HTTP/1.x response"),
        (b"HTTP/1.1 OK\r\n\r\n", "malformed HTTP status line"),
        (b"HTTP/1.1 200 OK\r\nheader-without-end", "unterminated HTTP header"),
        (b"HTTP/1.1 200 OK\r\ncontent-length: 99\r\n\r\nshort",
         "!= body size"),
        (b"HTTP/1.1 200 OK\r\ntransfer-encoding: gzip\r\n\r\nx",
         "unsupported"),
    ],
)
def test_http_response_loud_errors(raw, msg):
    with pytest.raises(ValueError, match=msg):
        W.http_response_body(raw)


# --------------------------------------------------------------------
# synthesis ↔ extraction agreement (worker-identical, no Spark needed)
# --------------------------------------------------------------------

def test_corpus_precondition_text_is_entity_free(spark, sf_correct):
    """The oracles use `text` directly because entity-encoding it is
    the identity on this corpus — assert that precondition."""
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    from pyspark.sql import functions as F

    bad = docs.filter(
        F.col("text").rlike("[&<>]") | F.col("text").rlike("[^ -~]")
        # the extractor whitespace-collapses the {text} block while the
        # oracles splice raw `text` in — collapse must be the identity
        # (no runs of spaces, no leading/trailing space) or the hashes
        # diverge with no pointer to the cause (ADVICE r15)
        | F.col("text").rlike("  ") | F.col("text").rlike("^ | $")
    ).count()
    assert bad == 0


def test_warc_synthesis_decodes_end_to_end(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet").limit(5)
    rows = W.as_warc(docs).collect()
    assert rows, "fixture empty"
    for row in rows:
        recs = W.warc_walk(row["warc"].encode())
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "request", "response"]
        status, body = W.http_response_body(recs[2]["payload"])
        assert status == 200
        parsed = W.html_text(body.decode())
        assert parsed["title"] == f"doc {row['doc_id']}"
        assert len(parsed["blocks"]) == 5


def test_warc_records_md5_matches_hand_walk(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet").limit(3)
    out = {
        (r["doc_id"], r["rec_no"]): r["payload_md5"]
        for r in W.warc_records(W.as_warc(docs)).collect()
    }
    for row in W.as_warc(docs).collect():
        for i, rec in enumerate(W.warc_walk(row["warc"].encode())):
            assert out[(row["doc_id"], i)] == hashlib.md5(
                rec["payload"]).hexdigest()


def test_numeric_after_lt_is_text():
    h = "<p>i <3 spark</p>"
    (block,) = W.html_text(h)["blocks"]
    assert block[0] == "i <3 spark"


def test_surrogate_numeric_entity_stays_literal():
    # chr(0xD800) is a lone surrogate — not encodable; must stay text
    h = "<p>a&#xD800;b&#55296;c</p>"
    (block,) = W.html_text(h)["blocks"]
    assert block[0] == "a&#xD800;b&#55296;c"
    block[0].encode("utf-8")  # the real contract: output is encodable


# --------------------------------------------------------------------
# .warc.gz: multi-member gzip (the Common Crawl wire format)
# --------------------------------------------------------------------

def _gz_member(data: bytes) -> bytes:
    import gzip
    return gzip.compress(data)


def test_warc_gz_per_record_members_decode():
    raw1 = _rec("warcinfo", b"k: v\r\n")
    raw2 = _rec("response", b"BODY", extra="WARC-Target-URI: http://x/\r\n")
    gz = _gz_member(raw1) + _gz_member(raw2)  # one member PER record
    recs = W.warc_walk(gz)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["payload"] == b"BODY"


def test_warc_gz_single_member_whole_file():
    raw = _rec("warcinfo", b"a: b\r\n") + _rec("request", b"GET / HTTP/1.1\r\n\r\n")
    assert len(W.warc_walk(_gz_member(raw))) == 2


def test_warc_gz_truncated_member_raises():
    gz = _gz_member(_rec("warcinfo", b"x: y\r\n"))
    with pytest.raises(ValueError, match="truncated gzip member"):
        W.gunzip_members(gz[:-5])


def test_warc_gz_corrupt_member_raises():
    gz = bytearray(_gz_member(_rec("warcinfo", b"x: y\r\n")))
    gz[12] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt gzip member"):
        W.gunzip_members(bytes(gz))


def test_warc_gz_garbage_after_members_raises():
    gz = _gz_member(_rec("warcinfo", b"x: y\r\n")) + b"JUNK"
    with pytest.raises(ValueError, match="corrupt gzip member"):
        W.gunzip_members(gz)


# --------------------------------------------------------------------
# charset tier (r16): label resolution, prescan, total-1252, lanes
# --------------------------------------------------------------------

def test_charset_from_content_type_forms():
    f = W.charset_from_content_type
    assert f("text/html; charset=utf-8") == "utf-8"
    assert f('text/html; charset="ISO-8859-1"') == "ISO-8859-1"
    assert f("text/html; Charset = 'Shift_JIS' ; x=1") == "Shift_JIS"
    assert f("text/html") is None
    assert f(None) is None
    assert f("text/html; charset=") is None


def test_whatwg_label_mapping_latin1_is_1252():
    """iso-8859-1 / latin1 / ascii labels must resolve to the
    windows-1252 decoder (the WHATWG Encoding Standard mapping)."""
    for label in ("iso-8859-1", "Latin1", "ASCII", "us-ascii", "l1"):
        text, canon = W.decode_html_body(
            b"\x93quoted\x94", f"text/html; charset={label}")
        assert canon == "windows-1252"
        assert text == "“quoted”"  # 0x93/0x94 are curly quotes


def test_w1252_decode_is_total():
    """Every byte 0..255 decodes (undefined cp1252 positions map to
    the C1 controls, per the WHATWG total decoder)."""
    all_bytes = bytes(range(256))
    out = W._decode_w1252(all_bytes)
    assert len(out) == 256
    assert out[0x81] == "\x81" and out[0x8D] == "\x8d"
    assert out[0x80] == "€" and out[0x9F] == "Ÿ"


def test_meta_prescan_both_forms_and_window():
    assert W.sniff_meta_charset(
        b'<html><head><meta charset="gbk"></head>') == "gbk"
    assert W.sniff_meta_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=Shift_JIS">') == "Shift_JIS"
    # outside the 1 KiB prescan window -> not found
    far = b"<html>" + b" " * 1100 + b'<meta charset="gbk">'
    assert W.sniff_meta_charset(far) is None
    # charset= in visible text (no <meta> tag) must not match
    assert W.sniff_meta_charset(b"<p>set charset=utf-8 here</p>") is None


def test_bom_beats_content_type_header():
    text, canon = W.decode_html_body(
        b"\xef\xbb\xbfh\xc3\xa9llo", "text/html; charset=ISO-8859-1")
    assert (text, canon) == ("h\xe9llo", "utf-8")
    text, canon = W.decode_html_body(
        b"\xff\xfeh\x00i\x00", "text/html; charset=utf-8")
    assert (text, canon) == ("hi", "utf-16le")


def test_unknown_label_and_bad_bytes_raise_typed():
    with pytest.raises(W.UnknownCharsetError) as ei:
        W.decode_html_body(b"x", "text/html; charset=x-martian")
    assert ei.value.label == "x-martian"
    with pytest.raises(W.CharsetDecodeError) as ei:
        W.decode_html_body(b"\xff\xff", "text/html; charset=utf-8")
    assert ei.value.label == "utf-8"
    with pytest.raises(W.CharsetDecodeError):
        W.decode_html_body(b"\x81\x20", "text/html; charset=Shift_JIS")


def test_lane_marks_pinned_independently():
    """LANE_MARKS must equal an independent recomputation straight
    through Python codecs (guards decoder drift: the oracle splices
    these as literals)."""
    b1 = W._MARK.encode("utf-8")
    b2 = W._MARK_SJ.encode("utf-8")
    w1252 = "".join(
        bytes([x]).decode("cp1252") if x not in
        (0x81, 0x8D, 0x8F, 0x90, 0x9D) else chr(x) for x in b1
    )
    assert W.LANE_MARKS[0] == W._MARK
    assert W.LANE_MARKS[1] == W.LANE_MARKS[3] == w1252
    assert W.LANE_MARKS[2] == b2.decode("shift_jis")
    assert W.LANE_MARKS[4] == b2.decode("gbk")
    for m in W.LANE_MARKS.values():
        assert not any(c.isspace() or c in "&<>" for c in m)


def test_robust_lanes_end_to_end(spark, sf_correct):
    """Each of the eight lanes lands in its documented bucket: decoded
    mojibake markers for lanes 0-4, tier-named quarantine rows for
    lanes 5-7 — driven through the real DataFrame operator."""
    docs = (spark.read.parquet(f"{sf_correct}/documents.parquet")
            .filter("doc_id < 16"))
    out = {
        r["doc_id"]: r
        for r in W.warc_main_text_robust(W.as_warc_mixed(docs)).collect()
    }
    assert len(out) == 16
    for doc_id, r in out.items():
        lane = doc_id % 8
        assert r["charset"] == W.LANE_CANONICAL[lane], r
        if lane < 5:
            assert r["error_class"] is None and r["status"] == 200
            assert f"mark {W.LANE_MARKS[lane]}" in r["main_text"]
            assert r["error"] is None
        else:
            assert r["error_class"] == {5: "charset", 6: "http",
                                        7: "html"}[lane]
            assert r["main_text"] is None and r["n_words"] is None
            assert r["error"]
            assert r["status"] == (None if lane == 6 else 200)


def test_strict_pipeline_honors_charset_header():
    """warc_main_text (strict) now decodes per the declared charset:
    a 1252-labeled page with high bytes decodes to curly quotes
    instead of dying (or mojibake) on UTF-8 assumptions."""
    html = ("<html><head><title>t</title></head><body>"
            "<p>say \x93hi\x94</p></body></html>")
    payload = (
        "HTTP/1.1 200 OK\r\ncontent-type: text/html; "
        f"charset=iso-8859-1\r\ncontent-length: {len(html.encode('latin-1'))}"
        "\r\n\r\n"
    ).encode() + html.encode("latin-1")
    status, headers, body = W.http_response(payload)
    text, canon = W.decode_html_body(body, headers["content-type"])
    assert canon == "windows-1252"
    blocks = W.html_text(text)["blocks"]
    assert blocks[0][0] == "say “hi”"


# --------------------------------------------------------------------
# URL canonicalization (r16)
# --------------------------------------------------------------------

def test_canonicalize_urls_cases(spark):
    rows = [
        (0, "http://example.org/path/7"),
        (1, "HTTP://EXAMPLE.ORG/path/7"),
        (2, "http://example.org:80/path/7"),
        (3, "http://example.org/path/7/"),
        (4, "http://example.org/path/7?utm_source=x&b=2&a=1"),
        (5, "http://example.org/path/7#frag"),
        (6, "https://Host.Example:8443/A/B/?utm_campaign=z"),
        (7, "https://example.org:443/"),
        (8, "http://example.org"),
        (9, "http://example.org/p?gclid=1&utm_x=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r["canonical_url"]
        for r in W.canonicalize_urls(df).collect()
    }
    base = "http://example.org/path/7"
    assert got[0] == got[1] == got[2] == got[3] == got[5] == base
    assert got[4] == base + "?a=1&b=2"  # kept params survive, sorted
    assert got[6] == "https://host.example:8443/A/B"  # port kept, path case kept
    assert got[7] == "https://example.org/"
    assert got[8] == "http://example.org/"
    assert got[9] == "http://example.org/p"  # '?' dropped when all stripped


def test_canonicalize_urls_tier2_cases(spark):
    """r17 tier 2: percent normalization, userinfo, no-path query,
    utm-prefixed NON-tracking params, non-hierarchical quarantine."""
    rows = [
        (0, "http://example.org/p%61th/7"),          # %61='a' unreserved
        (1, "http://example.org/a/x%2fy%2F"),        # %2f='/' reserved
        (2, "http://example.org/%7euser"),           # %7e='~'
        (3, "http://example.org?b=2&a=1&utm_source=x"),  # query, no path
        (4, "http://Alice:Pw@EXAMPLE.ORG:80/p"),     # userinfo verbatim
        (5, "http://example.org/p?utmost=9&utm_source=x"),  # LIKE-_ trap
        (6, "mailto:user@example.org"),              # non-hierarchical
        (7, "not a url at all"),                     # non-hierarchical
        (8, "http://example.org/p?x=100%"),          # malformed escape
        (9, "http://example.org/utm%5Fsource"),      # %5F='_' in PATH
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in W.canonicalize_urls(df).collect()}
    assert out[0]["canonical_url"] == "http://example.org/path/7"
    assert out[1]["canonical_url"] == "http://example.org/a/x%2Fy%2F"
    assert out[2]["canonical_url"] == "http://example.org/~user"
    assert out[3]["canonical_url"] == "http://example.org/?a=1&b=2"
    assert out[4]["canonical_url"] == "http://Alice:Pw@example.org/p"
    assert out[5]["canonical_url"] == "http://example.org/p?utmost=9"
    for i in (6, 7):
        assert out[i]["canonical_url"] is None
        assert out[i]["canonical_error"] == W.NON_HIERARCHICAL
    for i in (0, 1, 2, 3, 4, 5, 8, 9):
        assert out[i]["canonical_error"] is None
    # a '%' not followed by two hex digits passes through verbatim
    assert out[8]["canonical_url"] == "http://example.org/p?x=100%"
    # percent-decode runs BEFORE the tracking strip: an encoded
    # utm_source in the QUERY is stripped, but in the PATH it is just
    # a path segment that decodes
    assert out[9]["canonical_url"] == "http://example.org/utm_source"


def test_canonicalize_urls_encoded_tracking_param_stripped(spark):
    df = spark.createDataFrame(
        [(0, "http://example.org/p?utm%5Fsource=x&a=1")],
        "doc_id long, url string")
    [r] = W.canonicalize_urls(df).collect()
    assert r["canonical_url"] == "http://example.org/p?a=1"


# --------------------------------------------------------------------
# Content-Encoding tier (r17)
# --------------------------------------------------------------------

def _gz(data: bytes) -> bytes:
    import zlib

    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def test_decode_content_encoding_forms():
    import zlib

    body = b"<p>hello compressed world</p>"
    ok = W.decode_content_encoding
    assert ok(body, {}) == body                      # header absent
    assert ok(body, {"content-encoding": "identity"}) == body
    assert ok(_gz(body), {"content-encoding": "gzip"}) == body
    assert ok(_gz(body), {"content-encoding": "x-gzip"}) == body
    assert ok(zlib.compress(body), {"content-encoding": "deflate"}) == body
    d = zlib.compressobj(9, zlib.DEFLATED, -15)      # bare deflate misuse
    assert ok(d.compress(body) + d.flush(),
              {"content-encoding": "deflate"}) == body
    # coding LIST: applied by the sender left-to-right, decoded reversed
    assert ok(_gz(body), {"content-encoding": "identity, gzip"}) == body
    assert ok(_gz(zlib.compress(body)),
              {"content-encoding": "deflate, gzip"}) == body


def test_decode_content_encoding_errors_are_typed():
    import zlib

    body = b"x" * 200
    gz = _gz(body)
    with pytest.raises(W.ContentEncodingError) as e:
        W.decode_content_encoding(gz[: len(gz) // 2],
                                  {"content-encoding": "gzip"})
    assert e.value.coding == "gzip"
    with pytest.raises(W.ContentEncodingError):      # not gzip at all
        W.decode_content_encoding(body, {"content-encoding": "gzip"})
    with pytest.raises(W.ContentEncodingError):      # corrupt deflate
        W.decode_content_encoding(b"\x00garbage",
                                  {"content-encoding": "deflate"})
    with pytest.raises(W.ContentEncodingError) as e:  # truncated zlib
        W.decode_content_encoding(zlib.compress(body)[:-4],
                                  {"content-encoding": "deflate"})
    assert e.value.coding == "deflate"
    with pytest.raises(W.ContentEncodingError) as e:  # unshipped coding
        W.decode_content_encoding(body, {"content-encoding": "br"})
    assert e.value.coding == "br"
    # a ContentEncodingError IS a ValueError (the robust chain's
    # catch-all ordering depends on it)
    assert issubclass(W.ContentEncodingError, ValueError)


def test_encoded_warc_lanes_end_to_end():
    """robust_rows over the binary Content-Encoding fixture: four
    decode lanes produce the page text, the truncated-gzip and br
    lanes quarantine as 'encoding' with status 200 (the envelope
    parsed; the body failed)."""
    text = "alpha beta gamma"
    for lane in range(6):
        doc_id = 6 + lane  # doc_id % 6 == lane
        raw = W._encoded_warc_bytes(doc_id, text)
        [row] = W.robust_rows(doc_id, raw)
        _, status, charset, error_class, n_words, n_chars, main, err = row
        assert status == 200
        if lane >= 4:
            assert error_class == "encoding"
            assert charset is None and main is None
            assert "content-encoding" in err
        else:
            assert error_class is None
            assert charset == "utf-8"
            assert main.startswith(f"doc {doc_id}\n{text}\n")
            assert n_words == 2 + len(text.split()) + 8


def test_strict_pipeline_honors_content_encoding():
    """warc_main_text (strict) decodes a gzip body; a corrupt stream
    is a LOUD error there (quarantine is the robust variant's job)."""
    ok = W._encoded_warc_bytes(1, "plain words here")       # gzip lane
    recs = W.warc_walk(ok)
    status, headers, body = W.http_response(recs[0]["payload"])
    got = W.decode_content_encoding(body, headers)
    assert b"plain words here" in got
    bad = W._encoded_warc_bytes(4, "plain words here")      # truncated
    recs = W.warc_walk(bad)
    status, headers, body = W.http_response(recs[0]["payload"])
    with pytest.raises(W.ContentEncodingError):
        W.decode_content_encoding(body, headers)


def test_engine_outer_ring_catches_decoder_bugs(monkeypatch):
    """Deliberate-bug injection (VERDICT r16 #8): a NON-ValueError
    escaping any tier must degrade to an error_class='engine' row
    naming the exception — never an exception out of robust_rows."""
    def boom(_text):
        raise KeyError("planted decoder bug")

    monkeypatch.setattr(W, "html_text", boom)
    raw = W._encoded_warc_bytes(0, "some words")
    [row] = W.robust_rows(0, raw)
    assert row[3] == "engine"
    assert "KeyError" in row[7] and "planted decoder bug" in row[7]

    def walk_boom(_payload):
        raise AttributeError("planted walker bug")

    monkeypatch.setattr(W, "warc_walk", walk_boom)
    [row] = W.robust_rows(0, raw)
    assert row[3] == "engine"
    assert "AttributeError" in row[7]


def test_pct_normalize_expr_matches_python_reference(spark):
    """The §6.2.2 percent-normalization codegen vs an independent
    Python reference over 400 adversarial strings (lone %, short hex,
    mixed-case hex, unreserved and reserved octets, %25 self-escapes,
    consecutive escapes): byte-identical on every one."""
    import random
    import re as _re

    def ref(s: str) -> str:
        parts = s.split("%")
        out = [parts[0]]
        for seg in parts[1:]:
            if len(seg) >= 2 and all(
                    c in "0123456789abcdefABCDEF" for c in seg[:2]):
                ch = chr(int(seg[:2], 16))
                if _re.fullmatch(r"[A-Za-z0-9._~-]", ch):
                    out.append(ch + seg[2:])
                else:
                    out.append("%" + seg[:2].upper() + seg[2:])
            else:
                out.append("%" + seg)
        return "".join(out)

    rng = random.Random(17)
    alphabet = "%abf791AF~._-/?&=xyz"
    cases = ["", "%", "%%", "%2", "%25", "%2541", "%7e%7E~", "a%61%2f"]
    cases += ["".join(rng.choice(alphabet)
                      for _ in range(rng.randint(1, 24)))
              for _ in range(400)]
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, s string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", F.expr(W._pct_normalize_expr("s")).alias("n")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == ref(c), f"case {c!r}: {got[i]!r} != {ref(c)!r}"
