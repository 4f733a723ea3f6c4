"""Raw-web ingestion queries (SURVEY.md §2.10, r15): WARC record walk,
HTTP envelope strip with chunked decoding, from-scratch HTML→text, and
link-density boilerplate removal — the text-side decode tier, judged
with the codec-tier recipe: payloads synthesized in pure codegen from
the documents table, decoded in Arrow-batched ``mapInPandas``, oracle
replaying the decoded result relationally in DuckDB SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import web as W
from ._util import t
from .registry import query


def _lit(s: str) -> str:
    """DuckDB e-string literal for a Python string (CRLFs and quotes
    escaped) — keeps the oracle text byte-identical to the codegen
    constants it replays."""
    body = (
        s.replace("\\", "\\\\").replace("'", "''")
        .replace("\r", "\\r").replace("\n", "\\n")
    )
    return f"e'{body}'"


# The two surviving boilerplate blocks' text and the dropped nav/footer
# text, straight from the synthesis skeleton (operators/web.py
# BLOCKS_TEMPLATE) — the oracle spells the composition out literally.
_P2_BLOCK = "tags & entities <stay> encoded — ❤ end"
_NAV_BLOCK = "home about contact"
_FOOT_BLOCK = "terms privacy © 2026"

# HTML page body as a DuckDB expression over (doc_id, text).  Entity
# encoding of the document text is the identity on this corpus (no
# &/</> — asserted in pytest), so the oracle uses `text` directly.
_BODY_SQL = (
    f"{_lit(W._HTML_HEAD)} || doc_id || {_lit(W._HTML_AFTER_TITLE)} "
    f"|| doc_id || {_lit(W._HTML_AFTER_H1)} || text "
    f"|| {_lit(W._HTML_AFTER_TEXT)}"
)

_P_REQ_SQL = (
    "'GET /doc/' || doc_id || "
    + _lit(" HTTP/1.1\r\nhost: example.org\r\nuser-agent: spark-graft\r\n\r\n")
)
# chunked HTTP response: 64-byte first chunk, remainder, 0-terminator
_P_RESP_SQL = (
    f"{_lit(W._HTTP_HEAD)} || {_lit(f'{W._CHUNK1:x}' + chr(13) + chr(10))} "
    f"|| substr(body, 1, {W._CHUNK1}) || {_lit(chr(13) + chr(10))} "
    f"|| lower(to_hex(length(body) - {W._CHUNK1})) "
    f"|| {_lit(chr(13) + chr(10))} || substr(body, {W._CHUNK1 + 1}) "
    f"|| {_lit(chr(13) + chr(10) + '0' + chr(13) + chr(10) + chr(13) + chr(10))}"
)


@query(
    "web_html_extract",
    oracle=f"""
    SELECT doc_id,
           'doc ' || doc_id AS title,
           CAST(5 AS BIGINT) AS n_blocks,
           {_lit(_NAV_BLOCK)} || chr(10) || 'doc ' || doc_id || chr(10)
             || text || chr(10) || {_lit(_P2_BLOCK)} || chr(10)
             || {_lit(_FOOT_BLOCK)} AS text
    FROM documents
    """,
)
def web_html_extract(spark, sf_dir):
    """From-scratch HTML→text end-to-end (the text-side decode tier,
    r15): each document becomes a deterministic HTML page in codegen —
    comment, style/script raw-text elements containing ``<`` and a fake
    close tag in a string, a quoted ``>`` inside an attribute, named +
    decimal + hex character references, intra-block whitespace to
    collapse — and ``html_extract`` runs the from-scratch tokenizer in
    the Python worker (operators/web.py::html_text).  The oracle spells
    out the five visible blocks literally, so a stripper that exits
    script at the first ``<``, mis-scans a quoted attribute, drops a
    block boundary, or expands an entity wrongly changes the judged
    text and fails the hash."""
    return W.html_extract(W.as_web_html(t(spark, sf_dir, "documents")))


@query(
    "web_main_content",
    oracle=f"""
    SELECT doc_id,
           'doc ' || doc_id || chr(10) || text || chr(10)
             || {_lit(_P2_BLOCK)} AS main_text,
           CAST(3 AS BIGINT) AS n_kept,
           CAST(2 AS BIGINT) AS n_dropped
    FROM documents
    """,
)
def web_main_content(spark, sf_dir):
    """Link-density boilerplate removal (the jusText/trafilatura-family
    heuristic): the synthesized page's nav (16/18 link chars) and
    footer (12/20) blocks exceed the 0.5 density threshold and must be
    dropped; the h1 and both paragraphs survive.  Both the surviving
    text AND the kept/dropped counts are value-judged — a density
    computed over the wrong denominator, or link attribution that leaks
    across ``</a>``, moves a block across the threshold and fails the
    hash."""
    return W.html_main_text(W.as_web_html(t(spark, sf_dir, "documents")))


@query(
    "web_warc_records",
    oracle=f"""
    WITH b AS (SELECT doc_id, text, {_BODY_SQL} AS body FROM documents),
    p AS (SELECT doc_id,
                 {_P_REQ_SQL} AS p_req,
                 {_P_RESP_SQL} AS p_resp
          FROM b)
    SELECT doc_id,
           CAST(r.i AS BIGINT) AS rec_no,
           CASE r.i WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'request'
                    ELSE 'response' END AS warc_type,
           CASE WHEN r.i = 0 THEN NULL
                ELSE 'http://example.org/doc/' || doc_id END AS target_uri,
           CAST(CASE r.i WHEN 0 THEN {len(W._WARCINFO_PAYLOAD)}
                         WHEN 1 THEN length(p_req)
                         ELSE length(p_resp) END AS BIGINT)
             AS content_length,
           CASE r.i WHEN 0 THEN md5({_lit(W._WARCINFO_PAYLOAD)})
                    WHEN 1 THEN md5(p_req)
                    ELSE md5(p_resp) END AS payload_md5
    FROM p CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) r
    """,
)
def web_warc_records(spark, sf_dir):
    """REAL WARC/1.0 record walk end-to-end (ISO 28500): each document
    becomes a genuine three-record WARC file in codegen — warcinfo,
    request, response in the Common-Crawl shape, every Content-Length
    computed in codegen — and ``warc_records`` walks it from scratch in
    the Python worker: version line, header block, Content-Length
    payload slice, CRLFCRLF separators, every byte accounted (truncated
    records and header folding are loud errors).  The 1-row→3-rows
    output carries the md5 of each ACTUAL payload slice, which the
    oracle recomputes by rebuilding the identical payloads in SQL — a
    walker that loses an offset, or a synthesis length that lies,
    fails on the exact record that triggers it."""
    return W.warc_records(W.as_warc(t(spark, sf_dir, "documents")))


# per-lane decoded-marker literals + char lengths (computed with the
# SAME decoders the operator uses, pinned by tests/test_web.py)
_MARKS = {k: _lit(v) for k, v in W.LANE_MARKS.items()}
_MLENS = {k: len(v) for k, v in W.LANE_MARKS.items()}

_OK_MAIN = (
    "'doc ' || doc_id || chr(10) || text || chr(10) || 'mark ' || "
    "CASE doc_id % 8 "
    + " ".join(f"WHEN {k} THEN {v}" for k, v in _MARKS.items())
    + f" END || chr(10) || {_lit(_P2_BLOCK)}"
)
_OK_NCHARS = (
    f"length('doc ' || doc_id) + 1 + length(text) + 1 + 5 + "
    "CASE doc_id % 8 "
    + " ".join(f"WHEN {k} THEN {v}" for k, v in _MLENS.items())
    + f" END + 1 + {len(_P2_BLOCK)}"
)


#: shared by web_charset_quarantine and the streaming composition
#: stream_web_ingest_e2e (queries/streaming_e2e.py): the quarantining
#: decode is a stateless per-row map, so the streamed output set must
#: equal the batch oracle however the files were microbatched.
CHARSET_QUARANTINE_ORACLE = f"""
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 8 = 6 THEN NULL ELSE 200 END
                AS BIGINT) AS status,
           CASE doc_id % 8
                WHEN 0 THEN 'utf-8' WHEN 1 THEN 'windows-1252'
                WHEN 2 THEN 'shift_jis' WHEN 3 THEN 'windows-1252'
                WHEN 4 THEN 'gbk' WHEN 5 THEN 'x-martian'
                WHEN 6 THEN NULL WHEN 7 THEN 'utf-8' END AS charset,
           CASE doc_id % 8 WHEN 5 THEN 'charset' WHEN 6 THEN 'http'
                WHEN 7 THEN 'html' ELSE NULL END AS error_class,
           CAST(CASE WHEN doc_id % 8 >= 5 THEN NULL
                ELSE 12 + len(regexp_extract_all(text, '\\S+')) END
                AS BIGINT) AS n_words,
           CAST(CASE WHEN doc_id % 8 >= 5 THEN NULL
                ELSE {_OK_NCHARS} END AS BIGINT) AS n_chars,
           CASE WHEN doc_id % 8 >= 5 THEN NULL
                ELSE {_OK_MAIN} END AS main_text
    FROM documents
    """


@query("web_charset_quarantine", oracle=CHARSET_QUARANTINE_ORACLE)
def web_charset_quarantine(spark, sf_dir):
    """Charset-aware, error-QUARANTINING raw-web ingest (VERDICT r15
    #1) — the production posture for a crawl where 10–20% of records
    are non-UTF-8 and malformed records arrive by the million.  Eight
    deliberate lanes per ``doc_id % 8``: utf-8; windows-1252 declared
    as quoted-uppercase ``ISO-8859-1`` (the WHATWG label mapping is
    judged — honoring latin1 literally changes every mojibake char);
    Shift_JIS and GB2312→gbk (multi-byte legacy decodes of the
    marker's UTF-8 bytes); windows-1252 via ``<meta>`` prescan with a
    bare ``text/html`` header; then three quarantine lanes — unknown
    charset label, corrupt chunk-size line, unterminated HTML comment
    — each becoming a ROW with the failing tier in ``error_class``
    instead of task death.  The oracle replays the decoded mojibake
    markers literally AND the quarantine rows, so a wrong decoder, a
    wrong label mapping, a prescan that misses, or an error class
    attributed to the wrong tier all fail the hash.  Same 100 TB shape
    as the strict pipeline: one column-pruned scan → one mapInPandas,
    zero shuffle."""
    return W.warc_main_text_robust(
        W.as_warc_mixed(t(spark, sf_dir, "documents"))
    ).drop("error")


@query(
    "web_pipeline_e2e",
    oracle=f"""
    SELECT doc_id,
           CAST(200 AS BIGINT) AS status,
           CAST(2 + len(regexp_extract_all(text, '\\S+')) + 8 AS BIGINT)
             AS n_words,
           CAST(length('doc ' || doc_id) + 1 + length(text) + 1
                + {len(_P2_BLOCK)} AS BIGINT) AS n_chars,
           'doc ' || doc_id || chr(10) || text || chr(10)
             || {_lit(_P2_BLOCK)} AS main_text
    FROM documents
    """,
)
def web_pipeline_e2e(spark, sf_dir):
    """The full raw-web ingestion chain under ONE driver hash: WARC
    record walk → response record → HTTP envelope strip with RFC 9112
    **chunked transfer decoding** (hex size lines, per-chunk CRLFs, the
    0-terminator — a dechunker that mis-parses a size corrupts the HTML
    mid-byte) → from-scratch HTML→blocks → link-density boilerplate
    removal → main text with exact word/char counts.  This is the
    operator chain a Common-Crawl-scale corpus build runs before any
    dedup/quality stage; one column-pruned scan → one mapInPandas, no
    shuffle, 1000-executor-parallel by file at 100 TB."""
    return W.warc_main_text(W.as_warc(t(spark, sf_dir, "documents")))


@query(
    "web_content_encoding",
    oracle=f"""
    SELECT doc_id,
           CAST(200 AS BIGINT) AS status,
           CASE WHEN doc_id % 6 >= 4 THEN NULL ELSE 'utf-8' END
             AS charset,
           CASE WHEN doc_id % 6 >= 4 THEN 'encoding' END AS error_class,
           CAST(CASE WHEN doc_id % 6 >= 4 THEN NULL
                ELSE 2 + len(regexp_extract_all(text, '\\S+')) + 8 END
                AS BIGINT) AS n_words,
           CAST(CASE WHEN doc_id % 6 >= 4 THEN NULL
                ELSE length('doc ' || doc_id) + 1 + length(text) + 1
                     + {len(_P2_BLOCK)} END AS BIGINT) AS n_chars,
           CASE WHEN doc_id % 6 >= 4 THEN NULL
                ELSE 'doc ' || doc_id || chr(10) || text || chr(10)
                     || {_lit(_P2_BLOCK)} END AS main_text
    FROM documents
    """,
)
def web_content_encoding(spark, sf_dir):
    """HTTP ``Content-Encoding`` body decompression in the web tier
    (VERDICT r16 #1) — Common Crawl ships bodies decompressed, but
    Heritrix/wget-at and most self-crawled WARCs retain the coding,
    and without this tier every such response misclassifies as a
    ``charset`` failure: a systematic, silent data loss at 100 TB.
    Six lanes per ``doc_id % 6`` over a BINARY warc column (compressed
    bytes can't ride a utf-8 string): explicit ``identity``; ``gzip``;
    zlib-wrapped ``deflate`` declared through a two-element coding
    list (``identity, deflate`` — list handling is judged); the
    bare-deflate server misuse the fallback must accept; then two
    quarantine lanes — a mid-member-truncated gzip stream and an
    unshipped ``br`` declaration — each a row with
    ``error_class='encoding'`` (status 200: the envelope parsed; the
    BODY failed), never task death.  The oracle replays the decoded
    main text for the four decode lanes and the quarantine rows
    literally.  Same 100 TB shape as the whole web tier: one
    column-pruned scan → Arrow-batched map stages, zero shuffle."""
    return W.warc_main_text_robust(
        W.as_warc_content_encoded(t(spark, sf_dir, "documents"))
    ).drop("error")


@query(
    "web_url_dedup",
    oracle="""
    WITH u AS (
        SELECT doc_id, doc_id % 10 AS lane,
               CAST(doc_id % 49 AS VARCHAR) AS pid
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CASE lane
                 WHEN 1 THEN 'HTTP://EXAMPLE.ORG/path/' || pid
                 WHEN 2 THEN 'http://example.org:80/path/' || pid
                 WHEN 3 THEN 'http://example.org/path/' || pid || '/'
                 WHEN 4 THEN 'http://example.org/path/' || pid
                             || '?utm_source=x&b=2&utmost=9&a=1'
                 WHEN 5 THEN 'http://example.org/path/' || pid || '#frag'
                 WHEN 6 THEN 'http://example.org/p%61th/' || pid
                 WHEN 7 THEN 'http://example.org?p=' || pid
                             || '&utm_source=x&a=1'
                 WHEN 8 THEN 'http://Alice@EXAMPLE.ORG:80/path/' || pid
                             || '/x%2fy'
                 WHEN 9 THEN 'mailto:user' || pid || '@example.org'
                 ELSE 'http://example.org/path/' || pid END AS url,
               CASE
                 WHEN lane = 4 THEN 'http://example.org/path/' || pid
                                    || '?a=1&b=2&utmost=9'
                 WHEN lane = 7 THEN 'http://example.org/?a=1&p=' || pid
                 WHEN lane = 8 THEN 'http://Alice@example.org/path/'
                                    || pid || '/x%2Fy'
                 WHEN lane = 9 THEN NULL
                 ELSE 'http://example.org/path/' || pid END
                 AS canonical_url,
               CASE WHEN lane = 9 THEN 'non-hierarchical' END
                 AS canonical_error
        FROM u
    )
    SELECT doc_id, url, canonical_url, canonical_error,
           CAST(COUNT(*) OVER (PARTITION BY canonical_url) AS BIGINT)
             AS group_size
    FROM m
    """,
)
def web_url_dedup(spark, sf_dir):
    """URL canonicalization + URL-level dedup (r16, tier 2 in r17) —
    the stage a crawl runs BEFORE any content hashing, so two fetches
    of the same page under cosmetically different URLs never spend
    decode/dedup IO twice.  Ten messy lanes per ``doc_id % 10``
    (uppercase scheme+host, explicit default port, trailing slash,
    tracking params wrapped around kept params — including ``utmost=``
    which a LIKE-wildcard stripper over-strips, fragment, an
    unreserved percent escape that must DECODE into the base group, a
    no-path query in the authority-then-``?`` shape, userinfo + a
    lowercase reserved escape that must UPPERCASE while ``Alice``
    survives verbatim, and a non-hierarchical ``mailto:`` that must
    quarantine with ``canonical_error`` instead of emitting garbage)
    canonicalize in pure codegen (``canonicalize_urls`` — RFC 3986 §6:
    scheme/host lowercase, :80 dropped, slash trimmed, §6.2.2 percent
    normalization, utm_*/click-ids stripped and survivors SORTED,
    fragment dropped); the group count over ``canonical_url`` is the
    dedup shape (one hash exchange on the canonical key).  The oracle
    constructs the EXPECTED canonical form literally per lane — an
    over-eager canonicalizer (dropping the kept params, case-folding
    the path or userinfo, decoding reserved escapes) and an
    under-eager one both fail the hash."""
    from pyspark.sql import Window

    urls = W.canonicalize_urls(W.as_messy_urls(
        t(spark, sf_dir, "documents")))
    return urls.withColumn(
        "group_size",
        F.count("*").over(Window.partitionBy("canonical_url")),
    )
