"""HTML payload-stage tests: byte-exact round trip of synthetic pages plus
the FIXTURES.md §1b edge cases (empty body, split main content, nested
anchors, latin-1 charset, malformed/unclosed tags)."""

from universal_key_value_based_text_processing_with_ocr_spark.htmlcore import (
    decode_payload,
    extract_main_lines,
    page_quality_warnings,
)
from universal_key_value_based_text_processing_with_ocr_spark.sources import synthdocs


def test_roundtrip_byte_exact_all_docs():
    n_checked = 0
    for doc_id in range(300):
        doc = synthdocs.gen_document(42, doc_id)
        if doc["html"] is None:
            continue
        assert extract_main_lines(doc["html"]) == doc["_lines"], doc_id
        n_checked += 1
    assert n_checked >= 250


def test_boilerplate_fully_stripped():
    doc = synthdocs.gen_document(42, 1)
    text = "\n".join(extract_main_lines(doc["html"]))
    assert "rights reserved" not in text  # footer
    assert "function f()" not in text  # script
    assert "font:14px" not in text  # style
    assert "doc 1" not in text  # title


def test_empty_body():
    assert extract_main_lines(b"<html><body></body></html>") == []
    assert extract_main_lines(b"") == []


def test_main_content_split_across_sibling_divs():
    html = b"<body><div><p>alpha beta</p></div><div><p>gamma delta</p></div></body>"
    assert extract_main_lines(html) == ["alpha beta", "gamma delta"]


def test_nested_anchor_inside_paragraph_kept():
    # One link inside a long paragraph: low link density -> kept whole.
    html = (
        b"<body><p>this paragraph has plenty of regular prose and "
        b"<a href='/x'>one link</a> inside it which should not kill it</p></body>"
    )
    lines = extract_main_lines(html)
    assert len(lines) == 1 and "one link" in lines[0]


def test_link_list_dropped():
    html = (
        b"<body><ul>"
        b"<li><a href='/a'>alpha link</a></li>"
        b"<li><a href='/b'>beta link</a></li>"
        b"</ul><p>real content sentence here</p></body>"
    )
    assert extract_main_lines(html) == ["real content sentence here"]


def test_latin1_charset_fallback():
    html = "<body><p>caf\xe9 cr\xe8me br\xfbl\xe9e</p></body>".encode("latin-1")
    assert extract_main_lines(html) == ["café crème brûlée"]


def test_malformed_unclosed_tags():
    html = b"<body><div><p>first line<p>second line<div>third <b>line</body>"
    lines = extract_main_lines(html)
    assert "first line" in lines and "second line" in lines
    assert any("third" in ln for ln in lines)


def test_entities_unescaped():
    html = b"<body><p>a &amp; b &lt; c &gt; d</p></body>"
    assert extract_main_lines(html) == ["a & b < c > d"]


def test_decode_payload_utf8_then_latin1():
    assert decode_payload("héllo".encode("utf-8")) == "héllo"
    assert decode_payload(b"\xff\xfeplain") == "ÿþplain"


def test_quality_warnings():
    assert page_quality_warnings(None, None, None)[0].startswith("No payload")
    assert 1 in page_quality_warnings(10, None, "en")
    assert 2 in page_quality_warnings(9 * 1024 * 1024, None, "en")
    assert page_quality_warnings(1000, None, "en") == {}


def test_declared_charset_sniffed():
    body = "<p>zażółć gęślą jaźń ok</p>"
    html = ('<html><head><meta charset="iso-8859-2"></head><body>' + body + "</body></html>").encode("iso-8859-2")
    lines = extract_main_lines(html)
    assert lines == ["zażółć gęślą jaźń ok"]


def test_wrong_declared_charset_falls_back():
    html = ('<html><head><meta charset="no-such-enc"></head><body><p>héllo wörld</p></body></html>').encode("utf-8")
    assert extract_main_lines(html) == ["héllo wörld"]
