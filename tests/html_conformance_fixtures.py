"""Malformed-HTML conformance fixtures (VERDICT r2 #8).

Locks the CURRENT stdlib-html.parser behavior of
``htmlcore.extract.extract_main_lines`` byte-for-byte, so the documented
production seam (swap in lxml for real-web markup,
htmlcore/extract.py decode/parse stage) has a byte-diffable contract: run
this suite against the lxml-backed implementation and every divergence
shows up as a named fixture diff instead of silent corpus drift.

Fixture design: each entry is a worst-case markup family seen in real web
crawls.  The EXPECTED output lives in tests/golden/html_conformance.json,
regenerated via ``python tests/html_conformance_fixtures.py`` (prints the
JSON; scripts/make_golden.py also refreshes it) — regeneration is a
deliberate act that shows up in review, never an accident.

Known stdlib-vs-lxml divergences to expect when exercising the swap
(documented per VERDICT r2 #8; stated against libxml2/HTML5 semantics —
lxml is not installed here, so each is a REVIEW ITEM for the swap, and the
golden file is the stdlib side of the diff):
- truncated_mid_attribute: html.parser emits the unterminated tag TEXT
  ("<a href='unterminated") as data — it leaks into the extracted lines
  (locked in the golden); lxml drops an unterminated trailing tag.
- misnested_containers (</div> while a <p> is open): our collector pops
  only exact-tag matches off its container stack; libxml2 repairs the
  tree, which can re-parent the trailing text into a different block.
- cdata_section in non-foreign content: html.parser surfaces it via
  unknown_decl and we drop it; legacy libxml2 HTML mode may expose the
  CDATA text as content.
- charset handling: we sniff <meta charset> from the FIRST 2 KiB only and
  fall back utf-8 -> latin-1; lxml consults an XML declaration first on
  XHTML and scans further for late meta tags (fixtures: charset_*).
- textarea/title with markup payloads: html.parser switches to CDATA mode
  only for script/style, so "<p>" inside <textarea> still flushes blocks
  (locked: the textarea text appears as its own line); HTML5 parsers treat
  textarea as RCDATA and keep it verbatim.
- null bytes: kept as-is by html.parser (locked); HTML5 replaces them with
  U+FFFD.
"""

from __future__ import annotations

import json
from pathlib import Path

FIXTURES: list[tuple[str, bytes]] = [
    ("plain_paragraphs",
     b"<html><body><p>Alpha beta gamma delta epsilon.</p>"
     b"<p>Second paragraph with enough words to keep.</p></body></html>"),
    ("unclosed_paragraphs",
     b"<body><p>First paragraph never closed"
     b"<p>Second paragraph also unclosed with plenty of words here</body>"),
    ("misnested_containers",
     b"<div><p>Text opened in p but the div closes first words words words"
     b"</div></p>trailing text after stray close tag words words words"),
    ("unclosed_everything",
     b"<div><ul><li>item one words words words<li>item two words words words"),
    ("stray_close_tags",
     b"</p></div></span><p>Real content after stray closers, many words here.</p>"),
    ("charset_lie_latin1",
     # declares utf-8 but contains latin-1 bytes (0xe9 = e-acute)
     b"<meta charset='utf-8'><p>caf\xe9 au lait words words words words</p>"),
    ("charset_decl_latin1_correct",
     b"<meta charset='iso-8859-1'><p>caf\xe9 au lait words words words words</p>"),
    ("charset_unknown",
     b"<meta charset='klingon-8'><p>unknown charset words words words words</p>"),
    ("bom_utf8",
     b"\xef\xbb\xbf<p>BOM-prefixed document with several words to keep</p>"),
    ("null_bytes",
     b"<p>text with \x00 embedded null and enough words to keep it</p>"),
    ("cdata_section",
     b"<p>before cdata words words words</p><![CDATA[inside cdata]]>"
     b"<p>after cdata words words words</p>"),
    ("script_with_markup",
     b"<p>visible words words words words</p>"
     b"<script>var x = '<p>not content</p>';</script>"
     b"<p>more visible words words words</p>"),
    ("style_with_markup",
     b"<style>p::before { content: '<div>'; }</style>"
     b"<p>styled visible words words words words</p>"),
    ("textarea_markup",
     b"<textarea><p>markup inside textarea</p></textarea>"
     b"<p>outside textarea words words words words</p>"),
    ("comments_and_conditional",
     b"<!-- plain comment --><!--[if IE]><p>ie only</p><![endif]-->"
     b"<p>real content words words words words</p>"),
    ("entities_and_charrefs",
     b"<p>fish &amp; chips &#224; la carte &copy; words words</p>"),
    ("bad_entity",
     b"<p>broken &entity; and bare & ampersand words words words</p>"),
    ("nested_anchors_link_density",
     b"<div><a href='/'>nav one</a> <a href='/'>nav two</a> "
     b"<a href='/'>nav three</a></div>"
     b"<p>actual article content with many words to keep around</p>"),
    ("anchor_heavy_paragraph",
     b"<p><a href='x'>all of this paragraph is one giant link text</a></p>"),
    ("void_elements",
     b"<p>line one words words words<br><br/>line two words words words"
     b"<img src='x'></p>"),
    ("attributes_with_gt",
     b"<p data-x='a > b'>attribute contains gt sign words words words</p>"),
    ("unquoted_attributes",
     b"<p class=article>unquoted attribute words words words words</p>"),
    ("uppercase_tags",
     b"<P>UPPERCASE TAGS WITH ENOUGH WORDS TO KEEP AROUND</P>"),
    ("truncated_tag",
     b"<p>content before a truncated opening tag words words words</p><di"),
    ("truncated_mid_attribute",
     b"<p>kept words words words words</p><a href='unterminated"),
    ("doctype_and_xml_decl",
     b"<?xml version='1.0'?><!DOCTYPE html><p>after declarations words "
     b"words words words</p>"),
    ("deeply_nested",
     b"<div>" * 60 + b"<p>deep content words words words words</p>" + b"</div>" * 60),
    ("table_layout",
     b"<table><tr><td>cell one words words words</td>"
     b"<td>cell two words words words</td></tr></table>"),
    ("definition_list",
     b"<dl><dt>Term</dt><dd>Definition with enough words to keep here</dd></dl>"),
    ("empty_document", b""),
    ("whitespace_only", b"   \n\t  \n"),
    ("no_tags_at_all", b"bare text with no markup at all but plenty of words"),
    ("kv_fields_in_divs",
     b"<div>PROVINSI JAWA BARAT</div><div>Nama : BUDI SANTOSO</div>"
     b"<div>Pekerjaan : PETANI</div>"),
]

GOLDEN = Path(__file__).parent / "golden" / "html_conformance.json"


def compute() -> dict[str, list[str]]:
    import sys

    sys.path.insert(0, str(Path(__file__).parents[1]))
    from universal_key_value_based_text_processing_with_ocr_spark.htmlcore import (
        extract_main_lines,
    )

    return {name: extract_main_lines(payload) for name, payload in FIXTURES}


if __name__ == "__main__":
    print(json.dumps(compute(), indent=1, ensure_ascii=False))
