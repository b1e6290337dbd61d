"""HTML -> main-content lines (the graft's payload-decode stage).

Role-equivalent of the reference's image preprocessing + OCR front-end
(``preprocessing3`` + ``ocr0``, /root/reference/ocrfw/preprocessing.py:461-494
and /root/reference/ocrfw/ocr.py:15-16): payload -> clean ordered text lines.
The box-grouping geometry of ``get_line_boxes``
(/root/reference/ocrfw/ocr.py:26-85) maps to DOM block grouping; the
box-size predicate (:48-50) maps to the text/link-density thresholds; the
image-quality warnings (``get_warning_image``,
/root/reference/ocrfw/preprocessing.py:115-135) map to payload-quality
warnings below.

Implementation: stdlib ``html.parser`` (lxml is the production drop-in — a
single ``extract_blocks`` seam to swap; this container has no lxml).  All of
this runs inside a vectorised ``mapInPandas`` stage on Arrow batches; it is
deliberately dependency-free, deterministic and per-row pure.

Boilerplate model (CleanEval/boilerpipe-style densitometry, public
literature; e.g. Kohlschütter et al., "Boilerplate Detection using Shallow
Text Features", WSDM 2010):
- kill subtrees of non-content containers: script/style/template/noscript/
  head/nav/footer/header/aside/form/iframe/svg,
- group text into blocks at block-level element boundaries,
- per block compute text length and link-char ratio,
- keep blocks with link_density <= 0.33 that either have >= 2 words or live
  in a <p>-like container; drop the rest.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_KILL_TAGS = frozenset(
    "script style template noscript head nav footer header aside form iframe svg".split()
)
_BLOCK_TAGS = frozenset(
    "p div section article main li ul ol table tr td th h1 h2 h3 h4 h5 h6 "
    "blockquote pre br hr body dl dt dd figure figcaption".split()
)
_CONTENT_TAGS = frozenset("p h1 h2 h3 h4 h5 h6 blockquote pre td li dd".split())

MAX_LINK_DENSITY = 0.33
MIN_WORDS = 2


class _BlockCollector(HTMLParser):
    """Single-pass DOM walk collecting text blocks with link-char counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._kill_depth = 0
        self._anchor_depth = 0
        self._container = ""
        self._container_stack: list[str] = []

    # -- block lifecycle --
    def _flush(self) -> None:
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append(
                {
                    "text": text,
                    "n_chars": self._total_chars,
                    "link_chars": self._link_chars,
                    "container": self._container,
                }
            )
        self._buf = []
        self._link_chars = 0
        self._total_chars = 0

    # -- parser hooks --
    def handle_starttag(self, tag, attrs):
        if tag in _KILL_TAGS:
            self._kill_depth += 1
            return
        if self._kill_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            self._container_stack.append(tag)
            self._container = tag

    def handle_endtag(self, tag):
        if tag in _KILL_TAGS:
            self._kill_depth = max(0, self._kill_depth - 1)
            return
        if self._kill_depth:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()
            if self._container_stack and self._container_stack[-1] == tag:
                self._container_stack.pop()
            self._container = self._container_stack[-1] if self._container_stack else ""

    def handle_data(self, data):
        if self._kill_depth or not data:
            return
        self._buf.append(data)
        n = len(data)
        self._total_chars += n
        if self._anchor_depth:
            self._link_chars += n


_CHARSET_DECL = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)")


def decode_payload(payload: bytes) -> str:
    """bytes -> str: declared-charset sniff, then utf-8, then latin-1.

    The charset declaration (``<meta charset=...>`` or a Content-Type meta)
    is sniffed from the first 2 KiB; a wrong or unknown declaration falls
    through to the utf-8/latin-1 chain (latin-1 never fails, so decoding is
    total)."""
    m = _CHARSET_DECL.search(payload[:2048])
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        if name not in ("utf-8", "utf8"):
            try:
                return payload.decode(name)
            except (LookupError, UnicodeDecodeError, ValueError):
                pass
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("latin-1")


def extract_blocks(html_text: str) -> list[dict]:
    """Parse HTML into ordered text blocks with densitometry stats."""
    collector = _BlockCollector()
    try:
        collector.feed(html_text)
        collector.close()
    except Exception:
        # Malformed beyond the tolerant parser: keep whatever was collected.
        pass
    collector._flush()
    return collector.blocks


def _keep(block: dict) -> bool:
    n = block["n_chars"]
    if n == 0:
        return False
    link_density = block["link_chars"] / n
    if link_density > MAX_LINK_DENSITY:
        return False
    words = len(block["text"].split())
    return words >= MIN_WORDS or block["container"] in _CONTENT_TAGS


def extract_main_lines(payload: bytes) -> list[str]:
    """Main-content lines of an HTML payload, in document order.

    Each kept block contributes its stripped text as one line; the document's
    extracted text is these lines joined by '\\n' (byte-identity target)."""
    html_text = decode_payload(payload)
    return [b["text"].strip() for b in extract_blocks(html_text) if _keep(b)]


def page_quality_warnings(
    html_len: int | None,
    text_len: int | None,
    lang: str | None,
    min_bytes: int = 64,
    max_bytes: int = 8 * 1024 * 1024,
) -> dict:
    """Payload-quality predicates -> warning dict (the web-page analog of the
    reference's image-quality warnings)."""
    warning: dict = {}
    if html_len is None and text_len is None:
        warning[0] = "No payload: both html and text are NULL"
    if html_len is not None and html_len < min_bytes:
        warning[1] = f"html payload too small: {html_len} < {min_bytes}"
    if html_len is not None and html_len > max_bytes:
        warning[2] = f"html payload too large: {html_len} > {max_bytes}"
    if not lang:
        warning[3] = "lang missing"
    return warning
