"""Mixed-modality payload routing: one ingest stage for html, PDF and
plain-text payloads.

A real crawl table carries whatever the server returned — text/html,
application/pdf, text/plain — in one binary column.  This stage is the
dispatch the north star's "universal" extraction implies: sniff each
payload's magic bytes and run the matching extraction modality
(``htmlcore`` densitometry strip / ``pdfcore`` layout parse / raw line
split), emitting a uniform (modality, text) row per document.  The
reference's analogue is its dual image-vs-``doc_str`` source dispatch
(/root/reference/ocrfw/postprocessing.py:403-409).

Scale shape: sniff + extract is ONE narrow Arrow ``mapInPandas`` stage —
no shuffle, fuses with the scan; per-row containment as everywhere (a
payload that defeats its parser yields empty text, never a failed task).
"""

from __future__ import annotations

import html as _htmlmod
from collections.abc import Iterator

import pandas as pd

ROUTED_SCHEMA = "doc_id long, modality string, text string"

#: html-ish leading bytes after whitespace strip; beyond these, any
#: TAG-LIKE opener ('<' + ascii letter / '!' / '?' / '/') routes to html
#: so fragments ('<div>...') still hit the markup path.  A bare '<'
#: followed by anything else ('<3 so cool', '< 5% CTR') is text — the
#: old rule had a bare b"<" in this tuple, which made every other entry
#: dead code and markup'd any payload whose first byte was '<' (review
#: finding).
_HTML_PREFIXES = (b"<!doctype", b"<html", b"<head", b"<body", b"<?xml")
_TAG_OPENERS = b"abcdefghijklmnopqrstuvwxyz!?/"


def sniff_modality(payload: bytes) -> str:
    """Magic-byte dispatch: 'pdf' | 'html' | 'text' (default)."""
    if payload.startswith(b"%PDF-"):
        return "pdf"
    head = payload[:256].lstrip(b"\r\n\t ").lower()
    if head.startswith(_HTML_PREFIXES):
        return "html"
    if head[:1] == b"<" and head[1:2] and head[1:2] in _TAG_OPENERS:
        return "html"
    return "text"


def _extract_one(payload: bytes, line_sep: str) -> tuple[str, str]:
    from ..htmlcore.extract import extract_main_lines
    from ..pdfcore.parse import parse_pdf_pages

    modality = sniff_modality(payload)
    try:
        if modality == "pdf":
            pages = parse_pdf_pages(payload)
            text = line_sep.join(line_sep.join(p) for p in pages if p)
        elif modality == "html":
            text = line_sep.join(extract_main_lines(payload))
        else:
            text = payload.decode("utf-8", "replace")
    except Exception:  # per-row containment (100 TB policy)
        text = ""
    return modality, text


def route_extract(payloads_df, line_sep: str = " "):
    """(doc_id, payload binary) -> (doc_id, modality, text): sniff each
    payload and extract with the matching modality engine."""
    pruned = payloads_df.select("doc_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, modalities, texts = [], [], []
            for row in batch.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                modality, text = _extract_one(payload, line_sep)
                ids.append(int(row.doc_id))
                modalities.append(modality)
                texts.append(text)
            yield pd.DataFrame(
                {"doc_id": ids, "modality": modalities, "text": texts}
            )

    return pruned.mapInPandas(gen, schema=ROUTED_SCHEMA)


MIXED_SCHEMA = "doc_id long, payload binary"


def render_mixed_payloads(docs_df):
    """Deterministic mixed-modality fixture: doc_id%3 picks the payload
    encoding of each document's text — 0 -> PDF (pdfcore writer, shuffled
    runs, even ids compressed), 1 -> raw utf-8 text, 2 -> html (the
    clean-template render whose densitometry extraction is the identity;
    8-words-per-line to match the PDF wrap so the oracle is one CASE).
    Pure function of (doc_id, text): the analytic oracle reconstructs the
    routed output without touching any renderer or parser."""
    from ..pdfcore.writer import WORDS_PER_LINE, build_pdf, wrap_words

    from ..plans.partitioning import widen_small_scan

    # render is CPU-bound per row — spread single-split scans (identity at
    # real scale, see widen_small_scan)
    pruned = widen_small_scan(docs_df.select("doc_id", "text"), "doc_id")

    def render(doc_id: int, text: str) -> bytes:
        mode = doc_id % 3
        if mode == 0:
            return build_pdf(text, doc_key=str(doc_id), compress=doc_id % 2 == 0)
        if mode == 1:
            return text.encode("utf-8")
        lines = [" ".join(w) for w in wrap_words(text, WORDS_PER_LINE)]
        body = "".join(f"<p>{_htmlmod.escape(l)}</p>" for l in lines)
        return (
            "<html><head><title>doc</title></head>"
            f"<body><nav><a href=\"/\">home</a></nav>{body}</body></html>"
        ).encode("utf-8")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, blobs = [], []
            for row in batch.itertuples(index=False):
                i = int(row.doc_id)
                ids.append(i)
                blobs.append(render(i, row.text or ""))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return pruned.mapInPandas(gen, schema=MIXED_SCHEMA)
