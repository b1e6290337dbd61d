"""PDF document rendering + layout-text extraction as Spark stages.

The north rule names "PDF/layout parse" next to HTML boilerplate strip as
an extraction modality; this module is that modality's Spark plumbing:

- ``render_pdfs(docs)``: (doc_id, text) -> (doc_id, pdf binary) via one
  narrow Arrow ``mapInPandas`` stage running ``pdfcore.writer`` on the
  executors (the fixture sink — a deterministic stand-in for the crawl's
  application/pdf payloads, exactly how ``api._warc_fixture_dir`` stands
  in for real WARC archives).
- ``extract_pdf_docs(df)``: (doc_id, pdf binary) -> (doc_id, n_pages,
  text) via a second narrow ``mapInPandas`` stage running
  ``pdfcore.parse`` — object scan, capped inflate, text-operator
  interpretation, geometric reading-order reassembly.

Scale shape: both stages are narrow (no shuffle) and fuse with the scan;
per-document work is bounded by pdfcore's hostile-input caps, and a
poisoned payload yields an empty extraction rather than a failed task —
the same per-row containment contract as ``operators.extract``.

Symmetry-breaking: the writer emits runs in md5-shuffled order with
absolute positions, so extraction equality with the source text proves
the geometric layout engine, and the oracle reconstructs expected
(n_pages, text) analytically from the source table — a writer/parser bug
pair cannot cancel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

PDF_SCHEMA = "doc_id long, pdf binary"
PDF_TEXT_SCHEMA = "doc_id long, n_pages int, text string"


def render_pdfs(docs_df, vary_layout: bool = True):
    """(doc_id, text, ...) -> (doc_id, pdf).  ``doc_id % 4`` cycles through
    all four layout combinations — FlateDecode on/off × classic-xref vs
    PDF 1.5 ObjStm+XRef-stream — so one distributed job exercises every
    decode path the parser has."""
    from ..pdfcore.writer import build_pdf
    from ..plans.partitioning import widen_small_scan

    # render is CPU-bound per row — spread single-split scans (identity
    # at real scale, see widen_small_scan)
    pruned = widen_small_scan(docs_df.select("doc_id", "text"), "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for row in pdf.itertuples(index=False):
                i = int(row.doc_id)
                ids.append(i)
                blobs.append(
                    build_pdf(
                        row.text or "",
                        doc_key=str(i),
                        compress=vary_layout and i % 2 == 0,
                        objstm=vary_layout and i % 4 < 2,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "pdf": blobs})

    return pruned.mapInPandas(gen, schema=PDF_SCHEMA)


def extract_pdf_docs(pdf_df, line_sep: str = "\n"):
    """(doc_id, pdf) -> (doc_id, n_pages, text): layout-ordered text per
    document, lines joined by ``line_sep``.  Malformed payloads produce
    (0 pages, '') — never an executor error."""
    from ..pdfcore.parse import parse_pdf_pages

    pruned = pdf_df.select("doc_id", "pdf")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, npages, texts = [], [], []
            for row in batch.itertuples(index=False):
                pages = parse_pdf_pages(bytes(row.pdf) if row.pdf is not None else b"")
                ids.append(int(row.doc_id))
                npages.append(len(pages))
                texts.append(line_sep.join(line_sep.join(p) for p in pages if p))
            yield pd.DataFrame({"doc_id": ids, "n_pages": npages, "text": texts})

    return pruned.mapInPandas(gen, schema=PDF_TEXT_SCHEMA)


URL_PDF_SCHEMA = "url string, lang string, pdf binary"
URL_TEXT_SCHEMA = "url string, lang string, text string"


def render_pdfs_by_url(df):
    """(url, lang, text) -> (url, lang, pdf): multiline render (authored
    ``\\n`` line breaks preserved as baselines); layout combo — compress x
    objstm — keyed on md5(url) so the mix is deterministic but
    uncorrelated with content."""
    import hashlib

    from ..pdfcore.writer import build_pdf
    from ..plans.partitioning import widen_small_scan

    pruned = widen_small_scan(df.select("url", "lang", "text"), "url")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            urls, langs, blobs = [], [], []
            for row in batch.itertuples(index=False):
                h = int(hashlib.md5(row.url.encode()).hexdigest()[-1], 16)
                urls.append(row.url)
                langs.append(row.lang)
                blobs.append(
                    build_pdf(
                        row.text or "",
                        doc_key=row.url,
                        compress=h % 2 == 0,
                        objstm=h % 4 < 2,
                        multiline=True,
                    )
                )
            yield pd.DataFrame({"url": urls, "lang": langs, "pdf": blobs})

    return pruned.mapInPandas(gen, schema=URL_PDF_SCHEMA)


def extract_pdf_text_by_url(pdf_df):
    """(url, lang, pdf) -> (url, lang, text): layout-ordered document text
    with ``\\n`` line joins (the multiline inverse)."""
    from ..pdfcore.parse import parse_pdf_pages

    pruned = pdf_df.select("url", "lang", "pdf")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            urls, langs, texts = [], [], []
            for row in batch.itertuples(index=False):
                pages = parse_pdf_pages(bytes(row.pdf) if row.pdf is not None else b"")
                urls.append(row.url)
                langs.append(row.lang)
                texts.append("\n".join("\n".join(p) for p in pages if p))
            yield pd.DataFrame({"url": urls, "lang": langs, "text": texts})

    return pruned.mapInPandas(gen, schema=URL_TEXT_SCHEMA)
