"""From-scratch PDF layout-text extraction (the north rule's "PDF/layout
parse" clause).

``writer`` renders text into deterministic minimal PDF 1.4 bytes (the
fixture generator and archive sink); ``parse`` is the hostile-input-
tolerant extractor that tokenizes PDF objects, inflates content streams
under caps, interprets the BT/ET text operators, and reassembles reading
order from glyph positions (y-major, x-minor) — the same role the
densitometry HTML extractor plays for html payloads (``..htmlcore``) and
the reference's OCR plays for scanned images
(/root/reference/ocrfw/ocr.py:9-44).
"""

from .parse import extract_pdf_text, parse_pdf_pages
from .writer import build_pdf

__all__ = ["build_pdf", "extract_pdf_text", "parse_pdf_pages"]
