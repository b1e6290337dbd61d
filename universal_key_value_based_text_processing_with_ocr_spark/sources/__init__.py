"""Sources: pages-table readers and the deterministic synthetic generator."""

from .synthdocs import gen_document, gen_page_row, PAGES_SCHEMA
