"""HTML payload stage: bytes -> DOM blocks -> boilerplate strip -> lines."""

from .extract import (
    decode_payload,
    extract_blocks,
    extract_main_lines,
    page_quality_warnings,
)
