"""The extraction pipeline: pages DataFrame -> results DataFrame.

Physical shape (SURVEY.md §3/§4): one up-front salted repartition (the only
shuffle), then ONE fused narrow ``mapInPandas`` stage that does
payload-decode (html -> lines, or the text column's doc_str path —
/root/reference/ocrfw/postprocessing.py:407-409) and the per-document
key-value sweep, Arrow-batched end to end.  No collects, no driver loops; a
row never needs another row, so the stage scales linearly with partitions.

Output schema is fixed and byte-stable:
    url string, lang string, extracted_text string, result_json string,
    success boolean, n_lines int, n_fields int,
    error_messages array<string>, warnings array<string>, n_bytes long

``result_json`` is the canonical serialization of the reference-ordered
result dict (reference ocrfw/ktp.py:2140 ``json.dumps(..., default=str)``)
— the per-url byte-identity target together with ``extracted_text``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from ..htmlcore import extract_main_lines, page_quality_warnings
from ..kvcore import ktpspec
from ..kvcore.evaluate import nik_doc_budget

RESULT_SCHEMA = (
    "url string, lang string, extracted_text string, result_json string, "
    "success boolean, n_lines int, n_fields int, "
    "error_messages array<string>, warnings array<string>, n_bytes long"
)


def parse_page_row(url, html, text, lang, configs=None) -> dict:
    """Pure per-row payload: decode + sweep one page.  Shared by the Spark
    stage and the golden-oracle generator (identical bytes by construction)."""
    if html is not None:
        lines = extract_main_lines(bytes(html))
        extracted_text = "\n".join(lines)
        n_bytes = len(html)
    elif text is not None:
        extracted_text = text
        lines = text.split("\n")
        n_bytes = len(text.encode("utf-8"))
    else:
        extracted_text = None
        lines = []
        n_bytes = 0

    warning = page_quality_warnings(
        len(html) if html is not None else None,
        len(text) if text is not None else None,
        lang,
    )

    if extracted_text is not None:
        try:
            # per-document NIK work budget (ADVICE r4): armed for exactly
            # this parse and restored after, so a hostile page with
            # thousands of many-run digit lines cannot wedge an executor,
            # and no armed state leaks into a reused worker's next call
            with nik_doc_budget():
                parsed = ktpspec.parse_document(
                    extracted_text, configs=configs, warning=warning
                )
        except Exception as exc:  # malformed-doc guard (engine policy:
            # a poisoned row must not kill a 100 TB job; recorded as failure)
            parsed = {
                "success": False,
                "result": {},
                "all_error_messages": [f"engine exception: {type(exc).__name__}: {exc}"],
                "warning": warning,
            }
    else:
        parsed = {"success": False, "result": {}, "all_error_messages": ["no payload"], "warning": warning}

    return {
        "url": url,
        "lang": lang,
        "extracted_text": extracted_text,
        "result_json": json.dumps(parsed.get("result", {}), default=str),
        "success": bool(parsed.get("success", False)),
        "n_lines": len(lines),
        "n_fields": len(parsed.get("result", {})),
        "error_messages": [str(m) for m in parsed.get("all_error_messages", [])],
        "warnings": [str(v) for v in parsed.get("warning", {}).values()],
        "n_bytes": n_bytes,
    }


def _extract_batches(batches: Iterator[pd.DataFrame], configs) -> Iterator[pd.DataFrame]:
    # The pd.DataFrame(list-of-dicts) rebuild below was suspected as a
    # per-batch constant (VERDICT r2 #2); A/B vs a columnar dict-of-lists
    # build (best-of-3 interleaved, 24k docs, local[32]) measured 8.55 s vs
    # 8.43 s — within host noise, so the simpler form stays.  The stage
    # cost is the per-document semantic core, not the frame assembly.
    for pdf in batches:
        out = [
            parse_page_row(row.url, row.html, row.text, row.lang, configs)
            for row in pdf.itertuples(index=False)
        ]
        yield pd.DataFrame(
            out,
            columns=[
                "url", "lang", "extracted_text", "result_json", "success",
                "n_lines", "n_fields", "error_messages", "warnings", "n_bytes",
            ],
        )


def extract_pages(pages_df, configs=None):
    """pages(url, warc_ts, html, text, lang) -> results DataFrame.

    Column pruning: only (url, html, text, lang) enter the Arrow stage —
    keep any filters BEFORE this call so Catalyst pushes them into the scan.
    """
    pruned = pages_df.select("url", "html", "text", "lang")
    return pruned.mapInPandas(
        lambda it: _extract_batches(it, configs), schema=RESULT_SCHEMA
    )


LINES_SCHEMA = "url string, line_no int, line string"


def html_to_lines(pages_df):
    """Exploded (url, line_no, line) view of the payload-decode stage only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, nos, lines = [], [], []
            for row in pdf.itertuples(index=False):
                if row.html is not None:
                    doc_lines = extract_main_lines(bytes(row.html))
                elif row.text is not None:
                    doc_lines = row.text.split("\n")
                else:
                    doc_lines = []
                for i, ln in enumerate(doc_lines):
                    urls.append(row.url)
                    nos.append(i)
                    lines.append(ln)
            yield pd.DataFrame({"url": urls, "line_no": nos, "line": lines})

    return pages_df.select("url", "html", "text").mapInPandas(gen, schema=LINES_SCHEMA)


# --- per-document debug artifacts -------------------------------------------

DEBUG_SCHEMA = (
    "url string, lang string, success boolean, n_bytes long, "
    "n_blocks int, n_kept int, "
    "blocks array<struct<block_no:int, kept:boolean, container:string, "
    "n_chars:int, link_chars:int, link_density:double, text:string>>, "
    "extracted_text string, result_json string, error_messages array<string>"
)


def parse_page_row_debug(url, html, text, lang, configs=None, parser: str = "sweep") -> dict:
    """Per-document debug artifact — the reference ``generate_report`` analog
    (/root/reference/ocrfw/ktp.py:2066-2092 dumps original + preprocessed +
    raw-OCR + final-result files per doc).  One row carries every
    decode-stage block with its densitometry stats and keep/drop verdict plus
    the final result and error detail: everything needed to diagnose one bad
    extraction without re-running the job."""
    from ..htmlcore.extract import _keep, decode_payload, extract_blocks

    blocks_info: list[dict] = []
    if html is not None:
        for i, b in enumerate(extract_blocks(decode_payload(bytes(html)))):
            blocks_info.append(
                {
                    "block_no": i,
                    "kept": _keep(b),
                    "container": b["container"],
                    "n_chars": b["n_chars"],
                    "link_chars": b["link_chars"],
                    "link_density": round(b["link_chars"] / b["n_chars"], 6)
                    if b["n_chars"]
                    else 0.0,
                    "text": b["text"],
                }
            )
    elif text is not None:
        for i, ln in enumerate(text.split("\n")):
            blocks_info.append(
                {
                    "block_no": i, "kept": True, "container": "",
                    "n_chars": len(ln), "link_chars": 0, "link_density": 0.0,
                    "text": ln,
                }
            )

    # the final result must come from the SAME parser the job ran, or the
    # debug table diagnoses the wrong failures.  For blended/boxorder the
    # compact row wrappers discard the error detail, so the debug path goes
    # one level deeper to the kvcore entry points (same functions the
    # wrappers call -> identical result bytes) and keeps the why-it-failed
    # messages.
    if parser in ("blended", "boxorder"):
        from ..kvcore.ktpspec import parse_document_blended, parse_document_boxorder

        try:
            if parser == "boxorder":
                if html is not None:
                    blocks = [b["text"].strip() for b in blocks_info if b["kept"]]
                elif text is not None:
                    blocks = text.split("\n")
                else:
                    blocks = []
                with nik_doc_budget():
                    full = parse_document_boxorder(blocks, configs=configs)
            else:
                if html is not None:
                    doc = "\n".join(extract_main_lines(bytes(html)))
                elif text is not None:
                    doc = text
                else:
                    doc = ""
                with nik_doc_budget():
                    full = parse_document_blended(doc, configs=configs)
        except Exception as exc:
            full = {"success": False, "result": {},
                    "all_error_messages": [f"engine exception: {type(exc).__name__}: {exc}"]}
        err_msgs = full.get("all_error_messages") or (
            [full["error_message"]] if "error_message" in full else []
        )
        parsed = {
            "success": bool(full.get("success", False)),
            "result_json": json.dumps(full.get("result", {}), default=str),
            "error_messages": err_msgs,
        }
    else:
        parsed = parse_page_row(url, html, text, lang, configs)
    if html is not None:
        n_bytes = len(html)
    elif text is not None:
        n_bytes = len(text.encode("utf-8"))
    else:
        n_bytes = 0
    return {
        "url": url,
        "lang": lang,
        "success": parsed["success"],
        "n_bytes": parsed.get("n_bytes", n_bytes),
        "n_blocks": len(blocks_info),
        "n_kept": sum(1 for b in blocks_info if b["kept"]),
        "blocks": blocks_info,
        "extracted_text": parsed.get("extracted_text"),
        "result_json": parsed["result_json"],
        "error_messages": [str(m) for m in parsed.get("error_messages", [])],
    }


def extract_pages_debug(pages_df, configs=None, only_failures: bool = True, parser: str = "sweep"):
    """pages -> per-url debug rows (same fused narrow-stage shape).

    ``only_failures`` filters AFTER extraction inside the stage, so a debug
    pass over a pre-filtered failed-url subset does no wasted Arrow I/O."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "url", "lang", "success", "n_bytes", "n_blocks", "n_kept",
            "blocks", "extracted_text", "result_json", "error_messages",
        ]
        for pdf in batches:
            out = [
                parse_page_row_debug(row.url, row.html, row.text, row.lang, configs, parser)
                for row in pdf.itertuples(index=False)
            ]
            if only_failures:
                out = [r for r in out if not r["success"]]
            yield pd.DataFrame(out, columns=cols)

    return pages_df.select("url", "html", "text", "lang").mapInPandas(
        gen, schema=DEBUG_SCHEMA
    )


# --- universal custom-config extraction ------------------------------------

CUSTOM_SCHEMA = "url string, result_json string, success boolean, n_fields int"

# Demo config used by the golden-checked `custom_config_extract` query: a
# user-defined key dictionary over the same pages (kvcore/config.py format).
SAMPLE_CUSTOM_CONFIG = {
    "fields": [
        {"name": "Nama", "keys": [["Nama"]], "max_distances": [[1]],
         "min_accuracies": [0.6], "separators": [":"], "evaluators": ["letters"]},
        {"name": "Pekerjaan", "keys": [["Pekerjaan"]], "max_distances": [[2]],
         "min_accuracies": [0.6], "separators": [":"], "evaluators": ["job"],
         "tolerant_not_exists": [True]},
    ],
    "final_evaluator": None,
}


def parse_page_row_with_config(url, html, text, cfg) -> dict:
    """Pure per-row payload for user-config extraction (oracle + UDF body)."""
    from ..kvcore.config import parse_document_with_config

    try:
        if html is not None:
            doc = "\n".join(extract_main_lines(bytes(html)))
        elif text is not None:
            doc = text
        else:
            doc = ""
        with nik_doc_budget():
            parsed = parse_document_with_config(doc, cfg)
    except Exception:  # poisoned-row policy: same guard as parse_page_row —
        # one malformed document must not abort the whole job
        parsed = {"success": False, "result": {}}
    return {
        "url": url,
        "result_json": json.dumps(parsed.get("result", {}), default=str),
        "success": bool(parsed.get("success", False)),
        "n_fields": len(parsed.get("result", {})),
    }


def extract_pages_with_config(pages_df, cfg: dict):
    """pages -> per-url results under a user-defined extraction config.

    Same fused-narrow-stage physical shape as ``extract_pages``; the config
    is a plain JSON dict captured by closure (broadcast-equivalent)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                parse_page_row_with_config(row.url, row.html, row.text, cfg)
                for row in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out, columns=["url", "result_json", "success", "n_fields"])

    return pages_df.select("url", "html", "text").mapInPandas(gen, schema=CUSTOM_SCHEMA)


BLENDED_SCHEMA = "url string, result_json string, success boolean, n_fields int"


def parse_page_row_blended(url, html, text, configs=None) -> dict:
    """Two-parser blended extraction (Entry-1 structure) for one page."""
    from ..kvcore.ktpspec import parse_document_blended

    try:
        if html is not None:
            doc = "\n".join(extract_main_lines(bytes(html)))
        elif text is not None:
            doc = text
        else:
            doc = ""
        with nik_doc_budget():
            parsed = parse_document_blended(doc, configs=configs)
    except Exception as exc:
        parsed = {"success": False, "result": {},
                  "all_error_messages": [f"engine exception: {type(exc).__name__}: {exc}"]}
    return {
        "url": url,
        "result_json": json.dumps(parsed.get("result", {}), default=str),
        "success": bool(parsed.get("success", False)),
        "n_fields": len(parsed.get("result", {})),
    }


def parse_page_row_boxorder(url, html, text, configs=None) -> dict:
    """Block-order (geometry-analog, reference parse_doc_new0) extraction
    for one page: the kept htmlcore blocks ARE the boxes, in document
    order; a bare-text payload contributes one single-line block per line."""
    from ..htmlcore.extract import _keep, decode_payload, extract_blocks
    from ..kvcore.ktpspec import parse_document_boxorder

    try:
        if html is not None:
            blocks = [
                b["text"].strip()
                for b in extract_blocks(decode_payload(bytes(html)))
                if _keep(b)
            ]
        elif text is not None:
            blocks = text.split("\n")
        else:
            blocks = []
        with nik_doc_budget():
            parsed = parse_document_boxorder(blocks, configs=configs)
    except Exception:  # poisoned-row policy (incl. the reference's
        # UnboundLocalError echo quirk on never-scanned failing specs)
        parsed = {"success": False, "result": {}}
    return {
        "url": url,
        "result_json": json.dumps(parsed.get("result", {}), default=str),
        "success": bool(parsed.get("success", False)),
        "n_fields": len(parsed.get("result", {})),
    }


def extract_pages_boxorder(pages_df, configs=None):
    """pages -> block-order-sweep per-url results (third parser)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                parse_page_row_boxorder(row.url, row.html, row.text, configs)
                for row in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out, columns=["url", "result_json", "success", "n_fields"])

    return pages_df.select("url", "html", "text").mapInPandas(gen, schema=CUSTOM_SCHEMA)


def extract_pages_blended(pages_df, configs=None):
    """pages -> blended (sweep + NIK re-scan) per-url results."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                parse_page_row_blended(row.url, row.html, row.text, configs)
                for row in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out, columns=["url", "result_json", "success", "n_fields"])

    return pages_df.select("url", "html", "text").mapInPandas(gen, schema=BLENDED_SCHEMA)
