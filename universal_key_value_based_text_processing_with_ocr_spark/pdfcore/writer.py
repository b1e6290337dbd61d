"""Deterministic minimal PDF writer (PDF 1.4 subset).

Role: fixture generator and document sink for the PDF extraction stage —
the analogue of ``sources.warc.write_warc`` for the archive scan.  Every
byte is a pure function of the input text and the options, so the
extraction oracle can be reconstructed analytically from the source table
and a writer bug cannot cancel against a parser bug.

What it emits (all standard PDF 1.4, nothing exotic):

- classic cross-reference table + trailer (``xref`` / ``startxref``),
  byte-exact offsets;
- a pages tree ``Catalog -> Pages -> [Page...]``;
- one non-embedded standard-14 font, **Courier** — monospace, every glyph
  600/1000 em wide, so run x-positions are exactly computable by both the
  writer and the layout reassembler (no width-table ambiguity);
- per page one content stream using only the text operators the parser
  interprets: ``BT/ET``, ``Tf``, ``Td``, ``Tm``, ``TL``, ``T*``, ``Tj``,
  ``TJ``, ``'``; literal strings with ``\\``-escapes and hex ``<..>``
  strings both exercised;
- optional ``FlateDecode`` stream compression (zlib, stdlib).

Layout model (what makes the round-trip test the LAYOUT engine, not just
string plumbing): each text line is split into word-runs which are emitted
in a deterministically *shuffled* order with explicit ``Td`` positions —
the file's content-stream order is NOT reading order, and the extractor
must reassemble lines from glyph geometry to win byte-identity.
"""

from __future__ import annotations

import hashlib
import zlib

#: Courier glyph advance (per mille of em) — all 256 glyphs, by spec.
COURIER_WIDTH = 600

#: layout grid used by both writer and the analytic oracle
FONT_SIZE = 10
LEADING = 14
MARGIN_X = 72.0
TOP_Y = 720.0
WORDS_PER_LINE = 8
LINES_PER_PAGE = 30
WORDS_PER_RUN = 3

_CHAR_W = COURIER_WIDTH / 1000.0 * FONT_SIZE  # 6.0 pt per char


def _esc_literal(s: str) -> bytes:
    """PDF literal-string body: escape backslash and parens."""
    out = s.encode("latin-1", "replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _hex_string(s: str) -> bytes:
    return b"<" + s.encode("latin-1", "replace").hex().encode() + b">"


def _fmt(x: float) -> bytes:
    """Deterministic coordinate formatting (no float repr jitter)."""
    if x == int(x):
        return str(int(x)).encode()
    return f"{x:.2f}".encode()


def wrap_words(text: str, words_per_line: int = WORDS_PER_LINE) -> list[list[str]]:
    """Split on single spaces, fixed word count per line.

    Fixed-count (not greedy-width) wrapping keeps the line count — and so
    the page count — expressible in plain SQL for the analytic oracle:
    ``ceil(n_words / words_per_line)``.
    """
    words = text.split(" ") if text else [""]
    return [words[i : i + words_per_line] for i in range(0, len(words), words_per_line)]


def _line_runs(words: list[str]) -> list[tuple[int, str]]:
    """Split one line's words into runs of WORDS_PER_RUN words; return
    (char_offset, run_text) with offsets measured on the joined line."""
    runs = []
    offset = 0
    for i in range(0, len(words), WORDS_PER_RUN):
        chunk = " ".join(words[i : i + WORDS_PER_RUN])
        runs.append((offset, chunk))
        offset += len(chunk) + 1  # the separating space between runs
    return runs


def _shuffle_key(doc_key: str, page: int, line: int, run: int) -> str:
    return hashlib.md5(f"{doc_key}/{page}/{line}/{run}".encode()).hexdigest()


def _page_content(
    doc_key: str,
    page_no: int,
    lines: list[list[str]],
    shuffle_runs: bool = True,
) -> bytes:
    """Content stream for one page.  Emits every run with an absolute
    position; emission order is md5-shuffled so reading order must be
    recovered geometrically."""
    ops: list[tuple[str, bytes]] = []
    for li, words in enumerate(lines):
        y = TOP_Y - LEADING * li
        for ri, (char_off, run_text) in enumerate(_line_runs(words)):
            x = MARGIN_X + _CHAR_W * char_off
            sel = (page_no + li + ri) % 3
            if sel == 0:
                body = (
                    b"BT /F1 " + _fmt(FONT_SIZE) + b" Tf "
                    + _fmt(x) + b" " + _fmt(y) + b" Td ("
                    + _esc_literal(run_text) + b") Tj ET"
                )
            elif sel == 1:
                # Tm form (identity rotation, translation only) + TJ with a
                # zero kerning adjustment in the middle when splittable
                half = max(1, len(run_text) // 2)
                body = (
                    b"BT /F1 " + _fmt(FONT_SIZE) + b" Tf 1 0 0 1 "
                    + _fmt(x) + b" " + _fmt(y) + b" Tm [("
                    + _esc_literal(run_text[:half]) + b") 0 ("
                    + _esc_literal(run_text[half:]) + b")] TJ ET"
                )
            else:
                body = (
                    b"BT /F1 " + _fmt(FONT_SIZE) + b" Tf "
                    + _fmt(x) + b" " + _fmt(y) + b" Td "
                    + _hex_string(run_text) + b" Tj ET"
                )
            ops.append((_shuffle_key(doc_key, page_no, li, ri), body))
    if shuffle_runs:
        ops.sort(key=lambda kv: kv[0])
    return b"\n".join(body for _, body in ops)


def build_pdf(
    text: str,
    doc_key: str = "",
    compress: bool = False,
    shuffle_runs: bool = True,
    objstm: bool = False,
    multiline: bool = False,
) -> bytes:
    """Render ``text`` (single logical line; writer wraps it) into a
    complete, valid PDF byte string.

    ``multiline=True`` treats the input's ``\\n`` as authored line breaks
    and does NOT word-wrap — each input line becomes one PDF baseline
    (still split into shuffled 3-word runs), so
    ``extract_pdf_text(build_pdf(t, multiline=True))`` == ``t`` exactly.

    ``objstm=True`` emits the PDF 1.5 compressed layout instead of the
    classic one: all non-stream objects (catalog, pages tree, font, page
    dicts) packed into one ``/Type /ObjStm`` object stream, referenced by
    a ``/Type /XRef`` cross-reference STREAM (``W [1 4 2]``, type-2
    entries for the compressed objects) — no classic ``xref`` table or
    ``trailer`` keyword anywhere, which is how most post-2005 PDFs ship.

    Deterministic: identical inputs -> identical bytes (run shuffle is
    md5-keyed on ``doc_key``, no wall clock, no randomness).
    """
    if multiline:
        lines = [l.split(" ") for l in text.split("\n")] if text else [[""]]
    else:
        lines = wrap_words(text)
    pages = [lines[i : i + LINES_PER_PAGE] for i in range(0, len(lines), LINES_PER_PAGE)]
    if not pages:
        pages = [[[""]]]

    n_pages = len(pages)
    # object layout: 1=Catalog, 2=Pages, 3=Font, then per page i:
    # (4+2i)=Page, (5+2i)=Contents
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = b"[" + b" ".join(b"%d 0 R" % pid for pid in page_obj_ids) + b"]"
    plain: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % n_pages,
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
    }
    streams: dict[int, bytes] = {}
    for i, page_lines in enumerate(pages):
        content = _page_content(doc_key, i, page_lines, shuffle_runs)
        filt = b""
        if compress:
            content = zlib.compress(content, 6)
            filt = b" /Filter /FlateDecode"
        plain[4 + 2 * i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % (5 + 2 * i)
        )
        streams[5 + 2 * i] = (
            b"<< /Length %d%s >>\nstream\n" % (len(content), filt)
            + content
            + b"\nendstream"
        )

    if not objstm:
        objects = [body for _, body in sorted({**plain, **streams}.items())]
        out = bytearray(b"%PDF-1.4\n%\xc3\xa4\xc3\xbc\xc3\xb6\n")
        offsets = [0]
        for num, body in enumerate(objects, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 %d\n" % (len(objects) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_at)
        )
        return bytes(out)

    # ---- PDF 1.5 compressed layout: ObjStm + XRef stream ----
    stm_id = 4 + 2 * n_pages
    xref_id = stm_id + 1
    packed_nums = sorted(plain)
    bodies = [plain[n] for n in packed_nums]
    first_offsets: list[int] = []
    acc = 0
    for b in bodies:
        first_offsets.append(acc)
        acc += len(b) + 1  # single space between packed objects
    header = b" ".join(
        b"%d %d" % (n, off) for n, off in zip(packed_nums, first_offsets)
    ) + b"\n"
    objstm_payload = header + b" ".join(bodies)
    stm_filt = b""
    if compress:
        objstm_payload = zlib.compress(objstm_payload, 6)
        stm_filt = b" /Filter /FlateDecode"
    objstm_body = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d%s >>\nstream\n"
        % (len(packed_nums), len(header), len(objstm_payload), stm_filt)
        + objstm_payload
        + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xc3\xa4\xc3\xbc\xc3\xb6\n")
    offsets_by_num: dict[int, int] = {}
    for num in sorted(streams) + [stm_id]:
        body = streams.get(num, objstm_body)
        offsets_by_num[num] = len(out)
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"

    # XRef stream: W [1 4 2]; entries for objects 0..xref_id
    rows = bytearray()
    for num in range(xref_id + 1):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in offsets_by_num:
            t, f2, f3 = 1, offsets_by_num[num], 0
        elif num in packed_nums:
            t, f2, f3 = 2, stm_id, packed_nums.index(num)
        else:  # the xref stream itself
            t, f2, f3 = 1, len(out), 0
        rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    xref_body = (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R /Length %d >>\nstream\n"
        % (xref_id + 1, len(rows))
        + bytes(rows)
        + b"\nendstream"
    )
    xref_at = len(out)
    out += b"%d 0 obj\n" % xref_id + xref_body + b"\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)
