"""pdfcore: writer/parser round-trip, layout reassembly, hostile inputs.

The byte-identity contract under test: for any single-line ASCII text,
``extract_pdf_text(build_pdf(text))`` re-joined with spaces equals the
text exactly — through shuffled run emission, FlateDecode, hex strings,
TJ kerning splits and multi-page wrapping.
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from universal_key_value_based_text_processing_with_ocr_spark.pdfcore import (
    build_pdf,
    extract_pdf_text,
    parse_pdf_pages,
)
from universal_key_value_based_text_processing_with_ocr_spark.pdfcore.writer import (
    LINES_PER_PAGE,
    WORDS_PER_LINE,
    wrap_words,
)


def _roundtrip(text: str, **kw) -> str:
    return extract_pdf_text(build_pdf(text, doc_key="t", **kw)).replace("\n", " ")


class TestRoundTrip:
    def test_simple(self):
        t = "the quick brown fox jumps over the lazy dog again and again"
        assert _roundtrip(t) == t

    def test_compressed(self):
        t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        assert _roundtrip(t, compress=True) == t

    def test_multi_page_count(self):
        words_per_page = WORDS_PER_LINE * LINES_PER_PAGE
        t = " ".join(f"w{i}" for i in range(2 * words_per_page + 5))
        pdf = build_pdf(t, doc_key="t", compress=True)
        assert len(parse_pdf_pages(pdf)) == 3
        assert _roundtrip(t, compress=True) == t

    def test_parens_and_backslash(self):
        t = r"par(en) close) back\slash (open \\double"
        assert _roundtrip(t) == t

    def test_consecutive_spaces_preserved(self):
        # split(' ') yields empty words; the geometric gap logic must
        # rebuild the exact space run
        t = "a  b   c    d"
        assert _roundtrip(t) == t

    def test_empty_text_one_page_no_text(self):
        pdf = build_pdf("", doc_key="t")
        assert parse_pdf_pages(pdf) == [[]]
        assert extract_pdf_text(pdf) == ""

    def test_line_structure_matches_wrap(self):
        t = " ".join(f"tok{i}" for i in range(20))
        got = extract_pdf_text(build_pdf(t, doc_key="t"))
        assert got.split("\n") == [" ".join(w) for w in wrap_words(t)]


class TestLayout:
    def test_shuffle_is_real_and_harmless(self):
        """The fixture writer must NOT emit runs in reading order (else the
        round-trip would not prove the layout engine), yet extraction is
        identical with shuffling on and off."""
        t = " ".join(f"word{i}" for i in range(40))
        shuffled = build_pdf(t, doc_key="t", shuffle_runs=True)
        ordered = build_pdf(t, doc_key="t", shuffle_runs=False)
        assert shuffled != ordered  # stream order genuinely differs
        assert extract_pdf_text(shuffled) == extract_pdf_text(ordered)

    def test_deterministic_bytes(self):
        t = "same input same bytes every time"
        assert build_pdf(t, doc_key="k") == build_pdf(t, doc_key="k")
        assert build_pdf(t, doc_key="k") != build_pdf(t, doc_key="other")

    def test_all_three_operator_forms_present(self):
        # writer alternates Td+Tj literal, Tm+TJ split, Td+hex Tj
        t = " ".join(f"w{i}" for i in range(40))
        pdf = build_pdf(t, doc_key="t", shuffle_runs=False)
        assert b" Td (" in pdf and b"] TJ" in pdf and b"> Tj" in pdf


class TestMultiline:
    """multiline=True: authored \\n are baselines, no word-wrap."""

    def test_exact_roundtrip_with_newlines(self):
        t = "PROVINSI JAW4 TIMUR\nN1K :359814l50766714O\nGol darah  :  O\nRTRW: 005/005"
        for objstm in (False, True):
            pdf = build_pdf(t, doc_key="m", compress=True, objstm=objstm, multiline=True)
            assert extract_pdf_text(pdf) == t

    def test_pagination_at_30_lines(self):
        t = "\n".join(f"line {i} words here" for i in range(65))
        pdf = build_pdf(t, doc_key="m", multiline=True)
        assert len(parse_pdf_pages(pdf)) == 3
        assert extract_pdf_text(pdf) == t

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.text(
                    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                    min_size=1,
                    max_size=10,
                ),
                min_size=1,
                max_size=12,
            ).map(" ".join),
            min_size=1,
            max_size=40,
        )
    )
    def test_multiline_property(self, lines):
        t = "\n".join(lines)
        pdf = build_pdf(t, doc_key="m", multiline=True)
        assert extract_pdf_text(pdf) == t


class TestObjStm:
    """PDF 1.5 compressed layout: ObjStm + XRef stream, no trailer."""

    def test_roundtrip_both_compressions(self):
        t = "objstm words one two three four five six seven eight nine ten"
        for compress in (False, True):
            pdf = build_pdf(t, doc_key="o", compress=compress, objstm=True)
            assert b"trailer" not in pdf
            assert b"/ObjStm" in pdf and b"/Type /XRef" in pdf
            assert extract_pdf_text(pdf).replace("\n", " ") == t

    def test_multi_page(self):
        t = " ".join(f"w{i}" for i in range(600))
        pdf = build_pdf(t, doc_key="o", compress=True, objstm=True)
        assert len(parse_pdf_pages(pdf)) == 3
        assert extract_pdf_text(pdf).replace("\n", " ") == t

    def test_truncation_sweep(self):
        pdf = build_pdf("truncate me please", doc_key="o", compress=True, objstm=True)
        for cut in range(0, len(pdf), 67):
            parse_pdf_pages(pdf[:cut])  # must not raise

    def test_toplevel_overrides_embedded(self):
        """Incremental-update precedence: an uncompressed redefinition of
        an ObjStm-packed object wins."""
        base = build_pdf("compressed original", doc_key="o", objstm=True, shuffle_runs=False)
        # object 4 is the (packed) page dict; append an uncompressed page
        # pointing at a new content stream
        new = b"BT /F1 10 Tf 72 720 Td (updated text) Tj ET"
        update = (
            b"\n4 0 obj\n<< /Type /Page /Parent 2 0 R "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 99 0 R >>\nendobj\n"
            + (b"99 0 obj\n<< /Length %d >>\nstream\n" % len(new))
            + new
            + b"\nendstream\nendobj\n"
        )
        assert extract_pdf_text(base + update) == "updated text"

    def test_corrupt_objstm_contained(self):
        pdf = build_pdf("will corrupt", doc_key="o", compress=True, objstm=True)
        i = pdf.index(b"/ObjStm")
        j = pdf.index(b"stream\n", i) + 7
        broken = pdf[:j] + b"\xde\xad\xbe\xef" + pdf[j + 4 :]
        parse_pdf_pages(broken)  # must not raise (inflate fails -> no text)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=120,
    ),
    st.booleans(),
    st.booleans(),
)
def test_roundtrip_property(words, compress, objstm):
    t = " ".join(words)
    assert _roundtrip(t, compress=compress, objstm=objstm) == t


class TestHostile:
    def test_truncation_sweep_never_raises(self):
        pdf = build_pdf("some truncated document body here", doc_key="t", compress=True)
        for cut in range(0, len(pdf), 53):
            parse_pdf_pages(pdf[:cut])  # must not raise

    def test_garbage(self):
        assert parse_pdf_pages(b"") == []
        assert parse_pdf_pages(b"%PDF-1.4 but nothing else") == []
        assert parse_pdf_pages(bytes(range(256)) * 10) == []

    def test_kids_cycle_is_contained(self):
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [2 0 R 3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length 26 >>\nstream\n"
            b"BT /F1 10 Tf (ok) Tj ET\nendstream\nendobj\n"
        )
        pages = parse_pdf_pages(pdf)
        assert len(pages) == 1 and pages[0] == ["ok"]

    def test_zlib_bomb_capped(self):
        from universal_key_value_based_text_processing_with_ocr_spark.pdfcore import parse

        bomb = zlib.compress(b"\x00" * (parse.MAX_INFLATED_BYTES + 1024), 9)
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
            + (b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(bomb))
            + bomb
            + b"\nendstream\nendobj\n"
        )
        assert parse_pdf_pages(pdf) == [[]]  # page kept, bomb yields no text

    def test_corrupt_length_recovers_via_endstream(self):
        pdf = build_pdf("length field lies below", doc_key="t")
        # corrupt every /Length value to an absurd number
        import re

        broken = re.sub(rb"/Length \d+", b"/Length 999999999", pdf)
        assert extract_pdf_text(broken).replace("\n", " ") == "length field lies below"

    def test_missing_catalog_page_scan_fallback(self):
        pdf = (
            b"%PDF-1.4\n"
            b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length 29 >>\nstream\n"
            b"BT /F1 10 Tf (orphan) Tj ET\nendstream\nendobj\n"
        )
        assert parse_pdf_pages(pdf) == [["orphan"]]

    def test_incremental_update_latest_object_wins(self):
        base = build_pdf("old text here", doc_key="t", shuffle_runs=False)
        # append a replacement content stream for object 5 (the first
        # page's /Contents in the writer's layout)
        new = b"BT /F1 10 Tf 72 720 Td (new text here) Tj ET"
        update = (
            b"\n5 0 obj\n<< /Length %d >>\nstream\n" % len(new)
            + new
            + b"\nendstream\nendobj\n"
        )
        got = extract_pdf_text(base + update)
        assert got == "new text here"


from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401


class TestSparkOperator:
    def test_render_extract_roundtrip(self, spark):
        import pandas as pd

        from universal_key_value_based_text_processing_with_ocr_spark.operators.pdfdocs import (
            extract_pdf_docs,
            render_pdfs,
        )

        texts = [
            "spark pdf stage one two three four five six seven eight nine",
            "a  b   double space payload",
            "",
            r"escape (heavy) \ payload",
        ]
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        out = (
            extract_pdf_docs(render_pdfs(docs), line_sep=" ")
            .orderBy("doc_id")
            .collect()
        )
        assert [r.text for r in out] == texts
        assert all(r.n_pages == 1 for r in out)

    def test_null_payload_contained(self, spark):
        import pandas as pd

        from universal_key_value_based_text_processing_with_ocr_spark.operators.pdfdocs import (
            extract_pdf_docs,
        )

        pdf_df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "pdf": [None, b"junk"]}),
            schema="doc_id long, pdf binary",
        )
        rows = extract_pdf_docs(pdf_df).orderBy("doc_id").collect()
        assert [(r.n_pages, r.text) for r in rows] == [(0, ""), (0, "")]

    def test_plan_is_narrow(self, spark):
        """Two fused Arrow stages, no Exchange anywhere."""
        import pandas as pd

        from universal_key_value_based_text_processing_with_ocr_spark.operators.pdfdocs import (
            extract_pdf_docs,
            render_pdfs,
        )

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["x"]})
        )
        plan = (
            extract_pdf_docs(render_pdfs(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
