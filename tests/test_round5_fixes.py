"""Round-5 fix coverage: per-document NIK work budget, chunk-envelope
TypeError guard, encode_png error contract."""

from __future__ import annotations

import struct
import time

import pytest

from universal_key_value_based_text_processing_with_ocr_spark.kvcore import evaluate as ev
from universal_key_value_based_text_processing_with_ocr_spark.operators import imagecodec as ic
from universal_key_value_based_text_processing_with_ocr_spark.operators.extract import (
    parse_page_row,
)
from tests.test_spark_pipeline import spark  # noqa: F401  (session fixture)


@pytest.fixture
def unarmed_budget():
    """Leave the module-level budget as found (tests share the module)."""
    old = ev._nik_doc_budget[0]
    ev._nik_doc_budget[0] = None
    yield
    ev._nik_doc_budget[0] = old


def test_nik_budget_unarmed_is_exact(unarmed_budget):
    # direct library calls never arm the budget: full exact parity
    assert ev.eval_nik("3171 0102 9303 0002") == [True, [[0, ["3171010293030002"]]]]


def test_nik_budget_degrades_within_document(unarmed_budget):
    """Once a document's budget is spent, later calls use the bounded
    search instead of re-paying the exponential exact enumeration."""
    ev.reset_nik_doc_budget()
    assert ev._nik_doc_budget[0] == ev._NIK_DOC_BUDGET

    # realistic value: tiny cost, budget barely moves, result exact
    r = ev.eval_nik("3171 0102 9303 0002")
    assert r == [True, [[0, ["3171010293030002"]]]]
    assert ev._nik_doc_budget[0] >= ev._NIK_DOC_BUDGET - (1 << 5)

    # drain the budget; the next 22-run call must NOT take ~5.6 s exact
    ev._nik_doc_budget[0] = 1000
    hostile = " ".join("7" for _ in range(22))
    t0 = time.perf_counter()
    ev.eval_nik(hostile)
    assert time.perf_counter() - t0 < 1.0
    assert ev._nik_doc_budget[0] == 0

    # fully spent: bounded search visits zero nodes, returns no candidates
    assert ev.eval_nik("3171 0102 9303 0002")[0] is False


def test_nik_budget_armed_per_page_and_restored(unarmed_budget):
    """Every per-row entry point arms a FRESH budget for its own parse and
    restores the prior state after (review finding: a bare reset leaked
    armed, partially-spent state into reused workers, making results
    depend on worker history)."""
    from universal_key_value_based_text_processing_with_ocr_spark.operators.extract import (
        parse_page_row_blended,
    )

    doc = "PROVINSI DKI JAKARTA\nNIK : 3171010293030002"
    for fn in (
        lambda: parse_page_row("u", None, doc, "ind")["result_json"],
        lambda: parse_page_row_blended("u", None, doc)["result_json"],
    ):
        ev._nik_doc_budget[0] = None
        baseline = fn()
        # poisoned global state (as if a prior hostile doc spent
        # everything): the next document must parse IDENTICALLY — results
        # may not depend on worker history...
        ev._nik_doc_budget[0] = 0
        assert fn() == baseline
        # ...and the prior state is restored, not clobbered
        assert ev._nik_doc_budget[0] == 0
    # direct library calls afterwards see the unarmed default again
    ev._nik_doc_budget[0] = None
    assert ev.eval_nik("3171 0102 9303 0002")[0] is True


def test_chunk_envelope_mixed_type_column(tmp_path):
    """Schema drift re-typing a stats column between files must drop the
    column from the chunk envelope, not crash the commit (ADVICE r4)."""
    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
        SnapshotTable,
    )

    cat = SnapshotTable(str(tmp_path / "tbl"))
    entries = {
        "f1.parquet": {"rows": 10, "cols": {"a": {"min": 1, "max": 5}, "b": {"min": "x", "max": "y"}}},
        "f2.parquet": {"rows": 20, "cols": {"a": {"min": 2, "max": 9}, "b": {"min": 3, "max": 7}}},
    }
    summary = cat._write_chunk(list(entries), entries)
    assert summary["cols"]["a"] == [1, 9]
    assert "b" not in summary["cols"]  # mixed str/int bounds dropped
    assert summary["rows"] == 30


def test_encode_png_rejects_mismatched_buffer():
    with pytest.raises(ValueError, match="does not match"):
        ic.encode_png(4, 4, bytes(5), color_type=0)


def test_chunk_envelope_mixed_type_single_column(tmp_path):
    """The legacy single-column envelope hits the same mixed-type drift as
    the cols envelope and must also degrade instead of crashing."""
    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
        SnapshotTable,
    )

    cat = SnapshotTable(str(tmp_path / "tbl"))
    entries = {
        "f1.parquet": {"rows": 1, "column": "ts", "min": "2020-01-01", "max": "2020-01-02"},
        "f2.parquet": {"rows": 2, "column": "ts", "min": 5, "max": 9},
    }
    summary = cat._write_chunk(list(entries), entries)
    assert "min" not in summary and "max" not in summary  # degraded, not crashed
    assert summary["rows"] == 3


def test_sniff_png_rejects_spec_violating_dims():
    """PNG dims above the spec's 2^31-1 cap are invalid and would overflow
    the int32 metadata schema — the sniff must return None."""
    ihdr = struct.pack(">IIBBBBB", 0x80000000, 5, 8, 0, 0, 0, 0)
    assert ic.sniff_image_meta(ic.PNG_SIG + ic._chunk(b"IHDR", ihdr)) is None
    ihdr = struct.pack(">IIBBBBB", 5, 0xFFFFFFFF, 8, 0, 0, 0, 0)
    assert ic.sniff_image_meta(ic.PNG_SIG + ic._chunk(b"IHDR", ihdr)) is None


def test_c4_line_clean_rules(spark):  # noqa: F811
    """Every C4 rule branch on crafted pages: terminal punctuation,
    min-words-per-line, javascript line drop, lorem-ipsum / brace / null
    page gates, sentence-count proxy, and the kept-line reassembly."""
    from universal_key_value_based_text_processing_with_ocr_spark.operators.textstats import (
        c4_line_clean,
    )

    good = (
        "the quick brown fox jumps over the lazy dog.\n"
        "short line.\n"                       # < 5 words -> dropped
        "no terminal punctuation on this line\n"  # no [.!?"] -> dropped
        "is this a question with enough words?\n"
        'he said "quote ends the line here"\n'
        "please enable javascript to read this article now.\n"  # js -> dropped
        "one more proper sentence closes the page!"
    )
    rows = [
        (0, good),
        (1, "lorem ipsum dolor sit amet and more filler here.\n" * 5),
        (2, "var x = function() { return 1; }\n" + good),
        (3, "only one good sentence lives on this page today.\n"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_line_clean(df).collect()}

    assert out[0].keep and out[0].fail_reason == "ok" and out[0].n_lines_kept == 4
    assert out[0].clean_text == (
        "the quick brown fox jumps over the lazy dog.\n"
        "is this a question with enough words?\n"
        'he said "quote ends the line here"\n'
        "one more proper sentence closes the page!"
    )
    assert not out[1].keep and out[1].fail_reason == "lorem_ipsum"
    assert not out[2].keep and out[2].fail_reason == "brace"
    assert not out[3].keep and out[3].fail_reason == "too_few_sentences"
    assert out[3].n_lines_kept == 1
    assert not out[4].keep and out[4].fail_reason == "null_text"
    assert out[4].n_lines_kept == 0 and out[4].clean_text is None
    assert not out[5].keep and out[5].fail_reason == "too_few_sentences"
