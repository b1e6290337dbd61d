"""Hand-derived known-answer tests for html_outline (heading tree with
nearest-lower-level parent assignment): pre-h1 roots, skipped levels,
repeated siblings, inner-tag titles, NULL/heading-free payloads, and a
multi-document independence check."""

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
    html_outline,
)


def _outline(spark, rows):  # noqa: F811
    df = spark.createDataFrame(rows, schema="url string, html_str string")
    return [
        (r.url, r.pos, r.level, r.title, r.parent_pos)
        for r in html_outline(df).orderBy("url", "pos").collect()
    ]


def test_stack_semantics(spark):  # noqa: F811
    html = (
        "<h2>pre-root</h2><h1>T</h1><h3 class='x'>skip <b>2</b></h3>"
        "<h2>S-A</h2><h4>deep</h4><h2>S-B</h2><h6>tiny</h6>"
    )
    assert _outline(spark, [("u", html)]) == [
        ("u", 0, 2, "pre-root", None),   # level-2 before any h1: root
        ("u", 1, 1, "T", None),
        ("u", 2, 3, "skip 2", 1),        # skipped h2: parent is the h1
        ("u", 3, 2, "S-A", 1),
        ("u", 4, 4, "deep", 3),
        ("u", 5, 2, "S-B", 1),
        ("u", 6, 6, "tiny", 5),          # h6 under latest h2 (no h3-h5)
    ]


def test_repeated_same_level_are_siblings(spark):  # noqa: F811
    html = "<h1>A</h1><h2>x</h2><h2>y</h2><h2>z</h2>"
    got = _outline(spark, [("u", html)])
    assert [(p, lv, par) for _, p, lv, _, par in got] == [
        (0, 1, None), (1, 2, 0), (2, 2, 0), (3, 2, 0)
    ]


def test_null_and_headless(spark):  # noqa: F811
    assert _outline(spark, [("a", None), ("b", "<p>no heads</p>")]) == []


def test_documents_independent(spark):  # noqa: F811
    rows = [("u1", "<h1>A</h1><h2>B</h2>"), ("u2", "<h3>C</h3>")]
    got = _outline(spark, rows)
    assert got == [
        ("u1", 0, 1, "A", None),
        ("u1", 1, 2, "B", 0),
        ("u2", 0, 3, "C", None),  # u1's h1 must NOT leak into u2
    ]


def test_case_insensitive_and_multiline(spark):  # noqa: F811
    html = "<H2>Upper\nCase</H2><h3>next</h3>"
    got = _outline(spark, [("u", html)])
    assert got == [
        ("u", 0, 2, "Upper\nCase", None),
        ("u", 1, 3, "next", 0),
    ]


# ---------------------------------------------------------------------------
# section_chunks
# ---------------------------------------------------------------------------


def _chunks(spark, rows):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
        section_chunks,
    )

    df = spark.createDataFrame(rows, schema="url string, html_str string")
    return [
        (r.url, r.pos, r.level, r.title, r.text)
        for r in section_chunks(df).orderBy("url", "pos").collect()
    ]


def test_section_chunks_basic(spark):  # noqa: F811
    html = (
        "intro text <h1>T</h1><p>body A</p><h2>S</h2>body <b>B</b>"
        "<h2>E</h2>"
    )
    assert _chunks(spark, [("u", html)]) == [
        ("u", -1, None, None, "intro text"),
        ("u", 0, 1, "T", "body A"),
        ("u", 1, 2, "S", "body B"),
        ("u", 2, 2, "E", ""),  # back-to-back/tail heading keeps its row
    ]


def test_section_chunks_no_preamble_row_when_empty(spark):  # noqa: F811
    got = _chunks(spark, [("u", "<h1>T</h1>tail")])
    assert got == [("u", 0, 1, "T", "tail")]


def test_section_chunks_null_and_headless(spark):  # noqa: F811
    got = _chunks(spark, [("a", None), ("b", "just <i>prose</i>")])
    assert got == [("b", -1, None, None, "just prose")]


def test_outline_and_sections_join_consistently(spark):  # noqa: F811
    """Cross-operator invariant: html_outline and section_chunks emit the
    SAME (url, pos, level, title) spine for the same payload — a consumer
    may join them on (url, pos) to hang section text off the tree."""
    from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
        html_outline,
        section_chunks,
    )

    rows = [
        (
            "u1",
            "pre <h1>A</h1>alpha<h2>B</h2>beta<h3>C</h3><h2>D</h2>delta",
        ),
        ("u2", "<h4>solo</h4>tail"),
    ]
    df = spark.createDataFrame(rows, schema="url string, html_str string")
    o = {
        (r.url, r.pos): (r.level, r.title)
        for r in html_outline(df).collect()
    }
    s = {
        (r.url, r.pos): (r.level, r.title)
        for r in section_chunks(df).filter("pos >= 0").collect()
    }
    assert o == s and len(o) == 5
