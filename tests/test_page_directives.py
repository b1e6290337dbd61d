"""Known-answer tests for page_directives: robots-meta token matching
across quote styles/attribute orders, substring non-matches, hreflang
distinct+sort+lowercase, NULL payloads."""

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.operators.textstats import (
    page_directives,
)


def _rows(spark, rows):  # noqa: F811
    df = spark.createDataFrame(rows, schema="url string, html_str string")
    return {
        r.url: (r.noindex, r.nofollow, r.hreflang_langs, r.n_alternates)
        for r in page_directives(df).collect()
    }


def test_robots_meta_variants(spark):  # noqa: F811
    got = _rows(
        spark,
        [
            ("a", '<meta name="robots" content="NOINDEX, nofollow">'),
            ("b", '<meta content="index,follow" name="robots">'),
            ("c", "<meta name='robots' content='noindex nofollow'>"),
            ("d", "<p>no meta at all</p>"),
            ("e", None),
        ],
    )
    assert got["a"][:2] == (True, True)
    assert got["b"][:2] == (False, False)
    assert got["c"][:2] == (True, True)
    assert got["d"][:2] == (False, False)
    assert got["e"][:2] == (False, False)


def test_robots_token_not_substring(spark):  # noqa: F811
    # "nonoindexed" must NOT count as a noindex directive
    got = _rows(
        spark, [("a", '<meta name="robots" content="nonoindexed,follow">')]
    )
    assert got["a"][:2] == (False, False)


def test_hreflang_distinct_sorted_lowercased(spark):  # noqa: F811
    html = (
        '<link rel="alternate" hreflang="en-US" href="/en">'
        '<link hreflang="DE" rel="alternate" href="/de">'
        '<link rel="alternate" hreflang="en-us" href="/en2">'
    )
    got = _rows(spark, [("a", html)])
    assert got["a"][2] == ["de", "en-us"]
    assert got["a"][3] == 2


# ---------------------------------------------------------------------------
# jsonld_extract
# ---------------------------------------------------------------------------


def test_jsonld_valid_malformed_and_missing(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
        jsonld_extract,
    )

    rows = [
        (
            "u1",
            '<script type="application/ld+json">{"@type":"Article",'
            '"headline":"Big","datePublished":"2024-01-02",'
            '"author":{"name":"Ann"}}</script>'
            '<script type="application/ld+json">{broken</script>'
            "<script type='application/ld+json'>{\"headline\":\"Q\"}</script>",
        ),
        ("u2", "<script type=\"text/javascript\">var x = 1;</script>"),
        ("u3", None),
    ]
    df = spark.createDataFrame(rows, schema="url string, html_str string")
    got = [
        (r.url, r.pos, r.valid, r.ld_type, r.headline, r.date_published, r.author_name)
        for r in jsonld_extract(df).orderBy("url", "pos").collect()
    ]
    assert got == [
        ("u1", 0, True, "Article", "Big", "2024-01-02", "Ann"),
        ("u1", 1, False, None, None, None, None),   # malformed row STAYS
        ("u1", 2, True, None, "Q", None, None),     # single-quoted type attr
    ]
