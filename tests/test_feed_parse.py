"""Hand-derived known-answer tests for parse_feeds (RSS 2.0 + Atom):
CDATA titles, attribute-carrying tags, link-less drops, whitespace trim,
multi-line blocks, both formats in one payload, NULL xml."""

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.operators.robots import (
    parse_feeds,
)


def _feeds(spark, rows):  # noqa: F811
    return spark.createDataFrame(rows, schema="host string, feed_xml string")


def _collect(spark, xml):  # noqa: F811
    out = parse_feeds(_feeds(spark, [("h.example", xml)])).collect()
    return [
        (r.kind, r.title, r.link, r.entry_id, r.published) for r in out
    ]


def test_rss_full_item(spark):  # noqa: F811
    xml = (
        "<rss><channel><item><title>T</title><link>https://h/x</link>"
        '<guid isPermaLink="true">g1</guid>'
        "<pubDate>Mon, 01 Jan 2024 10:00:00 +0000</pubDate>"
        "</item></channel></rss>"
    )
    assert _collect(spark, xml) == [
        ("rss", "T", "https://h/x", "g1", "Mon, 01 Jan 2024 10:00:00 +0000")
    ]


def test_rss_cdata_title_and_trim(spark):  # noqa: F811
    xml = (
        "<rss><item>\n  <title><![CDATA[ A <b>bold</b> title ]]></title>\n"
        "  <link>  https://h/y  </link>\n</item></rss>"
    )
    assert _collect(spark, xml) == [
        ("rss", "A <b>bold</b> title", "https://h/y", None, None)
    ]


def test_rss_linkless_dropped_atom_hrefless_dropped(spark):  # noqa: F811
    xml = (
        "<rss><item><title>orphan</title></item></rss>"
        "<feed><entry><title>no-href</title><id>i</id></entry>"
        "<entry><link href=''/><title>empty-href</title></entry></feed>"
    )
    assert _collect(spark, xml) == []


def test_atom_entry_href_attribute(spark):  # noqa: F811
    xml = (
        '<feed><entry class="z"><title>E</title>'
        '<link rel="alternate" type="text/html" href="https://h/e1"/>'
        "<id>urn:1</id><updated>2024-01-02T10:00:00Z</updated>"
        "</entry></feed>"
    )
    assert _collect(spark, xml) == [
        ("atom", "E", "https://h/e1", "urn:1", "2024-01-02T10:00:00Z")
    ]


def test_both_formats_one_payload(spark):  # noqa: F811
    xml = (
        "<rss><item><link>https://h/r</link></item></rss>"
        '<feed><entry><link href="https://h/a"/></entry></feed>'
    )
    got = sorted(_collect(spark, xml))
    assert got == [
        ("atom", None, "https://h/a", None, None),
        ("rss", None, "https://h/r", None, None),
    ]


def test_null_and_empty_xml(spark):  # noqa: F811
    df = _feeds(spark, [("h1", None), ("h2", ""), ("h3", "<rss></rss>")])
    assert parse_feeds(df).count() == 0


def test_byte_soup_never_crashes_schema_stable(spark):  # noqa: F811
    """Fuzz: random tag-soup / truncated / nested-garbage payloads must
    never crash the parser; every emitted row has a non-null link and
    kind in {rss, atom}."""
    import random

    rng = random.Random(99)
    frags = [
        "<item>", "</item>", "<entry>", "</entry>", "<link>", "</link>",
        '<link href="', '"/>', "<title>", "</title>", "<![CDATA[", "]]>",
        "<guid>", "</guid>", "<id>", "</id>", "\x00\x01\xff", "&&&<<<>>>",
        "https://h/", "plain text ", "\n", "<item><item>", "</entry></entry>",
    ]
    rows = []
    for i in range(60):
        xml = "".join(rng.choice(frags) for _ in range(rng.randrange(1, 40)))
        rows.append((f"h{i}", xml))
    out = parse_feeds(_feeds(spark, rows)).collect()
    for r in out:
        assert r.link is not None and r.link != ""
        assert r.kind in ("rss", "atom")
