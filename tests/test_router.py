"""Mixed-modality payload router: sniffing, per-modality identity,
containment, plan shape."""

from __future__ import annotations

import pandas as pd
import pytest  # noqa: F401

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

from universal_key_value_based_text_processing_with_ocr_spark.operators.router import (
    render_mixed_payloads,
    route_extract,
    sniff_modality,
)


class TestSniff:
    def test_pdf_magic(self):
        assert sniff_modality(b"%PDF-1.4\n...") == "pdf"

    def test_html_variants(self):
        assert sniff_modality(b"<!DOCTYPE html><html>") == "html"
        assert sniff_modality(b"  \n\t<html lang='en'>") == "html"
        assert sniff_modality(b"<body>x</body>") == "html"
        assert sniff_modality(b"<p>fragment</p>") == "html"

    def test_text_default(self):
        assert sniff_modality(b"plain words here") == "text"
        assert sniff_modality(b"") == "text"
        # a '<' later in the payload does not make it html
        assert sniff_modality(b"a < b and b > c") == "text"

    def test_leading_angle_needs_tag_opener(self):
        """A bare leading '<' is html only when tag-like ('<'+letter/!/?//)
        — '<3 so cool' is text (the old tuple's bare b'<' member routed
        it to the densitometry stripper, which extracted it as empty)."""
        assert sniff_modality(b"<3 so cool") == "text"
        assert sniff_modality(b"< 5% CTR improvement") == "text"
        assert sniff_modality(b"<div>fragment</div>") == "html"
        assert sniff_modality(b"</td> orphan close") == "html"
        assert sniff_modality(b"<!-- comment first -->hi") == "html"
        assert sniff_modality(b"<?php echo 1; ?>") == "html"


class TestRouting:
    def test_three_modalities_identity(self, spark):
        texts = {
            0: "pdf payload words one two three four five six seven eight nine",
            1: "raw text payload stays as is",
            2: "html payload wrapped in paragraphs with nav boilerplate stripped",
        }
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        )
        rows = (
            route_extract(render_mixed_payloads(docs), line_sep=" ")
            .orderBy("doc_id")
            .collect()
        )
        assert [r.modality for r in rows] == ["pdf", "text", "html"]
        assert [r.text for r in rows] == list(texts.values())

    def test_null_and_hostile_payloads_contained(self, spark):
        payloads = [
            (1, None),
            (2, b"%PDF-1.4 corrupt body"),
            (3, b"<html><body><p>ok line</p></body></html>"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(payloads, columns=["doc_id", "payload"]),
            schema="doc_id long, payload binary",
        )
        rows = route_extract(df).orderBy("doc_id").collect()
        assert (rows[0].modality, rows[0].text) == ("text", "")
        assert (rows[1].modality, rows[1].text) == ("pdf", "")  # contained
        assert (rows[2].modality, rows[2].text) == ("html", "ok line")

    def test_plan_is_narrow(self, spark):
        docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
        plan = (
            route_extract(render_mixed_payloads(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
