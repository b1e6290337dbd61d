"""Field spans: matcher with_spans consistency, slice invariants,
partitioning invariance, golden replay."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest  # noqa: F401

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

from universal_key_value_based_text_processing_with_ocr_spark.kvcore.matching import (
    match_keys_in_line,
)
from universal_key_value_based_text_processing_with_ocr_spark.operators.fieldspans import (
    extract_line_field_spans,
    line_field_spans,
)

GOLDEN_LINES = "tests/golden/lines_golden.parquet"


def _args(line):
    return dict(
        line=line,
        key_str_list_list=[["Jenis", "kelamin"], ["Gol", "darah"]],
        max_distances=[[1, 2], [1, 1]],
        min_accuracies=[0.6, 0.6],
        separators=[":"],
        alias_names=["Jenis kelamin", "GolDarah"],
    )


class TestWithSpans:
    LINE = "J3nis kelamin:LAKI-LAKI  Gol darah  :  O"

    def test_result_identical_to_default(self):
        """with_spans must not change the extraction result — same dict,
        same insertion order."""
        default = match_keys_in_line(**_args(self.LINE))
        spanned = match_keys_in_line(**_args(self.LINE), with_spans=True)
        assert default[0] == spanned[0] is True
        assert default[1] == spanned[1]
        assert list(default[1]) == list(spanned[1])

    def test_span_slices_reconstruct_values(self):
        ok, result, spans = match_keys_in_line(**_args(self.LINE), with_spans=True)
        assert ok
        for name, (ks, ke, vs, ve) in spans.items():
            assert 0 <= ks <= ke <= vs <= ve <= len(self.LINE)
            assert result[name] == self.LINE[vs:ve]

    def test_known_offsets(self):
        _, _, spans = match_keys_in_line(**_args(self.LINE), with_spans=True)
        assert spans["Jenis kelamin"] == (0, 13, 13, 25)
        assert spans["GolDarah"] == (25, 34, 34, 40)


class TestLineFieldSpans:
    def test_invariants_over_golden_sample(self):
        t = pq.read_table(GOLDEN_LINES)
        rows = list(
            zip(t["url"].to_pylist()[:600], t["line"].to_pylist()[:600])
        )
        n = 0
        for _url, line in rows:
            line = line or ""
            for field, ks, ke, vs, ve, value in line_field_spans(line):
                n += 1
                assert 0 <= ks <= ke <= len(line)
                assert 0 <= vs <= ve <= len(line)
                assert value == line[vs:ve]
                assert field
        assert n > 0  # the sample genuinely exercises spans

    def test_fresh_specs_no_cross_line_growth(self):
        """Same line twice -> identical spans (no wo_space config bleed)."""
        line = "Kewarganegaraan : WNI"
        assert line_field_spans(line) == line_field_spans(line)


class TestSpark:
    def test_partitioning_invariance(self, spark):
        lines = spark.read.parquet(GOLDEN_LINES).limit(300)
        one = sorted(
            map(tuple, extract_line_field_spans(lines.coalesce(1)).collect())
        )
        many = sorted(
            map(tuple, extract_line_field_spans(lines.repartition(16, "url")).collect())
        )
        assert one == many

    def test_replays_committed_golden(self, spark):
        got = (
            extract_line_field_spans(spark.read.parquet(GOLDEN_LINES))
            .toPandas()
            .sort_values(["url", "line_no", "field", "key_start"])
            .reset_index(drop=True)
        )
        want = (
            pq.read_table("tests/golden/spans_golden.parquet")
            .to_pandas()
            .sort_values(["url", "line_no", "field", "key_start"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        for col in ["url", "line_no", "field", "key_start", "key_end", "value_start", "value_end", "value"]:
            assert (got[col].astype(str).values == want[col].astype(str).values).all(), col


class TestPagesEndToEnd:
    def test_pages_to_spans_replays_committed_golden(self, spark):
        """Raw pages -> distributed html decode -> spans must land exactly
        on the same committed golden span table the line stage replays:
        the golden generator enumerates the decoded line list itself."""
        from universal_key_value_based_text_processing_with_ocr_spark.api import (
            GOLDEN_N,
            GOLDEN_SEED,
            synth_pages_df,
        )
        from universal_key_value_based_text_processing_with_ocr_spark.operators.fieldspans import (
            extract_page_field_spans,
        )

        pages = synth_pages_df(spark, GOLDEN_N, seed=GOLDEN_SEED)
        got = (
            extract_page_field_spans(pages)
            .toPandas()
            .sort_values(["url", "line_no", "field", "key_start"])
            .reset_index(drop=True)
        )
        want = (
            pq.read_table("tests/golden/spans_golden.parquet")
            .to_pandas()
            .sort_values(["url", "line_no", "field", "key_start"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want) > 0
        for col in [
            "url", "line_no", "field", "key_start", "key_end",
            "value_start", "value_end", "value",
        ]:
            assert (
                got[col].astype(str).values == want[col].astype(str).values
            ).all(), col

    def test_hostile_and_null_payloads_contained(self, spark):
        """Undecodable html and all-NULL payload rows emit no spans and
        never kill the task; text-path rows still span."""
        import pandas as pd

        rows = pd.DataFrame(
            {
                "url": ["u1", "u2", "u3"],
                "html": [b"\x00\xff\xfe garbage \x9c", None, None],
                "text": [None, None, "Kewarganegaraan : WNI"],
            }
        )
        df = spark.createDataFrame(rows, schema="url string, html binary, text string")
        from universal_key_value_based_text_processing_with_ocr_spark.operators.fieldspans import (
            extract_page_field_spans,
        )

        out = extract_page_field_spans(df).toPandas()
        assert set(out["url"]) <= {"u1", "u3"}
        assert (out[out["url"] == "u3"]["field"] == "Kewarganegaraan").any()
