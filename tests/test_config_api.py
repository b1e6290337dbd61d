"""Universal config API tests: JSON spec compilation, custom extraction,
use_re_support path parity vs the reference, golden idempotence."""

import copy
import random

import pytest

from tests import refharness
from universal_key_value_based_text_processing_with_ocr_spark.kvcore import config, matching
from universal_key_value_based_text_processing_with_ocr_spark.sources import synthdocs


def test_custom_config_extracts_fields():
    cfg = {
        "fields": [
            {
                "name": "Invoice",
                "keys": [["Invoice", "No"]],
                "max_distances": [[1, 1]],
                "min_accuracies": [0.6],
                "separators": [":"],
                "evaluators": ["digits"],
            },
            {
                "name": "Customer",
                "keys": [["Customer"]],
                "max_distances": [[1]],
                "min_accuracies": [0.6],
                "evaluators": ["letters"],
            },
        ]
    }
    doc = "header line\nInvo1ce No : 12345\nCust0mer : ACME CORP\nfooter"
    out = config.parse_document_with_config(doc, cfg)
    assert out["success"] is True
    assert out["result"]["Invoice"] == "12345"
    assert out["result"]["Customer"] == "ACME CORP"


def test_whole_line_extractor_with_pattern():
    cfg = {
        "fields": [
            {
                "name": "Total",
                "extractor": "whole_line",
                "pattern": "TOTAL",
                "evaluators": ["strip"],
            }
        ]
    }
    out = config.parse_document_with_config("x\nTOTAL 99 USD \ny", cfg)
    assert out["result"]["Total"] == "TOTAL 99 USD"


def test_register_custom_evaluator():
    config.register_evaluator("exclaim", lambda v: [True, v.strip() + "!"])
    try:
        cfg = {
            "fields": [
                {
                    "name": "K",
                    "keys": [["Key"]],
                    "max_distances": [[0]],
                    "min_accuracies": [0.9],
                    "evaluators": ["exclaim"],
                }
            ]
        }
        out = config.parse_document_with_config("Key : hello", cfg)
        # the associated value is the raw slice after the key's last token
        assert out["result"]["K"] == ": hello!"
    finally:
        del config.EVALUATORS["exclaim"]


def test_missing_required_field_fails_doc():
    cfg = {
        "fields": [
            {
                "name": "Absent",
                "keys": [["Zzzz"]],
                "max_distances": [[0]],
                "min_accuracies": [0.9],
                "evaluators": ["identity"],
            }
        ]
    }
    out = config.parse_document_with_config("nothing here", cfg)
    assert out["success"] is False


def test_ktp_config_via_json_matches_ktpspec():
    """The KTP plan expressed through the JSON config API produces the same
    per-line matches as the hand-built spec list (spot check on NIK)."""
    cfg = {
        "fields": [
            {
                "name": "NIK",
                "keys": [["NIK"]],
                "max_distances": [[1]],
                "min_accuracies": [0.6],
                "separators": [":"],
                "char_filters": [["[a-z|A-Z|0-9]", "[\\:]"]],
                "evaluators": ["nik"],
            }
        ]
    }
    out = config.parse_document_with_config("N1K : 3201150107990001", cfg)
    assert out["result"]["NIK"] == [[0, ["3201150107990001"]]]


@pytest.mark.skipif(not refharness.reference_available(), reason="no reference")
def test_use_re_support_parity():
    """The optional fuzzy-regex fast path (use_re_support=True, no reference
    config enables it but it is part of the surface) matches the reference."""
    post, _ = refharness.load_reference()
    rng = random.Random(99)
    lines = []
    for doc_id in range(12):
        lines.extend(synthdocs.gen_document(42, doc_id)["_lines"])
    for line in rng.sample(lines, 60):
        args = dict(
            key_str_list_list=[["NIK"], ["Nama"]],
            max_distances=[[1], [1]],
            min_accuracies=[0.5, 0.5],
            separators=[":"],
            re_chars_filter=[["[a-z|A-Z|0-9]"], ["[a-z|A-Z|0-9]"]],
            alias_names=["NIK", "Nama"],
            use_re_support=True,
        )
        a1, a2 = copy.deepcopy(args), copy.deepcopy(args)
        a1["line"] = line
        a2["line"] = line
        got = matching.match_keys_in_line(**a1)
        want = post["get_str_keys_values"](**a2)
        assert got[0] == want[0] and got[1] == want[1], line


def test_golden_regeneration_idempotent():
    """make_golden re-derives byte-identical tables (determinism gate)."""
    import pyarrow.parquet as pq

    from scripts.make_golden import GOLDEN_DIR, build_tables

    (
        extract_tbl, lines_tbl, custom_tbl, blended_tbl, boxorder_tbl, spans_tbl
    ) = build_tables()
    assert extract_tbl.equals(pq.read_table(GOLDEN_DIR / "extract_golden.parquet"))
    assert lines_tbl.equals(pq.read_table(GOLDEN_DIR / "lines_golden.parquet"))
    assert custom_tbl.equals(pq.read_table(GOLDEN_DIR / "custom_golden.parquet"))
    assert blended_tbl.equals(pq.read_table(GOLDEN_DIR / "blended_golden.parquet"))
    assert boxorder_tbl.equals(pq.read_table(GOLDEN_DIR / "boxorder_golden.parquet"))
    assert spans_tbl.equals(pq.read_table(GOLDEN_DIR / "spans_golden.parquet"))
