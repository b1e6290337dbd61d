"""Parity of the TWO-PARSER blended entry point (reference parse_ktp
image-path structure, parsers.py:68-96) on text payloads: the ordered field
sweep + the multi-hit NIK_1 re-scan (simple_parse_one_all), blended
first-writer-wins, then ktp_final_evaluator.

The reference's second parser is driven with an identity 'ocr' (text in,
text out) and the stubbed identity preprocessings, which on a text payload
is exactly the engine's scan_document_all semantics."""

import copy

import pytest

from tests import refharness
from universal_key_value_based_text_processing_with_ocr_spark.kvcore import ktpspec, sweep
from universal_key_value_based_text_processing_with_ocr_spark.sources import synthdocs

pytestmark = pytest.mark.skipif(
    not refharness.reference_available(), reason="reference repo not present"
)


def _norm(x):
    if isinstance(x, (list, tuple)):
        return [_norm(i) for i in x]
    if isinstance(x, dict):
        return {k: _norm(v) for k, v in x.items()}
    return x


def _ref_blended(doc_str):
    post, ev = refharness.load_reference()
    specs = refharness.build_reference_specs(ktpspec.DEFAULT_FIELD_CONFIG)
    nik_rescan = [
        dict(
            extractor=post["get_all"],
            extractor_args=dict(alias_names=["NIK_1"], pattern=r".*"),
            evaluators=[ev["nik_evaluator"]],
            multi_line_value=False,
            alias_names=["NIK_1"],
            tolerant_not_exists=[True],
            tess_config="",
        )
    ]
    result = post["blended_parse_doc"](
        doc_parsers={
            post["parse_doc"]: {"doc_str": doc_str, "to_extracts": specs},
            post["simple_parse_one_all"]: {
                "to_extract": copy.deepcopy(nik_rescan),
                "ocr": lambda img, config="": img,
            },
        },
        final_evaluator=post["ktp_final_evaluator"],
        img=doc_str,
    )
    result["result"] = {
        k: result["result"][k] for k in ktpspec.RESULT_ORDERS if k in result["result"]
    }
    return {k: result[k] for k in ktpspec.OUTPUT_ORDERS if k in result}


def test_scan_document_all_parity():
    post, ev = refharness.load_reference()
    spec = dict(
        extractor=post["get_all"],
        extractor_args=dict(alias_names=["NIK_1"], pattern=r".*"),
        evaluators=[ev["nik_evaluator"]],
        alias_names=["NIK_1"],
        tolerant_not_exists=[True],
        tess_config="",
    )
    my_spec = dict(spec, extractor=None)
    from universal_key_value_based_text_processing_with_ocr_spark.kvcore.matching import (
        match_line_regex,
    )
    from universal_key_value_based_text_processing_with_ocr_spark.kvcore.evaluate import eval_nik

    my_spec["extractor"] = match_line_regex
    my_spec["evaluators"] = [eval_nik]

    for doc_id in range(30):
        doc = synthdocs.gen_document(42, doc_id)
        text = "\n".join(doc["_lines"][:10])
        got = sweep.scan_document_all(text, [copy.deepcopy(my_spec)])
        want = post["simple_parse_one_all"](
            img=text, to_extract=[copy.deepcopy(spec)], ocr=lambda img, config="": img
        )
        assert _norm(got) == _norm(want), doc_id


def test_blended_two_parser_parity():
    checked = 0
    for doc_id in range(60):
        doc = synthdocs.gen_document(42, doc_id)
        if doc["lang"] != "ind":
            continue
        text = "\n".join(doc["_lines"])
        got = {k: v for k, v in ktpspec.parse_document_blended(text).items() if k != "warning"}
        want = _ref_blended(text)
        assert _norm(got) == _norm(want), doc_id
        checked += 1
    assert checked >= 20


def test_blended_rescan_contributes_nik1():
    """The re-scan parser feeds NIK_1 candidates into the final evaluator
    even when the sweep's NIK spec already matched."""
    doc = synthdocs.gen_document(42, 11)
    assert doc["lang"] == "ind"
    out = ktpspec.parse_document_blended("\n".join(doc["_lines"]))
    assert "NIK" in out["result"]
    assert len(out["result"]["NIK"]) >= 1
