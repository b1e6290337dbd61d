"""Property tests (SURVEY.md §5.5): the extractor never crashes on arbitrary
lines, value spans stay within line bounds, the sweep is idempotent for a
fresh spec list, and serialization is stable."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from universal_key_value_based_text_processing_with_ocr_spark.kvcore import ktpspec
from universal_key_value_based_text_processing_with_ocr_spark.kvcore.matching import (
    match_keys_in_line,
)
from universal_key_value_based_text_processing_with_ocr_spark.kvcore.tokenspan import (
    split_with_spans,
)

LINE_ALPHABET = st.sampled_from(
    list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 :.-/|()!?=\t")
)
LINES = st.text(alphabet=LINE_ALPHABET, max_size=120)


@given(LINES)
@settings(max_examples=300, deadline=None)
def test_matcher_never_crashes_and_values_in_bounds(line):
    args = dict(
        line=line,
        key_str_list_list=[["NIK"], ["Tempat", "Tgl", "Lahir"]],
        max_distances=[[1], [2, 1, 2]],
        min_accuracies=[0.6, 0.6],
        separators=[":"],
        re_chars_filter=None,
        alias_names=["NIK", "TTL"],
    )
    ok, result = match_keys_in_line(**args)
    assert ok is True
    for name, value in result.items():
        assert isinstance(value, str)
        assert value in line or value == ""  # raw-slice property


@given(LINES)
@settings(max_examples=300, deadline=None)
def test_split_spans_reconstruct(line):
    toks, spans = split_with_spans(line, [" ", ":"])
    for tok, (s, e) in zip(toks, spans):
        assert line[s:e] == tok
        assert 0 <= s <= e <= len(line)


@given(st.lists(LINES, max_size=6))
@settings(max_examples=60, deadline=None)
def test_parse_document_never_crashes_and_is_deterministic(lines):
    doc = "\n".join(lines)
    a = ktpspec.parse_document(doc)
    b = ktpspec.parse_document(doc)
    assert json.dumps(a, default=str) == json.dumps(b, default=str)
    assert set(a) <= set(ktpspec.OUTPUT_ORDERS)
    assert isinstance(a["success"], bool)
