"""Adversarial box-sweep parity: random block lists x random simple specs
against the exec'd reference ``parse_doc_new0`` — fuzzes block counts,
multi-line blocks, blank lines, keep_looking, tolerant flags and evaluator
pass/fail mixes beyond the fixed KTP cases in test_boxsweep_parity."""

import random

import pytest

from tests import refharness
from universal_key_value_based_text_processing_with_ocr_spark.kvcore.boxsweep import sweep_blocks
from universal_key_value_based_text_processing_with_ocr_spark.kvcore.matching import (
    match_keys_in_line,
    match_line_regex,
)

pytestmark = pytest.mark.skipif(
    not refharness.reference_available(), reason="reference repo not present"
)

KEY_WORDS = ["Kode", "Nama", "Umur", "Pos"]
VAL_WORDS = ["BUDI", "SANTOSO", "19", "zz9", "JL. MAWAR", "x", ""]


def _norm(x):
    if isinstance(x, (list, tuple)):
        return [_norm(i) for i in x]
    if isinstance(x, dict):
        return {k: _norm(v) for k, v in x.items() if k != "to extracts"}
    return x


def _pass_eval(v):
    return [True, v]


def _fail_eval(v):
    return [False, "nope", v]


def _digit_eval(v):
    s = str(v).strip()
    return [True, s] if s.isdigit() else [False, "not digits", v]


EVALS = [_pass_eval, _fail_eval, _digit_eval]


def _random_specs(rng, post):
    specs_ref, specs_eng = [], []
    for _ in range(rng.randint(1, 3)):
        kind = rng.random()
        ev = rng.choice(EVALS)
        if kind < 0.3:
            alias = rng.choice(KEY_WORDS) + "_all"
            common = dict(
                extractor_args=dict(alias_names=[alias]),
                evaluators=[ev],
                alias_names=[alias],
                tolerant_not_exists=[rng.random() < 0.7],
                tess_config="",
            )
            specs_ref.append(dict(common, extractor=post["get_all"],
                                  extractor_args=dict(common["extractor_args"])))
            specs_eng.append(dict(common, extractor=match_line_regex,
                                  extractor_args=dict(common["extractor_args"])))
        else:
            key = rng.choice(KEY_WORDS)
            args = dict(
                key_str_list_list=[[key]],
                max_distances=[[rng.choice([0, 1])]],
                min_accuracies=[rng.choice([0.5, 0.8])],
                separators=[":"],
                re_chars_filter=[["[a-z|A-Z|0-9]"]],
                alias_names=[key],
            )
            common = dict(
                evaluators=[ev],
                alias_names=[key],
                tolerant_not_exists=[rng.random() < 0.7],
                tess_config="",
            )
            import copy as _copy

            specs_ref.append(dict(common, extractor=post["get_str_keys_values"],
                                  extractor_args=_copy.deepcopy(args)))
            specs_eng.append(dict(common, extractor=match_keys_in_line,
                                  extractor_args=_copy.deepcopy(args)))
    return specs_ref, specs_eng


def _random_blocks(rng):
    blocks = []
    for _ in range(rng.randint(0, 6)):
        lines = []
        for _ in range(rng.randint(1, 3)):
            if rng.random() < 0.15:
                lines.append(rng.choice(["", "   ", "\t"]))
            else:
                key = rng.choice(KEY_WORDS)
                val = rng.choice(VAL_WORDS)
                sep = rng.choice([" : ", ":", " :", ": "])
                lines.append(rng.choice([f"{key}{sep}{val}", f"{val} {val}", key]))
        blocks.append("\n".join(lines))
    return blocks


def _ref_run(blocks, specs, keep_looking):
    post, _ = refharness.load_reference()
    saved = {k: post.get(k) for k in ("preprocessing3", "get_line_boxes", "ocr2")}
    post["preprocessing3"] = lambda img: img
    post["get_line_boxes"] = lambda img1, scale=0.5: {(i,): None for i in range(len(img1))}
    post["ocr2"] = lambda img1, box, config="": img1[box[0] // 2]
    try:
        try:
            return ("ok", post["parse_doc_new0"](list(blocks), specs, keep_looking=keep_looking))
        except Exception as exc:
            return ("raise", type(exc).__name__)
    finally:
        post.update(saved)


def test_boxsweep_fuzz_parity():
    post, _ = refharness.load_reference()
    rng = random.Random(20260816)
    for trial in range(200):
        specs_ref, specs_eng = _random_specs(rng, post)
        blocks = _random_blocks(rng)
        keep_looking = rng.random() < 0.3
        ref = _ref_run(blocks, specs_ref, keep_looking)
        try:
            eng = ("ok", sweep_blocks(list(blocks), specs_eng, keep_looking=keep_looking))
        except Exception as exc:
            eng = ("raise", type(exc).__name__)
        assert ref[0] == eng[0], f"trial {trial}: {ref} vs {eng} blocks={blocks!r}"
        if ref[0] == "ok":
            assert _norm(ref[1]) == _norm(eng[1]), f"trial {trial}: blocks={blocks!r}"
        else:
            assert ref[1] == eng[1], f"trial {trial}: {ref} vs {eng}"
