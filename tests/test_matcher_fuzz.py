"""Adversarial matcher parity: RANDOM spec configs x random lines against
the exec'd reference ``get_str_keys_values`` — beyond the fixed KTP specs,
this fuzzes key counts, token counts, float/int distance limits (the
snap_to_grid conversion path), separators, filters and wo_space."""

import copy
import random

import pytest

from tests import refharness
from universal_key_value_based_text_processing_with_ocr_spark.kvcore import matching

pytestmark = pytest.mark.skipif(
    not refharness.reference_available(), reason="reference repo not present"
)

WORDS = ["NIK", "Nama", "Kode", "Pos", "Tgl", "Lahir", "No", "Jalan", "x7",
         "A1amat", "be3", "Q", "zz", "07", "R-T"]
FILTERS = ["[a-z|A-Z|0-9]", "[a-z|A-Z|\\/|0-9]", r"\w", "[A-Z]"]
SEPS = [[":"], [":", "."], [":", "=", "."]]


def _norm(x):
    if isinstance(x, (list, tuple)):
        return [_norm(i) for i in x]
    if isinstance(x, dict):
        return {k: _norm(v) for k, v in x.items()}
    return x


def _random_args(rng: random.Random) -> dict:
    n_keys = rng.randint(1, 3)
    keys = []
    dists = []
    accs = []
    filters = []
    aliases = []
    for ki in range(n_keys):
        k = rng.randint(1, 3)
        toks = [rng.choice(WORDS) for _ in range(k)]
        keys.append(toks)
        dists.append(
            [
                rng.choice([0, 1, 2, rng.random() * 0.9 + 0.05])  # ints + floats
                for _ in range(k)
            ]
        )
        accs.append(rng.choice([0.3, 0.5, 0.7, 0.9]))
        filters.append([rng.choice(FILTERS)] * k)
        aliases.append(f"F{ki}")
    return dict(
        key_str_list_list=keys,
        max_distances=dists,
        min_accuracies=accs,
        separators=rng.choice(SEPS),
        re_chars_filter=filters,
        alias_names=aliases,
        line_preprocessing=rng.choice([lambda x: x, str.lower, str.upper]),
        wo_space=rng.random() < 0.4,
    )


def _random_line(rng: random.Random) -> str:
    n = rng.randint(0, 10)
    parts = []
    for _ in range(n):
        w = rng.choice(WORDS)
        if rng.random() < 0.3:
            w = w.lower()
        parts.append(w)
        parts.append(rng.choice([" ", " : ", ":", "  ", " . ", "="]))
    return "".join(parts)


def test_matcher_fuzz_parity():
    post, _ = refharness.load_reference()
    ref_fn = post["get_str_keys_values"]
    rng = random.Random(1234)
    checked = 0
    for trial in range(150):
        args = _random_args(rng)
        line = _random_line(rng)
        a1 = copy.deepcopy(args)
        a2 = copy.deepcopy(args)
        # lambdas don't deepcopy identically; share the callable
        a1["line_preprocessing"] = args["line_preprocessing"]
        a2["line_preprocessing"] = args["line_preprocessing"]
        a1["line"] = line
        a2["line"] = line
        got = matching.match_keys_in_line(**a1)
        want = ref_fn(**a2)
        assert _norm(got) == _norm(want), (trial, line, args["key_str_list_list"])
        checked += 1
    assert checked == 150


def test_matcher_fuzz_shared_args_two_calls():
    """wo_space mutation compounding across two calls on SHARED args."""
    post, _ = refharness.load_reference()
    ref_fn = post["get_str_keys_values"]
    rng = random.Random(777)
    for trial in range(40):
        args = _random_args(rng)
        args["wo_space"] = True
        lines = [_random_line(rng), _random_line(rng)]
        a1 = copy.deepcopy(args)
        a2 = copy.deepcopy(args)
        a1["line_preprocessing"] = a2["line_preprocessing"] = args["line_preprocessing"]
        for line in lines:
            a1["line"] = line
            a2["line"] = line
            got = matching.match_keys_in_line(**a1)
            want = ref_fn(**a2)
            assert _norm(got) == _norm(want), (trial, line)


def test_sweep_fuzz_duplicate_lines_parity():
    """Random short documents WITH DUPLICATED LINES through the full
    text-path pipeline: exercises consume-by-value (del pool[pool.index])
    picking the FIRST equal line (postprocessing.py:495)."""
    from universal_key_value_based_text_processing_with_ocr_spark.kvcore import ktpspec

    rng = random.Random(4242)
    from universal_key_value_based_text_processing_with_ocr_spark.sources import synthdocs

    ktp_lines = []
    for doc_id in range(8):
        d = synthdocs.gen_document(42, doc_id)
        if d["lang"] == "ind":
            ktp_lines.extend(d["_lines"])

    for trial in range(25):
        n = rng.randint(1, 6)
        lines = [rng.choice(ktp_lines) for _ in range(n)]
        if rng.random() < 0.7 and lines:
            lines.insert(rng.randrange(len(lines) + 1), rng.choice(lines))  # duplicate
        doc = "\n".join(lines)
        got = {k: v for k, v in ktpspec.parse_document(doc).items() if k != "warning"}
        want = refharness.ref_parse_document(
            doc, ktpspec.DEFAULT_FIELD_CONFIG, ktpspec.RESULT_ORDERS, ktpspec.OUTPUT_ORDERS
        )
        assert _norm(got) == _norm(want), (trial, lines)
