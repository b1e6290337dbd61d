"""Malformed-HTML conformance lock (VERDICT r2 #8).

Byte-locks ``extract_main_lines`` over the worst-case markup families in
tests/html_conformance_fixtures.py against the committed golden file.  The
production lxml swap (htmlcore/extract.py seam) is exercised by re-running
this suite against the new parser: every divergence surfaces as a named
fixture diff (the known-divergence list lives in the fixtures module
docstring)."""

import json

from tests.html_conformance_fixtures import FIXTURES, GOLDEN, compute


def test_fixture_names_unique_and_golden_in_sync():
    names = [n for n, _ in FIXTURES]
    assert len(names) == len(set(names))
    golden = json.loads(GOLDEN.read_text())
    assert set(golden) == set(names), (
        "fixture set changed: regenerate with "
        "`python tests/html_conformance_fixtures.py > tests/golden/html_conformance.json`"
    )


def test_extraction_matches_golden_byte_for_byte():
    golden = json.loads(GOLDEN.read_text())
    got = compute()
    mismatches = {n: (golden[n], got[n]) for n in golden if golden[n] != got[n]}
    assert not mismatches, f"conformance drift in: {sorted(mismatches)}"


def test_decode_payload_total_on_arbitrary_bytes():
    """decode_payload must never raise — latin-1 terminal fallback."""
    from universal_key_value_based_text_processing_with_ocr_spark.htmlcore.extract import (
        decode_payload,
    )

    for payload in (b"\xff\xfe\x00\x01", bytes(range(256)), b"\x80" * 64,
                    b"<meta charset='utf-16'>\xff\xfe not really utf16"):
        assert isinstance(decode_payload(payload), str)


def test_extract_main_lines_total_on_fuzzed_bytes():
    """Crash-safety over adversarial byte soup: the decode+parse+strip
    pipeline must return a list[str] for ANY input (poisoned-row policy —
    one malformed page can never kill a 100 TB job).  Deterministic fuzz:
    seeded random byte strings, plus mutations of real markup (truncation,
    byte flips, tag-soup splices)."""
    import random

    from universal_key_value_based_text_processing_with_ocr_spark.htmlcore import (
        extract_main_lines,
    )
    from tests.html_conformance_fixtures import FIXTURES

    rng = random.Random(20260816)
    payloads = []
    for _ in range(120):
        payloads.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400))))
    corpus = [p for _, p in FIXTURES if p]
    for _ in range(120):
        base = bytearray(rng.choice(corpus))
        op = rng.randrange(3)
        if op == 0 and base:                   # truncate anywhere
            base = base[: rng.randrange(len(base))]
        elif op == 1 and base:                 # flip random bytes
            for _ in range(rng.randrange(1, 6)):
                base[rng.randrange(len(base))] = rng.randrange(256)
        else:                                  # splice two fixtures mid-tag
            other = rng.choice(corpus)
            cut = rng.randrange(len(base))
            base = base[:cut] + bytearray(other[rng.randrange(len(other)) :])
        payloads.append(bytes(base))

    for p in payloads:
        lines = extract_main_lines(p)
        assert isinstance(lines, list)
        assert all(isinstance(ln, str) for ln in lines)
