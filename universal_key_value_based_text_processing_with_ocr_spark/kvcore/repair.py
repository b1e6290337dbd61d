"""OCR-typo repair maps (digit<->letter confusion normalisation).

Parity targets:
- ``repair_to_letters`` == reference ``letters_evaluator``
  (/root/reference/ocrfw/postprocessing.py:268-297)
- ``repair_to_digits``  == reference ``todigits_typo``
  (/root/reference/ocrfw/postprocessing.py:301-326)
- ``repair_no_number``  == reference ``nodigits_typo``
  (/root/reference/ocrfw/postprocessing.py:330-335)

The reference iterates regex patterns per character; since every pattern is a
single-character class, each function collapses to a str.translate-style map
(precomputed once) with identical output, which is also what the vectorised
pandas path uses.
"""

from __future__ import annotations

import re

# letters_evaluator's split keeps chars in {a-z, A-Z, 0-9, '|', '^'} because
# the reference builds the class "[^a-z|^A-Z|^0-9]" where the inner '|'/'^'
# are literals.  Kept as the literal pattern for byte parity.
_LETTER_SPLIT = re.compile(r"[^a-z|^A-Z|^0-9]")

# Pattern order in the reference dict decides precedence; all patterns are
# disjoint single-char classes so a flat map is equivalent.  '[6|9]' also
# matches a literal '|' (which survives the split), hence '|' -> 'g'.
_TO_LETTER = {
    "4": "a",
    "5": "s",
    "?": "7",
    "8": "b",
    "0": "o",
    "1": "i",
    "+": "t",
    "6": "g",
    "9": "g",
    "|": "g",
    "3": "e",
}

_TO_DIGIT = {}
for _chars, _digit in [
    ("1liI!", "1"),
    ("2P", "2"),
    ("3eE", "3"),
    ("4AaY", "4"),
    ("5Ss", "5"),
    ("6b", "6"),
    ("7?", "7"),
    ("8B", "8"),
    ("9g", "9"),
    ("0DoO", "0"),
]:
    for _c in _chars:
        _TO_DIGIT.setdefault(_c, _digit)


def repair_to_letters(value: str) -> list:
    """Digit->letter typo repair; returns [True, repaired] like an evaluator."""
    words = [w for w in _LETTER_SPLIT.split(value) if len(w) > 0]
    fixed = ["".join(_TO_LETTER.get(c, c) for c in w) for w in words]
    return [True, " ".join(fixed)]


def repair_to_digits(value: str, ignore_not_number: bool = True) -> str:
    """Letter->digit typo repair; optionally drops unmapped characters."""
    out = []
    for c in value:
        d = _TO_DIGIT.get(c)
        if d is not None:
            out.append(d)
        elif not ignore_not_number:
            out.append(c)
    return "".join(out)


_NO_TOKEN = re.compile(r"[N|n][O|o|0]\s*\.{0,1}\s*[^\s]*")
_NO_SPLIT = re.compile(r"([N|n][O|o|0]\s*\.{0,1}\s*)([^\s]*)")


def repair_no_number(value: str) -> str:
    """Normalise ``No. <x>`` tokens to ``NO. <digits>`` (address numbers)."""
    for hit in _NO_TOKEN.findall(value):
        head_tail = _NO_SPLIT.search(hit).groups()
        value = value.replace(hit, f"NO. {repair_to_digits(head_tail[1])}")
    return value
