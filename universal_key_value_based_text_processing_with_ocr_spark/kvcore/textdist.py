"""String-distance primitives.

The reference delegates to ``nltk.metrics.edit_distance`` / ``accuracy``
(imported at /root/reference/ocrfw/postprocessing.py:5 and used throughout,
e.g. :181, :204 and /root/reference/evaluators.py:20-21).  nltk is not
available offline, so the engine ships its own implementations with the same
defaults (substitution cost 1, no transpositions; accuracy = fraction of
positions with equal items over equal-length sequences).

``edit_distance_many`` is the vectorised batch variant used on the Spark hot
path: one numpy DP over a stack of candidate windows against one key, which
replaces the reference's per-window scalar calls.
"""

from __future__ import annotations

import numpy as np


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance, substitution cost 1, no transpositions.

    Matches ``nltk.metrics.edit_distance`` defaults (the reference never
    overrides them).
    """
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    # Single rolling row; classic Wagner-Fischer.
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


def accuracy(reference: str, test: str) -> float:
    """Fraction of equal characters at equal positions.

    Mirrors ``nltk.metrics.accuracy``: raises ``ValueError`` on unequal
    lengths (callers pre-pad/truncate, e.g.
    /root/reference/ocrfw/postprocessing.py:197-203).
    """
    if len(reference) != len(test):
        raise ValueError("Lists must have the same length.")
    if len(reference) == 0:
        # nltk would divide by zero; the reference never reaches this with
        # empty keys, but the engine guards it as a 0-score.
        return 0.0
    return sum(1 for x, y in zip(reference, test) if x == y) / len(reference)


def edit_distance_many(key: str, candidates: list[str]) -> np.ndarray:
    """Levenshtein distance of one key against many candidate strings.

    Vectorised over the candidate axis: all candidates are right-padded into
    a single uint32 code-point matrix and one DP sweep runs column-wise in
    numpy.  Padding cannot change the result because the DP is evaluated per
    candidate only up to its true length (we gather the final cell from the
    row/col of each candidate's own length).
    """
    n = len(candidates)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lk = len(key)
    lens = np.fromiter((len(c) for c in candidates), dtype=np.int64, count=n)
    if lk == 0:
        return lens.copy()
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.full(n, lk, dtype=np.int64)

    # (n, maxlen) code-point matrix, 0-padded (NUL never matches real chars
    # unless key contains NUL, which the reference's configs never do).
    mat = np.zeros((n, maxlen), dtype=np.uint32)
    for i, c in enumerate(candidates):
        if c:
            mat[i, : len(c)] = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
    key_codes = np.frombuffer(key.encode("utf-32-le"), dtype=np.uint32)

    # DP over key axis; dp has shape (n, maxlen+1).
    dp_prev = np.tile(np.arange(maxlen + 1, dtype=np.int64), (n, 1))
    out = np.empty(n, dtype=np.int64)
    # Track rows (candidates) by length so we can read dp at each cand's len.
    for i in range(1, lk + 1):
        dp_cur = np.empty_like(dp_prev)
        dp_cur[:, 0] = i
        neq = (mat != key_codes[i - 1]).astype(np.int64)
        # substitution / deletion candidates are column-parallel...
        sub = dp_prev[:, :-1] + neq
        dele = dp_prev[:, 1:] + 1
        best = np.minimum(sub, dele)
        # ... insertion needs a left-to-right scan (prefix dependency).
        for j in range(1, maxlen + 1):
            np.minimum(best[:, j - 1], dp_cur[:, j - 1] + 1, out=dp_cur[:, j])
        dp_prev = dp_cur
    out = dp_prev[np.arange(n), lens]
    return out


def accuracy_padded(reference: str, test: str, pad: str = " ") -> float:
    """Reference-style accuracy after pad/truncate of ``test`` to len(ref).

    Encapsulates the equalisation idiom repeated at
    /root/reference/ocrfw/postprocessing.py:197-203 and
    /root/reference/evaluators.py:12-18.
    """
    if len(test) < len(reference):
        test = test + pad * (len(reference) - len(test))
    elif len(test) > len(reference):
        test = test[: len(reference)]
    return accuracy(reference, test)
