"""Distributed BPE merge-step statistics (tokenizer training at corpus
scale).

Training a byte-pair-encoding tokenizer is an iterated count: at every
merge step, count adjacent symbol pairs across the corpus weighted by
word frequency and merge the argmax (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").  The count is
THE distributed part — at 100 TB it is the job; the merge itself is a
driver-side argmax over a vocabulary-sized table.  This module gives
that count the scale-correct Spark shape:

1. ``word_counts``: corpus -> (word, n) vocabulary.  The ONLY
   corpus-sized shuffle, and it is a map-side-combinable groupBy — the
   classic word-count plan (partial_count per task, one exchange on
   the word key).  Hot words ('the') are absorbed map-side.
2. ``bpe_pair_counts``: pair statistics from the VOCABULARY, never the
   corpus — each distinct word explodes into its ``len-1`` adjacent
   character bigrams exactly once, weighted by its corpus count.  A
   1 B-document corpus has a ~10^7-row vocabulary, so the pair stage
   is ~10^-5 of the corpus regardless of scale; this vocab-first
   factoring is what makes distributed BPE training tractable (the
   naive corpus-level pair explode would be ~5x the corpus in rows).
3. ``top_pairs``: the merge candidates — deterministic total order
   (count DESC, pair ASC) via TakeOrdered, no global sort.

Reference analog: the engine's key dictionaries are frequency-ranked
token tables built from observed OCR text (kvcore/dictionaries.py);
a BPE merge table is the same artifact one level down — a learned
subword dictionary — produced by the same count-then-rank move.

Integer-exact throughout (BIGINT sums, no floats), so any engine
replays it bit-for-bit: the DuckDB oracle runs the identical
count/explode arithmetic.

Word-length pathology: crawl junk (base64 blobs, minified JS) yields
megabyte "words" whose pair explode is quadratic garbage; words longer
than ``MAX_WORD_LEN`` are dropped (not truncated — a truncated blob is
still junk), the same documented-divergence contract as the robots /
table caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: longest word admitted to the vocabulary (see module docstring).
MAX_WORD_LEN = 64

#: words are maximal ``[a-z0-9]+`` runs of the lowercased text — the
#: ASCII-stable convention shared with the DuckDB oracle (multilingual
#: pretokenisers slot in here; the pair arithmetic downstream is
#: alphabet-agnostic).
WORD_SPLIT_RE = "[^a-z0-9]+"


def word_counts(
    docs: DataFrame, text_col: str = "text", max_word_len: int = MAX_WORD_LEN
) -> DataFrame:
    """(word, n): corpus vocabulary with frequencies — one combinable
    shuffle on the word key."""
    w = F.explode(F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE)).alias("word")
    return (
        docs.select(w)
        .where((F.col("word") != "") & (F.length("word") <= max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", max_word_len: int = MAX_WORD_LEN
) -> DataFrame:
    """(pair, pair_count, n_forms): adjacent character-bigram statistics
    for the first BPE merge step.  ``pair_count`` is the corpus-weighted
    occurrence count (the quantity BPE argmaxes); ``n_forms`` counts
    occurrence slots across distinct word forms (how widely the pair is
    spread through the vocabulary — high count + low spread = one viral
    word, a signal tokenizer builders inspect before merging).

    The explode runs over the vocabulary produced by ``word_counts``,
    so its Generate fan-out is (vocab rows x word length), independent
    of corpus size; the closing groupBy is again map-side combinable.
    A word of length 1 contributes nothing (CASE guard — Spark's
    ``sequence(1, 0)`` would DESCEND, not return empty).
    """
    vocab = word_counts(docs, text_col, max_word_len)
    pairs = F.expr(
        "CASE WHEN length(word) < 2 THEN array() "
        "ELSE transform(sequence(1, length(word) - 1), "
        "               i -> substring(word, i, 2)) END"
    )
    return (
        vocab.select(F.col("n"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(
            F.sum("n").alias("pair_count"),
            F.count(F.lit(1)).alias("n_forms"),
        )
    )


def top_pairs(pair_stats: DataFrame, k: int = 50) -> DataFrame:
    """The k best merge candidates in a deterministic total order
    (count DESC, pair ASC — byte-reproducible across engines).  orderBy
    + limit compiles to TakeOrderedAndProject: each task keeps a k-heap,
    the driver merges k*tasks rows — never a global sort."""
    return pair_stats.orderBy(
        F.col("pair_count").desc(), F.col("pair").asc()
    ).limit(k)


#: example inference merge table (ordered, highest priority first): the
#: most frequent English character bigrams, the shape ``learn_merges``
#: produces from a real corpus.  Literal constants so the SQL oracle can
#:  embed the identical chain and cross-check the SEMANTICS with its own
#: string engine.
DEFAULT_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("t", "i"), ("s", "t"), ("an", "d"), ("o", "u"),
    ("in", "g"),
]


def merge_replace_chain(col, merges):
    """Apply an ordered BPE merge list to a BRACKETED symbol string as a
    chain of literal replaces — the whole tokenizer inference step stays
    inside whole-stage codegen: no UDF, no shuffle, no Python.

    Encoding semantics (defined here, deterministic): each merge
    ``(x, y) -> xy`` is ONE global leftmost-non-overlapping pass over the
    text, in priority order.  The self-delimited ``[x][y]`` form is what
    makes a plain substring replace correct: every token carries its own
    brackets, so adjacent matches never share a boundary character
    (``[a][a][a]`` -> ``[aa][a]``, leftmost first) and a pair can never
    match across a word separator (separators are bracketed too but no
    merge contains one).
    """
    out = col
    for x, y in merges:
        out = F.replace(out, F.lit(f"[{x}][{y}]"), F.lit(f"[{x}{y}]"))
    return out


def bpe_encode(
    docs: DataFrame,
    merges=None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer INFERENCE at corpus scale: (id, tokens, n_tokens) where
    ``tokens`` is the space-joined subword sequence after applying the
    ordered ``merges``.

    Scale shape: a pure column-expression pipeline — lowercase ->
    word-separator normalisation -> per-char bracketing (one regexp) ->
    the literal-replace merge chain -> bracket-group extraction.  ZERO
    Python, ZERO exchanges, embarrassingly parallel; the plan is one
    Project over the scan.  This is the piece that runs over 100 TB, so
    it must not be a UDF; the iterated TRAINING loop (``learn_merges``)
    is vocabulary-sized and driver-side, exactly like mainstream
    tokenizer trainers.
    """
    if merges is None:
        merges = DEFAULT_MERGES
    # words are the same maximal [a-z0-9]+ runs as word_counts; separators
    # collapse to one space whose bracketed form '[ ]' is inert (no merge
    # contains a space)
    norm = F.regexp_replace(F.lower(F.col(text_col)), WORD_SPLIT_RE, " ")
    bracketed = F.regexp_replace(norm, "(.)", "[$1]")
    merged = merge_replace_chain(bracketed, merges)
    toks = F.filter(
        F.regexp_extract_all(merged, F.lit(r"\[([^\]]+)\]"), 1),
        lambda x: x != F.lit(" "),
    )
    return docs.select(
        F.col(id_col),
        F.array_join(toks, " ").alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


#: vocabulary-size guard for the driver-side trainer: word_counts output
#: beyond this is a sign the pretokeniser is broken (junk words), not a
#: bigger corpus — vocabularies grow ~log with corpus size.
MAX_TRAIN_VOCAB = 2_000_000


def learn_merges(vocab: DataFrame, n_merges: int = 50) -> list:
    """Classic BPE training (Sennrich et al. 2016) over a ``word_counts``
    vocabulary: repeatedly merge the (count DESC, pair ASC)-best adjacent
    symbol pair.  The corpus-sized work already happened in word_counts'
    one combinable shuffle; THIS loop is vocabulary-sized and runs on the
    driver — the same division of labour as mainstream tokenizer
    trainers, which train from an in-memory word-frequency table.

    Deterministic: the tie-break is total, so the merge list is a pure
    function of the vocabulary.  Raises ValueError past MAX_TRAIN_VOCAB
    (junk-word explosion — fix the pretokeniser, don't buy a bigger
    driver)."""
    rows = vocab.limit(MAX_TRAIN_VOCAB + 1).collect()
    if len(rows) > MAX_TRAIN_VOCAB:
        raise ValueError(
            f"vocabulary exceeds MAX_TRAIN_VOCAB={MAX_TRAIN_VOCAB}; "
            "the pretokeniser is admitting junk words"
        )
    words = {}
    for r in rows:
        words[tuple(r["word"])] = words.get(tuple(r["word"]), 0) + r["n"]
    merges = []
    for _step in range(n_merges):
        counts: dict = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        x, y = best
        out = {}
        for sym, n in words.items():
            if len(sym) > 1:
                lst = []
                i = 0
                while i < len(sym):
                    # leftmost-non-overlapping, same pass semantics as
                    # merge_replace_chain
                    if i + 1 < len(sym) and sym[i] == x and sym[i + 1] == y:
                        lst.append(x + y)
                        i += 2
                    else:
                        lst.append(sym[i])
                        i += 1
                sym = tuple(lst)
            out[sym] = out.get(sym, 0) + n
        words = out
    return merges
