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
