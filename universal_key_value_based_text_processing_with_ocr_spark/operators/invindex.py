"""Distributed inverted-index construction (positional postings).

The retrieval-side companion of ``importance.bm25_score``: build the
(term -> postings) structure a search/RAG stack needs over a training
corpus — one posting row per (term, doc) with the term's positions
inside the document, plus the term's document frequency.  Emitting the
index as a TABLE of posting rows (not driver-side lists) is exactly how
it ships at scale: partitioned parquet keyed by term, each row a
posting, consumers range-scan one term's rows.

Plan shape (two combinable shuffles, both on bounded keys):
  posexplode tokens -> groupBy(term, doc) [tf + sorted positions]
                    -> groupBy(term)      [df]  -> broadcast-threshold
``max_df`` caps viral terms (stopwords): a term in more than
``max_df`` distinct documents is dropped from the index — the standard
stop-list discipline, and the same skew bound the jaccard/paragraph
dedup family uses (a stopword's posting list at 100 TB is a single
giant group no consumer would read anyway).  The df agg runs on the
ALREADY (term, doc)-deduplicated rows, so the viral term's rows never
concentrate on one reducer beyond the first combinable agg.

Reference analog: the engine's key dictionaries map each key to the
token windows it matched (kvcore/matching.py builds per-key candidate
lists per document); the inverted index is that mapping materialised
corpus-wide.

Determinism: positions are token indices from ``posexplode`` (split
order — total and reproducible), ``array_sort`` pins the list order,
and tf/df are integer counts: every column is bit-reproducible across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .importance import TOKEN_SPLIT


def build_inverted_index(
    docs: DataFrame,
    max_df: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, doc_id, tf, positions, df) posting rows; terms with
    df > max_df dropped (stop-list discipline / skew bound)."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT),
                lambda w: w != "",
            )
        ).alias("pos", "term"),
    )
    postings = toks.groupBy("term", id_col).agg(
        F.count("*").cast("long").alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("positions"),
    )
    # df from a LEAN pair-distinct subtree (no positions payload): both
    # aggs are map-side combinable, so a viral term never concentrates
    # raw occurrences, and the expensive collect_list subtree is built
    # exactly once
    df_tbl = (
        toks.select("term", id_col)
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    # broadcast the STOP LIST (tiny: only df>max_df terms), never the
    # vocabulary-sized df table; after the anti-join every term carries
    # <= max_df posting rows, so the df-attach shuffle join is
    # skew-bounded by construction
    viral = df_tbl.where(F.col("df") > max_df).select("term")
    return (
        postings.join(F.broadcast(viral), "term", "left_anti")
        .join(df_tbl, "term")
        .select("term", id_col, "tf", "positions", "df")
    )


def phrase_search(index: DataFrame, phrase: list, id_col: str = "doc_id") -> DataFrame:
    """Exact-phrase retrieval over the POSITIONAL index: (doc, n_occurrences,
    first_pos) for documents containing ``phrase``'s tokens adjacently —
    the query-side payoff of storing positions in the postings.

    Plan shape: one selection per phrase term from the SAME index relation
    (the term equality is pushed into the scan — a k-term phrase reads k
    posting slivers, never the index), k-1 equi-joins on the doc key over
    those slivers (broadcast-sized: a posting list, not a corpus), then the
    adjacency test as pure array arithmetic — each term's positions shift
    left by its phrase offset and the k sets intersect.  Document text is
    never touched.

    Duplicate terms in the phrase are handled naturally (the same posting
    row joins to itself under two aliases; the shifted intersections still
    demand distinct occurrence slots).
    """
    if not phrase:
        raise ValueError("phrase must contain at least one term")
    terms = [t.lower() for t in phrase]

    def _shift(offset):
        # MUST stay single-argument: pyspark.transform inspects the lambda's
        # arity and passes (element, ARRAY_INDEX) to two-parameter callables
        # — a `lambda p, _i=offset:` default would be silently overwritten
        # by the element's array index (found the hard way: 11 of 38 phrase
        # hits vanished)
        return lambda p: p - offset

    base = None
    shifted_cols = []
    for i, term in enumerate(terms):
        side = (
            index.where(F.col("term") == term)
            .select(
                F.col(id_col),
                F.transform(F.col("positions"), _shift(i)).alias(f"_s{i}"),
            )
        )
        shifted_cols.append(f"_s{i}")
        base = side if base is None else base.join(side, id_col)
    matches = F.col(shifted_cols[0])
    for c in shifted_cols[1:]:
        matches = F.array_intersect(matches, F.col(c))
    return (
        base.select(
            F.col(id_col),
            F.size(matches).alias("n_occurrences"),
            F.array_min(matches).alias("first_pos"),
        )
        .where(F.col("n_occurrences") > 0)
    )
