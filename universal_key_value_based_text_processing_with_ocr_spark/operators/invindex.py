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
