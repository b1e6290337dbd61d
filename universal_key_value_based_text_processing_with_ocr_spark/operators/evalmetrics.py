"""Extraction-quality evaluation: token-level precision/recall/F1.

The metric every extraction pipeline is tuned against (boilerplate-removal
benchmarks score candidate main text against a gold annotation as a token
multiset overlap).  Reference analog: the accuracy scorer the KTP matcher
uses per field (kvcore/textdist.py `accuracy`) — this is the corpus-scale,
whole-document version of the same judgment.

Scale notes: the multiset intersection is computed by exploding BOTH sides
to (id, token) partial counts — two map-side-combinable aggregations keyed
by (id, token) then id, so no reducer ever sees more than one document's
token tail and a 100 TB eval is the same plan as a 100 MB one.  A row-local
HOF formulation (aggregate over array_distinct x filter-count) would avoid
the shuffles but is O(distinct x len) per row — quadratic on exactly the
pathological documents an eval job must survive, so the linear
explode-and-combine shape is the deliberate choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the whitespace class shared with corpus_familiarity / gopher_quality so
#: every operator in the suite tokenises identically
_WS = r"[ \t\n\r\f]+"


def _tokens(col: F.Column) -> F.Column:
    return F.filter(F.split(col, _WS), lambda t: t != "")


def extraction_f1(
    pairs: DataFrame,
    gold_col: str = "gold_text",
    cand_col: str = "cand_text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-multiset precision/recall/F1 of ``cand_col`` against
    ``gold_col`` per document.

    n_common counts each token min(count_in_gold, count_in_cand) times
    (true multiset intersection — repeated navigation tokens cannot be
    credited more often than the gold contains them).  precision =
    common/cand, recall = common/gold, f1 the harmonic mean; all three
    NULL when their denominator is 0, rounded to 6 places for
    cross-engine stability.

    -> (id_col, n_gold, n_cand, n_common, precision, recall, f1)

    Plan: one union of the two exploded sides tagged into (gold_cnt,
    cand_cnt) partials -> groupBy (id, token) sums the tags (combinable)
    -> groupBy id folds least(gold, cand) (combinable) -> left join back
    onto the id spine so empty/NULL-text documents still report.  Both
    exchanges carry the document id in the key, so token skew ("the" in
    every document) cannot concentrate: each document's tokens land with
    that document.
    """
    base = pairs.select(
        id_col, F.col(gold_col).alias("_g"), F.col(cand_col).alias("_c")
    )
    side = lambda col, g, c: (  # noqa: E731 — local plumbing
        base.select(id_col, F.explode(_tokens(col)).alias("tok"))
        .select(id_col, "tok", F.lit(g).alias("gc"), F.lit(c).alias("cc"))
    )
    tagged = side(F.col("_g"), 1, 0).unionByName(side(F.col("_c"), 0, 1))
    per_tok = tagged.groupBy(id_col, "tok").agg(
        F.sum("gc").alias("gn"), F.sum("cc").alias("cn")
    )
    per_doc = per_tok.groupBy(id_col).agg(
        F.sum("gn").alias("n_gold"),
        F.sum("cn").alias("n_cand"),
        F.sum(F.least("gn", "cn")).alias("n_common"),
    )
    spine = base.select(id_col)
    prec = F.when(
        F.col("n_cand") > 0, F.round(F.col("n_common") / F.col("n_cand"), 6)
    )
    rec = F.when(
        F.col("n_gold") > 0, F.round(F.col("n_common") / F.col("n_gold"), 6)
    )
    f1 = F.when(
        F.col("n_common") > 0,
        F.round(
            2.0 * F.col("n_common") / (F.col("n_gold") + F.col("n_cand")), 6
        ),
    ).otherwise(
        # n_common == 0 with any tokens on either side is a genuine 0.0;
        # only a doc empty on BOTH sides has no defined score
        F.when((F.col("n_gold") + F.col("n_cand")) > 0, F.lit(0.0))
    )
    return spine.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_gold"), F.lit(0)).cast("long").alias("n_gold"),
        F.coalesce(F.col("n_cand"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )
