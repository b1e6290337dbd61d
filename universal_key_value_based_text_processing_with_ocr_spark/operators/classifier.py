"""Linear text-classifier inference at corpus scale.

The model-based quality filter every recent pretraining corpus uses
(DCLM's fastText classifier, FineWeb-Edu's regression scorer): score
each document with a trained linear model over token features and gate
on the score.  Training happens offline; what the ENGINE must provide
is the inference shape — apply a (vocabulary -> weight) table to every
document of a 100 TB corpus:

    explode tokens -> broadcast-join the weight table -> per-doc sum

- The weight table is the model: one row per vocabulary token, integer
  fixed-point weights (units of 1e-6).  A real fastText vocab is ~1-4M
  rows — squarely broadcastable; the corpus side never shuffles on
  anything but (doc_id), and that agg is map-side combinable.
- Integer weights make the logit EXACT: the per-doc sum is a BIGINT,
  reproducible across engines and partitionings (the float
  ``sigmoid(logit)`` is a display column derived from the exact sum —
  same determinism split as dsir/bigram_lm).
- Out-of-vocabulary tokens contribute 0 (inner join drops them), the
  standard linear-model convention.

Reference analog: the engine's key-dictionary evaluators score a token
window against a fixed dictionary and keep the best
(kvcore/matching.py, kvcore/evaluate.py); this is the same
dictionary-driven scoring lifted to one linear pass per document.

``hash_weights`` builds a deterministic pseudo-model from the corpus
vocabulary via the dedup hash seam (md5 oracle path / xxhash64
production path) so tests and oracles can replay the exact weights
without shipping a trained artifact; production would load a real
weight table with the same (token, weight_fp) schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_long
from .importance import TOKEN_SPLIT

#: fixed-point weight scale: weight_fp is an integer in units of 1e-6.
WEIGHT_SCALE = 1_000_000


def hash_weights(docs: DataFrame, spread: int = 41) -> DataFrame:
    """Deterministic pseudo-model over the corpus vocabulary: for every
    distinct token,
    ``weight_fp = (md5_long(token) % spread - spread//2) * (SCALE/20)``
    — symmetric around 0 spanning roughly ±1.0 in real units.  Stands in
    for a trained fastText/logistic vocabulary; the md5 seam lets the
    DuckDB oracle replay it bit-for-bit."""
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT),
                lambda w: w != "",
            )
        ).alias("token")
    ).distinct()
    unit = WEIGHT_SCALE // 20
    return toks.select(
        "token",
        ((_md5_long(F.col("token")) % spread - spread // 2) * unit).alias(
            "weight_fp"
        ),
    )


def classify_documents(
    docs: DataFrame,
    weights: DataFrame,
    bias_fp: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the linear model ``weights`` (token ->
    weight_fp): ``logit_fp = bias + sum_t count(t) * weight_fp(t)`` —
    exact BIGINT.  Adds ``n_scored`` (token occurrences found in the
    vocabulary), float ``prob`` (sigmoid of the fixed-point logit, a
    derived display column), and ``label`` (logit >= 0).  Docs with no
    vocabulary hit score exactly ``bias``.

    Plan shape: explode -> broadcast inner join on token -> one
    map-side-combinable groupBy(id) -> left join back onto the id spine
    so empty/OOV-only docs never vanish.  Nothing shuffles except the
    (id) agg; the weight table is the only broadcast."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT),
                lambda w: w != "",
            )
        ).alias("token"),
    )
    scored = (
        toks.join(F.broadcast(weights), "token")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_scored"),
            F.sum("weight_fp").alias("_wsum"),
        )
    )
    logit = F.coalesce(F.col("_wsum"), F.lit(0)) + F.lit(bias_fp)
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
            logit.cast("long").alias("logit_fp"),
            # display column: float sigmoid over the EXACT integer logit
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-logit.cast("double") / WEIGHT_SCALE))
            ).alias("prob"),
            (logit >= 0).alias("label"),
        )
    )
