"""Corpus-level importance weighting and keyword scoring.

Two training-data-curation operators that score documents against the
corpus (or a target corpus) rather than in isolation:

- ``dsir_importance``: Data Selection via Importance Resampling (Xie et
  al. 2023, "Data Selection for Language Models via Importance
  Resampling") — hashed word-bigram features, per-bucket log-ratio of
  target vs raw corpus frequencies, per-document importance weight
  ``sum_b cnt_b * log(p_target(b) / p_raw(b))`` with add-1 smoothing.
- ``doc_keywords``: per-document top-k keyword extraction by an
  integer-exact tf-idf surrogate ``tf * (N - df)`` (linear idf), fully
  reproducible across engines because no float ever enters the ranking.

Scale shape (both): tokenise/explode -> map-side-combinable hash
aggregations; the only broadcast is the bucket-ratio table (``buckets``
rows) resp. nothing, and the only shuffles are keyed on (doc, feature)
and (feature) — the same two combinable exchanges as corpus_familiarity.
No UDFs anywhere; everything is codegen'd JVM expression work.

The hashed feature bucket reuses the dedup hash seam (``dedup._md5_long``)
so the DuckDB oracle replays the bucketing bit-for-bit on the md5 path
while production can flip to xxhash64.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_long

#: word-token split shared verbatim with the oracles: lowercase
#: alphanumeric runs (language-neutral, identical under Java regex and
#: DuckDB's RE2 — no classes that differ between the engines).
TOKEN_SPLIT = "[^a-z0-9]+"


def _word_bigrams(docs: DataFrame, id_col: str, keep_empty: bool = False) -> DataFrame:
    """(id, gram): adjacent lowercase word pairs, one row per occurrence.

    The sequence() guard matters: Spark's ``sequence(1, 0)`` DESCENDS
    instead of returning an empty array, so docs with fewer than two
    tokens must short-circuit to array() explicitly.

    ``keep_empty`` switches to ``explode_outer`` so featureless docs
    (NULL text or <2 tokens) survive as one NULL-gram row — the cheap way
    to keep every doc in a downstream per-doc aggregate without a second
    scan + join against the input.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT),
        lambda w: w != "",
    )
    grams = F.expr(
        "CASE WHEN size(_toks) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_toks) - 1), "
        "     i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1))) END"
    )
    exploder = F.explode_outer if keep_empty else F.explode
    # the tokenise+explode map side is CPU-bound and its subtree executes
    # once per downstream aggregate — spread single-split scans first
    # (identity at real scale, see widen_small_scan)
    from ..plans.partitioning import widen_small_scan

    return widen_small_scan(
        docs.select(F.col(id_col), toks.alias("_toks")), id_col
    ).select(id_col, exploder(grams).alias("gram"))


def hashed_ngram_features(
    docs: DataFrame, buckets: int = 1024, id_col: str = "doc_id", keep_empty: bool = False
) -> DataFrame:
    """(id, bucket, cnt): word-bigram occurrence counts hashed into
    ``buckets`` feature buckets (the DSIR featurisation).  With
    ``keep_empty``, featureless docs carry one (id, NULL, 1) row."""
    return (
        _word_bigrams(docs, id_col, keep_empty)
        .select(
            id_col,
            F.when(
                F.col("gram").isNotNull(),
                F.pmod(_md5_long(F.col("gram")), F.lit(buckets)),
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance weights of ``raw`` docs toward the
    ``target`` corpus distribution.

    Returns one row per raw document (featureless docs — NULL text or <2
    tokens — kept with zero masses and weight 0.0):

    - ``n_grams``: total bigram occurrences in the doc (BIGINT)
    - ``target_mass`` / ``raw_mass``: integer-exact dot products of the
      doc's bucket counts with the target/raw corpus bucket counts —
      engine-reproducible fidelity signals (a doc made of target-frequent
      buckets has high target_mass)
    - ``log_ratio_weight``: the actual DSIR weight
      ``sum_b cnt_b * [ln((t_b+1)/(T+K)) - ln((r_b+1)/(R+K))]`` (float;
      excluded from cross-engine oracles because summed logs are not
      bit-reproducible across engines)

    Plan: two map-side-combinable feature aggs, a ``buckets``-row ratio
    table broadcast onto the per-doc features, one final per-doc agg —
    no shuffle keyed on anything wider than (doc, bucket).  Featureless
    docs ride the same pipeline as a NULL-bucket feature row
    (explode_outer), so keeping every doc costs no extra scan or join.
    """
    rawf = hashed_ngram_features(raw, buckets, id_col, keep_empty=True)
    tgtf = hashed_ngram_features(target, buckets, id_col)

    real = F.col("bucket").isNotNull()
    r_c = rawf.filter(real).groupBy("bucket").agg(F.sum("cnt").alias("r_c"))
    t_c = tgtf.groupBy("bucket").agg(F.sum("cnt").alias("t_c"))
    totals = (
        r_c.agg(F.sum("r_c").alias("r_total"))
        .crossJoin(t_c.agg(F.sum("t_c").alias("t_total")))
    )
    ratio = (
        r_c.join(t_c, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "r_c",
            F.coalesce("t_c", F.lit(0)).alias("t_c"),
            (
                F.log((F.coalesce("t_c", F.lit(0)) + 1) / (F.col("t_total") + buckets))
                - F.log((F.col("r_c") + 1) / (F.col("r_total") + buckets))
            ).alias("log_lambda"),
        )
    )

    # left join: the NULL-bucket rows of featureless docs match nothing
    # and contribute zeros below, so every raw doc lands in the output
    return (
        rawf.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.when(real, F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_grams"),
            F.sum(F.col("cnt") * F.coalesce("t_c", F.lit(0)))
            .cast("long")
            .alias("target_mass"),
            F.sum(F.col("cnt") * F.coalesce("r_c", F.lit(0)))
            .cast("long")
            .alias("raw_mass"),
            F.sum(F.col("cnt") * F.coalesce("log_lambda", F.lit(0.0))).alias(
                "log_ratio_weight"
            ),
        )
    )


def doc_keywords(docs: DataFrame, k: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` keywords per document by the integer tf-idf surrogate
    ``score = tf * (N - df)`` (N = corpus document count, df = number of
    docs containing the term; linear idf in place of ln(N/df) so the
    ranking is integer-exact and reproduces bit-for-bit in any engine —
    ties broken by term ascending).

    Returns (id, rank, keyword, tf, df, score), rank 1..k.

    Plan: tf agg on (doc, term) [combinable]; df = count over the tf
    pairs — NOT count(distinct doc) over raw occurrences, so a viral term
    never piles its occurrences onto one reducer (the skew-safe
    pair-distinct-then-count shape shared with dedup_paragraphs); one
    term-keyed join; per-doc top-k via WindowGroupLimit (rank pushdown —
    no full sort of the score table).
    """
    from pyspark.sql.window import Window

    words = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), TOKEN_SPLIT), lambda w: w != "")
            ).alias("keyword"),
        )
    )
    tf = words.groupBy(id_col, "keyword").agg(F.count("*").alias("tf"))
    df = tf.groupBy("keyword").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "keyword")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "keyword",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs") - F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("keyword"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "keyword",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score").cast("long").alias("score"),
        )
    )


def bigram_lm_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Bigram-LM cross-entropy — the CCNet/fineweb "perplexity vs the
    corpus LM" quality signal (Wenzek et al. 2020 use KenLM; this is the
    same scoring rule with the corpus itself as training data and add-one
    smoothing, so it needs no external model file):

        P(w2 | w1) = (c(w1 w2) + 1) / (ctx(w1) + V)
        xent_bits  = -mean(log2 P) over the doc's bigram occurrences

    where c is the corpus bigram count, ctx(w1) the count of bigrams
    starting with w1, and V the distinct-context vocabulary size.  Low
    cross-entropy = fluent/common phrasing; high = gibberish or
    boilerplate soup.  Reuses the DSIR word-bigram featuriser verbatim.

    Determinism contract (same as ``dsir_importance``): every corpus
    statistic and per-doc mass is an exact integer — the driver oracle
    checks (n_bigrams, hit_mass, ctx_mass) bit-for-bit; the float
    ``xent_bits`` is a per-row log over those integers SUMMED in one agg
    and is pinned against an independent numpy replication in pytest
    (summation-order float noise ~1e-13 sits far below the 1e-6 round).

    Scale shape: one gram explode, two map-side-combinable count aggs
    (gram, context), a 1-row vocabulary broadcast, and re-joins keyed on
    gram/context — the corpus_familiarity shape one level up.  A viral
    bigram skews the join key, not a group: AQE skew-join splits it.
    """
    occ = _word_bigrams(docs, id_col).withColumn(
        "ctx_w", F.split_part(F.col("gram"), F.lit(" "), F.lit(1))
    )
    c12 = occ.groupBy("gram").agg(F.count("*").alias("c12"))
    ctx = occ.groupBy("ctx_w").agg(F.count("*").alias("ctx"))
    vocab = ctx.agg(F.count("*").alias("v"))
    scored = (
        occ.join(c12, "gram")
        .join(ctx, "ctx_w")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("c12").alias("hit_mass"),
            F.sum("ctx").alias("ctx_mass"),
            F.round(
                -F.sum(
                    F.log((F.col("c12") + 1).cast("double") / (F.col("ctx") + F.col("v")))
                )
                / F.count("*")
                / math.log(2),
                6,
            ).alias("xent_bits"),
        )
    )
    # featureless docs (NULL text / <2 tokens) survive with zero masses;
    # the id spine comes from the INPUT (unique by id), not a distinct
    # over the exploded grams — that would shuffle every gram row again
    ids = docs.select(id_col)
    return (
        ids.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("hit_mass", F.lit(0)).alias("hit_mass"),
            F.coalesce("ctx_mass", F.lit(0)).alias("ctx_mass"),
            "xent_bits",
        )
    )


def ccnet_buckets(
    docs: DataFrame, id_col: str = "doc_id", lang_col: str = "lang"
) -> DataFrame:
    """CCNet head/middle/tail corpus split (Wenzek et al. 2020 §4.4):
    per LANGUAGE, rank documents by how familiar their phrasing is to the
    corpus LM and cut the ranking into three equal-mass tiers — the split
    LLM recipes sample from ("head" for quality, "middle" to diversify).

    CCNet ranks by KenLM perplexity; this reuses the repo's corpus bigram
    signal with an integer-exact monotone surrogate so the driver oracle
    can hash-check every row: ``fam_score = (hit_mass * 10000) div
    max(n_bigrams, 1)`` — mean corpus-frequency of the doc's bigrams in
    1e-4 units (higher = more familiar = head; featureless docs score 0
    and land in their language's tail).  The float xent stays available
    from ``bigram_lm_score`` under the usual determinism split.  The
    10000 scale keeps the product within int64 for hit_mass up to ~9e14
    (a single doc's bigram corpus-frequency mass — far above any real
    corpus document).

    Scale shape: the bigram scorer's combinable aggs + one id-keyed join
    to re-attach the language, then ``grouped_quantile_buckets`` — the
    corpus is never globally sorted; only the per-language distinct-score
    histogram enters a window (relational.py docstring has the numbers).

    Returns (id, lang, fam_score, bucket 1..3, tier tail|middle|head).
    """
    from .relational import grouped_quantile_buckets

    scored = bigram_lm_score(docs, id_col).select(id_col, "hit_mass", "n_bigrams")
    base = (
        docs.select(id_col, lang_col)
        .join(scored, id_col)
        .select(
            id_col,
            lang_col,
            F.expr(
                "CAST((hit_mass * 10000) div greatest(n_bigrams, 1) AS BIGINT)"
            ).alias("fam_score"),
        )
    )
    tiers = grouped_quantile_buckets(base, "fam_score", lang_col, n_buckets=3)
    tier = F.element_at(
        F.array(F.lit("tail"), F.lit("middle"), F.lit("head")), F.col("bucket")
    )
    return tiers.select(id_col, lang_col, "fam_score", "bucket", tier.alias("tier"))


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance of every document to one term query (Robertson &
    Spärck Jones probabilistic ranking — the scoring rule behind Lucene
    and every "find training docs about X" corpus triage query):

        score = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    Reference analog: the engine's fuzzy key-dictionary RANKING (pick the
    best-matching key for a token window, kvcore/matching.py) lifted to
    corpus level: rank every document against a keyword dictionary.

    Determinism contract (the ``dsir_importance`` split): the driver
    oracle hash-checks the exact-integer retrieval masses per doc —
    ``doclen`` (token count), ``n_hit_terms`` (distinct query terms
    present), ``tf_mass`` (total query-term occurrences) — while the
    float ``bm25`` column (one division chain over those integers plus
    the two corpus scalars) is pinned against an independent numpy
    replication in pytest.

    Scale shape: tokens are exploded ONLY after an array_intersect guard
    against the (tiny, plan-inlined) query list, so the explode emits at
    most |query| rows per doc instead of doclen; df and avgdl are a
    q-row and a 1-row broadcast; the per-doc agg is map-side combinable.
    Nothing in the plan grows with corpus vocabulary.
    """
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_score needs at least one non-empty query term")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT),
        lambda w: w != "",
    )
    qlit = F.array(*[F.lit(t) for t in terms])
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").alias("doclen"),
        # keep ONLY query-term occurrences before the explode: the hot
        # path never materialises the full token stream as rows
        F.filter("_toks", lambda w: F.array_contains(qlit, w)).alias("_hits"),
    )
    # corpus scalars: N + avgdl in ONE tiny agg (broadcast, 1 row)
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("doclen").alias("len_mass")
    )
    hits = base.select(id_col, "doclen", F.explode("_hits").alias("term"))
    df_tbl = hits.groupBy("term").agg(F.count_distinct(F.col(id_col)).alias("df"))
    per_term = (
        hits.groupBy(id_col, "doclen", "term")
        .agg(F.count("*").alias("tf"))
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("len_mass").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / avgdl))
    )
    scored = per_term.groupBy(id_col).agg(
        F.count("*").alias("n_hit_terms"),
        F.sum("tf").alias("tf_mass"),
        F.round(F.sum(contrib), 6).alias("bm25"),
    )
    # id spine from the input: zero-hit docs score 0, never vanish
    return (
        base.select(id_col, "doclen")
        .join(scored, id_col, "left")
        .select(
            id_col,
            "doclen",
            F.coalesce("n_hit_terms", F.lit(0)).alias("n_hit_terms"),
            F.coalesce("tf_mass", F.lit(0)).alias("tf_mass"),
            F.coalesce("bm25", F.lit(0.0)).alias("bm25"),
        )
    )
