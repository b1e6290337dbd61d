"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k per query (the correctness
  baseline) — a broadcast-able cross join + per-row vectorised dot product
  in JVM expressions (zip_with/aggregate; no Python), then a per-query
  window top-k.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane-free LSH via
  md5-sign buckets over coarse quantisation (sign of selected components),
  probing only same-bucket candidates.  Sub-linear candidate sets at the
  cost of recall; bucket key is engine-reproducible.
- ``embedding_near_dup``: near-duplicate pairs with cosine >= threshold.

At 100 TB the brute-force variant broadcasts the (small) query set and
scans the corpus once — linear, shuffle-free except the final top-k
aggregation; the bucketed variant shuffles once on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbours for the first ``n_queries`` vectors.

    Returns (query_id, neighbor_id, rank) with rank 1..k, self excluded;
    ties broken by neighbor_id for determinism."""
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    corpus = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q"), F.col("e")) / (_norm(F.col("q")) * _norm(F.col("e")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Pairs (vec_a < vec_b) with rounded cosine >= threshold."""
    a = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.8,
    dims: tuple[int, ...] = (0, 7, 21, 42),
) -> DataFrame:
    """Sub-quadratic near-duplicate pairs: sign-bucket LSH with Hamming-1
    multi-probe, cosine computed only inside candidate buckets.

    Candidate rule: two vectors are compared iff their sign buckets differ in
    at most ONE of the ``dims`` bits (multi-probe widens recall beyond exact
    bucket equality).  One side explodes its bucket into the |dims|+1 probe
    keys and the pair generation is a plain equi-join on the probe key —
    shuffle-partitioned by bucket, O(sum of bucket_size * probes) work, never
    the all-pairs crossJoin of ``embedding_near_dup`` (kept as the small-N
    exact oracle).  At 100 TB, add bits to ``dims`` to keep buckets bounded.
    """
    b = embeddings.select(
        "vec_id", "embedding", sign_bucket(F.col("embedding"), dims).alias("bucket")
    )
    left = b.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    probe_keys = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(len(dims))]
    )
    right = b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.explode(probe_keys).alias("probe"),
    )
    # hamming(a,b)==d<=1 matches exactly one probe key, so no pair dedup needed
    return (
        left.join(right, (F.col("bucket") == F.col("probe")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def sign_bucket(embedding, dims: tuple[int, ...] = (0, 7, 21, 42)) -> F.Column:
    """Coarse LSH bucket: sign bits of selected components packed to an int.

    A tiny, reproducible stand-in for random-hyperplane LSH (the hyperplanes
    are axis-aligned); recall grows with multi-probe over adjacent buckets."""
    key = F.lit(0)
    for i, d in enumerate(dims):
        key = key + F.when(F.element_at(embedding, d + 1) >= 0, F.lit(1 << i)).otherwise(0)
    return key


def lsh_bucketed_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket."""
    with_bucket = embeddings.withColumn("bucket", sign_bucket(F.col("embedding")))
    queries = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"), F.col("bucket").alias("qb")
    )
    corpus = with_bucket.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"), "bucket"
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("qb") == F.col("bucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q"), F.col("e")) / (_norm(F.col("q")) * _norm(F.col("e")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
