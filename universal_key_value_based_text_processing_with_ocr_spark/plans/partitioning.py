"""Partitioning & skew policy (north_rule: explicit bucket-by-url
partitioning + salted repartition for skewed hosts).

Why salting even though urls are unique: hash(url) balances ROW COUNTS, but
per-row work is proportional to payload size and host-correlated (one hot
host can carry 40%+ of rows with systematically larger pages).  Salting the
partition key with a per-host rotating salt spreads any single host across
``salt_buckets`` partitions, so a hot host cannot serialise into one task.
At 100 TB the same expression is the bucket transform on the Iceberg table
(bucket(N, url)); AQE handles residual skew for joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_of_url(col):
    """Host component of an https?://host/path url column."""
    return F.regexp_extract(col, r"^[a-z]+://([^/]+)/", 1)


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    url_col: str = "url",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Repartition by (host, per-host salt) — skew-proof, one shuffle.

    The salt is ``xxhash64(url) % salt_buckets``: deterministic per row and
    uniform within each host, so a hot host spreads across many shuffle keys
    while rows stay host-taggable for downstream per-host aggregation
    (partial/map-side aggs handle the spread).

    ``salt_buckets`` defaults to ``num_partitions * 16``.  The granularity
    MUST scale with the partition count: measured on this host, a fixed 16
    buckets over ~50 hosts makes ~800 chunky shuffle keys for 128 partitions
    and the balls-in-bins variance yields 5-20x partition skew (45..1026
    rows around a 187 mean) — stragglers then cap the whole fused extract
    stage at ~40% of its balanced throughput.  With keys ~= rows the
    partition sizes converge to the multinomial mean.  One shuffle;
    everything downstream is narrow.
    """
    if salt_buckets is None:
        salt_buckets = max(16, num_partitions * 16)
    salt = (F.xxhash64(F.col(url_col)) % salt_buckets).cast("int")
    return df.repartition(num_partitions, host_of_url(F.col(url_col)), salt)


def plan_partitions(
    n_rows: int,
    min_parallelism: int = 32,
    parallelism_factor: int = 2,
    min_rows_per_partition: int = 100,
    max_rows_per_partition: int = 50_000,
    max_partitions: int = 65536,
) -> int:
    """Partition count for the fused extract stage.

    Policy (each bound is measurement- or resource-grounded):

    - BASELINE ``min_parallelism * parallelism_factor``: 2x cores was the
      measured optimum at every level probed (best-of-3 interleaved, 24k
      docs: 1-2x cores sustain 3.4-3.6k docs/s at local[32] while 4-16x
      drop to 2.2-2.6k; per-task Arrow/dispatch overhead dominates small
      tasks).  Round 3 also measured the cost of ignoring this at LOW
      parallelism: the end-to-end job previously planned ~row-count/400
      partitions, which at local[2] meant 30 task waves and dragged the
      full-job N->4N efficiency to ~0.79 vs the 0.96 of the 2x-cores
      stage bench.  2x still leaves AQE/speculation room to rebalance a
      straggling payload tail.  Round 4 re-probed 1x vs 2x twice
      (scripts/sweep_arrow.py, then a same-session A/B on the uniform AND
      skew fixtures): each window picked a different winner within ±17%,
      i.e. the choice is inside host drift — MEASURED AMBIGUOUS, do not
      re-litigate without a quieter host.  The same sweep pinned two real
      effects: arrow batch 512 >= 1024 > 2048/4096, and disabling
      python worker reuse costs ~17% at 64 tasks (worker-attach cost —
      keep reuse on).
    - FLOOR ``n_rows / min_rows_per_partition``: a small resume batch is
      never sprayed over near-empty partitions (sub-100-row tasks are pure
      overhead); tiny inputs never get more partitions than rows.
    - CEILING ``n_rows / max_rows_per_partition``: bounds the shuffle
      block per partition (~50k rows * ~2 KB payload ~ 100 MB).  Worker
      MEMORY is not the concern — the Arrow stage streams
      maxRecordsPerBatch-row batches regardless of partition size.
    - ABSOLUTE CAP ``max_partitions`` (64k tasks, a real scheduler's
      per-stage budget): above it rows-per-partition grows with input; at
      10^12 docs one raises min_parallelism (more executors), not the cap.
    """
    lower = max(1, min(n_rows, min_parallelism))
    want = max(lower, min_parallelism * parallelism_factor)
    # never create sub-min_rows tasks beyond the per-core floor
    want = min(want, max(lower, n_rows // min_rows_per_partition))
    # but always enough partitions to bound the shuffle block size
    by_max_rows = (n_rows + max_rows_per_partition - 1) // max_rows_per_partition
    want = max(want, by_max_rows)
    return max(1, min(want, max_partitions, max(n_rows, 1)))


def widen_small_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread a narrow-parallelism scan across the cluster BEFORE a
    CPU-heavy per-row stage (guide §2.5 "input skew: one huge
    unsplittable file ... repartition immediately after the read").

    The sf fixtures are single-row-group parquet files, so every scan
    plans ONE split no matter what ``spark.sql.files.maxPartitionBytes``
    says — and a fused mapInPandas/decode stage then runs on one core of
    the whole cluster.  This helper repartitions to
    ``defaultParallelism`` ONLY when the scan's planned parallelism is
    below it, keyed on ``key_cols`` (a high-cardinality id — hash keys
    ~= rows, so partition sizes converge to the multinomial mean, §2.5's
    synthetic-key rule).  Scale-adaptive by construction: a 100 TB input
    plans thousands of splits, the gate sees parallelism >= cluster width
    and the function is the identity — no payload ever reshuffles at
    scale.  Deterministic keys (never round-robin on rand) keep retries
    duplicate-free (SPARK-38388).
    """
    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
        if have >= want:
            return df
        # only FILE-backed scans are widened: an in-memory local relation
        # (createDataFrame fixtures, literal tables) is small by
        # construction and several operator contracts pin its plan
        # narrow; the unsplittable-input problem this helper solves is a
        # property of file row groups.
        if not df.inputFiles():
            return df
    except Exception:  # unresolvable plan (streaming, etc.) — leave as-is
        return df
    return df.repartition(want, *[F.col(c) for c in key_cols])
