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
    target_rows_per_partition: int = 400,
    min_parallelism: int = 32,
    max_partitions: int = 65536,
) -> int:
    """Partition count from the input size.

    ``ceil(n_rows / target_rows_per_partition)`` clamped to
    [min(n_rows, min_parallelism), max(min_parallelism * 8, min(by_rows,
    max_partitions))]:

    - small inputs get at least ~one partition per core but never more
      partitions than rows (a resume batch must not become hundreds of
      near-empty shuffle partitions);
    - large inputs keep rows-per-partition at the target all the way up to
      ``max_partitions`` — the bound here is DRIVER SCHEDULING STATE (task
      count per stage), not executor memory: the fused stage streams Arrow
      batches of ``maxRecordsPerBatch`` rows, so per-worker memory is
      batch-bounded regardless of partition row count;
    - above ``max_partitions`` (default 64k tasks — comfortably inside a
      real scheduler's per-stage budget) rows-per-partition grows with input
      size; only shuffle-block size is affected, Arrow batching still bounds
      worker memory.

    The min_parallelism*8 term keeps the UPPER clamp from ever biting a
    medium input into fewer-than-useful partitions; the actual count for
    large inputs comes from the rows target.  The default target (~400 docs
    at ~3-5 ms/doc semantic-core cost) makes a task ~1.5-2 s.  Re-measured
    round 3 (best-of-3 interleaved, 24k docs, local[32], idle host): 1-2x
    cores partitions sustain 3.4-3.6k docs/s while 4-16x cores partitions
    drop to 2.2-2.6k — per-task Arrow/dispatch overhead dominates under
    ~100-row tasks, so round 2's "8x cores is +30%" was contention noise.
    2x-cores-sized tasks still leave AQE/speculation room to rebalance a
    straggling payload tail."""
    by_rows = max(1, (n_rows + target_rows_per_partition - 1) // target_rows_per_partition)
    lower = max(1, min(n_rows, min_parallelism))
    # max_partitions caps EVERYTHING (the rows target, the 8x-cores
    # straggler headroom, even the per-core lower bound): it is the
    # caller's scheduler budget, so no internal heuristic may exceed it.
    upper = max(1, min(max(lower, min_parallelism * 8, by_rows), max_partitions))
    return min(max(by_rows, lower), upper)
