"""Hive-style partitioned parquet sink + pruned scan.

The layout primitive every at-scale corpus store uses: write the table
``partitionBy(col)`` so each value becomes a directory
(``.../lang=en/part-*.parquet``), and any scan that filters on the
partition column reads ONLY those directories — the filter shows up as a
``PartitionFilters`` entry on the scan (asserted in
tests/test_plan_shapes.py) and the other partitions' files are never
opened, let alone decoded.  At 100 TB with a sensible partition key
(language, crawl date, source) this turns "scan everything and filter"
into "list one directory".

Partition-count discipline: a partition column must be LOW-CARDINALITY
(languages, dates — tens to thousands of values).  Partitioning by a
high-cardinality key (doc_id, host) creates millions of tiny files and
kills the file index; that guard is the caller's job and documented here
because it is the single most common partitioned-layout mistake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, out_dir: str, partition_col: str = "lang") -> None:
    """Write ``df`` as hive-layout parquet partitioned on ``partition_col``
    (mode overwrite).  Rows with NULL in the partition column land in the
    ``__HIVE_DEFAULT_PARTITION__`` directory — they survive the round-trip
    and read back as NULL."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(out_dir)


def scan_partition(
    spark: SparkSession, path: str, partition_col: str, value: str
) -> DataFrame:
    """Scan ONLY the ``partition_col = value`` slice of a partitioned
    layout.  Expressed as a plain filter so Catalyst turns it into a
    PartitionFilters entry — directory-level pruning, zero data files from
    other partitions touched."""
    from pyspark.sql import functions as F

    return spark.read.parquet(path).filter(F.col(partition_col) == value)
