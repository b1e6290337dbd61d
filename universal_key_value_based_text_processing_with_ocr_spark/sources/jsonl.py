"""JSONL (newline-delimited JSON) source/sink — the interchange format web
training pipelines actually move corpora in (Common Crawl derivatives,
RedPajama/Dolma shards are jsonl.gz).

Spark-first: the sink is the NATIVE distributed json writer (one shard per
partition, gzip-codec'd, written from the executors — never a driver
collect) and the source is the native json reader pinned to an EXPLICIT
schema.  The wrapper exists to enforce the two at-scale contracts the raw
one-liners silently break:

- **No schema inference.**  ``spark.read.json`` without a schema runs a
  full extra pass over the corpus to infer one — at 100 TB that doubles
  the scan, and a single odd shard can flip a column's inferred type and
  break every downstream cast.  ``scan_jsonl`` therefore REQUIRES a DDL
  schema string.
- **Corrupt-record quarantine, not stage failure.**  Real jsonl.gz shards
  contain truncated lines, stray carriage returns, and half-written
  records from upstream crashes.  ``scan_jsonl`` reads PERMISSIVE with a
  ``_corrupt_record`` column and ``split_corrupt`` separates clean rows
  from an auditable quarantine frame (same posture as the WARC parser's
  hardened record loop, sources/warc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame, out_dir: str, shards: int = 8, shard_col: str | None = None,
    gzip_files: bool = True,
) -> None:
    """Distributed JSONL sink: ``shards`` files written by the executors
    via the native json writer (mode overwrite).  ``shard_col`` hash-
    routes rows to shards for locality-stable layouts; without it, an
    AQE-coalesced round-robin repartition balances shard sizes."""
    parted = (
        df.repartition(shards, F.col(shard_col)) if shard_col else df.repartition(shards)
    )
    w = parted.write.mode("overwrite")
    if gzip_files:
        w = w.option("compression", "gzip")
    w.json(out_dir)


def scan_jsonl(spark: SparkSession, path_glob: str, schema: str) -> DataFrame:
    """Explicit-schema JSONL scan with corrupt-record quarantine.

    ``schema`` is a DDL string of the EXPECTED columns; the frame returned
    carries them plus ``_corrupt_record`` (NULL for clean rows, the raw
    line for rows that failed to parse or type-check).  PERMISSIVE: a bad
    line yields one quarantined row, never a task failure.

    Implementation detail that matters downstream: this reads through the
    TEXT source + ``from_json`` rather than ``spark.read.json``.  The
    native json scan refuses any plan whose referenced columns collapse to
    just ``_corrupt_record`` (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — which is
    exactly what Catalyst's column pruning produces for the obvious
    ``clean.count()`` / ``bad.count()`` audit queries, so the one-liner
    breaks the moment anyone counts the quarantine.  ``from_json`` is an
    ordinary expression with no such restriction, parses the same Jackson
    path, and the text source decodes .gz shards transparently.  Blank
    lines are dropped (the native reader's behaviour; the json writer
    never emits them)."""
    if not schema or not schema.strip():
        raise ValueError(
            "scan_jsonl requires an explicit DDL schema: schema inference "
            "is a full extra corpus scan and type-unstable across shards"
        )
    full = f"{schema}, {CORRUPT_COL} string"
    raw = spark.read.text(path_glob).filter(F.length(F.trim(F.col("value"))) > 0)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j")
    )
    return parsed.select("j.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, quarantine_frame).

    The quarantine frame carries ``raw`` (the offending line) plus the
    typed columns (NULL or partially parsed) for the audit."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"), *data_cols
    )
    return clean, bad
