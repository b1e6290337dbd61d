"""Incremental (streaming) execution of the same logical plans.

The reference is strictly batch (SURVEY.md §2j); the engine's
streaming-like requirement is checkpoint/resume (lakehouse layer).  This
module additionally drives the windowed-aggregation plan as a genuine
Structured Streaming query — the idiomatic extension noted in SURVEY §2j:
``readStream`` over the source files with ``Trigger.AvailableNow``
semantics (drain everything, then stop), so the identical plan serves both
batch backfill and incremental tailing on a real cluster.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.columns import decimal_sum


def streamed_events_window_agg(spark: SparkSession, events_path: str) -> DataFrame:
    """Run the 5-minute window aggregation as a streaming query over the
    events parquet and return the final (complete-mode) result as a
    DataFrame.  Deterministic: the stream drains all available input."""
    schema = spark.read.parquet(events_path).schema
    # FileStreamSource requires a directory: stream the parent dir with a
    # glob filter pinned to this table's file(s).
    from pathlib import Path

    parent = str(Path(events_path).parent)
    fname = Path(events_path).name
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    agg = (
        stream.groupBy(F.window(F.col("ts"), "5 minutes").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), decimal_sum(F.col("value"), "decimal(18,6)").alias("sum_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"), "event_type", "n", "sum_value")
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
