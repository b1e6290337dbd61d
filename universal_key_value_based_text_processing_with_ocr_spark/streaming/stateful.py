"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (the engine's demonstration of arbitrary
per-group state in Structured Streaming, SURVEY.md §2j extension).

Semantics match ``operators.relational.events_sessionize`` exactly (a new
session opens when the gap to the previous event exceeds ``gap_minutes``;
events ordered by (ts, event_id)), so the batch oracle verifies the
streaming operator.  Over a single AvailableNow batch the emitted per-user
rows equal the batch plan's output; across multiple batches the state
carries (last_ts, n_sessions, n_events) forward.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ns long, n_sessions long, n_events long"


def _sessionize_group(key, pdfs, state: GroupState):
    gap_ns = 1800 * 1_000_000_000  # 30 minutes in ns
    if state.exists:
        last_ns, n_sessions, n_events = state.get
    else:
        last_ns, n_sessions, n_events = None, 0, 0

    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    for ts in batch["ts"]:
        ns = int(pd.Timestamp(ts).value)
        if last_ns is None or ns - last_ns > gap_ns:
            n_sessions += 1
        last_ns = ns
        n_events += 1

    state.update((last_ns, n_sessions, n_events))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_sessions": n_sessions, "n_events": n_events}]
    )


def stateful_sessionize_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """Run sessionization as a stateful streaming query; returns the final
    per-user counts (update-mode memory sink, AvailableNow drain)."""
    import uuid

    schema = spark.read.parquet(events_path).schema
    parent, fname = str(Path(events_path).parent), Path(events_path).name
    stream = spark.readStream.schema(schema).option("pathGlobFilter", fname).parquet(parent)

    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Single-file source -> one batch -> one row per user; dedupe defensively
    # by keeping the max-progress row per user in multi-batch scenarios.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )
