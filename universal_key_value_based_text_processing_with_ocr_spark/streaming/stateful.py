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


#: session gap in minutes — MUST stay equal to events_sessionize's default
#: (relational.py) because the batch operator is this one's oracle; thread
#: a different gap through make_sessionize_group, never by editing either
#: default alone (review finding: the 30 was a buried literal here).
DEFAULT_GAP_MINUTES = 30


def make_sessionize_group(gap_minutes: int = DEFAULT_GAP_MINUTES):
    """Build the applyInPandasWithState group function for a given gap —
    the parameter mirror of events_sessionize(gap_minutes=...)."""

    def _fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_minutes)

    return _fn


def _sessionize_group(key, pdfs, state: GroupState, gap_minutes: int = DEFAULT_GAP_MINUTES):
    gap_ns = gap_minutes * 60 * 1_000_000_000
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


def stateful_sessionize_stream(
    spark: SparkSession, events_path: str, gap_minutes: int = DEFAULT_GAP_MINUTES
) -> DataFrame:
    """Run sessionization as a stateful streaming query; returns the final
    per-user counts (update-mode memory sink, AvailableNow drain).
    ``gap_minutes`` mirrors events_sessionize's parameter so the batch
    operator remains this one's oracle at any setting."""
    import uuid

    schema = spark.read.parquet(events_path).schema
    parent, fname = str(Path(events_path).parent), Path(events_path).name
    stream = spark.readStream.schema(schema).option("pathGlobFilter", fname).parquet(parent)

    out = stream.groupBy("user_id").applyInPandasWithState(
        make_sessionize_group(gap_minutes),
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
