"""Canonical benchmark/driver SparkSession builder.

One definition shared by bench.py and scripts/scaling_bench.py so the
measured session configuration (shuffle partitions, AQE, Arrow batch
size, timezone) lives inside the measured package: the scaling bench's
accumulation key hashes this module, and a config change here correctly
resets the accumulated sample, while edits to bench.py's reporting
plumbing do not.
"""

from __future__ import annotations

import os


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("engine-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
