"""Iceberg-shaped lakehouse layer over Parquet (snapshots, atomic commit,
resume).  A real Iceberg catalog slots in behind the same API when the
iceberg-spark-runtime jar is available (not in this container)."""

from .catalog import ConflictError, SnapshotTable
