"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction over /root/testdata/sf0.001:
treats the documents table as text-path pages (the reference's ``doc_str``
path, /root/reference/ocrfw/postprocessing.py:407-409) and runs the fused
extraction stage.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family (SURVEY.md §2 + the training-data pipeline operators); oracles are
DuckDB SQL over the same tables, plus committed golden parquet for the
extraction core (tests/golden, produced by the reference-parity-locked
pure-Python oracle).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

# Robust against being loaded by file path with an arbitrary cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_key_value_based_text_processing_with_ocr_spark.ship import (
    ship_package as _ship_package,
)

from universal_key_value_based_text_processing_with_ocr_spark import api
from universal_key_value_based_text_processing_with_ocr_spark.operators.extract import (
    extract_pages,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("testdata://documents/"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    return extract_pages(pages)


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, fn in api.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(api.ORACLE_SQL)
