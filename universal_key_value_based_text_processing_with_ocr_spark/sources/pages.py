"""Distributed synthesis of the pages table.

``spark.range(n)`` -> mapInPandas(gen_page_row) — each executor synthesises
its own id-range, so the table materialises at any scale with zero driver
memory and byte-identical rows to the single-process generator (rows are a
pure function of (seed, doc_id))."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .synthdocs import PAGES_SCHEMA, gen_page_row

_COLS = ["url", "warc_ts", "html", "text", "lang"]


def materialize_pages_parquet(spark, n: int, seed: int = 42, base_dir: str | None = None) -> str:
    """Write (once) and return a parquet pages table for (seed, n).

    Benchmarks time the production pipeline shape — JVM parquet scan ->
    shuffle -> extract — so the synthetic source is materialised untimed
    and cached across runs."""
    import tempfile
    from pathlib import Path

    base = Path(base_dir or tempfile.gettempdir())
    path = base / f"ukv_pages_seed{seed}_n{n}.parquet"
    if not (path / "_SUCCESS").exists():
        parts = max(8, n // 500)
        synth_pages_df(spark, n, seed=seed, partitions=parts).write.mode("overwrite").parquet(
            str(path)
        )
    return str(path)


def synth_pages_df(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    if partitions is None:
        partitions = max(2, min(spark.sparkContext.defaultParallelism * 2, max(1, n // 50)))
    ids = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_page_row(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=_COLS)

    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)
