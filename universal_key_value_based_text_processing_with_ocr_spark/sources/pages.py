"""Distributed synthesis of the pages table.

``spark.range(n)`` -> mapInPandas(gen_page_row) — each executor synthesises
its own id-range, so the table materialises at any scale with zero driver
memory and byte-identical rows to the single-process generator (rows are a
pure function of (seed, doc_id))."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .synthdocs import PAGES_SCHEMA, gen_page_row, gen_page_row_skewed

_COLS = ["url", "warc_ts", "html", "text", "lang"]


def materialize_pages_parquet(
    spark, n: int, seed: int = 42, base_dir: str | None = None, variant: str = ""
) -> str:
    """Write (once) and return a parquet pages table for (seed, n).

    Benchmarks time the production pipeline shape — JVM parquet scan ->
    shuffle -> extract — so the synthetic source is materialised untimed
    and cached across runs.  ``variant="skew"`` materialises the
    adversarial skewed-corpus fixture (hot host carries 4x payloads)."""
    import tempfile
    from pathlib import Path

    base = Path(base_dir or tempfile.gettempdir())
    suffix = f"_{variant}" if variant else ""
    path = base / f"ukv_pages_seed{seed}_n{n}{suffix}.parquet"
    if not (path / "_SUCCESS").exists():
        parts = max(8, n // 500)
        row_fn = gen_page_row_skewed if variant == "skew" else gen_page_row
        synth_pages_df(
            spark, n, seed=seed, partitions=parts, row_fn=row_fn
        ).write.mode("overwrite").parquet(str(path))
    return str(path)


def synth_pages_df(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
    row_fn=gen_page_row,
) -> DataFrame:
    if partitions is None:
        partitions = max(2, min(spark.sparkContext.defaultParallelism * 2, max(1, n // 50)))
    ids = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [row_fn(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=_COLS)

    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)
