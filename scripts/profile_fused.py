"""Decompose the fused extract stage cost at local[N] (VERDICT r2 #2).

Stages measured independently on the SAME materialised parquet input,
best-of-R interleaved:

  scan_count      parquet scan -> count (JVM only, no shuffle)
  scan_shuffle    scan -> salted repartition -> count (adds the one shuffle)
  arrow_identity  scan -> repartition -> mapInPandas(identity-ish: return
                  url+n_bytes per row, no kvcore work) — adds Arrow
                  round-trip + Python worker dispatch
  extract_full    the production fused stage

and the same extract_full under different arrow.maxRecordsPerBatch values.
The kernel ceiling (multiprocessing, no framework) for the same docs comes
from scripts/scaling_bench.py; here we print docs/sec per variant so the
gap can be attributed: kernel-vs-extract_full minus arrow_identity minus
shuffle = pure framework tax.

Usage: python scripts/profile_fused.py [n_docs] [cpus] [reps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pandas as pd


def identity_batches(batches):
    for pdf in batches:
        yield pd.DataFrame(
            {"url": pdf["url"], "n_bytes": [len(h) if h is not None else 0 for h in pdf["html"]]}
        )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from bench import build_spark

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from universal_key_value_based_text_processing_with_ocr_spark.operators.extract import (
        extract_pages,
    )
    from universal_key_value_based_text_processing_with_ocr_spark.plans.partitioning import (
        salted_repartition,
    )
    from universal_key_value_based_text_processing_with_ocr_spark.sources.pages import (
        materialize_pages_parquet,
        synth_pages_df,
    )

    extract_pages(synth_pages_df(spark, 128, partitions=cpus)).count()  # warmup
    pages_path = materialize_pages_parquet(spark, n_docs)

    def scan():
        return spark.read.parquet(pages_path)

    def repart():
        return salted_repartition(scan(), cpus * 2)

    variants = {
        "scan_count": lambda: scan().count(),
        "scan_shuffle": lambda: repart().count(),
        "arrow_identity": lambda: repart()
        .select("url", "html")
        .mapInPandas(identity_batches, "url string, n_bytes long")
        .count(),
        "extract_full": lambda: extract_pages(repart()).count(),
    }
    best: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            fn()
            best[name] = min(best.get(name, 9e9), time.time() - t0)
    out = {k: {"sec": round(v, 3), "docs_per_sec": round(n_docs / v, 1)} for k, v in best.items()}
    print(json.dumps({"decompose": out, "n_docs": n_docs, "cpus": cpus}))
    spark.stop()

    # --- Arrow batch-size sweep on the full stage ------------------------
    sweep = {}
    for batch in (128, 256, 512, 1024, 4096):
        from pyspark.sql import SparkSession

        s = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"profile-batch-{batch}")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
        extract_pages(synth_pages_df(s, 128, partitions=cpus)).count()
        t_best = 9e9
        for _ in range(reps):
            pages = salted_repartition(s.read.parquet(pages_path), cpus * 2)
            t0 = time.time()
            extract_pages(pages).count()
            t_best = min(t_best, time.time() - t0)
        sweep[batch] = {"sec": round(t_best, 3), "docs_per_sec": round(n_docs / t_best, 1)}
        s.stop()
    print(json.dumps({"arrow_batch_sweep": sweep}))


if __name__ == "__main__":
    main()
