"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints
ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "extraction_docs_per_sec": ...}

The extraction bench synthesises its pages table inside executors
(sources/pages.py) at a size proportional to sf, then runs the fused
extraction stage — the north-star workload.  Set SPARK_GRAFT_SCALING=1 to
also run the two-parallelism scaling measurement (see
scripts/scaling_bench.py, writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.0


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


def main() -> None:
    sf = sf_of(SF_DIR)
    n_docs = max(400, int(120000 * sf))  # sf0.1 -> 12000 synthetic pages

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from universal_key_value_based_text_processing_with_ocr_spark.ship import ship_package

    ship_package(spark)

    from universal_key_value_based_text_processing_with_ocr_spark import api
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

    timings: dict[str, float] = {}

    # Warm the JVM/Python-worker pool so steady-state timing excludes startup.
    spark.range(1000).count()
    extract_pages(synth_pages_df(spark, 64, partitions=CPUS)).count()

    # --- headline: extraction throughput --------------------------------
    # Production shape: JVM parquet scan -> salted repartition -> fused
    # extract stage.  The synthetic source is materialised untimed.
    pages_path = materialize_pages_parquet(spark, n_docs)
    pages = salted_repartition(spark.read.parquet(pages_path), CPUS * 8)
    t0 = time.time()
    extracted = extract_pages(pages).count()
    timings["extract_pages"] = round(time.time() - t0, 3)
    docs_per_sec = round(extracted / timings["extract_pages"], 1)

    # --- operator benches over the sf tables ----------------------------
    bench_queries = [
        "pushdown_agg",
        "topk_orders",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "similarity_topk",
        "events_window_agg",
        "events_sessionize",
        "doc_langid",
        "multimodal_image_meta",
    ]
    for name in bench_queries:
        fn = api.QUERIES[name]
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    # --- hash-seam delta: the same LSH pipeline on the xxhash64 fast path ---
    # (oracles replay md5, so correctness checks stay on md5; production
    # would flip this switch — the delta is the md5-reproducibility tax)
    from universal_key_value_based_text_processing_with_ocr_spark.operators import dedup

    dedup.set_hash_impl("xxhash64")
    try:
        t0 = time.time()
        api.QUERIES["dedup_minhash_lsh"](spark, SF_DIR).count()
        # reported OUTSIDE the summed query map so the headline total stays
        # comparable across rounds (this is an A/B of the same query)
        xxhash_lsh_sec = round(time.time() - t0, 3)
    finally:
        dedup.set_hash_impl("md5")

    # --- ANN recall@10 vs the exact scan (quality, not time) -------------
    from universal_key_value_based_text_processing_with_ocr_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, 5, 10).collect()}
    recall = {}
    for label, fn in [
        ("lsh_multiprobe", similarity.lsh_bucketed_topk),
        ("ivf", similarity.ivf_topk),
    ]:
        approx = {(r.query_id, r.neighbor_id) for r in fn(emb, 5, 10).collect()}
        recall[label] = round(len(exact & approx) / max(1, len(exact)), 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline queries wall time (extraction + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        "extraction_docs": extracted,
        "extraction_docs_per_sec": docs_per_sec,
        "ann_recall_at_10": recall,
        "dedup_minhash_lsh_xxhash64_sec": xxhash_lsh_sec,
    }
    scaling_file = REPO / "BENCH" / "scaling.json"
    if scaling_file.exists():
        scaling = json.loads(scaling_file.read_text())
        out["scaling_efficiency_n_to_4n"] = scaling.get("efficiency_2_to_8")
        out["scaling"] = scaling
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
