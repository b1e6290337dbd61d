"""Targeted per-query benchmark + plan capture for optimization work.

Times individual declared queries with the SAME methodology as bench.py
(`.count()` on the query frame, best-of-N interleaved, production
xxhash64 seam for dedup_minhash_lsh) but lets you pick the query list, so
an optimize-measure loop doesn't pay for the full ~14-minute suite.  Also
dumps `.explain("formatted")` per query to plans/r06/<query>_<tag>.txt.

Usage:
    python bench_extra.py [--reps N] [--tag before|after] [--noop] q1 q2 ...
    python bench_extra.py --tag before extract_pages dedup_ngram_jaccard

`extract_pages` follows bench.py's production shape (materialised parquet
scan -> salted repartition -> fused extract).  --noop times a
noop-sink write (guide §1.4: computes every column) instead of .count().
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default=None, help="dump plans/r06/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true", help="time noop sink instead of count")
    args = ap.parse_args()

    from universal_key_value_based_text_processing_with_ocr_spark.plans.session import (
        build_spark,
    )

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from universal_key_value_based_text_processing_with_ocr_spark.ship import ship_package

    ship_package(spark)

    from universal_key_value_based_text_processing_with_ocr_spark import api
    from universal_key_value_based_text_processing_with_ocr_spark.operators import dedup
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

    # warm JVM + Python worker pool like bench.py
    spark.range(1000).count()
    extract_pages(synth_pages_df(spark, 64, partitions=CPUS)).count()

    sf = float(Path(SF_DIR).name.replace("sf", "") or 0)
    n_docs = max(400, int(120000 * sf))
    pages_path = None

    def build_df(name):
        nonlocal pages_path
        if name == "extract_pages":
            if pages_path is None:
                pages_path = materialize_pages_parquet(spark, n_docs)
            pages = salted_repartition(spark.read.parquet(pages_path), CPUS * 2)
            return extract_pages(pages)
        return api.QUERIES[name](spark, SF_DIR)

    def run(name) -> float:
        if name == "extract_pages":
            extract_pages(synth_pages_df(spark, 64, partitions=CPUS)).count()
        if name == "dedup_minhash_lsh":
            dedup.set_hash_impl("xxhash64")
        try:
            # bench.py parity: construction is INSIDE the timed region
            # (matters for queries with eager construction work)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = build_df(name)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            return dt, n
        finally:
            dedup.set_hash_impl("md5")

    if args.tag:
        plans_dir = REPO / "plans" / "r06"
        plans_dir.mkdir(parents=True, exist_ok=True)
        for name in args.queries:
            if name == "dedup_minhash_lsh":
                dedup.set_hash_impl("xxhash64")
            try:
                df = build_df(name)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            finally:
                dedup.set_hash_impl("md5")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(txt)

    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for _ in range(args.reps):
        for name in args.queries:
            dt, n = run(name)
            best[name] = min(best.get(name, float("inf")), dt)
            counts[name] = n
            print(f"  {name:32s} {dt:7.3f}s  rows={n}", flush=True)
        spark.catalog.clearCache()
    out = {k: round(v, 3) for k, v in best.items()}
    print(json.dumps({"best": out, "total": round(sum(out.values()), 3), "rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
