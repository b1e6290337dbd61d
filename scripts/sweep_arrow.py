"""32-way residual sweep (VERDICT r3 #3).

spark_vs_kernel@32 sits at ~0.73 (BENCH/BASELINE.md); the suspects are
per-task overheads that only matter at 64 tasks x small Arrow batches:
the Arrow batch size, the partition count itself (task dispatch +
worker-attach amortisation), and Python-worker reuse.  Each config runs
in a FRESH subprocess/SparkSession (no config bleed), same materialised
24k-doc input, warmup excluded, best-of-N interleaved across configs so
host drift cannot poison one config's samples.

Writes BENCH/arrow_sweep.json and prints a table.  Run EXCLUSIVELY (no
concurrent benches).

Usage: python scripts/sweep_arrow.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
import os
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
    .appName("arrow-sweep")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "{batch}")
    .config("spark.python.worker.reuse", "{reuse}")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from universal_key_value_based_text_processing_with_ocr_spark.operators.extract import extract_pages
from universal_key_value_based_text_processing_with_ocr_spark.plans.partitioning import salted_repartition
from universal_key_value_based_text_processing_with_ocr_spark.sources.pages import (
    materialize_pages_parquet, synth_pages_df)
extract_pages(synth_pages_df(spark, 128, partitions=32)).count()  # warmup
pages_path = materialize_pages_parquet(spark, {n_docs})
pages = salted_repartition(spark.read.parquet(pages_path), {partitions})
t0 = time.time()
n = extract_pages(pages).count()
wall = time.time() - t0
print("RESULT " + json.dumps({{"n": n, "wall_s": round(wall, 3),
                               "docs_per_sec": round(n / wall, 1)}}))
spark.stop()
"""

CONFIGS = [
    # label, arrow batch, partitions, worker reuse
    ("batch512_p64_reuse", 512, 64, "true"),      # current production config
    ("batch1024_p64_reuse", 1024, 64, "true"),
    ("batch2048_p64_reuse", 2048, 64, "true"),
    ("batch4096_p64_reuse", 4096, 64, "true"),
    ("batch1024_p32_reuse", 1024, 32, "true"),    # fewer, larger tasks
    ("batch512_p32_reuse", 512, 32, "true"),
    ("batch512_p64_noreuse", 512, 64, "false"),   # worker-attach cost probe
]


def run(batch: int, partitions: int, reuse: str, n_docs: int) -> dict:
    code = WORKER.format(repo=str(REPO), batch=batch, partitions=partitions,
                         reuse=reuse, n_docs=n_docs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT: {out.stdout[-500:]}\n{out.stderr[-500:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    best: dict[str, dict] = {}
    for _ in range(reps):  # interleaved: one pass over all configs per rep
        for label, batch, partitions, reuse in CONFIGS:
            r = run(batch, partitions, reuse, n_docs)
            if label not in best or r["docs_per_sec"] > best[label]["docs_per_sec"]:
                best[label] = r
            print(f"{label:24s} {r['wall_s']:7.3f}s {r['docs_per_sec']:8.1f} docs/s",
                  flush=True)
    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    payload = {"n_docs": n_docs, "reps": reps, "best": best}
    (out_dir / "arrow_sweep.json").write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
