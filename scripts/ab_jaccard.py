"""A/B/C the ngram_jaccard stop-shingle plans at sf0.1 (VERDICT r2 item #1).

Variants (A/B are FROZEN historical baselines, inlined so later rewrites
of the live operator cannot silently change what they measure):
  A window     — round-1 plan: explode+distinct shingles, count over
                 Window(shingle), filter, self-join, no persist
  B antijoin_r2— round-2 plan: aggregate stop set + broadcast anti-join,
                 raw computed twice, sh persisted, self-join
  C grouped    — anti-join stop removal, then groupBy(shingle)
                 collect_list + in-group pair explode (no self-join)
  D onepass    — single collect_set groupBy (REJECTED: unbounded agg
                 buffer before the frequency filter)
  E current    — whatever ngram_jaccard_pairs ships now

Best-of-N interleaved; prints one JSON line per rep and a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("AB_REPS", "3"))

N = 10
THRESHOLD = 0.5
MAX_DF = 100


def _finish(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
    )


def _self_join_pairs(sh: DataFrame) -> DataFrame:
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )


def _raw_r1(docs: DataFrame) -> DataFrame:
    """Frozen round-1/2 shingle source: explode + GLOBAL distinct (the live
    char_shingles now dedups row-locally with array_distinct)."""
    arr = F.expr(
        f"transform(sequence(1, length(text) - {N - 1}), i -> substring(text, i, {N}))"
    )
    return (
        docs.filter(F.length("text") >= N)
        .select("doc_id", F.explode(arr).alias("shingle"))
        .distinct()
    )


def variant_window(docs: DataFrame) -> DataFrame:
    raw = _raw_r1(docs)
    sh = (
        raw.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("df") <= MAX_DF)
        .drop("df")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return _finish(_self_join_pairs(sh), sizes)


def variant_antijoin(docs: DataFrame) -> DataFrame:
    """The round-2 committed plan, INLINED as a frozen baseline (the live
    ngram_jaccard_pairs has since been rewritten — importing it here would
    silently measure the new plan under the old label): aggregate stop set
    + broadcast anti-join + shingle-table self-join, sh persisted."""
    raw = _raw_r1(docs)
    stop = (
        raw.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_DF)
        .select("shingle")
    )
    sh = raw.join(F.broadcast(stop), "shingle", "left_anti").persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return _finish(_self_join_pairs(sh), sizes)


def variant_current(docs: DataFrame) -> DataFrame:
    """Whatever ngram_jaccard_pairs currently ships (round 3+: shared
    repartition('shingle') + bounded-group pair explode)."""
    from universal_key_value_based_text_processing_with_ocr_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    return ngram_jaccard_pairs(docs, N, THRESHOLD, MAX_DF)


def variant_grouped(docs: DataFrame) -> DataFrame:
    from universal_key_value_based_text_processing_with_ocr_spark.operators.dedup import char_shingles

    raw = char_shingles(docs, N)
    stop = (
        raw.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_DF)
        .select("shingle")
    )
    groups = (
        raw.join(F.broadcast(stop), "shingle", "left_anti")
        .groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("docs"))
    )
    kept = groups.select(F.explode("docs").alias("doc_id"))
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    pairs = (
        groups.filter(F.size("docs") >= 2)
        .select(F.explode("docs").alias("doc_a"), F.col("docs"))
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return _finish(pairs, sizes)


def variant_grouped_onepass(docs: DataFrame) -> DataFrame:
    """collect_set in ONE groupBy (no distinct, no stop pre-pass), filter
    after.  NOT scale-safe (a boilerplate shingle in 10^9 docs collects an
    unbounded set before the filter) — measured here only to price that
    safety."""
    shingle_array = F.expr(
        f"transform(sequence(1, length(text) - {N - 1}), i -> substring(text, i, {N}))"
    )
    raw = docs.filter(F.length("text") >= N).select(
        "doc_id", F.explode(shingle_array).alias("shingle")
    )
    groups = (
        raw.groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("docs"))
        .filter(F.size("docs") <= MAX_DF)
    )
    kept = groups.select(F.explode("docs").alias("doc_id"))
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    pairs = (
        groups.filter(F.size("docs") >= 2)
        .select(F.explode("docs").alias("doc_a"), F.col("docs"))
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return _finish(pairs, sizes)


def main() -> None:
    from bench import build_spark

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm scan

    variants = {
        "A_window": variant_window,
        "B_antijoin_r2": variant_antijoin,
        "C_grouped": variant_grouped,
        "D_grouped_onepass": variant_grouped_onepass,
        "E_current": variant_current,
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}
    for rep in range(REPS):
        for name, fn in variants.items():
            t0 = time.time()
            n = fn(docs).count()
            dt = round(time.time() - t0, 3)
            results[name].append(dt)
            counts[name] = n
            spark.catalog.clearCache()
            print(json.dumps({"rep": rep, "variant": name, "sec": dt, "rows": n}), flush=True)
    summary = {
        "best": {k: min(v) for k, v in results.items()},
        "all": results,
        "rows": counts,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
