"""Decompose crawl_frontier / host_pagerank wall time (guide §1.4 noop
sink per stage; not part of the frozen bench)."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from universal_key_value_based_text_processing_with_ocr_spark.plans.session import build_spark

spark = build_spark(CPUS)
spark.sparkContext.setLogLevel("ERROR")
from universal_key_value_based_text_processing_with_ocr_spark.ship import ship_package

ship_package(spark)
spark.range(1000).count()

from pyspark.sql import functions as F
from universal_key_value_based_text_processing_with_ocr_spark import api
from universal_key_value_based_text_processing_with_ocr_spark.operators.linkgraph import (
    extract_outlinks, host_graph, pagerank_hosts,
)


def t(label, df, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"{label:34s} {best:.3f}s")


links = extract_outlinks(api._link_pages(spark, SF_DIR))
t("links (extract_outlinks)", links)
hg = host_graph(links)
t("host_graph", hg)
t("pagerank n_iter=1", pagerank_hosts(host_graph(extract_outlinks(api._link_pages(spark, SF_DIR))), n_iter=1))
t("pagerank n_iter=3", pagerank_hosts(host_graph(extract_outlinks(api._link_pages(spark, SF_DIR))), n_iter=3))

cand = links.where(~F.col("nofollow")).select("dst_url").distinct()
t("cand distinct", cand)
t("full crawl_frontier", api.QUERIES["crawl_frontier"](spark, SF_DIR))
t("full host_pagerank", api.QUERIES["host_pagerank"](spark, SF_DIR))
