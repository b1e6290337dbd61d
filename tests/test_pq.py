"""Product-quantization pins: the Spark HOF encode/ADC path against an
INDEPENDENT numpy replication (same rounded-distance/lowest-code-tie
contract, different execution), plus the plan-shape guarantees pq relies
on at 100 TB (corpus never amplified by the codebook, encode shuffle-free,
ADC scan reads codes not vectors)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.operators.similarity import (
    cosine_topk,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
)

SF_DIR = "/root/testdata/sf0.001"
M, N_CODES = 8, 16


def _load(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _numpy_model(emb_df):
    """Independent PQ replication: numpy argmin over md5-drawn codebook
    with the operator's exact rounding + tie contract."""
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb_df.collect()}
    order = sorted(rows, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
    cb = [rows[v] for v in order[:N_CODES]]  # code c = c-th drawn vector
    d = len(next(iter(rows.values())))
    sub = d // M
    codes = {}
    for vid, e in rows.items():
        cs = []
        for j in range(M):
            seg = e[j * sub:(j + 1) * sub]
            best_c, best_d = -1, float("inf")
            for c, ce in enumerate(cb):
                # left-to-right accumulation matches the engine's fold
                acc = 0.0
                for x, y in zip(seg, ce[j * sub:(j + 1) * sub]):
                    acc += (x - y) * (x - y)
                dist = round(acc, 9)
                if dist < best_d:
                    best_c, best_d = c, dist
            cs.append(best_c)
        codes[vid] = cs
    return rows, cb, sub, codes


def test_pq_encode_matches_numpy(spark):  # noqa: F811
    emb = _load(spark)
    _, _, _, expect = _numpy_model(emb)
    got = {}
    for r in pq_encode(emb, m=M, n_codes=N_CODES).collect():
        got.setdefault(r["vec_id"], [None] * M)[r["subspace"]] = r["code"]
    assert got == expect


def test_pq_topk_matches_numpy_adc(spark):  # noqa: F811
    emb = _load(spark)
    rows, cb, sub, codes = _numpy_model(emb)
    n_queries, k = 3, 5
    expect = []
    for q in range(n_queries):
        qe = rows[q]
        lut = [[round(float(np.sum((qe[j * sub:(j + 1) * sub]
                                    - ce[j * sub:(j + 1) * sub]) ** 2)), 9)
                for ce in cb] for j in range(M)]
        scored = sorted(
            (round(sum(lut[j][codes[v][j]] for j in range(M)), 6), v)
            for v in rows if v != q
        )
        expect += [(q, v, r + 1) for r, (_, v) in enumerate(scored[:k])]
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_topk(emb, n_queries=n_queries, k=k, m=M, n_codes=N_CODES).collect()
    )
    assert got == sorted(expect)


def test_pq_encode_plan_is_narrow(spark):  # noqa: F811
    """Encode must be broadcast + row-local HOFs: the only Exchange in the
    corpus branch is the BroadcastExchange of the 1-row codebook (the
    codebook draw itself may shuffle its 16 rows — that side is tiny)."""
    df = pq_encode(_load(spark), m=M, n_codes=N_CODES)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # no Python anywhere: the encode is pure codegen'd expressions
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the corpus side must never be shuffled BY THE JOIN (that would mean
    # the broadcast degraded to a shuffle join).  The one allowed corpus
    # exchange is the explicit gated widen_small_scan repartition
    # (REPARTITION_BY_NUM — identity at real scale); a join-induced
    # exchange would be ENSURE_REQUIREMENTS.
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(vec_id[^\n]*", plan):
        assert "REPARTITION" in m.group(0), m.group(0)


def test_pq_code_range_and_coverage(spark):  # noqa: F811
    enc = pq_encode(_load(spark), m=M, n_codes=N_CODES)
    stats = enc.agg(
        F.min("code").alias("lo"), F.max("code").alias("hi"),
        F.countDistinct("subspace").alias("ns"),
        F.count("*").alias("n"),
        F.countDistinct("vec_id").alias("nv"),
    ).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] < N_CODES
    assert stats["ns"] == M
    assert stats["n"] == stats["nv"] * M  # exactly m codes per vector


def test_pq_codebook_vectors_encode_to_self(spark):  # noqa: F811
    """A codebook-source vector's distance to its own code is 0 in every
    subspace, so it must encode to its own code index m times."""
    emb = _load(spark)
    _, _, _, codes = _numpy_model(emb)
    rows = {r["vec_id"] for r in emb.collect()}
    order = sorted(rows, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
    for c, vid in enumerate(order[:N_CODES]):
        assert codes[vid] == [c] * M


def test_pq_rerank_with_full_shortlist_equals_exact(spark):  # noqa: F811
    """With the shortlist covering the whole corpus, the ADC stage cannot
    filter anything out, so the exact-cosine re-rank must return exactly
    the brute-force top-k (same rows, same ranks)."""
    emb = _load(spark)
    n = emb.count()
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk(emb, n_queries=3, k=5).collect()
    }
    rr = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_topk_rerank(
            emb, n_queries=3, k=5, m=M, n_codes=N_CODES, shortlist=n
        ).collect()
    }
    assert rr == exact


def test_pq_rerank_improves_on_adc(spark):  # noqa: F811
    """At the default shortlist the re-ranked recall@10 must dominate the
    raw ADC scan's (the whole point of the second stage)."""
    emb = _load(spark)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, n_queries=5, k=10).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, n_queries=5, k=10, m=M, n_codes=N_CODES).collect()
    }
    rr = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk_rerank(emb, n_queries=5, k=10, m=M, n_codes=N_CODES).collect()
    }
    assert len(exact & rr) >= len(exact & adc)
    assert len(exact & rr) >= int(0.5 * len(exact))
