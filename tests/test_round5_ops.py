"""Round-5 operator semantics: SemDeDup invariants vs an independent numpy
replication, bucketed-join result parity vs a plain join."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

SF_DIR = "/root/testdata/sf0.01"


def _semdedup_numpy(ids, vecs, n_centroids, tau):
    """Independent replication of the published rule: hash-sampled
    centroids, cosine argmax assignment, farthest-first rank, drop on any
    lower-ranked mate >= tau.  Returns (survivor ids, cluster of each id)."""
    order = sorted(range(len(ids)), key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    cents = [ids[i] for i in order[:n_centroids]]
    cvecs = np.stack([vecs[order[i]] for i in range(n_centroids)])
    norms = np.linalg.norm(vecs, axis=1)
    cnorms = np.linalg.norm(cvecs, axis=1)
    sims = np.round((vecs @ cvecs.T) / np.outer(norms, cnorms), 9)
    # argmax with cid-ascending tie-break: stable argmax over (sim, -cid)
    assign = {}
    for i, vid in enumerate(ids):
        best = max(range(n_centroids), key=lambda c: (sims[i, c], -cents[c]))
        assign[vid] = cents[best]
    clusters = {}
    for i, vid in enumerate(ids):
        clusters.setdefault(assign[vid], []).append((float(sims[i, cents.index(assign[vid])]), vid, i))
    survivors = set()
    for cid, members in clusters.items():
        members.sort()  # (csim asc, vec_id asc) == farthest-first
        for r, (_, vid, i) in enumerate(members):
            dup = False
            for _, pvid, pi in members[:r]:
                cos = round(float(vecs[i] @ vecs[pi] / (norms[i] * norms[pi])), 9)
                if cos >= tau:
                    dup = True
                    break
            if not dup:
                survivors.add(vid)
    return survivors, assign


def test_semdedup_matches_independent_replication(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.similarity import (
        semdedup,
    )

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter("vec_id < 400")
    )
    got = {(r.vec_id, r.cluster) for r in semdedup(emb, n_centroids=4, tau=0.3).collect()}
    pdf = emb.orderBy("vec_id").toPandas()
    vecs = np.stack(pdf["embedding"].map(np.asarray, na_action=None)).astype(np.float64)
    ids = pdf["vec_id"].tolist()
    survivors, assign = _semdedup_numpy(ids, vecs, n_centroids=4, tau=0.3)
    assert {v for v, _ in got} == survivors
    assert got == {(v, assign[v]) for v in survivors}


def test_semdedup_survivor_pairs_below_tau_and_exact_dups_collapse(spark):  # noqa: F811
    """Invariant: two survivors of the SAME cluster never reach tau; exact
    duplicates collapse to one representative."""
    from pyspark.sql import functions as F

    from universal_key_value_based_text_processing_with_ocr_spark.operators.similarity import (
        semdedup,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter("vec_id < 200")
    # graft 5 exact copies of vector 7 under fresh ids
    copies = (
        emb.filter("vec_id = 7")
        .crossJoin(spark.range(100000, 100005).withColumnRenamed("id", "new_id"))
        .select(F.col("new_id").alias("vec_id"), "embedding", "label")
    )
    full = emb.unionByName(copies)
    out = semdedup(full, n_centroids=4, tau=0.3).toPandas()
    dup_ids = {7, 100000, 100001, 100002, 100003, 100004}
    kept_dups = [v for v in out["vec_id"] if v in dup_ids]
    assert len(kept_dups) == 1
    # survivor cross-check within each cluster
    pdf = full.orderBy("vec_id").toPandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    by_cluster = out.groupby("cluster")["vec_id"].apply(list)
    for cid, members in by_cluster.items():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                va, vb = vecs[a], vecs[b]
                cos = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 9)
                assert cos < 0.3, (cid, a, b, cos)
