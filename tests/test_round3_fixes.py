"""Round-3 regression tests (VERDICT r2 "Next round" + ADVICE items):

- dedup queries leave no cached blocks pinned after their terminal action
- quadratic small-N oracles refuse corpus-scale inputs unless opted in
- repetition tokeniser whitespace class is regex-flavor-independent
- IVF hash-sampled centroids keep cells balanced
- ship dir ownership check refuses a world/group-writable pre-created dir
- plan_partitions large-input behavior (see test_round2_fixes update)
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401


def _persistent_rdd_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def _docs(spark, n=40):
    rows = [(i, f"document number {i % 7} with some shared text body " * 6) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_ngram_jaccard_leaves_no_cached_blocks(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    before = _persistent_rdd_ids(spark)
    ngram_jaccard_pairs(_docs(spark), n=8, threshold=0.3).count()
    assert _persistent_rdd_ids(spark) - before == set()


def test_minhash_lsh_leaves_no_cached_blocks(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    before = _persistent_rdd_ids(spark)
    minhash_lsh_pairs(_docs(spark), shingle_n=8).count()
    assert _persistent_rdd_ids(spark) - before == set()


def test_connected_components_releases_edge_caches(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "doc_a int, doc_b int"
    )
    before = _persistent_rdd_ids(spark)
    out = connected_components(edges)
    out.count()
    # The edge/adjacency/intermediate-label caches must be released; only the
    # eagerly-localCheckpointed result (which the CALLER owns — it is the
    # returned DataFrame's lineage cut) may remain.
    leaked = _persistent_rdd_ids(spark) - before
    assert len(leaked) <= 1, f"expected at most the result checkpoint, got {len(leaked)} blocks"
    got = {(r.doc_id, r.cluster_id) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20), (22, 20)}


def test_quadratic_guard_fires_and_opt_in_works(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators import (
        dedup,
        similarity,
    )

    emb = spark.range(5).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(F.lit(1.0), F.rand(7)).alias("embedding"),
    )
    # small inputs pass untouched
    assert similarity.embedding_near_dup(emb, 0.0).count() == 10

    # an over-threshold input raises with a pointer to the LSH sibling ...
    big = spark.range(60).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(F.lit(1.0)).alias("embedding"),
    )
    import universal_key_value_based_text_processing_with_ocr_spark.operators.similarity as sim

    old = sim.QUADRATIC_GUARD_MAX_ROWS
    sim.QUADRATIC_GUARD_MAX_ROWS = 50
    try:
        with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
            similarity.embedding_near_dup(big, 0.0)
        # ... and the explicit opt-in bypasses the guard
        assert similarity.embedding_near_dup(big, 0.0, allow_quadratic=True).count() > 0
    finally:
        sim.QUADRATIC_GUARD_MAX_ROWS = old

    docs = _docs(spark, 30)
    old_docs = dedup.JACCARD_GUARD_MAX_DOCS
    dedup.JACCARD_GUARD_MAX_DOCS = 10
    try:
        with pytest.raises(ValueError, match="minhash_lsh_pairs"):
            dedup.ngram_jaccard_pairs(docs, n=8)
        assert dedup.ngram_jaccard_pairs(docs, n=8, allow_quadratic=True).count() >= 0
    finally:
        dedup.JACCARD_GUARD_MAX_DOCS = old_docs


def test_repetition_whitespace_class_matches_oracle_on_vertical_tab(spark):  # noqa: F811
    """A \\x0b in the text must tokenise identically in Spark (Java regex)
    and DuckDB (RE2): with the explicit [ \\t\\n\\r\\f] class neither treats
    it as a separator (ADVICE r2: Java \\s includes \\x0b, RE2 \\s does not)."""
    from universal_key_value_based_text_processing_with_ocr_spark.api import ORACLE_SQL
    from universal_key_value_based_text_processing_with_ocr_spark.operators.textstats import (
        repetition_stats,
    )

    text = "alpha\x0bbeta gamma alpha\x0bbeta gamma"
    docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = repetition_stats(docs).toPandas()

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [1], "text": [text]}))
    want = con.execute(ORACLE_SQL["doc_repetition"]).fetchdf()
    # tokens are [alpha\x0bbeta, gamma] * 2 -> top bigram covers 2 of 3
    assert got.iloc[0].top_bigram_frac == want.iloc[0].top_bigram_frac == round(2 / 3, 6)


def test_ivf_centroids_are_hash_sampled_and_cells_balanced(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n_centroids = 16
    out = ivf_topk(emb, n_queries=5, k=10, n_centroids=n_centroids)
    assert out.count() == 50

    # replicate the assignment to audit cell balance
    from universal_key_value_based_text_processing_with_ocr_spark.operators.similarity import (
        _dot,
        _norm,
    )
    from pyspark.sql import Window

    cent = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    )
    sims = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.round(
            _dot(F.col("embedding"), F.col("ce")) / (_norm(F.col("embedding")) * _norm(F.col("ce"))),
            9,
        ).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid").asc())
    cells = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("cid")
        .count()
        .toPandas()
    )
    n_vecs = emb.count()
    mean = n_vecs / n_centroids
    # every centroid owns a non-degenerate cell and no cell dominates
    assert len(cells) == n_centroids
    assert cells["count"].max() <= 4 * mean, cells.to_dict()


def test_ship_dir_ownership_guard(tmp_path, monkeypatch):
    """A pre-existing group/other-writable ship dir must be rejected in
    favour of a fresh private directory (ADVICE r2: zip-planting)."""
    import universal_key_value_based_text_processing_with_ocr_spark.ship as ship

    import getpass
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    evil = tmp_path / f"ukv-ship-{getpass.getuser()}"
    evil.mkdir(mode=0o777)
    evil.chmod(0o777)  # umask-proof

    shipped = {}

    class FakeSC:
        applicationId = "app-test"

        def addPyFile(self, path):
            shipped["path"] = path

    class FakeSpark:
        sparkContext = FakeSC()

    ship._SHIPPED.clear()
    ship.ship_package(FakeSpark())
    assert "path" in shipped
    # the zip must NOT have been placed in the attacker-controlled dir
    assert not str(shipped["path"]).startswith(str(evil))
    ship._SHIPPED.clear()


# --- lakehouse chunked manifests (VERDICT r2 #4) ----------------------------


def test_lakehouse_pruned_scan_opens_only_matching_chunks(tmp_path):
    """10k-file table: planning a selective range must open only the chunk
    files whose summary envelope intersects it — O(matching chunks), never
    the full file list (the Iceberg manifest-list design)."""
    import json as _json

    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
        SnapshotTable,
    )

    t = SnapshotTable(tmp_path / "tbl")
    chunks = []
    for c in range(100):
        files = [f"data/synth/{c:03d}-{i:03d}.parquet" for i in range(100)]
        stats = {
            f: {"rows": 10, "column": "doc_id", "min": c * 1000 + i * 10,
                "max": c * 1000 + i * 10 + 9}
            for i, f in enumerate(files)
        }
        chunks.append(t._write_chunk(files, stats))
    manifest = {
        "snapshot_id": "synthetic", "parent_id": None, "sequence": 1,
        "committed_at_ms": 0, "schema": "{}", "chunks": chunks, "summary": {},
    }
    (t.snapshot_dir / "v00000001.json").write_text(_json.dumps(manifest))

    plan = t.plan_stats(between=(1500, 1529))
    assert plan["chunks_total"] == 100
    assert plan["chunks_opened"] == 1          # only chunk 1 intersects
    assert plan["files_kept"] == 3             # files i=50,51,52 of chunk 1
    kept, total = t.pruned_file_count(between=(1500, 1529))
    assert (kept, total) == (3, 10_000)
    # full-range plan touches everything (sanity: no over-pruning)
    assert t.plan_stats(between=(0, 10**9))["chunks_opened"] == 100


def test_lakehouse_chunked_append_read_timetravel_expire(spark, tmp_path):  # noqa: F811
    """End-to-end over the chunked format: multi-append, chunk-pruned read,
    time travel, history without opening chunks, expire deletes orphaned
    chunks + data files."""
    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
        SnapshotTable,
    )

    t = SnapshotTable(tmp_path / "tbl")
    s1 = t.append(spark.range(0, 100).selectExpr("id AS doc_id", "'a' AS v").coalesce(2))
    t.append(spark.range(100, 200).selectExpr("id AS doc_id", "'b' AS v").coalesce(2))

    # chunk-level prune: the second append's chunk covers [100,199] only
    plan = t.plan_stats(between=(150, 160))
    assert plan["chunks_opened"] == 1 and plan["chunks_total"] == 2
    got = t.read(spark, between=(150, 160)).filter("doc_id BETWEEN 150 AND 160")
    assert got.count() == 11

    assert t.read(spark).count() == 200
    assert t.read(spark, snapshot_id=s1).count() == 100       # time travel
    assert [h["n_files"] for h in t.history()] == [2, 4]

    t.compact(spark, target_partitions=1)
    res = t.expire_snapshots(keep_last=1)
    assert res["expired"] == 2 and res["deleted_files"] == 4
    # expired chunks are gone; the live snapshot still reads fine
    live_chunks = list(t.snapshot_dir.glob("chunk-*.json"))
    assert len(live_chunks) == 1
    assert t.read(spark).count() == 200


def test_bloom_incremental_dedup_properties(spark):  # noqa: F811
    """Bloom resume dedup: no false negatives ever (every true dup is a
    candidate AND verified), false-positive rate bounded by the geometry,
    and non-candidates skip exact verification by construction."""
    from universal_key_value_based_text_processing_with_ocr_spark.operators.dedup import (
        bloom_incremental_dedup,
    )

    committed = spark.createDataFrame(
        [(i, f"committed document body {i}") for i in range(500)],
        "doc_id int, text string",
    )
    # batch: 50 true dups of committed docs + 450 new docs
    batch = spark.createDataFrame(
        [(1000 + i, f"committed document body {i}") for i in range(50)]
        + [(2000 + i, f"brand new document body {i}") for i in range(450)],
        "doc_id int, text string",
    )
    out = {r.doc_id: (r.bloom_candidate, r.is_dup) for r in
           bloom_incremental_dedup(batch, committed).collect()}
    assert len(out) == 500
    # no false negatives: every true dup flagged candidate and verified dup
    for i in range(50):
        assert out[1000 + i] == (True, True)
    # new docs are never is_dup; candidate-but-not-dup = false positives
    fps = 0
    for i in range(450):
        cand, dup = out[2000 + i]
        assert not dup
        fps += cand
    # 2^20 bits / 4 hashes / 500 items -> fpp ~ (4*500/2^20)^4 ~ 1e-11;
    # allow slack for the tiny corpus, but any systematic leak fails hard
    assert fps <= 2, f"{fps} false positives out of 450"


def test_expire_sweeps_aged_orphan_chunks(spark, tmp_path):  # noqa: F811
    """A chunk left by a failed commit is deleted by expire only once it is
    old enough to prove no in-flight append owns it; young orphans and
    referenced chunks survive."""
    import os
    import time as _time

    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
        SnapshotTable,
    )

    t = SnapshotTable(tmp_path / "tbl")
    for lo in (0, 50, 100):
        t.append(spark.range(lo, lo + 50).selectExpr("id AS doc_id", "'x' AS v").coalesce(1))

    old_orphan = t._write_chunk(["data/ghost/a.parquet"], {})
    young_orphan = t._write_chunk(["data/ghost/b.parquet"], {})
    old_path = t.snapshot_dir / old_orphan["path"]
    os.utime(old_path, (  # age it past the in-flight-commit gate
        _time.time() - 7200, _time.time() - 7200))

    t.expire_snapshots(keep_last=1)
    assert not old_path.exists()
    assert (t.snapshot_dir / young_orphan["path"]).exists()
    assert t.read(spark).count() == 150


def test_salted_repartition_spreads_hot_host(spark):  # noqa: F811
    """A Zipf-hot host (40% of all rows) must spread across partitions
    instead of serialising into one task: max partition stays near the mean,
    while partitioning by host alone would put 40% of rows in one place."""
    from pyspark.sql import functions as F

    from universal_key_value_based_text_processing_with_ocr_spark.plans.partitioning import (
        host_of_url,
        salted_repartition,
    )

    n, n_parts = 10_000, 32
    urls = spark.range(n).select(
        F.when(F.col("id") % 10 < 4, F.concat(F.lit("https://hot.example.com/p"), F.col("id")))
        .otherwise(
            F.concat(
                F.lit("https://host"), (F.col("id") % 97).cast("string"),
                F.lit(".example.com/p"), F.col("id"),
            )
        )
        .alias("url")
    )
    sizes = (
        salted_repartition(urls, n_parts)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().toPandas()["count"]
    )
    mean = n / n_parts
    assert sizes.max() <= 2 * mean, f"skewed partitions: max {sizes.max()} vs mean {mean}"

    # control: partitioning by host alone concentrates the hot host
    by_host = (
        urls.repartition(n_parts, host_of_url(F.col("url")))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().toPandas()["count"]
    )
    assert by_host.max() >= 0.4 * n  # the pathology salting removes


def test_streamed_extraction_content_dedup(spark, tmp_path):  # noqa: F811
    """dedup_content drops mirror pages (same extracted text, new url)
    across epochs AND within a batch, while failures (null text) and the
    url-resume path keep working."""
    import pandas as pd

    from universal_key_value_based_text_processing_with_ocr_spark.sources import PAGES_SCHEMA
    from universal_key_value_based_text_processing_with_ocr_spark.streaming.incremental import (
        streamed_extraction_job,
    )

    def page(url, body):
        return {
            "url": url, "warc_ts": pd.Timestamp("2026-01-01"),
            "html": f"<p>{body}</p>".encode() if body else None,
            "text": None, "lang": "en",
        }

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    batch1 = [page("https://a.example.com/1", "alpha content with several words here"),
              page("https://a.example.com/2", "beta content with several words here")]
    spark.createDataFrame(pd.DataFrame(batch1), schema=PAGES_SCHEMA).coalesce(1).write.parquet(
        str(pages_dir / "b1"))
    res_path, ckpt = str(tmp_path / "results"), str(tmp_path / "ckpt")
    streamed_extraction_job(
        spark, str(pages_dir / "b1"), res_path, checkpoint_dir=ckpt + "1", dedup_content=True)

    # epoch 2: one new doc, one cross-epoch mirror (same text as /1, new
    # url), two within-batch mirrors, one null-payload failure
    batch2 = [page("https://b.example.com/new", "gamma content with several words here"),
              page("https://mirror.example.com/1", "alpha content with several words here"),
              page("https://c.example.com/d1", "delta content with several words here"),
              page("https://c.example.com/d2", "delta content with several words here"),
              page("https://d.example.com/nopayload", None)]
    spark.createDataFrame(pd.DataFrame(batch2), schema=PAGES_SCHEMA).coalesce(1).write.parquet(
        str(pages_dir / "b2"))
    streamed_extraction_job(
        spark, str(pages_dir / "b2"), res_path, checkpoint_dir=ckpt + "2", dedup_content=True)

    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse import SnapshotTable

    rows = {r.url: r.extracted_text for r in SnapshotTable(res_path).read(spark).collect()}
    assert "https://mirror.example.com/1" not in rows          # cross-epoch mirror dropped
    assert "https://c.example.com/d1" in rows                  # lowest url kept
    assert "https://c.example.com/d2" not in rows              # within-batch mirror dropped
    assert rows["https://d.example.com/nopayload"] is None     # failures still recorded
    assert len(rows) == 5  # a/1, a/2, b/new, c/d1, d/nopayload


def test_batch_job_content_dedup(spark, tmp_path):  # noqa: F811
    """run_extraction_job(dedup_content=True): mirror pages dropped across
    runs and within a run; rejects non-sweep parsers up front."""
    import pandas as pd
    import pytest as _pytest

    from universal_key_value_based_text_processing_with_ocr_spark.plans.pipeline import (
        run_extraction_job,
    )
    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse import SnapshotTable
    from universal_key_value_based_text_processing_with_ocr_spark.sources import PAGES_SCHEMA

    def page(url, body):
        return {"url": url, "warc_ts": pd.Timestamp("2026-01-01"),
                "html": f"<p>{body}</p>".encode(), "text": None, "lang": "en"}

    res = str(tmp_path / "results")
    run1 = spark.createDataFrame(pd.DataFrame(
        [page("https://a.example.com/1", "alpha words words words words")]), schema=PAGES_SCHEMA)
    run_extraction_job(spark, run1, res, dedup_content=True)

    run2 = spark.createDataFrame(pd.DataFrame(
        [page("https://mirror.example.com/1", "alpha words words words words"),
         page("https://b.example.com/d1", "beta words words words words"),
         page("https://b.example.com/d2", "beta words words words words")]), schema=PAGES_SCHEMA)
    out = run_extraction_job(spark, run2, res, dedup_content=True)
    urls = {r.url for r in SnapshotTable(res).read(spark).collect()}
    assert urls == {"https://a.example.com/1", "https://b.example.com/d1"}
    assert out["n_docs"] == 1

    with _pytest.raises(ValueError, match="sweep"):
        run_extraction_job(spark, run2, res, parser="boxorder", dedup_content=True)


def test_all_mirror_batch_rolls_back_empty_snapshot(spark, tmp_path):  # noqa: F811
    """A rerun whose every row is content-deduped away must not grow the
    manifest chain (review finding: empty junk snapshots on each rerun)."""
    import pandas as pd

    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse import SnapshotTable
    from universal_key_value_based_text_processing_with_ocr_spark.plans.pipeline import (
        run_extraction_job,
    )
    from universal_key_value_based_text_processing_with_ocr_spark.sources import PAGES_SCHEMA

    def page(url, body):
        return {"url": url, "warc_ts": pd.Timestamp("2026-01-01"),
                "html": f"<p>{body}</p>".encode(), "text": None, "lang": "en"}

    res = str(tmp_path / "res")
    base = spark.createDataFrame(pd.DataFrame(
        [page("https://a.example.com/1", "alpha words words words words")]), schema=PAGES_SCHEMA)
    run_extraction_job(spark, base, res, dedup_content=True)
    n_manifests = len(SnapshotTable(res)._manifests())

    mirrors = spark.createDataFrame(pd.DataFrame(
        [page("https://m.example.com/1", "alpha words words words words")]), schema=PAGES_SCHEMA)
    for _ in range(2):  # rerun twice: chain must not grow either time
        out = run_extraction_job(spark, mirrors, res, dedup_content=True)
        assert out["n_docs"] == 0 and out["resumed"] is True
        assert len(SnapshotTable(res)._manifests()) == n_manifests
    assert SnapshotTable(res).read(spark).count() == 1


def test_expire_recovers_when_gutted_manifest_lands_in_keep(spark, tmp_path):  # noqa: F811
    """A manifest gutted by a crashed expire (chunk deleted, manifest file
    left behind) must be reclassified as dropped by a LATER expire with a
    larger keep_last — not wedge every future expire (review finding)."""
    from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
        SnapshotTable,
    )

    t = SnapshotTable(tmp_path / "tbl")
    t.append(spark.range(0, 50).selectExpr("id AS doc_id", "'a' AS v").coalesce(1))
    t.append(spark.range(50, 100).selectExpr("id AS doc_id", "'b' AS v").coalesce(1))
    t.compact(spark, target_partitions=1)  # latest = self-contained replace

    # simulate the crash: delete the chunks the first two manifests
    # reference but leave their manifest files (the compact snapshot's
    # chunk is separate, so the LATEST stays intact)
    compact_m = t.latest_manifest()
    compact_chunks = {s["path"] for s in t._chunk_summaries(compact_m)}
    for cp in t.snapshot_dir.glob("chunk-*.json"):
        if cp.name not in compact_chunks:
            cp.unlink()

    # keep_last=2 puts one gutted manifest on the live side; it must be
    # reclassified and cleaned along with the dropped one, not raise
    res = t.expire_snapshots(keep_last=2)
    assert res["expired"] == 2
    assert len(t._manifests()) == 1
    assert t.read(spark).count() == 100  # survivor intact
