"""The end-to-end extraction job: scan -> resume anti-join -> salted
repartition -> fused extract stage -> snapshot commit + audit lineage.

New-engine lifecycle per SURVEY.md §3: one repartition shuffle up front,
ONE materialisation of the extract stage (streamed directly into the
snapshot's parquet write), then count/audit/debug read the written batch
back (cheap JVM columnar scans) — everything between is narrow and nothing
is persisted.  The job is idempotent and resumable: on restart, urls
already in the committed results snapshot are anti-joined away, and the
audit table records one row per (run, stage, partition) so lineage covers
every partition exactly once (partition_id also travels with each
committed row as per-row lineage).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import SnapshotTable
from ..operators.extract import (
    extract_pages,
    extract_pages_blended,
    extract_pages_boxorder,
    extract_pages_debug,
)

from .partitioning import plan_partitions, salted_repartition

# parser registry: the three physical parse strategies a user can pick per
# job (line sweep == reference parse_doc; blended adds the NIK re-scan;
# boxorder is the parse_doc_new0 block-geometry analog).  All three accept
# a custom field config; blended/boxorder emit the compact schema (no
# n_bytes/extracted_text).
PARSERS = {
    "sweep": extract_pages,
    "blended": extract_pages_blended,
    "boxorder": extract_pages_boxorder,
}

AUDIT_SCHEMA = (
    "run_id string, stage string, partition_id int, n_docs long, n_success long, "
    "bytes_in long, wall_ms long, snapshot_id string"
)


def run_extraction_job(
    spark: SparkSession,
    pages_df: DataFrame,
    results_path: str,
    audit_path: str | None = None,
    num_partitions: int | None = None,
    run_id: str | None = None,
    configs=None,
    debug_path: str | None = None,
    parser: str = "sweep",
    dedup_content: bool = False,
    fp_path: str | None = None,
    spans_path: str | None = None,
) -> dict:
    """Run (or resume) the extraction job; returns a summary dict.

    ``dedup_content=True`` (sweep parser only — the compact blended/
    boxorder schemas carry no extracted_text) drops mirror documents whose
    extracted text already exists in the committed table, probing the
    committed corpus through the Bloom sketch; within-run mirrors keep the
    lowest url.  See ``operators.dedup.drop_content_duplicates``.

    The job maintains a FINGERPRINT SIDE-TABLE (``fp_path``, default
    ``<results_path>_fps``): each commit appends the batch's distinct text
    fingerprints, and the next run's dedup probes THAT table — sketch build
    and exact verification read 16-byte fps, never committed text (VERDICT
    r3 #5: at 10^12 committed docs a per-increment distinct() over all
    committed fingerprints is itself a full shuffle).  Fp rows commit
    strictly AFTER their results snapshot, so a crash between the two can
    only let a future mirror slip through (safe direction) — never drop a
    document whose original was lost with the crashed commit.  A table
    created before this feature (or written with ``dedup_content=False``
    interleaved) is healed by ``rebuild_fp_table``.

    ``spans_path`` (sweep parser only) additionally commits the north
    star's labeled field spans per url — (url, line_no, field, key_start,
    key_end, value_start, value_end, value) — to its own snapshot table,
    crash-consistent with the results table (see the inline comment on
    commit order)."""
    if parser not in PARSERS:
        # validate BEFORE any action — an argument typo must not cost a
        # full source scan + resume anti-join first
        raise ValueError(f"parser must be one of {sorted(PARSERS)}, got {parser!r}")
    if dedup_content and parser != "sweep":
        raise ValueError("dedup_content requires the sweep parser (extracted_text column)")
    if spans_path is not None and parser != "sweep":
        raise ValueError("spans_path requires the sweep parser (html-decode line coordinates)")
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.time()
    results_tbl = SnapshotTable(results_path)
    audit_tbl = SnapshotTable(audit_path) if audit_path else None

    # Resume: drop urls already committed (left anti join; broadcast if the
    # committed side is small, AQE decides otherwise).
    committed = None
    if results_tbl.exists():
        committed = results_tbl.read(spark)
        pages_df = pages_df.join(committed.select("url"), "url", "left_anti")

    def _resumed_summary():
        return {"run_id": run_id, "n_docs": 0, "snapshot_id": results_tbl.snapshot_id(),
                "resumed": True, "wall_ms": int((time.time() - t0) * 1000)}

    # Size-aware partitioning + early resume exit.  The count is a JVM-only
    # action (url column at most — payload columns pruned), negligible next
    # to the Python extract stage — but a caller that pre-planned
    # num_partitions (a 100 TB job sizing partitions from table metadata)
    # must not pay a second source scan, so they get a limit-1 existence
    # probe instead.
    if num_partitions is None:
        n_input = pages_df.count()
        if n_input == 0:
            return _resumed_summary()
        num_partitions = plan_partitions(
            n_input, min_parallelism=spark.sparkContext.defaultParallelism
        )
    elif pages_df.select("url").isEmpty():
        return _resumed_summary()
    pages_df = salted_repartition(pages_df, num_partitions)

    if spans_path is not None:
        # North-star span sink: labeled field spans per url, committed
        # alongside the extraction.  A SECOND narrow pass over the batch
        # pages (opt-in — the fused results stage's schema is untouched),
        # same salted partitioning.  Commit order is spans-BEFORE-results
        # so the invariant "results-committed urls have their spans
        # committed" survives any crash: a crash between the two re-runs
        # the batch (results resume filter still sees it uncommitted) and
        # the url anti-join below makes the span re-append idempotent.
        # Residual cost: a zero-span url of a crashed batch is re-scanned
        # on the healing rerun — bounded by the crash, never steady-state.
        from ..operators.fieldspans import extract_page_field_spans

        spans_tbl = SnapshotTable(spans_path)
        span_rows = extract_page_field_spans(pages_df, configs=configs)
        if spans_tbl.exists():
            done_urls = spans_tbl.read(spark).select("url").distinct()
            span_rows = span_rows.join(done_urls, "url", "left_anti")
        span_sid = spans_tbl.append(
            span_rows, summary={"run_id": run_id, "stage": "spans"}
        )
        # Read the manifest of the snapshot THIS job just wrote — under
        # concurrent appends latest_manifest() may be another writer's,
        # and acting on its n_rows would roll back (or spare) the wrong
        # snapshot (review finding).
        if spans_tbl._resolve_manifest(span_sid)["summary"].get("n_rows", 0) == 0:
            # all-duplicate (healing rerun) or span-free batch: keep the
            # manifest chain junk-free, same policy as the results rollback
            spans_tbl.rollback_latest(span_sid)

    results = PARSERS[parser](pages_df, configs=configs).withColumn(
        "partition_id", F.spark_partition_id()
    )
    fp_tbl = SnapshotTable(fp_path or f"{results_path}_fps") if dedup_content else None
    if dedup_content:
        from ..operators.dedup import drop_content_duplicates

        committed_fps = ensure_committed_fps(spark, fp_tbl, committed, run_id)
        results = drop_content_duplicates(results, committed_fps=committed_fps)

    # SINGLE materialisation: the fused extract stage streams straight into
    # the snapshot's parquet write — no .persist() (measured: the columnar
    # cache build added ~25% to the stage at local[8] and the cached copy
    # served only two cheap aggregates).  The count, the audit lineage and
    # the failed-url debug pass all read the just-written batch files back
    # (JVM columnar scan, ~1s at 24k docs); partition_id is committed with
    # the rows as per-row lineage (which partition of which run produced
    # each document — readers that don't want it just don't select it).
    snapshot_id = results_tbl.append(results, summary={"run_id": run_id})
    batch = spark.read.parquet(str(results_tbl.path / "data" / snapshot_id))
    # Row count comes from the manifest the append just committed (parquet
    # footer totals) — a batch.count() here was a whole extra Spark job
    # spent re-deriving a number the sink already recorded.  Resolved by
    # the snapshot id THIS append returned, never latest_manifest():
    # under concurrent appends "latest" may be another writer's snapshot,
    # and its n_rows would trigger the empty-batch early-return for a
    # batch that DID commit rows (review finding).
    n_rows = results_tbl._resolve_manifest(snapshot_id)["summary"]["n_rows"]
    if n_rows == 0:
        # Only reachable via dedup_content dropping every row (extraction
        # itself is row-preserving): withdraw the empty snapshot so reruns
        # of an all-mirror batch never grow the manifest chain.  The mirror
        # urls stay uncommitted, so such a batch re-extracts each run — the
        # price of first-writer-wins without recording tombstones.
        results_tbl.rollback_latest(snapshot_id)
        return _resumed_summary()

    if fp_tbl is not None:
        # fp rows commit AFTER the results snapshot (crash window = a
        # mirror may slip through later, never a wrongful drop); read from
        # the just-written batch files — fp maintenance never re-runs the
        # Python stage
        from ..operators.dedup import fps_of

        fp_tbl.append(
            fps_of(batch, "extracted_text"),
            summary={"run_id": run_id, "results_snapshot_id": snapshot_id},
        )

    if audit_tbl is not None:
        wall_ms = int((time.time() - t0) * 1000)
        bytes_in = (
            F.sum("n_bytes")
            if "n_bytes" in batch.columns
            else F.sum(F.lit(None).cast("long"))  # compact-schema parsers
        )
        # ONE aggregation job over the just-written batch (columnar scan of
        # three narrow columns), collected driver-side — the result is at
        # most num_partitions rows, so the 'write' rollup and the audit
        # rows are built locally and written as a local DataFrame.  The
        # previous unionByName-of-two-aggregations shape re-ran the
        # per-partition agg inside the audit write job (no cache), costing
        # a second pass for a <=num_partitions-row table.
        per_partition = (
            batch.groupBy("partition_id")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.col("success").cast("long")).alias("n_success"),
                bytes_in.alias("bytes_in"),
            )
            .collect()
        )

        def _audit_row(stage, partition_id, n_docs, n_success, b_in):
            return (
                run_id, stage, partition_id, n_docs, n_success, b_in,
                wall_ms, snapshot_id,
            )

        # Lineage rows for both pipeline stages (the fused stage does
        # html_parse+extract together; 'write' records the commit).
        rows = [
            _audit_row("extract", r["partition_id"], r["n_docs"], r["n_success"], r["bytes_in"])
            for r in per_partition
        ]
        none_sum = lambda vals: (  # noqa: E731 — sum() turns all-NULL into 0
            None if all(v is None for v in vals) else sum(v for v in vals if v is not None)
        )
        rows.append(
            _audit_row(
                "write",
                -1,
                sum(r["n_docs"] for r in per_partition),
                none_sum([r["n_success"] for r in per_partition]),
                none_sum([r["bytes_in"] for r in per_partition]),
            )
        )
        audit = spark.createDataFrame(
            rows,
            schema=(
                # exactly the schema the previous select-based path wrote
                # (lit(int) -> IntegerType for wall_ms), so appends to
                # pre-existing audit tables stay schema-identical
                "run_id string, stage string, partition_id int, n_docs long, "
                "n_success long, bytes_in long, wall_ms int, snapshot_id string"
            ),
        ).repartition(1)
        # one data file for <=num_partitions+1 rows.  repartition, NOT
        # coalesce: coalesce(1) over a Python-parallelized local relation
        # funnels every source sub-partition through ONE serial Python
        # deserializer task (+4s flat, measured); repartition's narrow map
        # side stays parallel and the single reducer is trivial.
        audit_tbl.append(audit, summary={"run_id": run_id, "stage": "extract+write"})

    if debug_path is not None:
        # Per-doc debug artifacts for FAILED urls only (reference
        # generate_report analog): a second narrow pass over just the
        # failed subset — opt-in, so the happy path pays nothing.
        failed_urls = batch.filter(~F.col("success")).select("url")
        debug_rows = extract_pages_debug(
            pages_df.join(failed_urls, "url", "left_semi"),
            configs=configs,
            only_failures=True,
            parser=parser,
        )
        SnapshotTable(debug_path).append(
            debug_rows, summary={"run_id": run_id, "stage": "debug"}
        )

    return {
        "run_id": run_id,
        "n_docs": n_rows,
        "snapshot_id": snapshot_id,
        "resumed": False,
        "wall_ms": int((time.time() - t0) * 1000),
    }


def ensure_committed_fps(spark, fp_tbl, committed, run_id: str):
    """Committed-side fingerprints for content dedup: read the fp
    side-table, backfilling it ONCE from committed text for tables that
    predate fp maintenance (a single text scan buys fp-only dedup forever
    after).  The batch job and the streaming foreachBatch both go through
    here — two producers of one side-table must enact identical policy
    (review finding: the block was previously copy-pasted between them)."""
    from ..operators.dedup import fps_of

    if committed is None:
        return None
    if not fp_tbl.exists():
        fp_tbl.append(
            fps_of(committed, "extracted_text"),
            summary={"op": "backfill", "run_id": run_id},
        )
    return fp_tbl.read(spark).select("fp")


def rebuild_fp_table(
    spark: SparkSession,
    results_path: str,
    fp_path: str | None = None,
    text_col: str = "extracted_text",
) -> str:
    """Rebuild the fingerprint side-table from the results table (one full
    text scan, compact-style REPLACING snapshot).  Heals a table that
    predates fp maintenance or accumulated gaps from interleaved
    ``dedup_content=False`` runs / crashes between results- and fp-commit.
    Returns the new fp snapshot id."""
    from ..operators.dedup import fps_of

    results_tbl = SnapshotTable(results_path)
    fp_tbl = SnapshotTable(fp_path or f"{results_path}_fps")
    expected = fp_tbl.snapshot_id()  # ConflictError if a job appends mid-rebuild
    fps = fps_of(results_tbl.read(spark), text_col)
    return fp_tbl.append(
        fps, summary={"op": "rebuild"}, _replace=True, _expected_parent=expected
    )
