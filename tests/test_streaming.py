"""Streaming tests: incremental extraction via foreachBatch into the
lakehouse (multi-epoch, no duplicate urls, resume across restarts) and the
AvailableNow windowed aggregation."""

import pandas as pd

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.lakehouse import SnapshotTable
from universal_key_value_based_text_processing_with_ocr_spark.sources import PAGES_SCHEMA
from universal_key_value_based_text_processing_with_ocr_spark.sources.synthdocs import gen_page_row
from universal_key_value_based_text_processing_with_ocr_spark.streaming import (
    streamed_extraction_job,
)


def _write_pages_files(spark, tmp_path, ranges):  # noqa: F811
    pages_dir = tmp_path / "pages"
    for i, (lo, hi) in enumerate(ranges):
        df = spark.createDataFrame(
            pd.DataFrame([gen_page_row(42, d) for d in range(lo, hi)]), schema=PAGES_SCHEMA
        )
        df.coalesce(1).write.mode("append").parquet(str(pages_dir))
    return str(pages_dir)


def test_streamed_extraction_multi_epoch_no_duplicates(spark, tmp_path):  # noqa: F811
    pages_dir = _write_pages_files(spark, tmp_path, [(0, 10), (10, 20), (20, 30)])
    results = str(tmp_path / "results")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    info = streamed_extraction_job(spark, pages_dir, results, audit, checkpoint_dir=ckpt)
    assert info["n_epochs"] >= 1
    tbl = SnapshotTable(results).read(spark)
    assert tbl.count() == 30
    assert tbl.select("url").distinct().count() == 30

    # New files arrive; rerun with the same checkpoint: only the new docs.
    _write_pages_files(spark, tmp_path, [(30, 40)])
    info2 = streamed_extraction_job(spark, pages_dir, results, audit, checkpoint_dir=ckpt)
    tbl2 = SnapshotTable(results).read(spark)
    assert tbl2.count() == 40
    assert tbl2.select("url").distinct().count() == 40

    # Restart WITHOUT a checkpoint (full replay): the lakehouse anti-join
    # keeps the table duplicate-free (idempotent commits).
    info3 = streamed_extraction_job(spark, pages_dir, results, audit, checkpoint_dir=None)
    tbl3 = SnapshotTable(results).read(spark)
    assert tbl3.count() == 40
    assert tbl3.select("url").distinct().count() == 40
    assert info3["snapshot_id"] == info2["snapshot_id"]  # nothing new appended


def test_streamed_matches_batch_extraction(spark, tmp_path):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.extract import (
        extract_pages,
    )

    pages_dir = _write_pages_files(spark, tmp_path, [(0, 25)])
    results = str(tmp_path / "results")
    streamed_extraction_job(spark, pages_dir, results)
    streamed = {
        (r.url, r.result_json, r.extracted_text)
        for r in SnapshotTable(results).read(spark).collect()
    }
    batch = {
        (r.url, r.result_json, r.extracted_text)
        for r in extract_pages(spark.read.parquet(pages_dir)).collect()
    }
    assert streamed == batch
