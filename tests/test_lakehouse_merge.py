"""merge_upsert: keyed MERGE with file-granular copy-on-write.

Pins the contract that matters at 100 TB: a recrawl batch touching a few
urls must rewrite ONLY the data files that contain those urls, carry every
untouched manifest chunk without re-reading a footer, keep time travel to
the pre-merge snapshot intact, and refuse to lose a concurrent append.
"""

from __future__ import annotations

import json

import pytest

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
    ConflictError,
    SnapshotTable,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, schema="url string, text string")


def _sorted(df):
    return sorted(map(tuple, df.select("url", "text").collect()))


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(tmp_path / "tbl")
    # two appends -> two chunks; each append range-partitioned into two
    # files with disjoint url ranges so a single-url update hits ONE file
    a = _rows(spark, [(f"https://a{i:02d}", f"A{i}") for i in range(8)])
    b = _rows(spark, [(f"https://b{i:02d}", f"B{i}") for i in range(8)])
    t.append(a.repartitionByRange(2, "url"))
    t.append(b.repartitionByRange(2, "url"))
    return t


class TestMergeSemantics:
    def test_matched_replaced_unmatched_inserted(self, spark, table):
        pre = table.snapshot_id()
        upd = _rows(spark, [("https://a03", "A3-new"), ("https://zz99", "Z-ins")])
        res = table.merge_upsert(spark, upd)
        got = dict(_sorted(table.read(spark)))
        assert got["https://a03"] == "A3-new"
        assert got["https://zz99"] == "Z-ins"
        assert len(got) == 17  # 16 originals + 1 insert
        assert got["https://a00"] == "A0"  # untouched rows intact
        # time travel: the pre-merge snapshot still shows the old value
        old = dict(_sorted(table.read(spark, snapshot_id=pre)))
        assert old["https://a03"] == "A3" and "https://zz99" not in old

    def test_insert_only_rewrites_nothing(self, spark, table):
        upd = _rows(spark, [("https://zz01", "new1"), ("https://zz02", "new2")])
        res = table.merge_upsert(spark, upd)
        assert res["files_rewritten"] == 0
        assert res["rows_inserted"] == 2
        assert len(_sorted(table.read(spark))) == 18

    def test_empty_updates_no_commit(self, spark, table):
        pre = table.snapshot_id()
        res = table.merge_upsert(spark, _rows(spark, []))
        assert res["snapshot_id"] is None
        assert table.snapshot_id() == pre

    def test_duplicate_update_keys_all_inserted(self, spark, table):
        """Documented semantics: updates with duplicate keys insert ALL
        their rows (callers dedupe upstream when keys must stay unique)."""
        upd = _rows(spark, [("https://a03", "v1"), ("https://a03", "v2")])
        table.merge_upsert(spark, upd)
        vals = [t for (u, t) in _sorted(table.read(spark)) if u == "https://a03"]
        assert sorted(vals) == ["v1", "v2"]

    def test_empty_table_plain_append(self, spark, tmp_path):
        t = SnapshotTable(tmp_path / "fresh")
        res = t.merge_upsert(spark, _rows(spark, [("u1", "x")]))
        assert res["rows_inserted"] == 1
        assert _sorted(t.read(spark)) == [("u1", "x")]

    def test_rewrite_accounting_excludes_carried_survivors(self, spark, table):
        """A merge that rewrites a file must report the UPSERT batch size,
        not the rewritten footer total — survivors carried into the new
        file are not insertions (the old accounting double-counted them
        in every history rollup)."""
        res = table.merge_upsert(spark, _rows(spark, [("https://a00", "A0-new")]))
        assert res["files_rewritten"] == 1
        assert res["rows_inserted"] == 1  # the one update row, NOT 1+survivors
        assert res["rows_written"] == res["rows_inserted"] + res["rows_carried"]
        assert res["rows_carried"] == 3  # 4-row file rewritten, 3 survivors
        assert table.latest_manifest()["summary"]["n_rows"] == 1
        assert table.latest_manifest()["summary"]["n_rows_written"] == 4


class TestCopyOnWriteScope:
    def test_single_url_rewrites_one_file(self, spark, table):
        res = table.merge_upsert(spark, _rows(spark, [("https://a00", "A0-new")]))
        assert res["files_rewritten"] == 1
        assert res["files_kept"] == 3  # of the 4 original files

    def test_untouched_chunks_carried_verbatim(self, spark, table):
        """A chunk with no hit file must appear in the new manifest as the
        SAME chunk file (no rebuild, no footer re-read) — manifest surgery,
        not manifest regeneration."""
        before = {s["path"]: s for s in table.latest_manifest()["chunks"]}
        table.merge_upsert(spark, _rows(spark, [("https://a00", "A0-new")]))
        after = {s["path"]: s for s in table.latest_manifest()["chunks"]}
        # the b-chunk (no a-urls) must be carried with an identical summary
        carried = set(before) & set(after)
        assert carried, "no chunk carried verbatim"
        for p in carried:
            assert before[p] == after[p]

    def test_partially_hit_chunk_rebuilt_keeping_other_files(self, spark, table):
        manifest0 = table.latest_manifest()
        files0 = set()
        for s in manifest0["chunks"]:
            files0 |= set(table._load_chunk(s)["files"])
        res = table.merge_upsert(spark, _rows(spark, [("https://a00", "A0-new")]))
        manifest1 = table.latest_manifest()
        files1 = set()
        for s in manifest1["chunks"]:
            files1 |= set(table._load_chunk(s)["files"])
        dropped = files0 - files1
        kept = files0 & files1
        assert len(dropped) == 1  # exactly the hit file left the listing
        assert len(kept) == 3
        # the kept sibling of the hit file still carries its stats
        for s in manifest1["chunks"]:
            chunk = table._load_chunk(s)
            for f in chunk["files"]:
                if f in kept:
                    assert chunk["file_stats"].get(f, {}).get("rows", 0) > 0

    def test_stats_pruning_bounds_candidates(self, spark, table):
        """An update whose key envelope excludes the b-files must not even
        CANDIDATE them (manifest-stats prune before any file I/O)."""
        res = table.merge_upsert(spark, _rows(spark, [("https://a01", "x")]))
        assert res["candidate_files"] <= 2  # only the a-range files


class TestConcurrency:
    def test_concurrent_append_raises_conflict(self, spark, table, tmp_path):
        """A merge computed from snapshot S must refuse to commit over a
        concurrent append (its rows would vanish) — same contract as
        compact."""
        expected = table.snapshot_id()
        # simulate the interleave: another writer lands an append between
        # the merge's read and its commit by pre-committing here and then
        # asking merge to validate against the stale parent
        upd = _rows(spark, [("https://a00", "A0-new")])
        table.append(_rows(spark, [("https://c00", "C0")]))
        # drive the internal commit directly with the stale expectation
        with pytest.raises(ConflictError, match="concurrent append"):
            table._commit(
                "deadbeefdeadbeef",
                upd.schema.json(),
                {"op": "merge-upsert"},
                lambda parent, seq: [],
                expected_parent=expected,
            )

    def test_merge_after_merge_composes(self, spark, table):
        table.merge_upsert(spark, _rows(spark, [("https://a00", "v1")]))
        table.merge_upsert(spark, _rows(spark, [("https://a00", "v2"), ("https://b00", "w")]))
        got = dict(_sorted(table.read(spark)))
        assert got["https://a00"] == "v2" and got["https://b00"] == "w"
        assert len(got) == 16


class TestExpireInterop:
    def test_old_files_survive_until_expire(self, spark, table, tmp_path):
        """Rewritten files stay on disk (old snapshot references them) and
        are deleted only when that snapshot expires."""
        pre = table.snapshot_id()
        table.merge_upsert(spark, _rows(spark, [("https://a00", "A0-new")]))
        # time travel still works pre-expire
        assert dict(_sorted(table.read(spark, snapshot_id=pre)))["https://a00"] == "A0"
        stats = table.expire_snapshots(keep_last=1)
        assert stats["deleted_files"] >= 1  # the rewritten file got swept
        # latest is intact
        assert dict(_sorted(table.read(spark)))["https://a00"] == "A0-new"


class TestEqualityDeletes:
    def test_delete_hides_rows_without_touching_data_files(self, spark, table):
        before = {s["path"]: s for s in table.latest_manifest()["chunks"]}
        res = table.delete_where(spark, _rows(spark, [("https://a00", ""), ("https://b07", "")]))
        assert res["snapshot_id"] is not None
        after = {s["path"]: s for s in table.latest_manifest()["chunks"]}
        assert before == after  # NO chunk rebuilt, no data file rewritten
        got = dict(_sorted(table.read(spark)))
        assert "https://a00" not in got and "https://b07" not in got
        assert len(got) == 14

    def test_time_travel_before_delete_still_shows_rows(self, spark, table):
        pre = table.snapshot_id()
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        assert "https://a00" in dict(_sorted(table.read(spark, snapshot_id=pre)))

    def test_reappended_key_stays_visible(self, spark, table):
        """Sequence semantics: a delete hides only OLDER data — a row with
        the deleted key appended AFTER the delete is live."""
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        table.append(_rows(spark, [("https://a00", "A0-reborn")]))
        got = dict(_sorted(table.read(spark)))
        assert got["https://a00"] == "A0-reborn"
        assert len(got) == 16  # 15 survivors + the reborn row

    def test_two_delete_generations_compose(self, spark, table):
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        table.append(_rows(spark, [("https://a00", "A0-reborn")]))
        table.delete_where(spark, _rows(spark, [("https://a00", ""), ("https://b01", "")]))
        got = dict(_sorted(table.read(spark)))
        # generation 2 hides the reborn row AND b01; generation 1 already hid the original
        assert "https://a00" not in got and "https://b01" not in got
        assert len(got) == 14

    def test_compact_applies_and_clears_deletes(self, spark, table):
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        expected = dict(_sorted(table.read(spark)))
        table.compact(spark)
        assert table.latest_manifest()["delete_files"] == []
        assert dict(_sorted(table.read(spark))) == expected
        # merge is allowed again after compaction
        table.merge_upsert(spark, _rows(spark, [("https://b00", "B0-new")]))
        assert dict(_sorted(table.read(spark)))["https://b00"] == "B0-new"

    def test_merge_refuses_pending_deletes(self, spark, table):
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        with pytest.raises(ConflictError, match="compact"):
            table.merge_upsert(spark, _rows(spark, [("https://b00", "x")]))

    def test_mixed_delete_keys_refused(self, spark, table):
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        other = spark.createDataFrame([("x",)], schema="text string")
        with pytest.raises(ValueError, match="mixed delete keys"):
            table.delete_where(spark, other, key="text")

    def test_empty_delete_no_commit(self, spark, table):
        pre = table.snapshot_id()
        res = table.delete_where(spark, _rows(spark, []))
        assert res["snapshot_id"] is None
        assert table.snapshot_id() == pre

    def test_append_carries_deletes_forward(self, spark, table):
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        table.append(_rows(spark, [("https://c00", "C0")]))
        m = table.latest_manifest()
        assert len(m["delete_files"]) == 1
        got = dict(_sorted(table.read(spark)))
        assert "https://a00" not in got and got["https://c00"] == "C0"

    def test_expire_keeps_live_delete_files(self, spark, table, tmp_path):
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        table.expire_snapshots(keep_last=1)
        got = dict(_sorted(table.read(spark)))
        assert "https://a00" not in got and len(got) == 15

    def test_compact_then_expire_sweeps_delete_files(self, spark, table):
        table.delete_where(spark, _rows(spark, [("https://a00", "")]))
        table.compact(spark)
        table.expire_snapshots(keep_last=1)
        from pathlib import Path
        leftover = [
            p
            for d in (Path(table.path) / "data").iterdir()
            if d.name.endswith("-del")
            for p in d.rglob("*.parquet")
        ]
        # the delete FILES are reclaimed with their expired snapshot; the
        # emptied dir itself lingers until the age-gated orphan sweep
        # (in-flight-append protection), same as rewritten data dirs
        assert leftover == []
        assert "https://a00" not in dict(_sorted(table.read(spark)))
