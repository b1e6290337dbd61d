"""Snapshot-manifest table format (Iceberg semantics, Parquet files).

The reference's only sink is a JSON file rewritten per document
(/root/reference/ocrfw/ktp.py:2138-2140) plus a commented DB insert
(:2142).  The engine replaces it with an append-only table that gives the
north_rule's resumability: every append is a SNAPSHOT — an immutable JSON
manifest listing the complete file set — committed by an atomic rename, so
readers see either the old or the new table, never a torn write.

Layout:
    <table>/data/<snapshot_id>/part-*.parquet    (files of one append)
    <table>/_snapshots/v<seq>-<snapshot_id>.json (manifest: full file list)

Reading loads the manifest with the highest sequence number and reads
exactly its file list.  Resume = anti-join of source urls against the
committed table (SURVEY.md §2c).  With a networked cluster the same calls
map 1:1 to Iceberg: append -> df.writeTo(tbl).append(), read ->
spark.read.format("iceberg"), committed snapshot -> snapshot-id travel.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.snapshot_dir = self.path / "_snapshots"

    # -- manifest bookkeeping ------------------------------------------------
    _MANIFEST_RE = re.compile(r"^v\d{8}\.json$")

    def _manifests(self) -> list[Path]:
        """Committed manifests only: a ``.tmp-*`` file left by a crash between
        fsync and the os.link claim must never be read as a snapshot."""
        if not self.snapshot_dir.is_dir():
            return []
        out = []
        for p in self.snapshot_dir.iterdir():
            if self._MANIFEST_RE.match(p.name):
                out.append(p)
            elif p.name.startswith(".tmp-"):
                # opportunistic cleanup of orphaned temp files from hard
                # crashes; age-gated so an in-flight commit is never raced,
                # and stat+unlink both guarded — a concurrent _manifests()
                # may have already removed the orphan
                try:
                    if time.time() - p.stat().st_mtime > 3600:
                        p.unlink()
                except OSError:
                    pass
        return sorted(out)

    def latest_manifest(self) -> dict | None:
        manifests = self._manifests()
        if not manifests:
            return None
        with open(manifests[-1], encoding="utf-8") as f:
            return json.load(f)

    def exists(self) -> bool:
        return bool(self._manifests())

    def snapshot_id(self) -> str | None:
        m = self.latest_manifest()
        return m["snapshot_id"] if m else None

    # -- write path ------------------------------------------------------------
    def append(
        self, df: DataFrame, summary: dict | None = None, max_retries: int = 20, _replace: bool = False
    ) -> str:
        """Append df as a new snapshot; returns the snapshot id.

        Optimistic-concurrency commit (Iceberg-style): data files are
        written first (invisible to readers), then the manifest claims the
        next sequence number via an EXCLUSIVE create (``os.link`` of a
        fsync'd temp file onto the unique ``v<seq>.json`` name — a POSIX
        compare-and-swap).  A concurrent writer that claimed the same
        sequence first causes EEXIST; this writer then re-reads the new
        parent, rebases its manifest (parent files + its own) and retries,
        so no committed snapshot is ever orphaned."""
        snapshot_id = uuid.uuid4().hex[:16]
        data_dir = self.path / "data" / snapshot_id
        df.write.mode("overwrite").parquet(str(data_dir))
        new_files = sorted(
            str(p.relative_to(self.path))
            for p in data_dir.rglob("*.parquet")
            if p.is_file()
        )
        file_stats = self._collect_file_stats(new_files)
        self.snapshot_dir.mkdir(parents=True, exist_ok=True)

        for _attempt in range(max_retries):
            parent = self.latest_manifest()
            seq = (parent["sequence"] + 1) if parent else 1
            manifest = {
                "snapshot_id": snapshot_id,
                "parent_id": parent["snapshot_id"] if parent else None,
                "sequence": seq,
                "committed_at_ms": int(time.time() * 1000),
                "schema": df.schema.json(),
                "files": new_files if _replace else (parent["files"] if parent else []) + new_files,
                "file_stats": file_stats
                if _replace
                else {**(parent.get("file_stats", {}) if parent else {}), **file_stats},
                "summary": summary or {},
            }
            tmp = self.snapshot_dir / f".tmp-{snapshot_id}-{_attempt}.json"
            final = self.snapshot_dir / f"v{seq:08d}.json"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, final)  # atomic claim of this sequence number
                os.unlink(tmp)
                return snapshot_id
            except FileExistsError:
                os.unlink(tmp)  # lost the race: rebase on the new parent
        raise RuntimeError(f"commit contention: gave up after {max_retries} retries on {self.path}")

    # -- file statistics (manifest-level pruning, Iceberg-style) -------------
    STATS_COLUMNS = ("url", "doc_id", "user_id", "id")

    def _collect_file_stats(self, rel_files: list[str]) -> dict:
        """Per-file row count + min/max of the first present stats column,
        read from parquet footers (metadata only, no data scan)."""
        import pyarrow.parquet as pq

        stats: dict = {}
        for rel in rel_files:
            try:
                meta = pq.ParquetFile(str(self.path / rel)).metadata
            except Exception:
                continue
            names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            col = next((c for c in self.STATS_COLUMNS if c in names), None)
            entry: dict = {"rows": meta.num_rows}
            if col is not None:
                idx = names[col]
                lo = hi = None
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    entry.update({"column": col, "min": lo, "max": hi})
            stats[rel] = entry
        return stats

    # -- read path ------------------------------------------------------------
    def _resolve_manifest(self, snapshot_id: str | None) -> dict:
        manifest = self.latest_manifest()
        if snapshot_id is not None:
            for p in reversed(self._manifests()):
                with open(p, encoding="utf-8") as f:
                    m = json.load(f)
                if m["snapshot_id"] == snapshot_id:
                    manifest = m
                    break
            else:
                raise ValueError(f"snapshot {snapshot_id} not found in {self.path}")
        if manifest is None:
            raise FileNotFoundError(f"no committed snapshot in {self.path}")
        return manifest

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        between: tuple | None = None,
    ) -> DataFrame:
        """Read the latest (or a pinned) snapshot's exact file list.

        ``between=(lo, hi)`` prunes data files whose manifest min/max range
        for the stats column cannot intersect [lo, hi] BEFORE Spark ever
        lists them — manifest-level scan pruning (row-group pruning inside
        the surviving files still happens in the parquet reader).  The
        pruned read may still contain out-of-range rows; callers filter."""
        manifest = self._resolve_manifest(snapshot_id)
        files = manifest["files"]
        if between is not None:
            lo, hi = between
            stats = manifest.get("file_stats", {})

            def may_match(rel: str) -> bool:
                st = stats.get(rel)
                if not st or "min" not in st:
                    return True  # no stats -> cannot prune
                return not (st["max"] < lo or st["min"] > hi)

            files = [f for f in files if may_match(f)]
        paths = [str(self.path / f) for f in files]
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType.fromJson(json.loads(manifest["schema"])))
        # mergeSchema: snapshots may carry evolved (widened) schemas; the
        # union-by-name semantics match Iceberg's add-column evolution.
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def pruned_file_count(self, between: tuple, snapshot_id: str | None = None) -> tuple[int, int]:
        """(files kept, total files) for a range — observability of pruning."""
        manifest = self._resolve_manifest(snapshot_id)
        stats = manifest.get("file_stats", {})
        lo, hi = between
        kept = sum(
            1
            for f in manifest["files"]
            if not (s := stats.get(f)) or "min" not in s or not (s["max"] < lo or s["min"] > hi)
        )
        return kept, len(manifest["files"])

    def history(self) -> list[dict]:
        out = []
        for p in self._manifests():
            with open(p, encoding="utf-8") as f:
                m = json.load(f)
            out.append(
                {
                    "sequence": m["sequence"],
                    "snapshot_id": m["snapshot_id"],
                    "parent_id": m["parent_id"],
                    "committed_at_ms": m["committed_at_ms"],
                    "n_files": len(m["files"]),
                    "summary": m["summary"],
                }
            )
        return out

    # -- maintenance -----------------------------------------------------------
    def compact(self, spark: SparkSession, target_partitions: int = 1) -> str:
        """Rewrite the table into ``target_partitions`` files as a new
        REPLACING snapshot (Iceberg rewrite_data_files analog).  Old data
        files stay on disk for time travel of older snapshots; readers of
        the new snapshot list only the compacted files."""
        current = self.read(spark).coalesce(target_partitions)
        return self.append(current, summary={"op": "compact"}, _replace=True)

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Expire all but the last ``keep_last`` snapshots and DELETE data
        files referenced only by expired ones (Iceberg expire_snapshots +
        remove_orphan_files analog).  Time travel to expired snapshots is
        gone; live snapshots are untouched."""
        manifests = self._manifests()
        if len(manifests) <= keep_last:
            return {"expired": 0, "deleted_files": 0}
        keep, drop = manifests[-keep_last:], manifests[:-keep_last]
        live_files: set = set()
        for p in keep:
            with open(p, encoding="utf-8") as f:
                live_files.update(json.load(f)["files"])
        deleted = 0
        for p in drop:
            with open(p, encoding="utf-8") as f:
                m = json.load(f)
            for rel in m["files"]:
                if rel not in live_files:
                    fp = self.path / rel
                    if fp.exists():
                        fp.unlink()
                        deleted += 1
            os.unlink(p)
        # prune now-empty data dirs
        data_root = self.path / "data"
        if data_root.is_dir():
            for d in data_root.iterdir():
                if d.is_dir() and not any(d.iterdir()):
                    d.rmdir()
        return {"expired": len(drop), "deleted_files": deleted}
