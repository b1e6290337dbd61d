"""Model-based property test for the chunked-manifest lakehouse.

A seeded random sequence of table operations (append / compact / expire /
pruned read / time travel) is replayed against a plain-Python model of the
table contents; after every step the real table must agree with the model.
Deterministic (fixed seeds), so a failure is replayable — this locks the
metadata layer's invariants the targeted tests can't enumerate:

- read() == union of all appended batches, at every point in history
- compact() never changes visible rows; expire() never changes the
  surviving snapshots' rows
- pruned reads are SOUND: read(between=R) is a superset of the model rows
  in R (pruning may over-read, never under-read)
- time travel to any non-expired snapshot reproduces that snapshot's rows
"""

import random

import pytest

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
    SnapshotTable,
)


def _read_rows(spark, tbl, snapshot_id=None, between=None):
    df = tbl.read(spark, snapshot_id=snapshot_id, between=between)
    return sorted((r.doc_id, r.v) for r in df.collect())


@pytest.mark.parametrize("seed", [7, 91])
def test_lakehouse_random_op_sequences_match_model(spark, tmp_path, seed):  # noqa: F811
    rng = random.Random(seed)
    tbl = SnapshotTable(tmp_path / f"tbl-{seed}")
    # keep chunks small so multi-chunk manifests are actually exercised
    tbl.CHUNK_MAX_FILES = 2

    model: list[tuple[int, str]] = []
    history: dict[str, list[tuple[int, str]]] = {}  # snapshot_id -> rows
    next_id = 0

    for step in range(14):
        op = rng.choice(["append", "append", "append", "compact", "expire"])
        if op == "append":
            n = rng.randint(1, 40)
            lo = next_id
            next_id += n
            batch = [(i, f"v{seed}-{step}-{i}") for i in range(lo, lo + n)]
            df = spark.createDataFrame(batch, "doc_id long, v string").coalesce(
                rng.randint(1, 3)
            )
            sid = tbl.append(df)
            model.extend(batch)
            history[sid] = sorted(model)
        elif op == "compact" and tbl.exists():
            sid = tbl.compact(spark, target_partitions=1)
            history[sid] = sorted(model)
        elif op == "expire" and tbl.exists():
            keep = rng.randint(1, 3)
            expired_before = {h["snapshot_id"] for h in tbl.history()}
            tbl.expire_snapshots(keep_last=keep)
            surviving = {h["snapshot_id"] for h in tbl.history()}
            for sid in expired_before - surviving:
                history.pop(sid, None)

        if not tbl.exists():
            continue
        # full read matches the model
        assert _read_rows(spark, tbl) == sorted(model), f"step {step} ({op})"
        # pruned read is sound (superset within range, exact after filter)
        if model:
            lo = rng.randint(0, max(0, next_id - 1))
            hi = lo + rng.randint(0, 50)
            got = set(_read_rows(spark, tbl, between=(lo, hi)))
            want = {(d, v) for d, v in model if lo <= d <= hi}
            assert want <= got, f"pruned read lost rows at step {step}"
        # time travel to every surviving snapshot reproduces its state
        for sid, rows in history.items():
            assert _read_rows(spark, tbl, snapshot_id=sid) == rows

    # bookkeeping invariants at the end, BOTH directions: every referenced
    # chunk exists (no dangling references) and every on-disk chunk is
    # referenced (no orphans — nothing in this test crashes mid-expire, so
    # the collect-then-delete expire must leave the two sets identical)
    hist = tbl.history()
    assert hist[-1]["n_files"] >= 1
    referenced = set()
    for h in hist:
        m = tbl._resolve_manifest(h["snapshot_id"])
        for s in tbl._chunk_summaries(m):
            if "path" in s:
                assert (tbl.snapshot_dir / s["path"]).exists()
                referenced.add(s["path"])
    on_disk = {p.name for p in tbl.snapshot_dir.glob("chunk-*.json")}
    assert on_disk == referenced
