"""Training-set assembly: leakage-safe splits and size-targeted shards.

The last mile of a 100 TB corpus is not a query — it is a LAYOUT:
which documents form train/val/test, and how the survivors are packed
into fixed-size output shards a training loader can stream.  Both are
pure functions here (hash arithmetic + one window), so a resumed or
re-run job reproduces the identical layout bit-for-bit — the same
determinism contract as ``textstats.stratified_sample``.

- ``assign_splits``: train/val/test by **hash of the host, not the
  document** — eval leakage at web scale is overwhelmingly intra-site
  (boilerplate, mirrored articles, templated pages), so the split unit
  must be the site: every page of a host lands in the same split BY
  CONSTRUCTION, not by an after-the-fact check.  Weights are integer
  percents mapped onto md5 buckets (the engine-replayable hash seam —
  ``dedup._md5_long`` discipline; production flips to xxhash64).
- ``plan_shards``: assign each document an output shard such that
  shards hit ~``target_bytes``.  A single global greedy pack would be
  one reducer; instead documents hash-spread over ``writers`` parallel
  writer lanes and each lane packs greedily by cumulative size — ONE
  shuffle on the lane key, then a per-lane running sum (exactly the
  sequential pass a real shard writer makes).  ``writers`` tracks
  cluster parallelism, so lane skew is hash-uniform and the window
  state per lane is a single counter.  A document larger than the
  target gets a shard to itself (lane indices stay monotone; they may
  skip — shard NAMES are dense per lane only if no oversized docs).
- ``shard_manifest``: per-shard (n_docs, bytes, id range) — the
  manifest a loader consumes; map-side-combinable agg over the
  assignment.

Reference analog: the engine's snapshot sink appends result chunks
with per-chunk manifests and stats envelopes (lakehouse/catalog.py);
``plan_shards``/``shard_manifest`` is the same chunked-layout move for
the corpus itself.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_long

#: default split weights in integer percents (must sum to <= the bucket
#: modulus, 100).  Order matters: buckets are dealt first-to-last.
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 98),
    ("val", 1),
    ("test", 1),
)


def assign_splits(
    docs: DataFrame,
    host_col: str = "host",
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
    seed: int = 42,
) -> DataFrame:
    """Append a ``split`` label, constant per host (leakage-safe by
    construction — see module docstring).  Pure projection: zero
    shuffles, zero UDFs; the bucket is md5-derived so any engine
    replays the exact assignment."""
    weights = [w for _, w in splits]
    if min(weights) <= 0 or sum(weights) > 100:
        raise ValueError(f"split weights must be positive and sum <= 100: {splits!r}")
    bucket = F.pmod(
        _md5_long(F.concat_ws(":", F.lit(str(seed)), F.col(host_col))), F.lit(100)
    )
    label, lo = F.lit(splits[-1][0]), 0
    cuts = []
    for name, w in splits[:-1]:
        cuts.append((name, lo, lo + w))
        lo += w
    for name, a, b in reversed(cuts):
        label = F.when((bucket >= a) & (bucket < b), F.lit(name)).otherwise(label)
    # NULL hosts: concat_ws skips NULLs, which would silently pool them
    # into one seed-only bucket; route them to the LAST split (the
    # smallest, conventionally test/audit) explicitly instead.
    label = F.when(F.col(host_col).isNull(), F.lit(splits[-1][0])).otherwise(label)
    return docs.withColumn("split", label)


def plan_shards(
    docs: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "n_bytes",
    target_bytes: int = 1 << 28,
    writers: int = 64,
    seed: int = 42,
    shuffle: bool = False,
) -> DataFrame:
    """Assign each doc a ``(writer, shard_seq)`` output shard by greedy
    per-lane packing: lane = md5(seed:id) % writers, docs packed in id
    order, a shard closes when the lane's running byte offset crosses a
    ``target_bytes`` boundary.  Output adds ``writer``, ``shard_seq``,
    ``shard`` (the lane-qualified name) and ``shard_offset`` (the doc's
    byte offset within its lane — what a writer task seeks to).

    ``shuffle=True`` packs each lane in ``md5(seed+1:id)`` order instead
    of id order — a deterministic corpus-wide training shuffle: crawl
    order is heavily auto-correlated (a host's pages arrive together),
    and packing the permuted order decorrelates shards WITHOUT a global
    sort — the lane spread plus the in-lane hash order IS the
    permutation, reproducible on any engine and any rerun.  (seed+1
    keeps the order hash independent of the lane hash: reusing one
    value would sort every lane by its own residue classes.)

    One exchange (on the lane key) + one per-lane ordered window; the
    window function is a running SUM, so Spark streams it with O(1)
    state per lane.  ``id_col`` must be unique per row — it is both the
    lane hash input and (directly or hashed) the deterministic pack
    order.
    """
    if target_bytes <= 0 or writers <= 0:
        raise ValueError("target_bytes and writers must be positive")
    lane = F.pmod(
        _md5_long(F.concat_ws(":", F.lit(str(seed)), F.col(id_col))), F.lit(writers)
    ).alias("writer")
    sized = docs.select("*", lane)
    if shuffle:
        order = [
            _md5_long(F.concat_ws(":", F.lit(str(seed + 1)), F.col(id_col))).asc(),
            F.col(id_col).asc(),  # total order even on a 60-bit collision
        ]
    else:
        order = [F.col(id_col).asc()]
    w = (
        Window.partitionBy("writer")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(bytes_col).over(w) - F.col(bytes_col)).alias("_start")
    out = sized.select("*", start).select(
        "*",
        F.expr(f"_start div {int(target_bytes)}").cast("long").alias("shard_seq"),
        F.pmod(F.col("_start"), F.lit(int(target_bytes))).alias("shard_offset"),
    )
    shard_name = F.concat_ws(
        "-",
        F.lit("shard"),
        F.lpad(F.col("writer").cast("string"), 5, "0"),
        F.lpad(F.col("shard_seq").cast("string"), 6, "0"),
    )
    return out.drop("_start").withColumn("shard", shard_name)


def shard_manifest(assignments: DataFrame, id_col: str = "doc_id",
                   bytes_col: str = "n_bytes") -> DataFrame:
    """Per-shard manifest: (shard, writer, shard_seq, n_docs, bytes,
    first_id, last_id) — combinable aggregation, one shuffle on the
    shard key (already co-located with the planning window's lane
    partitioning, so AQE typically reuses the exchange)."""
    return assignments.groupBy("shard", "writer", "shard_seq").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bytes_col).alias("bytes"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )
