"""Z-order (Morton) clustering for the snapshot lakehouse.

The file-skipping problem: per-file min/max stats (catalog.py
`_plan_files`) prune perfectly on the column the data was SORTED by, but
a linear sort leaves every OTHER column's per-file range spanning the
whole domain — a 2-D box predicate on a 100 TB table then opens every
file for the second column.  Z-ordering interleaves the bits of the
clustering columns so files cover small axis-aligned boxes in ALL of
them at once; this is Delta/Iceberg's `OPTIMIZE ZORDER BY` re-expressed
as pure Spark column arithmetic.

Design for SQL-replayability (the oracle can replay every step):
- values are quantized with explicit caller-supplied [lo, hi] ranges via
  exact integer fixed-point math (no float rounding to disagree over),
- the Morton interleave is an unrolled shift/mask expression chain —
  codegen'd JVM arithmetic, no UDF, no shuffle for the projection,
- the clustered WRITE is sort-by-zvalue + range repartition, so the only
  exchange is the global range sort the layout requires.

Reference analog: none in the reference repo (it processes one document
at a time); this is table-layout infrastructure its batch jobs would
need at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import SnapshotTable

#: quantization width per column; 2 columns x 16 bits = 32-bit z-values
ZBITS = 16


def _overflow_shift(width: int, bits: int) -> int:
    """Right-shift that keeps ``(width >> s) * (2^bits - 1)`` inside int64.

    The naive ``(v - lo) * (2^bits - 1)`` product wraps (Spark non-ANSI)
    once ``hi - lo`` reaches 2^(63-bits) — e.g. a microsecond-epoch
    timestamp column spanning ~5 years at bits=16.  Quantization is a
    coarsening anyway, so pre-coarsening the value AND the width by the
    same power of two keeps the arithmetic exact-integer and monotone
    while restoring the headroom; s = 0 (a no-op) for every narrow
    domain, so existing layouts are unchanged."""
    return max(0, width.bit_length() - (63 - bits))


def quantize_int(col: str, lo: int, hi: int, bits: int = ZBITS) -> F.Column:
    """Exact fixed-point quantization of an integer column to [0, 2^bits):
    q = clamp(v, lo, hi); ((q - lo) >> s) * (2^bits - 1) DIV ((hi - lo) >> s)
    with s = ``_overflow_shift`` (0 unless the domain is wider than
    2^(63-bits), where the unshifted product would wrap int64).

    Integer-only (BIGINT products with 64-bit headroom, Spark's integral
    DIV — never float division), so DuckDB replays it bit-for-bit."""
    if hi <= lo:
        raise ValueError("quantize needs hi > lo")
    width = hi - lo
    s = _overflow_shift(width, bits)
    return F.expr(
        f"CAST((((greatest(least(CAST({col} AS BIGINT), {hi}), {lo}) - {lo}) >> {s})"
        f" * {(1 << bits) - 1}) DIV {width >> s} AS BIGINT)"
    )


def zvalue(
    a: str, a_range: tuple[int, int],
    b: str, b_range: tuple[int, int],
    bits: int = ZBITS,
) -> F.Column:
    """Morton-interleaved z-value of two integer columns (by name): bit i
    of the quantized ``b`` lands at position 2i, of ``a`` at 2i+1.
    Unrolled shift/mask sum — one codegen'd projection."""
    qa = quantize_int(a, *a_range, bits=bits)
    qb = quantize_int(b, *b_range, bits=bits)
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(qa, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(qb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return out


def zvalue_sql(a: str, a_range: tuple, b: str, b_range: tuple,
               bits: int = ZBITS) -> str:
    """The DuckDB replay of :func:`zvalue` (oracle side), same arithmetic.
    Range bounds may be integers or SQL expressions (e.g. scalar-subquery
    aliases), so oracles can derive ranges from the data exactly like the
    engine side does.

    Integer bounds take the same Python-computed overflow shift as
    :func:`quantize_int`; expression bounds compute it in SQL as a CASE
    ladder over power-of-two width thresholds — pure BIGINT comparisons,
    bit-identical to ``width.bit_length()`` by construction (never a
    float log, which engines round differently near 2^53)."""
    def q(col, lo, hi):
        clamped = f"(greatest(least(CAST({col} AS BIGINT), ({hi})), ({lo})) - ({lo}))"
        if isinstance(lo, int) and isinstance(hi, int):
            if hi <= lo:
                raise ValueError("quantize needs hi > lo")
            width = hi - lo
            s = _overflow_shift(width, bits)
            return f"(({clamped} >> {s}) * {(1 << bits) - 1} // {width >> s})"
        width = f"(({hi}) - ({lo}))"
        ladder = (
            "(CASE "
            + " ".join(
                f"WHEN {width} >= {1 << (63 - bits + s)} THEN {s + 1}"
                for s in reversed(range(bits))
            )
            + " ELSE 0 END)"
        )
        return (
            f"(({clamped} >> {ladder}) * {(1 << bits) - 1}"
            f" // ({width} >> {ladder}))"
        )

    qa, qb = q(a, *a_range), q(b, *b_range)
    terms = []
    for i in range(bits):
        terms.append(f"((({qa} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qb} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def cluster_zorder(
    df: DataFrame,
    a: str, a_range: tuple[int, int],
    b: str, b_range: tuple[int, int],
    files: int = 8,
    bits: int = ZBITS,
) -> DataFrame:
    """Return ``df`` laid out in z-order: range-partitioned into ``files``
    output partitions by z-value and sorted within each.  Appending the
    result to a :class:`SnapshotTable` yields per-file min/max stats that
    are tight boxes in BOTH clustering columns."""
    z = zvalue(a, a_range, b, b_range, bits=bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_clustered(
    table: SnapshotTable,
    df: DataFrame,
    a: str, a_range: tuple[int, int],
    b: str, b_range: tuple[int, int],
    files: int = 8,
    summary: dict | None = None,
) -> str:
    """Z-order ``df`` and append it as one snapshot; returns snapshot id.

    The clustering columns are added to the table's stats allowlist —
    a z-ordered layout is pointless unless its min/max envelopes get
    recorded for pruning."""
    extra = tuple(c for c in (a, b) if c not in table.stats_columns)
    if extra:
        table.stats_columns = table.stats_columns + extra
    clustered = cluster_zorder(df, a, a_range, b, b_range, files=files)
    note = {"zorder": [a, b], "zorder_files": files}
    return table.append(clustered, summary={**(summary or {}), **note})
