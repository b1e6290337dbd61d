"""Z-order lakehouse clustering: the layout must make per-file min/max
stats tight in BOTH clustering columns (fewer files opened than a linear
sort for a second-column band predicate), round-trip the rows exactly,
and compute z-values the DuckDB twin reproduces bit-for-bit."""

import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("zorder-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s

from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.catalog import (
    SnapshotTable,
)
from universal_key_value_based_text_processing_with_ocr_spark.lakehouse.zorder import (
    cluster_zorder,
    write_clustered,
    zvalue,
    zvalue_sql,
)


def _grid(spark, n=64):
    # n x n grid: every (a, b) combination once
    return spark.range(n * n).select(
        (F.col("id") % n).alias("a"),
        (F.col("id") / n).cast("long").alias("b"),
        F.col("id").alias("v"),
    )


def test_zorder_prunes_second_column_where_linear_cannot(spark):
    n = 64
    df = _grid(spark, n)
    linear = SnapshotTable(tempfile.mkdtemp(prefix="zorder_lin_"))
    # linear layout: range-sorted by a ONLY (the classic single-key sort)
    linear.append(df.repartitionByRange(8, "a").sortWithinPartitions("a"))
    zt = SnapshotTable(tempfile.mkdtemp(prefix="zorder_z_"))
    write_clustered(zt, df, "a", (0, n - 1), "b", (0, n - 1), files=8)

    band = (10, 17)  # an eighth of the b domain
    lin_opened, lin_total = linear.pruned_file_count(between=band, column="b")
    z_opened, z_total = zt.pruned_file_count(between=band, column="b")
    assert lin_total == z_total == 8
    # a-sorted files all span the full b range: nothing can be skipped
    assert lin_opened == 8
    # z-ordered files cover b-boxes: a strict subset opens (range-sample
    # partition boundaries aren't perfectly bit-prefix aligned, so allow
    # boundary files — the claim is the LAYOUT prunes where linear can't)
    assert z_opened < lin_opened
    assert z_opened <= 6

    # and the a column still prunes too (the point of z vs linear-by-b)
    za_opened, _ = zt.pruned_file_count(between=(0, 15), column="a")
    assert za_opened < 8


def test_zorder_roundtrips_rows_exactly(spark):
    df = _grid(spark, 32)
    zt = SnapshotTable(tempfile.mkdtemp(prefix="zorder_rt_"))
    write_clustered(zt, df, "a", (0, 31), "b", (0, 31), files=4)
    got = sorted(tuple(r) for r in zt.read(spark).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_zvalue_matches_sql_twin(spark):
    df = _grid(spark, 16).withColumn(
        "z", zvalue("a", (0, 15), "b", (0, 15), bits=8)
    )
    rows = {(r.a, r.b): r.z for r in df.collect()}
    con = duckdb.connect()
    expr = zvalue_sql("a", (0, 15), "b", (0, 15), bits=8)
    for (a, b), z in list(rows.items())[::7]:
        (dz,) = con.execute(
            f"SELECT {expr} FROM (SELECT {a} AS a, {b} AS b)"
        ).fetchone()
        assert dz == z, (a, b)


def test_zvalue_known_answers(spark):
    """Hand-derived Morton values at bits=2 over domain [0,3]: quantized
    q == value; z interleaves (a1 b1 a0 b0)."""
    df = spark.createDataFrame(
        [(0, 0), (1, 3), (2, 1), (3, 2)], "a long, b long"
    ).withColumn("z", zvalue("a", (0, 3), "b", (0, 3), bits=2))
    got = {(r.a, r.b): r.z for r in df.collect()}
    #  a=1(01) b=3(11): bits -> a0<<1|b0 | a1<<3|b1<<2 = 0b0111 = 7
    assert got[(0, 0)] == 0
    assert got[(1, 3)] == 0b0111
    assert got[(2, 1)] == 0b1001
    assert got[(3, 2)] == 0b1110


def test_zvalue_wide_domain_no_int64_wrap(spark):
    """Microsecond-epoch-scale domains (width ~2^48) used to wrap the
    (v - lo) * 65535 product negative under Spark's non-ANSI arithmetic,
    producing garbage z-values.  The overflow shift must keep values in
    [0, 2^32), monotone along each axis, bit-equal to the DuckDB twin
    under BOTH bound styles (int literals and SQL expressions), and equal
    to the pure-Python replay of the same shifted arithmetic."""
    lo, hi = 1_600_000_000_000_000, 1_600_000_000_000_000 + (1 << 48)
    step = (hi - lo) // 7
    vals = [lo + i * step for i in range(8)] + [hi]
    df = spark.createDataFrame(
        [(v, lo) for v in vals], "a long, b long"
    ).withColumn("z", zvalue("a", (lo, hi), "b", (lo, hi)))
    got = [(r.a, r.z) for r in df.collect()]
    zs = [z for _, z in sorted(got)]
    assert all(0 <= z < (1 << 32) for z in zs), zs
    assert zs == sorted(zs)  # monotone along a (b fixed at lo)
    assert zs[-1] > 0  # the wide domain actually spreads the values

    width = hi - lo
    s = max(0, width.bit_length() - (63 - 16))

    def py_q(v):
        return ((min(max(v, lo), hi) - lo) >> s) * ((1 << 16) - 1) // (width >> s)

    def py_z(a, b):
        qa, qb = py_q(a), py_q(b)
        return sum(
            (((qa >> i) & 1) << (2 * i + 1)) + (((qb >> i) & 1) << (2 * i))
            for i in range(16)
        )

    con = duckdb.connect()
    int_expr = zvalue_sql("a", (lo, hi), "b", (lo, hi))
    sql_expr = zvalue_sql("a", ("r.lo", "r.hi"), "b", ("r.lo", "r.hi"))
    for a, z in got:
        assert z == py_z(a, lo), a
        (dz,) = con.execute(
            f"SELECT {int_expr} FROM (SELECT {a} AS a, {lo} AS b)"
        ).fetchone()
        assert dz == z, a
        (dz2,) = con.execute(
            f"SELECT {sql_expr} FROM (SELECT {a} AS a, {lo} AS b), "
            f"(SELECT {lo} AS lo, {hi} AS hi) r"
        ).fetchone()
        assert dz2 == z, a


def test_quantize_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-5, 0), (100, 0), (3, 0)], "a long, b long"
    ).withColumn("z", zvalue("a", (0, 7), "b", (0, 7), bits=3))
    z = [r.z for r in df.collect()]
    assert z[0] == 0  # clamped to lo
    assert z[1] == sum(1 << (2 * i + 1) for i in range(3))  # a bits all set
    with pytest.raises(ValueError, match="hi > lo"):
        zvalue("a", (3, 3), "b", (0, 7))
