"""Relational analogs of the reference's non-relational operators
(SURVEY.md §2c-§2f mappings), expressed as stock DataFrame plans over the
TPC-H-ish test tables so Catalyst's pushdown/broadcast/AQE machinery does
the physical planning.

Each function documents which reference operator it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import decimal_sum

# Misspelled probes for the fuzzy dictionary join demo (nation names in the
# synthetic TPC-H-ish data are NATION_0..NATION_24).
FUZZY_NATION_PROBES = [
    "NATION_3", "NATON_7", "NATIN_12", "NATION22", "XATION_5", "NOTHING_AT_ALL",
]


def pushdown_agg(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped agg: partial+final aggregation, filter pushed to scan
    (the reference has no partial agg — Catalyst provides it, SURVEY §2d)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum(F.col("l_quantity")).alias("sum_qty"),
            decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def argmax_supplier(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Best-match keep / argmax per group (reference keep-best-score,
    postprocessing.py:225-232): top supplier by acctbal per nation,
    deterministic tie-break, broadcast dim join."""
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").desc()
    )
    best = (
        supplier.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return best.join(F.broadcast(nation), best.s_nationkey == nation.n_nationkey).select(
        "n_name", "s_name", F.col("s_acctbal").alias("acctbal")
    )


def topk_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Grouped top-k (reference top-3 NIK score buckets,
    postprocessing.py:383-385)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", "rank", F.col("o_totalprice").alias("totalprice"))
    )


def fuzzy_dictionary_join(spark, nation: DataFrame, max_distance: int = 3) -> DataFrame:
    """The reference's fuzzy dictionary join (provinsi/kab_kota/pekerjaan
    evaluators, evaluators.py:5-36 etc.) as a broadcast nested-loop theta
    join: probe x dictionary, levenshtein <= k, keep argmin distance."""
    probes = spark.createDataFrame([(p,) for p in FUZZY_NATION_PROBES], "probe string")
    scored = (
        F.broadcast(probes)
        .crossJoin(nation.select("n_name"))
        .select("probe", "n_name", F.levenshtein("probe", "n_name").alias("dist"))
        .filter(F.col("dist") <= max_distance)
    )
    w = Window.partitionBy("probe").orderBy(F.col("dist").asc(), F.col("n_name").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe", F.col("n_name").alias("best_match"), "dist")
    )


def anti_join_resume(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Resume-from-checkpoint anti join (SURVEY §2c: source urls minus
    committed urls) demonstrated as orders with no lineitem."""
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti")
        .select("o_orderkey", "o_custkey")
    )


def lead_value_association(lineitem: DataFrame) -> DataFrame:
    """Positional value association via lead() (the reference slices a value
    from the end of key i to the start of key i+1, postprocessing.py:236-249
    — same lead-over-ordered-positions shape): per supplier, days to the
    next shipment."""
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_shipdate").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    nxt = F.lead(F.col("l_shipdate")).over(w)
    return lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.to_date(nxt), F.to_date(F.col("l_shipdate"))).alias("days_to_next"),
    )


def distance_bucket_group(lineitem: DataFrame) -> DataFrame:
    """Distance-bucket grouping (nik_evaluator buckets by distance,
    evaluators.py:58-66): group rows into integer quantity buckets."""
    return (
        lineitem.groupBy(F.col("l_quantity").cast("int").alias("qty_bucket"))
        .agg(F.count("*").alias("n"), decimal_sum(F.col("l_extendedprice")).alias("bucket_price"))
    )


def events_window_agg(events: DataFrame) -> DataFrame:
    """5-minute tumbling-window aggregation over the events stream table
    (batch form; streaming/incremental.py runs the same plan as a stream)."""
    return (
        events.groupBy(
            F.window(F.col("ts"), "5 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), decimal_sum(F.col("value"), "decimal(18,6)").alias("sum_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"), "event_type", "n", "sum_value")
    )


def events_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: lag + cumulative gap>threshold counter per user."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    # ts is TIMESTAMP_NTZ: compare gaps as intervals (NTZ - NTZ), which is
    # timezone-free — epoch-based math would depend on the session TZ.
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr(f"INTERVAL {gap_minutes} MINUTES")),
        1,
    ).otherwise(0)
    with_sess = events.withColumn("sess_no", F.sum(new_sess).over(w))
    return with_sess.groupBy("user_id").agg(
        F.max("sess_no").cast("long").alias("n_sessions"), F.count("*").alias("n_events")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_right",
) -> DataFrame:
    """AS-OF join: attach to every left row the LATEST right row of the
    same key with ``right.ts <= left.ts`` (the time-series point-in-time
    join Spark lacks as a built-in; DuckDB's native ASOF JOIN is the
    oracle).

    Implemented as union + running ``last(ignorenulls)`` instead of a
    range join: tag both sides, sort each key's rows by (ts, side) —
    right rows first on ties, matching ASOF's ``>=`` — and carry the most
    recent right payload forward with an unbounded-preceding window.  ONE
    shuffle on the key and a per-key sort, O(n log n) per key; a
    range-condition join would be O(n_left * n_right) per key and a
    broadcast-nested-loop at that.  Exactly the merge-scan shape a
    time-series engine runs, expressed in Catalyst operators.

    Right rows should be unique per (key, ts) — pre-dedupe for a
    deterministic pick (ties within a ts would otherwise fall to sort
    order).  Output: all left columns plus ``<ts_col><suffix>`` and
    ``<c><suffix>`` for each of ``right_cols`` (NULL when no right row
    precedes the left row)."""
    # A NULL-ts right row can never satisfy ``right.ts <= left.ts`` (ASOF
    # semantics; the oracle's `>=` never matches NULL) — but Spark's asc
    # sort puts NULLs FIRST, so without this filter its payload would be
    # carried into every left row of the key (review finding).
    # The right payload travels as ONE struct so the carry is atomic: a
    # per-column last(ignorenulls) would skip a genuine NULL in the
    # latest right row and backfill that column from an OLDER row —
    # returning a (ts_right, value_right) combination that never existed
    # (review finding, reproduced vs the DuckDB oracle).  The struct is
    # non-null for every right row even when its members are null, so
    # last(ignorenulls) picks whole rows only.
    # NULL join keys must also drop from the right: Window.partitionBy
    # groups NULLs together, but SQL equality (and the oracle's ASOF ON
    # l.k = r.k) never matches NULL = NULL — a NULL-key left row gets a
    # NULL payload, not the NULL-key right rows' carry (review finding).
    rtag = right.filter(F.col(ts_col).isNotNull() & F.col(on).isNotNull()).select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("_r"),
    )
    ltag = left.withColumn("_side", F.lit(1))
    u = ltag.unionByName(rtag, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    for c in [f"{ts_col}{suffix}"] + [f"{c}{suffix}" for c in right_cols]:
        out = out.withColumn(c, F.col("_r").getField(c))
    return out.filter(F.col("_side") == 1).drop("_side", "_r")


def bucketed_colocated_join(
    spark,
    orders: DataFrame,
    customer: DataFrame,
    buckets: int = 8,
    table_prefix: str = "colo",
) -> DataFrame:
    """Co-located join via bucketed tables — the 100 TB join strategy the
    one-shot queries can't show: when BOTH sides of a recurring join are
    written ``bucketBy(k, key)``, every subsequent join on that key reads
    bucket i against bucket i directly and Catalyst plans a SortMergeJoin
    with NO Exchange on either side (asserted in
    tests/test_plan_shapes.py).  On a fact table joined every run, this
    converts a full shuffle of the big side PER QUERY into a one-time
    shuffle at ingest — the classic amortisation a petabyte lakehouse
    lives on (same idea as Hive/Iceberg bucket transforms).

    Writes both inputs as bucketed session-catalog parquet tables
    (``<prefix>_orders`` / ``<prefix>_customer``, one file per bucket via
    an explicit pre-write repartition, sortBy for merge-ready runs), then
    returns the per-market-segment order rollup joined WITHOUT a shuffle.
    DECIMAL-exact money sum, one cast to double at the end (oracle
    policy)."""
    # A fresh session with an in-memory catalog does not know about table
    # locations a PREVIOUS session left in the warehouse dir, so
    # mode("overwrite") alone raises LOCATION_ALREADY_EXISTS.  Drop the
    # catalog entry, then clear any orphaned location (local-mode concern
    # only: a production deployment has a persistent metastore, where DROP
    # TABLE removes the managed location itself).
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (f"{table_prefix}_orders", f"{table_prefix}_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    o = orders.select("o_custkey", "o_orderkey", "o_totalprice")
    c = customer.select("c_custkey", "c_mktsegment")
    (
        o.repartition(buckets, "o_custkey")
        .write.mode("overwrite")
        .bucketBy(buckets, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(f"{table_prefix}_orders")
    )
    (
        c.repartition(buckets, "c_custkey")
        .write.mode("overwrite")
        .bucketBy(buckets, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(f"{table_prefix}_customer")
    )
    ob = spark.table(f"{table_prefix}_orders")
    cb = spark.table(f"{table_prefix}_customer")
    joined = ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        decimal_sum(F.col("o_totalprice")).alias("total_price"),
    )


def grouped_quantile_buckets(
    df: DataFrame,
    score_col: str,
    group_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """Equal-mass quantile buckets per group — the CCNet corpus split
    (Wenzek et al. 2020 §4.4: each language cut into head/middle/tail at
    the 1/3 and 2/3 perplexity quantiles) as a scale-safe grouped analytic.
    The reference's closest analog is the NIK top-3 score bucketing
    (evaluators.py:469 family) — ranked admission by score — lifted here to
    corpus scale and arbitrary groupings.

    Bucket contract (integer-exact, partition-invariant): rows rank per
    group by ascending ``score_col``; a row whose cumulative count is
    ``cum`` of ``total`` lands in bucket ``ceil(cum * n_buckets / total)``
    in 1..n_buckets.  All ties (same score) share the bucket of their
    highest cumulative position, so bucket sizes deviate from exact
    1/n_buckets mass only at tied boundary scores — deterministic, with no
    arbitrary tie-break and no float anywhere.

    Scale shape: the corpus is NEVER globally sorted.  The window runs
    over the per-group DISTINCT-SCORE HISTOGRAM (map-side-combinable
    ``groupBy(group, score).count()``), per-group totals are a tiny agg
    joined back (AQE broadcasts it), and bucket assignment returns to the
    corpus as an equi-join on (group, score).  At 100 TB with 200
    languages and ~1e6 distinct scores the window touches ~2e8 histogram
    rows, not 1e12 documents.  A viral (group, score) pair skews the
    assignment JOIN key, not a group — AQE skew-join splits it.

    ``score_col`` must be non-null integral (coalesce upstream); a NULL
    group is its own bucket domain (null-safe joins throughout).
    """
    nb = int(n_buckets)
    if nb < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # ONE explicit shuffle spine on (group, score): the histogram agg
    # inherits this partitioning (no second exchange) and the assignment
    # join consumes the SAME exchange via ReuseExchange — so however
    # expensive the upstream scoring pipeline is, it executes once, not
    # once per consumer (measured 2.2x on the ccnet query; plan-shape
    # asserted in tests/test_round5_ops.py).
    df = df.repartition(group_col, score_col)
    hist = df.groupBy(group_col, score_col).agg(F.count("*").alias("cnt"))
    totals = hist.groupBy(group_col).agg(F.sum("cnt").alias("total")).select(
        F.col(group_col).alias("_tg"), "total"
    )
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    # (group, score) is distinct by construction, so the default RANGE
    # frame has no tie ambiguity: cum is exact in any engine.
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    mapping = (
        cum.join(totals, F.col(group_col).eqNullSafe(F.col("_tg")))
        .select(
            F.col(group_col).alias("_mg"),
            F.col(score_col).alias("_ms"),
            # integer ceil division: exact at any BIGINT magnitude
            F.expr(f"CAST((cum * {nb} + total - 1) div total AS INT)").alias("bucket"),
        )
    )
    return (
        df.join(
            mapping,
            F.col(group_col).eqNullSafe(F.col("_mg"))
            & F.col(score_col).eqNullSafe(F.col("_ms")),
        )
        .drop("_mg", "_ms")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Crawl-over-crawl delta: classify every key across two snapshot
    scans as added / deleted / changed / unchanged by content fingerprint
    — the Common-Crawl "what changed since the last crawl" audit, and the
    corpus-refresh planner's input (re-extract only added+changed).  The
    reference analog is the resume/skip-done gate (mainocr.py's
    done-url check) generalised from presence to content identity.

    Contract: each side is key-unique (one latest record per url —
    compose an argmax/latest-snapshot dedup upstream if not) with
    non-null fingerprints.

    Scale shape: ONE map-side-combinable exchange — the two scans union
    with a side tag and aggregate ``max(when(side, fp))`` per key; no
    join, no sort.  At 100 TB x 2 crawls this is a single shuffle of
    (key, fp) pairs — the minimum any diff must move.
    """
    def _side(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.col(key_col).alias("_k"),
            F.col(fp_col).alias("_f"),
            F.lit(tag).alias("_s"),
        )

    per_key = (
        _side(old, 0)
        .unionByName(_side(new, 1))
        .groupBy("_k")
        .agg(
            F.max(F.when(F.col("_s") == 0, F.col("_f"))).alias("old_fp"),
            F.max(F.when(F.col("_s") == 1, F.col("_f"))).alias("new_fp"),
        )
    )
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("deleted"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return per_key.select(
        F.col("_k").alias(key_col), "old_fp", "new_fp", status.alias("status")
    )


def grouped_percentile_disc(
    df: DataFrame,
    value_col: str,
    group_col: str,
    percentiles: tuple = (50, 90),
) -> DataFrame:
    """Exact discrete percentiles per group WITHOUT a global sort — the
    histogram form of PERCENTILE_DISC: p_q is the smallest value whose
    cumulative count reaches q% of the group total (``cum * 100 >=
    q * total`` in pure integer arithmetic, so the result is
    bit-reproducible in any engine — no interpolation, no floats).

    Same scale shape as ``grouped_quantile_buckets``: one map-side
    combinable ``groupBy(group, value)`` histogram, a window over the
    per-group DISTINCT-VALUE histogram rows only, a tiny per-group total
    joined back, then one min-when aggregate per requested percentile.
    The corpus itself is never sorted or re-shuffled.

    ``value_col`` must be non-null integral; percentiles are integer
    percents in (0, 100].
    """
    hist = df.groupBy(group_col, value_col).agg(F.count("*").alias("cnt"))
    return grouped_percentile_from_hist(
        hist, value_col, group_col, cnt_col="cnt", percentiles=percentiles
    )


def grouped_percentile_from_hist(
    hist: DataFrame,
    value_col: str,
    group_col: str,
    cnt_col: str = "cnt",
    percentiles: tuple = (50, 90),
) -> DataFrame:
    """The mergeable half of :func:`grouped_percentile_disc`: exact disc
    percentiles computed from a PRE-AGGREGATED ``(group, value, cnt)``
    histogram.  Split out so incremental builders (the streamed-quantiles
    twin sums per-epoch histograms cell-wise before calling this) share
    the one cum/total/min-when implementation with the batch path —
    histogram counts are mergeable by plain addition, which is what makes
    exact quantiles streamable at all.

    ``(group, value)`` must be distinct in ``hist`` (any groupBy/SUM-merge
    construction guarantees it); duplicate value rows would make the
    RANGE-frame cumulative sum double-count ties.
    """
    qs = [int(q) for q in percentiles]
    if not qs or any(q < 1 or q > 100 for q in qs):
        raise ValueError(f"percentiles must be integers in 1..100, got {percentiles}")
    totals = hist.groupBy(group_col).agg(F.sum(cnt_col).alias("total")).select(
        F.col(group_col).alias("_tg"), "total"
    )
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    cum = hist.withColumn("cum", F.sum(cnt_col).over(w))
    joined = cum.join(totals, F.col(group_col).eqNullSafe(F.col("_tg")))
    aggs = [
        F.min(
            F.when(F.col("cum") * 100 >= q * F.col("total"), F.col(value_col))
        ).alias(f"p{q}")
        for q in qs
    ]
    return joined.groupBy(group_col).agg(*aggs)


def interval_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int = 8192,
) -> DataFrame:
    """Bucketed INTERVAL JOIN — point-in-range lookup (IP -> geo block,
    timestamp -> maintenance window, byte offset -> span label): the
    classic Spark-hard join shape.  Expressed naively as a theta-join
    ``lo <= p AND p < hi`` Catalyst can only plan a BroadcastNestedLoop —
    O(|points| x |ranges|) comparisons, a scale-killer the moment the
    range table outgrows a broadcast.

    Bucketing turns it into an EQUI-join: every range explodes to the
    fixed-width buckets it overlaps (one sequence HOF, bounded by
    ``ceil(len/W) + 1`` rows per range), every point computes its single
    bucket with one integer division, the join keys on the bucket, and a
    cheap residual containment filter finishes.  The POINTS side — the
    corpus-sized side — is never amplified and shuffles at most once on
    the bucket key (zero times when the exploded range table broadcasts,
    the common case).  ``bucket_width`` trades range-side amplification
    against per-bucket candidate fan-in; set it near the median range
    length.  A mega-range (a /8 in the IP case) costs len/W bucket rows
    on the RANGE side only — split such rows upstream if the range table
    itself is corpus-sized.

    Contract: half-open ``[lo, hi)`` (adjacent ranges never double-match
    a boundary point); empty/inverted ranges (hi <= lo) are dropped;
    overlapping ranges multi-match like any join; coordinates must be
    non-negative integers (``div`` truncates toward zero, which is floor
    only for non-negatives — IPs, timestamps and offsets all qualify).
    NULL points/bounds drop out of the equi-join like any NULL key.
    """
    w = int(bucket_width)
    if w < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    if "_bucket" in points.columns or "_bucket" in ranges.columns:
        raise ValueError("'_bucket' column name is reserved by interval_join")
    r = (
        ranges.filter(F.col(hi_col) > F.col(lo_col))
        .withColumn(
            "_bucket",
            F.explode(
                F.expr(f"sequence({lo_col} div {w}, ({hi_col} - 1) div {w})")
            ),
        )
    )
    p = points.withColumn("_bucket", F.expr(f"{point_col} div {w}"))
    return (
        p.join(r, "_bucket")
        .where(
            (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )


def events_rolling_agg(events: DataFrame, window_seconds: int = 900) -> DataFrame:
    """Rolling (sliding) RANGE-frame aggregation: every event gets the
    count and value-sum of ITS OWN trailing ``window_seconds`` for the
    same user — the per-entity rate/velocity statistic (crawl politeness
    budgets, burst/abuse detection) that tumbling windows quantise away
    at bucket boundaries.  Completes the ordered-analytics family next to
    the tumbling window, sessionization and the AS-OF join.

    Two correctness subtleties, both pinned by the oracle:

    - The order key is built from DATE/TIME FIELDS of the TIMESTAMP_NTZ
      column (days-since-epoch and field micros, ``date_part('SECOND')``
      keeping the fraction) — microsecond-exact and TZ-FREE by
      construction, verified under a deliberately exotic session
      timezone; ``unix_timestamp``-style conversions would shift with
      the session TZ and even diverge across a DST boundary.
    - The frame is RANGE, not ROWS: all events tied on the key enter
      every frame together, so the result is partition- and sort-stable
      (a ROWS frame would depend on the arbitrary order among ties).

    Sum is decimal (order-independent addition).  ONE shuffle on
    user_id; per-key frame state is O(events inside the window), and a
    hot user skews one partition — pre-split such keys upstream (the
    salting pattern) if a single entity can exceed a partition.
    -> (event_id, user_id, n_roll, sum_value_roll)
    """
    us = int(window_seconds) * 1_000_000
    if us <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    micros = (
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))).cast(
            "long"
        )
        * 86_400_000_000
        + F.hour("ts").cast("long") * 3_600_000_000
        + F.minute("ts").cast("long") * 60_000_000
        + (F.expr("date_part('SECOND', ts)") * 1_000_000).cast("long")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("_us").asc()).rangeBetween(-us, 0)
    return (
        events.withColumn("_us", micros)
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).cast("long").alias("n_roll"),
            # Exact decimal window sum, then ONE cast back to double — the
            # repo-wide decimal_sum discipline (functions/columns.py): the
            # oracle's DECIMAL(38,6) reaches pandas as float64 through
            # DuckDB's bridge, so the engine must ship float64 too or the
            # value hash sees Decimal('6.550000') vs 6.55 (r5 driver red).
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("sum_value_roll"),
        )
    )


def user_event_pivot(
    events: DataFrame,
    event_types: tuple = ("click", "error", "purchase", "signup", "view"),
) -> DataFrame:
    """PIVOT — the long->wide reshaping member of the relational family:
    one profile row per user with per-event-type activity counts and
    per-type sums of the JSON payload's ``k`` field (schema-on-read:
    ``get_json_object`` parses the ``props`` string in the projection —
    no pre-materialised struct column needed, corrupt/missing JSON
    degrades to NULL and falls out of the sums).

    The category domain is EXPLICIT — the 100 TB posture: ``pivot()``
    without a value list first runs a whole extra distinct JOB over the
    corpus to discover the columns, and an unbounded domain would mint
    unbounded columns.  A declared domain keeps the plan static: the
    pivot compiles to ONE map-side-combinable groupBy whose aggregate
    buffer holds 2x|domain| cells per user — no join, no second scan,
    one shuffle on user_id.  Counts for absent (user, type) combos are
    coalesced to 0 (pivot's native NULL); sums stay NULL-when-absent
    (SQL FILTER semantics, replayed by the oracle).
    -> (user_id, <type>_n, <type>_k_sum, ...)
    """
    if not event_types:
        raise ValueError("event_types must be a non-empty explicit domain")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    base = events.select("user_id", "event_type", k.alias("k"))
    wide = base.groupBy("user_id").pivot("event_type", list(event_types)).agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("k_sum")
    )
    cols = [F.col("user_id")]
    for t in event_types:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_n"))
        cols.append(F.col(f"{t}_k_sum").cast("long").alias(f"{t}_k_sum"))
    return wide.select(*cols)
