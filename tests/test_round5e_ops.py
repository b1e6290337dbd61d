"""Round-5 session-15 operators: exact histogram Gini (closed-form +
brute-force textbook parity on tied data), median+MAD outlier gate
(hand-derived), windowed PMI pair mining (hand-derived counts/lift and
the SQL-literal '\\f' tokenizer regression), and the streamed exact
quantile twin (bit-equality with the one-pass batch computation)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.operators import (
    textstats,
)
from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
    grouped_percentile_disc,
    grouped_percentile_from_hist,
)


def _docs(spark, rows):  # noqa: F811
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
        schema="doc_id long, text string, lang string",
    )


def _text_of(n_tokens: int) -> str:
    return " ".join(["w"] * n_tokens) if n_tokens else ""


# ---------------------------------------------------------------------------
# length_gini
# ---------------------------------------------------------------------------


def _gini_pmille_ref(xs):
    """Textbook formula on explicitly sorted values — exact ints."""
    xs = sorted(xs)
    n, t = len(xs), sum(xs)
    if t == 0:
        return 0
    s = sum((i + 1) * x for i, x in enumerate(xs))
    return (1000 * (2 * s - (n + 1) * t)) // (n * t)


def test_gini_closed_form(spark):  # noqa: F811
    rows = (
        # lang a: perfectly equal -> 0
        [(i, _text_of(7), "a") for i in range(4)]
        # lang b: one doc holds everything -> 750 for n=4
        + [(10, _text_of(0), "b"), (11, "", "b"), (12, None, "b"),
           (13, _text_of(10), "b")]
    )
    out = {
        r["lang"]: r.asDict()
        for r in textstats.length_gini(_docs(spark, rows)).collect()
    }
    assert out["a"]["gini_pmille"] == 0
    assert out["a"]["n_docs"] == 4 and out["a"]["total_tokens"] == 28
    # x = [0,0,0,10]: G = (2*40 - 5*10)/(4*10) = 0.75
    assert out["b"]["gini_pmille"] == 750
    assert out["b"]["total_tokens"] == 10


def test_gini_matches_textbook_on_tied_data(spark):  # noqa: F811
    # deterministic pseudo-random token counts with heavy ties — the
    # histogram block rank-sum must equal the explicit per-row ranking
    xs = [(i * 7919) % 13 for i in range(97)]  # values 0..12, many ties
    rows = [(i, _text_of(x), "z") for i, x in enumerate(xs)]
    row = textstats.length_gini(_docs(spark, rows)).collect()[0]
    assert row["gini_pmille"] == _gini_pmille_ref(xs)
    assert row["n_docs"] == len(xs) and row["total_tokens"] == sum(xs)


def test_gini_null_only_language_is_zero(spark):  # noqa: F811
    rows = [(1, None, "n"), (2, None, "n")]
    row = textstats.length_gini(_docs(spark, rows)).collect()[0]
    assert row["total_tokens"] == 0 and row["gini_pmille"] == 0


# ---------------------------------------------------------------------------
# length_mad_outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_hand_case(spark):  # noqa: F811
    # lens 10,10,12,14,100 -> med=12 (cum rule), dev=2,2,0,2,88 -> mad=2,
    # outlier iff dev > 3*2=6 -> only the 100-char doc
    rows = [
        (1, "a" * 10, "x"), (2, "b" * 10, "x"), (3, "c" * 12, "x"),
        (4, "d" * 14, "x"), (5, "e" * 100, "x"),
    ]
    out = {r["doc_id"]: r.asDict() for r in
           textstats.length_mad_outliers(_docs(spark, rows)).collect()}
    assert len(out) == 5
    assert all(v["med"] == 12 and v["mad"] == 2 for v in out.values())
    assert [d for d, v in sorted(out.items()) if v["is_outlier"]] == [5]


def test_mad_all_equal_lengths_no_outliers(spark):  # noqa: F811
    rows = [(i, "q" * 9, "y") for i in range(6)]
    out = textstats.length_mad_outliers(_docs(spark, rows)).collect()
    assert all(not r["is_outlier"] and r["mad"] == 0 for r in out)


# ---------------------------------------------------------------------------
# pmi_pairs
# ---------------------------------------------------------------------------


def test_pmi_pairs_hand_case(spark):  # noqa: F811
    rows = [(1, "a b c", "en"), (2, "a b", "en")]
    out = {(r["a"], r["b"]): r.asDict() for r in
           textstats.pmi_pairs(_docs(spark, rows), window=2, top=10).collect()}
    # doc1 pairs: (a,b),(a,c),(b,c); doc2: (a,b)
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab["pair_n"] == 2 and ab["cnt_a"] == 2 and ab["cnt_b"] == 2
    # tt=5 toks, tp=4 pairs: lift = (2*25*1e6)//(4*2*2) = 3_125_000
    assert ab["lift_ppm"] == 3_125_000
    assert ab["rank"] == 1
    bc = out[("b", "c")]
    assert bc["pair_n"] == 1 and bc["lift_ppm"] == (25_000_000 // 8)


def test_pmi_window_1_is_adjacent_only(spark):  # noqa: F811
    rows = [(1, "x y z", "en")]
    out = {(r["a"], r["b"]) for r in
           textstats.pmi_pairs(_docs(spark, rows), window=1, top=10).collect()}
    assert out == {("x", "y"), ("y", "z")}


def test_pmi_tokenizer_not_split_on_letter_f(spark):  # noqa: F811
    """Regression: the split pattern once rode inside an F.expr SQL
    literal where the unknown escape '\\f' C-unescapes to the LETTER f —
    'fast' tokenized as 'ast'.  Form feed must split; 'f' must not."""
    rows = [(1, "fast \x0c food fast food", "en")]
    out = textstats.pmi_pairs(_docs(spark, rows), window=1, top=10).collect()
    terms = {r["a"] for r in out} | {r["b"] for r in out}
    assert terms == {"fast", "food"}
    pair = {(r["a"], r["b"]): r["pair_n"] for r in out}
    assert pair[("fast", "food")] == 2 and pair[("food", "fast")] == 1


def test_pmi_single_token_docs_contribute_unigrams_only(spark):  # noqa: F811
    # 'c' appears only in 1-token docs: pairable nowhere, but its mass
    # still counts in total_toks (lift denominators shift accordingly)
    rows = [(1, "a b", "en"), (2, "c", "en"), (3, "c", "en")]
    out = textstats.pmi_pairs(_docs(spark, rows), window=2, top=10).collect()
    assert len(out) == 1
    r = out[0]
    # tt=4, tp=1: lift = (1*16*1e6)//(1*1*1)
    assert (r["a"], r["b"], r["lift_ppm"]) == ("a", "b", 16_000_000)


def test_pmi_plan_is_takeordered_no_python(spark):  # noqa: F811
    rows = [(i, f"t{i} u{i} v{i}", "en") for i in range(20)]
    df = textstats.pmi_pairs(_docs(spark, rows))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pmi_rejects_bad_params(spark):  # noqa: F811
    with pytest.raises(ValueError):
        textstats.pmi_pairs(_docs(spark, [(1, "a b", "en")]), window=0)


# ---------------------------------------------------------------------------
# streamed_length_quantiles / grouped_percentile_from_hist
# ---------------------------------------------------------------------------


def test_percentile_from_hist_equals_batch(spark):  # noqa: F811
    rows = [(i, "k" * ((i * 31) % 17), ["p", "q"][i % 2]) for i in range(60)]
    base = _docs(spark, rows).select(
        "lang", F.length(F.coalesce("text", F.lit(""))).cast("long").alias("len")
    )
    direct = grouped_percentile_disc(base, "len", "lang", (50, 90))
    hist = base.groupBy("lang", "len").agg(F.count("*").alias("cnt"))
    via_hist = grouped_percentile_from_hist(hist, "len", "lang", "cnt", (50, 90))
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_hist.collect())
    )


def test_streamed_length_quantiles_bit_equal_to_batch(spark, tmp_path):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.streaming.incremental import (
        streamed_length_quantiles,
    )

    rows = [(i, None if i % 11 == 0 else "c" * ((i * 13) % 23), ["en", "ind"][i % 2])
            for i in range(80)]
    docs = _docs(spark, rows)
    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)
    streamed = streamed_length_quantiles(spark, path, batches=3)
    batch = grouped_percentile_disc(
        docs.select(
            "lang",
            F.length(F.coalesce("text", F.lit(""))).cast("long").alias("len"),
        ),
        "len",
        "lang",
        (50, 90),
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


# ---------------------------------------------------------------------------
# interval_join / ip_geo_join
# ---------------------------------------------------------------------------


def _ij_frames(spark):
    points = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2, 3, 4, 5], "p": [0, 10, 15, 25, 99]}),
        schema="pid long, p long",
    )
    ranges = spark.createDataFrame(
        pd.DataFrame(
            {
                "label": ["a", "b", "c", "empty", "inverted"],
                "lo": [0, 10, 12, 50, 60],
                "hi": [10, 20, 30, 50, 40],
            }
        ),
        schema="label string, lo long, hi long",
    )
    return points, ranges


def test_interval_join_semantics(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        interval_join,
    )

    points, ranges = _ij_frames(spark)
    for w in (4, 7, 100):  # bucket width must not change the answer
        got = sorted(
            (r["pid"], r["label"])
            for r in interval_join(points, ranges, "p", "lo", "hi", w).collect()
        )
        # p=0 -> a (lo inclusive); p=10 -> b NOT a (hi exclusive);
        # p=15 -> b AND c (overlap); p=25 -> c; p=99 -> nothing;
        # empty + inverted ranges match nothing
        assert got == [(1, "a"), (2, "b"), (3, "b"), (3, "c"), (4, "c")], (w, got)


def test_interval_join_no_nested_loop_with_broadcast(spark):  # noqa: F811
    from pyspark.sql import functions as SF

    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        interval_join,
    )

    points, ranges = _ij_frames(spark)
    df = interval_join(points, SF.broadcast(ranges), "p", "lo", "hi", 8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_reserved_column_and_width(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        interval_join,
    )

    points, ranges = _ij_frames(spark)
    with pytest.raises(ValueError):
        interval_join(points, ranges, "p", "lo", "hi", 0)
    with pytest.raises(ValueError):
        interval_join(points.withColumnRenamed("pid", "_bucket"), ranges, "p", "lo", "hi")


# ---------------------------------------------------------------------------
# invisible_char_audit
# ---------------------------------------------------------------------------


def test_invisible_char_audit_hand_case(spark):  # noqa: F811
    rows = [
        (1, "ab​cd­", "en"),          # 2 zero-widths
        (2, "‮hidden⁩ x", "en"),       # 2 bidi controls
        (3, "plain text", "en"),
        (4, None, "en"),
        (5, "‎​", "en"),               # 1 bidi + 1 zw -> empty clean
    ]
    out = {r["doc_id"]: r.asDict() for r in
           textstats.invisible_char_audit(_docs(spark, rows)).collect()}
    assert (out[1]["n_zw"], out[1]["n_bidi"], out[1]["clean_text"]) == (2, 0, "abcd")
    assert (out[2]["n_zw"], out[2]["n_bidi"], out[2]["clean_text"]) == (0, 2, "hidden x")
    assert (out[3]["n_zw"], out[3]["n_bidi"], out[3]["clean_len"]) == (0, 0, 10)
    assert (out[4]["n_zw"], out[4]["n_bidi"], out[4]["clean_text"]) == (0, 0, None)
    assert (out[5]["n_zw"], out[5]["n_bidi"], out[5]["clean_text"]) == (1, 1, "")


def test_invisible_char_constants_cover_trojan_source_set(spark):  # noqa: F811
    # the CVE-2021-42574 bidi set: LRE RLE PDF LRO RLO LRI RLI FSI PDI
    for ch in "‪‫‬‭‮⁦⁧⁨⁩":
        assert ch in textstats.BIDI_CONTROL_CHARS


# ---------------------------------------------------------------------------
# events_rolling_agg
# ---------------------------------------------------------------------------


def _events(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = pd.DataFrame(
        [
            {
                "event_id": i,
                "user_id": u,
                "ts": base + dt.timedelta(seconds=s, microseconds=us),
                "value": v,
            }
            for i, (u, s, us, v) in enumerate(rows)
        ]
    )
    return spark.createDataFrame(
        data, schema="event_id long, user_id long, ts timestamp_ntz, value double"
    )


def test_rolling_agg_hand_case(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        events_rolling_agg,
    )

    rows = [
        (1, 0, 0, 10.0),      # u1 @ t0
        (1, 800, 0, 1.0),     # u1 @ t+800   (t0 still inside 900s)
        (1, 901, 0, 2.0),     # u1 @ t+901   (t0 just OUTSIDE: 901 > 900)
        (1, 900, 0, 5.0),     # u1 @ t+900   (t0 exactly on the bound: inside)
        (2, 0, 0, 7.0),       # other user: independent
    ]
    out = {r["event_id"]: r.asDict() for r in
           events_rolling_agg(_events(spark, rows)).collect()}
    assert out[0]["n_roll"] == 1 and float(out[0]["sum_value_roll"]) == 10.0
    assert out[1]["n_roll"] == 2 and float(out[1]["sum_value_roll"]) == 11.0
    assert out[3]["n_roll"] == 3 and float(out[3]["sum_value_roll"]) == 16.0
    assert out[2]["n_roll"] == 3 and float(out[2]["sum_value_roll"]) == 8.0
    assert out[4]["n_roll"] == 1 and float(out[4]["sum_value_roll"]) == 7.0


def test_rolling_agg_range_frame_includes_ties(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        events_rolling_agg,
    )

    # three events at the IDENTICAL microsecond: RANGE semantics put all
    # ties in each other's frames regardless of physical row order
    rows = [(1, 5, 123456, 1.0), (1, 5, 123456, 2.0), (1, 5, 123456, 4.0)]
    out = events_rolling_agg(_events(spark, rows)).collect()
    assert [r["n_roll"] for r in out] == [3, 3, 3]
    assert [float(r["sum_value_roll"]) for r in out] == [7.0, 7.0, 7.0]


def test_rolling_agg_tz_free(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        events_rolling_agg,
    )

    rows = [(1, 0, 500000, 1.0), (1, 900, 499999, 2.0), (1, 900, 500001, 4.0)]
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        a = sorted(map(tuple, events_rolling_agg(_events(spark, rows)).collect()))
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        b = sorted(map(tuple, events_rolling_agg(_events(spark, rows)).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert a == b
    # microsecond exactness: event1 @900.499999 still sees t0=0.500000
    # (bound inclusive); event2 @900.500001 sees event1 (2us apart) but
    # NOT t0 — 1us past the bound — so its frame is {e1, e2}, sum 6
    byid = {t[0]: t for t in a}
    assert byid[1][2] == 2 and float(byid[1][3]) == 3.0
    assert byid[2][2] == 2 and float(byid[2][3]) == 6.0


def test_rolling_agg_rejects_bad_window(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        events_rolling_agg,
    )

    with pytest.raises(ValueError):
        events_rolling_agg(_events(spark, [(1, 0, 0, 1.0)]), window_seconds=0)


# ---------------------------------------------------------------------------
# homoglyph_audit
# ---------------------------------------------------------------------------


def test_homoglyph_hand_case(spark):  # noqa: F811
    cyr_paypal = "pаypаl"       # Cyrillic а twice
    pure_cyr = "аео"       # no Latin at all
    greek_mix = "twο"                # Greek omicron
    rows = [
        (1, cyr_paypal, "en"),
        (2, pure_cyr, "ru"),
        (3, "plain ascii", "en"),
        (4, None, "en"),
        (5, greek_mix, "en"),
    ]
    out = {r["doc_id"]: r.asDict() for r in
           textstats.homoglyph_audit(_docs(spark, rows)).collect()}
    assert (out[1]["n_confusables"], out[1]["is_mixed"], out[1]["skeleton"]) == (
        2, True, "paypal")
    # confusables but NO latin letters -> not "mixed" (plain Russian)
    assert (out[2]["n_confusables"], out[2]["is_mixed"], out[2]["skeleton"]) == (
        3, False, "aeo")
    assert (out[3]["n_confusables"], out[3]["is_mixed"], out[3]["skeleton"]) == (
        0, False, "plain ascii")
    assert (out[4]["n_confusables"], out[4]["is_mixed"], out[4]["skeleton"]) == (
        0, False, None)
    assert (out[5]["n_confusables"], out[5]["is_mixed"], out[5]["skeleton"]) == (
        1, True, "two")


def test_homoglyph_mapping_is_aligned(spark):  # noqa: F811
    # every source char maps to exactly one Latin twin, and the skeleton
    # of the full confusable alphabet is the full Latin string
    assert len(textstats.CONFUSABLE_SOURCE) == len(textstats.CONFUSABLE_LATIN)
    rows = [(1, textstats.CONFUSABLE_SOURCE, "x")]
    out = textstats.homoglyph_audit(_docs(spark, rows)).collect()[0]
    assert out["skeleton"] == textstats.CONFUSABLE_LATIN
    assert out["n_confusables"] == len(textstats.CONFUSABLE_SOURCE)


# ---------------------------------------------------------------------------
# user_event_pivot
# ---------------------------------------------------------------------------


def test_user_event_pivot_hand_case(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        user_event_pivot,
    )

    rows = pd.DataFrame(
        [
            (1, "click", '{"k": 3}'),
            (1, "click", '{"k": 4}'),
            (1, "view", "not json"),       # corrupt -> NULL k, still counted
            (2, "refund", '{"k": 9}'),     # outside the declared domain
            (2, "view", '{"k": 5}'),
        ],
        columns=["user_id", "event_type", "props"],
    )
    ev = spark.createDataFrame(rows, schema="user_id long, event_type string, props string")
    out = {r["user_id"]: r.asDict() for r in
           user_event_pivot(ev, event_types=("click", "view")).collect()}
    u1, u2 = out[1], out[2]
    assert (u1["click_n"], u1["click_k_sum"]) == (2, 7)
    assert (u1["view_n"], u1["view_k_sum"]) == (1, None)   # corrupt json
    assert (u2["click_n"], u2["click_k_sum"]) == (0, None)  # absent combo
    assert (u2["view_n"], u2["view_k_sum"]) == (1, 5)
    assert "refund_n" not in u2  # outside the explicit domain: no column


def test_user_event_pivot_rejects_empty_domain(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.relational import (
        user_event_pivot,
    )

    ev = spark.createDataFrame(
        pd.DataFrame([(1, "click", "{}")], columns=["user_id", "event_type", "props"]),
        schema="user_id long, event_type string, props string",
    )
    with pytest.raises(ValueError):
        user_event_pivot(ev, event_types=())
