"""Unit + plan-shape tests for the session-4 round-5 operators: HTML
table extraction (operators/tables.py), BPE merge statistics
(operators/bpe.py) and split/shard layout (operators/sharding.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

from universal_key_value_based_text_processing_with_ocr_spark.operators.bpe import (
    bpe_pair_counts,
    top_pairs,
    word_counts,
)
from universal_key_value_based_text_processing_with_ocr_spark.operators.sharding import (
    assign_splits,
    plan_shards,
    shard_manifest,
)
from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
    extract_html_tables,
)


def _page(spark, html):  # noqa: F811
    return spark.createDataFrame([Row(url="u", html=html)])


# --- HTML tables -----------------------------------------------------------


def test_tables_basic_rows_and_header(spark):  # noqa: F811
    html = (
        "<body><TABLE border=1>\n"
        "<tr><TH>a</th><th>b</th></tr>\n"
        "<tr><td>1</td><td>2</td><td>3</td></tr>\n"
        "</TABLE></body>"
    )
    rows = extract_html_tables(_page(spark, html)).orderBy("row_idx").collect()
    assert [(r.table_idx, r.row_idx, r.is_header, r.n_cells, list(r.cells)) for r in rows] == [
        (0, 0, True, 2, ["a", "b"]),
        (0, 1, False, 3, ["1", "2", "3"]),
    ]


def test_tables_cell_cleanup_tagstrip_before_entities(spark):  # noqa: F811
    # inner tags stripped FIRST; &amp;lt; must yield the literal "&lt;"
    # (never double-unescaped into "<"); &lt;i&gt; unescapes to literal
    # "<i>" and must NOT then be tag-stripped; whitespace collapses.
    html = (
        "<table><tr>"
        "<td> <b>bo</b>ld\n  text </td>"
        "<td>&amp;lt;</td>"
        "<td>&lt;i&gt;</td>"
        "<td>a&nbsp;&nbsp;b</td>"
        "</tr></table>"
    )
    (r,) = extract_html_tables(_page(spark, html)).collect()
    assert list(r.cells) == ["bo ld text", "&lt;", "<i>", "a b"]


def test_tables_empty_table_consumes_index(spark):  # noqa: F811
    html = "<table><caption>x</caption></table><table><tr><td>v</td></tr></table>"
    (r,) = extract_html_tables(_page(spark, html)).collect()
    assert (r.table_idx, r.row_idx, list(r.cells)) == (1, 0, ["v"])


def test_tables_nested_table_divergence_pinned(spark):  # noqa: F811
    # regex-level contract: the outer span ends at the FIRST </table>,
    # so the inner table's cells belong to the outer span and the
    # trailing outer row lands in a phantom second span's rows only if
    # it has its own <table> — here it is simply dropped.  Pin it.
    html = (
        "<table><tr><td>o1</td></tr>"
        "<table><tr><td>i1</td></tr></table>"
        "<tr><td>o2</td></tr></table>"
    )
    rows = extract_html_tables(_page(spark, html)).orderBy("table_idx", "row_idx").collect()
    got = [(r.table_idx, list(r.cells)) for r in rows]
    assert got == [(0, ["o1"]), (0, ["i1"])]


def test_tables_caps_bound_generate_fanout(spark):  # noqa: F811
    html = "<table>" + "".join(
        f"<tr><td>{i}a</td><td>{i}b</td><td>{i}c</td></tr>" for i in range(10)
    ) + "</table>"
    out = extract_html_tables(_page(spark, html), max_rows=4, max_cells=2)
    rows = out.orderBy("row_idx").collect()
    assert len(rows) == 4 and all(r.n_cells == 2 for r in rows)
    # caps are slices BEFORE the explode: the plan has no filter-after-
    # generate shape, and no exchange / Python evaluation anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_tables_null_html_and_no_tables(spark):  # noqa: F811
    df = spark.createDataFrame(
        [Row(url="a", html=None), Row(url="b", html="<p>no tables</p>")]
    )
    assert extract_html_tables(df).count() == 0


# --- BPE -------------------------------------------------------------------


def test_bpe_counts_hand_corpus(spark):  # noqa: F811
    # "low low lower" -> vocab {low:2, lower:1}; pairs: lo:3 ow:3 we:1 er:1
    df = spark.createDataFrame([Row(text="low low"), Row(text="Lower!")])
    got = {
        r.pair: (r.pair_count, r.n_forms)
        for r in bpe_pair_counts(df).collect()
    }
    assert got == {"lo": (3, 2), "ow": (3, 2), "we": (1, 1), "er": (1, 1)}


def test_bpe_single_char_words_descending_sequence_guard(spark):  # noqa: F811
    # length-1 words must contribute NO pairs; without the CASE guard
    # Spark's sequence(1, 0) DESCENDS and substring(word, 0, 2) would
    # fabricate pairs.
    df = spark.createDataFrame([Row(text="a b c ab")])
    got = {r.pair: r.pair_count for r in bpe_pair_counts(df).collect()}
    assert got == {"ab": 1}


def test_bpe_word_length_cap_drops_blobs(spark):  # noqa: F811
    blob = "x" * 100
    df = spark.createDataFrame([Row(text=f"ok {blob}")])
    vocab = {r.word for r in word_counts(df).collect()}
    assert vocab == {"ok"}


def test_bpe_top_pairs_deterministic_tiebreak(spark):  # noqa: F811
    df = spark.createDataFrame([Row(text="ab cd ab cd ef")])
    top = top_pairs(bpe_pair_counts(df), k=2).collect()
    assert [(r.pair, r.pair_count) for r in top] == [("ab", 2), ("cd", 2)]


def test_bpe_pair_stage_runs_on_vocab_not_corpus(spark):  # noqa: F811
    # two aggregates total: the corpus word count and the vocab pair
    # count — the plan must show exactly 2 shuffle boundaries.
    df = spark.createDataFrame([Row(text="a few words a few")])
    plan = bpe_pair_counts(df)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, plan[:2000]


# --- splits / shards -------------------------------------------------------


def _hosts_df(spark, n=200):  # noqa: F811
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 17).cast("string")).alias("host"),
    )


def test_splits_host_disjoint_and_complete(spark):  # noqa: F811
    out = assign_splits(_hosts_df(spark))
    per_host = out.groupBy("host").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r.k == 1 for r in per_host)
    assert set(r.split for r in out.select("split").distinct().collect()) <= {
        "train", "val", "test",
    }


def test_splits_null_host_routed_to_last(spark):  # noqa: F811
    df = spark.createDataFrame([Row(doc_id=1, host=None)], "doc_id long, host string")
    assert assign_splits(df).collect()[0].split == "test"


def test_splits_weight_validation(spark):  # noqa: F811
    df = _hosts_df(spark, 1)
    with pytest.raises(ValueError):
        assign_splits(df, splits=(("a", 60), ("b", 60)))
    with pytest.raises(ValueError):
        assign_splits(df, splits=(("a", 100), ("b", 0)))


def test_splits_deterministic_across_runs(spark):  # noqa: F811
    a = {r.doc_id: r.split for r in assign_splits(_hosts_df(spark)).collect()}
    b = {r.doc_id: r.split for r in assign_splits(_hosts_df(spark)).collect()}
    assert a == b


def test_shards_pack_and_offsets(spark):  # noqa: F811
    df = spark.createDataFrame(
        [Row(doc_id=i, n_bytes=40) for i in range(50)]
    )
    out = plan_shards(df, target_bytes=100, writers=1).orderBy("doc_id").collect()
    # lane 0 only: docs pack 100/40 -> starts 0,40,80,120,... shard_seq
    # floor(start/100), offset start%100
    for i, r in enumerate(out):
        assert r.writer == 0
        assert r.shard_seq == (i * 40) // 100
        assert r.shard_offset == (i * 40) % 100
        assert r.shard == f"shard-00000-{r.shard_seq:06d}"


def test_shards_oversized_doc_owns_shards_and_seq_monotone(spark):  # noqa: F811
    df = spark.createDataFrame(
        [Row(doc_id=0, n_bytes=10), Row(doc_id=1, n_bytes=950), Row(doc_id=2, n_bytes=10)]
    )
    out = {r.doc_id: r for r in plan_shards(df, target_bytes=100, writers=1).collect()}
    assert out[0].shard_seq == 0
    assert out[1].shard_seq == 0          # starts at offset 10
    assert out[2].shard_seq == 9          # lane indices skip past the blob
    assert out[2].shard_offset == 60      # 960 % 100


def test_shard_manifest_reconciles(spark):  # noqa: F811
    df = spark.createDataFrame([Row(doc_id=i, n_bytes=33 + i % 7) for i in range(300)])
    plan = plan_shards(df, target_bytes=500, writers=4)
    man = shard_manifest(plan)
    tot = man.agg(F.sum("n_docs").alias("d"), F.sum("bytes").alias("b")).collect()[0]
    assert tot.d == 300
    assert tot.b == sum(33 + i % 7 for i in range(300))
    # ids in a manifest row bound its docs
    joined = plan.join(man, ["shard", "writer", "shard_seq"])
    bad = joined.where(
        (F.col("doc_id") < F.col("first_id")) | (F.col("doc_id") > F.col("last_id"))
    ).count()
    assert bad == 0


def test_shards_validation(spark):  # noqa: F811
    df = spark.createDataFrame([Row(doc_id=1, n_bytes=1)])
    with pytest.raises(ValueError):
        plan_shards(df, target_bytes=0)
    with pytest.raises(ValueError):
        plan_shards(df, writers=0)


def test_shards_single_exchange_plan(spark):  # noqa: F811
    df = spark.createDataFrame([Row(doc_id=i, n_bytes=10) for i in range(20)])
    plan = plan_shards(df, writers=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


# --- model-based property tests (one Spark job, vectorised compare) --------


import hashlib
import random
import re


def _clean_model(c: str) -> str:
    c = re.sub(r"(?s)<[^>]*>", " ", c)
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        c = c.replace(ent, rep)
    return re.sub(r"\s+", " ", c).strip(" ")


def _tables_model(url, html, max_tables, max_rows, max_cells):
    if html is None:
        return []
    out = []
    tabs = re.findall(r"(?is)<table\b[^>]*>(.*?)</table\s*>", html)[:max_tables]
    for ti, th in enumerate(tabs):
        rows = re.findall(r"(?is)<tr\b[^>]*>(.*?)</tr\s*>", th)[:max_rows]
        for ri, rh in enumerate(rows):
            cells = re.findall(r"(?is)<t[dh]\b[^>]*>(.*?)</t[dh]\s*>", rh)[:max_cells]
            out.append((
                url, ti, ri,
                re.search(r"(?is)<th\b", rh) is not None,
                len(cells),
                tuple(_clean_model(c) for c in cells),
            ))
    return out


_CELL_BITS = ["x", "a b", "<b>bo</b>ld", "&amp;lt;", "&nbsp;", "v &amp; w",
              "&lt;i&gt;", "  sp  ", "\nnl\t", "", "<i >t</i>", "99", "&",
              "<"]
_ROW_OPEN = ["<tr>", "<TR>", "<tr align=left>", "<tr\nclass='r'>"]
_CELL_TAG = [("<td>", "</td>"), ("<TD >", "</td >"), ("<th>", "</th>"),
             ("<th scope=col>", "</TH>")]
_NOISE = ["", "<p>n</p>", "stray </table> close", "<div><table>no close",
          "&amp; loose entity", "\n\n"]


def _gen_page(rng: random.Random, i: int):
    parts = [rng.choice(_NOISE)]
    for _t in range(rng.randint(0, 4)):
        parts.append(rng.choice(["<table>", "<TABLE border=1>", '<table class="d">']))
        if rng.random() < 0.15:
            parts.append("<caption>cap</caption>")  # row-less content
        for _r in range(rng.randint(0, 5)):
            parts.append(rng.choice(_ROW_OPEN))
            for _c in range(rng.randint(0, 4)):
                o, cl = rng.choice(_CELL_TAG)
                parts.append(o + rng.choice(_CELL_BITS) + cl)
            parts.append("</tr>" if rng.random() < 0.9 else "</TR >")
        parts.append("</table>" if rng.random() < 0.9 else "</TABLE  >")
        parts.append(rng.choice(_NOISE))
    return (f"u{i}", "".join(parts))


def test_tables_property_vs_python_model(spark):  # noqa: F811
    rng = random.Random(1234)
    pages = [_gen_page(rng, i) for i in range(300)]
    df = spark.createDataFrame(pages, "url string, html string")
    got = sorted(
        (r.url, r.table_idx, r.row_idx, r.is_header, r.n_cells, tuple(r.cells))
        for r in extract_html_tables(
            df, max_tables=3, max_rows=4, max_cells=3
        ).collect()
    )
    want = sorted(
        row
        for url, html in pages
        for row in _tables_model(url, html, 3, 4, 3)
    )
    assert got == want


def test_bpe_property_vs_python_model(spark):  # noqa: F811
    from collections import Counter

    rng = random.Random(77)
    alphabet = "ab1 .!x" + "Z"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(200)
    ] + [None, "", "q" * 65, "q" * 64]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    vocab = Counter()
    for t in texts:
        if t is None:
            continue
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w and len(w) <= 64:
                vocab[w] += 1
    pairs, forms = Counter(), Counter()
    for w, n in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
            forms[w[i : i + 2]] += 1

    got = {r.pair: (r.pair_count, r.n_forms) for r in bpe_pair_counts(df).collect()}
    assert got == {p: (pairs[p], forms[p]) for p in pairs}


def test_sharding_property_vs_python_model(spark):  # noqa: F811
    rng = random.Random(9)
    rows = [(i, rng.randint(1, 500)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
    target, writers = 1000, 5

    def lane(i):
        return int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:15], 16) % writers

    starts, acc = {}, {}
    for i, b in sorted(rows):
        w = lane(i)
        starts[i] = acc.get(w, 0)
        acc[w] = starts[i] + b
    want = {
        i: (lane(i), starts[i] // target, starts[i] % target) for i, _ in rows
    }
    got = {
        r.doc_id: (r.writer, r.shard_seq, r.shard_offset)
        for r in plan_shards(df, target_bytes=target, writers=writers).collect()
    }
    assert got == want


# --- markdown linearization / shuffled packing ------------------------------


def test_tables_markdown_header_sep_and_escape(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
        tables_to_markdown,
    )

    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a|b</td><td>c</td></tr></table>"
        "<table><tr><td>plain</td></tr></table>"
    )
    out = {
        r.table_idx: (r.n_rows, r.markdown)
        for r in tables_to_markdown(extract_html_tables(_page(spark, html))).collect()
    }
    assert out[0] == (2, "| k | v |\n| --- | --- |\n| a\\|b | c |")
    # no header row -> no separator line
    assert out[1] == (1, "| plain |")


def test_tables_markdown_zero_cell_row_pinned(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
        tables_to_markdown,
    )

    html = "<table><tr></tr><tr><td>x</td></tr></table>"
    (r,) = tables_to_markdown(extract_html_tables(_page(spark, html))).collect()
    assert r.markdown == "|  |\n| x |"


def test_tables_markdown_row_order_stable_under_partitioning(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.tables import (
        tables_to_markdown,
    )

    html = "<table>" + "".join(
        f"<tr><td>r{i}</td></tr>" for i in range(20)
    ) + "</table>"
    t = extract_html_tables(_page(spark, html))
    a = tables_to_markdown(t.coalesce(1)).collect()[0].markdown
    b = tables_to_markdown(t.repartition(16)).collect()[0].markdown
    assert a == b == "\n".join(f"| r{i} |" for i in range(20))


def test_shards_shuffle_permutes_but_preserves_layout_mass(spark):  # noqa: F811
    rows = [Row(doc_id=i, n_bytes=50) for i in range(200)]
    df = spark.createDataFrame(rows)
    plain = plan_shards(df, target_bytes=300, writers=4)
    mixed = plan_shards(df, target_bytes=300, writers=4, shuffle=True)
    p = {r.doc_id: r for r in plain.collect()}
    m = {r.doc_id: r for r in mixed.collect()}
    # lanes unchanged (same lane hash), total bytes per lane unchanged
    assert all(p[i].writer == m[i].writer for i in p)
    # equal-size docs: the set of (lane, seq, offset) slots is identical,
    # only WHICH doc occupies a slot changes — and it does change
    assert sorted((r.writer, r.shard_seq, r.shard_offset) for r in p.values()) == \
        sorted((r.writer, r.shard_seq, r.shard_offset) for r in m.values())
    assert any(
        (p[i].shard_seq, p[i].shard_offset) != (m[i].shard_seq, m[i].shard_offset)
        for i in p
    )
    # deterministic across runs
    m2 = {r.doc_id: (r.shard_seq, r.shard_offset)
          for r in plan_shards(df, target_bytes=300, writers=4, shuffle=True).collect()}
    assert m2 == {i: (m[i].shard_seq, m[i].shard_offset) for i in m}


# ---- bpe_encode / learn_merges (tokenizer inference + driver trainer) ----

def _encode_word_py(word: str, merges) -> list:
    """Independent pure-Python model of the encode semantics: one global
    leftmost-non-overlapping pass per merge, in priority order."""
    sym = list(word)
    for x, y in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == x and sym[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_matches_python_model(spark):  # noqa: F811
    import random

    from universal_key_value_based_text_processing_with_ocr_spark.operators.bpe import (
        DEFAULT_MERGES,
        bpe_encode,
    )

    rng = random.Random(11)
    texts = [
        " ".join(
            "".join(rng.choice("theinarso") for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(1, 20))
        )
        for _ in range(60)
    ] + ["", "THE    Cat!! and-the-hat", "aaaa aaa a"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id long, text string"
    )
    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(df).collect()}
    import re
    for i, t in enumerate(texts):
        words = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        want = " ".join(" ".join(_encode_word_py(w, DEFAULT_MERGES)) for w in words)
        assert got[i] == want, (i, t, got[i], want)


def test_bpe_encode_leftmost_nonoverlap_pinned(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.bpe import (
        bpe_encode,
    )

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaa"), (3, "abc")], schema="doc_id long, text string"
    )
    got = {r["doc_id"]: r["tokens"] for r in
           bpe_encode(df, merges=[("a", "a")]).collect()}
    assert got[1] == "aa aa" and got[2] == "aa a"
    got3 = {r["doc_id"]: r["tokens"] for r in
            bpe_encode(df, merges=[("a", "b"), ("ab", "c")]).collect()}
    assert got3[3] == "abc"  # priority chaining: (a,b) then (ab,c)


def test_bpe_encode_is_single_narrow_projection(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.bpe import (
        bpe_encode,
    )

    df = spark.createDataFrame([(1, "the cat")], schema="doc_id long, text string")
    plan = bpe_encode(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_learn_merges_hand_worked_and_roundtrip(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.bpe import (
        bpe_encode,
        learn_merges,
        word_counts,
    )

    # hand-worked: corpus 'low low low lower' -> vocabulary
    # {low:3, lower:1}; best first pair is ('l','o') count 4, then
    # ('lo','w') count 4 -- ties break (count DESC, pair ASC)
    df = spark.createDataFrame(
        [(1, "low low low lower")], schema="doc_id long, text string"
    )
    vocab = word_counts(df)
    merges = learn_merges(vocab, n_merges=2)
    assert merges == [("l", "o"), ("lo", "w")]

    # round-trip property: token concatenation reproduces every word, and
    # learned merges strictly reduce the token count vs no merges
    enc = bpe_encode(df, merges=merges).collect()[0]
    assert enc["tokens"].replace(" ", "") == "lowlowlowlower"
    base = bpe_encode(df, merges=[]).collect()[0]
    assert enc["n_tokens"] < base["n_tokens"]
