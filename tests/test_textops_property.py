"""Property tests for the JVM-side text operators against independent pure
Python models (one Spark job over many random documents, vectorised
compare).  ASCII-only generator: Java and Python regex \\s agree on ASCII
but diverge on unicode whitespace (\\xa0), which these operators do not
claim to handle."""

import random
import re

import pandas as pd

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

WORDS = ["alpha", "beta", "x", "spam", "a@b.co", "10.0.0.1", "081234567890",
         "9" * 12, "mail.user@example.org", "1.2.3.4.5", "abc123", ""]
WS = [" ", "  ", "\t", "\n", "\r\n", "\x01", "\x1f", ""]


def _gen_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 25)):
        parts.append(rng.choice(WORDS))
        parts.append(rng.choice(WS))
    return "".join(parts)


def _model_normalize(t: str) -> str:
    t = re.sub(r"[\x00-\x1f]", " ", t.lower())
    t = re.sub(r"\s+", " ", t)
    return t.strip(" ")


EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
NUM = r"\b\d{8,}\b"


def _model_scrub(t: str):
    # mirrors scrub_pii's DOCUMENTED semantics: counts are pattern hits on
    # the ORIGINAL text; masking is sequential email -> ip -> num (an
    # overlap is counted under every pattern but masked once by the first)
    scrubbed = re.sub(NUM, "<NUM>", re.sub(IP, "<IP>", re.sub(EMAIL, "<EMAIL>", t)))
    return scrubbed, len(re.split(EMAIL, t)) - 1, len(re.split(IP, t)) - 1, len(re.split(NUM, t)) - 1


def test_normalize_and_scrub_match_python_models(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.textstats import (
        normalize_text,
        scrub_pii,
    )

    rng = random.Random(99)
    texts = [_gen_text(rng) for _ in range(400)]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )

    norm = normalize_text(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    for i, row in norm.iterrows():
        want = _model_normalize(texts[row.doc_id])
        assert row.norm_text == want, (row.doc_id, texts[row.doc_id])
        assert row.n_chars_norm == len(want)

    scrub = scrub_pii(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    for i, row in scrub.iterrows():
        w_s, w_e, w_i, w_n = _model_scrub(texts[row.doc_id])
        assert row.scrubbed == w_s, (row.doc_id, texts[row.doc_id])
        assert (row.n_emails, row.n_ips, row.n_numbers) == (w_e, w_i, w_n), (
            row.doc_id, texts[row.doc_id]
        )


def test_gopher_quality_rule_branches(spark):  # noqa: F811
    from universal_key_value_based_text_processing_with_ocr_spark.operators.textstats import (
        gopher_quality,
    )

    docs = spark.createDataFrame(
        [
            (0, "plain readable prose with enough ordinary words here"),
            (1, None),
            (2, "   "),  # whitespace only -> no words
            (3, "- a\n- b\n- c\n- d"),  # all bullet lines
            (4, "one two ### #### #####"),  # 12 hashes / 5 words
            (5, "a b c d\nwait...\nmore...\nend."),  # 2/4 lines end ...
            (6, "w1 w2 1 2 3 4 5 6 7 8"),  # 2 alpha / 10 words
            (7, "ok line\n\n\nok again"),  # blank lines excluded from fracs
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_quality(docs).collect()}
    assert got[0].keep and got[0].fail_reason == "ok"
    assert (got[1].keep, got[1].fail_reason, got[1].n_words) == (False, "null_text", 0)
    assert (got[2].keep, got[2].fail_reason, got[2].n_words) == (False, "no_words", 0)
    assert got[3].fail_reason == "too_many_bullets" and got[3].bullet_line_frac == 1.0
    assert got[4].fail_reason == "too_many_symbols" and got[4].symbol_word_ratio == 2.4
    # doc 5: symbol ratio = 2 ellipses / 7 words ~ 0.2857 > 0.1 fires FIRST
    # (the cascade order is part of the contract)
    assert got[5].fail_reason == "too_many_symbols"
    assert got[5].ellipsis_line_frac == 0.5
    assert got[6].fail_reason == "too_few_alpha_words" and got[6].alpha_word_frac == 0.2
    assert got[7].keep and got[7].bullet_line_frac == 0.0  # blanks don't count
    # null-text ratios stay NULL (no fake zeros)
    assert got[1].symbol_word_ratio is None and got[1].alpha_word_frac is None
