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
