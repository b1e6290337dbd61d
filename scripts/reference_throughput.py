"""Measure the REFERENCE implementation's single-node throughput vs the
engine's single-thread semantic core on identical documents.

The reference is exec'd via tests/refharness.py (its real code; nltk's
edit_distance — its only external compute dependency — is itself pure
Python upstream, so the stub is performance-representative).  Only
KTP-style docs are used: on generic multi-line docs the reference's
wo_space key-list growth is exponential (2^n per scanned line,
SURVEY.md §7) and it does not terminate, while the engine processes them
normally.

Writes BENCH/REFERENCE.md.  Usage: python scripts/reference_throughput.py
"""

from __future__ import annotations

import datetime
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from tests import refharness
    from universal_key_value_based_text_processing_with_ocr_spark.kvcore import ktpspec
    from universal_key_value_based_text_processing_with_ocr_spark.operators.extract import (
        parse_page_row,
    )
    from universal_key_value_based_text_processing_with_ocr_spark.sources.synthdocs import (
        gen_document,
    )

    docs = []
    i = 0
    while len(docs) < 40:
        d = gen_document(42, i)
        i += 1
        if d["lang"] == "ind" and d["text"] is not None:
            docs.append(d)

    args = (ktpspec.DEFAULT_FIELD_CONFIG, ktpspec.RESULT_ORDERS, ktpspec.OUTPUT_ORDERS)
    for d in docs[:3]:
        refharness.ref_parse_document(d["text"], *args)
    t0 = time.time()
    for d in docs:
        refharness.ref_parse_document(d["text"], *args)
    ref_rate = len(docs) / (time.time() - t0)

    for d in docs[:3]:
        parse_page_row(d["url"], None, d["text"], d["lang"])
    t0 = time.time()
    for d in docs:
        parse_page_row(d["url"], None, d["text"], d["lang"])
    eng_rate = len(docs) / (time.time() - t0)

    out = {
        "n_docs": len(docs),
        "reference_docs_per_sec": round(ref_rate, 1),
        "engine_single_thread_docs_per_sec": round(eng_rate, 1),
        "single_thread_speedup": round(eng_rate / ref_rate, 1),
        "date": datetime.date.today().isoformat(),
    }
    md = f"""# BENCH/REFERENCE — reference vs engine, identical documents

{json.dumps(out, indent=2)}

Method: the genuine reference code (exec'd with performance-representative
stubs — see scripts/reference_throughput.py) and the engine's semantic core
run the same {out['n_docs']} KTP-style documents single-threaded.

- Single thread: engine is {out['single_thread_speedup']}x the reference
  ({out['engine_single_thread_docs_per_sec']} vs
  {out['reference_docs_per_sec']} docs/s).
- Cluster (local[32], BENCH/SOAK.md): ~2600 docs/s on the mixed corpus —
  ~20x the reference's single sequential process
  (/root/reference/ocrfw/ktp.py:2163-2166), which has no parallelism.
- Coverage: the reference does NOT TERMINATE on multi-line generic pages
  (exponential wo_space key growth, SURVEY.md §7); the engine bounds the
  growth output-identically and processes the full corpus.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "REFERENCE.md").write_text(md)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
