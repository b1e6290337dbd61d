"""Per-document extraction sweep and parser blending.

Parity targets:
- ``sweep_document`` == reference ``parse_doc`` text path
  (/root/reference/ocrfw/postprocessing.py:400-543 with ``doc_str`` set, the
  pure text->fields contract the engine reproduces byte-identically).
- ``blend_parsers``  == reference ``blended_parse_doc``
  (/root/reference/ocrfw/postprocessing.py:707-737).

Faithfully-kept reference quirks:
- Specs run in config order over a consumable line pool: the first line a
  spec fully succeeds on is REMOVED from the pool by value
  (``del pool[pool.index(line)]`` — postprocessing.py:495), so a duplicate
  line earlier in the pool is the one deleted.
- One spec's ``extractor_args`` dict is shared across every line it scans
  (postprocessing.py:431-432), which lets ``wo_space`` key-list growth
  compound across lines within a document.  State never crosses documents:
  callers must hand each document a fresh deep-copied spec list.
- error_result / error_level bookkeeping and the exact error-message
  strings, which surface in ``all_error_messages``.

The sweep is inherently sequential per document and embarrassingly parallel
across documents — which is exactly how the Spark layer runs it (one
vectorised UDF stage, one sweep per row, zero cross-row state).
"""

from __future__ import annotations

import copy
import re

_BLANK = re.compile(r"^\s*$")


def sweep_document(doc_str, to_extracts, final_evaluator=None):
    """Run each extraction spec over the document's line pool in order."""
    final_success = True
    results_json: dict = {}

    real_all_lines = doc_str.split("\n")
    pool = copy.copy(real_all_lines)

    all_error_messages: list[str] = []
    all_error_codes: list[int] = []

    for te in to_extracts:
        temp_result = None
        error_level = 0
        success_inserted = 0
        error_result: list = []

        for line in pool:
            if _BLANK.match(line):
                continue

            extractor = te["extractor"]
            extractor_args = te["extractor_args"]
            extractor_args["line"] = line
            line_result = extractor(**extractor_args)

            if line_result[0]:
                success = False
                temp_result = line_result[1]
                all_required_exist = True

                names_to_check: dict = {}
                for ani in range(len(te["alias_names"])):
                    an = te["alias_names"][ani]
                    if (an not in temp_result) and (not te["tolerant_not_exists"][ani]):
                        all_required_exist = False
                        success = False
                        if error_level <= 0:
                            error_result = [
                                False,
                                f"{an} is not exist while its not tolerant to not exist",
                                line,
                            ]
                            error_level = 0
                        break
                    elif (an not in temp_result) and te["tolerant_not_exists"][ani]:
                        names_to_check[an] = False
                    else:
                        names_to_check[an] = True

                if all_required_exist:
                    for alias_index in range(len(te["alias_names"])):
                        a_name = te["alias_names"][alias_index]
                        if alias_index < len(te["evaluators"]):
                            evaluator = te["evaluators"][alias_index]
                            if not names_to_check[a_name]:
                                continue
                            temp_result = line_result[1]
                            eval_result = evaluator(temp_result[a_name])
                            if eval_result[0]:
                                success = True
                                success_inserted += 1
                                if type(eval_result[1]) is dict:
                                    results_json = {**results_json, **eval_result[1]}
                                else:
                                    results_json[a_name] = eval_result[1]
                            else:
                                if error_level <= 2:
                                    error_result = [
                                        False,
                                        f"{a_name} not passed evaluator",
                                        temp_result,
                                        eval_result,
                                        line,
                                    ]
                                    error_level = 2
                        else:
                            success = True
                            if not names_to_check[a_name]:
                                if error_level < 1:
                                    error_result = [
                                        False,
                                        f"{a_name} not exist and its not tolerant to not exist",
                                        line,
                                    ]
                                    error_level = 1
                                continue
                            success_inserted += 1
                            temp_result = line_result[1]
                            results_json[a_name] = temp_result[a_name]

                if success:
                    # Consume by value: first equal line wins (quirk).
                    del pool[pool.index(line)]
                    break
                else:
                    if type(temp_result) is list:
                        temp_result.insert(1, "Not success")
                        if error_result:
                            error_result.insert(1, "Not success")
                        else:
                            error_result = [False, "Not success"]
                    else:
                        temp_result["status"] = "Not success"

        must_exists_count = sum(1 for t in te["tolerant_not_exists"] if not t)
        if success_inserted != len(te["alias_names"]):
            if success_inserted < must_exists_count:
                all_error_codes.append(0)
                all_error_messages.append(
                    f'One or more keys in {te["alias_names"]} not found. '
                    f"Must exists: {must_exists_count}, founded: {success_inserted} "
                    f"<=> {error_result}"
                )
                final_success = False

    if final_evaluator:
        final_result = final_evaluator(results_json)
        if not final_result["success"]:
            all_error_codes += final_result["error_codes"]
            all_error_messages += final_result["error_messages"]
            del final_result["error_codes"]
            del final_result["error_messages"]
        if final_success and (not final_result["success"]):
            final_success = False
    else:
        final_result = {"result": results_json}

    if not final_success:
        final_result["all_error_codes"] = all_error_codes
        final_result["all_error_messages"] = all_error_messages

    final_result["model_result"] = {f"pd{i}": line for i, line in enumerate(real_all_lines)}
    final_result["success"] = final_success
    return final_result


def scan_document_all(doc_str, spec, passes=("preprocessing3", "preprocessing1")):
    """Multi-hit scan: run ONE spec over every line of every pass,
    collecting ALL evaluator-passing values (no consumption, no break).

    Parity target: reference ``simple_parse_one_all``
    (/root/reference/ocrfw/postprocessing.py:666-698) on the text path —
    the second "physical plan" of the blended entry point (parsers.py:68-73),
    whose role is a focused re-scan (NIK digits) across alternative payload
    preprocessings.  For text payloads each pass sees the same lines; the
    pass names mirror the reference's preprocessing function names.

    Kept quirks: a dict extractor result is flattened to its VALUES list
    before evaluation; evaluator outputs are ``extend``-ed (not appended);
    success = at least one collected value.
    """
    if type(spec) is list:
        spec = spec[0]
    all_result: list = []
    all_real_lines: dict = {}
    extractor = spec["extractor"]
    extractor_args = spec["extractor_args"]

    for pass_name in passes:
        real_lines = doc_str.split("\n")
        all_real_lines[pass_name] = real_lines
        for line in real_lines:
            extractor_args["line"] = line
            line_result = extractor(**extractor_args)
            if line_result[0]:
                new_result = line_result[1]
                if type(new_result) is dict:
                    new_result = [v for _, v in new_result.items()]
                if len(spec["evaluators"]) > 0:
                    for evaluator in spec["evaluators"]:
                        eval_result = evaluator(new_result)
                        if eval_result[0]:
                            all_result.extend(eval_result[1])
                else:
                    all_result.append(new_result)

    return {
        "result": {spec["alias_names"][0]: all_result},
        "model_result": all_real_lines,
        "success": True if len(all_result) > 0 else False,
    }


def blend_parsers(doc_parsers, final_evaluator=None, **kwargs):
    """Run each parser; merge ``result``/``model_result`` first-writer-wins,
    then apply the final evaluator over the merged result dict."""
    fields_to_update: dict = {"result": {}, "model_result": {}}
    result = {field: {} for field in fields_to_update}
    success = True

    for parser in doc_parsers:
        args = {**kwargs, **doc_parsers[parser]}
        new_result = parser(**args)
        for field in fields_to_update:
            if field not in new_result:
                continue
            for k0 in new_result[field]:
                if k0 in fields_to_update[field]:
                    continue
                fields_to_update[field][k0] = new_result[field][k0]
        result = {**result, **new_result}
        if not new_result["success"]:
            success = False

    result = {**result, **fields_to_update}
    result = {**result, **final_evaluator(result["result"])}
    if not success:
        result["success"] = False
    return result
