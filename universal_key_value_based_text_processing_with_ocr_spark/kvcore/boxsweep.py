"""Block-order document sweep — the reference's SECOND physical plan.

Parity target: reference ``parse_doc_new0``
(/root/reference/ocrfw/postprocessing.py:546-663), the geometry-driven
sweep that walks OCR line boxes in detection order and re-runs OCR per box.
On the graft the geometry is the DOM: a "box" is one htmlcore block's text
(possibly multi-line, with its densitometry stats as the box-size analog),
walked in document order; the per-box OCR re-run is the block's own text.

Faithfully-kept control-flow quirks (all observable in output):
- The block list is CONSUMED in place (``del`` at the live iteration index,
  postprocessing.py:636-639): a single-line block that yields a success is
  removed while the loop iterates the live list, so the block immediately
  after it is skipped for the rest of that spec's scan and the running index
  desyncs from list positions exactly as the reference's does.  Consumption
  is shared across specs — later specs never see consumed blocks.
- ``success`` latches per spec across blocks AND lines (never reset inside
  the scan); with ``keep_looking=False`` the block loop stops at the first
  block boundary after a success — the check sits BEFORE the index increment
  (postprocessing.py:563-566).  With ``keep_looking=True`` a later
  single-line block is consumed even when IT contributed nothing, because
  the per-line consumption check tests the latched flag.
- A spec whose found-count ends below its must-exist count aborts the WHOLE
  parse immediately (single error dict with ``error_code`` 0 echoing the
  last raw extractor output — unlike the line sweep, which records the error
  and keeps going).  If the spec never saw a non-blank line the reference
  raises UnboundLocalError on that echo; so does this function, by the same
  mechanism.
- Per-line "Not success" bookkeeping: a list temp_result gets
  ``insert(1, ['Not success', aliases, block_lines])``; a dict one gets a
  ``status`` key; error_result is only seeded when still empty.
- ``extractor_args`` is the spec's own dict, mutated with the current line.
"""

from __future__ import annotations

import re

_BLANK = re.compile(r"^\s*$")


def sweep_blocks(blocks, to_extracts, final_evaluator=None, keep_looking=False):
    """Run each extraction spec over a consumable list of text blocks.

    ``blocks``: ordered block texts (each may contain several lines) —
    typically ``[b["text"] for b in htmlcore.extract_blocks(...)]`` after the
    densitometry keep-rule."""
    results_json: dict = {}
    pool = list(blocks)

    for te in to_extracts:
        temp_result: list | dict = []
        error_level = 0
        success_inserted = 0
        error_result: list = []
        block_index = -1
        success = False

        for block in pool:
            if success and (not keep_looking):
                break
            block_index += 1
            block_lines = block.split("\n")
            for line in block_lines:
                if _BLANK.match(line):
                    continue

                extractor = te["extractor"]
                extractor_args = te["extractor_args"]
                extractor_args["line"] = line
                line_result = extractor(**extractor_args)

                if line_result[0]:
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
                    if len(block_lines) <= 1:
                        # consume the block at the LIVE index (quirk: shifts
                        # the remainder left under the running iterator)
                        del pool[block_index]
                else:
                    if type(temp_result) is list:
                        temp_result.insert(1, ["Not success", te["alias_names"], block_lines])
                        if not error_result:
                            error_result = [False, "Not success"]
                    else:
                        temp_result["status"] = "Not success"

        must_exists_count = sum(1 for t in te["tolerant_not_exists"] if not t)
        if success_inserted != len(te["alias_names"]):
            if success_inserted < must_exists_count:
                return {
                    "success": False,
                    "error_code": 0,
                    "error_message": (
                        f'One or more keys in {te["alias_names"]} not found. '
                        f"Must exists: {must_exists_count}, founded: {success_inserted} "
                        f"<=> {error_result}"
                    ),
                    "result": results_json,
                    "line_result": line_result,
                    "to extracts": te,
                }

    if final_evaluator:
        return final_evaluator(results_json)
    return {"success": True, "result": results_json}
