"""Universal extraction-config schema: JSON-friendly field specs.

The reference's extensibility model is a list of spec dicts naming an
extractor, its thresholds and evaluators (``to_extracts_ktp``,
/root/reference/parsers.py:29-61; dispatch at
/root/reference/ocrfw/postprocessing.py:430-434,457-467).  This module is
the engine's public version of that contract: a plain-JSON config (so it
ships to executors by closure capture / --py-files with zero pickling
hazards) compiled into runnable spec lists for ``sweep_document``.

Example::

    cfg = {
        "fields": [
            {"name": "Invoice", "keys": [["Invoice", "No"]],
             "max_distances": [[1, 1]], "min_accuracies": [0.6],
             "separators": [":"], "char_filter": "[a-z|A-Z|0-9]",
             "evaluators": ["letters"]},
            {"name": "Total", "extractor": "whole_line",
             "pattern": "TOTAL", "evaluators": ["digits"]},
        ],
        "final_evaluator": null,
    }
    results = parse_document_with_config(text, cfg)

Evaluator registry: named, pure functions ``value -> [ok, cleaned, *diag]``
— the engine's built-ins plus all reference evaluators.  Users extend by
calling :func:`register_evaluator`.
"""

from __future__ import annotations

import copy

from . import evaluate
from .matching import match_keys_in_line, match_line_regex
from .repair import repair_no_number, repair_to_digits, repair_to_letters
from .sweep import sweep_document

# --- evaluator registry -----------------------------------------------------

EVALUATORS = {
    "identity": lambda v: [True, v],
    "letters": repair_to_letters,
    "digits": lambda v: [True, repair_to_digits(v)],
    "no_number": lambda v: [True, repair_no_number(repair_to_letters(v)[1])],
    "strip": lambda v: [True, v.strip()],
    "upper": lambda v: [True, v.upper()],
    # reference field evaluators
    "province": evaluate.eval_province,
    "city": evaluate.eval_city,
    "nik": evaluate.eval_nik,
    "birth": evaluate.eval_birth,
    "gender": evaluate.eval_gender,
    "blood": evaluate.eval_blood,
    "rtrw": evaluate.eval_rtrw,
    "religion": evaluate.eval_religion,
    "marital": evaluate.eval_marital,
    "job": evaluate.eval_job,
    "valid_until": evaluate.eval_valid_until,
    "citizenship": evaluate.eval_citizenship,
}

FINAL_EVALUATORS = {
    None: None,
    "ktp": evaluate.final_evaluate_ktp,
}

_PREPROCESS = {None: None, "lower": str.lower, "upper": str.upper}


def register_evaluator(name: str, fn) -> None:
    """Add a custom evaluator (callable value -> [ok, cleaned, *diag])."""
    EVALUATORS[name] = fn


def compile_field(field: dict) -> dict:
    """One JSON field spec -> a sweep_document spec dict."""
    name = field["name"]
    extractor_kind = field.get("extractor", "keys")
    evaluators = [EVALUATORS[e] for e in field.get("evaluators", [])]
    alias_names = field.get("aliases", [name])
    tolerant = field.get("tolerant_not_exists", [False] * len(alias_names))

    if extractor_kind == "whole_line":
        extractor = match_line_regex
        extractor_args = dict(alias_names=list(alias_names), pattern=field.get("pattern", ".*"))
    elif extractor_kind == "keys":
        keys = [list(k) for k in field["keys"]]
        char_filter = field.get("char_filter", "[a-z|A-Z|0-9]")
        filters = field.get(
            "char_filters", [[char_filter] * len(k) for k in keys]
        )
        extractor = match_keys_in_line
        extractor_args = dict(
            key_str_list_list=keys,
            max_distances=copy.deepcopy(field["max_distances"]),
            min_accuracies=list(field["min_accuracies"]),
            separators=list(field.get("separators", [":"])),
            re_chars_filter=copy.deepcopy(filters),
            alias_names=list(alias_names),
        )
        if field.get("preprocess") is not None:
            extractor_args["line_preprocessing"] = _PREPROCESS[field["preprocess"]]
        if field.get("wo_space", False):
            extractor_args["wo_space"] = True
        if field.get("use_re_support", False):
            extractor_args["use_re_support"] = True
    else:
        raise ValueError(f"unknown extractor kind: {extractor_kind}")

    return dict(
        extractor=extractor,
        extractor_args=extractor_args,
        evaluators=evaluators,
        multi_line_value=field.get("multi_line_value", False),
        alias_names=list(alias_names),
        tolerant_not_exists=list(tolerant),
    )


def compile_config(cfg: dict) -> tuple[list, object]:
    """Full JSON config -> (spec list, final evaluator)."""
    specs = [compile_field(f) for f in cfg.get("fields", [])]
    final = FINAL_EVALUATORS[cfg.get("final_evaluator")]
    return specs, final


def parse_document_with_config(doc_str: str, cfg: dict) -> dict:
    """Run a user config over one document (fresh specs per call)."""
    specs, final = compile_config(cfg)
    return sweep_document(doc_str, specs, final_evaluator=final)
