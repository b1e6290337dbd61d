"""KTP extraction plan assembly and the text-path document parser.

Parity target: reference ``parse_ktp`` (/root/reference/parsers.py:11-101),
text path (``ktp_str=...``, parsers.py:82-86) — the pure text->fields
contract.  The ordered spec list built here IS the logical plan: declarative
field specs naming an extractor (operator), thresholds (predicates) and
evaluators (post-ops); the reference's ``to_extracts_ktp`` list
(parsers.py:29-61).

The per-field thresholds come from a config the reference loads from a DB or
``ktp_config.json`` (parsers.py:8,21-27) — neither ships with the reference
repo, so DEFAULT_FIELD_CONFIG below is engine-defined (documented, frozen,
and used by both oracle and pipeline; values chosen so OCR-style noise
within the confusion sets stays findable).

Reference quirks kept:
- The text path INSERTS a second NIK spec at position 2 (parsers.py:86)
  ahead of the always-present NIK spec; the earlier one consumes the NIK
  line, so the later spec (tolerant_not_exists=[False], parsers.py:35) then
  fails and every single-NIK-line document sweeps to success=False even when
  the final evaluator accepts the NIK.  Byte-identity keeps this.
- ``result_orders`` / ``output_orders`` canonical orderings
  (parsers.py:15-16,99-101) drive the serialized output.
"""

from __future__ import annotations

import copy
import json

from .evaluate import (
    eval_birth,
    eval_blood,
    eval_citizenship,
    eval_city,
    eval_gender,
    eval_job,
    eval_marital,
    eval_nik,
    eval_province,
    eval_religion,
    eval_rtrw,
    eval_valid_until,
    final_evaluate_ktp,
)
from .matching import match_keys_in_line, match_line_regex
from .repair import repair_no_number, repair_to_letters
from .boxsweep import sweep_blocks
from .sweep import blend_parsers, scan_document_all, sweep_document

RESULT_ORDERS = [
    "PROVINSI",
    "KABUPATEN/KOTA",
    "NIK",
    "Nama",
    "Tempat",
    "Tanggal Lahir",
    "Jenis kelamin",
    "GolDarah",
    "Alamat",
    "RT/RW",
    "Kel/Desa",
    "Kecamatan",
    "Agama",
    "Status Perkawinan",
    "Pekerjaan",
    "Kewarganegaraan",
    "Berlaku Hingga",
]

OUTPUT_ORDERS = [
    "success",
    "result",
    "all_error_messages",
    "warning",
    "all_error_codes",
    "model_result",
]

# Engine-defined field thresholds (the reference's ktp_config.json is absent
# from its repo).  max_distances are per key token; min_accuracies per key.
DEFAULT_FIELD_CONFIG = {
    "provinsi": {"max_distances": [[3]], "min_accuracies": [0.6], "tolerant_not_exists": [False]},
    "kabupatenkota": {"tolerant_not_exists": [False]},
    "nik": {"max_distances": [[1]], "min_accuracies": [0.7], "tolerant_not_exists": [True]},
    "nama": {"max_distances": [[1]], "min_accuracies": [0.7], "tolerant_not_exists": [False]},
    "tempattgllahir": {
        "max_distances": [[2, 1, 2]],
        "min_accuracies": [0.6],
        "tolerant_not_exists": [False],
    },
    "jeniskelamin|goldarah": {
        "max_distances": [[1, 2], [1, 1]],
        "min_accuracies": [0.6, 0.5],
        "tolerant_not_exists": [False, True],
    },
    "alamat": {"max_distances": [[2]], "min_accuracies": [0.6], "tolerant_not_exists": [False]},
    "rtrw": {"max_distances": [[1]], "min_accuracies": [0.5], "tolerant_not_exists": [False]},
    "keldesa": {"max_distances": [[2]], "min_accuracies": [0.6], "tolerant_not_exists": [False]},
    "kecamatan": {"max_distances": [[2]], "min_accuracies": [0.6], "tolerant_not_exists": [False]},
    "agama": {"max_distances": [[1]], "min_accuracies": [0.6], "tolerant_not_exists": [False]},
    "statusperkawinan": {
        "max_distances": [[2, 3]],
        "min_accuracies": [0.5],
        "tolerant_not_exists": [False],
    },
    "pekerjaan": {"max_distances": [[2]], "min_accuracies": [0.6], "tolerant_not_exists": [False]},
    "kewarganegaraan": {
        "max_distances": [[4]],
        "min_accuracies": [0.5],
        "tolerant_not_exists": [False],
    },
    "berlakuhingga": {
        "max_distances": [[2, 2]],
        "min_accuracies": [0.5],
        "tolerant_not_exists": [False],
    },
}


def _copy_config(obj):
    """Structural copy of a field-config tree (dict/list of scalars).

    Equivalent to ``copy.deepcopy`` for this shape but ~5x cheaper —
    build_ktp_specs runs once per document, and deepcopy's generic memo
    machinery showed up in the kernel profile (~4%/doc).  Falls back to
    deepcopy for any node that isn't a plain dict/list so exotic custom
    configs keep full deepcopy semantics.
    """
    t = type(obj)
    if t is dict:
        return {k: _copy_config(v) for k, v in obj.items()}
    if t is list:
        return [_copy_config(v) for v in obj]
    if t in (str, int, float, bool, type(None)):
        return obj
    return copy.deepcopy(obj)


def build_ktp_specs(configs=None):
    """The ordered logical plan: 15 field specs (reference parsers.py:29-61).

    Returns fresh objects on every call — required because ``wo_space``
    specs mutate their own lists while a document is swept.
    """
    if configs is None:
        configs = DEFAULT_FIELD_CONFIG
    configs = _copy_config(configs)
    alnum = "[a-z|A-Z|0-9]"

    return [
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["PROVINSI"]],
                max_distances=configs["provinsi"]["max_distances"],
                min_accuracies=configs["provinsi"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum]],
                alias_names=["PROVINSI"],
            ),
            evaluators=[eval_province],
            multi_line_value=False,
            alias_names=["PROVINSI"],
            tolerant_not_exists=configs["provinsi"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_line_regex,
            extractor_args=dict(alias_names=["KABUPATEN/KOTA"]),
            evaluators=[eval_city],
            multi_line_value=False,
            alias_names=["KABUPATEN/KOTA"],
            tolerant_not_exists=configs["kabupatenkota"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["NIK"]],
                max_distances=configs["nik"]["max_distances"],
                min_accuracies=configs["nik"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum, "[\\:]"]],
                alias_names=["NIK"],
            ),
            evaluators=[eval_nik],
            multi_line_value=False,
            alias_names=["NIK"],
            tolerant_not_exists=[False],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["Nama"]],
                max_distances=configs["nama"]["max_distances"],
                min_accuracies=configs["nama"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum]],
                alias_names=["Nama"],
            ),
            evaluators=[repair_to_letters],
            multi_line_value=True,
            alias_names=["Nama"],
            tolerant_not_exists=configs["nama"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=["Tempat Tgl Lahir".split(" ")],
                max_distances=configs["tempattgllahir"]["max_distances"],
                min_accuracies=configs["tempattgllahir"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[["[a-z|A-Z|\\/|0-9]"] * 3],
                alias_names=["Tempat/Tgl Lahir"],
                wo_space=True,
            ),
            evaluators=[eval_birth],
            multi_line_value=False,
            alias_names=["Tempat/Tgl Lahir"],
            tolerant_not_exists=configs["tempattgllahir"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=["jenis kelamin".split(" "), "gol darah".split(" ")],
                max_distances=configs["jeniskelamin|goldarah"]["max_distances"],
                min_accuracies=configs["jeniskelamin|goldarah"]["min_accuracies"],
                separators=[":", "."],
                re_chars_filter=[["[a-z|A-Z|\\-|0-9]"] * 3, ["[a-z|A-Z|\\-|0-9]"] * 3],
                alias_names=["Jenis kelamin", "GolDarah"],
                line_preprocessing=str.lower,
                wo_space=True,
            ),
            evaluators=[eval_gender, eval_blood],
            multi_line_value=False,
            alias_names=["Jenis kelamin", "GolDarah"],
            tolerant_not_exists=configs["jeniskelamin|goldarah"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["Alamat"]],
                max_distances=configs["alamat"]["max_distances"],
                min_accuracies=configs["alamat"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum]],
                alias_names=["Alamat"],
            ),
            evaluators=[lambda x: [True, repair_no_number(repair_to_letters(x)[1])]],
            multi_line_value=True,
            alias_names=["Alamat"],
            tolerant_not_exists=configs["alamat"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["RTRW"]],
                max_distances=configs["rtrw"]["max_distances"],
                min_accuracies=configs["rtrw"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[["[a-z|A-Z|0-9|\\=|\\/]"], ["[a-z|A-Z|0-9|\\=|\\/]"]],
                alias_names=["RT/RW"],
                line_preprocessing=str.upper,
                wo_space=True,
            ),
            evaluators=[eval_rtrw],
            multi_line_value=True,
            alias_names=["RT/RW"],
            tolerant_not_exists=configs["rtrw"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=["KelDesa".split(" ")],
                max_distances=configs["keldesa"]["max_distances"],
                min_accuracies=configs["keldesa"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum] * 3],
                alias_names=["Kel/Desa"],
            ),
            evaluators=[lambda x: repair_to_letters(x.upper())],
            multi_line_value=False,
            alias_names=["Kel/Desa"],
            tolerant_not_exists=configs["keldesa"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["Kecamatan"]],
                max_distances=configs["kecamatan"]["max_distances"],
                min_accuracies=configs["kecamatan"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum]],
                alias_names=["Kecamatan"],
            ),
            evaluators=[repair_to_letters],
            multi_line_value=True,
            alias_names=["Kecamatan"],
            tolerant_not_exists=configs["kecamatan"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["Agama"]],
                max_distances=configs["agama"]["max_distances"],
                min_accuracies=configs["agama"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum]],
                alias_names=["Agama"],
            ),
            evaluators=[eval_religion],
            multi_line_value=True,
            alias_names=["Agama"],
            tolerant_not_exists=configs["agama"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=["Status Perkawinan".split(" ")],
                max_distances=configs["statusperkawinan"]["max_distances"],
                min_accuracies=configs["statusperkawinan"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[["[a-z|A-Z|\\/|0-9]"] * 2],
                alias_names=["Status Perkawinan"],
            ),
            evaluators=[eval_marital],
            multi_line_value=False,
            alias_names=["Status Perkawinan"],
            tolerant_not_exists=configs["statusperkawinan"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["Pekerjaan"]],
                max_distances=configs["pekerjaan"]["max_distances"],
                min_accuracies=configs["pekerjaan"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum]],
                alias_names=["Pekerjaan"],
            ),
            evaluators=[eval_job],
            multi_line_value=True,
            alias_names=["Pekerjaan"],
            tolerant_not_exists=configs["pekerjaan"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=[["Kewarganegaraan"]],
                max_distances=configs["kewarganegaraan"]["max_distances"],
                min_accuracies=configs["kewarganegaraan"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[[alnum]],
                alias_names=["Kewarganegaraan"],
            ),
            evaluators=[eval_citizenship],
            multi_line_value=True,
            alias_names=["Kewarganegaraan"],
            tolerant_not_exists=configs["kewarganegaraan"]["tolerant_not_exists"],
        ),
        dict(
            extractor=match_keys_in_line,
            extractor_args=dict(
                key_str_list_list=["Berlaku Hingga".split(" ")],
                max_distances=configs["berlakuhingga"]["max_distances"],
                min_accuracies=configs["berlakuhingga"]["min_accuracies"],
                separators=[":"],
                re_chars_filter=[["[a-z|A-Z|\\/|0-9]"] * 2],
                alias_names=["Berlaku Hingga"],
                wo_space=True,
            ),
            evaluators=[eval_valid_until],
            multi_line_value=False,
            alias_names=["Berlaku Hingga"],
            tolerant_not_exists=configs["berlakuhingga"]["tolerant_not_exists"],
        ),
    ]


def _text_path_nik_spec(configs):
    """The extra NIK spec the text path inserts at index 2 (parsers.py:86)."""
    return dict(
        extractor=match_keys_in_line,
        extractor_args=dict(
            key_str_list_list=[["NIK"]],
            max_distances=_copy_config(configs["nik"]["max_distances"]),
            min_accuracies=_copy_config(configs["nik"]["min_accuracies"]),
            separators=[":"],
            re_chars_filter=[["[a-z|A-Z|0-9]", "[\\:]"]],
            alias_names=["NIK"],
        ),
        evaluators=[eval_nik],
        multi_line_value=False,
        alias_names=["NIK"],
        tolerant_not_exists=_copy_config(configs["nik"]["tolerant_not_exists"]),
    )


def parse_document(
    doc_str,
    configs=None,
    output_orders=None,
    result_orders=None,
    use_final_evaluator=True,
    warning=None,
):
    """Text-path entry point == reference ``parse_ktp(ktp_str=...)``.

    ``warning`` is engine-supplied (the reference computes image-quality
    warnings; the web-page analog — payload-quality predicates — is computed
    by the HTML stage and passed in; defaults to {}).
    """
    if configs is None:
        configs = DEFAULT_FIELD_CONFIG
    if output_orders is None:
        output_orders = OUTPUT_ORDERS
    if result_orders is None:
        result_orders = RESULT_ORDERS

    specs = build_ktp_specs(configs)
    specs.insert(2, _text_path_nik_spec(configs))

    final_evaluator = final_evaluate_ktp if use_final_evaluator else (lambda x: x)

    result = blend_parsers(
        doc_parsers={sweep_document: {"doc_str": doc_str, "to_extracts": specs}},
        final_evaluator=final_evaluator,
    )
    result["warning"] = {} if warning is None else warning
    result["result"] = {k: result["result"][k] for k in result_orders if k in result["result"]}
    return {k: result[k] for k in output_orders if k in result}


def _rescan_nik_spec():
    """The focused NIK re-scan spec of the blended entry point
    (reference ``to_extracts_ktp_nik``, parsers.py:63-65)."""
    return dict(
        extractor=match_line_regex,
        extractor_args=dict(alias_names=["NIK_1"], pattern=r".*"),
        evaluators=[eval_nik],
        multi_line_value=False,
        alias_names=["NIK_1"],
        tolerant_not_exists=[True],
        tess_config="",
    )


def parse_document_blended(
    doc_str,
    configs=None,
    output_orders=None,
    result_orders=None,
    warning=None,
):
    """Two-parser blended entry == reference ``parse_ktp`` image-path
    STRUCTURE (parsers.py:68-96) applied to a text payload: the ordered
    field sweep PLUS the multi-hit NIK_1 re-scan, merged first-writer-wins,
    then the cross-field final evaluator."""
    if configs is None:
        configs = DEFAULT_FIELD_CONFIG
    if output_orders is None:
        output_orders = OUTPUT_ORDERS
    if result_orders is None:
        result_orders = RESULT_ORDERS

    specs = build_ktp_specs(configs)
    result = blend_parsers(
        doc_parsers={
            sweep_document: {"to_extracts": specs},
            scan_document_all: {"spec": [_rescan_nik_spec()]},
        },
        final_evaluator=final_evaluate_ktp,
        doc_str=doc_str,
    )
    result["warning"] = {} if warning is None else warning
    result["result"] = {k: result["result"][k] for k in result_orders if k in result["result"]}
    return {k: result[k] for k in output_orders if k in result}


def parse_document_boxorder(
    blocks,
    configs=None,
    result_orders=None,
    keep_looking=False,
    warning=None,
):
    """Block-order entry point == reference ``parse_doc_new0``
    (/root/reference/ocrfw/postprocessing.py:546-663) applied to the graft's
    DOM blocks: the geometry-driven second physical plan, where a box is one
    htmlcore block's text in document order.  Same spec list as the text
    path (incl. the index-2 NIK insert) so the two parsers differ only in
    sweep order/consumption semantics."""
    if configs is None:
        configs = DEFAULT_FIELD_CONFIG
    if result_orders is None:
        result_orders = RESULT_ORDERS

    specs = build_ktp_specs(configs)
    specs.insert(2, _text_path_nik_spec(configs))
    # Box-order profile: parse_doc_new0 is never invoked by the reference
    # (dead code — no canonical spec list exists for it), and its
    # failing-spec semantics is ABORT-the-document rather than the line
    # sweep's record-and-continue.  The line path's hardcoded must-exist NIK
    # (parsers.py:35, duplicated at index 3 here) would abort every noisy
    # document, so this profile uses the config-driven tolerance for BOTH
    # NIK specs; everything else keeps its configured must-exist flags.
    specs[3]["tolerant_not_exists"] = _copy_config(configs["nik"]["tolerant_not_exists"])

    result = sweep_blocks(
        blocks, specs, final_evaluator=final_evaluate_ktp, keep_looking=keep_looking
    )
    # the early-failure echo carries the spec dict (function objects) — not
    # serializable and not byte-stable; the parity tests exercise it on the
    # raw sweep_blocks instead
    result.pop("to extracts", None)
    result.pop("line_result", None)
    result["warning"] = {} if warning is None else warning
    if "result" in result:
        result["result"] = {
            k: result["result"][k] for k in result_orders if k in result["result"]
        }
    return result


def serialize_result(parsed: dict) -> str:
    """Canonical byte-stable serialization (reference ocrfw/ktp.py:2140:
    ``json.dumps(..., default=str)``)."""
    return json.dumps(parsed, default=str)
