"""Load the reference implementation (read-only at /root/reference) as a
parity oracle.

The reference is not runnable as shipped (missing nltk/cv2/pytesseract/db and
its data files — SURVEY.md §0), so this harness:
- stubs ``nltk.metrics`` with an INDEPENDENT textbook full-matrix DP (not the
  engine's implementation, to keep distance-function parity non-circular),
- stubs the image-only ``ocr`` / ``preprocessing`` modules with inert
  callables (the text path never invokes them),
- execs ``ocrfw/postprocessing.py`` and ``evaluators.py`` into namespaces and
  injects the engine's frozen dictionaries (the reference's data files are
  absent from its repo),
- rebuilds the reference's ``to_extracts_ktp`` spec list (parsers.py:29-61)
  from those namespaces with the engine's DEFAULT_FIELD_CONFIG, and exposes
  ``ref_parse_document`` == ``parse_ktp(ktp_str=...)`` semantics
  (parsers.py:82-101, minus the image-only warning step which crashes on the
  text path in the reference itself).

Nothing from here ships in the engine; it exists so tests can assert
byte-identical behaviour against the genuine reference code.
"""

from __future__ import annotations

import copy
import sys
import types
from pathlib import Path

REFERENCE_DIR = Path("/root/reference")

_cache = None


def _slow_edit_distance(a, b, substitution_cost=1, transpositions=False):
    """Independent textbook Wagner-Fischer (full matrix)."""
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = d[i - 1][j - 1] + (0 if a[i - 1] == b[j - 1] else substitution_cost)
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, sub)
    return d[m][n]


def _slow_accuracy(reference, test):
    if len(reference) != len(test):
        raise ValueError("Lists must have the same length.")
    return sum(1 for x, y in zip(reference, test) if x == y) / len(reference)


def reference_available() -> bool:
    return (REFERENCE_DIR / "ocrfw" / "postprocessing.py").is_file()


def load_reference():
    """Return (postprocessing_namespace, evaluators_namespace) dicts."""
    global _cache
    if _cache is not None:
        return _cache

    # --- dependency stubs -------------------------------------------------
    nltk = types.ModuleType("nltk")
    metrics = types.ModuleType("nltk.metrics")
    metrics.edit_distance = _slow_edit_distance
    metrics.accuracy = _slow_accuracy
    nltk.metrics = metrics
    sys.modules.setdefault("nltk", nltk)
    sys.modules["nltk.metrics"] = metrics

    ocr_stub = types.ModuleType("ocr")
    ocr_stub.ocr0 = lambda *a, **k: ""
    ocr_stub.ocr2 = lambda *a, **k: ""
    ocr_stub.get_line_boxes = lambda *a, **k: {}
    ocr_stub.CURRENT_PATH = "."
    ocr_stub.ONLY_CONFIG = lambda only="": ""
    sys.modules["ocr"] = ocr_stub

    pre_stub = types.ModuleType("preprocessing")

    def preprocessing3(img, *a, **k):  # identity; name is observable via
        return img  # simple_parse_one_all's model_result keys

    def preprocessing1(img, *a, **k):
        return img

    pre_stub.preprocessing3 = preprocessing3
    pre_stub.preprocessing1 = preprocessing1
    pre_stub.whimg = lambda img, *a, **k: img
    pre_stub.get_warning_image = lambda img, *a, **k: {}
    sys.modules["preprocessing"] = pre_stub

    # --- exec the reference sources ---------------------------------------
    post_ns = {"__name__": "ref_postprocessing"}
    exec(
        compile(
            (REFERENCE_DIR / "ocrfw" / "postprocessing.py").read_text(),
            str(REFERENCE_DIR / "ocrfw" / "postprocessing.py"),
            "exec",
        ),
        post_ns,
    )

    # evaluators.py does `from ocrfw.postprocessing import *`
    ocrfw_pkg = types.ModuleType("ocrfw")
    ocrfw_pkg.__path__ = [str(REFERENCE_DIR / "ocrfw")]
    post_mod = types.ModuleType("ocrfw.postprocessing")
    post_mod.__dict__.update(post_ns)
    sys.modules["ocrfw"] = ocrfw_pkg
    sys.modules["ocrfw.postprocessing"] = post_mod

    eval_ns = {"__name__": "ref_evaluators"}
    exec(
        compile(
            (REFERENCE_DIR / "evaluators.py").read_text(),
            str(REFERENCE_DIR / "evaluators.py"),
            "exec",
        ),
        eval_ns,
    )

    # --- inject the frozen dictionaries (reference data files are absent) -
    from universal_key_value_based_text_processing_with_ocr_spark.kvcore import dictionaries

    eval_ns["PROVINCIES_LIST"] = dictionaries.provinces()
    eval_ns["CITIES_LIST"] = dictionaries.cities()
    eval_ns["JOBS"] = dictionaries.jobs()
    eval_ns["COUNTRIES"] = dictionaries.countries()
    eval_ns["PROV_CITY_KEC"] = dictionaries.prov_city_kec()

    _cache = (post_ns, eval_ns)
    return _cache


def build_reference_specs(configs):
    """Reference ``to_extracts_ktp`` (parsers.py:29-61) over the exec'd
    reference functions with the supplied field config."""
    post, ev = load_reference()
    configs = copy.deepcopy(configs)
    g = post["get_str_keys_values"]
    ga = post["get_all"]
    alnum = "[a-z|A-Z|0-9]"

    return [
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["PROVINSI"]], max_distances=configs["provinsi"]["max_distances"], min_accuracies=configs["provinsi"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum]], alias_names=["PROVINSI"]), evaluators=[ev["provinsi_evaluator"]], multi_line_value=False, alias_names=["PROVINSI"], tolerant_not_exists=configs["provinsi"]["tolerant_not_exists"]),
        dict(extractor=ga, extractor_args=dict(alias_names=["KABUPATEN/KOTA"]), evaluators=[ev["kab_kota_evaluator"]], multi_line_value=False, alias_names=["KABUPATEN/KOTA"], tolerant_not_exists=configs["kabupatenkota"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["NIK"]], max_distances=configs["nik"]["max_distances"], min_accuracies=configs["nik"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum, "[\\:]"]], alias_names=["NIK"]), evaluators=[ev["nik_evaluator"]], multi_line_value=False, alias_names=["NIK"], tolerant_not_exists=[False]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["Nama"]], max_distances=configs["nama"]["max_distances"], min_accuracies=configs["nama"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum]], alias_names=["Nama"]), evaluators=[post["letters_evaluator"]], multi_line_value=True, alias_names=["Nama"], tolerant_not_exists=configs["nama"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=["Tempat Tgl Lahir".split(" ")], max_distances=configs["tempattgllahir"]["max_distances"], min_accuracies=configs["tempattgllahir"]["min_accuracies"], separators=[":"], re_chars_filter=[["[a-z|A-Z|\\/|0-9]"] * 3], alias_names=["Tempat/Tgl Lahir"], wo_space=True), evaluators=[ev["ttl_evaluator"]], multi_line_value=False, alias_names=["Tempat/Tgl Lahir"], tolerant_not_exists=configs["tempattgllahir"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=["jenis kelamin".split(" "), "gol darah".split(" ")], max_distances=configs["jeniskelamin|goldarah"]["max_distances"], min_accuracies=configs["jeniskelamin|goldarah"]["min_accuracies"], separators=[":", "."], re_chars_filter=[["[a-z|A-Z|\\-|0-9]"] * 3, ["[a-z|A-Z|\\-|0-9]"] * 3], alias_names=["Jenis kelamin", "GolDarah"], line_preprocessing=lambda x: x.lower(), wo_space=True), evaluators=[ev["jk_evaluator"], ev["darah_evaluator"]], multi_line_value=False, alias_names=["Jenis kelamin", "GolDarah"], tolerant_not_exists=configs["jeniskelamin|goldarah"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["Alamat"]], max_distances=configs["alamat"]["max_distances"], min_accuracies=configs["alamat"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum]], alias_names=["Alamat"]), evaluators=[lambda x: [True, post["nodigits_typo"](post["letters_evaluator"](x)[1])]], multi_line_value=True, alias_names=["Alamat"], tolerant_not_exists=configs["alamat"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["RTRW"]], max_distances=configs["rtrw"]["max_distances"], min_accuracies=configs["rtrw"]["min_accuracies"], separators=[":"], re_chars_filter=[["[a-z|A-Z|0-9|\\=|\\/]"], ["[a-z|A-Z|0-9|\\=|\\/]"]], alias_names=["RT/RW"], line_preprocessing=lambda x: x.upper(), wo_space=True), evaluators=[ev["rtrw_evaluator"]], multi_line_value=True, alias_names=["RT/RW"], tolerant_not_exists=configs["rtrw"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=["KelDesa".split(" ")], max_distances=configs["keldesa"]["max_distances"], min_accuracies=configs["keldesa"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum] * 3], alias_names=["Kel/Desa"]), evaluators=[lambda x: post["letters_evaluator"](x.upper())], multi_line_value=False, alias_names=["Kel/Desa"], tolerant_not_exists=configs["keldesa"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["Kecamatan"]], max_distances=configs["kecamatan"]["max_distances"], min_accuracies=configs["kecamatan"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum]], alias_names=["Kecamatan"]), evaluators=[post["letters_evaluator"]], multi_line_value=True, alias_names=["Kecamatan"], tolerant_not_exists=configs["kecamatan"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["Agama"]], max_distances=configs["agama"]["max_distances"], min_accuracies=configs["agama"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum]], alias_names=["Agama"]), evaluators=[ev["agama_evaluator"]], multi_line_value=True, alias_names=["Agama"], tolerant_not_exists=configs["agama"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=["Status Perkawinan".split(" ")], max_distances=configs["statusperkawinan"]["max_distances"], min_accuracies=configs["statusperkawinan"]["min_accuracies"], separators=[":"], re_chars_filter=[["[a-z|A-Z|\\/|0-9]"] * 2], alias_names=["Status Perkawinan"]), evaluators=[ev["kawin_evaluator"]], multi_line_value=False, alias_names=["Status Perkawinan"], tolerant_not_exists=configs["statusperkawinan"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["Pekerjaan"]], max_distances=configs["pekerjaan"]["max_distances"], min_accuracies=configs["pekerjaan"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum]], alias_names=["Pekerjaan"]), evaluators=[ev["pekerjaan_evaluator"]], multi_line_value=True, alias_names=["Pekerjaan"], tolerant_not_exists=configs["pekerjaan"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=[["Kewarganegaraan"]], max_distances=configs["kewarganegaraan"]["max_distances"], min_accuracies=configs["kewarganegaraan"]["min_accuracies"], separators=[":"], re_chars_filter=[[alnum]], alias_names=["Kewarganegaraan"]), evaluators=[ev["kn_evaluator"]], multi_line_value=True, alias_names=["Kewarganegaraan"], tolerant_not_exists=configs["kewarganegaraan"]["tolerant_not_exists"]),
        dict(extractor=g, extractor_args=dict(key_str_list_list=["Berlaku Hingga".split(" ")], max_distances=configs["berlakuhingga"]["max_distances"], min_accuracies=configs["berlakuhingga"]["min_accuracies"], separators=[":"], re_chars_filter=[["[a-z|A-Z|\\/|0-9]"] * 2], alias_names=["Berlaku Hingga"], wo_space=True), evaluators=[ev["berlaku_evaluator"]], multi_line_value=False, alias_names=["Berlaku Hingga"], tolerant_not_exists=configs["berlakuhingga"]["tolerant_not_exists"]),
    ]


def ref_parse_document(doc_str, configs, result_orders, output_orders):
    """Reference parse_ktp(ktp_str=...) semantics (parsers.py:82-101),
    minus the image-only ``warning`` step."""
    post, ev = load_reference()
    specs = build_reference_specs(configs)
    specs.insert(
        2,
        dict(
            extractor=post["get_str_keys_values"],
            extractor_args=dict(
                key_str_list_list=[["NIK"]],
                max_distances=copy.deepcopy(configs["nik"]["max_distances"]),
                min_accuracies=copy.deepcopy(configs["nik"]["min_accuracies"]),
                separators=[":"],
                re_chars_filter=[["[a-z|A-Z|0-9]", "[\\:]"]],
                alias_names=["NIK"],
            ),
            evaluators=[ev["nik_evaluator"]],
            multi_line_value=False,
            alias_names=["NIK"],
            tolerant_not_exists=copy.deepcopy(configs["nik"]["tolerant_not_exists"]),
        ),
    )
    result = post["blended_parse_doc"](
        doc_parsers={post["parse_doc"]: {"doc_str": doc_str, "to_extracts": specs}},
        final_evaluator=post["ktp_final_evaluator"],
        img=None,
    )
    result["result"] = {k: result["result"][k] for k in result_orders if k in result["result"]}
    return {k: result[k] for k in output_orders if k in result}
