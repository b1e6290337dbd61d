"""Dictionary sources: build the fuzzy-join build sides from raw files.

Reference equivalents (SURVEY.md §2a):
- ``build_admin_tree``  == ``generate_prov_city_kec_data``
  (/root/reference/ocrfw/ktp.py:55-136): a ';'-separated CSV of
  (no, code, area) rows where the code depth (1/2/3 comma-or-dot-separated
  parts) nests province -> city -> kecamatan; emits the same
  ``{prov_code: [name, {city_code: [name, {kec_code: [name]}]}]}`` tree
  plus the three name lists.  The reference's OCR-damage anomaly handling
  (multi-line codes, nan rows) is reproduced for well-formed and
  blank/nan rows; its ``KAB`` -> ``KABUPATEN`` city-name expansion is kept.
- ``load_line_list``    == countries.txt / ktp_jobs.txt loading
  (/root/reference/ocrfw/ktp.py:156,162): one entry per line, optional
  '|'-separated column selection, whitespace-stripped.

At runtime these stay driver-side and reach executors as closure-captured
constants (a few KB) — the broadcast-variable pattern for fuzzy-join build
sides.
"""

from __future__ import annotations

import re


def build_admin_tree(csv_text: str, sep: str = ";") -> dict:
    """Parse (no; code; area) CSV rows into the nested admin-area tree."""
    prov_city_kec: dict = {}
    provinces: list[str] = []
    cities: list[str] = []
    kecamatans: list[str] = []
    current_prov = None
    current_city = None

    for raw in csv_text.splitlines():
        if not raw.strip():
            continue
        parts = raw.split(sep)
        if len(parts) < 3:
            continue
        code_field = parts[1].strip()
        name = "".join(re.findall(r"[a-z|A-Z|\s]", parts[2])).strip()
        if not code_field or code_field.lower() == "nan" or not name:
            continue
        code_parts = code_field.replace(" ", "").replace(".", ",").split(",")
        if not all(re.match(r"\d+", c) for c in code_parts):
            continue
        if len(code_parts) == 1:
            prov_city_kec[code_parts[0]] = [name, {}]
            current_prov = code_parts[0]
            provinces.append(name)
        elif len(code_parts) == 2 and current_prov is not None:
            prov_city_kec[current_prov][1][code_parts[1]] = [name, {}]
            current_city = code_parts[1]
            cities.append(name.replace("KAB", "KABUPATEN", 1))
        elif len(code_parts) == 3 and current_prov is not None and current_city is not None:
            prov_city_kec[current_prov][1][current_city][1][code_parts[2]] = [name]
            kecamatans.append(name)

    return {
        "prov_city_kec": prov_city_kec,
        "provincies_list": provinces,
        "cities_list": cities,
        "kec_list": kecamatans,
    }


def load_line_list(text: str, column: int | None = None, column_sep: str = "|") -> list[str]:
    """One entry per non-empty line; optional '|' column selection."""
    out = []
    for line in text.split("\n"):
        if not line.strip():
            continue
        if column is not None:
            fields = line.strip().split(column_sep)
            if column < len(fields):
                out.append(fields[column].strip())
        else:
            out.append(line.strip())
    return out
