"""Frozen lookup dictionaries (fuzzy-join build sides).

The reference builds these from external data files that are not shipped in
its repo (/root/reference/ocrfw/ktp.py:50,140-162); the engine freezes a
small deterministic set in ``data/dictionaries.json`` used by both the
oracle and the Spark pipeline (broadcast to executors by closure capture —
they are a few KB).
"""

from __future__ import annotations

import json
from functools import lru_cache


@lru_cache(maxsize=1)
def load() -> dict:
    # importlib.resources is zip-import-safe: the package may reach executors
    # as a --py-files / addPyFile zip, where filesystem paths don't exist.
    from importlib import resources

    data = resources.files(__package__).joinpath("data/dictionaries.json").read_text("utf-8")
    return json.loads(data)


def prov_city_kec() -> dict:
    """Nested {prov_code: [name, {city_code: ...}]} tree; NIK prefix probe."""
    return load()["prov_city_kec"]


def provinces() -> list[str]:
    return load()["provincies_list"]


def cities() -> list[str]:
    return load()["cities_list"]


def jobs() -> list[str]:
    return load()["jobs"]


def countries() -> list[str]:
    return load()["countries"]
