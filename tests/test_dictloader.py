"""Dictionary-source loader tests (admin-area CSV tree + line lists)."""

from universal_key_value_based_text_processing_with_ocr_spark.sources.dictloader import (
    build_admin_tree,
    load_line_list,
)

CSV = """1;11;ACEH 123
2;11,01;KAB ACEH SELATAN
3;11,01,01;BAKONGAN
4;11,01,02;KLUET UTARA
5;12;SUMATERA UTARA
6;12.01;KAB TAPANULI TENGAH
7;nan;garbage row
8;;another garbage
9;32;JAWA BARAT
"""


def test_build_admin_tree_nesting_and_lists():
    out = build_admin_tree(CSV)
    tree = out["prov_city_kec"]
    assert set(tree) == {"11", "12", "32"}
    assert tree["11"][0] == "ACEH"  # digits stripped from the name
    assert tree["11"][1]["01"][0] == "KAB ACEH SELATAN"
    assert set(tree["11"][1]["01"][1]) == {"01", "02"}
    assert tree["12"][1]["01"][0] == "KAB TAPANULI TENGAH"  # '.' code sep
    assert out["provincies_list"] == ["ACEH", "SUMATERA UTARA", "JAWA BARAT"]
    assert out["cities_list"] == ["KABUPATEN ACEH SELATAN", "KABUPATEN TAPANULI TENGAH"]
    assert out["kec_list"] == ["BAKONGAN", "KLUET UTARA"]


def test_tree_feeds_nik_prefix_probe():
    tree = build_admin_tree(CSV)["prov_city_kec"]
    assert "32" in tree and "99" not in tree


def test_load_line_list_plain_and_columns():
    assert load_line_list("a\n b \n\nc\n") == ["a", "b", "c"]
    assert load_line_list("1|INDONESIA\n2|MALAYSIA\n", column=1) == ["INDONESIA", "MALAYSIA"]
