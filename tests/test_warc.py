"""WARC source tests: hand-written byte fixtures (writer-independent),
hostile-input containment, gzip member handling, writer round-trip, and
the distributed scan (SURVEY.md §5 model: known-answer + fuzz + Spark)."""

from __future__ import annotations

import gzip

import pytest

from universal_key_value_based_text_processing_with_ocr_spark.sources import warc as W
from tests.test_spark_pipeline import spark  # noqa: F401  (session fixture)

# A WARC record written BY HAND (never touched our writer) — catches any
# writer/parser bug symmetry.  Uses lowercase header names and an extra
# unknown header, both of which the spec allows.
HAND_WARC = (
    b"WARC/1.0\r\n"
    b"warc-type: response\r\n"
    b"WARC-Target-URI: https://example.org/a\r\n"
    b"WARC-Date: 2020-05-06T07:08:09Z\r\n"
    b"X-Unknown: keep-calm\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"Content-Length: 55\r\n"
    b"\r\n"
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>\r\n"
    b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"WARC-Type: request\r\n"
    b"WARC-Target-URI: https://example.org/a\r\n"
    b"Content-Length: 4\r\n"
    b"\r\n"
    b"GET \r\n\r\n"
)


def test_hand_written_records_parse():
    recs = list(W.iter_warc_records(HAND_WARC))
    assert len(recs) == 2
    r0, r1 = recs
    assert r0["headers"]["warc-type"] == "response"
    assert r0["headers"]["warc-target-uri"] == "https://example.org/a"
    assert r0["offset"] == 0
    http = W.parse_http_response(r0["payload"])
    assert http["status"] == 200
    assert http["content_type"] == "text/html"
    # trailing \r\n inside the declared Content-Length belongs to the body
    assert http["body"] == b"<p>hi</p>\r\n"
    assert r1["headers"]["warc-type"] == "request"
    assert r1["payload"] == b"GET "


def test_hostile_streams_contained():
    # truncated payload: declared length exceeds remaining bytes
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    assert list(W.iter_warc_records(bad)) == []
    # non-integer length stops the walk but keeps prior records
    good_then_bad = HAND_WARC + b"WARC/1.0\r\nContent-Length: NaN\r\n\r\n"
    assert len(list(W.iter_warc_records(good_then_bad))) == 2
    # missing version magic
    assert list(W.iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")) == []
    # negative length
    assert list(W.iter_warc_records(b"WARC/1.0\r\nContent-Length: -1\r\n\r\n")) == []
    # garbage gzip magic
    with pytest.raises(ValueError):
        W._inflate_if_gzip(b"\x1f\x8b\x00\x00garbage")
    # gzip bomb: tiny compressed, huge inflated -> capped
    bomb = gzip.compress(b"\x00" * 4096, mtime=0)
    with pytest.raises(ValueError):
        W._inflate_if_gzip(bomb, max_bytes=100)


def test_http_degraded_payloads():
    assert W.parse_http_response(b"not http at all") == {
        "status": None,
        "content_type": None,
        "body": b"not http at all",
    }
    # status line present but unparseable status code
    r = W.parse_http_response(b"HTTP/1.1 OK\r\n\r\nbody")
    assert r["status"] is None and r["body"] == b"HTTP/1.1 OK\r\n\r\nbody"


def test_multi_member_gzip_records():
    """Common Crawl layout: one gzip member per record, concatenated."""
    m1 = gzip.compress(HAND_WARC, mtime=0)
    m2 = gzip.compress(HAND_WARC, mtime=0)
    recs = list(W.iter_warc_records(m1 + m2))
    assert len(recs) == 4


def test_writer_roundtrip(tmp_path):
    payload = W.build_http_response("héllo wörld".encode("utf-8"), 200, "OK")
    p = tmp_path / "t.warc.gz"
    n = W.write_warc(
        str(p),
        [{"url": "https://x/1", "date": "2024-01-01T00:00:01Z", "payload": payload}],
        gzip_file=True,
    )
    assert n == 2  # warcinfo + response
    data = p.read_bytes()
    recs = list(W.iter_warc_records(data))
    assert [r["headers"]["warc-type"] for r in recs] == ["warcinfo", "response"]
    http = W.parse_http_response(recs[1]["payload"])
    assert http["body"].decode("utf-8") == "héllo wörld"
    # byte-deterministic across writes (mtime=0; record ids content-derived)
    d2 = tmp_path / "again"
    d2.mkdir()
    p2 = d2 / "t.warc.gz"
    W.write_warc(
        str(p2),
        [{"url": "https://x/1", "date": "2024-01-01T00:00:01Z", "payload": payload}],
        gzip_file=True,
    )
    assert p2.read_bytes() == data


def test_scan_warc_spark(spark, tmp_path):  # noqa: F811
    """End-to-end distributed scan over mixed plain/gzip shards, including
    one hostile file that must be contained without killing the task."""
    for s in range(3):
        recs = [
            {
                "url": f"https://h{s}.example/{i}",
                "date": f"2024-01-01T00:00:{i:02d}Z",
                "payload": W.build_http_response(f"body {s}/{i}".encode(), 200, "OK"),
            }
            for i in range(4)
        ]
        name = f"part-{s}.warc" + (".gz" if s == 1 else "")
        W.write_warc(str(tmp_path / name), recs, gzip_file=s == 1)
    (tmp_path / "part-3.warc").write_bytes(b"\x1f\x8b\x00corrupt-not-gzip")

    df = W.scan_warc(spark, str(tmp_path) + "/part-*", response_only=True)
    rows = df.collect()
    assert len(rows) == 12
    assert all(r.http_status == 200 for r in rows)
    assert sorted(r.payload_text for r in rows)[0] == "body 0/0"
    # all records (warcinfo included) when response_only=False
    assert W.scan_warc(spark, str(tmp_path) + "/part-*").count() == 15


def test_export_wet_roundtrip_spark(spark, tmp_path):  # noqa: F811
    """Distributed WET sink -> scan round-trip: executor-written shards,
    deterministic bytes across runs, empty partitions still write (stale
    layout cannot leak), and unicode/NULL-ish text survives."""
    import pyspark.sql.functions as F

    rows = [
        (f"wet://t/{i}", f"2024-02-02T00:00:{i:02d}Z", f"tëxt {i}\nline2" if i else "")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "url string, date string, text string")
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")

    man = W.export_wet(df, out1, shards=4).collect()
    assert len(man) == 4  # every partition writes, even empty ones
    assert sum(m.n_records for m in man) == 10

    back = W.scan_wet(spark, out1 + "/part-*").orderBy("url").collect()
    assert [r.url for r in back] == sorted(r[0] for r in rows)
    by_url = {r.url: r for r in back}
    assert by_url["wet://t/1"].payload_text == "tëxt 1\nline2"
    assert by_url["wet://t/1"].n_payload_bytes == len("tëxt 1\nline2".encode())
    assert by_url["wet://t/0"].payload_text == ""

    # byte-determinism: a second export of the same frame is identical
    W.export_wet(df, out2, shards=4).count()
    import pathlib

    a_files = sorted(pathlib.Path(out1).iterdir())
    b_files = sorted(pathlib.Path(out2).iterdir())
    assert [f.name for f in a_files] == [f.name for f in b_files]
    assert all(x.read_bytes() == y.read_bytes() for x, y in zip(a_files, b_files))

    # overwrite with a frame that leaves some shards empty: old rows gone
    small = df.filter(F.col("url") == "wet://t/3")
    W.export_wet(small, out1, shards=4).count()
    assert W.scan_wet(spark, out1 + "/part-*").count() == 1
