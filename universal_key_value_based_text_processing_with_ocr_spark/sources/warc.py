"""WARC (Web ARChive, ISO 28500) source: deterministic writer, hardened
record parser, and a distributed Spark scan.

This is the native ingest format of the web-text world (Common Crawl ships
WARC; the reference engine's analogue is its image-file scan feeding the
OCR source, /root/reference/ocrfw/ocr.py:9-44 — here the crawl archive
plays the role of the scanned-document corpus).  The module provides:

- ``write_warc(path, records, gzip_file=False)`` — a WARC/1.0 writer used
  as both the test fixture generator and the archive *sink* (snapshot
  export of a page set).  Deterministic: record ids derive from the target
  URI, no wall clock anywhere.
- ``iter_warc_records(data)`` / ``parse_http_response(payload)`` — a
  bounded, hostile-input-tolerant parser for concatenated WARC records and
  the ``application/http`` response payloads inside them.
- ``scan_warc(spark, path_glob)`` — ``spark.read.format("binaryFile")`` ->
  one narrow ``mapInPandas`` stage that parses each archive into typed
  rows.

Scale notes (the 100 TB shape): WARC archives are *file-granular* — the
format is a byte stream of variable-length records with no internal split
points, so the parallelism unit is the archive file, exactly how
production crawl pipelines schedule it (Common Crawl publishes ~1 GiB
files precisely so that one file ~= one task).  ``binaryFile`` gives
file-level tasks with path/size pushdown and no driver-side listing
bottleneck; each task streams one archive through the parser and emits
typed rows, so the stage is narrow (no shuffle) and fuses with downstream
projections.  Whole-file gzip (the Common Crawl member-per-record variant
included) is sniffed per file and inflated with an output cap, so a
crafted bomb cannot take down an executor.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

# Parser safety caps: a record longer than this (or an archive inflating
# past it) is treated as hostile and parsing of that file stops — the rows
# already parsed are kept, mirroring the extraction stage's per-row error
# containment.
MAX_RECORD_BYTES = 256 * 1024 * 1024
MAX_INFLATED_BYTES = 1 << 30


def _record_id(uri: str, seq: int) -> str:
    """Deterministic WARC-Record-ID (RFC 4122 shape, content-derived)."""
    h = hashlib.md5(f"{uri}#{seq}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def build_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/plain; charset=utf-8",
) -> bytes:
    """Serialise one ``application/http; msgtype=response`` payload."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body


def write_warc(
    path: str,
    records: Iterable[dict],
    gzip_file: bool = False,
    warcinfo: str = "software: ukv-spark-warc-writer/1.0",
) -> int:
    """Write records to one WARC/1.0 archive; returns the record count
    (warcinfo included).

    Each record dict: ``{"url": str, "date": "YYYY-MM-DDThh:mm:ssZ",
    "payload": bytes, "warc_type": "response"}`` (type defaults to
    response; payload is the full HTTP message for response records).
    """
    out = io.BytesIO()

    def emit(warc_type: str, headers: list[tuple[str, str]], payload: bytes) -> None:
        out.write(WARC_VERSION + _CRLF)
        out.write(f"WARC-Type: {warc_type}\r\n".encode("ascii"))
        for k, v in headers:
            out.write(f"{k}: {v}\r\n".encode("ascii"))
        out.write(f"Content-Length: {len(payload)}\r\n".encode("ascii"))
        out.write(_CRLF)
        out.write(payload)
        out.write(_CRLF + _CRLF)

    n = 0
    info_payload = (warcinfo + "\r\n").encode("ascii")
    emit(
        "warcinfo",
        [
            ("WARC-Record-ID", _record_id("warcinfo:" + path.rsplit("/", 1)[-1], 0)),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("Content-Type", "application/warc-fields"),
        ],
        info_payload,
    )
    n += 1
    for rec in records:
        wt = rec.get("warc_type", "response")
        ctype = (
            "application/http; msgtype=response" if wt == "response" else "text/plain"
        )
        emit(
            wt,
            [
                ("WARC-Record-ID", _record_id(rec["url"], n)),
                ("WARC-Date", rec["date"]),
                ("WARC-Target-URI", rec["url"]),
                ("Content-Type", ctype),
            ],
            rec["payload"],
        )
        n += 1

    data = out.getvalue()
    if gzip_file:
        # mtime=0 keeps the archive byte-deterministic across runs
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as fh:
        fh.write(data)
    return n


def _inflate_if_gzip(data: bytes, max_bytes: int = MAX_INFLATED_BYTES) -> bytes:
    """Sniff + inflate whole-file gzip with an output cap.

    Handles multi-member streams (the Common Crawl record-per-member
    layout) by re-feeding unused tail data to a fresh decompressor."""
    if data[:2] != b"\x1f\x8b":
        return data
    chunks: list[bytes] = []
    total = 0
    tail = data
    while tail[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(tail, max_bytes - total + 1)
        except zlib.error as exc:
            raise ValueError(f"bad gzip member: {exc}") from exc
        total += len(chunk)
        if total > max_bytes:
            raise ValueError("inflated archive exceeds cap")
        chunks.append(chunk)
        if not d.eof:
            raise ValueError("truncated gzip member")
        tail = d.unused_data
    return b"".join(chunks)


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"headers": {name_lower: value}, "payload": bytes,
    "offset": int}`` per record from one (possibly gzipped) archive.

    Tolerates hostile input: a malformed version line, non-integer or
    payload-exceeding Content-Length, or an oversized record stops the
    walk at that point (records already parsed are kept) — never an
    exception out of the generator after the gzip stage."""
    data = _inflate_if_gzip(data)
    pos = 0
    end = len(data)
    while pos < end:
        # skip inter-record CRLF padding
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= end:
            return
        if not data[pos : pos + 5] == b"WARC/":
            return
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            return
        offset = pos
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:
            if b":" not in line:
                continue
            k, _, v = line.partition(b":")
            try:
                headers[k.decode("ascii").strip().lower()] = v.decode(
                    "utf-8", "replace"
                ).strip()
            except UnicodeDecodeError:
                continue
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        if clen < 0 or clen > MAX_RECORD_BYTES:
            return
        body_start = hdr_end + len(_HDR_END)
        if body_start + clen > end:
            return
        yield {
            "headers": headers,
            "payload": data[body_start : body_start + clen],
            "offset": offset,
        }
        pos = body_start + clen


def parse_http_response(payload: bytes) -> dict:
    """Split one ``application/http`` response payload into
    ``{"status": int|None, "content_type": str|None, "body": bytes}``.

    A payload that does not parse as HTTP (no status line / no header
    terminator) degrades to status None with the whole payload as body —
    the downstream keeps the bytes rather than dropping the record."""
    hdr_end = payload.find(_HDR_END)
    if hdr_end < 0 or not payload[:5] == b"HTTP/":
        return {"status": None, "content_type": None, "body": payload}
    lines = payload[:hdr_end].split(_CRLF)
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return {"status": None, "content_type": None, "body": payload}
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.decode("ascii", "replace").strip().lower() == "content-type":
            ctype = v.decode("utf-8", "replace").strip()
            break
    return {"status": status, "content_type": ctype, "body": payload[hdr_end + len(_HDR_END) :]}


WARC_SCAN_SCHEMA = (
    "path string, warc_type string, url string, warc_date string, "
    "http_status int, content_type string, n_payload_bytes long, payload_text string, "
    "record_offset long"
)


def scan_warc(spark: SparkSession, path_glob: str, response_only: bool = False) -> DataFrame:
    """Distributed WARC scan: one row per record across all matched files.

    ``binaryFile`` assigns one task per archive (the format's natural
    split unit — see module docstring); the parse is a single narrow
    ``mapInPandas`` stage, so downstream filters/projections fuse onto it
    and nothing shuffles until the first wide operator the caller adds.
    ``payload_text`` is the HTTP body decoded UTF-8 (lossy ``replace`` on
    bad bytes, like the extraction stage's decode fallback); non-response
    records carry their raw payload text.  ``record_offset`` is the byte
    offset of the record's ``WARC/1.0`` line in the (inflated, for
    whole-file-gzip archives) member stream — the field a CDX index stores
    so a reader can seek straight to one record."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    records = list(iter_warc_records(bytes(content)))
                except ValueError:
                    # hostile gzip: contain to this file, emit nothing
                    records = []
                for rec in records:
                    h = rec["headers"]
                    wt = h.get("warc-type", "")
                    if wt == "response":
                        http = parse_http_response(rec["payload"])
                        body, status, ctype = http["body"], http["status"], http["content_type"]
                    else:
                        body, status, ctype = rec["payload"], None, h.get("content-type")
                    if response_only and wt != "response":
                        continue
                    rows.append(
                        (
                            path,
                            wt,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            ctype,
                            len(body),
                            body.decode("utf-8", "replace"),
                            rec["offset"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "warc_type",
                    "url",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "n_payload_bytes",
                    "payload_text",
                    "record_offset",
                ],
            )

    return files.mapInPandas(parse, schema=WARC_SCAN_SCHEMA)


def write_wet(path: str, records: Iterable[dict], gzip_file: bool = False) -> int:
    """Write a WET archive (the Common Crawl *extracted-text* sibling of
    WARC: same container, ``conversion`` records whose payload is the
    plain text).  Each record: ``{"url", "date", "text"}``."""
    return write_warc(
        path,
        (
            {
                "url": r["url"],
                "date": r["date"],
                "payload": (r.get("text") or "").encode("utf-8"),
                "warc_type": "conversion",
            }
            for r in records
        ),
        gzip_file=gzip_file,
        warcinfo="software: ukv-spark-warc-writer/1.0\r\nformat: WET",
    )


def scan_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WET scan -> (url, warc_date, n_payload_bytes,
    payload_text): the conversion records only, same file-granular
    parallelism as ``scan_warc``."""
    return (
        scan_warc(spark, path_glob)
        .filter(F.col("warc_type") == "conversion")
        .select("url", "warc_date", "n_payload_bytes", "payload_text")
    )


EXPORT_MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"


def export_wet(
    df: DataFrame, out_dir: str, shards: int = 8, shard_col: str = "url", gzip_files: bool = True
) -> DataFrame:
    """Distributed WET sink: partition ``df`` (columns url, date, text)
    into ``shards`` archives written from the executors; returns the lazy
    manifest (path, n_records, n_bytes) — run an action on it to commit.

    Scale shape: one archive per partition, written where the data sits —
    no driver collect.  ``out_dir`` must be a filesystem every executor
    can reach (shared mount / fuse; in local mode any dir).  Rows are
    sorted by ``shard_col`` inside each shard and gzip uses mtime=0, so
    re-runs are byte-identical; every partition writes its file even when
    empty, AND task 0 sweeps part files OUTSIDE the expected layout (a
    previous export with more shards, or the other gzip extension), so a
    stale previous layout cannot leak rows into ``scan_wet``'s part-*
    glob."""
    import os

    import pandas as pd
    from pyspark import TaskContext

    ext = ".warc" + (".gz" if gzip_files else "")
    expected = {f"part-{i:05d}{ext}" for i in range(shards)}
    parted = df.repartition(shards, F.col(shard_col)).sortWithinPartitions(shard_col)

    def write_shard(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}{ext}"
        path = os.path.join(out_dir, name)
        records = []
        for pdf in batches:
            for _, row in pdf.iterrows():
                records.append(
                    {"url": row["url"], "date": row["date"], "text": row["text"]}
                )
        os.makedirs(out_dir, exist_ok=True)
        if pid == 0:
            # race-free: stale names are disjoint from every current
            # writer's target, and only task 0 deletes
            for f in os.listdir(out_dir):
                if f.startswith("part-") and f not in expected:
                    try:
                        os.unlink(os.path.join(out_dir, f))
                    except OSError:
                        pass
        n = write_wet(path, records, gzip_file=gzip_files)
        yield pd.DataFrame(
            [(path, n - 1, os.path.getsize(path))],
            columns=["path", "n_records", "n_bytes"],
        )

    return parted.mapInPandas(write_shard, schema=EXPORT_MANIFEST_SCHEMA)
