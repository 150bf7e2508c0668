"""WARC (ISO 28500) source — the Common-Crawl interchange format.

The engine's canonical page store is the Iceberg-style ``pages`` table
(url, warc_ts, html, text, lang), but real crawl corpora arrive as WARC
files: length-delimited records, each a small header block plus an HTTP
response envelope around the payload. This module gives the engine a
real ingest edge for that format:

- :func:`warc_bytes_of` — serialize (url, ts, html) records into one
  spec-shaped WARC blob (also the test fixture generator);
- :func:`parse_warc_bytes` — the inverse: walk a blob record by record
  using Content-Length (the only robust framing — payloads may contain
  anything, including things that look like record headers), strip the
  HTTP envelope, return (url, warc_ts, html) dicts; tolerant of records
  of other WARC-Types (warcinfo, request — skipped) and of a trailing
  truncated record (dropped, counted);
- :func:`read_warc` — the distributed reader: ``binaryFile`` scan →
  ``mapInPandas`` parse → rows.

Scale shape: WARC files don't split (records are length-framed with no
sync markers), so one file = one task — exactly how Common Crawl is laid
out (~1 GiB per file, tens of thousands of files per crawl: parallelism
comes from file count, not intra-file splits). The parser is a pure
executor-side Arrow batch op; payload bytes go straight from the file
buffer into the html column without driver contact. ``.warc.gz`` is
handled transparently (member-concatenated gzip, the Common-Crawl
convention, via stdlib zlib loop).

Reference parity: the engine's crawl loop stores what crawld fetches
(crawld.go fetch loop); WARC in/out makes those stores interchangeable
with the public crawl ecosystem.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

CRLF = b"\r\n"

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def _http_envelope(html: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: text/html; charset=utf-8" + CRLF
        + b"Content-Length: " + str(len(html)).encode() + CRLF
        + CRLF
        + html
    )


def _record(url: str, ts_iso: str, html: bytes) -> bytes:
    body = _http_envelope(html)
    head = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Target-URI: " + url.encode() + CRLF
        + b"WARC-Date: " + ts_iso.encode() + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + b"Content-Length: " + str(len(body)).encode() + CRLF
        + CRLF
    )
    return head + body + CRLF + CRLF


def warc_bytes_of(records: list[tuple[str, "pd.Timestamp", bytes]]) -> bytes:
    """Serialize (url, warc_ts, html) tuples into one WARC/1.0 blob
    (records in input order, each with a response HTTP envelope)."""
    out = []
    for url, ts, html in records:
        ts = pd.Timestamp(ts)
        if ts.tzinfo is None:
            ts = ts.tz_localize("UTC")
        iso = ts.tz_convert("UTC").strftime("%Y-%m-%dT%H:%M:%SZ")
        out.append(_record(url, iso, bytes(html)))
    return b"".join(out)


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress member-concatenated gzip (one member per record, the
    Common-Crawl convention) into one plain stream."""
    out, pos = [], 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(blob[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(blob) - len(tail)
    return b"".join(out)


def parse_warc_bytes(blob: bytes) -> tuple[list[dict], int]:
    """Parse one WARC blob. Returns ``(records, n_skipped)`` where each
    record is ``{"url", "warc_ts", "html"}`` from WARC-Type: response
    entries; non-response records and a trailing truncated record are
    skipped (counted). Framing walks Content-Length exactly — payload
    bytes are never scanned for markers."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    records: list[dict] = []
    skipped = 0
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while pos < n and blob[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = blob.find(CRLF + CRLF, pos)
        if hdr_end < 0 or not blob.startswith(b"WARC/", pos):
            skipped += 1
            break  # not a record header — trailing garbage
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            skipped += 1
            break
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            skipped += 1  # truncated final record
            break
        if headers.get("warc-type") == "response":
            body = blob[body_start:body_end]
            http_end = body.find(CRLF + CRLF)
            html = body[http_end + 4 :] if http_end >= 0 else body
            records.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "warc_ts": pd.Timestamp(headers.get("warc-date")),
                    "html": html,
                }
            )
        else:
            skipped += 1
        pos = body_end
    return records, skipped


def read_warc(spark, path: str):
    """Distributed WARC ingest: ``binaryFile`` scan (one file per task —
    WARC's own parallelism unit) → Arrow-batched parse → (url, warc_ts,
    html) rows, the pages-table ingest shape. Non-response/truncated
    records are dropped executor-side."""
    from crawld_spark.shiplib import ensure_shipped

    ensure_shipped(spark)

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for blob in b["content"]:
                recs, _ = parse_warc_bytes(bytes(blob))
                rows.extend(recs)
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html"]
            )

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def read_warc_stream(spark, path: str, checkpoint: str | None = None):
    """Streaming WARC ingest: the file-stream source watches ``path`` for
    new ``.warc`` / ``.warc.gz`` files (the shape of a live crawl dropping
    finished segments) and each micro-batch parses only the newly arrived
    files — same Arrow-batched parser, same output schema as
    :func:`read_warc`, so the two are drop-in interchangeable and parity
    is testable (tests/test_streaming.py::TestWarcStream). Returns an
    unstarted streaming DataFrame; pair with ``availableNow`` to drain a
    static directory exactly once."""
    from crawld_spark.shiplib import ensure_shipped

    ensure_shipped(spark)

    files = (
        spark.readStream.format("binaryFile")
        # the file-stream source requires the (fixed) binaryFile schema
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
        .select("content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for blob in b["content"]:
                recs, _ = parse_warc_bytes(bytes(blob))
                rows.extend(recs)
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.mapInPandas(parse, schema=WARC_SCHEMA)
