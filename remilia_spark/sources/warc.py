"""WARC source — read Common-Crawl-style WARC segments into the pages table.

The reference fetches live pages (``client.go:103-184``); our engine joins a
``pages`` table instead, and at production scale that table is materialized
from Common Crawl's WARC segments.  This module is the ingest connector:

    pages = read_warc(spark, "s3a://commoncrawl/crawl-data/.../warc/*.warc.gz")

Spark-first design
------------------
* **One WARC file = one task.** WARC segments are (multi-member) gzip, which
  is not block-splittable, so per-file parallelism is the correct unit — a
  Common Crawl snapshot ships ~72k segment files of ~1 GB each, far more
  files than executors on any real cluster, so the scan saturates without
  splitting.  We use Spark's ``binaryFile`` source (whole file per row) and
  parse with ``mapInPandas`` (Arrow-batched, never per-row Python).
* **Streaming record parse.** The parser walks records sequentially and
  *yields* one output batch per input file, so peak memory per task is
  one decompressed segment + one Arrow batch — the same envelope a 1 GB
  segment needs anyway.
* **Only ``WARC-Type: response`` records** become pages (request/metadata/
  warcinfo records are skipped), matching how CC-derived corpora are built.
* ``text``/``lang`` land NULL — extraction is the engine's parse stage
  (``extract.py``), not the connector's job; keeping the connector dumb
  preserves the byte-identical-text invariant in exactly one place.

The writer half (``warc_bytes``) emits spec-shaped WARC/1.0 bytes — used by
tests to round-trip fixtures, and usable as an egress encoder.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
from collections.abc import Iterable, Iterator

import pandas as pd

# Output schema == pages schema (BASELINE.json input_hint).
WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_CRLF = b"\r\n"


def _split_headers(block: bytes) -> dict[bytes, bytes]:
    """Parse a WARC or HTTP header block (first line skipped by caller when
    it's a version/status line).  Tolerates LF-only line endings."""
    headers: dict[bytes, bytes] = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — WARC .gz files are
    one gzip member per record, concatenated.  ``zlib`` with ``wbits=31``
    decodes exactly one member and reports the remainder in ``unused_data``."""
    import zlib

    out = io.BytesIO()
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(rest))
        out.write(d.flush())
        nxt = d.unused_data
        if len(nxt) >= len(rest):  # no progress: malformed trailer, stop
            break
        rest = nxt
    return out.getvalue()


def parse_warc_records(data: bytes) -> Iterator[tuple[str, dt.datetime, bytes]]:
    """Yield ``(url, warc_ts, html)`` for each ``WARC-Type: response`` record.

    Pure function over bytes — unit-testable without Spark, and the exact
    body the Spark task runs.  The HTTP status line + headers inside the
    record payload are stripped; ``html`` is the raw response body bytes.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (spec: two CRLFs between records)
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        lf_end = data.find(b"\n\n", pos)
        if hdr_end == -1 or (lf_end != -1 and lf_end < hdr_end):
            hdr_end, sep = lf_end, 2
        if hdr_end == -1:
            break
        head = data[pos:hdr_end]
        if not head.startswith(b"WARC/"):
            break  # not a record boundary: malformed tail, stop cleanly
        headers = _split_headers(head.split(b"\n", 1)[1] if b"\n" in head else b"")
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        body = data[hdr_end + sep: hdr_end + sep + length]
        pos = hdr_end + sep + length
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        raw_ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        ts = _parse_warc_date(raw_ts)
        if not uri or ts is None:
            continue
        # payload is an HTTP response: strip status line + headers
        http_end = body.find(b"\r\n\r\n")
        hsep = 4
        lf2 = body.find(b"\n\n")
        if http_end == -1 or (lf2 != -1 and lf2 < http_end):
            http_end, hsep = lf2, 2
        html = body[http_end + hsep:] if http_end != -1 else body
        yield uri, ts, html


def _parse_warc_date(raw: str) -> dt.datetime | None:
    """WARC-Date is ISO 8601 UTC (``2024-08-07T00:00:00Z``); return a naive
    UTC datetime to match the corpus's timestamp convention."""
    if not raw:
        return None
    try:
        d = dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is not None:
        d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return d


def read_warc(spark, path: str, recursive: bool = False):
    """Read WARC segment file(s) into a pages DataFrame.

    ``path`` may be a file, directory, or glob; ``.warc`` and ``.warc.gz``
    both work (gzip sniffed by magic bytes, not extension).  At cluster
    scale pass the segment listing directly — parallelism is per file.
    """
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path).select("content")

    def _parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(parse_warc_records(bytes(blob)))
                if not rows:
                    continue
                out = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
                out["warc_ts"] = out["warc_ts"].astype("datetime64[us]")
                out["text"] = None
                out["lang"] = None
                yield out[["url", "warc_ts", "html", "text", "lang"]]

    return files.mapInPandas(_parse, schema=WARC_PAGES_SCHEMA)


def warc_bytes(records: Iterable[tuple[str, dt.datetime, bytes]],
               gzip_members: bool = False) -> bytes:
    """Encode ``(url, ts, html)`` records as WARC/1.0 response records.

    ``gzip_members=True`` emits one gzip member per record (the Common
    Crawl on-disk layout).  Deterministic: equal input → identical bytes.
    """
    out = io.BytesIO()
    for url, ts, html in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
                + html)
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF +
            b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + _CRLF +
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF
        )
        rec = head + http + _CRLF + _CRLF
        out.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
    return out.getvalue()


# ---------------------------------------------------------------------------
# WET — Common Crawl's derived extracted-text format (WARC/1.0 `conversion`
# records, text/plain payload).  The engine's results table (url, text) IS
# the content of a WET segment; these functions are the egress encoder, the
# matching parser, and the distributed reader — so a corpus crawled here can
# feed any WET-consuming pipeline (CCNet, Dolma, ...) unchanged, and WET
# segments published by Common Crawl can seed a text-only datapipe run
# without the WARC/html step.
# ---------------------------------------------------------------------------

WET_SCHEMA = "url string, warc_ts timestamp, text string"


def wet_bytes(records: Iterable[tuple[str, dt.datetime, str]],
              gzip_members: bool = False) -> bytes:
    """Encode ``(url, ts, text)`` as WARC/1.0 ``conversion`` records (WET).

    ``gzip_members=True`` emits one gzip member per record (the Common
    Crawl on-disk layout).  Deterministic: equal input → identical bytes.
    """
    out = io.BytesIO()
    for url, ts, text in records:
        payload = text.encode("utf-8")
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF +
            b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
            + _CRLF +
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(payload)).encode() + _CRLF + _CRLF
        )
        rec = head + payload + _CRLF + _CRLF
        out.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
    return out.getvalue()


def parse_wet_records(data: bytes) -> Iterator[tuple[str, dt.datetime, str]]:
    """Yield ``(url, warc_ts, text)`` per ``WARC-Type: conversion`` record.

    Same record walk as ``parse_warc_records`` (gzip sniff, CRLF/LF
    tolerance, malformed-tail stop) but the payload is the text itself —
    no HTTP envelope to strip.  warcinfo/other records skip.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        lf_end = data.find(b"\n\n", pos)
        if hdr_end == -1 or (lf_end != -1 and lf_end < hdr_end):
            hdr_end, sep = lf_end, 2
        if hdr_end == -1:
            break
        head = data[pos:hdr_end]
        if not head.startswith(b"WARC/"):
            break
        headers = _split_headers(
            head.split(b"\n", 1)[1] if b"\n" in head else b"")
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        body = data[hdr_end + sep: hdr_end + sep + length]
        pos = hdr_end + sep + length
        if headers.get(b"warc-type") != b"conversion":
            continue
        uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = _parse_warc_date(
            headers.get(b"warc-date", b"").decode("ascii", "replace"))
        if not uri or ts is None:
            continue
        yield uri, ts, body.decode("utf-8", "replace")


def read_wet(spark, path: str, recursive: bool = False):
    """Read WET segment file(s) into ``(url, warc_ts, text)``.

    Same scan shape as ``read_warc``: one (non-splittable gzip) segment
    per task via ``binaryFile`` + mapInPandas — a CC snapshot's ~72k WET
    files outnumber any cluster's executors, so per-file parallelism
    saturates.
    """
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path).select("content")

    def _parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(parse_wet_records(bytes(blob)))
                if not rows:
                    continue
                out = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
                out["warc_ts"] = out["warc_ts"].astype("datetime64[us]")
                yield out

    return files.mapInPandas(_parse, schema=WET_SCHEMA)


def wet_segments(results, ts: dt.datetime,
                 records_per_segment: int = 10_000,
                 num_partitions: int = 32, cleanup: list | None = None):
    """Pack a results table ``(url, text)`` into WET segment blobs.

    Returns ``(segment_id long, n_records long, wet_gz binary)`` — one row
    per segment, records URL-sorted within and across segments via the
    engine's range-partitioned ``global_rank`` (never a one-task sort), so
    equal input yields byte-identical segments on any cluster size.  The
    caller lands the blobs (object-store put per row / binary sink);
    ``ts`` stamps every record (WET's conversion date), passed explicitly
    to keep the bytes deterministic.

    Scale: only (url, text) rows shuffle, each exactly once, grouped in
    ``records_per_segment`` chunks — segment build is applyInPandas over
    groups of bounded size, peak memory one segment per task.
    """
    from pyspark.sql import functions as F

    from remilia_spark.ranking import global_rank

    ranked = global_rank(results.select("url", "text"), keys=["url"],
                         out_col="_r", num_partitions=num_partitions,
                         cleanup=cleanup)
    ranked = ranked.withColumn(
        "segment_id", F.expr(f"_r div {int(records_per_segment)}"))

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_r", kind="mergesort")
        blob = wet_bytes(
            [(u, ts, t if t is not None else "")
             for u, t in zip(pdf["url"], pdf["text"])],
            gzip_members=True)
        return pd.DataFrame({"segment_id": [key[0]],
                             "n_records": [len(pdf)],
                             "wet_gz": [blob]})

    return ranked.groupBy("segment_id").applyInPandas(
        build, schema="segment_id long, n_records long, wet_gz binary")
