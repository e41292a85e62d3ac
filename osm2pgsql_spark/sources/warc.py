"""WARC (Web ARChive, ISO 28500) reader — the ingest format of
Common Crawl and every large-scale web-crawl training corpus.

Format (public spec, WARC/1.0 and 1.1): each record is a header block
of `Name: value` lines starting with the version line, a blank line,
`Content-Length` bytes of payload, and a trailing CRLFCRLF.  Crawl
archives ship as `.warc.gz` with ONE GZIP MEMBER PER RECORD — the
property that makes the format splittable: a reader can start at any
member boundary.  Response records carry an HTTP message as payload
(status line + headers + body).

Scale shape: files parallelize across executors (one task per file —
the Common Crawl layout is many ~1 GB segment files, so file-level
parallelism IS record-level parallelism at corpus scale); each task
streams its file record-by-record without materializing the archive.
No driver-side parsing; the driver only lists paths.

This is a public-spec reimplementation (no warcio dependency — the
container has none); tests round-trip through the writer below and
pin header parsing, multi-member gzip, and HTTP payload splitting.
"""

from __future__ import annotations

import gzip
import os
import zlib

from pyspark.sql import DataFrame, SparkSession

#: output schema of read_warc
WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, payload binary"
)


def _read_record(stream) -> dict | None:
    """One WARC record from a byte stream positioned at a version
    line; None at EOF.  Leaves the stream after the record's trailing
    CRLFCRLF."""
    # skip any inter-record blank lines
    line = stream.readline()
    while line in (b"\r\n", b"\n"):
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC version line: {line[:40]!r}")
    headers: dict[str, str] = {}
    while True:
        line = stream.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        k, _, v = line.decode("utf-8", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()
    length = int(headers.get("content-length", "0"))
    payload = stream.read(length)
    return {"headers": headers, "payload": payload}


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP message payload;
    (None, None, payload) when it isn't one."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
        if not sep:
            return None, None, payload
    lines = head.split(b"\r\n") if b"\r\n" in head else head.split(b"\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.decode("utf-8", "replace").partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body


class _PullStream:
    """readline/read over a generator of byte chunks — lets the
    record parser pull exactly what it needs without the eager
    readahead of io.BufferedReader (which would trip over a torn
    trailing gzip member before the intact records were parsed)."""

    def __init__(self, gen):
        self._gen = gen
        self._buf = b""
        self._eof = False

    def _fill(self, need: int) -> None:
        while not self._eof and len(self._buf) < need:
            try:
                self._buf += next(self._gen)
            except StopIteration:
                self._eof = True

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line, self._buf = self._buf[: i + 1], self._buf[i + 1:]
                return line
            if self._eof:
                line, self._buf = self._buf, b""
                return line
            self._fill(len(self._buf) + 65536)

    def read(self, n: int) -> bytes:
        self._fill(n)
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


def _gzip_member_chunks(f, chunk: int = 1 << 20):
    """Decompressed bytes of a concatenated-member gzip stream,
    yielded ONE COMPLETE MEMBER at a time — a truncated or corrupt
    trailing member is dropped (never partially emitted), so intact
    records in front of a torn tail always survive.  Memory is
    bounded by the largest member (one record in the Common Crawl
    per-record-member layout)."""
    d = zlib.decompressobj(wbits=31)
    member: list[bytes] = []
    while True:
        data = f.read(chunk)
        input_done = not data
        src = data
        while True:
            try:
                out = d.decompress(src)
            except zlib.error:
                return  # corrupt member: keep only completed ones
            member.append(out)
            if d.eof:
                yield b"".join(member)
                member = []
                src = d.unused_data
                d = zlib.decompressobj(wbits=31)
                if not src:
                    break
                continue
            break  # member needs more input
        if input_done:
            return  # incomplete trailing member dropped


def _file_chunks(f, chunk: int = 1 << 20):
    while True:
        data = f.read(chunk)
        if not data:
            return
        yield data


def _iter_file(path: str):
    """Yield record dicts from one .warc or .warc.gz file (gzip:
    member-wise decode, per-record members — the splittable Common
    Crawl layout — and single-member archives both work)."""
    raw = open(path, "rb")
    with raw:
        head = raw.read(2)
        raw.seek(0)
        gen = (
            _gzip_member_chunks(raw) if head == b"\x1f\x8b"
            else _file_chunks(raw)
        )
        stream = _PullStream(gen)
        while True:
            rec = _read_record(stream)
            if rec is None:
                break
            yield rec


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    warc_types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Distributed WARC read -> DataFrame[WARC_SCHEMA].

    `paths` is a file, a directory (all .warc/.warc.gz inside), or an
    explicit list.  `warc_types` filters record types executor-side
    (('response',) for crawl text; None keeps all).  Files must be
    visible to executors (shared fs / object store; local[*] here)."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith((".warc", ".warc.gz"))
            )
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        raise ValueError("read_warc: no input files")
    sc = spark.sparkContext
    want = tuple(t.lower() for t in warc_types) if warc_types else None

    def decode(path: str):
        base = os.path.basename(path)
        for rec in _iter_file(path):
            h = rec["headers"]
            wt = h.get("warc-type", "")
            if want is not None and wt.lower() not in want:
                continue
            status, http_ct, body = _split_http(rec["payload"])
            yield (
                base,
                h.get("warc-record-id", ""),
                wt,
                h.get("warc-target-uri", ""),
                h.get("warc-date", ""),
                h.get("content-type", ""),
                status,
                http_ct,
                body,
            )

    rdd = sc.parallelize(files, len(files)).flatMap(decode)
    return spark.createDataFrame(rdd, WARC_SCHEMA)


def warc_to_documents(warc: DataFrame) -> DataFrame:
    """response records -> (doc_id, url, fetched_at, text): the
    ingest head of the LLM curation pipeline.  doc_id is the portable
    md5-based hash of the record id (stable across engines and runs);
    text decodes the HTTP body as UTF-8 with replacement."""
    from pyspark.sql import functions as F

    from osm2pgsql_spark.functions import similarity as S

    return (
        warc.where(F.lower(F.col("warc_type")) == "response")
        .where(F.col("http_status").isNotNull())
        .select(
            S.hash32(F.col("record_id")).cast("long").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )
    )


# ------------------------------------------------------------- writer
# (test support + the round-trip pin; real pipelines only read)

def write_warc_gz(records: list[dict], path: str) -> None:
    """Write records as a .warc.gz with one gzip member per record
    (the splittable Common Crawl layout).  Each record dict:
    {record_id, warc_type, target_uri, warc_date, payload(bytes),
    content_type?}."""
    with open(path, "wb") as out:
        for r in records:
            payload = r["payload"]
            headers = [
                b"WARC/1.0",
                b"WARC-Type: " + r["warc_type"].encode(),
                b"WARC-Record-ID: " + r["record_id"].encode(),
                b"WARC-Date: " + r.get("warc_date", "").encode(),
                b"WARC-Target-URI: " + r.get("target_uri", "").encode(),
                b"Content-Type: " + r.get(
                    "content_type", "application/http; msgtype=response"
                ).encode(),
                b"Content-Length: " + str(len(payload)).encode(),
            ]
            rec = b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"
            out.write(gzip.compress(rec))


def http_response_payload(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """A minimal HTTP/1.1 response message wrapping `body`."""
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
