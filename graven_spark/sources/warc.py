"""WARC (ISO 28500) segment ingestion — the Common-Crawl-native form of the
pages table (``input_hint``: url / warc_ts / html).

Design for the 100-TB shape:

- **The segment file is the unit of parallelism.** Common Crawl publishes
  ~1 GB ``.warc.gz`` segments precisely so one task = one segment; a crawl
  month is ~72k segments = ~72k tasks. The reader takes a DataFrame of
  segment paths and parses each inside ``mapInPandas`` — the driver only
  lists paths (O(files), same as Spark's own file listing).
- **Streaming, never whole-segment buffering.** Records are parsed from a
  chunked read (1 MiB I/O chunks); memory is bounded by one record plus one
  chunk, not the segment. Per-record gzip members (the Common-Crawl
  ``.warc.gz`` layout: each record its own member, members concatenated) are
  decompressed incrementally with ``zlib.decompressobj``; plain ``.warc``
  is auto-detected by magic bytes.
- **Remote filesystems** go through ``pyarrow.fs.FileSystem.from_uri`` when
  the path carries a scheme (s3://, hdfs://); bare paths use local open.
- Output rows are emitted in batches of ``rows_per_batch`` so a
  many-records segment never materializes at once.

Only ``response`` records with an in-range HTTP status become pages; the
HTTP block is split into status/headers/body with the body returned exactly
as captured (no transfer-decoding — Common Crawl stores the payload already
dechunked). A pure-Python twin (:func:`parse_warc`) backs the CORRECTNESS
oracle and the equivalence tests, per the repo's established
VALUES-from-the-pure-oracle technique.

Reference parity note: the reference crawler (graven) has no archive
ingestion — its input is a live HTML scrape loop
(/root/reference/graven/worker/crawler.py:62-96). WARC ingestion is a
web-scale bootstrap surface like sitemap seeding (SURVEY.md §2.13 R12).
"""

from __future__ import annotations

import glob as _glob
import zlib
from datetime import datetime, timezone
from typing import IO, Iterator

import pandas as pd

_CHUNK = 1 << 20
_GZIP_MAGIC = b"\x1f\x8b"

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "http_status int, mime string, segment string"
)
# lang is NULL at ingest: WARC carries no language metadata; language ID is a
# downstream op (operators/textops.lang_id). The column exists so the output
# is drop-in for the crawl's pages contract (url, warc_ts, html, lang).


# -- streaming byte source -----------------------------------------------------

def _byte_chunks(stream: IO[bytes], chunk: int = _CHUNK) -> Iterator[bytes]:
    """Yield (decompressed) byte chunks from ``stream``. Gzip is detected by
    magic bytes; concatenated members — one per record in Common-Crawl
    ``.warc.gz`` — restart a fresh ``decompressobj`` on member end, feeding
    ``unused_data`` back in, so the whole segment streams in O(chunk)."""
    first = stream.read(2)
    if first != _GZIP_MAGIC:
        if first:
            yield first
        while True:
            b = stream.read(chunk)
            if not b:
                return
            yield b
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    pending = first
    while True:
        if not pending:
            pending = stream.read(chunk)
            if not pending:
                return
        out = d.decompress(pending)
        pending = b""
        if out:
            yield out
        if d.eof:
            pending = d.unused_data
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            if not pending:
                pending = stream.read(chunk)
                if not pending:
                    return


# -- record iterator -----------------------------------------------------------

def iter_warc_records(stream: IO[bytes]) -> Iterator[dict]:
    """Stream WARC records as dicts: ``warc_type``, ``target_uri``,
    ``warc_date``, ``content_type``, ``block`` (raw record block bytes),
    ``parse_failed``. A structurally broken record (no WARC/ magic, bad
    Content-Length, truncation) yields one ``parse_failed`` sentinel and
    stops the file — record boundaries are length-delimited, so there is no
    reliable resync past a corrupt length."""
    chunks = _byte_chunks(stream)
    buf = b""
    eof = False

    def fill(target: int) -> None:
        nonlocal buf, eof
        while not eof and len(buf) < target:
            try:
                buf += next(chunks)
            except StopIteration:
                eof = True

    def fill_until(marker: bytes) -> int:
        nonlocal buf, eof
        while True:
            i = buf.find(marker)
            if i >= 0 or eof:
                return i
            try:
                buf += next(chunks)
            except StopIteration:
                eof = True

    while True:
        fill(2)
        while buf[:2] == b"\r\n":  # inter-record CRLF CRLF separator
            buf = buf[2:]
            fill(2)
        if not buf and eof:
            return
        fill(5)
        if not buf.startswith(b"WARC/"):
            yield {"parse_failed": True, "reason": "bad magic"}
            return
        hdr_end = fill_until(b"\r\n\r\n")
        if hdr_end < 0:
            yield {"parse_failed": True, "reason": "truncated header"}
            return
        head, buf = buf[:hdr_end], buf[hdr_end + 4:]
        headers: dict[str, str] = {}
        for ln in head.split(b"\r\n")[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "utf-8", errors="replace"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            yield {"parse_failed": True, "reason": "bad content-length"}
            return
        fill(clen)
        if len(buf) < clen:
            yield {"parse_failed": True, "reason": "truncated block"}
            return
        block, buf = buf[:clen], buf[clen:]
        uri = headers.get("warc-target-uri")
        if uri and uri.startswith("<") and uri.endswith(">"):
            uri = uri[1:-1]  # WARC 1.0 angle-bracket form
        yield {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": uri,
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "block": block,
            "parse_failed": False,
        }


def split_http_response(block: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """Raw HTTP response block → (status, lowercased headers, body). A block
    that is not an HTTP message comes back as (None, {}, block) — the body
    is always exactly the captured bytes (no transfer decoding)."""
    sep = block.find(b"\r\n\r\n")
    if not block.startswith(b"HTTP/") or sep < 0:
        return None, {}, block
    lines = block[:sep].decode("latin-1").split("\r\n")
    parts = lines[0].split()
    try:
        status: int | None = int(parts[1])
    except (IndexError, ValueError):
        status = None
    headers = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[sep + 4:]


def _parse_warc_date(s: str | None) -> datetime | None:
    """WARC-Date (RFC 3339 UTC, second or sub-second) → naive-UTC datetime."""
    if not s:
        return None
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=None)
        except ValueError:
            continue
    try:  # offset form
        return (
            datetime.fromisoformat(s.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


# -- pure-Python twin (oracle / tests) -----------------------------------------

def parse_warc(
    data: bytes, min_status: int = 200, max_status: int = 299
) -> list[dict]:
    """Pure twin of the Spark path over one in-memory segment: the page rows
    (url, warc_ts, html, http_status, mime) that :func:`pages_from_warc`
    emits, in record order. Backs the CORRECTNESS VALUES oracle."""
    import io

    out = []
    for rec in iter_warc_records(io.BytesIO(data)):
        row = _page_row(rec, min_status, max_status)
        if row is not None:
            out.append(row)
    return out


def _page_row(rec: dict, min_status: int, max_status: int) -> dict | None:
    if rec["parse_failed"] or rec["warc_type"] != "response" or not rec["target_uri"]:
        return None
    ctype = rec["content_type"] or ""
    if "msgtype=response" not in ctype.replace(" ", "") and not rec[
        "block"
    ].startswith(b"HTTP/"):
        return None
    status, http_headers, body = split_http_response(rec["block"])
    if status is None or not (min_status <= status <= max_status):
        return None
    mime = http_headers.get("content-type", "").split(";")[0].strip() or None
    return {
        "url": rec["target_uri"],
        "warc_ts": _parse_warc_date(rec["warc_date"]),
        "html": body,
        "lang": None,
        "http_status": status,
        "mime": mime,
    }


# -- Spark reader --------------------------------------------------------------

def _open_stream(path: str) -> IO[bytes]:
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.open_input_stream(p)
    return open(path, "rb")


def pages_from_warc(
    spark,
    paths: list[str] | str,
    min_status: int = 200,
    max_status: int = 299,
    rows_per_batch: int = 1024,
):
    """Segment paths → pages DataFrame (:data:`PAGES_SCHEMA`). ``paths`` may
    be a glob (expanded and sorted on the driver — O(files), the same cost
    as Spark's own listing) or an explicit list; each segment parses
    streaming inside ``mapInPandas`` with memory bounded by one record.
    One partition per segment: the Common-Crawl contract is that segments
    are the sized unit of work, so there is nothing to split further and no
    shuffle to pay."""
    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths))
    if not paths:
        raise ValueError("pages_from_warc: no segment paths matched")
    pdf = spark.createDataFrame(
        [(p,) for p in paths], "segment string"
    ).repartition(len(paths), "segment")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for seg in b["segment"]:
                rows: list[dict] = []
                with _open_stream(seg) as fh:
                    for rec in iter_warc_records(fh):
                        row = _page_row(rec, min_status, max_status)
                        if row is None:
                            continue
                        row["segment"] = seg
                        rows.append(row)
                        if len(rows) >= rows_per_batch:
                            yield _to_pdf(rows)
                            rows = []
                if rows:
                    yield _to_pdf(rows)

    return pdf.mapInPandas(gen, PAGES_SCHEMA)


def _to_pdf(rows: list[dict]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "lang", "http_status", "mime", "segment"])
    out["warc_ts"] = pd.to_datetime(out["warc_ts"])
    return out


# -- deterministic writer (tests / fixtures) -----------------------------------

def http_response_block(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(status, "X")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode("latin-1")
    return head + b"\r\n" + body


def build_warc_record(
    warc_type: str,
    block: bytes,
    uri: str | None = None,
    date: str = "2024-01-01T00:00:00Z",
    content_type: str | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
) -> bytes:
    if content_type is None:
        content_type = (
            "application/http; msgtype=response"
            if warc_type == "response"
            else "application/octet-stream"
        )
    hdr = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Date: {date}",
        f"WARC-Record-ID: {record_id}",
        f"Content-Type: {content_type}",
        f"Content-Length: {len(block)}",
    ]
    if uri is not None:
        hdr.insert(2, f"WARC-Target-URI: {uri}")
    return "\r\n".join(hdr).encode("latin-1") + b"\r\n\r\n" + block + b"\r\n\r\n"


def build_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate records into one segment; ``gzip_members=True`` emits the
    Common-Crawl layout (each record its own gzip member). Deterministic:
    mtime 0, no filename."""
    if not gzip_members:
        return b"".join(records)
    out = []
    for r in records:
        co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out.append(co.compress(r) + co.flush())
    return b"".join(out)
