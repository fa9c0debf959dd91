"""WARC source reader (ISO 28500) — the crawl-side ingest that BUILDS
the Common-Crawl-style web-pages table the whole engine runs over
(BASELINE.json input_hint: url, warc_ts, html, text, lang).

From-scratch format code in the repo's pdftext/olereader/mediacodecs
tradition: no warcio dependency.  Handles the Common Crawl layout —
each record an INDEPENDENT gzip member concatenated into one .warc.gz
(so a reader can seek to an offset and inflate one record), plain
uncompressed .warc, CRLF header blocks, Content-Length-delimited
bodies, and the HTTP response framing inside ``response`` records
(status line + headers + blank line + payload).  Malformed records
quarantine as error rows instead of failing the file.

Spark shape (100-TB story): one task per WARC file via Spark's
``binaryFile`` source — exactly how Common Crawl ships (≈1 GB .gz
files, ~100k per crawl), so parallelism = file count with zero
shuffles before the parsed (url, warc_ts, html) projection; the blobs
never shuffle.  At petabyte scale the same parse runs per-record from
(offset, length) columns of the CC index instead of whole files —
``parse_warc`` takes bytes either way.

Reference analog: the reference's crawl side (S1-S3) fetches pages
one HTTP request at a time (documentrepository.py download());
a WARC batch ingest is its cluster-scale counterpart.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("error", T.StringType()),
    T.StructField("source_file", T.StringType()),
])


def gunzip_members(data: bytes) -> Iterator[bytes]:
    """Inflate a stream of CONCATENATED gzip members (the Common Crawl
    layout: one member per record).  Yields each member's bytes;
    passes non-gzip input through whole."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    return headers


def _split_records(raw: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """(warc headers, raw block body) per record in one buffer —
    Content-Length-delimited, records separated by CRLF CRLF."""
    pos = 0
    while True:
        start = raw.find(b"WARC/", pos)
        if start < 0:
            return
        hd_end = raw.find(b"\r\n\r\n", start)
        if hd_end < 0:
            raise ValueError("truncated warc header block")
        headers = _parse_headers(raw[start:hd_end])
        ln = int(headers.get("content-length", "-1"))
        if ln < 0:
            raise ValueError("warc record without Content-Length")
        body_start = hd_end + 4
        if body_start + ln > len(raw):
            raise ValueError("warc body exceeds buffer")
        yield headers, raw[body_start:body_start + ln]
        pos = body_start + ln


def _dechunk(payload: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer framing (RFC 9112 §7.1): each
    chunk is ``<hex-size>[;ext]CRLF <data> CRLF``, terminated by a
    zero-size chunk (trailers, if any, are dropped)."""
    out = bytearray()
    pos = 0
    while True:
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated chunk-size line")
        size = int(payload[pos:eol].split(b";", 1)[0], 16)
        if size == 0:
            return bytes(out)
        start = eol + 2
        if start + size > len(payload):
            raise ValueError("chunk data exceeds buffer")
        out += payload[start:start + size]
        pos = start + size + 2  # skip trailing CRLF


def _parse_http_response(body: bytes) -> tuple[int, str, bytes]:
    """HTTP framing inside a response record -> (status, content-type,
    payload bytes).  Honors ``Transfer-Encoding: chunked`` (crawlers
    commonly store the response verbatim, chunk framing included) and
    truncates to the HTTP ``Content-Length`` when the stored block
    carries trailing bytes past it."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0 or not body.startswith(b"HTTP/"):
        raise ValueError("response record without http framing")
    head = body[:sep]
    status_line = head.split(b"\r\n", 1)[0].split()
    status = int(status_line[1])
    headers = _parse_headers(head)
    ctype = headers.get("content-type", "")
    payload = body[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    elif "content-length" in headers:
        try:
            ln = int(headers["content-length"])
        except ValueError:
            ln = -1
        if 0 <= ln < len(payload):
            payload = payload[:ln]
    return status, ctype, payload


def parse_warc(data: bytes, source_file: str = "") -> list[dict]:
    """One WARC file's bytes -> record dicts (WARC_RECORD_SCHEMA rows).
    warcinfo/request/metadata records are skipped (the table the
    engine consumes is the response payloads); malformed records
    become quarantine rows (ok=False) without sinking the file."""
    def _quarantine(err: Exception, url=None, wtype=None) -> dict:
        return {"url": url, "warc_ts": None, "warc_type": wtype,
                "http_status": None, "content_type": None, "html": None,
                "n_bytes": 0, "ok": False,
                "error": f"{type(err).__name__}: {err}",
                "source_file": source_file}

    rows: list[dict] = []
    members = gunzip_members(data)
    while True:
        # a truncated gzip member quarantines and stops THIS file's
        # member walk (no resync point past a broken deflate stream);
        # everything already parsed is kept
        try:
            member = next(members)
        except StopIteration:
            break
        except Exception as e:
            rows.append(_quarantine(e))
            break
        recs = _split_records(member)
        while True:
            # record-level framing errors (missing Content-Length,
            # truncated header block, body past the buffer) quarantine
            # the MEMBER and move on to the next one — never the file
            try:
                headers, body = next(recs)
            except StopIteration:
                break
            except Exception as e:
                rows.append(_quarantine(e))
                break
            wtype = headers.get("warc-type", "")
            if wtype != "response":
                continue
            row = {
                "url": headers.get("warc-target-uri"), "warc_ts": None,
                "warc_type": wtype, "http_status": None,
                "content_type": None, "html": None, "n_bytes": 0,
                "ok": True, "error": None, "source_file": source_file,
            }
            try:
                if "warc-date" in headers:
                    row["warc_ts"] = pd.Timestamp(
                        headers["warc-date"]).tz_convert(None)
                status, ctype, payload = _parse_http_response(body)
                row.update(http_status=status, content_type=ctype,
                           html=payload, n_bytes=len(payload))
            except Exception as e:
                row.update(ok=False, error=f"{type(e).__name__}: {e}")
            rows.append(row)
    return rows


def read_warc_df(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC ingest: Spark's binaryFile source (one task per
    file — the Common Crawl unit of work), then an Arrow-batched parse
    fanning each file out to its response records.  Blobs never
    shuffle; the output is the engine's web_pages shape
    (url, warc_ts, html) plus provenance/quarantine columns."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = parse_warc(bytes(content), source_file=path_)
                yield pd.DataFrame(rows, columns=cols)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*").load(path)
             .select("path", "content"))
    return files.mapInPandas(gen, WARC_RECORD_SCHEMA)


def read_warc_records_df(spark: SparkSession, index: DataFrame) -> DataFrame:
    """CC-index-style RANGED record reads — the petabyte-scale access
    path: instead of inflating whole files, each task reads only the
    (offset, length) byte ranges its index rows point at (Common Crawl
    publishes exactly this columnar index; the one-gzip-member-per-
    record layout exists so a single record inflates from a ranged
    read).  ``index``: (path, offset, length) rows.  This
    implementation reads LOCAL files (seek + read; the sandbox has no
    object store) — deploying against S3/GCS swaps the open/seek pair
    for the storage client's ranged-GET call, plan shape unchanged.
    Blobs never shuffle; parallelism = index partitioning, so a
    selective query (one domain, one language) touches only its
    records — the row-group-pruning story, applied to crawl archives."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for path_, off, ln in zip(pdf["path"], pdf["offset"],
                                      pdf["length"]):
                local = path_[7:] if path_.startswith("file://") else path_
                with open(local, "rb") as fh:
                    fh.seek(int(off))
                    rows += parse_warc(fh.read(int(ln)),
                                       source_file=path_)
            yield pd.DataFrame(rows, columns=cols)

    return (index.select("path", "offset", "length")
            .mapInPandas(gen, WARC_RECORD_SCHEMA))


def warc_member_index(path: str) -> list[tuple[str, int, int]]:
    """Build the (path, offset, length) member index for one local
    .warc.gz — the fixture-side stand-in for the published CC index
    (production reads the index, never scans for members)."""
    with open(path, "rb") as fh:
        data = fh.read()
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        d.decompress(data[pos:])
        end = len(data) - len(d.unused_data)
        out.append((path, pos, end - pos))
        pos = end
    return out


def warc_to_web_pages(records: DataFrame) -> DataFrame:
    """Project parsed records onto the engine's input_hint table shape
    (url, warc_ts, html, text, lang) — ready for operators/extract."""
    return (records.where(F.col("ok") & (F.col("http_status") == 200))
            .select("url", "warc_ts", "html",
                    F.lit(None).cast("string").alias("text"),
                    F.lit(None).cast("string").alias("lang")))
