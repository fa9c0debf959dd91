"""Deterministic WARC fixture (sources/warc.py's test + oracle bed).

Every record field is an ARITHMETIC function of the record index so
the DuckDB oracle can recompute the parsed table from ``range(n)`` —
the same encode->decode round-trip discipline as the media fixture
(multimodal_meta): the WARC container framing (gzip members, CRLF
header blocks, Content-Length body slicing, HTTP response framing) is
what the oracle actually gates.

Layout matches Common Crawl: each record an independent gzip member;
records are dealt round-robin across k files so the distributed read
(one task per file) sees multi-file input.  A warcinfo record opens
each file and request records are interleaved — both must be skipped
by the reader.
"""

from __future__ import annotations

import gzip
import os

BASE_URL = "https://warc.example.org/doc/"
EPOCH = "2026-01-01T00:00:00Z"


def record_body(i: int) -> str:
    return f"<html><body>doc {i} {'x' * (i % 7)}</body></html>"


def record_status(i: int) -> int:
    return 404 if i % 13 == 5 else 200


def _warc_ts(i: int) -> str:
    # full date arithmetic (not just the hour field): i >= 1440 must
    # roll into the next day, matching the oracle's
    # "+ i * INTERVAL 1 MINUTE"
    from datetime import datetime, timedelta
    t = datetime(2026, 1, 1) + timedelta(minutes=i)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record(headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (f"WARC/1.0\r\n{head}Content-Length: {len(body)}\r\n\r\n"
            .encode("latin-1") + body + b"\r\n\r\n")


def _response_record(i: int) -> bytes:
    payload = record_body(i).encode()
    http = (f"HTTP/1.1 {record_status(i)} X\r\n"
            f"Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
    return _record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", f"<urn:uuid:{i:032x}>"),
         ("WARC-Date", _warc_ts(i)),
         ("WARC-Target-URI", f"{BASE_URL}{i}"),
         ("Content-Type", "application/http;msgtype=response")],
        http)


def _request_record(i: int) -> bytes:
    http = (f"GET /doc/{i} HTTP/1.1\r\nHost: warc.example.org\r\n\r\n"
            ).encode("latin-1")
    return _record(
        [("WARC-Type", "request"), ("WARC-Date", _warc_ts(i)),
         ("WARC-Target-URI", f"{BASE_URL}{i}"),
         ("Content-Type", "application/http;msgtype=request")],
        http)


def _warcinfo_record() -> bytes:
    body = b"software: ferenda_spark fixture\r\n"
    return _record(
        [("WARC-Type", "warcinfo"), ("WARC-Date", EPOCH),
         ("Content-Type", "application/warc-fields")],
        body)


def build_warc_file(ids: list[int], compress: bool = True) -> bytes:
    """warcinfo + (request, response) per id — responses are what the
    reader must emit.  compress=True writes one gzip member per record
    (the Common Crawl layout)."""
    records = [_warcinfo_record()]
    for i in ids:
        records += [_request_record(i), _response_record(i)]
    if not compress:
        return b"".join(records)
    return b"".join(
        gzip.compress(r, compresslevel=1, mtime=0) for r in records)


def fixture_dir(name: str) -> str:
    """Absolute, configurable fixture root: $FERENDA_FIXTURE_DIR if
    set, else <repo>/spark-warehouse — never cwd-relative, so driver
    and executors agree on the path regardless of working directory."""
    base = os.environ.get("FERENDA_FIXTURE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "spark-warehouse")
    return os.path.join(base, name)


def write_warc_fixture(out_dir: str, n: int = 200,
                       n_files: int = 4) -> str:
    """Round-robin n records across n_files .warc.gz files (idempotent
    — deterministic bytes, skipped if already on disk).  Writes are
    atomic (temp file + os.replace) so a concurrent reader never sees
    a partially written .warc.gz."""
    os.makedirs(out_dir, exist_ok=True)
    for f in range(n_files):
        path = os.path.join(out_dir, f"crawl-{f:02d}.warc.gz")
        if not os.path.exists(path):
            data = build_warc_file(list(range(f, n, n_files)))
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
    return out_dir
