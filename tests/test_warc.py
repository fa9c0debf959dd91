"""WARC source reader gates (sources/warc.py): container round trip,
Common-Crawl gzip-member layout, skip/quarantine behavior, and the
chain into the extract pipeline."""

import gzip

import pytest

from ferenda_spark.fixtures import warcs as W
from ferenda_spark.sources import warc as S


def test_parse_roundtrip_uncompressed_and_gzip_members():
    ids = [0, 5, 13, 60]
    for compress in (False, True):
        data = W.build_warc_file(ids, compress=compress)
        rows = S.parse_warc(data)
        # only the response records come out; warcinfo/request skipped
        assert [r["url"] for r in rows] == \
            [f"{W.BASE_URL}{i}" for i in ids]
        for i, r in zip(ids, rows):
            assert r["ok"] and r["error"] is None
            assert r["html"].decode() == W.record_body(i)
            assert r["n_bytes"] == len(W.record_body(i))
            assert r["http_status"] == W.record_status(i)
            assert r["content_type"] == "text/html; charset=utf-8"
            assert r["warc_ts"].minute == i % 60
            assert r["warc_ts"].hour == i // 60


def test_gunzip_members_walks_concatenated_stream():
    members = [b"alpha", b"b" * 10000, b"gamma"]
    blob = b"".join(gzip.compress(m, mtime=0) for m in members)
    assert list(S.gunzip_members(blob)) == members
    with pytest.raises(ValueError):
        list(S.gunzip_members(blob[:-5]))   # truncated final member


def test_malformed_http_quarantines_not_raises():
    # a response record whose body has no http framing
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x/1\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"Content-Length: 9\r\n\r\nnot http!\r\n\r\n")
    rows = S.parse_warc(bad)
    assert len(rows) == 1 and rows[0]["ok"] is False
    assert "http framing" in rows[0]["error"]


def test_framing_error_quarantines_member_keeps_others():
    """Code-review regression: one record with broken WARC framing
    (no Content-Length) must quarantine — NOT raise out of parse_warc
    and lose the whole file; records in other gzip members survive."""
    broken = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: https://x/broken\r\n\r\nwhatever")
    good = W._response_record(3)
    blob = (gzip.compress(broken, mtime=0)
            + gzip.compress(good, mtime=0))
    rows = S.parse_warc(blob)
    assert len(rows) == 2
    bad_row = next(r for r in rows if not r["ok"])
    assert "Content-Length" in bad_row["error"]
    good_row = next(r for r in rows if r["ok"])
    assert good_row["url"] == f"{W.BASE_URL}3"
    # truncated FINAL gzip member: keep everything before it
    blob2 = gzip.compress(good, mtime=0) + gzip.compress(
        W._response_record(4), mtime=0)[:-6]
    rows2 = S.parse_warc(blob2)
    assert any(r["ok"] and r["url"] == f"{W.BASE_URL}3" for r in rows2)
    assert any(not r["ok"] for r in rows2)


def _http_response_record(url: str, head_extra: bytes,
                          payload: bytes) -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            + head_extra + b"\r\n" + payload)
    return W._record(
        [("WARC-Type", "response"),
         ("WARC-Date", "2026-01-01T00:00:00Z"),
         ("WARC-Target-URI", url),
         ("Content-Type", "application/http;msgtype=response")],
        http)


def test_chunked_transfer_encoding_is_decoded():
    """ADVICE r04: crawlers store chunked responses verbatim — the
    reader must strip the hex-size/CRLF chunk framing (RFC 9112 §7.1),
    including chunk extensions and dropped trailers."""
    body = (b"5;ext=1\r\nhello\r\n7\r\n, world\r\n0\r\n"
            b"X-Trailer: drop\r\n\r\n")
    rec = _http_response_record(
        "https://x/chunked", b"Transfer-Encoding: chunked\r\n", body)
    rows = S.parse_warc(gzip.compress(rec, mtime=0))
    assert rows[0]["ok"] and bytes(rows[0]["html"]) == b"hello, world"
    # truncated chunk framing -> quarantine row, not a raise
    bad = _http_response_record(
        "https://x/trunc", b"Transfer-Encoding: chunked\r\n",
        b"ff\r\nonly-a-few-bytes")
    rows = S.parse_warc(gzip.compress(bad, mtime=0))
    assert rows[0]["ok"] is False and "chunk" in rows[0]["error"]


def test_content_length_truncates_trailing_bytes():
    """ADVICE r04: when the stored block carries bytes past the HTTP
    Content-Length (e.g. keep-alive residue), truncate to it; an
    unparseable Content-Length leaves the payload whole."""
    rec = _http_response_record(
        "https://x/cl", b"Content-Length: 4\r\n", b"abcdEXTRA")
    rows = S.parse_warc(gzip.compress(rec, mtime=0))
    assert rows[0]["ok"] and bytes(rows[0]["html"]) == b"abcd"
    rec2 = _http_response_record(
        "https://x/badcl", b"Content-Length: nan\r\n", b"abcdEXTRA")
    rows2 = S.parse_warc(gzip.compress(rec2, mtime=0))
    assert rows2[0]["ok"] and bytes(rows2[0]["html"]) == b"abcdEXTRA"


def test_fixture_dir_is_absolute_and_env_overridable(tmp_path,
                                                     monkeypatch):
    import os
    p = W.fixture_dir("x")
    assert os.path.isabs(p) and p.endswith("spark-warehouse/x")
    monkeypatch.setenv("FERENDA_FIXTURE_DIR", str(tmp_path))
    assert W.fixture_dir("x") == str(tmp_path / "x")


def test_fixture_timestamps_roll_days():
    """Code-review regression: i >= 1440 must roll into the next day
    (not an invalid hour-24 date)."""
    assert W._warc_ts(1441) == "2026-01-02T00:01:00Z"
    rows = S.parse_warc(W.build_warc_file([1441]))
    assert rows[0]["ok"] and rows[0]["warc_ts"].day == 2


def test_distributed_read_matches_single_parse(spark, tmp_path):
    out = W.write_warc_fixture(str(tmp_path / "w"), n=40, n_files=3)
    df = S.read_warc_df(spark, out)
    got = {r.url: r for r in df.collect()}
    assert len(got) == 40
    # provenance column points at the owning file
    assert all(r.source_file.endswith(".warc.gz") for r in got.values())
    r7 = got[f"{W.BASE_URL}7"]
    assert bytes(r7.html).decode() == W.record_body(7)
    # one task per FILE: input partitions = file count, no shuffle
    assert "Exchange" not in df._jdf.queryExecution().executedPlan() \
        .toString().split("MapInPandas")[-1]


def test_ranged_record_reads_match_full_scan(spark, tmp_path):
    """CC-index path: reading only the (offset, length) ranges of the
    response members must reproduce exactly those records — and a
    SELECTIVE index (every 3rd record) must read only what it names."""
    out = W.write_warc_fixture(str(tmp_path / "w"), n=30, n_files=2)
    import glob
    idx = []
    for p in sorted(glob.glob(out + "/*.warc.gz")):
        idx += S.warc_member_index(p)
    # keep only members that hold response records (parse each range
    # once driver-side to classify — the fixture interleaves
    # warcinfo/request members)
    resp = [(p, o, ln) for (p, o, ln) in idx
            if S.parse_warc(open(p, "rb").read()[o:o + ln])]
    full = {r.url: bytes(r.html)
            for r in S.read_warc_df(spark, out).collect()}
    index_df = spark.createDataFrame(
        resp, "path string, offset long, length long")
    ranged = {r.url: bytes(r.html)
              for r in S.read_warc_records_df(spark, index_df).collect()}
    assert ranged == full
    some = spark.createDataFrame(
        resp[::3], "path string, offset long, length long")
    sel = S.read_warc_records_df(spark, some).collect()
    assert len(sel) == len(resp[::3])
    assert all(r.ok for r in sel)


def test_warc_to_web_pages_feeds_extract(spark, tmp_path):
    """End-to-end: a WARC carrying REAL fixture pages parses through
    warc_to_web_pages -> operators/extract with output equal to the
    direct web_pages_df path (the ingest is transparent)."""
    from ferenda_spark.fixtures.webpages import gen_rows, web_pages_df
    from ferenda_spark.operators.extract import extract

    rows = gen_rows(6)
    records = [W._warcinfo_record()]
    for i, r in enumerate(rows):
        payload = r["html"]
        http = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
                ).encode() + payload
        records.append(W._record(
            [("WARC-Type", "response"),
             ("WARC-Date", r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")),
             ("WARC-Target-URI", r["url"]),
             ("Content-Type", "application/http;msgtype=response")],
            http))
    p = tmp_path / "pages.warc.gz"
    p.write_bytes(b"".join(gzip.compress(x, mtime=0) for x in records))

    pages = S.warc_to_web_pages(S.read_warc_df(spark, str(tmp_path)))
    via_warc = extract(pages).orderBy("url").collect()
    direct = extract(web_pages_df(spark, 6)).orderBy("url").collect()
    assert [r.url for r in via_warc] == [r.url for r in direct]
    assert [r.text for r in via_warc] == [r.text for r in direct]
    assert [r.doc_uri for r in via_warc] == [r.doc_uri for r in direct]
