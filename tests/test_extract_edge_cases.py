"""Quarantine-path robustness: hostile/degenerate inputs must never
fail the batch — they become parse_ok=false rows with lineage intact
(north_rule: per-partition lineage; extract.py error contract)."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.extract import extract, extract_one


def _page(url, html_bytes):
    return (url, None, html_bytes, None, None)


HOSTILE = [
    _page("http://localhost:8000/res/base/empty", b""),
    _page("http://localhost:8000/res/base/nul", b"\x00\xff\xfe garbage \x00"),
    _page("http://localhost:8000/res/base/nobody",
          b"<html><head><title>t</title></head></html>"),  # no <body>
    _page("http://localhost:8000/res/base/unclosed",
          b"<html><body><p>one <div>two <b>three</body>"),
    _page("http://localhost:8000/res/base/badcharset",
          b'<html><head><meta charset="no-such-enc"></head>'
          b"<body><p>hi</p></body></html>"),
    _page("http://localhost:8000/res/base/latin1",
          '<html><head><meta charset="iso-8859-1"></head>'
          "<body><p>caf\xe9</p></body></html>".encode("iso-8859-1")),
    _page("http://localhost:8000/res/base/nullhtml", None),
    _page("http://localhost:8000/res/base/deep",
          b"<html><body>" + b"<div>" * 200 + b"x" + b"</div>" * 200
          + b"</body></html>"),
    _page("http://localhost:8000/res/rfc/9999",
          b"<html><body><p>an rfc page without a pre block</p></body></html>"),
]


def test_hostile_batch_never_fails(spark):
    df = spark.createDataFrame(
        HOSTILE, "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")
    rows = {r.url.rsplit("/", 1)[-1]: r for r in extract(df).collect()}
    assert len(rows) == len(HOSTILE)

    # bodyless / empty docs quarantine with a real error message
    assert not rows["empty"].parse_ok and rows["empty"].error
    assert not rows["nobody"].parse_ok
    # every quarantined row still carries lineage (md5 of the raw bytes)
    assert all(len(r.content_md5) == 32 for r in rows.values())

    # tolerant paths still parse
    assert rows["unclosed"].parse_ok
    assert "one two three" in rows["unclosed"].text
    assert rows["badcharset"].parse_ok          # falls back to utf-8
    assert rows["latin1"].parse_ok
    assert "café" in rows["latin1"].text        # declared charset honored
    assert rows["deep"].parse_ok and rows["deep"].text == "x"
    # null html behaves exactly like empty bytes: quarantined with error
    assert rows["nullhtml"].parse_ok is False and rows["nullhtml"].error
    # rfc page without <pre>: no sections, but still a document
    assert rows["9999"].parse_ok and rows["9999"].sections == []


def test_extract_one_is_deterministic():
    html = b"<html><body><p>a</p><p>b</p></body></html>"
    a = extract_one("http://localhost:8000/res/base/x", html)
    b = extract_one("http://localhost:8000/res/base/x", html)
    assert a == b


def test_fields_pruning_matches_full(spark):
    from ferenda_spark.fixtures.webpages import web_pages_df
    pages = web_pages_df(spark, 8)
    full = extract(pages).select("url", "doc_uri", "title", "n_chars")
    slim = extract(pages, fields=["url", "doc_uri", "title", "n_chars"])
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, slim.collect()))
    assert slim.columns == ["url", "doc_uri", "title", "n_chars"]
