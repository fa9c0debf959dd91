"""S7/S8 binary document readers: real .docx extraction + content-based
format detection against the reference's OWN committed fixtures; PDF
page-structure probe; Spark plumbing."""

import os

import pytest

from ferenda_spark.operators import docformats as D

WR = "/root/reference/test/files/wordreader"
PR = "/root/reference/test/files/pdfreader"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(WR), reason="reference fixtures not available")


def test_detect_word_format_by_content():
    """Mirrors testWordReader.py: detection is by CONTENT — the
    committed mislabeled.doc is really OOXML."""
    assert D.detect_word_format(
        open(f"{WR}/sample.docx", "rb").read()) == "docx"
    assert D.detect_word_format(
        open(f"{WR}/sample.doc", "rb").read()) == "doc"
    assert D.detect_word_format(
        open(f"{WR}/mislabeled.doc", "rb").read()) == "docx"
    assert D.detect_word_format(b"plain text") is None


def test_docx_paragraphs_real_extraction():
    paras = D.docx_paragraphs(open(f"{WR}/sample.docx", "rb").read())
    assert paras[0] == "Document title"
    assert paras[1].startswith("This is a simple document in OOXML")


def test_pdf_page_counts_on_reference_fixtures():
    assert D.pdf_page_count(
        open(f"{PR}/sample.pdf", "rb").read()) == 1
    assert D.pdf_page_count(
        open(f"{PR}/scanned.pdf", "rb").read()) == 2
    # prop_1997_98_44.pdf is a committed placeholder ("Not a real PDF
    # file") — the probe degrades to zero pages, no crash
    assert D.pdf_page_count(
        open(f"{PR}/prop_1997_98_44.pdf", "rb").read()) == 0


def test_strict_mode_raises():
    old = D.STRICT
    D.STRICT = True
    try:
        with pytest.raises(NotImplementedError):
            D.doc_paragraphs(b"\xd0\xcf\x11\xe0fake")
        with pytest.raises(NotImplementedError):
            D.pdf_text_pages(b"%PDF-1.4 /Type /Page")
    finally:
        D.STRICT = old


def test_extract_documents_plumbing(spark):
    rows = [
        ("u1", "word", open(f"{WR}/sample.docx", "rb").read()),
        ("u2", "word", open(f"{WR}/mislabeled.doc", "rb").read()),
        ("u3", "pdf", open(f"{PR}/sample.pdf", "rb").read()),
        ("u4", "word", b"not a document"),
    ]
    df = spark.createDataFrame(rows, "url string, kind string, payload binary")
    got = D.extract_documents(df).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r.url, []).append(r)
    assert by_url["u1"][0].format == "docx"
    assert by_url["u1"][0].text == "Document title"
    assert by_url["u2"][0].format == "docx"     # content-detected
    assert by_url["u3"][0].format == "pdf" and by_url["u3"][0].ok
    assert by_url["u4"][0].ok is False and by_url["u4"][0].error
