"""Scalar function library: Spark Column expressions vs their pure-
Python twins (SURVEY.md §2 A5 + §2.6)."""

import pytest


def test_dataset_uri_matches_reference_doctest(spark):
    """documentrepository.py:612-647 doctest cases, columnar + twin."""
    from pyspark.sql import functions as F

    from ferenda_spark.functions.scalars import dataset_uri, dataset_uri_py
    base = "http://example.org/"
    cases = [
        (dict(), "http://example.org/dataset/base"),
        (dict(param="title", value="a"),
         "http://example.org/dataset/base?title=a"),
        (dict(feed=True), "http://example.org/dataset/base/feed"),
        (dict(param="title", value="a", feed=True),
         "http://example.org/dataset/base/feed?title=a"),
        (dict(param="title", value="a", feed=".atom"),
         "http://example.org/dataset/base/feed.atom?title=a"),
    ]
    df = spark.createDataFrame([("base", "a")], "alias string, val string")
    for kw, want in cases:
        assert dataset_uri_py(base, "base", **kw) == want
        col_kw = dict(kw)
        if "value" in col_kw:
            col_kw["value_col"] = F.col("val")
            del col_kw["value"]
        got = df.select(dataset_uri(base, F.col("alias"),
                                    **col_kw).alias("u")).first().u
        assert got == want


def test_text_lines_and_pages():
    from ferenda_spark.operators.rfc_parse import text_lines, text_pages
    t = "a\nb\n\fc\nd\f"
    assert text_lines(t) == ["a", "b", "\fc", "d\f"]
    assert text_pages(t) == ["a\nb\n", "c\nd", ""]
from pyspark.sql import functions as F

from ferenda_spark import functions as FN

STRINGS = [
    "The  Quick\t brown fox!",
    "  RFC 10 beats RFC 9  ",
    "protocol (2nd ed.)",
    "",
    "åäö already lower",
]


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame([(s,) for s in STRINGS], "s string")


def _col_vs_py(sdf, col_fn, py_fn):
    got = [r.o for r in sdf.select(col_fn(F.col("s")).alias("o")).collect()]
    want = [py_fn(s) for s in STRINGS]
    assert got == want, f"{got} != {want}"


def test_normalize_space(sdf):
    _col_vs_py(sdf, FN.normalize_space, FN.normalize_space_py)


def test_title_sortkey(sdf):
    _col_vs_py(sdf, FN.title_sortkey, FN.title_sortkey_py)


def test_natural_sort_key(spark):
    vals = ["RFC 9", "RFC 10", "RFC 100", "a2b10", "a10b2", "nodigits"]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.o for r in
           sdf.select(FN.natural_sort_key(F.col("s")).alias("o")).collect()]
    want = [FN.natural_sort_key_py(v) for v in vals]
    assert got == want
    # the point: sorting the keys gives natural order
    ordered = [v for _, v in sorted(zip(got[:3], vals[:3]))]
    assert ordered == ["RFC 9", "RFC 10", "RFC 100"]


def test_from_roman(spark):
    vals = ["iv", "MCMXCIV", "xiii", "i", "mmxxiv"]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.o for r in
           sdf.select(FN.from_roman(F.col("s")).alias("o")).collect()]
    assert got == [4, 1994, 13, 1, 2024]
    assert got == [FN.from_roman_py(v) for v in vals]


def test_uri_leaf_ucfirst_slug(spark):
    sdf = spark.createDataFrame(
        [("http://ex.org/res/rfc/7230#S1.2", "hello world")], "u string, t string")
    row = sdf.select(
        FN.uri_leaf(F.col("u")).alias("leaf"),
        FN.ucfirst(F.col("t")).alias("uc"),
        FN.slugify(F.col("t")).alias("slug"),
    ).collect()[0]
    assert row.leaf == "S1.2"
    assert row.uc == "Hello world"
    assert row.slug == "hello+world"
    assert FN.uri_leaf_py("http://ex.org/res/rfc/7230#S1.2") == "S1.2"


def test_year_of_and_firstletter(spark):
    sdf = spark.createDataFrame(
        [("2006-09-17", " Zebra")], "d string, t string")
    row = sdf.select(FN.year_of(F.col("d")).alias("y"),
                     FN.firstletter(F.col("t")).alias("fl")).collect()[0]
    assert row.y == 2006 and row.fl == "z"


def test_base27():
    assert [FN.base27_encode_py(n) for n in (1, 2, 26, 27, 28)] == \
        ["a", "b", "z", "aa", "ab"]


def test_sv_collate_key_pins_swedish_order(spark, sdf):
    """VERDICT r04 #4: å < ä < ö AFTER z (never interfiled with a/o),
    v and w fold at the primary level, foreign letters fold to their
    Swedish primaries — and the Column expression equals the twin."""
    _col_vs_py(sdf, FN.sv_collate_key, FN.sv_collate_key_py)
    words = ["öl", "ärlig", "åka", "zebra", "var", "wax", "vilt",
             "école", "eko", "über", "ystad", "apa", "Örn"]
    got = sorted(words, key=FN.sv_collate_key_py)
    # note the strxfrm-true interfiling: "wax" < "vilt" because v=w at
    # the primary level and a < i at position 2
    assert got == ["apa", "école", "eko", "var", "wax", "vilt",
                   "über", "ystad", "zebra", "åka", "ärlig", "öl",
                   "Örn"]
    # å/ä/ö strictly after z, in åäö order
    assert [FN.sv_collate_key_py(c)[0] for c in "zåäö"] == \
        ["Y", "Z", "[", "\\"]
    # v/w share the primary weight; the raw string breaks the tie
    assert FN.sv_collate_key_py("vilt") < FN.sv_collate_key_py("wilt")
    assert FN.sv_collate_key_py("vilt")[0] == \
        FN.sv_collate_key_py("wilt")[0] == "V"
    # Spark ordering agrees with the python sort
    df = spark.createDataFrame([(w,) for w in words], "s string")
    rows = df.orderBy(FN.sv_collate_key(F.col("s"))).collect()
    assert [r.s for r in rows] == got
