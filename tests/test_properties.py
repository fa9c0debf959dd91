"""Property-based tests (hypothesis): the columnar scalar functions
must agree with their pure-Python twins on arbitrary input, and the
portable hash must agree between Spark and DuckDB — the invariants the
oracle gate rests on."""

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ferenda_spark import functions as FN
from ferenda_spark.operators.coin import SlugTransform

TEXT = st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs", "Cc")),
    max_size=60)

_slow = settings(max_examples=25, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _one(spark, expr_fn, value):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(expr_fn(F.col("s")).alias("o")).collect()[0].o


@_slow
@given(s=TEXT)
def test_normalize_space_matches_py(spark, s):
    assert _one(spark, FN.normalize_space, s) == FN.normalize_space_py(s)


@_slow
@given(s=TEXT)
@example(s="\U00016AC0")   # MRO DIGIT ZERO: Java \d is ASCII-only, so the
@example(s="a٣b1")    # Python twin must be too (r3 falsifying cases).
def test_natural_sort_key_matches_py(spark, s):
    assert _one(spark, FN.natural_sort_key, s) == FN.natural_sort_key_py(s)


@_slow
@given(s=st.text(alphabet="ivxlcdmIVXLCDM", min_size=1, max_size=10))
def test_from_roman_matches_py(spark, s):
    assert _one(spark, FN.from_roman, s) == FN.from_roman_py(s)


@_slow
@given(s=TEXT)
def test_coin_slug_matches_py(spark, s):
    slug = SlugTransform(to_lower=True, replace=((" ", " "),),
                         space_repl="+")
    got = _one(spark, slug.apply, s)
    assert got == slug.apply_py(s)


@_slow
@given(s=st.text(alphabet=st.characters(min_codepoint=32,
                                        max_codepoint=126),
                 min_size=1, max_size=40))
def test_portable_hash_spark_equals_duckdb(spark, s):
    """The 60-bit md5-prefix hash (queries._h) is the foundation of
    every hash-based oracle comparison — it must be IDENTICAL across
    engines for arbitrary ASCII payloads."""
    from ferenda_spark.queries import _H_SQL, _h
    spark_val = (spark.createDataFrame([(s,)], "s string")
                 .select(_h(F.col("s")).alias("h")).collect()[0].h)
    duck_val = duckdb.sql(
        "SELECT " + _H_SQL.format(x="?") , params=[s]).fetchone()[0]
    assert spark_val == duck_val


def test_natural_sort_orders_rfc_ids():
    ids = [f"RFC {n}" for n in (1, 2, 9, 10, 99, 100, 1000)]
    keys = [FN.natural_sort_key_py(i) for i in ids]
    assert sorted(keys) == keys


# ---------------------------------------------------------------------------
# legal-reference recognizers: total functions over arbitrary text

from hypothesis import example, given, settings
from hypothesis import strategies as st

_legal_text = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzåäö ABCDEFGHIJKLMNOPQRSTUVWXYZÅÄÖ"
             "0123456789 .,;:()-–/§\n")),
    max_size=200)


@settings(max_examples=120, deadline=None)
@given(_legal_text)
@example("3 § och 4 kap. 5 §§ lagen (1999:175) samt NJA 1998 s. 14")
@example("§§§ 12 kap. kap. (((: samma lag")
def test_legal_recognizers_total_and_deterministic(text):
    """Never crash, always deterministic, uris always absolute."""
    from ferenda_spark.operators.sfs import find_sfs_refs
    from ferenda_spark.operators.svlegal import (find_avg_refs,
                                                 find_forarbete_refs,
                                                 find_rattsfall_refs)
    for fn in (find_sfs_refs, find_rattsfall_refs,
               find_forarbete_refs, find_avg_refs):
        a = fn(text)
        b = fn(text)
        assert a == b
        for r in a:
            assert r["uri"].startswith("https://lagen.nu/")


# --- scrub-op properties (round 3): idempotence over arbitrary input ---

_URL_CHARS = st.text(
    alphabet="abcXYZ019.:/?#&=_-", min_size=0, max_size=40)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=_URL_CHARS)
def test_url_normalization_idempotent(spark, s):
    """norm(norm(u)) == norm(u) for arbitrary URL-ish strings — a
    canonicalization that keeps moving under itself corrupts the
    URL-dedup groups (applies the same regexp chain as
    queries._url_norm_cols, which is pinned to synthetic URLs)."""
    url = "https://" + s

    def norm(col):
        nofrag = F.regexp_replace(col, r"#.*$", "")
        scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z]+)://", 1))
        host = F.regexp_replace(
            F.lower(F.regexp_extract(nofrag, r"^[A-Za-z]+://([^/?#]+)", 1)),
            r"^www\.", "")
        host = F.regexp_replace(host, r":(443|80)$", "")
        path = F.regexp_replace(
            F.regexp_extract(nofrag, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
            r"/+$", "")
        qs = F.array_join(
            F.filter(F.split(F.regexp_extract(nofrag, r"\?([^#]*)", 1), "&"),
                     lambda p: ~p.startswith("utm_")), "&")
        return F.concat(scheme, F.lit("://"), host, path,
                        F.when(qs != "", F.concat(F.lit("?"), qs))
                        .otherwise(F.lit("")))

    row = (spark.range(1)
           .select(norm(F.lit(url)).alias("n1"))
           .select("n1", norm(F.col("n1")).alias("n2"))
           .first())
    assert row.n1 == row.n2


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=st.text(
    alphabet="ab X.@-0159%_+\n", min_size=0, max_size=60))
def test_pii_redaction_idempotent(spark, s):
    """redact(redact(t)) == redact(t): the placeholder tags must never
    re-match any PII pattern (otherwise a second pass corrupts text)."""
    from ferenda_spark import queries as Q

    def red(col):
        r = F.regexp_replace(col, Q._PII_EMAIL_RE, "<EMAIL>")
        r = F.regexp_replace(r, Q._PII_IP_RE, "<IP>")
        return F.regexp_replace(r, Q._PII_PHONE_RE, "<PHONE>")

    row = (spark.range(1)
           .select(red(F.lit(s)).alias("r1"))
           .select("r1", red(F.col("r1")).alias("r2"))
           .first())
    assert row.r1 == row.r2
