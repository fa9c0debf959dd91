"""Semantic pins for the corpus-scrubbing ops (PII redaction,
boilerplate-line removal, benchmark decontamination) beyond the
row-level DuckDB oracle in test_registry.py: the oracle proves
Spark==DuckDB; these prove both compute the RIGHT thing."""

import os

import pytest
from pyspark.sql import functions as F

from ferenda_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="no testdata")


def test_pii_counts_follow_the_synthesis_rule(spark):
    rows = {r.doc_id: r for r in Q.q_pii_redact(spark, SF_DIR).collect()}
    for doc_id, r in rows.items():
        assert r.n_email == (1 if doc_id % 3 == 0 else 0), doc_id
        assert r.n_phone == (1 if doc_id % 4 == 0 else 0), doc_id
        assert r.n_ip == (1 if doc_id % 5 == 0 else 0), doc_id


def test_pii_redaction_actually_removes_the_pii(spark):
    """Redacted text of a PII-carrying doc hashes to the clean doc's
    text + placeholder tags — i.e. the original PII substrings are
    gone and nothing else changed."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    doc0 = d.where(F.col("doc_id") == 0).select("text").first().text
    expected = doc0 + " contact <EMAIL> call <PHONE> from <IP>"
    got = (Q.q_pii_redact(spark, SF_DIR)
           .where(F.col("doc_id") == 0).first())
    manual = spark.range(1).select(
        F.md5(F.lit(expected)).alias("h")).first().h
    assert got.redacted_md5 == manual


def test_boilerplate_removal_restores_the_body(spark):
    """Every doc gains exactly the 2 synthetic header/footer lines and
    removing them restores md5(original text)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orig = {r.doc_id: r.h for r in
            d.select("doc_id", F.md5("text").alias("h")).collect()}
    out = {r.doc_id: r for r in
           Q.q_dedup_boilerplate_lines(spark, SF_DIR).collect()}
    assert set(out) == set(orig)
    for doc_id, r in out.items():
        assert r.n_lines == 3 and r.n_boiler == 2, doc_id
        assert r.clean_md5 == orig[doc_id], doc_id


def test_decontamination_flags_all_eval_docs_and_only_overlaps(spark):
    out = {r.doc_id: r for r in
           Q.q_decontaminate_ngrams(spark, SF_DIR).collect()}
    evals = [r for r in out.values() if r.is_eval]
    assert evals and all(r.contaminated for r in evals), \
        "every eval doc leaks its own n-grams"
    # contaminated non-eval docs must actually share a 6-gram with an
    # eval doc: cross-check one against a brute-force Python overlap
    extra = [r for r in out.values()
             if r.contaminated and not r.is_eval]
    if extra:
        texts = {r.doc_id: r.text.lower() for r in spark.read.parquet(
            f"{SF_DIR}/documents.parquet").collect()}
        import re

        def grams(t):
            ts = re.findall(r"[a-z0-9]+", t)
            return {" ".join(ts[i:i + 6]) for i in range(len(ts) - 5)}

        ev_grams = set()
        for doc_id, t in texts.items():
            if doc_id % 97 == 0:
                ev_grams |= grams(t)
        victim = extra[0]
        overlap = grams(texts[victim.doc_id]) & ev_grams
        assert len(overlap) == victim.n_contaminated
