"""Distributed BPE training gates: EXACT merge-list parity with the
pure-Python reference learner (the rows-only registry entry's
correctness gate), determinism, and the dictionary-not-corpus shape."""

from ferenda_spark import queries as Q
from ferenda_spark.operators import bpe as B

SF = "/root/testdata/sf0.001"


def test_learn_bpe_matches_python_reference(spark):
    d = Q._read_wide(spark, SF, "documents")
    words = B.words_df(d)
    wc = {r.word: r["count"] for r in words.collect()}
    assert len(wc) > 25    # fixture vocabulary (31 distinct words)
    got = B.learn_bpe(words, n_merges=16)
    want = B.learn_bpe_py(wc, n_merges=16)
    assert got == want
    assert len(got) == 16          # fixture corpus supports 16 merges
    # merges are cumulative: later merges may consume earlier outputs
    built = {le + r for le, r in got}
    assert any(le in built or r in built for le, r in got[4:])


def test_learn_bpe_deterministic_and_tiebreak(spark):
    rows = [("aa bb aa bb cc",), ("aa bb",)]
    d = spark.createDataFrame(rows, "text string")
    words = B.words_df(d)
    m1 = B.learn_bpe(words, n_merges=4)
    m2 = B.learn_bpe(words, n_merges=4)
    assert m1 == m2
    wc = {r.word: r["count"] for r in words.collect()}
    assert m1 == B.learn_bpe_py(wc, n_merges=4)
    # four pairs tie at count 3; lexicographic tie-break picks
    # ('a','</w>') first ('<' sorts before any letter)
    assert m1[0] == ("a", "</w>")


def test_registry_query_schema(spark):
    df = Q.q_bpe_merges(spark, SF)
    assert df.columns == ["rank", "left", "right", "merged"]
    rows = df.orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(len(rows)))
    assert all(r.merged == r.left + r.right for r in rows)
