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


def test_encode_matches_python_and_roundtrips(spark):
    d = Q._read_wide(spark, SF, "documents")
    words = B.words_df(d)
    merges = B.learn_bpe(words, n_merges=16)
    ranks = {m: i for i, m in enumerate(merges)}
    enc = {r.word: list(r.pieces)
           for r in B.encode_words(words, merges).collect()}
    for w in enc:
        assert enc[w] == B.encode_word_py(w, ranks)
        # pieces reassemble the word exactly (with the end marker)
        assert "".join(enc[w]) == w + B.END
    # merges actually compress: some word encodes to fewer pieces
    assert any(len(p) < len(w) + 1 for w, p in enc.items())


def test_q_bpe_encode_schema(spark):
    df = Q.q_bpe_encode(spark, SF)
    rows = df.collect()
    assert df.columns == ["word", "count", "n_pieces", "encoded",
                          "weighted_pieces"]
    for r in rows:
        assert r.weighted_pieces == r["count"] * r.n_pieces
        assert len(r.encoded.split(" ")) == r.n_pieces
