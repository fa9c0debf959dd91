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


def test_batched_rounds_much_fewer_than_merges(spark):
    """VERDICT r04 #1 done-check: the batched learner takes FAR fewer
    Spark rounds than merges on the fixture, with parity intact."""
    d = Q._read_wide(spark, SF, "documents")
    words = B.words_df(d)
    merges, rounds = B.learn_bpe_stats(words, n_merges=16)
    wc = {r.word: r["count"] for r in words.collect()}
    assert merges == B.learn_bpe_py(wc, n_merges=16)
    assert len(merges) == 16
    assert rounds <= 5, f"16 merges took {rounds} rounds"


def test_batched_parity_on_adversarial_interactions(spark):
    """Corpora built to trip naive batching: merges that CREATE a
    high-count pair which must win the next argmax (the creation
    guard), merged symbols colliding with existing symbols (the
    present-symbol truncation), shared-symbol candidates (the
    disjointness stop), and overlapping same-symbol runs."""
    corpora = [
        # 'ab' merge creates ('ab','c') instances that outrank others
        ["abc " * 9 + "ab " * 2, "abc abq abz"],
        # merged symbol 'aa' already exists? build words where a+a
        # appears both as run overlaps and as later merge input
        ["aaaa aaa aa " * 5, "baa aab"],
        # shared-symbol ladder: (a,b) then (ab,c) then (abc,d)
        ["abcd " * 8, "abce abcf ab a"],
        # ties everywhere: equal counts force lexicographic order
        ["xy yx xz zx " * 3, "x y z xy"],
        # end-marker merges interleaved with letter merges
        ["dog dogs dig digs " * 4, "do dig dog"],
    ]
    for rows in corpora:
        d = spark.createDataFrame([(t,) for t in rows], "text string")
        words = B.words_df(d)
        wc = {r.word: r["count"] for r in words.collect()}
        for n in (6, 14):
            got = B.learn_bpe(words, n_merges=n)
            want = B.learn_bpe_py(wc, n_merges=n)
            assert got == want, f"{rows!r} n={n}: {got} != {want}"


def test_batched_parity_randomized(spark):
    """Seeded random small corpora (alphabet 4, heavy repetition so
    merges interact densely) — exact parity across batch_k settings,
    including batch_k=1 (the pure sequential path)."""
    import random
    rng = random.Random(20260818)
    for trial in range(6):
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 12))]
        text = " ".join(rng.choice(words)
                        for _ in range(rng.randint(20, 60)))
        d = spark.createDataFrame([(text,)], "text string")
        wdf = B.words_df(d)
        wc = {r.word: r["count"] for r in wdf.collect()}
        want = B.learn_bpe_py(wc, n_merges=10)
        for k in (1, 4, 32):
            got = B.learn_bpe(wdf, n_merges=10, batch_k=k)
            assert got == want, (f"trial {trial} k={k}: "
                                 f"{got} != {want} ({text!r})")


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
