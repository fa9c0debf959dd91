"""Distributed BPE merge learning — tokenizer TRAINING (Sennrich et
al. 2016), completing the engine's tokenizer stack (vocab top-K,
BPE-style pre-tokenization, tokenize-to-ids are query rows already).

Algorithm, Spark-first: BPE learns from the WORD-FREQUENCY DICTIONARY,
not the corpus stream — so the corpus is touched ONCE (pretokenize +
groupBy word), and every merge round runs over the distinct-word
table (orders of magnitude smaller; ~10^7-10^8 rows for a web corpus
vs 10^12 docs).  Each round is:

  1. adjacent-pair counts: explode each word's symbol sequence into
     (pair, word_count) and aggregate — map-side combine does the
     heavy lifting, the shuffle carries distinct pairs only;
  2. argmax pair with a DETERMINISTIC tie-break (count desc, then
     lexicographic pair) — one 1-row driver fetch per round, like
     kmeans' K-row centroid fetch;
  3. merge that single pair inside every word's symbol array — a
     narrow Arrow-batched map over the word table (string splicing
     over a dictionary-sized table is the sanctioned Python-kernel
     class, cf. SemDeDup's dense-LA kernels; the corpus itself is
     never touched again).

Lineage is truncated every few rounds (localCheckpoint) — the same
iterative-algorithm discipline as dedup_clusters/kmeans.

Correctness gate: EXACT parity with the pure-Python reference
implementation (learn_bpe_py below) on the fixture corpus —
tests/test_bpe.py; rows-only at the registry layer (a merge loop is
not SQL-expressible).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"   # end-of-word marker (standard BPE: merges can't cross words)


def words_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, count) dictionary: the ONE corpus-wide pass."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')")
    return (docs.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count("*").alias("count")))


def _merge_batch(pdfs: Iterator[pd.DataFrame],
                 left: str, right: str) -> Iterator[pd.DataFrame]:
    merged = left + right
    for pdf in pdfs:
        out = []
        for syms in pdf["symbols"]:
            syms = list(syms)
            i, res = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        pdf = pdf.copy()
        pdf["symbols"] = out
        yield pdf


def learn_bpe(words: DataFrame, n_merges: int,
              checkpoint_every: int = 4) -> list[tuple[str, str]]:
    """(word, count) table -> ordered merge list [(left, right), ...]."""
    tbl = words.select(
        "count",
        F.concat(F.split("word", ""), F.array(F.lit(END)))
        .alias("symbols")).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        # guard: sequence(0, -1) runs DESCENDING for a fully-merged
        # 1-symbol word, indexing symbols[-1] (ANSI error)
        pairs = F.expr(
            "CASE WHEN size(symbols) < 2 THEN "
            "array()::array<struct<l:string,r:string>> "
            "ELSE transform(sequence(0, size(symbols) - 2), "
            "i -> struct(symbols[i] AS l, symbols[i + 1] AS r)) END")
        top = (tbl.select("count", F.explode(pairs).alias("p"))
               .groupBy("p.l", "p.r")
               .agg(F.sum("count").alias("n"))
               .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
               .limit(1).collect())
        if not top or top[0].n < 2:
            break
        left, right = top[0].l, top[0].r
        merges.append((left, right))
        tbl = tbl.mapInPandas(
            lambda it, _l=left, _r=right: _merge_batch(it, _l, _r),
            "count long, symbols array<string>")
        if (r + 1) % checkpoint_every == 0:
            tbl = tbl.localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank long, left string, right string, merged string")


def encode_word_py(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical BPE inference: repeatedly merge the LOWEST-RANK
    adjacent pair until none applies (equivalent to replaying the
    learned merges in order)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_words(words: DataFrame,
                 merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges to the word DICTIONARY — again never the
    corpus stream: each distinct word encodes once, and the corpus
    picks its pieces up by a broadcast join on the word column.
    Narrow Arrow map; the ranks table rides the closure (a few KB;
    a production vocab broadcasts the same way)."""
    ranks = {m: i for i, m in enumerate(merges)}

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            pieces = [encode_word_py(w, ranks) for w in pdf["word"]]
            yield pd.DataFrame({
                "word": pdf["word"], "count": pdf["count"],
                "pieces": pieces,
                "n_pieces": [len(p) for p in pieces]})

    return words.mapInPandas(
        gen, "word string, count long, pieces array<string>, n_pieces long")


# ---------------------------------------------------------------------------
# pure-Python reference twin (the parity gate)


def learn_bpe_py(word_counts: dict[str, int],
                 n_merges: int) -> list[tuple[str, str]]:
    vocab = {tuple(w) + (END,): c for w, c in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (left, right), _n = best
        merges.append((left, right))
        new_vocab = {}
        for syms, c in vocab.items():
            i, res = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + c
        vocab = new_vocab
    return merges
