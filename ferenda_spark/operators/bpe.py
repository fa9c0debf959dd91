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
  2. top-K candidates with a DETERMINISTIC tie-break (count desc,
     then lexicographic pair) — one K-row driver fetch per round,
     like kmeans' K-row centroid fetch;
  3. BATCH the longest candidate prefix that provably equals the
     sequential merge sequence (directional non-interaction +
     brand-new merged symbols + a triple-count bound on pairs each
     merge can CREATE — see learn_bpe), so a 32k-merge vocab takes
     far fewer rounds than merges;
  4. apply the batch inside every word's symbol array — a narrow
     Arrow-batched map over the word table (string splicing over a
     dictionary-sized table is the sanctioned Python-kernel class,
     cf. SemDeDup's dense-LA kernels; the corpus itself is never
     touched again).

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


def _apply_merges(pdfs: Iterator[pd.DataFrame],
                  merge_list: list[tuple[str, str]]
                  ) -> Iterator[pd.DataFrame]:
    """Apply a list of merges inside every symbol sequence, in rank
    order (batched merges are symbol-disjoint, so in-order application
    equals sequential rounds)."""
    for pdf in pdfs:
        out = []
        for syms in pdf["symbols"]:
            syms = list(syms)
            for left, right in merge_list:
                merged = left + right
                i, res = 0, []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.append(syms)
        pdf = pdf.copy()
        pdf["symbols"] = out
        yield pdf


_PAIRS_EXPR = (
    # guard: sequence(0, -1) runs DESCENDING for a fully-merged
    # 1-symbol word, indexing symbols[-1] (ANSI error)
    "CASE WHEN size(symbols) < 2 THEN "
    "array()::array<struct<l:string,r:string>> "
    "ELSE transform(sequence(0, size(symbols) - 2), "
    "i -> struct(symbols[i] AS l, symbols[i + 1] AS r)) END")

_TRIPLES_EXPR = (
    "CASE WHEN size(symbols) < 3 THEN "
    "array()::array<struct<a:string,b:string,c:string>> "
    "ELSE transform(sequence(0, size(symbols) - 3), "
    "i -> struct(symbols[i] AS a, symbols[i + 1] AS b, "
    "symbols[i + 2] AS c)) END")


def _new_pair_bounds(tbl: DataFrame,
                     batch: list[tuple[str, str, int]]) -> dict[int, int]:
    """Per batch member j, an upper bound M_j on the count of ANY pair
    instance its merge can CREATE: new pairs involve the merged symbol
    m_j as left or right member, and each instance comes from a triple
    (x, l_j, r_j) or (l_j, r_j, y) in the pre-merge table — so the max
    per-(neighbor, side) triple-group count bounds every new pair's
    count (pairs combining two merged symbols arise from quadruples, a
    subset of either side's triples).  One JVM-side job; the batch
    rides a broadcast."""
    spark = tbl.sparkSession
    bdf = F.broadcast(spark.createDataFrame(
        [(j, l, r) for j, (l, r, _n) in enumerate(batch)],
        "j int, bl string, br string"))
    t = tbl.select("count", F.explode(F.expr(_TRIPLES_EXPR)).alias("t"))
    lefts = (t.join(bdf, (t["t.b"] == bdf.bl) & (t["t.c"] == bdf.br))
             .groupBy("j", F.col("t.a").alias("nb"))
             .agg(F.sum("count").alias("c")))
    rights = (t.join(bdf, (t["t.a"] == bdf.bl) & (t["t.b"] == bdf.br))
              .groupBy("j", F.col("t.c").alias("nb"))
              .agg(F.sum("count").alias("c")))
    # left- and right-neighbor groups are distinct pair groups: union
    # AFTER aggregation, never summed across sides; max per j
    rows = (lefts.union(rights).groupBy("j")
            .agg(F.max("c").alias("m")).collect())
    return {r.j: int(r.m) for r in rows}


def learn_bpe(words: DataFrame, n_merges: int,
              checkpoint_every: int = 4,
              batch_k: int = 32) -> list[tuple[str, str]]:
    """(word, count) table -> ordered merge list [(left, right), ...].

    Scale shape (VERDICT r04 #1): instead of one Spark round per merge
    (32k sequential rounds for a production vocab), each round applies
    a PREFIX of the rank-ordered top-`batch_k` candidate pairs that is
    provably equal to what single-merge rounds would produce:

    * prefix-stop at the first candidate an earlier member could
      interact with: merging (l_j, r_j) destroys instances only of
      pairs with left == r_j or right == l_j, so a candidate is
      count-invariant iff its left avoids {r_j, m_j} and its right
      avoids {l_j, m_j} for every earlier member (same-left pairs
      batch together);
    * stop AFTER a member whose merged string already exists as a
      symbol — its merge can inflate existing pairs' counts, so later
      candidates' ranks are no longer trustworthy (the member itself
      is still the exact argmax);
    * every later member's count must STRICTLY exceed max M_j over
      earlier members (see _new_pair_bounds) — no pair CREATED by an
      earlier merge in the batch can out-rank it.

    Under those three invariants every batched pair's count is
    unchanged by the earlier merges and nothing new or excluded can
    overtake it, so the batch is exactly the sequential merge
    sequence.  Candidate counts drop Zipf-fast, so early rounds batch
    near batch_k merges and the round count is typically O(hundreds)
    for a 32k vocab instead of 32k.  Exactness gate: tests/test_bpe.py
    parity with learn_bpe_py, including adversarial interaction
    corpora.

    Cost model (measured, r5): a round is 2 dictionary-sized jobs
    (pair-count agg + creation-bound scan; the symbol-exists probe is
    a driver-side overapproximate set, no job) vs 1 for a single-merge
    round — so batching wins once it at least halves the round count,
    which Zipfian candidate tables do immediately at real vocab sizes.
    On the 31-word bench fixture the two modes are within noise of
    each other (12 merges: 6 rounds/~5.6 s vs 12 rounds/~4.7 s warm);
    the batch path is kept because the 32k-merge production run is
    round-count-bound, not per-round-bound."""
    merges, _rounds = learn_bpe_stats(words, n_merges,
                                      checkpoint_every, batch_k)
    return merges


def learn_bpe_stats(words: DataFrame, n_merges: int,
                    checkpoint_every: int = 4, batch_k: int = 32
                    ) -> tuple[list[tuple[str, str]], int]:
    """learn_bpe, also returning the number of Spark rounds taken
    (the rounds-<<-merges gate)."""
    tbl = words.select(
        "count",
        F.concat(F.split("word", ""), F.array(F.lit(END)))
        .alias("symbols")).localCheckpoint()
    # monotone OVERAPPROXIMATION of the symbol set: seed chars (one
    # dictionary-sized job, once) + every symbol a merge ever created.
    # A symbol later merged away stays in the set, which can only
    # truncate a batch EARLIER than the exact table probe would — a
    # shorter prefix is still exactly the sequential sequence, and the
    # per-round Spark job the probe used to cost is gone (VERDICT r04
    # #1 follow-up: the probe re-executed the pair-count aggregation).
    known_symbols = set(
        r.s for r in tbl.select(
            F.explode("symbols").alias("s")).distinct().collect())
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        pair_counts = (tbl.select("count",
                                  F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
                       .groupBy("p.l", "p.r")
                       .agg(F.sum("count").alias("n")))
        cands = [(r.l, r.r, int(r.n)) for r in
                 (pair_counts.orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                  .limit(batch_k).collect())]
        if not cands or cands[0][2] < 2:
            break
        rounds += 1
        # greedy non-interacting prefix (stop at first conflict — a
        # skipped candidate would reorder the sequential sequence).
        # Merging (l_j, r_j) destroys instances only of pairs whose
        # LEFT member is r_j or whose RIGHT member is l_j (plus the
        # pair itself), and creates only pairs mentioning m_j — so a
        # later candidate's count is exactly unchanged iff its left
        # avoids {r_j, m_j} and its right avoids {l_j, m_j} for every
        # earlier member j.  Same-left pairs like (e,r)+(e,x) batch
        # together fine.
        limit = n_merges - len(merges)
        batch: list[tuple[str, str, int]] = []
        used_l: set[str] = set()
        used_r: set[str] = set()
        used_m: set[str] = set()
        for l, r, n in cands:
            if n < 2 or len(batch) >= limit:
                break
            if batch and (l in used_r or l in used_m
                          or r in used_l or r in used_m):
                break
            batch.append((l, r, n))
            used_l.add(l)
            used_r.add(r)
            used_m.add(l + r)
        if len(batch) > 1:
            # truncate after the first member whose merged symbol may
            # already exist (driver-side overapproximate set — no job)
            for i, (l, r, _n) in enumerate(batch):
                if l + r in known_symbols:
                    batch = batch[:i + 1]
                    break
        if len(batch) > 1:
            # creation guard: count(p_i) must strictly beat every
            # earlier member's new-pair bound
            bounds = _new_pair_bounds(tbl, batch[:-1])
            keep, cummax = 1, bounds.get(0, 0)
            for i in range(1, len(batch)):
                if batch[i][2] > cummax:
                    keep = i + 1
                    cummax = max(cummax, bounds.get(i, 0))
                else:
                    break
            batch = batch[:keep]
        step = [(l, r) for l, r, _n in batch]
        merges.extend(step)
        known_symbols.update(l + r for l, r in step)
        tbl = tbl.mapInPandas(
            lambda it, _m=step: _apply_merges(it, _m),
            "count long, symbols array<string>")
        if rounds % checkpoint_every == 0:
            tbl = tbl.localCheckpoint()
    return merges, rounds


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
