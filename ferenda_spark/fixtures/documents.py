"""Distributed synthesis of a LARGE training-corpus documents table —
same schema as the driver's testdata `documents.parquet`
(doc_id BIGINT, text STRING, lang STRING, source STRING,
n_chars BIGINT) but sized for meaningful throughput measurement: the
sf0.1 table holds 5,000 ~300-char rows, where every dedup/quality op is
dominated by fixed task overhead.  `documents_df_dist` materializes any
row count cluster-side (`spark.range` -> `mapInPandas`, generation pure
in (seed, doc_id) — the same pattern as fixtures/webpages.py
`web_pages_df_dist`).

The generated corpus carries the structure the training-data operators
exist to find, at controlled rates:

- zipf-distributed vocabulary (tokenizer/vocab/LM ops see a realistic
  head+tail);
- ~5% exact duplicates and ~8% near duplicates (word-level mutations of
  an earlier document) for the dedup family;
- shared boilerplate lines on ~35% of documents (repeated-line removal);
- occasional emails/phone numbers (PII redaction);
- per-source length/lang skew (mixture, sampling and cap ops).

Duplicate partners point a bounded distance BACK (j < i), so generation
stays embarrassingly parallel — no cross-partition coordination.
"""

from __future__ import annotations

import random

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")

_SYL = ["ba", "co", "den", "el", "fir", "gon", "hal", "in", "jo", "kar",
        "lum", "mer", "nov", "or", "pel", "qui", "ros", "sta", "tur",
        "ul", "ver", "wi", "xan", "yor", "zem"]
_VOCAB_N = 4096
_VOCAB = [
    "".join(_SYL[(k // len(_SYL) ** d) % len(_SYL)]
            for d in range(1 + (k > 600) + (k > 3000)))
    + (str(k % 10) if k % 37 == 0 else "")
    for k in range(_VOCAB_N)
]

_BOILER = [
    "subscribe to our newsletter for weekly updates",
    "copyright 2026 example holdings all rights reserved",
    "click here to accept cookies and continue reading",
    "share this article on your favorite social network",
    "download our app for the full experience",
]

_SOURCES = [  # (alias, weight, mean_words)
    ("news", 6, 180), ("wiki", 3, 320), ("forum", 5, 90),
    ("docs", 2, 260), ("blog", 4, 150), ("legal", 1, 420),
]
_LANGS = [("en", 12), ("fr", 3), ("es", 3), ("de", 2), ("zh", 1)]


def _pick(rng: random.Random, weighted):
    total = sum(w for _, w, *_ in weighted)
    x = rng.random() * total
    for item in weighted:
        x -= item[1]
        if x <= 0:
            return item
    return weighted[-1]


def _zipf_word(rng: random.Random) -> str:
    # inverse-CDF zipf-ish draw: heavy head, long tail
    u = rng.random()
    idx = int(_VOCAB_N ** (u ** 0.35)) - 1
    return _VOCAB[min(max(idx, 0), _VOCAB_N - 1)]


def _base_words(i: int, seed: int) -> tuple[list[str], str, str]:
    """Pure content generator: (words, lang, source) for doc i."""
    rng = random.Random((seed << 21) + i)
    source, _, mean_words = _pick(rng, _SOURCES)
    lang = _pick(rng, _LANGS)[0]
    n = max(12, int(rng.gauss(mean_words, mean_words / 3)))
    words = [_zipf_word(rng) for _ in range(n)]
    if rng.random() < 0.10:  # PII for the redaction ops
        words[rng.randrange(n)] = (
            f"contact{rng.randrange(999)}@example{rng.randrange(9)}.com")
    if rng.random() < 0.05:
        words[rng.randrange(n)] = (f"+1-555-{rng.randrange(1000):03d}-"
                                   f"{rng.randrange(10000):04d}")
    return words, lang, source


def _sentences(words: list[str], rng: random.Random) -> str:
    out, k = [], 0
    while k < len(words):
        step = rng.randint(5, 14)
        sent = " ".join(words[k:k + step])
        out.append(sent[:1].upper() + sent[1:] + ".")
        k += step
    return " ".join(out)


def _non_dup_partner(j: int) -> int:
    """Step j down to the nearest NON-dup doc index: a dup partner must
    itself carry its own base text, or the planted 'duplicate' copies a
    base no stored document has (the chained-dup hole the embeddings
    fixture avoids by construction)."""
    while j > 60 and j % 25 in (3, 7, 15):
        j -= 1
    return j


def gen_doc(i: int, seed: int = 42) -> tuple[int, str, str, str, int]:
    rng = random.Random((seed << 21) + 1_000_003 * i + 7)
    mode = i % 25
    if mode == 7 and i > 60:            # exact duplicate of j (4%)
        j = _non_dup_partner(i - 1 - (i % 47))
        words, lang, source = _base_words(j, seed)
        rng = random.Random((seed << 21) + 1_000_003 * j + 7)
    elif mode in (3, 15) and i > 60:    # near duplicate of j (8%)
        j = _non_dup_partner(i - 1 - (i % 53))
        words, lang, source = _base_words(j, seed)
        words = list(words)
        for _ in range(max(1, len(words) // 30)):
            words[rng.randrange(len(words))] = _zipf_word(rng)
    else:
        words, lang, source = _base_words(i, seed)
    text = _sentences(words, rng)
    if rng.random() < 0.35:             # shared boilerplate lines
        lines = [text, rng.choice(_BOILER)]
        if rng.random() < 0.3:
            lines.insert(0, rng.choice(_BOILER))
        text = "\n".join(lines)
    return i, text, lang, source, len(text)


def documents_df_dist(spark, n: int, seed: int = 42,
                      partitions: int | None = None):
    """Cluster-side synthesis of an n-row documents table (pure in
    (seed, doc_id); any scale)."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [gen_doc(int(i), seed) for i in pdf["id"]],
                columns=["doc_id", "text", "lang", "source", "n_chars"])

    return (spark.range(n).repartition(parts)
            .mapInPandas(gen, DOCS_SCHEMA))
