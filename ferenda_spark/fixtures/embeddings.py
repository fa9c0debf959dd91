"""Distributed synthesis of a LARGE embeddings table — same schema as
the driver's testdata `embeddings.parquet` (vec_id BIGINT,
embedding FLOAT[dim], label INT) but sized for meaningful
similarity-search throughput measurement (the sf0.1 table holds 2,000
vectors).  `embeddings_df_dist` materializes any row count
cluster-side (`spark.range` -> `mapInPandas`, generation pure in
(seed, vec_id) — the same pattern as fixtures/documents.py).

Structure the similarity operators exist to find, at controlled rates:

- `n_cent` well-separated unit centroids; vector i belongs to cluster
  i % n_cent (so vec_id 0..n_cent-1 cover every cluster — the
  deterministic centroid stand-ins the IVF/SemDeDup queries use);
- within-cluster noise sigma 0.35 (cluster-mates land around cosine
  ~0.8 — candidates, not dups);
- ~3% near-duplicates: the same base vector as an earlier j < i plus
  sigma 0.01 noise (cosine ~0.999 — what SemDeDup must find).
"""

from __future__ import annotations

import numpy as np

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"

_DIM = 64
_NOISE = 0.35
_DUP_NOISE = 0.01


def _centroid(c: int, seed: int) -> np.ndarray:
    v = np.random.default_rng((seed << 24) + c).standard_normal(_DIM)
    return v / np.linalg.norm(v)


def _base_vec(i: int, n_cent: int, seed: int) -> tuple[np.ndarray, int]:
    c = i % n_cent
    rng = np.random.default_rng((seed << 22) + 2_000_003 * i + 11)
    return _centroid(c, seed) + _NOISE * rng.standard_normal(_DIM), c


def gen_vec(i: int, n_cent: int = 256,
            seed: int = 42) -> tuple[int, np.ndarray, int]:
    if i % 31 == 7 and i >= 4 * n_cent:  # near-duplicate of j (~3%)
        j = i - n_cent * (1 + (i % 3))   # same cluster, bounded lookback
        v, c = _base_vec(j, n_cent, seed)
        rng = np.random.default_rng((seed << 22) + 2_000_003 * i + 13)
        v = v + _DUP_NOISE * rng.standard_normal(_DIM)
    else:
        v, c = _base_vec(i, n_cent, seed)
    return i, v.astype(np.float32), c


def embeddings_df_dist(spark, n: int, n_cent: int = 256, seed: int = 42,
                       partitions: int | None = None):
    """Cluster-side synthesis of an n-row embeddings table (pure in
    (seed, vec_id); any scale)."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        for pdf in batches:
            rows = [gen_vec(int(i), n_cent, seed) for i in pdf["id"]]
            yield pd.DataFrame(
                {"vec_id": [r[0] for r in rows],
                 "embedding": [r[1] for r in rows],
                 "label": [r[2] for r in rows]})

    return (spark.range(n).repartition(parts)
            .mapInPandas(gen, EMB_SCHEMA))
