"""Distributed k-means (IVF coarse-quantizer refresh) — operator tests:
monotonic objective, determinism, empty-cluster guard, plan shape."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators import kmeans as km

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    df = (spark.read.parquet(f"{SF}/embeddings.parquet")
          .select("vec_id", F.col("embedding").cast("array<double>")
                  .alias("v")).cache())
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def init(vecs):
    return (vecs.where("vec_id < 4")
            .select(F.col("vec_id").alias("cent_id"),
                    F.col("v").alias("cv")))


def test_inertia_monotone_nonincreasing(vecs, init):
    prev = km.inertia(vecs, init)
    cents = init
    for _ in range(3):
        cents = km.kmeans(vecs, cents, iterations=1)
        cur = km.inertia(vecs, cents)
        assert cur <= prev + 1e-9, (cur, prev)
        prev = cur


def test_deterministic(vecs, init):
    a = {(r.cent_id, tuple(round(x, 9) for x in r.cv))
         for r in km.kmeans(vecs, init, iterations=2).collect()}
    b = {(r.cent_id, tuple(round(x, 9) for x in r.cv))
         for r in km.kmeans(vecs, init, iterations=2).collect()}
    assert a == b


def test_assignment_partitions_corpus(vecs, init):
    assigned = km.assign_clusters(vecs, init)
    assert assigned.count() == vecs.count()          # every vector once
    assert assigned.select("cluster").distinct().count() <= 4


def test_empty_cluster_keeps_previous_centroid(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)], "vec_id long, v array<double>")
    # centroid 1 is unreachable: every point is closer to centroid 0
    init = spark.createDataFrame(
        [(0, [4.5, 0.0]), (1, [1e6, 1e6])], "cent_id long, cv array<double>")
    out = {r.cent_id: list(r.cv) for r in
           km.kmeans(vecs, init, iterations=1).collect()}
    assert out[1] == [1e6, 1e6]                      # guard kept it
    assert abs(out[0][0] - 4.5) < 1e-9               # mean of 0..9


def test_update_never_shuffles_whole_vectors(vecs, init):
    """The centroid update's exchange carries (cluster, dim) partial
    aggregates; the vector array column must not appear in any shuffle
    (checked via the aggregate running pre-shuffle: partial_avg)."""
    from ferenda_spark import plans
    new = km.update_centroids(km.assign_clusters(vecs, init))
    plan = plans.explain_str(new)
    assert "partial_avg" in plan  # map-side combine before the exchange
