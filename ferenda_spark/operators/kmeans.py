"""Distributed Lloyd k-means over an embedding column — the coarse
quantizer refresh for the IVF ANN path (SURVEY.md training-data ops;
q_ann_ivf_topk uses deterministic seed centroids at query time and
declares the refresh an offline job: THIS is that job).

Pure DataFrame ops, one shuffle per iteration:

  assign:  cross join vs broadcast centroids -> argmin distance
           (centroids are k rows — always broadcastable)
  update:  posexplode(vec) -> groupBy(cluster, dim) avg -> regroup to
           arrays (map-side partial aggregation applies; the shuffle
           carries (cluster, dim, partial sums), never raw vectors)

At 10^9 vectors each iteration is one scan + one k*dim-sized
aggregation — the canonical scalable k-means shape (a k-means|| style
seeding can feed `init_centroids`).  No collect() of the vector table;
only the k centroid rows ever reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sq_dist(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """vecs(vec_id, v) x centroids(cent_id, cv) -> (vec_id, v, cluster,
    dist).  Ties break on cent_id for determinism."""
    scored = (vecs.join(F.broadcast(centroids))
              .withColumn("dist", _sq_dist(F.col("v"), F.col("cv"))))
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cent_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select("vec_id", "v", F.col("cent_id").alias("cluster"),
                    "dist"))


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Element-wise mean per cluster without ever shuffling whole
    vectors: posexplode -> (cluster, dim) partial avg -> array_agg in
    dim order."""
    dims = assigned.select(
        "cluster", F.posexplode("v").alias("dim", "x"))
    means = dims.groupBy("cluster", "dim").agg(F.avg("x").alias("m"))
    return (means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                 .alias("dm"))
            .select(F.col("cluster").alias("cent_id"),
                    F.transform("dm", lambda s: s["m"]).alias("cv")))


def kmeans(vecs: DataFrame, init_centroids: DataFrame,
           iterations: int = 5) -> DataFrame:
    """Lloyd iterations; returns the final centroids(cent_id, cv).
    Empty clusters keep their previous centroid (standard guard)."""
    centroids = init_centroids
    for _ in range(iterations):
        new = update_centroids(assign_clusters(vecs, centroids))
        # empty-cluster guard: fall back to the previous centroid
        centroids = (centroids.alias("old")
                     .join(new.alias("new"), "cent_id", "left")
                     .select("cent_id",
                             F.coalesce("new.cv", "old.cv").alias("cv")))
    return centroids


def inertia(vecs: DataFrame, centroids: DataFrame) -> float:
    """Sum of squared distances to the assigned centroid (the k-means
    objective; must be non-increasing across Lloyd iterations)."""
    return assign_clusters(vecs, centroids).agg(
        F.sum("dist").alias("s")).collect()[0]["s"]
