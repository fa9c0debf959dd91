"""The end-to-end KG-construction job (north_star): web_pages ->
extracted -> triples (+ entries, dependencies), materialized as
partitioned tables.

Stage layout mirrors the reference's parse/relate actions
(SURVEY.md §3.1/§3.2) with the process/node boundaries replaced by the
Spark scheduler:

  1. pending = anti-join of web_pages against the entries checkpoint
     (exact resume; checkpoint.py)
  2. extract: one narrow mapInPandas pass (operators/extract.py)
  3. triples: six columnar lift branches over the persisted extracted
     table (operators/triples.py)
  4. relate: dependency self-join + skeleton anti-join
     (operators/canonicalize.py)
  5. write: triples partitioned by (pred_bucket, crawl_date) — the
     Iceberg layout from SURVEY §1.3; parquet stand-in locally.

Partitioning rationale (100 TB): predicate frequency is Zipfian, so
partitioning raw ``pred`` would produce a handful of huge partitions;
``pred_bucket = pmod(xxhash64(pred), N_PRED_BUCKETS)`` bounds partition
count while still enabling partition pruning for predicate-filtered
queries.  crawl_date enables incremental-load pruning.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark import checkpoint
from ferenda_spark.operators import canonicalize
from ferenda_spark.operators.extract import extract
from ferenda_spark.operators.triples import all_triples

N_PRED_BUCKETS = 16


def with_partition_cols(triples: DataFrame, warc_ts_by_url: DataFrame) -> DataFrame:
    t = triples.join(warc_ts_by_url, "url", "left")
    return (
        t.withColumn("pred_bucket",
                     F.pmod(F.xxhash64("pred"), F.lit(N_PRED_BUCKETS)))
        .withColumn("crawl_date", F.to_date("warc_ts"))
        .drop("warc_ts")
    )


@dataclass
class RunResult:
    n_pages: int
    n_extracted: int
    n_triples: int
    n_dependencies: int
    wall_s: float


def run(
    spark: SparkSession,
    web_pages: DataFrame,
    commondata: DataFrame,
    out_dir: str,
    entries_path: str | None = None,
    input_partitions: int | None = None,
) -> RunResult:
    t0 = time.time()
    entries = (checkpoint.read_entries(spark, entries_path)
               if entries_path else None)
    todo = checkpoint.pending(web_pages, entries)
    if input_partitions:
        todo = todo.repartition(input_partitions, "url")

    extracted = extract(todo)
    # persist the extract output: 6 lift branches + entries share one scan
    extracted.write.mode("overwrite").parquet(f"{out_dir}/extracted")
    extracted = spark.read.parquet(f"{out_dir}/extracted")
    n_extracted = extracted.count()

    triples = all_triples(extracted, commondata)
    warc_ts = extracted.select("url", "warc_ts")
    partitioned = with_partition_cols(triples, warc_ts)
    (partitioned.write.mode("overwrite")
     .partitionBy("pred_bucket", "crawl_date")
     .parquet(f"{out_dir}/triples"))
    triples_out = spark.read.parquet(f"{out_dir}/triples")
    n_triples = triples_out.count()

    deps = canonicalize.dependency_join(triples_out)
    deps.write.mode("overwrite").parquet(f"{out_dir}/dependencies")
    n_deps = spark.read.parquet(f"{out_dir}/dependencies").count()

    if entries_path:
        checkpoint.append_entries(
            checkpoint.entries_from_extracted(extracted, started_at=t0),
            entries_path)

    return RunResult(
        n_pages=web_pages.count(),
        n_extracted=n_extracted,
        n_triples=n_triples,
        n_dependencies=n_deps,
        wall_s=time.time() - t0,
    )
