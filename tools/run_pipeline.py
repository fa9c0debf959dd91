"""Production job entrypoint: the full KG-construction pipeline via

    zip -r ferenda_spark.zip ferenda_spark
    spark-submit --py-files ferenda_spark.zip tools/run_pipeline.py \
        --pages <input parquet dir/table> --out <output dir> \
        [--entries <checkpoint dir>] [--partitions N] [--synth N] \
        [--warc <dir of .warc/.warc.gz>]

On a cluster, drop the local master: spark-submit's own --master /
executor flags control the topology; this script only declares the
job.  `--synth N` replaces --pages with N deterministic synthetic
pages (smoke runs without input data).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="input web_pages parquet path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--entries", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--synth", type=int, default=None,
                    help="use N synthetic pages instead of --pages")
    ap.add_argument("--warc", default=None,
                    help="ingest Common-Crawl-layout WARC files as the "
                         "page source (sources/warc.py)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ferenda_spark_pipeline").getOrCreate()

    from ferenda_spark import pipeline
    from ferenda_spark.fixtures.webpages import commondata_df, web_pages_df_dist

    if args.synth:
        pages = web_pages_df_dist(spark, args.synth)
    elif args.warc:
        from ferenda_spark.sources.warc import (read_warc_df,
                                                warc_to_web_pages)
        pages = warc_to_web_pages(read_warc_df(spark, args.warc))
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages / --synth / --warc is required")

    res = pipeline.run(spark, pages, commondata_df(spark), args.out,
                       entries_path=args.entries,
                       input_partitions=args.partitions)
    print(json.dumps({
        "n_pages": res.n_pages, "n_extracted": res.n_extracted,
        "n_triples": res.n_triples, "n_triples_total": res.n_triples_total,
        "n_dependencies": res.n_dependencies, "batch": res.batch,
        "wall_s": round(res.wall_s, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
