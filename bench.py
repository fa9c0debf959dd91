"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Extras (informational, per BASELINE.md protocol):
- kg_docs_per_sec: throughput of the full KG pipeline (north-star metric)
- scaling: same KG job at local[8] vs local[cpus], efficiency =
  (T8/TN)/(N/8)  — the sandbox proxy for N vs 4N executors (north_rule)

Set SPARK_GRAFT_SCALING=0 to skip the scaling run (it restarts the JVM).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_PAGES = int(os.environ.get("SPARK_GRAFT_KG_PAGES", "3000"))

BENCH_QUERIES = [
    "kg_triples_lift",
    "kg_facet_pivot",
    "kg_stats_counts",
    "facet_toc_pages_topn",
    "news_feeds_topn",
    "status_report",
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_lsh_pairs",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality_score",
    "doc_fingerprint",
    "entity_link",
    "dependency_join",
    "tpch_q1_pricing",
]


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def run_kg_pipeline(spark, n_pages: int) -> tuple[float, int]:
    """Full extract -> triples over the synthetic web_pages corpus;
    returns (wall_s, n_pages)."""
    from ferenda_spark.fixtures.webpages import commondata_df, web_pages_df
    from ferenda_spark.operators.extract import extract
    from ferenda_spark.operators.triples import all_triples

    pages = web_pages_df(spark, n_pages).repartition(CPUS * 2, "url")
    pages.persist()
    pages.count()  # exclude fixture synthesis from the timed section
    t0 = time.time()
    extracted = extract(pages)
    extracted.persist()
    extracted.count()
    _noop_write(all_triples(extracted, commondata_df(spark)))
    wall = time.time() - t0
    extracted.unpersist()
    pages.unpersist()
    return wall, n_pages


def bench_at(cores: int, include_queries: bool) -> dict:
    from ferenda_spark import queries as Q
    from ferenda_spark.session import get_spark

    spark = get_spark(f"bench_{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    out: dict = {}
    kg_wall, n_pages = run_kg_pipeline(spark, KG_PAGES)
    out["kg_pipeline"] = {"sec": round(kg_wall, 3),
                          "docs_per_sec": round(n_pages / kg_wall, 1)}
    if include_queries:
        reg = Q.registry()
        out["queries"] = {}
        for name in BENCH_QUERIES:
            t0 = time.time()
            _noop_write(reg[name](spark, SF_DIR))
            out["queries"][name] = round(time.time() - t0, 3)
    spark.stop()
    return out


def main():
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    res_n = bench_at(CPUS, include_queries=True)
    queries = dict(res_n["queries"])
    queries["kg_pipeline"] = res_n["kg_pipeline"]["sec"]
    total = round(sum(queries.values()), 3)

    extras: dict = {"kg_docs_per_sec": res_n["kg_pipeline"]["docs_per_sec"]}
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0" and CPUS > 8:
        res_8 = bench_at(8, include_queries=False)
        t8, tn = res_8["kg_pipeline"]["sec"], res_n["kg_pipeline"]["sec"]
        speedup = t8 / tn
        extras["scaling"] = {
            "cores_low": 8, "cores_high": CPUS,
            "kg_sec_low": t8, "kg_sec_high": tn,
            "docs_per_sec_low": res_8["kg_pipeline"]["docs_per_sec"],
            "docs_per_sec_high": res_n["kg_pipeline"]["docs_per_sec"],
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (CPUS / 8), 3),
        }

    print(json.dumps({
        "metric": "kg-construct suite wall-clock (extract+triples pipeline "
                  "+ operator queries)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }))


if __name__ == "__main__":
    main()
