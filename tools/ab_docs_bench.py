"""Interleaved A/B for docs_bench queries across two git trees.

VERDICT r04 "What's wrong" #2: four docs_bench readings regressed
r3->r4 (dedup_substring_spans, dedup_simhash_band_pairs_prod,
dedup_semantic_prod, corpus_prepare_chain) but three of the four paths
are code-identical since r3 and the VM's steal variance swung 2.6-3.6x
in the same windows.  The repo protocol (BASELINE.md §3) forbids
trusting sequential single-session A/Bs, so this tool runs the proper
experiment: arm A = the r3-end tree (git worktree), arm B = HEAD, both
reading the SAME synthesized parquet, alternated A,B / B,A / A,B / B,A
in fresh JVM subprocesses so hypervisor drift cancels across pairs
instead of loading onto one arm.

Usage:
    python tools/ab_docs_bench.py [n_docs] [pairs]        # parent
    python tools/ab_docs_bench.py --child <repo> <data> <cores> <names>

Prints one JSON line: per-query readings per arm, medians, and the
B/A throughput ratio (ratio ~1.0 => r4 regression readings were steal
noise; ratio <1 on corpus_prepare_chain isolates the two-pass packing
overhead from the noise).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
R3_COMMIT = "3239a53"  # round 3: verdict/advice/correctness/bench
QUERIES = ["dedup_substring_spans", "dedup_simhash_band_pairs_prod",
           "dedup_semantic_prod", "corpus_prepare_chain"]


def child(repo: str, data_dir: str, cores: int, names: list[str]) -> None:
    sys.path.insert(0, repo)
    from ferenda_spark import queries as Q
    from ferenda_spark.session import get_spark

    spark = get_spark("ab_docs", cores=cores,
                      shuffle_partitions=max(cores, 8))
    reg = {**Q.registry(), **Q.registry_extra()}
    out: dict = {}
    for name in names:
        fn = reg[name]
        # run 1 = warmup (codegen + python workers), best of runs 2-3
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            fn(spark, data_dir).write.format("noop").mode(
                "overwrite").save()
            if i:
                best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps(out))


def run_arm(repo: str, data_dir: str, cores: int) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", repo,
         data_dir, str(cores), ",".join(QUERIES)],
        capture_output=True, text=True, timeout=1800, cwd=repo)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if r.returncode != 0 or not lines:
        raise RuntimeError(f"arm {repo} failed rc={r.returncode}: "
                           f"{r.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    wt = tempfile.mkdtemp(prefix="ab_r3_")
    subprocess.run(["git", "worktree", "add", "--detach", wt, R3_COMMIT],
                   cwd=REPO, check=True, capture_output=True)
    try:
        with tempfile.TemporaryDirectory() as td:
            sys.path.insert(0, REPO)
            from ferenda_spark.fixtures.documents import documents_df_dist
            from ferenda_spark.fixtures.embeddings import embeddings_df_dist
            from ferenda_spark.session import get_spark

            spark = get_spark("ab_synth", cores=cores)
            (documents_df_dist(spark, n_docs)
             .write.mode("overwrite").parquet(f"{td}/documents.parquet"))
            (embeddings_df_dist(spark, n_docs)
             .write.mode("overwrite").parquet(f"{td}/embeddings.parquet"))
            spark.stop()

            arms = {"A_r3": wt, "B_head": REPO}
            readings: dict = {a: {q: [] for q in QUERIES} for a in arms}
            for p in range(pairs):
                order = ["A_r3", "B_head"] if p % 2 == 0 else \
                        ["B_head", "A_r3"]
                for arm in order:
                    res = run_arm(arms[arm], td, cores)
                    for q, sec in res.items():
                        readings[arm][q].append(sec)
                    print(f"# pair {p} {arm}: {res}", file=sys.stderr)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)

    med = {a: {q: round(statistics.median(v), 3)
               for q, v in qs.items()} for a, qs in readings.items()}
    print(json.dumps({
        "n_docs": n_docs, "pairs": pairs, "cores": cores,
        "readings": readings, "median": med,
        "throughput_ratio_B_over_A": {
            q: round(med["A_r3"][q] / med["B_head"][q], 3)
            for q in QUERIES},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], int(sys.argv[4]),
              sys.argv[5].split(","))
    else:
        main()
