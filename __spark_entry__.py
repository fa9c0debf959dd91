"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship KG triple lift at sf0.001.
queries(): one entry per implemented operator (SURVEY.md §2 + training-
data ops); each callable takes (spark, sf_dir) -> DataFrame.
oracle_sql(): matching DuckDB SQL per query (one declared rows-only
entry: kg_pipeline — FSM + pandas-UDF parse the oracle cannot
express; its correctness gates are the reference-fixture parity
suites.  The multimodal decode is oracle-checked via the
multimodal_meta encode->decode round trip as of round 4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ferenda_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_kg_triples_lift(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ordered, EXACTLY 50 entries (the driver checks the first 50 —
    # capping the registry means none is silently unchecked); further
    # locally-gated twins live in Q.registry_extra()
    return dict(Q.registry())


def oracle_sql() -> dict[str, str]:
    qs = Q.registry()
    return {k: v for k, v in Q.ORACLE.items() if k in qs}
