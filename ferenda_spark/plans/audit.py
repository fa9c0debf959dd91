"""Physical-plan audit helpers: the ".explain() and iterate" loop
(task brief / SURVEY.md §4) made assertable.

Tests use these to pin the *plan shape*, not just results: filters
reach the parquet scan (PushedFilters), column pruning happens
(ReadSchema), small dims broadcast, shuffles don't multiply, and the
hot path stays inside WholeStageCodegen.  A plan regression then fails
CI even while results remain correct.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True iff a scan's PushedFilters mentions ``fragment``."""
    plan = explain_str(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (pruning check)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def has_partition_filter(df: DataFrame, fragment: str) -> bool:
    """True iff a scan's PartitionFilters mentions ``fragment`` —
    i.e. the filter prunes whole partitions, not just row groups."""
    plan = explain_str(df)
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, mode="simple")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle (hash/range) exchanges in the plan — the thing
    to MINIMIZE; broadcast exchanges are not counted."""
    plan = explain_str(df, mode="simple")
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def wholestage_codegen_count(df: DataFrame) -> int:
    plan = explain_str(df, mode="simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def executed_plan_str(df: DataFrame) -> str:
    """The FINAL adaptive plan, after running the query — the only
    place AQE decisions (runtime ReusedExchange, coalesced reads,
    skew-join splits) are visible; the pre-execution explain shows
    isFinalPlan=false without them."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()
