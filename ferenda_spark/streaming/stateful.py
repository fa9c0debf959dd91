"""Custom stateful streaming operator: cross-micro-batch first-seen
dedup via ``applyInPandasWithState`` — the streaming generalization of
the batch ``entries`` checkpoint (a url already seen, with the same
content hash, is dropped from later micro-batches).

This is the task-brief pattern for operators Spark lacks natively:
grouped state + Arrow-batched pandas logic, no per-row Python dispatch.
State per url group = the set of content hashes already emitted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("html", T.BinaryType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("seen_hashes", T.ArrayType(T.StringType())),
])


def _dedup_group(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out_rows = []
    for pdf in pdfs:
        for url, html in zip(pdf["url"], pdf["html"]):
            data = bytes(html) if html is not None else b""
            md5 = hashlib.md5(data).hexdigest()
            if md5 not in seen:
                seen.add(md5)
                out_rows.append({"url": url, "content_md5": md5,
                                 "html": data})
    state.update((sorted(seen),))
    if out_rows:
        yield pd.DataFrame(out_rows,
                           columns=[f.name for f in DEDUP_OUT_SCHEMA.fields])


def dedup_pages_stream(pages_stream: DataFrame) -> DataFrame:
    """First-seen-wins page dedup across the whole stream lifetime.
    Grouped by url => state is partitioned by the natural key; hot urls
    never serialize more than their own hash set."""
    return (pages_stream
            .select("url", "html")
            .groupBy("url")
            .applyInPandasWithState(
                _dedup_group,
                outputStructType=DEDUP_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
