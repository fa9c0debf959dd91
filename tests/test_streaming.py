"""Structured Streaming ingestion path: file-source -> extract ->
triples appended per micro-batch; watermarked windowed agg."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark import streaming as ST
from ferenda_spark.fixtures.webpages import commondata_df, web_pages_df
from ferenda_spark.operators.extract import extract
from ferenda_spark.operators.triples import all_triples


def test_stream_triples_matches_batch(spark, tmp_path):
    n = 12
    src = str(tmp_path / "pages")
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    pages = web_pages_df(spark, n)
    # two "arrivals" (files) to force multiple input splits
    pages.where(F.crc32("url") % 2 == 0).write.parquet(src + "/a")
    pages.where(F.crc32("url") % 2 == 1).write.parquet(src + "/b")
    # file source reads a flat dir; re-land as one dir of files
    flat = str(tmp_path / "flat")
    spark.read.parquet(src + "/a", src + "/b").write.parquet(flat)

    q = ST.stream_triples_to(
        ST.stream_web_pages(spark, flat), commondata_df(spark),
        out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = all_triples(extract(pages), commondata_df(spark))
    gs = {tuple(r) for r in got.drop("stream_batch").collect()}
    ws = {tuple(r) for r in want.collect()}
    assert gs == ws

    # exactly-once: restarting the stream over the same files with the
    # same checkpoint must append NOTHING
    q2 = ST.stream_triples_to(
        ST.stream_web_pages(spark, flat), commondata_df(spark),
        out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == len(gs)


def test_windowed_event_counts_stream(spark, tmp_path):
    src = str(tmp_path / "events")
    events = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:15:00", "click", 1.5) for i in range(9)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    events.write.parquet(src)

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string, "
                      "value double")
              .parquet(src))
    agg = ST.windowed_event_counts(stream)
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(60)

    rows = {(str(r.window_start), r.event_type): (r.n, float(r.sum_value))
            for r in spark.sql("select * from win_counts").collect()}
    assert rows == {
        ("2024-01-01 00:00:00", "click"): (3, 4.5),
        ("2024-01-01 01:00:00", "click"): (3, 4.5),
        ("2024-01-01 02:00:00", "click"): (3, 4.5),
    }


def test_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: a url re-crawled with the SAME bytes is
    dropped in a later micro-batch; changed bytes pass through."""
    from ferenda_spark.streaming.stateful import dedup_pages_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def land(rows):
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
                  "text string, lang string"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        stream = (spark.readStream
                  .schema("url string, warc_ts timestamp, html binary, "
                          "text string, lang string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src))

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (dedup_pages_stream(stream)
             .writeStream.foreachBatch(sink)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: two urls
    land([("u1", None, b"<html>A</html>", None, None),
          ("u2", None, b"<html>B</html>", None, None)])
    run_stream()
    assert spark.read.parquet(out).count() == 2

    # batch 2: u1 unchanged (dropped), u2 changed (kept), u3 new (kept)
    land([("u1", None, b"<html>A</html>", None, None),
          ("u2", None, b"<html>B2</html>", None, None),
          ("u3", None, b"<html>C</html>", None, None)])
    run_stream()
    got = {(r.url, bytes(r.html)) for r in spark.read.parquet(out).collect()}
    assert got == {("u1", b"<html>A</html>"), ("u2", b"<html>B</html>"),
                   ("u2", b"<html>B2</html>"), ("u3", b"<html>C</html>")}
