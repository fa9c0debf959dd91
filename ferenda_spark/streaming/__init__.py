from ferenda_spark.streaming.ingest import (  # noqa: F401
    stream_triples_to,
    stream_web_pages,
    windowed_event_counts,
)
