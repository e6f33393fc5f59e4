from gopensearch_spark.streaming.ingest import (  # noqa: F401
    WEB_PAGES_SCHEMA,
    index_stream_available_now,
    start_streaming_index,
)
