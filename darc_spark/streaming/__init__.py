from darc_spark.streaming.stream import (  # noqa: F401
    SeedStreamIngestor,
    fetches_stream,
    hostname_counts_stream,
    url_seen_dedup_stream,
)
