"""Structured Streaming surfaces of the engine.

The reference is a continuous while-True micro-batcher
(``darc/process.py:89-119``); the engine's batch loop already mirrors
that with deterministic rounds (SURVEY.md §2.8 chose a batch loop for
exact resume). These streaming pieces cover the genuinely-streaming
edges of the system:

* :class:`SeedStreamIngestor` — continuous seed ingestion: watch a
  directory of seed files (the analogue of darc's remotely-fed Redis
  queue / ``-f`` seed files, ``darc/__main__.py:145-161``), parse +
  classify each micro-batch, enqueue-NX into the frontier via
  ``foreachBatch`` (exactly-once per the store's snapshot commit).
* :func:`fetches_stream` / :func:`hostname_counts_stream` — live crawl
  monitoring: a stream over the append-only fetches segments with
  per-host aggregation (darc's pool-count logging, ``darc/db.py:900``).

File-source streams work because SnapshotStore segments are immutable,
append-only Parquet directories — the same property Iceberg relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from darc_spark.functions.canon import with_parsed_link
from darc_spark.operators.frontier import Frontier
from darc_spark.schema import FETCHES
from darc_spark.sources.store import SnapshotStore


class SeedStreamIngestor:
    """Stream seed URLs from a watched directory into the frontier."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        seed_dir: str,
        stage: str = "requests",
        use_filter: bool = True,
    ) -> None:
        self.spark = spark
        self.store = store
        self.frontier = Frontier(store, stage)
        self.seed_dir = seed_dir
        self.use_filter = use_filter
        self.batches_seen = 0
        os.makedirs(seed_dir, exist_ok=True)

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        urls = batch_df.select(F.col("value").alias("url")).filter(
            (F.trim("url") != "") & ~F.col("url").startswith("#")
        )
        links = with_parsed_link(urls.select(F.trim("url").alias("url"))).withColumn(
            "backref", F.lit(None).cast("string")
        )
        current_round = int(self.store.latest_meta().get("round", -1)) + 1
        self.frontier.enqueue_nx(
            links, current_round, use_filter=self.use_filter
        )
        self.store.commit(
            {"round": current_round - 1, "op": "seed-stream", "epoch": epoch_id}
        )
        self.batches_seen += 1

    def start(self, checkpoint_dir: str) -> StreamingQuery:
        stream = self.spark.readStream.format("text").load(self.seed_dir)
        return (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime="1 second")
            .start()
        )


URL_SEEN_STREAM_OUT = "url string, name string, bucket int"
URL_SEEN_STREAM_STATE = "hashes binary"


def url_seen_dedup_stream(
    spark: SparkSession,
    seed_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    n_buckets: int = 8,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stateful streaming URL-seen dedup — the Structured Streaming
    equivalent of the reference's ZADD-NX (``darc/db.py:555-568``),
    via ``applyInPandasWithState``.

    URLs stream from a watched directory, classify through the
    vectorized parser, and key by a hash bucket of the canonical name;
    each bucket's state holds the packed 64-bit prefixes of every name
    it has admitted, so only first-seen URLs are emitted — across
    micro-batches AND across query restarts (state lives in the
    streaming checkpoint). Per-bucket state is exactly the partitioned
    filter shape the batch engine uses: at 10^10 URLs, state size per
    bucket is bounded by the bucket count knob, not the stream length.

    ``available_now=True`` runs a one-shot drain (process everything
    currently in ``seed_dir``, then terminate) — with
    ``max_files_per_trigger`` the drain still splits into multiple
    micro-batches, so cross-batch state carry is exercised even in a
    bounded run (the shape the oracle gate uses).
    """
    import os as _os

    _os.makedirs(seed_dir, exist_ok=True)
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(seed_dir)
    urls = stream.select(F.trim("value").alias("url")).filter(
        (F.col("url") != "") & ~F.col("url").startswith("#")
    )
    links = with_parsed_link(urls).select("url", "name")
    keyed = links.withColumn(
        "bucket", F.pmod(F.xxhash64("name"), F.lit(n_buckets)).cast("int")
    )

    def dedup(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        if state.exists:
            (blob,) = state.get
            seen = set(np.frombuffer(blob, dtype=np.uint64).tolist())
        else:
            seen = set()
        rows = []
        for pdf in pdf_iter:
            for url, name in zip(pdf["url"], pdf["name"]):
                h = int(name[:16], 16)  # 64-bit prefix of the sha256 name
                if h not in seen:
                    seen.add(h)
                    rows.append((url, name, key[0]))
        state.update(
            (np.array(sorted(seen), dtype=np.uint64).tobytes(),)
        )
        yield pd.DataFrame(rows, columns=["url", "name", "bucket"])

    from pyspark.sql.streaming.state import GroupStateTimeout

    out = keyed.groupBy("bucket").applyInPandasWithState(
        dedup,
        URL_SEEN_STREAM_OUT,
        URL_SEEN_STREAM_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    # parquet sink: fault-tolerant (exactly-once file commit log), so the
    # query RESUMES from the checkpoint — memory sinks cannot recover
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def event_windows_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> StreamingQuery:
    """Watermarked event-time windowed aggregation (late-data handling).

    Streams event rows (``ts`` event-time) from a directory, applies a
    watermark so state for closed windows is dropped, and emits each
    hour×event_type count exactly once when its window finalizes
    (append mode). Events arriving later than the watermark bound are
    DROPPED — the at-scale contract: aggregation state is bounded by
    the watermark horizon, not the stream's history.
    """
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def fetches_stream(spark: SparkSession, store_root: str) -> DataFrame:
    """Streaming view over the append-only fetches segments."""
    path = os.path.join(store_root, "fetches")
    return (
        spark.readStream.schema(FETCHES)
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(path, "seg-*"))
    )


def hostname_counts_stream(
    spark: SparkSession, store_root: str, query_name: str = "host_counts"
) -> StreamingQuery:
    """Live per-host fetch counters → in-memory table ``query_name``."""
    agg = (
        fetches_stream(spark, store_root)
        .groupBy("hostname")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("status_code") < 400, 1).otherwise(0)).alias("n_ok"),
            F.max("fetch_round").alias("last_round"),
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
