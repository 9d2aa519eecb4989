"""Structured Streaming tier: continuous frontier ingestion.

The reference's crawl loop is a 3-hour batch cycle (SURVEY.md §2.10,
`/root/reference/main.py:57,571-649`); its streaming-shaped constructs map
directly onto Structured Streaming:

- micro-batch trigger       ← the 3h cycle (`Trigger.AvailableNow`/
                              `processingTime` in production)
- stateful URL dedup        ← `dropDuplicates` on the SURT key with state
                              retention via watermark (the seen set)
- tumbling windows          ← daily/monthly token counters
                              (`token_tracker.py:43-55`)
- checkpoint/resume         ← the heartbeat + seen-cache files
                              (`main.py:262-268`, `seen_tracker.py:67-82`)

``stream_crawl`` wires a file-source frontier stream through
canonicalization → streaming dedup → ``foreachBatch`` (the fetch stage runs
per micro-batch as ordinary batch code — mapInPandas fetch + snapshot
append, so batch and streaming share one implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urlnorm import surt_url, url_host

FRONTIER_STREAM_SCHEMA = (
    "url string, source_id int, feed_rank long, score double, "
    "discovered_at timestamp"
)


def read_frontier_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source frontier stream (new parquet files = discovered URLs)."""
    return (
        spark.readStream.schema(FRONTIER_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def canonicalize_stream(frontier: DataFrame) -> DataFrame:
    return frontier.withColumn("surt_url", surt_url(F.col("url"))).withColumn(
        "host", url_host(F.col("url"))
    )


def dedup_stream(frontier: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful seen-set: first occurrence per SURT key wins, with state
    ACTUALLY bounded by the watermark via dropDuplicatesWithinWatermark
    (plain dropDuplicates([key]) only evicts state when the event-time column
    is part of the dedup keys — per-key state would grow forever at 10^10
    scale). The reference keeps its set forever (`seen_tracker.py:45-51`);
    here re-discoveries past the watermark pass the streaming stage and are
    caught by the durable batch anti-join in foreachBatch."""
    return frontier.withWatermark(
        "discovered_at", watermark
    ).dropDuplicatesWithinWatermark(["surt_url"])


def windowed_host_metrics(frontier: DataFrame, window: str = "1 minute") -> DataFrame:
    """Tumbling-window per-host discovery counts (A5-style rollup)."""
    return (
        frontier.withWatermark("discovered_at", "2 minutes")
        .groupBy(F.window("discovered_at", window).alias("win"), "host")
        .agg(F.count("*").alias("discovered"))
        .select(F.col("win.start").alias("window_start"), "host", "discovered")
    )


def stream_crawl(
    spark: SparkSession,
    input_dir: str,
    corpus_table,
    seen_table,
    checkpoint_dir: str,
    seed: int = 42,
    available_now: bool = True,
):
    """End-to-end streaming crawl: ingest → canonicalize → streaming dedup →
    per-micro-batch fetch + snapshot commit.

    foreachBatch gives each micro-batch to the BATCH fetch path, so the
    engine has exactly one fetch/dedup implementation; the streaming layer
    only adds ingestion, incremental dedup state, and restart-from-
    checkpoint.
    """
    from ..operators.wave import fetch_images

    stream = dedup_stream(canonicalize_stream(read_frontier_stream(spark, input_dir)))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # exact cross-batch dedup against the durable seen table (streaming
        # state handles within-watermark dups; this is the durable layer)
        if seen_table.exists():
            batch_df = batch_df.join(
                seen_table.read().select(F.col("key").alias("surt_url")),
                "surt_url",
                "left_anti",
            )
        scheduled = batch_df.select(
            "url",
            F.concat(F.lit("src"), F.col("source_id").cast("string")).alias(
                "source_name"
            ),
            "source_id",
            F.col("feed_rank").alias("seq"),
        )
        corpus = fetch_images(scheduled, seed=seed, wave=batch_id)
        corpus_table.append(corpus, lineage={"batch_id": batch_id, "op": "stream_fetch"})
        seen_table.append(
            batch_df.select(F.col("surt_url").alias("key")),
            lineage={"batch_id": batch_id, "op": "mark_seen"},
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
