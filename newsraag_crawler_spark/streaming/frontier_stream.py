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
    delay_s: float = 1.0,
    schedule_table=None,
):
    """End-to-end streaming crawl: ingest → canonicalize → stateful per-host
    rate limiter → per-micro-batch dedup + fetch + snapshot commit.

    Politeness is enforced IN the stream (r3 VERDICT #9): the
    applyInPandasWithState token bucket (streaming.stateful) assigns every
    URL a per-host slot ≥ delay_s after the host's previous one, with the
    bucket persisted across micro-batches and checkpoint restarts — the
    exact cure for the reference RateLimiter's reset-per-run shape
    (`rate_limiter.py:20`).

    The limiter is deliberately the ONLY streaming-stateful operator:
    Structured Streaming does not support chaining applyInPandasWithState
    behind another stateful op (e.g. dropDuplicatesWithinWatermark), so
    dedup lives where it is already exact — dropDuplicates on the SURT key
    inside the micro-batch plus the durable seen-table anti-join across
    batches (foreachBatch batches commit serially, so batch N+1 always
    sees batch N's keys). ``dedup_stream`` remains available for
    fetch-free pipelines that want early in-stream dedup.

    foreachBatch gives each micro-batch to the BATCH fetch path, so the
    engine has exactly one fetch implementation. When ``schedule_table``
    is given, the limiter's (host, scheduled_at_s, wait_s) assignments are
    committed per batch — the politeness audit log (K5 metrics analogue).
    """
    from ..operators.wave import fetch_images
    from .stateful import rate_limit_stream

    stream = rate_limit_stream(
        canonicalize_stream(read_frontier_stream(spark, input_dir)), delay_s=delay_s
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # within-batch dedup on the canonical key with a DETERMINISTIC
        # winner (r4 ADVICE: dropDuplicates keeps an arbitrary row, so
        # which utm/fragment clone got fetched varied run-to-run):
        # earliest politeness slot wins, url as total tie-break
        from pyspark.sql import Window

        w = Window.partitionBy("surt_url").orderBy("scheduled_at_s", "url")
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if seen_table.exists():
            batch_df = batch_df.join(
                seen_table.read().select(F.col("key").alias("surt_url")),
                "surt_url",
                "left_anti",
            )
        # persist (not localCheckpoint: released below — a per-batch
        # checkpoint would accumulate blocks over a long-running stream)
        batch_df = batch_df.persist()
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
        if schedule_table is not None:
            schedule_table.append(
                batch_df.select(
                    "host", "url", "arrival_s", "scheduled_at_s", "wait_s"
                ).withColumn("batch_id", F.lit(batch_id)),
                lineage={"batch_id": batch_id, "op": "politeness_log"},
            )
        batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
