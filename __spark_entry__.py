"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: an end-to-end reference-equivalence crawl cycle
                (schedule → deterministic image fetch) over a frontier
                synthesized from sf0.001 documents.
queries()     — one entry per implemented operator (SURVEY.md §2), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query (same column names/types).
                Every catalog query is SQL-gated, and the catalog is
                EXACTLY 50 entries so the external driver's 50-query
                correctness gate covers all of them (r5: top_revenue_
                orders/events_daily_rollup retired as duplicate shapes,
                image_stats+image_resize merged into image_pipeline).
                Binary pixel CONTENT (bytes, mean_lum, pixel-phash) is not
                SQL-expressible and carries pure-Python golden oracles in
                tests/test_images.py and tests/test_wave_oracle.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from newsraag_crawler_spark.operators.frontier import reference_schedule
    from newsraag_crawler_spark.operators.wave import fetch_images
    from newsraag_crawler_spark.session import ensure_shipped

    ensure_shipped(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cands = docs.select(
        F.pmod(F.abs(F.hash("source")), F.lit(100)).cast("int").alias("source_id"),
        F.col("source").alias("source_name"),
        F.col("doc_id").alias("feed_rank"),
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("T"), F.col("doc_id").cast("string")).alias("title"),
        F.col("n_chars").cast("int").alias("content_len"),
    )
    sources = (
        cands.select("source_id")
        .distinct()
        .withColumn("max_articles_per_run", F.lit(25))
        .withColumn("enabled", F.lit(True))
    )
    sched = reference_schedule(cands, sources, None, min_content_len=500)
    corpus = fetch_images(sched.fetched, seed=42, wave=0)
    return corpus.select(
        "image_id", "url", "fmt", "w", "h", "phash", "caption", "seq",
        F.length("bytes").alias("payload_bytes"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from newsraag_crawler_spark.queries import catalog

    return catalog()


def oracle_sql() -> dict[str, str]:
    from newsraag_crawler_spark.queries import oracles

    return oracles()
