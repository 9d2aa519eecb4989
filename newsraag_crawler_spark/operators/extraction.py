"""Content-tier extraction fallback — the hierarchical template as columns.

The reference tries crawl4ai → BeautifulSoup → RSS per source, stopping at
the first method that yields articles, counting an ATTEMPT for every method
tried up to and including the winner, a SUCCESS for the winner only, and an
attempt on the pseudo-method 'failed' when the whole chain comes up empty
(`/root/reference/crawler/templates/hierarchical_template.py:96-127`; stats
shape `:57-62`, rates `:168-183`).

Relationally the short-circuit chain is a per-row CASE/coalesce (no waves,
no retries — the chain is within one fetch), and the stats are one explode +
groupBy over the tried-methods list. Everything is JVM column math: at 100 TB
this adds zero Python and one small aggregation shuffle keyed by method name
(4 distinct keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed trial order, hierarchical_template.py:96-101
EXTRACTION_METHODS = ("crawl4ai", "beautifulsoup", "rss")
FAILED = "failed"


def extraction_fallback(
    df: DataFrame,
    ok_cols: dict[str, str],
    content_cols: dict[str, str],
) -> DataFrame:
    """Adds the chain outcome to ``df``:

    - ``method``  — first method (in EXTRACTION_METHODS order) whose ok-col
      is true, else 'failed'
    - ``content`` — the winning method's content column (NULL on failure)
    - ``tried``   — array of methods attempted: every method up to and
      including the winner, plus 'failed' when none succeeded (that is
      exactly what the reference's attempts counters record)

    ok_cols / content_cols map method name → column name of the synthesized
    (or real) per-method outcome.
    """
    oks = [F.col(ok_cols[m]) for m in EXTRACTION_METHODS]
    method = F.when(oks[0], F.lit(EXTRACTION_METHODS[0]))
    for m, ok in zip(EXTRACTION_METHODS[1:], oks[1:]):
        method = method.when(ok, F.lit(m))
    method = method.otherwise(F.lit(FAILED))

    content = F.when(oks[0], F.col(content_cols[EXTRACTION_METHODS[0]]))
    for m, ok in zip(EXTRACTION_METHODS[1:], oks[1:]):
        content = content.when(ok, F.col(content_cols[m]))
    content = content.otherwise(F.lit(None).cast("string"))

    tried = (
        F.when(oks[0], F.array(F.lit(EXTRACTION_METHODS[0])))
        .when(oks[1], F.array(*[F.lit(m) for m in EXTRACTION_METHODS[:2]]))
        .when(oks[2], F.array(*[F.lit(m) for m in EXTRACTION_METHODS]))
        .otherwise(F.array(*[F.lit(m) for m in (*EXTRACTION_METHODS, FAILED)]))
    )
    return (
        df.withColumn("method", method)
        .withColumn("content", content)
        .withColumn("tried", tried)
    )


def extraction_method_stats(per_row: DataFrame) -> DataFrame:
    """A4 extraction-method stats over extraction_fallback output:
    (method, attempts, successes, success_rate, usage_percent) — the
    reference's get_extraction_stats maths (success_rate = successes /
    attempts × 100; usage_percent = attempts / total_attempts × 100,
    hierarchical_template.py:168-183). One explode + one 4-key groupBy;
    the total-attempts window runs over 4 rows."""
    tried = per_row.select(
        F.col("method").alias("won"), F.explode("tried").alias("method")
    )
    agg = tried.groupBy("method").agg(
        F.count("*").alias("attempts"),
        F.sum(
            F.when((F.col("method") == F.col("won")) & (F.col("won") != FAILED), 1)
            .otherwise(0)
        ).alias("successes"),
    )
    total = F.sum("attempts").over(Window.partitionBy())
    return agg.select(
        "method",
        "attempts",
        "successes",
        (F.col("successes").cast("double") / F.col("attempts") * 100).alias(
            "success_rate"
        ),
        (F.col("attempts").cast("double") / total * 100).alias("usage_percent"),
    )
