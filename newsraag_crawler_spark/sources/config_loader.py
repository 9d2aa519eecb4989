"""YAML source-config scan (SURVEY.md §2.1 S1).

The reference loads its crawl universe from `config/sources.yaml`
(`/root/reference/crawler/utils/config_loader.py:16-104`,
`crawler/factories/config_loader.py:30-104`): a `sources:` list whose
entries carry name/type/url plus optional rate_limit, max_articles, timeout,
content_type. Invalid entries are skipped with a printed warning.

Here the config becomes the SOURCES DIMENSION TABLE of the engine, and
validation failures become a QUARANTINE DataFrame instead of log lines —
errors are data (same contract as the robust-parse chain). YAML parsing runs
on the driver (config files are KBs; there is nothing to distribute) and the
rows enter Spark via createDataFrame, after which everything downstream is
ordinary DataFrame code.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import portable_hash64_py

SOURCE_TYPES = ("rss", "html", "youtube", "twitter")

SOURCES_SCHEMA = (
    "source_id int, name string, type string, url string, rate_limit int, "
    "max_articles int, timeout int, content_type string, enabled boolean"
)
QUARANTINE_SCHEMA = "entry string, error string"

# reference defaults (factories/config_loader.py:104-130 optional fields)
_DEFAULTS = {"rate_limit": 2, "max_articles": 50, "timeout": 60, "content_type": "forex"}


@dataclass
class LoadedConfig:
    sources: DataFrame  # valid entries, typed dimension table
    quarantine: DataFrame  # (entry, error) rows for every rejected entry


def load_sources_yaml(spark: SparkSession, config_path: str) -> LoadedConfig:
    """Parse a reference-format sources.yaml into (sources, quarantine).

    Validation mirrors `_convert_yaml_to_config`: name/type/url required,
    type must be a known source type; numeric fields fall back to reference
    defaults. Nothing raises — malformed entries land in quarantine with a
    reason, so one bad entry can't take down the crawl (the reference's
    try/except-continue, made queryable)."""
    import yaml

    try:
        with open(config_path, encoding="utf-8") as f:
            data = yaml.safe_load(f)
    except (OSError, yaml.YAMLError) as e:
        return LoadedConfig(
            spark.createDataFrame([], SOURCES_SCHEMA),
            spark.createDataFrame([(config_path, f"unreadable config: {e}")], QUARANTINE_SCHEMA),
        )

    entries = (data or {}).get("sources")
    if not isinstance(entries, list):
        return LoadedConfig(
            spark.createDataFrame([], SOURCES_SCHEMA),
            spark.createDataFrame(
                [(config_path, "invalid or empty configuration: no sources list")],
                QUARANTINE_SCHEMA,
            ),
        )

    rows, bad = [], []
    for entry in entries:
        if not isinstance(entry, dict):
            bad.append((str(entry), "entry is not a mapping"))
            continue
        name, stype, url = entry.get("name"), entry.get("type"), entry.get("url")
        if not all([name, stype, url]):
            bad.append((str(entry), "missing required field (name/type/url)"))
            continue
        if str(stype) not in SOURCE_TYPES:
            bad.append((str(entry), f"unknown source type: {stype}"))
            continue
        try:
            rows.append(
                (
                    portable_hash64_py(str(name)) % 1_000_000,
                    str(name),
                    str(stype),
                    str(url),
                    int(entry.get("rate_limit", _DEFAULTS["rate_limit"])),
                    int(entry.get("max_articles", _DEFAULTS["max_articles"])),
                    int(entry.get("timeout", _DEFAULTS["timeout"])),
                    str(entry.get("content_type", _DEFAULTS["content_type"])),
                    bool(entry.get("enabled", True)),
                )
            )
        except (TypeError, ValueError) as e:
            bad.append((str(entry), f"bad field value: {e}"))
    # source_id = hash(name) % 1e6 can collide for distinct names; colliding
    # sources would silently MERGE in every downstream groupBy/join
    # (scheduling caps, stats, frontier). Errors are data: quarantine the
    # later entry instead (duplicate NAMES collide by construction — they
    # are genuinely the same source and also land in quarantine).
    seen_ids: dict[int, str] = {}
    unique_rows = []
    for r in rows:
        sid, name = r[0], r[1]
        if sid in seen_ids:
            bad.append(
                (name, f"source_id collision with '{seen_ids[sid]}' (id {sid})")
            )
            continue
        seen_ids[sid] = name
        unique_rows.append(r)
    return LoadedConfig(
        spark.createDataFrame(unique_rows, SOURCES_SCHEMA),
        spark.createDataFrame(bad, QUARANTINE_SCHEMA),
    )


def convert_legacy_configs(legacy: DataFrame) -> DataFrame:
    """P6 — legacy loose-dict config → normalized SourceConfig columns
    (reference `crawler/core/source_crawler.py:145-200`), as pure
    when/otherwise + coalesce column math (missing dict keys ≡ NULLs):

    - rss wins: any of rss_url/feed_url present or type=='rss'
      → rss_url = coalesce(rss_url, feed_url, url), base = coalesce(base_url, rss_url)
    - else html: selectors present or type=='html' → base = coalesce(base_url, url, '')
    - else default rss with rss_url = base_url = coalesce(base_url, url, '')
    - content 'stock'/'stocks' (case-insensitive) → stocks, else forex
    - defaults: rate_limit 2, max_articles 50, timeout 30, translate false
    """
    from pyspark.sql import functions as F

    is_rss = (
        F.col("rss_url").isNotNull()
        | F.col("feed_url").isNotNull()
        | (F.col("type") == "rss")
    )
    is_html = F.col("selectors").isNotNull() | (F.col("type") == "html")
    rss_resolved = F.coalesce("rss_url", "feed_url", "url")
    default_base = F.coalesce("base_url", "url", F.lit(""))
    stype = F.when(is_rss, F.lit("rss")).when(is_html, F.lit("html")).otherwise(
        F.lit("rss")
    )
    base = (
        F.when(is_rss, F.coalesce("base_url", rss_resolved))
        .when(is_html, default_base)
        .otherwise(default_base)
    )
    rss_final = (
        F.when(is_rss, rss_resolved)
        .when(is_html, F.lit(None).cast("string"))
        .otherwise(default_base)
    )
    content = F.when(
        F.lower(F.coalesce("content_type", F.lit("forex"))).isin("stock", "stocks"),
        F.lit("stocks"),
    ).otherwise(F.lit("forex"))
    return legacy.select(
        F.coalesce("name", F.lit("legacy_source")).alias("name"),
        stype.alias("source_type"),
        content.alias("content_type"),
        base.alias("base_url"),
        rss_final.alias("rss_url"),
        F.coalesce("rate_limit", F.lit(2)).cast("int").alias("rate_limit_seconds"),
        F.coalesce("max_articles", F.lit(50)).cast("int").alias("max_articles_per_run"),
        F.coalesce("timeout", F.lit(30)).cast("int").alias("timeout_seconds"),
        F.coalesce("translate", F.lit(False)).alias("requires_translation"),
    )


def to_schedule_dim(sources: DataFrame) -> DataFrame:
    """Project the config table onto the scheduling dimension consumed by
    operators.frontier.reference_schedule."""
    from pyspark.sql import functions as F

    return sources.select(
        "source_id",
        F.col("max_articles").alias("max_articles_per_run"),
        "enabled",
    )
